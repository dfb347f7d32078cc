"""One place for the force-CPU environment recipe.

Several tools re-exec themselves (or spawn workers) on the CPU backend for
virtual-device meshes or host-side analysis. Under this environment that
takes three coordinated mutations, each load-bearing:

- drop ``PALLAS_AXON_POOL_IPS`` (its presence re-selects the axon TPU
  platform regardless of ``JAX_PLATFORMS``),
- set ``JAX_PLATFORMS=cpu``,
- point ``JAX_COMPILATION_CACHE_DIR`` at a CPU-only cache directory:
  entries compiled on other hosts/platforms in the main cache trigger
  "machine feature mismatch" AOT loads that can SIGILL.

Keep every new platform quirk here, not in the callers
(tools/model_summary.py, tools/multihost_rehearsal.py, __graft_entry__.py,
tests/conftest.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

CPU_CACHE_DIR = "~/.cache/vae2_tpu_xla_cpu"


def force_cpu_env(env: Optional[Dict[str, str]] = None,
                  n_devices: Optional[int] = None) -> Dict[str, str]:
    """Return ``env`` (default: a copy of os.environ) mutated to run JAX on
    the CPU backend; with ``n_devices``, request that many virtual devices."""
    env = dict(os.environ) if env is None else env
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(CPU_CACHE_DIR)
    if n_devices is not None:
        import re

        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       env.get("XLA_FLAGS", ""))
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    return env
