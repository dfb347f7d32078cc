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

import hashlib
import os
import shutil
from typing import Dict, Optional

CPU_CACHE_DIR = "~/.cache/vae2_tpu_xla_cpu"


def _host_fingerprint() -> str:
    """Hash of the host CPU's feature flags. XLA:CPU AOT cache entries are
    machine-feature-specific; containers are re-imaged between rounds onto
    hosts with different CPUs, and loading a mismatched entry logs
    "machine feature mismatch" and can SIGILL."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:16]
    except OSError:
        pass
    return "unknown"


def ensure_cpu_cache_matches_host(cache_dir: Optional[str] = None) -> str:
    """Wipe the CPU XLA cache if it was populated on a different host CPU
    (detected via a fingerprint file), then stamp the current host.
    Returns the expanded cache dir."""
    cache_dir = os.path.expanduser(cache_dir or CPU_CACHE_DIR)
    fp_file = os.path.join(cache_dir, "HOST_FINGERPRINT")
    fp = _host_fingerprint()
    try:
        with open(fp_file) as f:
            stored = f.read().strip()
    except OSError:
        stored = None
    if stored is not None and stored != fp:
        shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(cache_dir, exist_ok=True)
    if stored != fp:
        with open(fp_file, "w") as f:
            f.write(fp)
    return cache_dir


def force_cpu_env(env: Optional[Dict[str, str]] = None,
                  n_devices: Optional[int] = None) -> Dict[str, str]:
    """Return ``env`` (default: a copy of os.environ) mutated to run JAX on
    the CPU backend; with ``n_devices``, request that many virtual devices."""
    env = dict(os.environ) if env is None else env
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = ensure_cpu_cache_matches_host()
    if n_devices is not None:
        import re

        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       env.get("XLA_FLAGS", ""))
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    return env
