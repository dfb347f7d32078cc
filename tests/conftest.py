"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-device sharding tests need
``--xla_force_host_platform_device_count=8`` set *before* JAX initializes
(SURVEY.md section 4 — the reference has no test suite; we test every layer).
"""

import os

# Hard-force the CPU platform: the axon environment exports
# JAX_PLATFORMS=axon + PALLAS_AXON_POOL_IPS, which would silently route the
# whole suite through the single remote TPU chip (slow, and the sharding
# tests need 8 devices).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
# Separate CPU cache dir: entries from other platforms in the main cache
# trigger "machine feature mismatch" AOT loads that can SIGILL (see
# __graft_entry__._bootstrap_virtual_mesh).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/vae2_tpu_xla_cpu"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
