"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-device sharding tests need
``--xla_force_host_platform_device_count=8`` set *before* JAX initializes
(SURVEY.md section 4 — the reference has no test suite; we test every layer).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
