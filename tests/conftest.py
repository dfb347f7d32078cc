"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-device sharding tests need
``--xla_force_host_platform_device_count=8`` set *before* JAX initializes
(SURVEY.md section 4 — the reference has no test suite; we test every layer).

The axon environment registers the TPU platform from ``sitecustomize.py``
at *interpreter startup* (keyed on ``PALLAS_AXON_POOL_IPS``), which both
imports jax and pins the backend before any conftest code runs — in-process
``os.environ`` mutation is too late and the whole suite would silently run
on the single remote TPU chip (measured: one small pallas test = 196 s).
The only reliable fix is to re-exec the interpreter with the cleaned env.
The re-exec happens in ``pytest_configure`` (not at conftest import) so the
capture plugin's fd redirection can be undone first — exec'ing while fds
1/2 point into pytest's capture tempfile silently eats all output.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    from vae2_tpu.utils.cpuenv import force_cpu_env

    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = force_cpu_env(n_devices=8)
    # argv[0] may be pytest/__main__.py, which cannot be re-run as a plain
    # script — re-enter via -m pytest with the original arguments.
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *config.invocation_params.args],
              env)


# Plain (non-axon) environment (incl. the re-exec'd child): set the knobs
# the normal way.
if not os.environ.get("PALLAS_AXON_POOL_IPS"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/vae2_tpu_xla_cpu"))
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
