"""Multi-host init hardening + the 2-process jax.distributed rehearsal
(the reference's setup.sh:8-31 NCCL rendezvous contract)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_half_set_env_raises(monkeypatch):
    from vae2_tpu.parallel.dist import initialize_distributed

    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:1234")
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.delenv("PROCESS_ID", raising=False)
    monkeypatch.delenv("VAE2_TPU_ALLOW_SINGLE_PROCESS", raising=False)
    with pytest.raises(RuntimeError, match="half-set"):
        initialize_distributed()
    # non-strict downgrades to a warning
    initialize_distributed(strict=False)
    monkeypatch.setenv("VAE2_TPU_ALLOW_SINGLE_PROCESS", "1")
    initialize_distributed()


def test_unset_env_noops(monkeypatch):
    from vae2_tpu.parallel.dist import initialize_distributed

    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
              "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    initialize_distributed()  # must not raise or initialize anything


def test_two_process_rehearsal():
    """Spawn the full 2-process rehearsal (each worker: 2 virtual CPU
    devices, jax.distributed handshake, per-host batch shards assembled
    into a global array, one adversarial train step)."""
    # 2 workers x fresh CPU compile on a 1-core host can exceed 20 min when
    # the core is shared with another compile — size the timeout for the
    # worst observed cold-cache case, not the warm one (~1 min).
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "multihost_rehearsal.py")],
        capture_output=True, text=True, cwd=REPO, timeout=3000)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "multihost rehearsal PASSED" in out.stdout + out.stderr
