"""Host-fingerprinted CPU XLA cache: stale entries from a different host CPU
("machine feature mismatch" AOT loads, SIGILL hazard) must be auto-wiped."""

import os

from vae2_tpu.utils import cpuenv


def test_cache_wiped_on_host_change(tmp_path):
    cache = tmp_path / "xla_cpu"
    cache.mkdir()
    (cache / "some_entry").write_bytes(b"aot blob")
    (cache / "HOST_FINGERPRINT").write_text("deadbeefdeadbeef")

    out = cpuenv.ensure_cpu_cache_matches_host(str(cache))
    assert out == str(cache)
    assert not (cache / "some_entry").exists(), "stale entry survived"
    assert (cache / "HOST_FINGERPRINT").read_text() == cpuenv._host_fingerprint()


def test_cache_kept_on_same_host(tmp_path):
    cache = tmp_path / "xla_cpu"
    cache.mkdir()
    (cache / "entry").write_bytes(b"blob")
    (cache / "HOST_FINGERPRINT").write_text(cpuenv._host_fingerprint())

    cpuenv.ensure_cpu_cache_matches_host(str(cache))
    assert (cache / "entry").exists()


def test_fresh_cache_stamped(tmp_path):
    cache = tmp_path / "new_cache"
    cpuenv.ensure_cpu_cache_matches_host(str(cache))
    assert (cache / "HOST_FINGERPRINT").read_text() == cpuenv._host_fingerprint()


def test_force_cpu_env_points_at_stamped_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(cpuenv, "CPU_CACHE_DIR", str(tmp_path / "cc"))
    env = cpuenv.force_cpu_env(n_devices=4)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_COMPILATION_CACHE_DIR"] == str(tmp_path / "cc")
    assert os.path.exists(tmp_path / "cc" / "HOST_FINGERPRINT")
    assert "--xla_force_host_platform_device_count=4" in env["XLA_FLAGS"]
