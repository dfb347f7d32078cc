"""Two-process multi-host training rehearsal on virtual CPU devices.

Validates the full multi-host contract without a TPU pod: process 0 and 1
each see 2 virtual CPU devices (global mesh of 4), initialize
jax.distributed, shard the toy-scale video system's batch per host
(ClipLoader process shards + make_array_from_process_local_data), and run
one adversarial train step — the jax-native equivalent of the reference's
setup.sh + NCCL + DistributedSampler + DDP stack (SURVEY.md section 2,
"Parallelism & distributed-communication components").

    python tools/multihost_rehearsal.py            # launcher: spawns 2 procs
    python tools/multihost_rehearsal.py --worker N # internal
"""

import argparse
import os
import subprocess
import sys

import _init_paths  # noqa: F401

PORT = 29817


def worker(process_id: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae2_tpu.parallel.dist import initialize_distributed
    from vae2_tpu.parallel.mesh import make_mesh, shard_batch_fn, shard_state
    from vae2_tpu.data.loader import normalize_clips
    from __graft_entry__ import _tiny_video_config
    from vae2_tpu.core.builder import build_system

    initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    n = len(jax.devices())
    assert n == 4, f"expected 4 global devices, got {n}"

    cfg = _tiny_video_config()
    cfg.TPU.MESH.SPATIAL = 1
    mesh = make_mesh(cfg)
    system = build_system(cfg)

    # per-host batch slice: global batch 8 -> 4 per process
    rng_np = np.random.RandomState(process_id)
    local = {k: rng_np.randint(0, 255, (4, 32, 64, 9), np.uint8)
             for k in ("xt", "x2t", "x3t")}

    example = {k: normalize_clips(jnp.asarray(v[:1]))
               for k, v in local.items()}
    state = system.init(jax.random.PRNGKey(0), example)

    def barrier(tag):
        # Coordination-service barrier (no gloo): the gloo pair handshake
        # has a hard 30s KV timeout, and single-core XLA-compile skew
        # between the two workers easily exceeds it. Processes must be
        # aligned before anything that *executes* a cross-process
        # collective; compiles therefore happen before the barrier (AOT).
        from jax._src import distributed as _dist

        client = _dist.global_state.client
        if client is not None:
            client.wait_at_barrier(tag, timeout_in_ms=1200000)

    barrier("rehearsal_init_done")
    state = shard_state(state, mesh)
    batch = shard_batch_fn(mesh)(local)
    assert batch["xt"].shape[0] == 8  # global batch assembled

    step = system.make_train_step(donate=True,
                                  preprocess=normalize_clips)
    compiled = step.lower(state, batch, jax.random.PRNGKey(1),
                          jnp.float32(1.0)).compile()
    barrier("rehearsal_compiled")
    state, metrics, _ = compiled(state, batch, jax.random.PRNGKey(1),
                                 jnp.float32(1.0))
    loss = float(jax.device_get(metrics["loss_encdec"]))
    assert np.isfinite(loss)
    print(f"[process {process_id}] multihost step ok: loss_encdec={loss:.4f}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker)
        return

    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "COORDINATOR_ADDRESS": f"127.0.0.1:{PORT}",
        "NUM_PROCESSES": "2",
        # both workers live on this host: pin gloo's pair transport (the CPU
        # collectives backend) to loopback so it never advertises an
        # external interface
        "GLOO_SOCKET_IFNAME": "lo",
    }
    from vae2_tpu.utils.cpuenv import force_cpu_env

    env_base = force_cpu_env(env=env_base)
    procs = []
    for pid in (0, 1):
        env = dict(env_base, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid)],
            env=env))
    rc = [p.wait() for p in procs]
    assert rc == [0, 0], f"worker exit codes {rc}"
    print("multihost rehearsal PASSED")


if __name__ == "__main__":
    main()
