"""Headline benchmark: predicted frames/sec/chip on the flagship VAE^2 model.

Measures the stochastic-inference hot path (one prior-sampled rollout =
encoder + both decoders at 128x256, the workload of tools/inference.py;
reference lib/core/function.py:124-146) with samples folded into the batch
axis, bf16 on the MXU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against an *estimated* reference throughput, since
the reference publishes no numbers (BASELINE.md): the same forward's FLOPs
(from XLA cost analysis) executed at 35% FP32 utilization of a V100
(15.7 TFLOP/s peak -> 5.5 TFLOP/s effective), the hardware class implied by
the reference's 4-GPU recipes. The north-star target is vs_baseline >= 5.

Timing uses vae2_tpu.utils.benchtime (dispatch N, one trailing host fetch):
under the axon remote runtime ``jax.block_until_ready`` does NOT wait for
device execution, so naive timing reads dispatch latency, not compute.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

import os

CHUNK = int(os.environ.get("VAE2_BENCH_CHUNK", "256"))  # samples folded per forward
ITERS = 16
H, W = 128, 256

# Reference-dataflow cost: XLA cost analysis of the r1 program (upsample-
# concat heads, i.e. the reference's exact dataflow) measured 32.72 TFLOP per
# chunk-256 forward = 14.2 GFLOP/frame. vs_baseline is pinned to THIS count —
# the torch reference executes the concat dataflow regardless of how few
# FLOPs our multiscale-head program needs.
REF_FLOPS_PER_FRAME = 14.2e9


def main():
    from vae2_tpu.config import get_default_config
    from vae2_tpu.core.builder import build_system
    from vae2_tpu.core.infer_loop import make_prior_sampler

    cfg = get_default_config()  # flagship HRNet-W18-small-v2, hd_z z=32
    # experiment hook: VAE2_BENCH_OPTS="TPU.HEAD_DATAFLOW presum ..." applies
    # yacs-style KEY VALUE overrides without touching the shipping defaults
    opts = os.environ.get("VAE2_BENCH_OPTS", "").split()
    if opts:
        cfg.merge_from_list(opts)
    system = build_system(cfg)

    rng = jax.random.PRNGKey(0)
    batch = {
        k: jnp.zeros((1, H, W, 9), jnp.float32)
        for k in ("xt", "x2t", "x3t")
    }
    state = system.init(rng, batch)

    xt = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (1, H, W, 9), np.uint8))
    x2t = jnp.asarray(
        np.random.RandomState(1).randint(0, 255, (1, H, W, 9), np.uint8))

    # compile + warmup; on HBM OOM retry with a smaller sample chunk so the
    # bench always emits its JSON line. A sidecar file remembers the last
    # chunk that compiled+fit, so a driver re-run (or a timeout mid-ladder)
    # starts at the known-good size instead of recompiling the whole ladder.
    global CHUNK
    sidecar = os.path.expanduser("~/.cache/vae2_tpu_xla/bench_last_chunk")
    ladder = [CHUNK]
    if "VAE2_BENCH_CHUNK" not in os.environ:
        try:
            with open(sidecar) as f:
                ladder.insert(0, int(f.read().strip()))
        except (OSError, ValueError):
            pass
    ladder += [256, 192, 128, 96, 64, 32]
    compiled = None
    for chunk in dict.fromkeys(ladder):
        sampler = make_prior_sampler(system, chunk=chunk, height=H, width=W)
        try:
            compiled = sampler.lower(state, xt, x2t, rng).compile()
            CHUNK = chunk
            break
        except jax.errors.JaxRuntimeError as e:
            # jaxlib doesn't expose the XLA status code as an attribute, so
            # the RESOURCE_EXHAUSTED discrimination still reads the message —
            # but only for runtime errors (trace-time bugs propagate).
            if ("RESOURCE_EXHAUSTED" not in str(e)
                    and "Ran out of memory" not in str(e)):
                raise
            print(f"# chunk {chunk} OOMs HBM; retrying smaller", flush=True)
    if compiled is None:
        raise SystemExit("all chunk sizes OOM")
    if not os.environ.get("VAE2_BENCH_OPTS"):  # only record default-config runs
        try:
            os.makedirs(os.path.dirname(sidecar), exist_ok=True)
            with open(sidecar, "w") as f:
                f.write(str(CHUNK))
        except OSError:
            pass
    if os.environ.get("VAE2_BENCH_COMPILE_ONLY") == "1":
        # warm the persistent compile cache without touching the chip (so a
        # training run can keep it busy); the real measurement later is a
        # cache hit
        print(f"# compile-only: chunk {CHUNK} program cached", flush=True)
        return
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    from vae2_tpu.utils.benchtime import time_loop

    keys = jax.random.split(rng, ITERS + 1)

    def run_iter(i):
        return sampler(state, xt, x2t, keys[i + 1])

    sec_per_forward, latency = time_loop(run_iter, ITERS)

    # 9 output frames per rollout (x1/x2/x3 clips of 3 frames)
    frames_per_sec = CHUNK * 9 / sec_per_forward

    ref_effective_flops = 0.35 * 15.7e12  # V100 fp32 @35% util
    ref_fps = ref_effective_flops / REF_FLOPS_PER_FRAME
    vs_baseline = frames_per_sec / ref_fps
    achieved_tflops = None
    mfu = None
    if flops:
        achieved_tflops = flops / sec_per_forward / 1e12
        mfu = achieved_tflops * 1e12 / 197.0e12  # v5e peak bf16

    print(json.dumps({
        "metric": "vae2_inference_predicted_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else 1.0,
        "achieved_tflops_per_sec": round(achieved_tflops, 2)
        if achieved_tflops else None,
        "mfu_vs_v5e_bf16_peak": round(mfu, 4) if mfu else None,
        "sec_per_forward": round(sec_per_forward, 5),
        "fetch_latency_s": round(latency, 4),
        "chunk": CHUNK,
    }), flush=True)


def _also_bench_train():
    """Refresh the driver-visible TRAINING metric artifact (BENCH_train.json)
    with one bench_train.py run of the shipping flagship config. OPT-IN via
    VAE2_BENCH_TRAIN=1: the leg costs a fresh ~30-min XLA compile, which blew
    the driver's bench time budget in round 3 (BENCH_r03 rc=124) when it ran
    by default. BENCH_train.json is generated out-of-band each round instead."""
    import subprocess
    import sys

    if os.environ.get("VAE2_BENCH_TRAIN", "0") != "1":
        return
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench_train.py"),
             "--optimizer", "adam", "--split", "--remat", "per-stage",
             "--iters", "12"],
            capture_output=True, text=True, timeout=5400, cwd=repo)
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        if proc.returncode != 0 or not lines:
            raise RuntimeError(
                f"rc={proc.returncode}: {proc.stderr[-500:]}")
        with open(os.path.join(repo, "BENCH_train.json"), "w") as f:
            f.write(lines[-1] + "\n")
    except Exception as e:  # noqa: BLE001 — the train leg must never kill bench
        print(f"# bench_train leg skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
    _also_bench_train()
