"""Training-throughput benchmark: sustained adversarial step time + MFU.

Measures the flagship VAE^2 train step (G+D updates, 128x256, batch
8/chip — the hot loop at reference lib/core/function.py:482-516) over a
sustained window on synthetic data, and reports:

- steady-state step time (median over ITERS steps after warmup)
- training MFU: XLA-counted FLOPs / (step_time * chip peak bf16 FLOP/s)

Prints ONE JSON line. Knobs via env/CLI:
    python bench_train.py [--optimizer sgd|adam] [--split] [--batch 8]
                          [--iters 20] [--remat per-trunk|none]
                          [--fused-abn xla|pallas]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197.0e12  # TPU v5e peak bf16 FLOP/s per chip


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--optimizer", default="sgd", choices=("sgd", "adam"))
    ap.add_argument("--split", action="store_true",
                    help="compile G/D updates as two programs")
    ap.add_argument("--batch", default=8, type=int)
    ap.add_argument("--iters", default=20, type=int)
    ap.add_argument("--warmup", default=3, type=int)
    ap.add_argument("--remat", default="per-trunk",
                    choices=("per-trunk", "none"))
    ap.add_argument("--fused-abn", default="xla", choices=("xla", "pallas"))
    ap.add_argument("--height", default=128, type=int)
    ap.add_argument("--width", default=256, type=int)
    return ap.parse_args()


def main():
    args = parse_args()
    from vae2_tpu.config import get_default_config
    from vae2_tpu.core.builder import build_system
    from vae2_tpu.data.loader import normalize_clips

    cfg = get_default_config()  # flagship HRNet-W18-small-v2
    cfg.TRAIN.OPTIMIZER = args.optimizer
    if args.optimizer == "adam":
        cfg.TRAIN.LR = 1e-4
    cfg.TPU.SPLIT_STEP = args.split
    cfg.TPU.REMAT = args.remat == "per-trunk"
    cfg.TPU.FUSED_ABN = args.fused_abn
    system = build_system(cfg)

    b, h, w = args.batch, args.height, args.width
    rs = np.random.RandomState(0)
    batch_np = {k: rs.randint(0, 255, (b, h, w, 9), np.uint8)
                for k in ("xt", "x2t", "x3t")}
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    example = {k: normalize_clips(v[:1]) for k, v in batch.items()}

    state = system.init(jax.random.PRNGKey(0), example)
    step = system.make_train_step(donate=True, preprocess=normalize_clips,
                                  split=args.split)

    # FLOPs from the *lowered* (uncompiled) combined program — cheap, and
    # identical math to the split variant
    flops = None
    try:
        counter = (step if not args.split else system.make_train_step(
            donate=False, preprocess=normalize_clips, split=False))
        ca = counter.lower(state, batch, jax.random.PRNGKey(1),
                           jnp.float32(1.0)).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    rng = jax.random.PRNGKey(2)
    mult = jnp.float32(1.0)
    for _ in range(args.warmup):
        rng, k = jax.random.split(rng)
        state, metrics, _ = step(state, batch, k, mult)
    jax.block_until_ready(metrics)

    times = []
    for _ in range(args.iters):
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics, _ = step(state, batch, k, mult)
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))

    mfu = (flops / med / V5E_PEAK_BF16) if flops else None
    print(json.dumps({
        "metric": "vae2_train_step_seconds",
        "value": round(med, 4),
        "unit": "s/step",
        "config": {
            "optimizer": args.optimizer, "split": args.split,
            "batch": b, "remat": args.remat, "fused_abn": args.fused_abn,
            "hw": [args.height, args.width],
        },
        "steps_per_sec": round(1.0 / med, 3),
        "clips_per_sec_per_chip": round(b / med, 2),
        "train_flops_per_step": flops,
        "mfu_vs_v5e_bf16_peak": round(mfu, 4) if mfu else None,
        "p10_s": round(float(np.percentile(times, 10)), 4),
        "p90_s": round(float(np.percentile(times, 90)), 4),
    }))


if __name__ == "__main__":
    main()
