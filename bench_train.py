"""Training-throughput benchmark: sustained adversarial step time + MFU.

Measures the flagship VAE^2 train step (G+D updates, 128x256, batch
8/chip — the hot loop at reference lib/core/function.py:482-516) over a
sustained window on synthetic data, and reports:

- steady-state step time (median over ITERS steps after warmup)
- training MFU: XLA-counted FLOPs / (step_time * chip peak bf16 FLOP/s)

Prints ONE JSON line. Knobs via env/CLI:
    python bench_train.py [--optimizer sgd|adam] [--split] [--batch 8]
                          [--iters 20] [--remat per-trunk|per-stage|none]
                          [--fused-abn xla|pallas]
"""

import argparse
import json

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
                    choices=("per-trunk", "per-stage", "none"))
    ap.add_argument("--fused-abn", default="xla", choices=("xla", "pallas"))
    ap.add_argument("--multiscale-head", action="store_true",
                    help="commute head 1x1 convs before the upsample")
    ap.add_argument("--adam-moments", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--profile-dir", default="",
                    help="jax.profiler trace of 2 post-timing steps")
    ap.add_argument("--compile-only", action="store_true",
                    help="lower+compile the step (warming the persistent "
                         "cache) without executing any training step — lets "
                         "a concurrent run keep the chip while measurement "
                         "programs compile remotely")
    ap.add_argument("--height", default=128, type=int)
    ap.add_argument("--width", default=256, type=int)
    ap.add_argument("opts", nargs="*", default=[],
                    help="yacs-style KEY VALUE config overrides")
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
    cfg.TPU.REMAT = {"per-trunk": "trunk", "per-stage": "stage",
                     "none": "none"}[args.remat]
    cfg.TPU.FUSED_ABN = args.fused_abn
    cfg.TPU.MULTISCALE_HEAD = bool(args.multiscale_head)
    cfg.TPU.ADAM_MOMENT_DTYPE = args.adam_moments
    cfg.merge_from_list(args.opts)
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

    if args.compile_only:
        k0 = jax.random.PRNGKey(1)
        mult0 = jnp.float32(1.0)
        if args.split:
            step.g_jit.lower(state, batch, k0, mult0).compile()
            if step.run_d_step:
                x2p_spec = jax.ShapeDtypeStruct(
                    (b, h, w, 9), jnp.dtype(cfg.TPU.DTYPE))
                step.d_jit.lower(state, batch["x2t"], x2p_spec).compile()
        else:
            step.lower(state, batch, k0, mult0).compile()
        print(json.dumps({"compile_only": True, "batch": b, "hw": [h, w],
                          "split": args.split, "remat": args.remat,
                          "adam_moments": args.adam_moments,
                          "opts": args.opts}), flush=True)
        return

    from vae2_tpu.utils.benchtime import fetch_sync, time_loop

    rng = jax.random.PRNGKey(2)
    mult = jnp.float32(1.0)
    preds = None
    for _ in range(args.warmup):
        rng, k = jax.random.split(rng)
        state, metrics, preds = step(state, batch, k, mult)
    if args.warmup:
        fetch_sync(metrics)

    # FLOPs from compiled.cost_analysis() — the axon backend returns None
    # for *lowered* (uncompiled) programs; after warmup these AOT compiles
    # are persistent-cache hits
    def _flops_of(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else 0.0

    flops = None
    try:
        k0 = jax.random.PRNGKey(1)
        if args.split:
            flops = _flops_of(step.g_jit.lower(state, batch, k0, mult)
                              .compile())
            if step.run_d_step:
                flops += _flops_of(
                    step.d_jit.lower(state, batch["x2t"], preds[1]).compile())
        else:
            flops = _flops_of(step.lower(state, batch, k0, mult).compile())
        flops = flops or None
    except Exception:
        pass

    # time N step dispatches with one trailing host fetch — under the axon
    # remote runtime jax.block_until_ready does NOT wait for execution, so
    # per-step block timing reads dispatch latency, not compute
    # (vae2_tpu/utils/benchtime.py). The state threads through iterations,
    # serializing them by data dependency.
    keys = jax.random.split(rng, args.iters + 1)
    box = {"state": state}

    def run_iter(i):
        box["state"], metrics, _ = step(box["state"], batch, keys[i + 1], mult)
        return metrics

    sec, latency = time_loop(run_iter, args.iters)

    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            for i in range(2):
                run_iter(i)
            fetch_sync(box["state"])

    mfu = (flops / sec / V5E_PEAK_BF16) if flops else None
    print(json.dumps({
        "metric": "vae2_train_step_seconds",
        "value": round(sec, 4),
        "unit": "s/step",
        "config": {
            "optimizer": args.optimizer, "split": args.split,
            "batch": b, "remat": args.remat, "fused_abn": args.fused_abn,
            "multiscale_head": bool(args.multiscale_head),
            "adam_moments": args.adam_moments,
            "hw": [args.height, args.width],
            "opts": args.opts,
        },
        "steps_per_sec": round(1.0 / sec, 3),
        "clips_per_sec_per_chip": round(b / sec, 2),
        "train_flops_per_step": flops,
        "mfu_vs_v5e_bf16_peak": round(mfu, 4) if mfu else None,
        "iters": args.iters,
        "fetch_latency_s": round(latency, 4),
    }))


if __name__ == "__main__":
    main()
