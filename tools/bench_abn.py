"""Micro-benchmark: Pallas fused-ABN kernels vs the XLA epilogue path.

The InPlace-ABN rebuild (vae2_tpu/ops/pallas/abn.py, reference
lib/models/sync_bn/inplace_abn/src/inplace_abn_cuda.cu:120-295) applies to
the ABN-invertible activations (leaky_relu / identity) — the regime the
reference uses it in (its video model uses plain BN+ReLU, where the Pallas
path deliberately falls back; see vae2_tpu/ops/norm.py). This tool times a
train-mode forward+backward of BatchNormAct under both backends at
trunk-like shapes and prints one JSON line per shape.

    python tools/bench_abn.py [--iters 30]
"""

import argparse
import json

import _init_paths  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    # (batch, h, w, c): flagship trunk branch shapes at inference chunk /
    # train batch scale
    (8, 128, 256, 18),
    (8, 64, 128, 36),
    (64, 128, 256, 18),
    (8, 128, 256, 256),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default=30, type=int)
    args = ap.parse_args()

    from vae2_tpu.ops.norm import BatchNormAct
    from vae2_tpu.utils.benchtime import time_loop

    for shape in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        results = {}
        for backend in ("xla", "pallas"):
            bn = BatchNormAct(act="leaky_relu", backend=backend,
                              dtype=jnp.bfloat16)
            variables = bn.init(jax.random.PRNGKey(0), x, True)
            params = variables["params"]
            stats = {"batch_stats": variables["batch_stats"]}

            @jax.jit
            def fwdbwd(p, xx):
                def loss(p, xx):
                    y, _ = bn.apply({"params": p, **stats}, xx, True,
                                    mutable=["batch_stats"])
                    return jnp.sum(y.astype(jnp.float32) ** 2)
                return jax.grad(loss, argnums=(0, 1))(p, xx)

            g = fwdbwd(params, x)  # compile
            jax.device_get(jax.tree_util.tree_leaves(g)[0])
            sec, _ = time_loop(lambda i: fwdbwd(params, x), args.iters)
            results[backend] = sec
        print(json.dumps({
            "metric": "fused_abn_train_fwdbwd_seconds",
            "shape": list(shape),
            "xla": round(results["xla"], 6),
            "pallas": round(results["pallas"], 6),
            "pallas_speedup": round(results["xla"] / results["pallas"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
