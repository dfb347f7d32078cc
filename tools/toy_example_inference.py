"""Toy inference: prior-sample rollouts + scatter-plot diagnostics
(reference tools/toy_example_inference.py + lib/core/function.py:155-219).

For each batch of alphas, draws NUM_SAMPLES prior-sampled predictions and,
for the last element, inverse-sigmoid-maps values back to the h axis to
produce the posterior-collapse diagnostic scatter PDFs (prd.pdf / gt.pdf)
plus gt/x2t/x3t axis txt dumps.
"""

import argparse
import math
import os
import pprint

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401
from vae2_tpu.config import config, update_config
from vae2_tpu.core.builder import build_system
from vae2_tpu.data.toy import ToyLoader
from vae2_tpu.utils.checkpoint import load_checkpoint
from vae2_tpu.utils.logging import create_logger

MARKERS = ["o", "v", "1", "s", "p", "*", "h", "D", "|", "^",
           "2", "P", "d", "<", "3", "H", "+", "X", ">", "4"]


def parse_args():
    parser = argparse.ArgumentParser(description="Toy VAE^2 inference")
    parser.add_argument(
        "--cfg", default="experiments/toyexample/toyexample.yaml", type=str)
    parser.add_argument("--checkpoint", default="", type=str)
    parser.add_argument("--num-samples", default=100, type=int)
    parser.add_argument("--batch-size", default=100, type=int)
    parser.add_argument("--num-batches", default=5, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    update_config(config, args)
    return args


def inv_sigmoid(vals, alpha):
    """Map function values back to the h axis (function.py:166-171)."""
    return [-math.log(1.0 / min(max(float(v), 1e-5), 0.99999) - 1.0) / alpha
            for v in vals]


def scatter_plots(save_path, alpha, batch, preds_list, is_baseline):
    """prd.pdf / gt.pdf + axis txt dumps (function.py:155-219)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(save_path, exist_ok=True)
    xt, x2t, x3t = (batch[k][-1] for k in ("xt", "x2t", "x3t"))
    colors = ["g"] * 10 if is_baseline else ["y"] * 10 + ["g"] * 10

    x1_axis = inv_sigmoid(xt, alpha)
    x2_axis = inv_sigmoid(x2t, alpha)
    x3_axis = inv_sigmoid(x3t, alpha)

    plt.figure()
    plt.xlim(-1.6, 1.6)
    plt.ylim(-0.1, 1.1)
    plt.xlabel("h")
    plt.ylabel("value")
    plt.grid(ls="--")
    cond_axis = x1_axis + x2_axis if is_baseline else x1_axis
    cond_vals = list(xt) + list(x2t) if is_baseline else list(xt)
    plt.scatter(cond_axis, cond_vals, c="r", alpha=0.3, marker="x")
    tgt_axis = x3_axis if is_baseline else x2_axis + x3_axis
    tgt_vals = list(x3t) if is_baseline else list(x2t) + list(x3t)
    for i, (a, v) in enumerate(zip(tgt_axis, tgt_vals)):
        plt.scatter(a, v, c="r", marker=MARKERS[10 + i if is_baseline else i],
                    alpha=0.3)
    with open(os.path.join(save_path, "gt_axis.txt"), "a") as f:
        f.write(" ".join(map(str, x3_axis)) + "\n")

    for x1p, x2p, x3p in preds_list:
        p2_axis = inv_sigmoid(x2p[-1], alpha)
        p3_axis = inv_sigmoid(x3p[-1], alpha)
        axis = p2_axis if is_baseline else p2_axis + p3_axis
        vals = list(x2p[-1]) if is_baseline else list(x2p[-1]) + list(x3p[-1])
        for i, (a, v) in enumerate(zip(axis, vals)):
            plt.scatter(a, v, c=colors[i],
                        marker=MARKERS[10 + i if is_baseline else i], alpha=0.1)
        with open(os.path.join(save_path, "x2t_axis.txt"), "a") as f:
            f.write(" ".join(map(str, p2_axis)) + "\n")
        with open(os.path.join(save_path, "x3t_axis.txt"), "a") as f:
            f.write(" ".join(map(str, p3_axis)) + "\n")
    plt.savefig(os.path.join(save_path, "prd.pdf"), bbox_inches="tight")
    plt.close()

    plt.figure()
    plt.xlim(-1.5, 1.5)
    plt.ylim(-0.1, 1.1)
    plt.xlabel("h")
    plt.ylabel("value")
    plt.grid(ls="--")
    plt.scatter(x1_axis, list(xt), c="b", alpha=0.9, marker="x")
    for i, (a, v) in enumerate(zip(x2_axis + x3_axis, list(x2t) + list(x3t))):
        plt.scatter(a, v, c="b", marker=MARKERS[i], alpha=0.9)
    for axis_vals, vals in ((x1_axis, xt), (x2_axis, x2t), (x3_axis, x3t)):
        for idx, (a, v) in enumerate(zip(axis_vals, vals)):
            if idx % 3 == 0:
                plt.annotate(f"t={a:.2f}", (a, v))
    plt.savefig(os.path.join(save_path, "gt.pdf"), bbox_inches="tight")
    plt.close()


def main():
    args = parse_args()
    logger, final_output_dir, _ = create_logger(config, args.cfg, "inference")
    logger.info(pprint.pformat(vars(args)))

    system = build_system(config)
    loader = ToyLoader(batch_size=args.batch_size, shuffle_seed=args.seed,
                       num_batches=args.num_batches)

    example_batch, _ = next(iter(loader))
    from vae2_tpu.utils.checkpoint import template_from_init
    template = template_from_init(
        system, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in example_batch.items()})

    ckpt = args.checkpoint or os.path.join(final_output_dir, "checkpoint.msgpack")
    state, epoch = load_checkpoint(ckpt, template, restore_opt=False)
    logger.info("=> loaded checkpoint %s (epoch %d)", ckpt, epoch)

    eval_step = system.make_eval_step("prior_sampling")
    rng = jax.random.PRNGKey(args.seed)

    is_baseline = config.MODEL.EXTRA.IS_BASELINE
    for batch_np, names in loader:
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if is_baseline:
            batch_np = dict(batch_np)
        preds_list = []
        for _ in range(args.num_samples):
            rng, k = jax.random.split(rng)
            preds, _ = eval_step(state, batch, k)
            preds_list.append(tuple(np.asarray(p) for p in preds))
        name = names[-1]
        alpha = float(name.split("alpha")[-1])
        save_path = os.path.join(final_output_dir, "vis", f"epoch{epoch}", name)
        scatter_plots(save_path, alpha, batch_np, preds_list, is_baseline)
        logger.info("plotted %s (%d samples)", name, args.num_samples)
    logger.info("Done")


if __name__ == "__main__":
    main()
