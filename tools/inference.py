"""Stochastic multi-sample inference/eval (reference tools/inference.py).

Loads a trained checkpoint and, for every test clip, draws NUM_SAMPLES prior
rollouts, dumping predicted frames and per-sample SSIM/MS-SSIM/L1/PSNR txt
trees (consumed by tools/statistic.py and the FID/IS tools).

    python tools/inference.py --cfg experiments/cityscapes/INFERENCE.yaml \
        [--checkpoint path.msgpack --num-samples 100]
"""

import argparse
import os
import pprint

import jax

import _init_paths  # noqa: F401
from vae2_tpu.config import config, update_config
from vae2_tpu.core.builder import build_system
from vae2_tpu.core.infer_loop import run_inference
from vae2_tpu.data.loader import ClipLoader, normalize_clips
from vae2_tpu.data.video import make_dataset
from vae2_tpu.utils.checkpoint import load_checkpoint
from vae2_tpu.utils.logging import create_logger


def parse_args():
    parser = argparse.ArgumentParser(description="VAE^2 inference")
    parser.add_argument(
        "--cfg",
        default="experiments/cityscapes/vae2_hrnet_w18_small_v2_128x256.yaml",
        type=str)
    parser.add_argument("--checkpoint", default="", type=str,
                        help="msgpack checkpoint (default: OUTPUT_DIR one)")
    parser.add_argument("--num-samples", default=100, type=int)
    parser.add_argument(
        "--clip-num", default=3, type=int, choices=(3, 5),
        help="clips per eval sample; 5 enables the momentum-eval window "
             "layout (reference function.py:109-115)")
    parser.add_argument(
        "--sampling-mode", default="prior_sampling",
        choices=("prior_sampling", "momentum_sampling"),
        help="momentum_sampling draws z from the previous window's "
             "posterior (reference utils.py:186-207; needs --clip-num 5)")
    parser.add_argument("--no-images", action="store_true",
                        help="skip PNG dumps, write metric txts only")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    update_config(config, args)
    return args


def main():
    args = parse_args()
    logger, final_output_dir, _ = create_logger(config, args.cfg, "inference")
    logger.info(pprint.pformat(vars(args)))

    system = build_system(config)

    # Eval data: fixed clip position, no shuffle (reference
    # tools/inference.py:116-133).
    if args.sampling_mode == "momentum_sampling" and args.clip_num != 5:
        raise SystemExit("--sampling-mode momentum_sampling needs --clip-num 5")
    dataset = make_dataset(config, config.DATASET.TEST_SET, random_pos=False,
                           num_samples=config.TEST.NUM_SAMPLES or None,
                           clip_num=args.clip_num)
    loader = ClipLoader(
        dataset, batch_size=config.TEST.BATCH_SIZE_PER_GPU, shuffle=False,
        drop_last=False, num_threads=config.WORKERS,
        prefetch=config.TPU.PREFETCH)

    rng = jax.random.PRNGKey(args.seed)
    example_batch, _ = next(iter(loader))
    example_batch = {k: normalize_clips(v[:1]) for k, v in example_batch.items()}
    # eval_shape template: restore without compiling the init graph
    from vae2_tpu.utils.checkpoint import template_from_init
    template = template_from_init(system, jax.random.PRNGKey(0), example_batch)

    # --checkpoint accepts a comma-separated list: every checkpoint is
    # evaluated in THIS process, reusing the one compiled sampler — a
    # trajectory eval costs one compile instead of one per snapshot.
    ckpts = ([c for c in args.checkpoint.split(",") if c]
             if args.checkpoint
             else [os.path.join(final_output_dir, "checkpoint.msgpack")])
    for ckpt in ckpts:
        state, epoch = load_checkpoint(ckpt, template, restore_opt=False)
        logger.info("=> loaded checkpoint %s (epoch %d)", ckpt, epoch)
        run_inference(config, system, state, loader, final_output_dir, epoch,
                      rng, num_samples=args.num_samples,
                      save_images=not args.no_images,
                      sampling_mode=args.sampling_mode)
    logger.info("Done")


if __name__ == "__main__":
    main()
