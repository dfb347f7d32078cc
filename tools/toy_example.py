"""Train the toy 1-D sequence VAE^2 (reference tools/toy_example.py).

The CPU-feasible end-to-end smoke path: synthetic sigmoid-family data,
toy MLP models, full adversarial G/D training loop.

    python tools/toy_example.py --cfg experiments/toyexample/toyexample.yaml \
        [TRAIN.END_EPOCH 5 ...]
"""

import argparse
import logging
import os
import pprint
import timeit

import jax
import numpy as np

import _init_paths  # noqa: F401
from vae2_tpu.config import config, update_config
from vae2_tpu.core.builder import build_system
from vae2_tpu.core.train_loop import adversarial_train
from vae2_tpu.data.toy import ToyLoader
from vae2_tpu.utils.checkpoint import maybe_resume, save_checkpoint
from vae2_tpu.utils.logging import create_logger


def parse_args():
    parser = argparse.ArgumentParser(description="Train toy VAE^2")
    parser.add_argument(
        "--cfg", default="experiments/toyexample/toyexample.yaml", type=str)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    update_config(config, args)
    return args


def main():
    args = parse_args()
    logger, final_output_dir, tb_log_dir = create_logger(config, args.cfg, "train")
    logger.info(pprint.pformat(vars(args)))
    logger.info(config)

    try:
        from tensorboardX import SummaryWriter
        writer_dict = {
            "writer": SummaryWriter(tb_log_dir),
            "train_global_steps": 0,
            "valid_global_steps": 0,
        }
    except ImportError:  # pragma: no cover
        writer_dict = None

    loader = ToyLoader(batch_size=config.TRAIN.BATCH_SIZE_PER_GPU,
                       shuffle_seed=args.seed)
    system = build_system(
        config,
        max_iters=len(loader) * (config.TRAIN.END_EPOCH
                                 + config.TRAIN.EXTRA_EPOCH))

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    example_batch, _ = next(iter(loader))
    state = system.init(init_rng, example_batch)
    train_step = system.make_train_step()

    last_epoch = 0
    if config.TRAIN.RESUME:
        resumed, last_epoch = maybe_resume(final_output_dir, state)
        if resumed is not None:
            state = resumed
            logger.info("=> loaded checkpoint (epoch %d)", last_epoch)

    start = timeit.default_timer()
    end_epoch = config.TRAIN.END_EPOCH + config.TRAIN.EXTRA_EPOCH
    for epoch in range(last_epoch, end_epoch):
        state, rng = adversarial_train(
            config, epoch, config.TRAIN.END_EPOCH, train_step, state, loader,
            rng, writer_dict=writer_dict, final_output_dir=final_output_dir,
            use_multiplier=config.TRAIN.USE_X2RECON_MULTIPLIER)

        ckpt = os.path.join(final_output_dir, "checkpoint.msgpack")
        logger.info("=> saving checkpoint to %s", ckpt)
        save_checkpoint(ckpt, state, epoch + 1)

    save_checkpoint(
        os.path.join(final_output_dir, "model_final_state.msgpack"),
        state, end_epoch)
    if writer_dict is not None:
        writer_dict["writer"].close()
    logger.info("Hours: %d", int((timeit.default_timer() - start) / 3600))
    logger.info("Done")


if __name__ == "__main__":
    main()
