"""Train the VAE^2 video-prediction model (reference tools/train.py).

Builds the four networks (encoder-dual-decoder, posterior, sequence + frame
discriminators), a sharded data pipeline, and runs the jitted adversarial
G/D loop over a TPU mesh with per-epoch checkpointing.

    python tools/train.py --cfg experiments/cityscapes/vae2_hrnet_w18_small_v2_128x256.yaml \
        [DATASET.ROOT data/synthetic TRAIN.END_EPOCH 5 ...]
"""

import argparse
import os
import pprint
import shutil
import timeit

import jax
import numpy as np

import _init_paths  # noqa: F401
from vae2_tpu.config import config, update_config
from vae2_tpu.core.builder import build_system
from vae2_tpu.core.train_loop import adversarial_train
from vae2_tpu.data.loader import ClipLoader, DevicePrefetcher, normalize_clips
from vae2_tpu.data.video import make_dataset
from vae2_tpu.parallel.mesh import make_mesh, shard_batch_fn, shard_state
from vae2_tpu.utils.checkpoint import maybe_resume, save_checkpoint
from vae2_tpu.utils.logging import create_logger
from vae2_tpu.utils.summary import log_model_summary


def parse_args():
    parser = argparse.ArgumentParser(description="Train VAE^2 video prediction")
    parser.add_argument(
        "--cfg",
        default="experiments/cityscapes/vae2_hrnet_w18_small_v2_128x256.yaml",
        type=str)
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

    # Multi-host init (replaces setup.sh + NCCL env:// rendezvous).
    from vae2_tpu.parallel.dist import initialize_distributed
    initialize_distributed()

    # Device mesh: data-parallel axis over all local (or distributed) devices
    # — replaces torch.distributed/NCCL + DDP (reference tools/train.py:107-111,
    # 225-229).
    mesh = make_mesh(config)
    logger.info("Device mesh: %s", mesh)
    device_put = shard_batch_fn(mesh)

    # Data: per-host sharded threaded loader (replaces DataLoader workers +
    # DistributedSampler, train.py:129-141).
    train_dataset = make_dataset(config, config.DATASET.TRAIN_SET,
                                 random_pos=True, seed=args.seed)
    loader = ClipLoader(
        train_dataset,
        batch_size=config.TRAIN.BATCH_SIZE_PER_GPU * mesh.devices.size
        // jax.process_count(),
        shuffle=config.TRAIN.SHUFFLE,
        num_threads=config.WORKERS,
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        prefetch=config.TPU.PREFETCH,
    )
    if config.DATASET.EXTRA_TRAIN_SET:
        extra_dataset = make_dataset(config, config.DATASET.EXTRA_TRAIN_SET,
                                     random_pos=True, seed=args.seed + 1)
        extra_loader = ClipLoader(
            extra_dataset, batch_size=loader.batch_size,
            shuffle=config.TRAIN.SHUFFLE, num_threads=config.WORKERS,
            seed=args.seed + 1, process_index=jax.process_index(),
            process_count=jax.process_count(), prefetch=config.TPU.PREFETCH)
    else:
        extra_loader = None

    # steps-per-epoch is only needed when TRAIN.LR_SCHEDULE decays per-iter
    system = build_system(
        config,
        max_iters=len(loader) * (config.TRAIN.END_EPOCH
                                 + config.TRAIN.EXTRA_EPOCH))

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    example_batch, _ = next(iter(loader))
    # Parameters are spatial-size-independent (convs + per-channel BN), so
    # initialize on a small crop — the full-resolution init graph costs
    # minutes of XLA compile on its own.
    example_batch = {
        k: normalize_clips(v[:1, : min(32, v.shape[1]), : min(64, v.shape[2])])
        for k, v in example_batch.items()
    }
    state = system.init(init_rng, example_batch)
    log_model_summary(logger, state)
    if config.TPU.LAYER_SUMMARY:
        # per-layer shapes/params/FLOPs table (reference modelsummary.py:
        # train.py:92-98). FLOPs need the CPU backend's cost analysis, so
        # the table is produced by tools/model_summary.py in a subprocess.
        import subprocess
        import sys

        tool = os.path.join(os.path.dirname(__file__), "model_summary.py")
        out = subprocess.run(
            [sys.executable, tool, "--cfg", args.cfg] + (args.opts or []),
            capture_output=True, text=True)
        logger.info("per-layer model summary:\n%s", out.stdout)
        if out.returncode != 0:
            logger.warning("model_summary failed: %s", out.stderr[-2000:])
    if config.MODEL.PRETRAINED and os.path.isfile(config.MODEL.PRETRAINED):
        # seed trunks from an ImageNet/seg HRNet torch checkpoint with the
        # reference's conv1 channel-replication surgery (enc_hrnet.py:753-785)
        from vae2_tpu.utils.torch_import import import_pretrained_trunk
        state, missing = import_pretrained_trunk(
            state, config.MODEL.PRETRAINED,
            clip_length=config.TRAIN.CLIP_LENGTH,
            is_baseline=config.MODEL.EXTRA.IS_BASELINE)
        logger.info("=> loaded pretrained %s (%d fresh-init leaves)",
                    config.MODEL.PRETRAINED, len(missing))
    state = shard_state(state, mesh)

    train_step = system.make_train_step(
        donate=config.TPU.DONATE, preprocess=normalize_clips,
        split=config.TPU.SPLIT_STEP)

    last_epoch = 0
    if config.TRAIN.RESUME or config.AUTO_RESUME:
        resumed, last_epoch = maybe_resume(final_output_dir, state)
        if resumed is not None:
            state = shard_state(resumed, mesh)
            logger.info("=> loaded checkpoint (epoch %d)", last_epoch)

    start = timeit.default_timer()
    end_epoch = config.TRAIN.END_EPOCH + config.TRAIN.EXTRA_EPOCH
    for epoch in range(last_epoch, end_epoch):
        extra_phase = epoch >= config.TRAIN.END_EPOCH and extra_loader is not None
        cur_loader = extra_loader if extra_phase else loader
        cur_loader.set_epoch(epoch)
        prefetched = DevicePrefetcher(cur_loader, put_fn=device_put,
                                      depth=config.TPU.PREFETCH)
        state, rng = adversarial_train(
            config,
            epoch - config.TRAIN.END_EPOCH if extra_phase else epoch,
            config.TRAIN.EXTRA_EPOCH if extra_phase else config.TRAIN.END_EPOCH,
            train_step, state, prefetched, rng,
            writer_dict=writer_dict, final_output_dir=final_output_dir,
            use_multiplier=config.TRAIN.USE_X2RECON_MULTIPLIER)

        if jax.process_index() == 0:
            ckpt = os.path.join(final_output_dir, "checkpoint.msgpack")
            logger.info("=> saving checkpoint to %s", ckpt)
            save_checkpoint(ckpt, state, epoch + 1)
            snap = int(config.TRAIN.SNAPSHOT_EVERY)
            if snap and (epoch + 1) % snap == 0:
                shutil.copy(ckpt, os.path.join(
                    final_output_dir,
                    f"checkpoint_epoch{epoch + 1:04d}.msgpack"))

    if jax.process_index() == 0:
        save_checkpoint(
            os.path.join(final_output_dir, "model_final_state.msgpack"),
            state, end_epoch)
    if writer_dict is not None:
        writer_dict["writer"].close()
    logger.info("Hours: %d", int((timeit.default_timer() - start) / 3600))
    logger.info("Done")


if __name__ == "__main__":
    main()
