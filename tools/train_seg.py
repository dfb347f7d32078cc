"""Train the legacy segmentation HRNet (the reference keeps seg ``train``/
``validate`` engine functions, lib/core/function.py:607-705, but ships no seg
train CLI — its tools/train.py is hardwired to the video models; this CLI
makes the seg path trainable end-to-end).

    python tools/train_seg.py --cfg experiments/cityscapes/seg_hrnet_w48_train_512x1024.yaml
"""

import argparse
import os
import pprint

import jax
import jax.numpy as jnp
import numpy as np

import _init_paths  # noqa: F401
from vae2_tpu.config import config, update_config
from vae2_tpu.core.seg_loop import (make_seg_train_step, seg_train,
                                    seg_validate)
from vae2_tpu.core.system import make_optimizer
from vae2_tpu.data.segmentation import make_seg_dataset
from vae2_tpu.models.seg_hrnet import get_seg_model
from vae2_tpu.utils.logging import create_logger


class _SegBatcher:
    """Minimal batcher over a SegDataset: stacks crops into NHWC batches."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        for i in range(len(self)):
            chunk = idx[i * self.batch_size: (i + 1) * self.batch_size]
            samples = [self.dataset[j] for j in chunk]
            images = np.stack([s[0] for s in samples])
            labels = np.stack([s[1] for s in samples])
            names = [s[3] for s in samples]
            yield images, labels, None, names


def main():
    parser = argparse.ArgumentParser(description="Train segmentation network")
    parser.add_argument("--cfg", required=True, type=str)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    update_config(config, args)

    logger, final_output_dir, tb_log_dir = create_logger(config, args.cfg,
                                                         "train")
    logger.info(pprint.pformat(vars(args)))

    try:
        from tensorboardX import SummaryWriter
        writer_dict = {"writer": SummaryWriter(tb_log_dir),
                       "train_global_steps": 0}
    except ImportError:  # pragma: no cover
        writer_dict = None

    model = get_seg_model(config)
    h = config.TRAIN.IMAGE_SIZE[1]
    w = config.TRAIN.IMAGE_SIZE[0]
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, h, w, 3), jnp.float32), True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    optimizer = make_optimizer(config.TRAIN)
    opt_state = optimizer.init(params)

    train_dataset = make_seg_dataset(config, config.DATASET.TRAIN_SET,
                                     train=True,
                                     num_samples=config.TRAIN.NUM_SAMPLES
                                     or None)
    loader = _SegBatcher(train_dataset, config.TRAIN.BATCH_SIZE_PER_GPU,
                         shuffle=config.TRAIN.SHUFFLE, seed=args.seed)

    step = make_seg_train_step(
        model, optimizer,
        ignore_label=config.TRAIN.IGNORE_LABEL,
        use_ohem=config.LOSS.USE_OHEM,
        ohem_thres=config.LOSS.OHEMTHRES,
        ohem_kept=config.LOSS.OHEMKEEP,
        class_weights=(train_dataset.class_weights
                       if config.LOSS.CLASS_BALANCE else None))

    epoch_iters = len(loader)
    num_iters = config.TRAIN.END_EPOCH * epoch_iters
    from vae2_tpu.utils.checkpoint import save_checkpoint

    for epoch in range(config.TRAIN.BEGIN_EPOCH, config.TRAIN.END_EPOCH):
        loader.set_epoch(epoch)
        params, batch_stats, opt_state = seg_train(
            config, epoch, config.TRAIN.END_EPOCH, epoch_iters,
            config.TRAIN.LR, num_iters, loader, step, params, batch_stats,
            opt_state, writer_dict)
        save_checkpoint(
            os.path.join(final_output_dir, "seg_checkpoint.msgpack"),
            {"params": params, "batch_stats": batch_stats,
             "opt_state": opt_state}, epoch + 1)

    save_checkpoint(os.path.join(final_output_dir, "seg_final_state.msgpack"),
                    {"params": params, "batch_stats": batch_stats},
                    config.TRAIN.END_EPOCH)
    logger.info("Done")


if __name__ == "__main__":
    main()
