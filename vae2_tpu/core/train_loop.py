"""Epoch-level adversarial training loop.

Host-side orchestration around the jitted ``train_step``
(reference lib/core/function.py:443-604): iterate the loader, feed batches to
the device, log averaged losses every PRINT_FREQ, write TensorBoard scalars,
and dump visualizations of the last batch at epoch end.

Metric fetches are deferred to print points so the host never blocks the
device pipeline mid-epoch.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from ..utils.logging import AverageMeter
from ..utils.schedule import dynamic_coeff

logger = logging.getLogger("vae2_tpu")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def denormalize_to_uint8(x: np.ndarray) -> np.ndarray:
    """(H, W, 3) normalized float -> uint8 image (reference function.py:555-566)."""
    x = x * IMAGENET_STD + IMAGENET_MEAN
    x = np.clip(x * 255.0, 0, 255)
    return x.astype(np.uint8)


def save_frames_png(clip: np.ndarray, save_path: str, prefix: str) -> None:
    """Save each 3-channel frame of an (H, W, 3F) clip as a PNG.

    Accepts either raw uint8 frames (the loader's on-host format) or
    normalized float frames (model predictions), which get denormalized.
    """
    from PIL import Image

    os.makedirs(save_path, exist_ok=True)
    num_frames = clip.shape[-1] // 3
    for f in range(num_frames):
        fr = clip[..., f * 3: f * 3 + 3]
        im = fr if fr.dtype == np.uint8 else denormalize_to_uint8(
            fr.astype(np.float32))
        Image.fromarray(im).save(os.path.join(save_path, f"{prefix}_{f}.png"))


def adversarial_train(
    config,
    epoch: int,
    num_epoch: int,
    train_step: Callable,
    state,
    loader: Iterable,
    rng: jax.Array,
    writer_dict: Optional[dict] = None,
    final_output_dir: str = "",
    use_multiplier: bool = False,
    device_put: Optional[Callable] = None,
):
    """Run one adversarial epoch; returns the new state.

    ``loader`` yields (batch_dict, names) with numpy arrays keyed
    'xt'/'x2t'/'x3t'. ``device_put`` optionally shards batches onto the mesh.
    """
    batch_time = AverageMeter()
    ave_loss_D = AverageMeter()
    ave_loss_encdec = AverageMeter()
    multiplier = (
        dynamic_coeff(max_iters=num_epoch, cur_iters=epoch) if use_multiplier else 1.0
    )
    multiplier = np.float32(multiplier)
    # Anomaly guard (the reference asserts NaN/Inf on z and predictions every
    # step, utils.py:63-65; under jit we check the fetched metrics instead).
    anomaly_check = bool(config.DEBUG.DEBUG)
    # jax.profiler trace window (TPU equivalent of the reference's wall-clock
    # meters, SURVEY.md section 5): profile steps [2, 2+N) of epoch 0.
    profile_dir = str(config.TPU.get("PROFILE_DIR", "")) if epoch == 0 else ""
    profile_steps = int(config.TPU.get("PROFILE_STEPS", 5))

    tic = time.time()
    last_metrics = None
    last_preds = None
    last_batch = None
    last_names = None
    epoch_iters = len(loader) if hasattr(loader, "__len__") else 0

    for i_iter, (batch, names) in enumerate(loader):
        if profile_dir and i_iter == 2:
            jax.profiler.start_trace(profile_dir)
        if device_put is not None:
            batch = device_put(batch)
        rng, step_rng = jax.random.split(rng)
        state, metrics, preds = train_step(state, batch, step_rng, multiplier)
        last_metrics, last_preds = metrics, preds
        last_batch, last_names = batch, names
        if profile_dir and i_iter == 2 + profile_steps:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            logger.info("profiler trace written to %s", profile_dir)
            profile_dir = ""
        if anomaly_check:
            m = jax.device_get(metrics)
            bad = {k: float(v) for k, v in m.items()
                   if not np.isfinite(v)}
            assert not bad, f"NaN/Inf losses at iter {i_iter}: {bad}"

        batch_time.update(time.time() - tic)
        tic = time.time()

        if i_iter % config.PRINT_FREQ == 0:
            m = jax.device_get(metrics)
            ave_loss_D.update(float(m["loss_D"]))
            ave_loss_encdec.update(float(m["loss_encdec"]))
            msg = (
                "Epoch: [{}/{}] Iter:[{}/{}], Time: {:.2f}, "
                "lr: {:.6f}, Loss_D_ave: {:.6f}, Loss_D_sequence: {:.6f}, "
                "Loss_D_frame: {:.6f}, Loss_encdec_ave: {:.6f}, "
                "loss_xt_recon: {:.6f}, loss_x2t_recon: {:.6f}, "
                "loss_x3t_recon: {:.6f}, loss_z_KL: {:.6f}, "
                "loss_x2t_gan_sequence: {:.6f}, loss_x2t_gan_frame: {:.6f}".format(
                    epoch, num_epoch, i_iter, epoch_iters,
                    batch_time.average(), config.TRAIN.LR,
                    ave_loss_D.average(), float(m["loss_D_sequence"]),
                    float(m["loss_D_frame"]), ave_loss_encdec.average(),
                    float(m["loss_xt_recon"]), float(m["loss_x2t_recon"]),
                    float(m["loss_x3t_recon"]), float(m["loss_z_KL"]),
                    float(m["loss_x2t_gan_sequence"]),
                    float(m["loss_x2t_gan_frame"]),
                )
            )
            logger.info(msg)

            if writer_dict is not None:
                writer = writer_dict["writer"]
                gs = writer_dict["train_global_steps"]
                writer.add_scalar("train_loss_D", ave_loss_D.average(), gs)
                writer.add_scalar("train_loss_D_sequence", float(m["loss_D_sequence"]), gs)
                writer.add_scalar("train_loss_D_frame", float(m["loss_D_frame"]), gs)
                writer.add_scalar("train_loss_encdec", ave_loss_encdec.average(), gs)
                writer.add_scalar("train_loss_xt_recon", float(m["loss_xt_recon"]), gs)
                writer.add_scalar("train_loss_x2_recon", float(m["loss_x2t_recon"]), gs)
                writer.add_scalar("train_loss_x3t_recon", float(m["loss_x3t_recon"]), gs)
                writer.add_scalar("train_loss_z_KL", float(m["loss_z_KL"]), gs)
                writer.add_scalar(
                    "train_loss_x2t_gan_sequence", float(m["loss_x2t_gan_sequence"]), gs)
                writer.add_scalar(
                    "train_loss_x2t_gan_frame", float(m["loss_x2t_gan_frame"]), gs)
                writer_dict["train_global_steps"] = gs + 1

    if final_output_dir and last_preds is not None:
        _dump_epoch_visuals(
            final_output_dir, epoch, last_batch, last_preds, last_names)

    del last_metrics
    return state, rng


def _dump_epoch_visuals(final_output_dir, epoch, batch, preds, names) -> None:
    """End-of-epoch dumps of the last batch (reference function.py:568-604)."""
    name = names[-1] if names else "batch"
    save_path = os.path.join(final_output_dir, "vis", f"epoch{epoch}", str(name))
    os.makedirs(save_path, exist_ok=True)
    batch = jax.device_get(batch)
    x1p, x2p, x3p = jax.device_get(preds)

    if "toyexample" in str(name):
        np.save(os.path.join(save_path, "x1t.npy"), batch["xt"][-1])
        np.save(os.path.join(save_path, "x2t.npy"), batch["x2t"][-1])
        np.save(os.path.join(save_path, "x3t.npy"), batch["x3t"][-1])
        np.save(os.path.join(save_path, "x1t_predict.npy"), x1p[-1])
        np.save(os.path.join(save_path, "x2t_predict.npy"), x2p[-1])
        np.save(os.path.join(save_path, "x3t_predict.npy"), x3p[-1])
    else:
        save_frames_png(batch["xt"][-1], save_path, "x1t")
        save_frames_png(batch["x2t"][-1], save_path, "x2t")
        save_frames_png(batch["x3t"][-1], save_path, "x3t")
        save_frames_png(np.asarray(x1p[-1], np.float32), save_path, "x1t_predict")
        save_frames_png(np.asarray(x2p[-1], np.float32), save_path, "x2t_predict")
        save_frames_png(np.asarray(x3p[-1], np.float32), save_path, "x3t_predict")
