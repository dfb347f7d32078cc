"""Legacy segmentation engine: train / validate / testval / test
(reference lib/core/function.py:607-780).

TPU-first notes:
- Train/validate are jitted CE steps over fixed crop shapes.
- ``testval`` runs whole-image eval: images are padded to a static bucket
  (multiple of 32, cached per bucket) so XLA compiles a handful of shapes
  instead of one per image; flip TTA averages logits of x and flip(x)
  (reference base_dataset.py:149-166).
- ``multi_scale_inference`` slides a fixed crop window (static shape ->
  single compiled program) accumulating logits/counts, the TPU equivalent of
  base_dataset.py:167-229.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.logging import AverageMeter
from ..utils.metric import get_confusion_matrix, miou_from_confusion
from ..utils.schedule import adjust_learning_rate
from .losses import cross_entropy_loss, ohem_cross_entropy

logger = logging.getLogger("vae2_tpu")


def make_seg_train_step(model, optimizer, ignore_label=-1, use_ohem=False,
                        ohem_thres=0.9, ohem_kept=100000,
                        class_weights=None) -> Callable:
    weights = jnp.asarray(class_weights) if class_weights is not None else None

    def loss_fn(params, batch_stats, images, labels):
        logits, updated = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, True,
            mutable=["batch_stats"])
        if use_ohem:
            loss = ohem_cross_entropy(logits, labels, ignore_label,
                                      ohem_thres, ohem_kept, weights)
        else:
            loss = cross_entropy_loss(logits, labels, ignore_label, weights)
        return loss, updated["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


def seg_train(config, epoch, num_epoch, epoch_iters, base_lr, num_iters,
              loader, step, params, batch_stats, opt_state, writer_dict=None):
    """One training epoch (reference function.py:607-655). Returns updated
    (params, batch_stats, opt_state)."""
    ave_loss = AverageMeter()
    tic = time.time()
    cur_iters = epoch * epoch_iters
    for i_iter, (images, labels, _, _) in enumerate(loader):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images),
            jnp.asarray(labels))
        lr = adjust_learning_rate(base_lr, num_iters, i_iter + cur_iters)
        if i_iter % config.PRINT_FREQ == 0:
            ave_loss.update(float(loss))
            logger.info(
                "Epoch: [%d/%d] Iter:[%d/%d], Time: %.2f, lr: %.6f, "
                "Loss: %.6f", epoch, num_epoch, i_iter, epoch_iters,
                time.time() - tic, lr, ave_loss.average())
            tic = time.time()
            if writer_dict is not None:
                writer = writer_dict["writer"]
                gs = writer_dict["train_global_steps"]
                writer.add_scalar("train_loss", ave_loss.average(), gs)
                writer.add_scalar("learning_rate", lr, gs)
                writer_dict["train_global_steps"] = gs + 1
    return params, batch_stats, opt_state


def _bucket_hw(h: int, w: int, mult: int = 32) -> Tuple[int, int]:
    return ((h + mult - 1) // mult * mult, (w + mult - 1) // mult * mult)


def whole_image_logits(infer: Callable, image: np.ndarray) -> np.ndarray:
    """Whole-image logits with static-bucket padding.

    XLA compiles one program per input shape; a variable-size test set (LIP,
    PASCAL-Context) would trigger a compile per image. Instead the image is
    zero-padded (zero = mean pixel after normalization) up to the next
    32-multiple bucket and the logits cropped back, so a mixed-size set
    compiles only a handful of programs. Only conv receptive-field leakage
    at the padded bottom/right border differs from unpadded inference
    (reference base_dataset.py:149-154 runs any shape directly on GPU)."""
    h, w = image.shape[:2]
    bh, bw = _bucket_hw(h, w)
    if (bh, bw) != (h, w):
        image = np.pad(image, ((0, bh - h), (0, bw - w), (0, 0)))
    logits = np.asarray(infer(jnp.asarray(image[None])))[0]
    return logits[:h, :w]


def make_infer_fn(model, variables) -> Callable:
    """Jitted whole-image logits at input resolution (logits upsampled x4)."""

    @jax.jit
    def infer(images):
        logits = model.apply(variables, images, False)
        return jax.image.resize(
            logits,
            (logits.shape[0], images.shape[1], images.shape[2],
             logits.shape[3]), "bilinear")

    return infer


def flip_tta(infer: Callable, images: jnp.ndarray,
             flip_pairs=None) -> jnp.ndarray:
    """Average logits over horizontal flip (base_dataset.py:155-165).

    ``flip_pairs``: list of (left, right) class-index pairs whose logit
    channels must swap when un-flipping (the LIP human-parsing TTA,
    reference lip.py:107-130).
    """
    logits = infer(images)
    flipped = infer(images[:, :, ::-1, :])[:, :, ::-1, :]
    if flip_pairs:
        idx = np.arange(logits.shape[-1])
        for left, right in flip_pairs:
            idx[left], idx[right] = idx[right], idx[left]
        flipped = flipped[..., jnp.asarray(idx)]
    return (logits + flipped) * 0.5


def seg_validate(config, loader, model, variables) -> Tuple[float, float, np.ndarray]:
    """Validation loss + mIoU over crop-sized batches
    (reference function.py:658-705)."""
    infer = make_infer_fn(model, variables)
    confusion = np.zeros((config.DATASET.NUM_CLASSES,) * 2)
    losses = []
    for images, labels, _, _ in loader:
        logits = infer(jnp.asarray(images))
        losses.append(float(cross_entropy_loss(
            logits, jnp.asarray(labels), config.TRAIN.IGNORE_LABEL)))
        confusion += get_confusion_matrix(
            np.asarray(labels), np.asarray(logits),
            config.DATASET.NUM_CLASSES, config.TRAIN.IGNORE_LABEL)
    mean_iou, iou_array = miou_from_confusion(confusion)
    return float(np.mean(losses)), float(mean_iou), iou_array


def multi_scale_inference(infer: Callable, image: np.ndarray,
                          crop_size: Tuple[int, int], num_classes: int,
                          scales=(1.0,), flip: bool = False,
                          flip_pairs=None) -> np.ndarray:
    """Sliding-window multi-scale logits for one image (HWC, normalized),
    TPU re-design of base_dataset.py:167-229: every window is the fixed
    crop_size so one compiled program serves all positions/scales."""
    import cv2

    ori_h, ori_w = image.shape[:2]
    final = np.zeros((ori_h, ori_w, num_classes), np.float32)
    run = (lambda x: flip_tta(infer, x, flip_pairs)) if flip else infer
    for scale in scales:
        new_h = int(ori_h * scale + 0.5)
        new_w = int(ori_w * scale + 0.5)
        scaled = cv2.resize(image, (new_w, new_h),
                            interpolation=cv2.INTER_LINEAR)
        ch, cw = crop_size
        pad_h, pad_w = max(ch - new_h, 0), max(cw - new_w, 0)
        if pad_h or pad_w:
            scaled = cv2.copyMakeBorder(scaled, 0, pad_h, 0, pad_w,
                                        cv2.BORDER_CONSTANT, value=0.0)
        hh, ww = scaled.shape[:2]
        rows = int(np.ceil((hh - ch) / ch)) + 1
        cols = int(np.ceil((ww - cw) / cw)) + 1
        preds = np.zeros((hh, ww, num_classes), np.float32)
        count = np.zeros((hh, ww, 1), np.float32)
        for r in range(rows):
            for c in range(cols):
                y1 = min(r * ch + ch, hh)
                x1 = min(c * cw + cw, ww)
                y0, x0 = max(y1 - ch, 0), max(x1 - cw, 0)
                window = scaled[y0:y1, x0:x1][None]
                logits = np.asarray(run(jnp.asarray(window)))[0]
                preds[y0:y1, x0:x1] += logits
                count[y0:y1, x0:x1] += 1
        preds = (preds / count)[:new_h, :new_w]
        final += cv2.resize(preds, (ori_w, ori_h),
                            interpolation=cv2.INTER_LINEAR)
    return final


def seg_testval(config, dataset, model, variables, sv_dir: str = "",
                sv_pred: bool = False):
    """Whole-test-set mIoU with optional multi-scale + flip TTA
    (reference function.py:708-757)."""
    infer = make_infer_fn(model, variables)
    num_classes = config.DATASET.NUM_CLASSES
    confusion = np.zeros((num_classes, num_classes))
    crop = (config.TEST.IMAGE_SIZE[1], config.TEST.IMAGE_SIZE[0])
    for index in range(len(dataset)):
        sample = dataset[index]
        image, label, _, name = sample
        if config.TEST.MULTI_SCALE or config.TEST.FLIP_TEST:
            logits = multi_scale_inference(
                infer, image, crop, num_classes,
                scales=config.TEST.SCALE_LIST, flip=config.TEST.FLIP_TEST,
                flip_pairs=getattr(dataset, "flip_pairs", None))
        else:
            logits = whole_image_logits(infer, image)
        if logits.shape[:2] != label.shape:
            import cv2
            logits = cv2.resize(logits, (label.shape[1], label.shape[0]),
                                interpolation=cv2.INTER_LINEAR)
        confusion += get_confusion_matrix(
            label[None], logits[None], num_classes, config.TRAIN.IGNORE_LABEL)
        if sv_pred and sv_dir:
            sv_path = os.path.join(sv_dir, "test_val_results")
            os.makedirs(sv_path, exist_ok=True)
            dataset.save_pred(logits[None], sv_path, [name])
        if index % 100 == 0:
            mean_iou, _ = miou_from_confusion(confusion)
            logger.info("processing: %d images, mIoU %.4f", index, mean_iou)
    pos = confusion.sum(1)
    res = confusion.sum(0)
    tp = np.diag(confusion)
    pixel_acc = tp.sum() / pos.sum()
    mean_acc = (tp / np.maximum(1.0, pos)).mean()
    mean_iou, iou_array = miou_from_confusion(confusion)
    return mean_iou, iou_array, pixel_acc, mean_acc


def seg_test(config, dataset, model, variables, sv_dir: str):
    """Label-free prediction dump (reference function.py:759-780)."""
    infer = make_infer_fn(model, variables)
    num_classes = config.DATASET.NUM_CLASSES
    crop = (config.TEST.IMAGE_SIZE[1], config.TEST.IMAGE_SIZE[0])
    sv_path = os.path.join(sv_dir, "test_results")
    os.makedirs(sv_path, exist_ok=True)
    for index in range(len(dataset)):
        image, size, name = dataset[index]
        if config.TEST.MULTI_SCALE or config.TEST.FLIP_TEST:
            logits = multi_scale_inference(
                infer, image, crop, num_classes,
                scales=config.TEST.SCALE_LIST, flip=config.TEST.FLIP_TEST)
        else:
            logits = whole_image_logits(infer, image)
        if logits.shape[:2] != tuple(size[:2]):
            import cv2
            logits = cv2.resize(logits, (int(size[1]), int(size[0])),
                                interpolation=cv2.INTER_LINEAR)
        dataset.save_pred(logits[None], sv_path, [name])
