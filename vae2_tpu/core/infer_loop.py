"""Stochastic multi-sample inference loop.

Re-design of reference lib/core/function.py:55-441 (``inference``): for each
eval batch, draw NUM_SAMPLES prior-sampled rollouts of the generator and dump
per-sample SSIM / MS-SSIM / L1 / PSNR metrics (vs ground truth) to txt files
plus predicted/GT frames as PNGs — the tree consumed by tools/statistic.py
and the FID/IS tools.

TPU-first differences from the reference:
- Prior sampling never runs the posterior network: z ~ N(0, I) shapes are
  computed statically from the encoder geometry (the reference runs the full
  posterior just to read ``mu.size()``, utils.py:89).
- Samples are folded into the batch axis in chunks of
  ``TPU.INFER_SAMPLE_BATCH`` — one forward computes many rollouts on the MXU
  instead of a python loop of single forwards (function.py:124-146).
- The image metrics are computed on-device in a jitted function over all
  frames/samples at once, not per-frame python loops (function.py:238-316).
"""

from __future__ import annotations

import functools
import logging
import os
import weakref
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import denormalize_clips, normalize_clips
from ..ops.ssim import ms_ssim, ssim
from .losses import psnr as psnr_fn
from .system import VAE2State, VAE2System, split_muvar

logger = logging.getLogger("vae2_tpu")

# jitted samplers keyed per live VAE2System (weakly — id() reuse after GC
# must not alias a stale jitted sampler onto a new system) then by
# (mode, chunk, h, w) — reused across run_inference calls so
# multi-checkpoint evals compile once
_SAMPLER_CACHE: "weakref.WeakKeyDictionary[VAE2System, Dict[tuple, Callable]]" \
    = weakref.WeakKeyDictionary()


def prior_z_shapes(hyper, height: int, width: int) -> Optional[list]:
    """Static latent shapes for prior sampling.

    hd_z: one (h/2^b, w/2^b, z_dim) map per HRNet branch — the trunk stem is
    stride 1 so branch b sits at 1/2^b resolution (see models/hrnet.py).
    Pooled: a flat (z_dim,) vector.
    """
    if hyper.deterministic:
        return None
    if hyper.hd_z:
        return [(height // 2**b, width // 2**b, hyper.z_dim) for b in range(4)]
    return [(hyper.z_dim,)]


def _decode_samples(system: VAE2System, state: VAE2State, enc_in, z,
                    rng_code, chunk: int):
    """Decode ``chunk`` folded latent samples through the encoder/decoders,
    using the shared z-independent prefix when available."""
    h = system.hyper
    encdec = system.modules["encdec"]
    shared_prefix = hasattr(encdec, "sample") and not h.deterministic
    variables = {"params": state.params["encdec"]}
    if state.batch_stats.get("encdec"):
        variables["batch_stats"] = state.batch_stats["encdec"]
    if shared_prefix:
        # z-independent encoder prefix computed once, broadcast to all
        # chunk samples (see VAE2EncDec.sample)
        return encdec.apply(
            variables, enc_in, z, False, rngs={"sample": rng_code},
            method="sample")
    enc_in = jnp.broadcast_to(enc_in, (chunk,) + enc_in.shape[1:])
    return encdec.apply(
        variables, enc_in, z, False, rngs={"sample": rng_code})


def make_prior_sampler(system: VAE2System, chunk: int,
                       height: int, width: int) -> Callable:
    """Jitted fn: (state, xt, x2t, rng) -> (x1p, x2p, x3p) with ``chunk``
    prior samples folded into the batch axis. Inputs are single uint8 clips
    (1, H, W, C); outputs are (chunk, H, W, C) normalized floats."""
    h = system.hyper
    z_shapes = prior_z_shapes(h, height, width)

    def fn(state: VAE2State, xt, x2t, rng):
        xt = normalize_clips(xt)
        x2t = normalize_clips(x2t)
        enc_in = system._encoder_input(xt, x2t)
        rng_z, rng_code = jax.random.split(rng)
        if z_shapes is None:
            z = None
        elif h.hd_z:
            keys = jax.random.split(rng_z, len(z_shapes))
            z = [jax.random.normal(k, (chunk,) + s, jnp.float32)
                 for k, s in zip(keys, z_shapes)]
        else:
            z = jax.random.normal(rng_z, (chunk,) + z_shapes[0], jnp.float32)
        return _decode_samples(system, state, enc_in, z, rng_code, chunk)

    return jax.jit(fn)


def make_momentum_sampler(system: VAE2System, chunk: int) -> Callable:
    """Jitted fn: (state, xt, x2t, xt_last, x3t_last, rng) -> (x1p, x2p, x3p)
    with ``chunk`` posterior draws folded into the batch axis.

    Momentum sampling (reference utils.py:186-207): z is drawn from the
    posterior conditioned on the PREVIOUS clip window —
    ``z = mu + exp(logvar/2) * eps`` with ``(mu, logvar) =
    encz(concat(xt_last, x3t_last))`` — instead of N(0, I). Requires a
    5-clip eval batch (make_dataset(clip_num=5))."""
    h = system.hyper
    if h.deterministic:
        raise ValueError("momentum_sampling needs a stochastic model (encz)")

    def fn(state: VAE2State, xt, x2t, xt_last, x3t_last, rng):
        xt = normalize_clips(xt)
        x2t = normalize_clips(x2t)
        xt_last = normalize_clips(xt_last)
        x3t_last = normalize_clips(x3t_last)
        enc_in = system._encoder_input(xt, x2t)
        rng_eps, rng_code = jax.random.split(rng)
        q_in = jnp.concatenate([xt_last, x3t_last], axis=-1)
        muvars, _ = system._apply(
            "encz", state.params, state.batch_stats, q_in, train=False)
        mus, logvars = split_muvar(muvars, h.z_dim)
        # chunk reparameterized draws from the batch-1 posterior, folded
        # into the batch axis (mu/sigma broadcast from (1, ...) to (chunk, ...))
        if isinstance(mus, (list, tuple)):
            keys = jax.random.split(rng_eps, len(mus))
            z = [m + jnp.exp(0.5 * v)
                 * jax.random.normal(k, (chunk,) + m.shape[1:], m.dtype)
                 for m, v, k in zip(mus, logvars, keys)]
        else:
            z = mus + jnp.exp(0.5 * logvars) * jax.random.normal(
                rng_eps, (chunk,) + mus.shape[1:], mus.dtype)
        return _decode_samples(system, state, enc_in, z, rng_code, chunk)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def make_metric_fn(strict_msssim: Optional[bool] = None) -> Callable:
    """Jitted: (pred (S,H,W,3F) normalized, gt (1,H,W,3F) uint8) ->
    dict of (S, F) metric arrays [ssim, msssim, l1, psnr].

    ``strict_msssim``: None (default) auto-selects pytorch_msssim parity
    mode whenever the image is large enough for all 3 MS-SSIM levels
    (>= 44px min side — i.e. every non-debug recipe), so full-size eval
    numbers are guaranteed level-exact; small debug images fall back to
    level-drop (see ops/ssim.py)."""

    def per_frame(pred_f, gt_f):
        # pred_f, gt_f: (H, W, 3) in [0, 255]
        p = pred_f[None]
        g = gt_f[None]
        strict = (min(p.shape[1], p.shape[2]) >= 44
                  if strict_msssim is None else strict_msssim)
        return (
            ssim(p, g, data_range=255.0),
            ms_ssim(p, g, data_range=255.0, strict=strict),
            jnp.mean(jnp.abs(p - g)),
            psnr_fn(p, g),
        )

    def fn(pred, gt_u8):
        pred255 = denormalize_clips(pred)  # (S, H, W, 3F)
        gt = jnp.broadcast_to(
            gt_u8.astype(jnp.float32), (pred.shape[0],) + gt_u8.shape[1:])
        s, hh, ww, c = pred255.shape
        f = c // 3
        pred_f = pred255.reshape(s, hh, ww, f, 3)
        gt_f = gt.reshape(s, hh, ww, f, 3)
        # vmap over samples and frames
        vm = jax.vmap(jax.vmap(per_frame, in_axes=(3, 3), out_axes=0),
                      in_axes=(0, 0), out_axes=0)
        ss, ms, l1, ps = vm(pred_f, gt_f)
        return {"ssim": ss, "msssim": ms, "recon": l1, "psnr": ps}

    return jax.jit(fn)


def _append_metric_txts(save_path: str, tag: str, metrics: Dict[str, np.ndarray]
                        ) -> None:
    """Append per-sample per-frame metric lines (function.py:254-261)."""
    os.makedirs(save_path, exist_ok=True)
    s, f = metrics["recon"].shape
    names = {"recon": "reconloss", "ssim": "ssimloss",
             "msssim": "msssimloss", "psnr": "psnrloss"}
    for key, fname in names.items():
        for frame in range(f):
            with open(os.path.join(save_path, f"{tag}_{frame}_{fname}.txt"),
                      "a") as fw:
                for sample in range(s):
                    fw.write(str(float(metrics[key][sample, frame])) + "\n")


def _save_pred_pngs(save_path: str, tag: str, pred255: np.ndarray,
                    metrics: Dict[str, np.ndarray], save_images: bool) -> None:
    from PIL import Image

    if not save_images:
        return
    os.makedirs(save_path, exist_ok=True)
    s, hh, ww, c = pred255.shape
    f = c // 3
    for sample in range(s):
        for frame in range(f):
            im = pred255[sample, ..., frame * 3: frame * 3 + 3].astype(np.uint8)
            fname = "{}_{}_trial_{}_recon{}_ssim{}_msssim{}.png".format(
                tag, frame, sample,
                float(metrics["recon"][sample, frame]),
                float(metrics["ssim"][sample, frame]),
                float(metrics["msssim"][sample, frame]))
            Image.fromarray(im).save(os.path.join(save_path, fname))


def run_inference(config, system: VAE2System, state: VAE2State, loader,
                  final_output_dir: str, epoch: int, rng,
                  num_samples: int = 100, save_images: bool = True,
                  sampling_mode: str = "prior_sampling") -> None:
    """Full inference sweep (reference function.py:55-441, image branch).

    ``sampling_mode``: 'prior_sampling' (default, z ~ N(0,I)) or
    'momentum_sampling' (z from the previous window's posterior — needs a
    5-clip loader, reference utils.py:186-207)."""
    from .train_loop import save_frames_png

    h_img = config.TRAIN.IMAGE_SIZE[1]
    w_img = config.TRAIN.IMAGE_SIZE[0]
    chunk = min(int(config.TPU.INFER_SAMPLE_BATCH), num_samples)
    # Cache the jitted sampler across run_inference calls: a multi-checkpoint
    # trajectory eval (tools/inference.py --checkpoint a,b,c) must compile
    # once, not once per snapshot (a fresh jax.jit object recompiles).
    per_system = _SAMPLER_CACHE.setdefault(system, {})
    key = (sampling_mode, chunk, h_img, w_img)
    cached = per_system.get(key)
    if cached is not None:
        sampler = cached
    elif sampling_mode == "momentum_sampling":
        sampler = make_momentum_sampler(system, chunk)
    elif sampling_mode == "prior_sampling":
        sampler = make_prior_sampler(system, chunk, h_img, w_img)
    else:
        raise ValueError(f"unknown sampling_mode: {sampling_mode}")
    per_system[key] = sampler
    metric_fn = make_metric_fn()
    is_baseline = system.hyper.is_baseline

    for i_iter, (batch, names) in enumerate(loader):
        name = names[-1]
        if "x5t" in batch:
            # 5-clip momentum-eval layout (reference function.py:109-115):
            # xt_last=clips[0], x3t_last=clips[2], xt=clips[2], x2t=clips[3],
            # x3t=clips[4]
            batch = {"xt_last": batch["xt"], "x3t_last": batch["x3t"],
                     "xt": batch["x3t"], "x2t": batch["x4t"],
                     "x3t": batch["x5t"]}
        if sampling_mode == "momentum_sampling" and "xt_last" not in batch:
            raise ValueError(
                "momentum_sampling needs a 5-clip eval batch — run the "
                "inference CLI with --clip-num 5")
        # Reference evaluates the last batch element only (function.py:222+).
        xt = jnp.asarray(batch["xt"][-1:])
        x2t = jnp.asarray(batch["x2t"][-1:])
        x3t = jnp.asarray(batch["x3t"][-1:])
        if sampling_mode == "momentum_sampling":
            # hoisted out of the chunk loop: one H2D upload per eval batch
            xt_last = jnp.asarray(batch["xt_last"][-1:])
            x3t_last = jnp.asarray(batch["x3t_last"][-1:])

        base = os.path.join(final_output_dir, "vis", f"epoch{epoch}", str(name))
        os.makedirs(base, exist_ok=True)
        save_frames_png(np.asarray(batch["xt"][-1]), base, "x1t")
        save_frames_png(np.asarray(batch["x2t"][-1]), base, "x2t")
        save_frames_png(np.asarray(batch["x3t"][-1]), base, "x3t")

        done = 0
        while done < num_samples:
            rng, k = jax.random.split(rng)
            if sampling_mode == "momentum_sampling":
                x1p, x2p, x3p = sampler(state, xt, x2t, xt_last, x3t_last, k)
            else:
                x1p, x2p, x3p = sampler(state, xt, x2t, k)
            take = min(chunk, num_samples - done)
            # x2 prediction vs x2t (or x3t for the future-predicting baseline,
            # function.py:242)
            gt2 = x3t if is_baseline else x2t
            m2 = jax.device_get(metric_fn(x2p[:take], gt2))
            m3 = jax.device_get(metric_fn(x3p[:take], x3t))
            p2 = np.asarray(jax.device_get(denormalize_clips(x2p[:take])))
            p3 = np.asarray(jax.device_get(denormalize_clips(x3p[:take])))
            _append_metric_txts(os.path.join(base, "x2tpredict"), "x2t", m2)
            _append_metric_txts(os.path.join(base, "x3tpredict"), "x3t", m3)
            _save_pred_pngs(os.path.join(base, "x2tpredict"), "x2t", p2, m2,
                            save_images)
            _save_pred_pngs(os.path.join(base, "x3tpredict"), "x3t", p3, m3,
                            save_images)
            done += take
        logger.info("inference batch %d (%s): %d samples", i_iter, name,
                    num_samples)
