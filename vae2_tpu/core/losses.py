"""Loss functions for VAE^2 training, as pure JAX functions.

Numerics match the reference criteria exactly (reference lib/core/criterion.py):

- ``l1_loss``            == L1Loss: sum-reduction / batch            (:61-69)
- ``kl_loss``            == KLLoss: sum(0.5(mu^2+e^v-v-1))/batch     (:72-87)
- ``lsgan_loss``         == lsgan_adversarial_loss: MSE vs 1/0, /B   (:90-103)
- ``psnr``               == PSNR over [0,255] images                 (:106-116)
- ``cross_entropy_loss`` == CrossEntropy (segmentation path)         (:11-27)
- ``ohem_cross_entropy`` == OhemCrossEntropy                         (:29-58)

All reductions are computed in float32 regardless of input dtype so that
bfloat16 activations don't lose precision in the large sums.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Array = jax.Array
ArrayOrList = Union[Array, Sequence[Array]]


def l1_loss(predict: Array, target: Array) -> Array:
    """Sum of absolute error, normalized by batch size only."""
    diff = jnp.abs(predict.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.sum(diff) / predict.shape[0]


def kl_loss(mu: ArrayOrList, logvar: ArrayOrList) -> Array:
    """KL(q(z|x) || N(0, I)), summed over all latent dims, / batch.

    Accepts a single array or a list of per-branch arrays (the hd_z spatial
    latent emits one (B, h_b, w_b, z_dim) map per HRNet branch; the KL is the
    sum of per-branch terms — reference criterion.py:77-83).
    """
    if isinstance(mu, (list, tuple)):
        assert isinstance(logvar, (list, tuple)) and len(mu) == len(logvar)
        total = jnp.float32(0.0)
        for m, v in zip(mu, logvar):
            total = total + _kl_single(m, v)
        return total
    return _kl_single(mu, logvar)


def _kl_single(mu: Array, logvar: Array) -> Array:
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return jnp.sum(0.5 * (mu**2 + jnp.exp(logvar) - logvar - 1.0)) / mu.shape[0]


def lsgan_loss(sample: Array, real: bool) -> Array:
    """Least-squares GAN loss: MSE against an all-ones (real) or all-zeros
    (fake) target map, sum-reduced / batch."""
    s = sample.astype(jnp.float32)
    target = jnp.ones_like(s) if real else jnp.zeros_like(s)
    return jnp.sum((s - target) ** 2) / sample.shape[0]


def psnr(img1: Array, img2: Array, data_range: float = 255.0) -> Array:
    """Peak signal-to-noise ratio for images in [0, data_range]."""
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return 20.0 * jnp.log10(data_range / jnp.sqrt(mse))


# ---------------------------------------------------------------------------
# Legacy segmentation losses (reference criterion.py:11-58). Logits are NHWC.
# ---------------------------------------------------------------------------


def _upsample_logits(score: Array, h: int, w: int) -> Array:
    if score.shape[1] != h or score.shape[2] != w:
        score = jax.image.resize(
            score, (score.shape[0], h, w, score.shape[3]), method="bilinear"
        )
    return score


def cross_entropy_loss(
    score: Array,
    target: Array,
    ignore_label: int = -1,
    class_weights: Array | None = None,
) -> Array:
    """Pixel-wise softmax cross-entropy with ignore label and class weights.

    ``score``: (B, H', W', C) logits; ``target``: (B, H, W) int labels.
    Matches torch ``nn.CrossEntropyLoss(weight, ignore_index)`` (weighted mean
    over non-ignored pixels).
    """
    b, h, w = target.shape
    score = _upsample_logits(score.astype(jnp.float32), h, w)
    num_classes = score.shape[-1]
    valid = target != ignore_label
    safe_target = jnp.where(valid, target, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(score, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_target[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        pix_w = jnp.take(class_weights.astype(jnp.float32), safe_target)
    else:
        pix_w = jnp.ones_like(nll)
    pix_w = jnp.where(valid, pix_w, 0.0)
    del num_classes
    return jnp.sum(nll * pix_w) / jnp.maximum(jnp.sum(pix_w), 1e-8)


def ohem_cross_entropy(
    score: Array,
    target: Array,
    ignore_label: int = -1,
    thres: float = 0.7,
    min_kept: int = 100000,
    class_weights: Array | None = None,
) -> Array:
    """Online hard-example mining CE (reference criterion.py:29-58).

    Keeps pixels whose predicted probability for the true class is below
    ``max(threshold, prob_of_min_kept-th-hardest pixel)`` and averages their
    (weighted) losses. Implemented with a sort over the flattened pixel set —
    static shapes, TPU-friendly.
    """
    b, h, w = target.shape
    score = _upsample_logits(score.astype(jnp.float32), h, w)
    valid = (target != ignore_label).reshape(-1)
    safe_target = jnp.where(target != ignore_label, target, 0).astype(jnp.int32)

    logp = jax.nn.log_softmax(score, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_target[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        nll = nll * jnp.take(class_weights.astype(jnp.float32), safe_target)
    nll = nll.reshape(-1)

    prob = jnp.exp(
        jnp.take_along_axis(logp, safe_target[..., None], axis=-1)[..., 0]
    ).reshape(-1)
    # Ignored pixels get prob=+inf so they sort last and never get kept.
    prob = jnp.where(valid, prob, jnp.inf)
    sorted_prob = jnp.sort(prob)
    k = jnp.minimum(min_kept, prob.shape[0] - 1)
    min_value = sorted_prob[k]
    threshold = jnp.maximum(min_value, thres)

    keep = valid & (prob < threshold)
    return jnp.sum(jnp.where(keep, nll, 0.0)) / jnp.maximum(jnp.sum(keep), 1)
