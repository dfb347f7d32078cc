"""Image resizing ops with torch-compatible semantics.

The reference upsamples cross-resolution features with
``F.upsample(mode='bilinear')`` (align_corners=False semantics in modern
torch) — e.g. enc_hrnet.py:835-837, 242-245. ``jax.image.resize`` with
``method='bilinear'`` uses the same half-pixel-center convention, so results
are numerically comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def resize_bilinear(x: Array, height: int, width: int) -> Array:
    """Bilinear-resize an NHWC batch to (height, width).

    Matches torch ``F.interpolate(..., mode='bilinear', align_corners=False)``.
    The resize runs in float32 for accuracy and casts back to the input dtype.
    """
    if x.shape[1] == height and x.shape[2] == width:
        return x
    out = jax.image.resize(
        x.astype(jnp.float32),
        (x.shape[0], height, width, x.shape[3]),
        method="bilinear",
    )
    return out.astype(x.dtype)


def resize_align_corners(x: Array, height: int, width: int) -> Array:
    """Bilinear resize with align_corners=True (legacy seg inference path,
    reference lib/models/seg_hrnet.py uses ALIGN_CORNERS in some forks; kept
    for completeness)."""
    if x.shape[1] == height and x.shape[2] == width:
        return x
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    ys = jnp.linspace(0.0, h - 1.0, height)
    xs = jnp.linspace(0.0, w - 1.0, width)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: xf[:, yi, :, :][:, :, xi, :]
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx)
        + g(y1, x1) * wy * wx
    )
    return out.astype(x.dtype)
