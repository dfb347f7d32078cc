"""Image resizing ops with torch-compatible semantics.

The reference upsamples cross-resolution features with
``F.upsample(mode='bilinear')`` (align_corners=False semantics in modern
torch) — e.g. enc_hrnet.py:835-837, 242-245. All paths here implement the
same half-pixel-center convention with clamped (edge-replicating) taps, so
results are numerically interchangeable with torch ``F.interpolate``.

TPU lowering notes (why this isn't just ``jax.image.resize``):

- ``jax.image.resize`` lowers to general gather/matmul chains in f32,
  materializing f32 copies of large activations on the hot path.
- A phase-interleave (stack+reshape, or interior-pad+sum) along the *lane*
  (W/C-minor) axis materializes one full-size temp per phase: at the
  flagship head's 256x128x256x270 that is 4.25 GB each and OOMs HBM.
- Therefore: the W axis is upsampled as a small matmul against a constant
  interpolation matrix (MXU work, one output buffer, no temps), and the H
  axis by phase-stacking — merging (h, s) into H is a *major*-dims reshape,
  which is layout-preserving and free.
- For the integer factors HRNet uses (2/4/8) every interpolation weight is
  a multiple of 1/16 and therefore exact in bfloat16.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


@lru_cache(maxsize=64)
def _interp_matrix(n: int, out: int) -> np.ndarray:
    """(n, out) f32 matrix M with out[i] = sum_j M[j, i] * in[j] — half-pixel
    bilinear with clamped taps (torch align_corners=False)."""
    m = np.zeros((n, out), np.float32)
    scale = n / out
    for i in range(out):
        src = (i + 0.5) * scale - 0.5
        j0 = math.floor(src)
        f = src - j0
        j0c = min(max(j0, 0), n - 1)
        j1c = min(max(j0 + 1, 0), n - 1)
        m[j0c, i] += 1.0 - f
        m[j1c, i] += f
    return m


def _upsample_w_matmul(x: Array, width: int) -> Array:
    """Upsample axis 2 of NHWC via matmul with the interpolation matrix."""
    w = x.shape[2]
    if w == width:
        return x
    mat = jnp.asarray(_interp_matrix(w, width), dtype=x.dtype)
    # No preferred_element_type: the TPU MXU accumulates bf16 dots in f32
    # internally, and the CPU backend (tests) lacks BF16xBF16->F32 dots.
    return jnp.einsum("bhwc,wW->bhWc", x, mat)


def _upsample_h_phases(x: Array, s: int) -> Array:
    """Upsample axis 1 of NHWC by integer factor s via 2-tap phase stacking.

    The (h, s) -> H merge is a reshape over untiled major dims — free on TPU.
    """
    if s == 1:
        return x
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    phases = []
    for p in range(s):
        src = (p + 0.5) / s - 0.5
        d = math.floor(src)
        f = jnp.float32(src - d)
        a = lax.slice_in_dim(xp, 1 + d, 1 + d + h, axis=1)
        bb = lax.slice_in_dim(xp, 2 + d, 2 + d + h, axis=1)
        phases.append((a.astype(jnp.float32) * (1.0 - f)
                       + bb.astype(jnp.float32) * f).astype(x.dtype))
    return jnp.stack(phases, axis=2).reshape(b, h * s, w, c)


def resize_bilinear(x: Array, height: int, width: int) -> Array:
    """Bilinear-resize an NHWC batch to (height, width).

    Matches torch ``F.interpolate(..., mode='bilinear', align_corners=False)``
    (reference enc_hrnet.py:835-837, 242-245). Integer upscale factors take
    the fused W-matmul + H-phase-stack fast path (see module docstring);
    anything else falls back to ``jax.image.resize`` in float32.
    """
    b, h, w, c = x.shape
    if h == height and w == width:
        return x
    if height % h == 0 and width % w == 0:
        return _upsample_h_phases(_upsample_w_matmul(x, width), height // h)
    out = jax.image.resize(
        x.astype(jnp.float32), (b, height, width, c), method="bilinear")
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
