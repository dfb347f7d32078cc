"""SSIM/MS-SSIM vs an independent scipy/numpy implementation of the same
formula (gaussian window 11/1.5, K1=.01, K2=.03 — pytorch_msssim semantics,
reference lib/core/function.py:24-25)."""

import numpy as np
import scipy.ndimage as ndi

from vae2_tpu.ops.ssim import _gaussian_kernel, ms_ssim, ssim


def _np_ssim(x, y, data_range=255.0):
    """Reference SSIM with valid-mode separable gaussian, per channel."""
    k = _gaussian_kernel().astype(np.float64)
    half = len(k) // 2

    def blur(a):
        out = ndi.correlate1d(a, k, axis=0, mode="constant")
        out = ndi.correlate1d(out, k, axis=1, mode="constant")
        return out[half:-half, half:-half]

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for c in range(x.shape[-1]):
        xa, ya = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        mx, my = blur(xa), blur(ya)
        sxx = blur(xa * xa) - mx * mx
        syy = blur(ya * ya) - my * my
        sxy = blur(xa * ya) - mx * my
        m = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
            (mx * mx + my * my + c1) * (sxx + syy + c2))
        vals.append(m.mean())
    return float(np.mean(vals))


def test_ssim_identity():
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32) * 255
    assert float(ssim(x, x)) > 0.9999


def test_ssim_matches_numpy_reference():
    rng = np.random.RandomState(1)
    x = rng.rand(24, 32, 3).astype(np.float32) * 255
    y = np.clip(x + rng.randn(24, 32, 3) * 20, 0, 255).astype(np.float32)
    got = float(ssim(x[None], y[None]))
    expected = _np_ssim(x, y)
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_ssim_degrades_with_noise():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 48, 48, 3).astype(np.float32) * 255
    s_small = float(ssim(x, np.clip(x + rng.randn(*x.shape) * 5, 0, 255)))
    s_big = float(ssim(x, np.clip(x + rng.randn(*x.shape) * 60, 0, 255)))
    assert s_small > s_big


def test_ssim_degenerate_images_stay_bounded():
    """Regression: TPU convs default to bf16 passes; the gaussian blur then
    returns constant images with a ~0.2% gain, inflating sigma terms and
    producing SSIM/MS-SSIM > 1 (observed 3.5 in inference dumps). With
    precision=HIGHEST the metrics stay in [0, 1] on every backend."""
    x = np.full((1, 128, 256, 3), 124.64, np.float32)
    y = np.zeros((1, 128, 256, 3), np.float32)
    s = float(ssim(x, y))
    m = float(ms_ssim(x, y))
    assert 0.0 <= s <= 1.0, s
    assert 0.0 <= m <= 1.0, m
    assert float(ms_ssim(x, x)) > 0.9999


def test_ms_ssim_range_and_identity():
    rng = np.random.RandomState(3)
    x = rng.rand(1, 64, 64, 3).astype(np.float32) * 255
    assert float(ms_ssim(x, x)) > 0.9999
    y = np.clip(x + rng.randn(*x.shape) * 30, 0, 255).astype(np.float32)
    v = float(ms_ssim(x, y))
    assert 0.0 < v < 1.0


def test_ms_ssim_strict_mode():
    """strict=True reproduces pytorch_msssim's refusal on small images and
    is identical to the default on large-enough ones."""
    import pytest as _pytest

    import jax.numpy as jnp

    rs = np.random.RandomState(5)
    small = jnp.asarray(rs.rand(1, 32, 64, 3) * 255, jnp.float32)
    with _pytest.raises(ValueError, match="strict"):
        ms_ssim(small, small, strict=True)

    big_a = jnp.asarray(rs.rand(1, 64, 64, 3) * 255, jnp.float32)
    big_b = jnp.asarray(rs.rand(1, 64, 64, 3) * 255, jnp.float32)
    lax_v = np.asarray(ms_ssim(big_a, big_b))
    strict_v = np.asarray(ms_ssim(big_a, big_b, strict=True))
    np.testing.assert_allclose(strict_v, lax_v, atol=0)
