"""resize_bilinear fast path: exactness vs torch F.interpolate and the
jax.image.resize fallback (reference upsample semantics, enc_hrnet.py:835-837).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae2_tpu.ops.image import resize_bilinear

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier


def _torch_bilinear(x_nhwc, h, w):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    out = F.interpolate(t, size=(h, w), mode="bilinear", align_corners=False)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("scale", [2, 4, 8])
def test_integer_upsample_matches_torch_f32(scale):
    rs = np.random.RandomState(scale)
    x = rs.randn(2, 6, 10, 5).astype(np.float32)
    h, w = 6 * scale, 10 * scale
    got = np.asarray(resize_bilinear(jnp.asarray(x), h, w))
    want = _torch_bilinear(x, h, w)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_mixed_factor_upsample_matches_torch_f32():
    rs = np.random.RandomState(0)
    x = rs.randn(1, 8, 4, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 16, 32))  # 2x, 8x
    want = _torch_bilinear(x, 16, 32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bf16_upsample_close_to_f32_reference():
    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 8, 18).astype(np.float32)
    want = _torch_bilinear(x, 8, 16)
    got = np.asarray(
        resize_bilinear(jnp.asarray(x, jnp.bfloat16), 8, 16)
    ).astype(np.float32)
    # taps are bf16-exact (k/16 weights); error is one bf16 rounding of i/o
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_non_integer_factor_falls_back():
    rs = np.random.RandomState(2)
    x = rs.randn(1, 5, 7, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 9, 11))
    want = _torch_bilinear(x, 9, 11)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_identity_passthrough():
    x = jnp.ones((1, 4, 4, 2))
    assert resize_bilinear(x, 4, 4) is x
