"""Golden tests pinning the FID feature path against torch numerics.

The reference computes FID through torch ops (F.interpolate bilinear
align_corners=False, AvgPool2d(count_include_pad=False), MaxPool2d,
Conv2d+BatchNorm2d(eps=1e-3) — /root/reference/tools/fid_score.py:190-200,
261-378). torch (CPU) is in the container, so every primitive in
vae2_tpu/models/inception.py is pinned against its torch counterpart on
fixed arrays; no pretrained weights are needed. Drift tolerance 2e-5 abs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vae2_tpu.models import inception  # noqa: E402

pytestmark = pytest.mark.slow  # heavyweight jit compiles; excluded from the cold-container smoke tier

ATOL = 2e-5


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def _to_torch_nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_torch_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# bilinear resize to 299 (fid_score.py:196-200)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(64, 128), (128, 256), (350, 400)])
def test_resize_bilinear_matches_torch_interpolate(hw):
    """Upsample (the 128x256 reference workload) AND downsample (>299 inputs,
    where jax's default antialias would diverge from torch)."""
    x = _rand((2, *hw, 3), seed=1)
    want = _from_torch_nchw(F.interpolate(
        _to_torch_nchw(x), size=(299, 299), mode="bilinear",
        align_corners=False))
    got = np.asarray(jax.image.resize(
        jnp.asarray(x), (2, 299, 299, 3), "bilinear", antialias=False))
    np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# pools (fid_score.py FIDInceptionA/C/E patches)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("include_pad", [True, False])
def test_avg_pool_matches_torch(include_pad):
    x = _rand((2, 17, 23, 5), seed=2)
    want = _from_torch_nchw(F.avg_pool2d(
        _to_torch_nchw(x), kernel_size=3, stride=1, padding=1,
        count_include_pad=include_pad))
    got = np.asarray(inception._avg_pool(jnp.asarray(x), include_pad))
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("stride,padding", [(2, 0), (1, 1)])
def test_max_pool_matches_torch(stride, padding):
    x = _rand((2, 19, 21, 4), seed=3)
    want = _from_torch_nchw(F.max_pool2d(
        _to_torch_nchw(x), kernel_size=3, stride=stride, padding=padding))
    got = np.asarray(inception._max_pool(
        jnp.asarray(x), stride=stride, padding=padding))
    np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# BasicConv2d: conv(bias=False) + BN(eps=1e-3, running stats) + relu
# ---------------------------------------------------------------------------


def _torch_conv_bn_relu(x_nchw, w_oihw, bn, stride, padding):
    y = F.conv2d(x_nchw, torch.from_numpy(w_oihw), stride=stride,
                 padding=padding)
    y = F.batch_norm(
        y, torch.from_numpy(bn["mean"]), torch.from_numpy(bn["var"]),
        torch.from_numpy(bn["scale"]), torch.from_numpy(bn["bias"]),
        training=False, eps=1e-3)
    return F.relu(y)


@pytest.mark.parametrize("kh,kw,stride,pad", [
    (3, 3, 2, 0),   # stem Conv2d_1a
    (5, 5, 1, 2),   # InceptionA branch5x5_2
    (1, 7, 1, (0, 3)),  # InceptionC branch7x7_2
])
def test_conv_bn_relu_matches_torch(kh, kw, stride, pad):
    cin, cout = 7, 11
    rs = np.random.RandomState(4)
    x = rs.rand(2, 20, 24, cin).astype(np.float32)
    w_oihw = (rs.rand(cout, cin, kh, kw).astype(np.float32) - 0.5) * 0.2
    bn = {
        "scale": rs.rand(cout).astype(np.float32) + 0.5,
        "bias": (rs.rand(cout).astype(np.float32) - 0.5),
        "mean": (rs.rand(cout).astype(np.float32) - 0.5) * 0.1,
        "var": rs.rand(cout).astype(np.float32) + 0.5,
    }
    want = _from_torch_nchw(_torch_conv_bn_relu(
        _to_torch_nchw(x), w_oihw, bn, stride, pad))

    p = {
        "w": jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0))),
        "bn_scale": jnp.asarray(bn["scale"]),
        "bn_bias": jnp.asarray(bn["bias"]),
        "bn_mean": jnp.asarray(bn["mean"]),
        "bn_var": jnp.asarray(bn["var"]),
    }
    if isinstance(pad, tuple):
        jpad = ((pad[0], pad[0]), (pad[1], pad[1]))
    else:
        jpad = ((pad, pad), (pad, pad))
    got = np.asarray(inception._conv_bn_relu(
        p, jnp.asarray(x), stride=stride, padding=jpad))
    np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# a full FIDInceptionA block, composed (fid_score.py:307-328)
# ---------------------------------------------------------------------------


def test_inception_a_block_matches_torch_composition():
    """Compose the same 7 conv-bn units + count_include_pad=False avg pool in
    torch and compare against _inception_a on random params."""
    cin, pool_features = 192, 32
    params = {}
    torch_units = {}
    rs = np.random.RandomState(5)
    specs = [
        ("branch1x1", cin, 64, 1, 1, 0),
        ("branch5x5_1", cin, 48, 1, 1, 0),
        ("branch5x5_2", 48, 64, 5, 5, 2),
        ("branch3x3dbl_1", cin, 64, 1, 1, 0),
        ("branch3x3dbl_2", 64, 96, 3, 3, 1),
        ("branch3x3dbl_3", 96, 96, 3, 3, 1),
        ("branch_pool", cin, pool_features, 1, 1, 0),
    ]
    for name, ci, co, kh, kw, pad in specs:
        w = (rs.rand(co, ci, kh, kw).astype(np.float32) - 0.5) * 0.1
        bn = {
            "scale": rs.rand(co).astype(np.float32) + 0.5,
            "bias": (rs.rand(co).astype(np.float32) - 0.5),
            "mean": (rs.rand(co).astype(np.float32) - 0.5) * 0.1,
            "var": rs.rand(co).astype(np.float32) + 0.5,
        }
        torch_units[name] = (w, bn, pad)
        params[f"blk.{name}"] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bn_scale": jnp.asarray(bn["scale"]),
            "bn_bias": jnp.asarray(bn["bias"]),
            "bn_mean": jnp.asarray(bn["mean"]),
            "bn_var": jnp.asarray(bn["var"]),
        }

    x = rs.rand(1, 15, 17, cin).astype(np.float32)
    xt = _to_torch_nchw(x)

    def unit(name, inp):
        w, bn, pad = torch_units[name]
        return _torch_conv_bn_relu(inp, w, bn, 1, pad)

    b1 = unit("branch1x1", xt)
    b5 = unit("branch5x5_2", unit("branch5x5_1", xt))
    b3 = unit("branch3x3dbl_3",
              unit("branch3x3dbl_2", unit("branch3x3dbl_1", xt)))
    bp = unit("branch_pool", F.avg_pool2d(
        xt, 3, stride=1, padding=1, count_include_pad=False))
    want = _from_torch_nchw(torch.cat([b1, b5, b3, bp], dim=1))

    got = np.asarray(inception._inception_a(
        params, "blk", jnp.asarray(x), include_pad=False))
    np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# optional full-FID agreement when real weights exist (no egress -> usually
# skipped; runs automatically if someone drops the .pth in place)
# ---------------------------------------------------------------------------


def test_full_inception_matches_torch_weights_if_available():
    import os

    path = os.environ.get(
        "FID_WEIGHTS", "data/pt_inception-2015-12-05-6726825d.pth")
    if not os.path.isfile(path):
        pytest.skip("no pretrained FID inception weights in container")
    params = inception.load_torch_inception_weights(path)
    x = _rand((2, 128, 256, 3), seed=6)
    feats = np.asarray(inception.inception_forward(
        params, jnp.asarray(x), fid_variant=True))
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
