"""InceptionV3 feature extractors for FID and Inception Score, in pure JAX.

Re-implements the two inception variants the reference evaluation stack uses
(reference tools/fid_score.py:66-378, tools/inception_score.py:32-97):

- **FID inception** ("pt_inception-2015-12-05", the TF-ported weights): the
  torchvision InceptionV3 skeleton with the pytorch-fid patches — InceptionA/C
  average-pool branches use ``count_include_pad=False`` and the second
  InceptionE uses max-pool (fid_score.py:261-378). Output: 2048-d pool3
  features.
- **torchvision inception_v3**: same skeleton, unpatched pools
  (``count_include_pad=True``) + the 1000-way FC head, for Inception Score.

Everything is inference-only (BN uses stored running stats, eps=1e-3) and
functional: parameters live in a flat dict keyed by the *torch state-dict
names*, so ``load_torch_inception_weights`` can map a downloaded ``.pth``
file 1:1 (conv OIHW -> HWIO transpose). Without a weight file the net runs
randomly initialized — FID/IS are then self-consistent but not comparable to
published numbers (this container has no network egress to fetch weights).

Input convention matches pytorch-fid: float images in [0, 1], NHWC; the model
bilinearly resizes to 299x299 (align_corners=False) and scales to [-1, 1]
(fid_score.py resize_input/normalize_input).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Dict[str, Array]]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv_bn_relu(p: Dict[str, Array], x: Array, stride: int = 1,
                  padding=((0, 0), (0, 0))) -> Array:
    """BasicConv2d: conv (no bias) + BN(eps=1e-3, running stats) + ReLU.

    precision=HIGHEST: FID features must be computed in full f32 (TPU convs
    default to bf16 passes, which would shift FID vs the CUDA reference)."""
    x = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    inv = jax.lax.rsqrt(p["bn_var"] + 1e-3)
    x = (x - p["bn_mean"]) * inv * p["bn_scale"] + p["bn_bias"]
    return jax.nn.relu(x)


def _pad_for(kh: int, kw: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    return ((kh // 2, kh // 2), (kw // 2, kw // 2))


def _avg_pool(x: Array, include_pad: bool) -> Array:
    """3x3 stride-1 pad-1 average pool; include_pad toggles torch's
    ``count_include_pad`` (the FID patch sets it False)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    if include_pad:
        return summed / 9.0
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def _max_pool(x: Array, stride: int = 2, padding=0) -> Array:
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1), pad)


# ---------------------------------------------------------------------------
# inception blocks (torch state-dict naming)
# ---------------------------------------------------------------------------


def _inception_a(p: Params, prefix: str, x: Array, include_pad: bool) -> Array:
    b1 = _conv_bn_relu(p[f"{prefix}.branch1x1"], x)
    b5 = _conv_bn_relu(p[f"{prefix}.branch5x5_1"], x)
    b5 = _conv_bn_relu(p[f"{prefix}.branch5x5_2"], b5, padding=_pad_for(5, 5))
    b3 = _conv_bn_relu(p[f"{prefix}.branch3x3dbl_1"], x)
    b3 = _conv_bn_relu(p[f"{prefix}.branch3x3dbl_2"], b3, padding=_pad_for(3, 3))
    b3 = _conv_bn_relu(p[f"{prefix}.branch3x3dbl_3"], b3, padding=_pad_for(3, 3))
    bp = _avg_pool(x, include_pad)
    bp = _conv_bn_relu(p[f"{prefix}.branch_pool"], bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p: Params, prefix: str, x: Array) -> Array:
    b3 = _conv_bn_relu(p[f"{prefix}.branch3x3"], x, stride=2)
    bd = _conv_bn_relu(p[f"{prefix}.branch3x3dbl_1"], x)
    bd = _conv_bn_relu(p[f"{prefix}.branch3x3dbl_2"], bd, padding=_pad_for(3, 3))
    bd = _conv_bn_relu(p[f"{prefix}.branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x, stride=2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p: Params, prefix: str, x: Array, include_pad: bool) -> Array:
    pad17 = ((0, 0), (3, 3))
    pad71 = ((3, 3), (0, 0))
    b1 = _conv_bn_relu(p[f"{prefix}.branch1x1"], x)
    b7 = _conv_bn_relu(p[f"{prefix}.branch7x7_1"], x)
    b7 = _conv_bn_relu(p[f"{prefix}.branch7x7_2"], b7, padding=pad17)
    b7 = _conv_bn_relu(p[f"{prefix}.branch7x7_3"], b7, padding=pad71)
    bd = _conv_bn_relu(p[f"{prefix}.branch7x7dbl_1"], x)
    bd = _conv_bn_relu(p[f"{prefix}.branch7x7dbl_2"], bd, padding=pad71)
    bd = _conv_bn_relu(p[f"{prefix}.branch7x7dbl_3"], bd, padding=pad17)
    bd = _conv_bn_relu(p[f"{prefix}.branch7x7dbl_4"], bd, padding=pad71)
    bd = _conv_bn_relu(p[f"{prefix}.branch7x7dbl_5"], bd, padding=pad17)
    bp = _avg_pool(x, include_pad)
    bp = _conv_bn_relu(p[f"{prefix}.branch_pool"], bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p: Params, prefix: str, x: Array) -> Array:
    b3 = _conv_bn_relu(p[f"{prefix}.branch3x3_1"], x)
    b3 = _conv_bn_relu(p[f"{prefix}.branch3x3_2"], b3, stride=2)
    b7 = _conv_bn_relu(p[f"{prefix}.branch7x7x3_1"], x)
    b7 = _conv_bn_relu(p[f"{prefix}.branch7x7x3_2"], b7,
                       padding=((0, 0), (3, 3)))
    b7 = _conv_bn_relu(p[f"{prefix}.branch7x7x3_3"], b7,
                       padding=((3, 3), (0, 0)))
    b7 = _conv_bn_relu(p[f"{prefix}.branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x, stride=2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p: Params, prefix: str, x: Array, pool: str) -> Array:
    b1 = _conv_bn_relu(p[f"{prefix}.branch1x1"], x)
    b3 = _conv_bn_relu(p[f"{prefix}.branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn_relu(p[f"{prefix}.branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        _conv_bn_relu(p[f"{prefix}.branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
    ], axis=-1)
    bd = _conv_bn_relu(p[f"{prefix}.branch3x3dbl_1"], x)
    bd = _conv_bn_relu(p[f"{prefix}.branch3x3dbl_2"], bd, padding=_pad_for(3, 3))
    bd = jnp.concatenate([
        _conv_bn_relu(p[f"{prefix}.branch3x3dbl_3a"], bd,
                      padding=((0, 0), (1, 1))),
        _conv_bn_relu(p[f"{prefix}.branch3x3dbl_3b"], bd,
                      padding=((1, 1), (0, 0))),
    ], axis=-1)
    if pool == "max":  # FIDInceptionE_2 patch (fid_score.py:357-378)
        bp = _max_pool(x, stride=1, padding=1)
    else:  # avg, count_include_pad=False (FIDInceptionE_1, :330-354)
        bp = _avg_pool(x, include_pad=pool == "avg_incl")
    bp = _conv_bn_relu(p[f"{prefix}.branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# full networks
# ---------------------------------------------------------------------------

_STEM = [
    ("Conv2d_1a_3x3", 2, ((0, 0), (0, 0))),
    ("Conv2d_2a_3x3", 1, ((0, 0), (0, 0))),
    ("Conv2d_2b_3x3", 1, _pad_for(3, 3)),
]


def inception_forward(params: Params, x: Array, fid_variant: bool = True,
                      with_logits: bool = False) -> Array:
    """Run the network on NHWC float input in [0, 1].

    Returns pool3 features (B, 2048), or logits (B, 1000) with
    ``with_logits`` (torchvision variant for the Inception Score).
    """
    include_pad = not fid_variant  # FID patch: count_include_pad=False
    # resize to 299 + scale to [-1, 1] (fid_score.py resize/normalize_input)
    # antialias=False: torch F.interpolate does not antialias, and jax's
    # default antialiased downsample would shift FID features for inputs
    # larger than 299 (golden-tested in tests/test_torch_parity_fid.py).
    x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear",
                         antialias=False)
    x = 2.0 * x - 1.0

    for name, stride, pad in _STEM:
        x = _conv_bn_relu(params[name], x, stride=stride, padding=pad)
    x = _max_pool(x, stride=2)
    x = _conv_bn_relu(params["Conv2d_3b_1x1"], x)
    x = _conv_bn_relu(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x, stride=2)

    for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params, blk, x, include_pad)
    x = _inception_b(params, "Mixed_6a", x)
    for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, blk, x, include_pad)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x,
                     pool="avg" if fid_variant else "avg_incl")
    x = _inception_e(params, "Mixed_7c", x,
                     pool="max" if fid_variant else "avg_incl")

    feats = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
    if with_logits:
        return feats @ params["fc"]["w"] + params["fc"]["b"]
    return feats


# ---------------------------------------------------------------------------
# parameters: random init + torch import
# ---------------------------------------------------------------------------

_BLOCK_CHANNELS: List[Tuple[str, int, int]] = []  # filled lazily


def _conv_param(rng, cin: int, cout: int, kh: int, kw: int) -> Dict[str, Array]:
    k1, _ = jax.random.split(rng)
    # He scaling: with the BN constants at identity, a ReLU conv stack keeps
    # unit activation variance, so the weightless fallback's features stay
    # discriminative. (A fixed small std decays activations by ~0.8x/layer —
    # ~1e-5 after 48 layers — collapsing features to a constant and making
    # every FID ~= 0.)
    he = np.sqrt(2.0 / (kh * kw * cin)).astype(np.float32)
    w = jax.random.normal(k1, (kh, kw, cin, cout), jnp.float32) * he
    return {
        "w": w,
        "bn_scale": jnp.ones((cout,)),
        "bn_bias": jnp.zeros((cout,)),
        "bn_mean": jnp.zeros((cout,)),
        "bn_var": jnp.ones((cout,)),
    }


def _conv_specs() -> List[Tuple[str, int, int, int, int]]:
    """(name, cin, cout, kh, kw) for every BasicConv2d, matching torchvision
    inception_v3 channel math."""
    specs = [
        ("Conv2d_1a_3x3", 3, 32, 3, 3),
        ("Conv2d_2a_3x3", 32, 32, 3, 3),
        ("Conv2d_2b_3x3", 32, 64, 3, 3),
        ("Conv2d_3b_1x1", 64, 80, 1, 1),
        ("Conv2d_4a_3x3", 80, 192, 3, 3),
    ]

    def block_a(prefix, cin, pool_features):
        return [
            (f"{prefix}.branch1x1", cin, 64, 1, 1),
            (f"{prefix}.branch5x5_1", cin, 48, 1, 1),
            (f"{prefix}.branch5x5_2", 48, 64, 5, 5),
            (f"{prefix}.branch3x3dbl_1", cin, 64, 1, 1),
            (f"{prefix}.branch3x3dbl_2", 64, 96, 3, 3),
            (f"{prefix}.branch3x3dbl_3", 96, 96, 3, 3),
            (f"{prefix}.branch_pool", cin, pool_features, 1, 1),
        ]

    def block_c(prefix, c7):
        return [
            (f"{prefix}.branch1x1", 768, 192, 1, 1),
            (f"{prefix}.branch7x7_1", 768, c7, 1, 1),
            (f"{prefix}.branch7x7_2", c7, c7, 1, 7),
            (f"{prefix}.branch7x7_3", c7, 192, 7, 1),
            (f"{prefix}.branch7x7dbl_1", 768, c7, 1, 1),
            (f"{prefix}.branch7x7dbl_2", c7, c7, 7, 1),
            (f"{prefix}.branch7x7dbl_3", c7, c7, 1, 7),
            (f"{prefix}.branch7x7dbl_4", c7, c7, 7, 1),
            (f"{prefix}.branch7x7dbl_5", c7, 192, 1, 7),
            (f"{prefix}.branch_pool", 768, 192, 1, 1),
        ]

    def block_e(prefix, cin):
        return [
            (f"{prefix}.branch1x1", cin, 320, 1, 1),
            (f"{prefix}.branch3x3_1", cin, 384, 1, 1),
            (f"{prefix}.branch3x3_2a", 384, 384, 1, 3),
            (f"{prefix}.branch3x3_2b", 384, 384, 3, 1),
            (f"{prefix}.branch3x3dbl_1", cin, 448, 1, 1),
            (f"{prefix}.branch3x3dbl_2", 448, 384, 3, 3),
            (f"{prefix}.branch3x3dbl_3a", 384, 384, 1, 3),
            (f"{prefix}.branch3x3dbl_3b", 384, 384, 3, 1),
            (f"{prefix}.branch_pool", cin, 192, 1, 1),
        ]

    specs += block_a("Mixed_5b", 192, 32)
    specs += block_a("Mixed_5c", 256, 64)
    specs += block_a("Mixed_5d", 288, 64)
    specs += [
        ("Mixed_6a.branch3x3", 288, 384, 3, 3),
        ("Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1),
        ("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3),
        ("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3),
    ]
    specs += block_c("Mixed_6b", 128)
    specs += block_c("Mixed_6c", 160)
    specs += block_c("Mixed_6d", 160)
    specs += block_c("Mixed_6e", 192)
    specs += [
        ("Mixed_7a.branch3x3_1", 768, 192, 1, 1),
        ("Mixed_7a.branch3x3_2", 192, 320, 3, 3),
        ("Mixed_7a.branch7x7x3_1", 768, 192, 1, 1),
        ("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7),
        ("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1),
        ("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3),
    ]
    specs += block_e("Mixed_7b", 1280)
    specs += block_e("Mixed_7c", 2048)
    return specs


def init_inception_params(rng=None, with_fc: bool = False) -> Params:
    """Randomly initialized parameter dict (used when no .pth is available)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params: Params = {}
    for i, (name, cin, cout, kh, kw) in enumerate(_conv_specs()):
        params[name] = _conv_param(jax.random.fold_in(rng, i), cin, cout, kh, kw)
    if with_fc:
        k = jax.random.fold_in(rng, 9999)
        params["fc"] = {
            "w": jax.random.normal(k, (2048, 1000), jnp.float32) * 0.02,
            "b": jnp.zeros((1000,)),
        }
    return params


def load_torch_inception_weights(path: str, with_fc: bool = False) -> Params:
    """Import a pytorch-fid ``pt_inception-2015-12-05-*.pth`` (or torchvision
    inception_v3) state dict: conv OIHW -> HWIO, BN stats -> our keys."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params: Params = {}
    for name, cin, cout, kh, kw in _conv_specs():
        w = sd[f"{name}.conv.weight"].numpy()
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bn_scale": jnp.asarray(sd[f"{name}.bn.weight"].numpy()),
            "bn_bias": jnp.asarray(sd[f"{name}.bn.bias"].numpy()),
            "bn_mean": jnp.asarray(sd[f"{name}.bn.running_mean"].numpy()),
            "bn_var": jnp.asarray(sd[f"{name}.bn.running_var"].numpy()),
        }
        assert params[name]["w"].shape == (kh, kw, cin, cout), name
    if with_fc and "fc.weight" in sd:
        params["fc"] = {
            "w": jnp.asarray(sd["fc.weight"].numpy().T),
            "b": jnp.asarray(sd["fc.bias"].numpy()),
        }
    return params


def get_inception(weights_path: Optional[str] = None, with_fc: bool = False
                  ) -> Params:
    """Load pretrained params if a path is given/exists, else random init."""
    import os

    if weights_path and os.path.isfile(weights_path):
        return load_torch_inception_weights(weights_path, with_fc=with_fc)
    return init_inception_params(with_fc=with_fc)
