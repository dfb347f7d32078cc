"""The VAE^2 model family: encoder-dual-decoder, posterior, discriminators.

TPU-native re-design of reference lib/models/enc_hrnet.py:530-1210. Each
network is one :class:`~vae2_tpu.models.hrnet.HRNetTrunk` instance plus a
head — the reference's hand-copied ``decf_*`` / ``decp_*`` module trees
(enc_hrnet.py:545-751) collapse into three instantiations of the same trunk.

Dataflow (enc_hrnet.py:965-981): the encoder predicts the middle clip
``x2p`` from the past clip; the future and past decoders then decode ``x3p``
and ``x1p`` *from the prediction* ``x2p``, so both reconstruction gradients
flow through it. The latent z (and, in the encoder, a fresh random code) is
injected at every network's stage-4 transition.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .hrnet import (
    ConvHead,
    HRNetTrunk,
    StageSpec,
    concat_upsampled,
    stage_specs_from_extra,
    upsampled_branches,
)


from ..ops.norm import BatchNormAct

Array = jax.Array


def _head_input(feats, dataflow: str):
    """Resolve TPU.HEAD_DATAFLOW: 'concat' is the reference dataflow
    (enc_hrnet.py:833-839); 'presum' and 'multiscale' are exact rewrites —
    see ConvHead's docstring for the math and the lane-alignment rationale."""
    if dataflow == "multiscale":
        return feats
    if dataflow == "presum":
        return upsampled_branches(feats)
    if dataflow != "concat":
        raise ValueError(
            f"unknown head dataflow {dataflow!r}: "
            "expected 'concat', 'presum', or 'multiscale'")
    return concat_upsampled(feats)

_kernel_init = nn.initializers.normal(stddev=0.001)


def _remat_trunk(mode: str):
    """Resolve a remat policy ('none' | 'trunk' | 'stage') to the trunk class
    (possibly jax.checkpoint-wrapped) plus extra constructor kwargs."""
    if mode == "trunk":
        # static_argnums: (module, x, z, train, mode) -> train=3, mode=4
        return nn.remat(HRNetTrunk, static_argnums=(3, 4)), {}
    if mode == "stage":
        return HRNetTrunk, {"remat_stages": True}
    return HRNetTrunk, {}


class _TrunkWithHeads(nn.Module):
    """A video trunk + ``clip_length`` frame-prediction heads.

    The reference emits the clip through three parallel heads, one RGB frame
    each, concatenated on channels (enc_hrnet.py:323-370, 841-845).
    """

    specs: Tuple[StageSpec, ...]
    num_heads: int
    num_classes: int
    final_kernel: int
    z_mode: str
    z_dim: int
    dtype: Any
    remat: str = "none"
    head_dataflow: str = "concat"

    @nn.compact
    def __call__(self, x, z=None, train: bool = True,
                 mode: str = "full") -> Array:
        # jax.checkpoint: backward recomputes forward activations instead of
        # storing them — the 128x256 batch-8 train step does not fit HBM
        # otherwise (the reference relies on torch autograd's eager buffers +
        # smaller per-GPU memory headroom). 'trunk' wraps the whole trunk;
        # 'stage' wraps each HRModule (shorter recompute chains).
        trunk_cls, trunk_kw = _remat_trunk(self.remat)
        feats = trunk_cls(
            specs=self.specs, stem_stride=1, z_mode=self.z_mode,
            z_dim=self.z_dim, dtype=self.dtype, name="trunk", **trunk_kw,
        )(x, z, train, mode)
        if mode == "prefix":
            return feats
        y = _head_input(feats, self.head_dataflow)
        frames = [
            ConvHead(self.num_classes, self.final_kernel, self.dtype,
                     name=f"last_layer_{i + 1}")(y, train)
            for i in range(self.num_heads)
        ]
        return jnp.concatenate(frames, axis=-1)


class VAE2EncDec(nn.Module):
    """Encoder + future/past decoders (HighResolutionNetED,
    enc_hrnet.py:530-981)."""

    specs: Tuple[StageSpec, ...]
    clip_length: int = 3
    num_classes: int = 3
    final_kernel: int = 1
    is_baseline: bool = False
    baseline_mode: str = "VAE_NATIVE"
    z_dim: int = 32
    dtype: Any = jnp.bfloat16
    remat: str = "none"
    head_dataflow: str = "concat"

    def setup(self):
        det = self.baseline_mode == "DETERMINISTIC"
        enc_z = "none" if det else ("z" if self.is_baseline else "z+rand")
        dec_z = "none" if det else "z"
        head_kw = dict(
            specs=self.specs, num_heads=self.clip_length,
            num_classes=self.num_classes, final_kernel=self.final_kernel,
            z_dim=self.z_dim, dtype=self.dtype, remat=self.remat,
            head_dataflow=self.head_dataflow,
        )
        self.encoder = _TrunkWithHeads(z_mode=enc_z, name="encoder", **head_kw)
        self.dec_future = _TrunkWithHeads(z_mode=dec_z, name="dec_future", **head_kw)
        self.dec_past = _TrunkWithHeads(z_mode=dec_z, name="dec_past", **head_kw)

    def __call__(self, x: Array, z=None, train: bool = True):
        x2p = self.encoder(x, z, train)
        x3p = self.dec_future(x2p, z, train)
        x1p = self.dec_past(x2p, z, train)
        return x1p, x2p, x3p

    def encode(self, x: Array, z=None, train: bool = True) -> Array:
        return self.encoder(x, z, train)

    def decode(self, x2p: Array, z=None, train: bool = True):
        return self.dec_past(x2p, z, train), self.dec_future(x2p, z, train)

    def sample(self, x: Array, z, train: bool = False):
        """Multi-sample rollout sharing the z-independent encoder prefix.

        ``x`` is a single conditioning clip (1, H, W, C); ``z`` carries the
        sample batch S (list of (S, h_b, w_b, z_dim) maps, or (S, z_dim)).
        The encoder's stem..stage3 (which doesn't depend on z,
        enc_hrnet.py:787-817) runs once and is broadcast to all S samples;
        the z-injection + stage 4 + heads + both decoders run per sample.
        """
        if isinstance(z, (list, tuple)):
            s = z[0].shape[0]
        elif z is not None:
            s = z.shape[0]
        else:
            s = x.shape[0]
        feats = self.encoder(x, None, train, mode="prefix")
        feats = [jnp.broadcast_to(f, (s,) + f.shape[1:]) for f in feats]
        x2p = self.encoder(feats, z, train, mode="suffix")
        x3p = self.dec_future(x2p, z, train)
        x1p = self.dec_past(x2p, z, train)
        return x1p, x2p, x3p


class VAE2Posterior(nn.Module):
    """q(z | clips): trunk + latent head (HighResolutionNetEDz,
    enc_hrnet.py:984-1122).

    ``hd_z``: per-branch 1x1 convs emit a (B, h_b, w_b, 2*z_dim) spatial
    latent map per resolution (:1000-1022). Otherwise: global average pool ->
    512-wide MLP -> (B, 2*z_dim) (:1023-1041).
    """

    specs: Tuple[StageSpec, ...]
    hd_z: bool = True
    z_dim: int = 32
    dtype: Any = jnp.bfloat16
    remat: str = "none"

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        trunk_cls, trunk_kw = _remat_trunk(self.remat)
        feats = trunk_cls(
            specs=self.specs, stem_stride=1, z_mode="none",
            z_dim=self.z_dim, dtype=self.dtype, name="trunk", **trunk_kw,
        )(x, None, train, "full")
        if self.hd_z:
            outs: List[Array] = []
            for i, f in enumerate(feats):
                outs.append(
                    nn.Conv(2 * self.z_dim, (1, 1), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=_kernel_init,
                            name=f"z_layer_{i}")(f).astype(jnp.float32)
                )
            return outs
        y = concat_upsampled(feats)
        y = jnp.mean(y, axis=(1, 2))  # global average pool
        y = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=_kernel_init, name="z_fc1")(y)
        y = BatchNormAct(act="relu", dtype=self.dtype, name="z_bn")(y, train)
        y = nn.Dense(2 * self.z_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=_kernel_init, name="z_fc2")(y)
        return y.astype(jnp.float32)


class VAE2Discriminator(nn.Module):
    """LSGAN discriminator emitting a scalar map (HighResolutionNetDsc,
    enc_hrnet.py:1125-1183). ``is_sequence`` only changes the input channel
    count, which flax infers from the input."""

    specs: Tuple[StageSpec, ...]
    final_kernel: int = 1
    dtype: Any = jnp.bfloat16
    remat: str = "none"
    head_dataflow: str = "concat"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        trunk_cls, trunk_kw = _remat_trunk(self.remat)
        feats = trunk_cls(
            specs=self.specs, stem_stride=1, z_mode="none",
            dtype=self.dtype, name="trunk", **trunk_kw,
        )(x, None, train, "full")
        y = _head_input(feats, self.head_dataflow)
        return ConvHead(1, self.final_kernel, self.dtype,
                        name="last_layer")(y, train).astype(jnp.float32)


# -- factories (mirror reference enc_hrnet.py:1185-1210) ---------------------


def _common(config):
    extra = config.MODEL.EXTRA
    dtype = jnp.bfloat16 if config.TPU.DTYPE == "bfloat16" else jnp.float32
    return extra, stage_specs_from_extra(extra), dtype


def _remat(config) -> str:
    """Normalize TPU.REMAT to a policy string. Accepts legacy booleans
    (True -> 'trunk', False -> 'none') and 'none'/'trunk'/'stage'."""
    v = config.TPU.get("REMAT", True)
    if isinstance(v, str):
        if v not in ("none", "trunk", "stage"):
            raise ValueError(f"TPU.REMAT must be none|trunk|stage, got {v!r}")
        return v
    return "trunk" if v else "none"


def _head_dataflow(config) -> str:
    """Resolve the head dataflow from config. TPU.MULTISCALE_HEAD=True (the
    legacy knob) wins; otherwise TPU.HEAD_DATAFLOW ('concat' | 'presum')."""
    if bool(config.TPU.get("MULTISCALE_HEAD", False)):
        return "multiscale"
    v = str(config.TPU.get("HEAD_DATAFLOW", "concat"))
    if v not in ("concat", "presum", "multiscale"):
        raise ValueError(
            f"TPU.HEAD_DATAFLOW must be concat|presum|multiscale, got {v!r}")
    return v


def get_encdec_model(config) -> VAE2EncDec:
    extra, specs, dtype = _common(config)
    return VAE2EncDec(
        specs=specs,
        clip_length=config.TRAIN.CLIP_LENGTH,
        num_classes=config.DATASET.NUM_CLASSES,
        final_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
        is_baseline=bool(extra.IS_BASELINE),
        baseline_mode=str(extra.BASELINE_MODE),
        z_dim=int(extra.get("Z_DIM", 32)),
        dtype=dtype,
        remat=_remat(config),
        head_dataflow=_head_dataflow(config),
    )


def get_encz_model(config) -> VAE2Posterior:
    extra, specs, dtype = _common(config)
    return VAE2Posterior(
        specs=specs,
        hd_z=bool(extra.get("HD_Z", True)),
        z_dim=int(extra.get("Z_DIM", 32)),
        dtype=dtype,
        remat=_remat(config),
    )


def get_D_sequence_model(config) -> VAE2Discriminator:
    extra, specs, dtype = _common(config)
    return VAE2Discriminator(
        specs=specs, final_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
        dtype=dtype, remat=_remat(config),
        head_dataflow=_head_dataflow(config))


def get_D_frame_model(config) -> VAE2Discriminator:
    return get_D_sequence_model(config)
