"""Batch normalization with torch-exact semantics, fused activation.

This is the TPU-native replacement for the reference's BatchNorm2d /
SyncBatchNorm / InPlace-ABN stack (reference lib/models/sync_bn/inplace_abn;
see SURVEY.md section 2 components 27-31):

- **Statistics semantics** match torch BN with ``momentum=0.01``
  (enc_hrnet.py:23): normalization uses the *biased* batch variance; the
  running-variance update uses the *unbiased* (Bessel-corrected) estimate
  (inplace_abn/functions.py:97-98); running stats update as
  ``new = (1-m)*old + m*batch``.
- **SyncBN semantics come for free**: under ``jit`` with the batch sharded
  across a mesh axis, the mean/variance reductions below are global — XLA
  inserts the cross-replica ``all-reduce`` automatically, replacing the
  reference's queue+``torch.cuda.comm`` machinery (functions.py:157-230)
  and ``nn.SyncBatchNorm`` (tools/train.py:216-218).
- **Fusion**: the BN+activation pair is expressed as one elementwise epilogue
  that XLA fuses into the producing convolution. An optional Pallas kernel
  backend (``vae2_tpu.ops.pallas.fused_abn``) covers the InPlace-ABN-style
  activation-inverting backward for memory-bound cases.

Stats and affine parameters are kept in float32 regardless of the compute
dtype (bfloat16 activations) — matmul in bf16, statistics in f32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Default BN+act backend, set once at startup from config TPU.FUSED_ABN by
# the model builders ('xla': plain jnp epilogue XLA fuses into the producing
# conv; 'pallas': the InPlace-ABN Pallas kernels with the activation-
# inverting memory-saving backward). Read at trace time — flip it only
# before building/jitting models.
_DEFAULT_BACKEND = "xla"


def set_default_bn_backend(backend: str) -> None:
    global _DEFAULT_BACKEND
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown BN backend: {backend}")
    _DEFAULT_BACKEND = backend


# InPlace-ABN's memory-saving backward reconstructs the normalized
# pre-activation from the *output* — possible only for invertible
# activations (leaky_relu: y/slope for y<0; elu: log1p(y); identity).
# True ReLU destroys the negative values that BN's backward still needs
# (dx_i couples every position through the edz/eydz reduction terms),
# which is exactly why the reference's vendored extension only offers
# leaky_relu/elu/none (inplace_abn/bn.py:23, inplace_abn_cpu.cpp:92-120)
# and why its *video* model sticks to plain nn.BatchNorm2d + nn.ReLU
# (enc_hrnet.py:22). 'relu' therefore falls back to the XLA epilogue path
# (warned once) instead of silently changing the model's math.
# Maps act name -> (pallas act tag, slope).
_PALLAS_ACTS = {None: ("none", 1.0), "none": ("none", 1.0),
                "leaky_relu": ("leaky_relu", 0.01), "elu": ("elu", 1.0)}
_warned_relu_fallback = False


def _apply_act(x: Array, act: Optional[str]) -> Array:
    if act is None or act == "none":
        return x
    if act == "relu":
        return jax.nn.relu(x)
    if act == "leaky_relu":
        return jax.nn.leaky_relu(x, negative_slope=0.01)
    if act == "elu":
        return jax.nn.elu(x)
    raise ValueError(f"Unknown activation: {act}")


class BatchNormAct(nn.Module):
    """BatchNorm over all axes but the last (channel), optional fused act.

    Attributes:
      momentum: torch-style momentum (fraction of the *new* batch statistic),
        0.01 to match ``BN_MOMENTUM`` at reference enc_hrnet.py:23.
      epsilon: numerical epsilon (torch default 1e-5).
      act: optional fused activation ('relu' | 'leaky_relu' | 'elu' | None).
      dtype: output/compute dtype for the normalized activations.
      use_scale_bias: affine parameters (gamma init 1, beta init 0).
    """

    momentum: float = 0.01
    epsilon: float = 1e-5
    act: Optional[str] = None
    dtype: Any = jnp.float32
    use_scale_bias: bool = True
    axis_name: Optional[str] = None  # only needed under shard_map/pmap
    backend: Optional[str] = None  # None: module default (set from config)

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        features = x.shape[-1]
        scale = (
            self.param("scale", nn.initializers.ones, (features,), jnp.float32)
            if self.use_scale_bias
            else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            if self.use_scale_bias
            else None
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        backend = self.backend or _DEFAULT_BACKEND
        # pallas path covers the ABN-invertible activations; explicit
        # axis_name (shard_map/pmap) stays on the xla path, whose stats
        # reductions carry the pmean.
        use_pallas = (backend == "pallas" and self.use_scale_bias
                      and self.act in _PALLAS_ACTS
                      and self.axis_name is None)
        if backend == "pallas" and self.act == "relu":
            global _warned_relu_fallback
            if not _warned_relu_fallback:
                _warned_relu_fallback = True
                import warnings

                warnings.warn(
                    "TPU.FUSED_ABN='pallas': true-ReLU layers use the XLA "
                    "epilogue path (ReLU is not invertible from outputs, so "
                    "the InPlace-ABN memory-saving backward cannot apply "
                    "without changing model semantics). Pallas engages on "
                    "leaky_relu/none layers only.")

        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(xf * xf, axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            # Element count of the (global) reduction, for Bessel correction.
            n = 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        if use_pallas:
            from .pallas.abn import fused_abn, fused_abn_infer

            act_tag, slope = _PALLAS_ACTS[self.act]
            xc = x.astype(self.dtype)
            if train:
                # fused_abn normalizes with batch stats it computes itself
                # (identical jnp reductions — XLA CSEs them with the
                # running-stat update above) and saves only y for the
                # activation-inverting backward.
                return fused_abn(xc, scale, bias, self.epsilon, slope,
                                 act_tag)
            return fused_abn_infer(xc, mean, var, scale, bias,
                                   self.epsilon, slope, act_tag)

        # Fold (mean, var, scale, bias) into per-channel (mul, add) in f32,
        # then do the big elementwise normalize in the compute dtype — an f32
        # elementwise here would materialize full-resolution f32 temps
        # (2x HBM) wherever XLA can't fuse across the trunk boundary.
        inv = jax.lax.rsqrt(var + self.epsilon)
        if scale is not None:
            mul = inv * scale
            add = bias - mean * mul
        else:
            mul = inv
            add = -mean * mul
        y = x.astype(self.dtype) * mul.astype(self.dtype) + add.astype(self.dtype)
        return _apply_act(y, self.act)


def batch_norm_infer(
    x: Array,
    mean: Array,
    var: Array,
    scale: Array,
    bias: Array,
    epsilon: float = 1e-5,
    act: Optional[str] = None,
) -> Array:
    """Stateless inference-mode BN+act, for weight-ported eval paths."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + epsilon)
    mul = inv * scale
    add = bias - mean * mul
    return _apply_act(x.astype(jnp.float32) * mul + add, act).astype(x.dtype)
