"""Fused (activated) batch normalization as Pallas TPU kernels.

TPU-native rebuild of the reference's vendored InPlace-ABN C++/CUDA extension
(reference lib/models/sync_bn/inplace_abn/src/{inplace_abn_cpu.cpp,
inplace_abn_cuda.cu}; SURVEY.md section 2 components 27-31):

- **Forward**: one VMEM pass computing ``y = act((x - mean) * rsqrt(var+eps)
  * gamma + beta)`` — normalize + affine + activation fused (the CUDA
  ``forward_kernel``, inplace_abn_cuda.cu:120-168).
- **Memory-saving backward** (the InPlace-ABN trick, inplace_abn_cpu.cpp:
  92-120): the VJP saves only the *output* ``y``; the backward kernel inverts
  the (leaky-ReLU) activation in-place to recover the normalized
  pre-activation, then computes the per-channel sums ``edz = sum(dz)``,
  ``eydz = sum(y_norm * dz)`` (edz_eydz_kernel, :174-220) and
  ``dx = (dz - edz/N - y_norm * eydz/N) * gamma * rsqrt(var+eps)``
  (backward_kernel, :226-295). This means the pre-activation never has to be
  materialized in HBM between forward and backward.

Batch statistics themselves are computed *outside* the kernel with plain
jnp reductions: under a sharded ``jit`` those reductions are global across
the mesh, which IS the cross-replica SyncBN the reference implements with
queues + ``torch.cuda.comm`` (inplace_abn/functions.py:157-230).

Layout: channels-last rows ``(R, C)`` where R = N*H*W; the grid tiles R and
keeps full channel vectors in lanes. Works on any input via a reshape.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_SLOPE = 0.01  # leaky_relu slope (bn.py ABN default)
_ROW_TILE = 256


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# -- invertible activations (reference inplace_abn_cpu.cpp:92-120) ----------
#
# The memory-saving backward reconstructs the pre-activation from the stored
# OUTPUT, so only output-invertible activations qualify:
#   leaky_relu:  y<0 -> z = y/slope,   dz_eff = dz*slope
#   elu:         y<0 -> z = log1p(y),  dz_eff = dz*(y+1)   (elu' = e^z = y+1)
#   none:        identity
# All three match the reference extension's menu (inplace_abn/bn.py:23).


def _act_apply(z, act: str, slope: float):
    if act == "elu":
        # exp/log spelled without expm1/log1p: Mosaic has no lowering for
        # those primitives; f32 kernel compute keeps the error acceptable
        return jnp.where(z >= 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)
    if act == "none":
        return z
    return jnp.where(z >= 0, z, z * slope)


def _act_invert(y, dz, act: str, slope: float):
    """(pre-activation z, effective grad dz_eff) recovered from output y."""
    if act == "elu":
        z = jnp.where(y >= 0, y, jnp.log(jnp.maximum(1.0 + y, 1e-12)))
        dz_eff = jnp.where(y >= 0, dz, dz * (y + 1.0))
        return z, dz_eff
    if act == "none":
        return y, dz
    z = jnp.where(y >= 0, y, y / slope)
    dz_eff = jnp.where(y >= 0, dz, dz * slope)
    return z, dz_eff


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, mul_ref, add_ref, y_ref, *, act: str, slope: float):
    # compute (and compare) in f32: Mosaic has no bf16 vector compare on
    # this target ("Target does not support this comparison"); casts stay
    # in registers, VMEM traffic remains in the storage dtype
    y = (x_ref[:].astype(jnp.float32) * mul_ref[:].astype(jnp.float32)
         + add_ref[:].astype(jnp.float32))
    y_ref[:] = _act_apply(y, act, slope).astype(y_ref.dtype)


def _abn_rows(x2d: Array, mul: Array, add: Array, slope: float,
              act: str = "leaky_relu") -> Array:
    r, c = x2d.shape
    tile = min(_ROW_TILE, r)
    grid = (pl.cdiv(r, tile),)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, slope=slope),
        out_shape=jax.ShapeDtypeStruct((r, c), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x2d, mul[None, :], add[None, :])


def fused_abn_infer(x: Array, mean: Array, var: Array, scale: Array,
                    bias: Array, eps: float = 1e-5,
                    slope: float = DEFAULT_SLOPE,
                    act: str = "leaky_relu") -> Array:
    """Inference-mode fused BN + activation (leaky_relu/elu/none) over an
    NHWC (or any channels-last) tensor."""
    c = x.shape[-1]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    mul = (inv * scale).astype(x.dtype)
    add = (bias - mean * inv * scale).astype(x.dtype)
    y = _abn_rows(x.reshape(-1, c), mul, add, slope, act)
    return y.reshape(x.shape)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _sums_kernel(y_ref, dz_ref, gb_ref, edz_ref, eydz_ref, *, act: str,
                 slope: float):
    """Accumulate per-channel edz / eydz over row tiles
    (edz_eydz_kernel, inplace_abn_cuda.cu:174-220)."""
    i = pl.program_id(0)

    y = y_ref[:].astype(jnp.float32)
    dz = dz_ref[:].astype(jnp.float32)
    gamma = gb_ref[0:1, :].astype(jnp.float32)
    beta = gb_ref[1:2, :].astype(jnp.float32)
    # invert activation from the stored output
    z, dz_eff = _act_invert(y, dz, act, slope)
    # normalized pre-activation: (z - beta) / gamma
    y_norm = (z - beta) / gamma

    part_edz = jnp.sum(dz_eff, axis=0, keepdims=True)
    part_eydz = jnp.sum(y_norm * dz_eff, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        edz_ref[:] = jnp.zeros_like(edz_ref)
        eydz_ref[:] = jnp.zeros_like(eydz_ref)

    edz_ref[:] += part_edz
    eydz_ref[:] += part_eydz


def _dx_kernel(y_ref, dz_ref, gb_ref, stat_ref, dx_ref, *, act: str,
               slope: float, inv_n: float):
    """dx = (dz - edz/N - y_norm * eydz/N) * gamma * rsqrt(var+eps)
    (backward_kernel, inplace_abn_cuda.cu:226-295)."""
    y = y_ref[:].astype(jnp.float32)
    dz = dz_ref[:].astype(jnp.float32)
    gamma = gb_ref[0:1, :].astype(jnp.float32)
    beta = gb_ref[1:2, :].astype(jnp.float32)
    mul = stat_ref[0:1, :].astype(jnp.float32)  # gamma * rsqrt(var+eps)
    edz = stat_ref[1:2, :].astype(jnp.float32)
    eydz = stat_ref[2:3, :].astype(jnp.float32)

    z, dz_eff = _act_invert(y, dz, act, slope)
    y_norm = (z - beta) / gamma
    dx_ref[:] = ((dz_eff - edz * inv_n - y_norm * eydz * inv_n)
                 * mul).astype(dx_ref.dtype)


def _abn_bwd_rows(y2d: Array, dz2d: Array, gamma: Array, beta: Array,
                  inv_std: Array, slope: float, act: str = "leaky_relu"
                  ) -> Tuple[Array, Array, Array]:
    r, c = y2d.shape
    tile = min(_ROW_TILE, r)
    grid = (pl.cdiv(r, tile),)
    gb = jnp.stack([gamma, beta]).astype(jnp.float32)  # (2, C)

    edz, eydz = pl.pallas_call(
        functools.partial(_sums_kernel, act=act, slope=slope),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(y2d, dz2d, gb)

    stat = jnp.concatenate(
        [(gamma * inv_std)[None, :].astype(jnp.float32), edz, eydz], axis=0)

    dx = pl.pallas_call(
        functools.partial(_dx_kernel, act=act, slope=slope, inv_n=1.0 / r),
        out_shape=jax.ShapeDtypeStruct((r, c), y2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(y2d, dz2d, gb, stat)
    return dx, edz[0], eydz[0]


# ---------------------------------------------------------------------------
# custom-VJP op (training mode, batch statistics)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_abn(x: Array, scale: Array, bias: Array, eps: float = 1e-5,
              slope: float = DEFAULT_SLOPE, act: str = "leaky_relu") -> Array:
    """Training-mode fused BN(batch stats) + activation (leaky_relu/elu/
    none) with the InPlace-ABN memory-saving backward (saves y, not x)."""
    y, _ = _fused_abn_fwd(x, scale, bias, eps, slope, act)
    return y


def _fused_abn_fwd(x, scale, bias, eps, slope, act):
    c = x.shape[-1]
    x2d = x.reshape(-1, c)
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0)
    var = jnp.maximum(jnp.mean(xf * xf, axis=0) - mean**2, 0.0)
    inv_std = jax.lax.rsqrt(var + eps)
    mul = (inv_std * scale).astype(x.dtype)
    add = (bias - mean * inv_std * scale).astype(x.dtype)
    y2d = _abn_rows(x2d, mul, add, slope, act)
    y = y2d.reshape(x.shape)
    # residuals: only y + per-channel vectors — x is NOT saved
    return y, (y2d, scale, bias, inv_std, x.shape)


def _fused_abn_bwd(eps, slope, act, res, g):
    y2d, scale, bias, inv_std, x_shape = res
    c = y2d.shape[-1]
    dz2d = g.reshape(-1, c)
    dx2d, edz, eydz = _abn_bwd_rows(
        y2d, dz2d, scale, bias, inv_std, slope, act)
    # dgamma = eydz, dbeta = edz (inplace_abn_cpu.cpp:74-90)
    return dx2d.reshape(x_shape), eydz.astype(scale.dtype), \
        edz.astype(bias.dtype)


fused_abn.defvjp(_fused_abn_fwd, _fused_abn_bwd)
