"""HRNet multi-resolution trunk, TPU-first (flax, NHWC, bf16 on the MXU).

One reusable, shape-parameterized trunk replaces the reference's four
copy-pasted network bodies (encoder / decoder-future / decoder-past /
posterior / discriminators — reference lib/models/enc_hrnet.py:259-1183).
Architecture parity:

- Stem: two 3x3 convs (stride 2 for the legacy seg net, stride 1 for all
  video nets — enc_hrnet.py:271-277 vs :539-543) + BN + ReLU.
- Stage 1: a chain of Bottleneck/Basic blocks (:33-103, 408-423).
- Stages 2-4: ``HighResolutionModule``s — per-branch block chains followed by
  full cross-resolution fusion (1x1 conv + BN + bilinear-upsample for
  low->high, chains of stride-2 3x3 convs for high->low; :106-250).
- Transitions: channel-adapting 3x3 convs and stride-2 downsample chains for
  new branches (:372-406).
- Latent injection at the stage-4 transition: channel-concat of
  [random-code map, posterior-z map, features] per branch, then a 3x3
  conv+BN+ReLU back to the branch width (``transition3_e``; :314-316,
  818-830). Decoders concat only the z map (:590-592, 880-888).

Layout is NHWC (channels-last) — the native TPU convolution layout. Convs
compute in ``dtype`` (bfloat16 by default) with float32 parameters; BN
statistics are always float32 (see vae2_tpu/ops/norm.py).

Deviation from the reference (documented): in stage-3/4 transitions the
reference applies a channel-adapting conv to the *last* branch's features
even for pre-existing branches (enc_hrnet.py:484, 492 — ``y_list[-1]``);
with every shipped stage spec that code path is dead because pre-existing
branch widths always match. We implement the well-defined semantics
(adapt branch i from branch i) which is identical for all valid specs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm import BatchNormAct
from ..ops.image import resize_bilinear

Array = jax.Array

_kernel_init = nn.initializers.normal(stddev=0.001)


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """One HRNet stage (mirrors the MODEL.EXTRA.STAGEn config nodes)."""

    num_modules: int
    num_branches: int
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]
    block: str  # 'BASIC' | 'BOTTLENECK'
    fuse_method: str = "SUM"

    @property
    def expansion(self) -> int:
        return 4 if self.block == "BOTTLENECK" else 1

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return tuple(c * self.expansion for c in self.num_channels)


def stage_specs_from_extra(extra) -> Tuple[StageSpec, StageSpec, StageSpec, StageSpec]:
    """Parse MODEL.EXTRA.STAGE1..4 into StageSpecs."""
    out = []
    for i in (1, 2, 3, 4):
        s = extra[f"STAGE{i}"]
        out.append(
            StageSpec(
                num_modules=int(s["NUM_MODULES"]),
                num_branches=int(s["NUM_BRANCHES"]),
                num_blocks=tuple(s["NUM_BLOCKS"]),
                num_channels=tuple(s["NUM_CHANNELS"]),
                block=str(s["BLOCK"]),
                fuse_method=str(s.get("FUSE_METHOD", "SUM")),
            )
        )
    return tuple(out)


def _conv(features: int, kernel: int, stride: int, dtype, name: str) -> nn.Conv:
    # torch-style symmetric padding ((k-1)//2 both sides, reference
    # conv3x3/enc_hrnet.py:27-30). For stride 1 this equals SAME; for the
    # stride-2 downsample convs it does NOT: SAME pads (0, 1) and samples
    # even rows, torch pads (1, 1) and samples odd-1 rows — a one-pixel
    # shift that breaks weight-import parity (caught by
    # tests/test_torch_model_parity.py).
    p = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((p, p), (p, p)),
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=_kernel_init,
        name=name,
    )


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (enc_hrnet.py:33-62)."""

    features: int
    stride: int = 1
    use_projection: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        residual = x
        y = _conv(self.features, 3, self.stride, self.dtype, "conv1")(x)
        y = BatchNormAct(act="relu", dtype=self.dtype, name="bn1")(y, train)
        y = _conv(self.features, 3, 1, self.dtype, "conv2")(y)
        y = BatchNormAct(act=None, dtype=self.dtype, name="bn2")(y, train)
        if self.use_projection:
            residual = _conv(self.features, 1, self.stride, self.dtype, "down_conv")(x)
            residual = BatchNormAct(act=None, dtype=self.dtype, name="down_bn")(
                residual, train)
        return jax.nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) residual block (enc_hrnet.py:65-103)."""

    features: int  # inner width; output is 4*features
    stride: int = 1
    use_projection: bool = False
    dtype: Any = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        residual = x
        out_features = self.features * self.expansion
        y = _conv(self.features, 1, 1, self.dtype, "conv1")(x)
        y = BatchNormAct(act="relu", dtype=self.dtype, name="bn1")(y, train)
        y = _conv(self.features, 3, self.stride, self.dtype, "conv2")(y)
        y = BatchNormAct(act="relu", dtype=self.dtype, name="bn2")(y, train)
        y = _conv(out_features, 1, 1, self.dtype, "conv3")(y)
        y = BatchNormAct(act=None, dtype=self.dtype, name="bn3")(y, train)
        if self.use_projection:
            residual = _conv(out_features, 1, self.stride, self.dtype, "down_conv")(x)
            residual = BatchNormAct(act=None, dtype=self.dtype, name="down_bn")(
                residual, train)
        return jax.nn.relu(y + residual)


def _make_block(block: str, features: int, use_projection: bool, dtype,
                name: str):
    cls = Bottleneck if block == "BOTTLENECK" else BasicBlock
    return cls(features=features, use_projection=use_projection, dtype=dtype,
               name=name)


class BlockChain(nn.Module):
    """A sequence of residual blocks forming one branch / stage-1 layer."""

    block: str
    features: int
    num_blocks: int
    in_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        expansion = 4 if self.block == "BOTTLENECK" else 1
        out_c = self.features * expansion
        for i in range(self.num_blocks):
            project = i == 0 and self.in_channels != out_c
            x = _make_block(self.block, self.features, project, self.dtype,
                            f"block{i}")(x, train)
        return x


class FuseLayer(nn.Module):
    """Cross-resolution fusion: every output branch receives every input
    branch, adapted in resolution and width (enc_hrnet.py:177-250)."""

    in_channels: Tuple[int, ...]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: List[Array], train: bool = True) -> List[Array]:
        n = len(xs)
        outs = []
        for i in range(n):
            h, w = xs[i].shape[1], xs[i].shape[2]
            y = None
            for j in range(n):
                if j == i:
                    t = xs[j]
                elif j > i:
                    # low-res -> high-res: 1x1 conv + BN, bilinear upsample
                    t = _conv(self.in_channels[i], 1, 1, self.dtype,
                              f"up_{i}_{j}_conv")(xs[j])
                    t = BatchNormAct(act=None, dtype=self.dtype,
                                     name=f"up_{i}_{j}_bn")(t, train)
                    t = resize_bilinear(t, h, w)
                else:
                    # high-res -> low-res: chain of stride-2 3x3 convs
                    t = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        c = self.in_channels[i] if last else self.in_channels[j]
                        t = _conv(c, 3, 2, self.dtype,
                                  f"down_{i}_{j}_{k}_conv")(t)
                        t = BatchNormAct(act=None if last else "relu",
                                         dtype=self.dtype,
                                         name=f"down_{i}_{j}_{k}_bn")(t, train)
                y = t if y is None else y + t
            outs.append(jax.nn.relu(y))
        return outs


class HRModule(nn.Module):
    """num_branches parallel block chains + one fusion (enc_hrnet.py:106-250)."""

    spec: StageSpec
    in_channels: Tuple[int, ...]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: List[Array], train: bool = True) -> List[Array]:
        assert len(xs) == self.spec.num_branches
        ys = []
        for b in range(self.spec.num_branches):
            ys.append(
                BlockChain(
                    block=self.spec.block,
                    features=self.spec.num_channels[b],
                    num_blocks=self.spec.num_blocks[b],
                    in_channels=self.in_channels[b],
                    dtype=self.dtype,
                    name=f"branch{b}",
                )(xs[b], train)
            )
        if self.spec.num_branches == 1:
            return ys
        return FuseLayer(
            in_channels=self.spec.out_channels, dtype=self.dtype, name="fuse"
        )(ys, train)


class Transition(nn.Module):
    """Adapt the previous stage's branches to the next stage's widths and
    create new lower-resolution branches (enc_hrnet.py:372-406)."""

    in_channels: Tuple[int, ...]
    out_channels: Tuple[int, ...]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: List[Array], train: bool = True) -> List[Array]:
        n_pre = len(self.in_channels)
        outs = []
        for i, c_out in enumerate(self.out_channels):
            if i < n_pre:
                if self.in_channels[i] != c_out:
                    t = _conv(c_out, 3, 1, self.dtype, f"adapt{i}_conv")(xs[i])
                    t = BatchNormAct(act="relu", dtype=self.dtype,
                                     name=f"adapt{i}_bn")(t, train)
                    outs.append(t)
                else:
                    outs.append(xs[i])
            else:
                # new branch: chain of stride-2 convs from the last branch
                t = xs[-1]
                for j in range(i + 1 - n_pre):
                    c = c_out if j == i - n_pre else self.in_channels[-1]
                    t = _conv(c, 3, 2, self.dtype, f"new{i}_{j}_conv")(t)
                    t = BatchNormAct(act="relu", dtype=self.dtype,
                                     name=f"new{i}_{j}_bn")(t, train)
                outs.append(t)
        return outs


def gen_code_maps(code: Array, features: List[Array]) -> List[Array]:
    """Tile a (B, z) code spatially to each branch's (B, h_b, w_b, z)
    (enc_hrnet.py:454-462)."""
    maps = []
    for f in features:
        maps.append(
            jnp.broadcast_to(
                code[:, None, None, :],
                (code.shape[0], f.shape[1], f.shape[2], code.shape[-1]),
            )
        )
    return maps


class ZInject(nn.Module):
    """The ``transition3_e`` latent-injection layer: per-branch concat of
    code maps with features, then 3x3 conv+BN+ReLU back to the branch width
    (enc_hrnet.py:314-316, 818-830)."""

    out_channels: Tuple[int, ...]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: List[Array], code_maps: List[List[Array]],
                 train: bool = True) -> List[Array]:
        outs = []
        for i, x in enumerate(xs):
            parts = [m[i].astype(x.dtype) for m in code_maps] + [x]
            t = jnp.concatenate(parts, axis=-1)
            t = _conv(self.out_channels[i], 3, 1, self.dtype,
                      f"inject{i}_conv")(t)
            t = BatchNormAct(act="relu", dtype=self.dtype,
                             name=f"inject{i}_bn")(t, train)
            outs.append(t)
        return outs


class HRNetTrunk(nn.Module):
    """Stem + stage1 + (transition, stage)x3, with optional latent injection.

    ``z_mode``:
      - 'none'  : plain trunk (posterior, discriminators, seg net)
      - 'z'     : concat posterior-z maps at the stage-4 transition (decoders;
                  baseline encoder)
      - 'z+rand': concat [fresh random code map, z map] (non-baseline encoder)

    Returns the list of stage-4 branch feature maps (highest resolution
    first). Heads live outside the trunk.
    """

    specs: Tuple[StageSpec, StageSpec, StageSpec, StageSpec]
    stem_stride: int = 1
    z_mode: str = "none"
    z_dim: int = 32
    dtype: Any = jnp.bfloat16
    # Per-stage rematerialization: wrap each HRModule in jax.checkpoint so the
    # backward recomputes one stage at a time (finer-grained than wrapping the
    # whole trunk — shorter recompute chains, same activation savings).
    remat_stages: bool = False

    @nn.compact
    def __call__(self, x, z: Optional[Any] = None, train: bool = True,
                 mode: str = "full") -> List[Array]:
        """mode: 'full' (default), or the two halves used by multi-sample
        inference to share the z-independent computation across samples
        (see VAE2EncDec.sample): 'prefix' runs stem..transition3 and returns
        the branch list; 'suffix' takes that list as ``x`` and runs the
        z-injection + stage 4."""
        assert mode in ("full", "prefix", "suffix")
        s1, s2, s3, s4 = self.specs
        # static_argnums: (module, xs, train) -> train is arg 2
        module_cls = (nn.remat(HRModule, static_argnums=(2,))
                      if self.remat_stages else HRModule)

        if mode in ("full", "prefix"):
            x = x.astype(self.dtype)
            # Stem (enc_hrnet.py:271-277 / :539-543)
            x = _conv(64, 3, self.stem_stride, self.dtype, "conv1")(x)
            x = BatchNormAct(act="relu", dtype=self.dtype, name="bn1")(x, train)
            x = _conv(64, 3, self.stem_stride, self.dtype, "conv2")(x)
            x = BatchNormAct(act="relu", dtype=self.dtype, name="bn2")(x, train)

            # Stage 1 (enc_hrnet.py:280-285)
            x = BlockChain(
                block=s1.block, features=s1.num_channels[0],
                num_blocks=s1.num_blocks[0], in_channels=64, dtype=self.dtype,
                name="layer1",
            )(x, train)

            # Stages 2..3 + the stage-4 transition
            xs = [x]
            prev_channels = (s1.out_channels[0],)
            for idx, spec in ((2, s2), (3, s3), (4, s4)):
                xs = Transition(
                    in_channels=prev_channels, out_channels=spec.out_channels,
                    dtype=self.dtype, name=f"transition{idx - 1}",
                )(xs, train)
                if idx == 4:
                    break
                for m in range(spec.num_modules):
                    xs = module_cls(
                        spec=spec, in_channels=spec.out_channels,
                        dtype=self.dtype, name=f"stage{idx}_module{m}",
                    )(xs, train)
                prev_channels = spec.out_channels
            if mode == "prefix":
                return xs
        else:
            xs = list(x)

        if self.z_mode != "none":
            xs = self._inject_z(xs, z, s4, train)
        for m in range(s4.num_modules):
            xs = module_cls(
                spec=s4, in_channels=s4.out_channels, dtype=self.dtype,
                name=f"stage4_module{m}",
            )(xs, train)
        return xs

    def _inject_z(self, xs: List[Array], z, spec: StageSpec,
                  train: bool) -> List[Array]:
        # Posterior z: either per-branch spatial maps (hd_z) or a (B, z_dim)
        # vector tiled spatially (enc_hrnet.py:818-830).
        if isinstance(z, (list, tuple)):
            z_maps = list(z)
        else:
            assert z is not None, "z required when z_mode != 'none'"
            z_maps = gen_code_maps(z, xs)
        code_maps = [z_maps]
        if self.z_mode == "z+rand":
            rng = self.make_rng("sample")
            rand = jax.random.normal(rng, (xs[0].shape[0], self.z_dim),
                                     jnp.float32)
            code_maps = [gen_code_maps(rand, xs), z_maps]
        return ZInject(
            out_channels=spec.out_channels, dtype=self.dtype, name="transition3_e",
        )(xs, code_maps, train)


def upsampled_branches(xs: Sequence[Array]) -> List[Array]:
    """Upsample all branches to branch-0 resolution, WITHOUT concatenating.

    Feeding this list to :class:`ConvHead` computes exactly
    ``conv1(concat(parts))`` as a sum of per-branch 1x1 convs — the
    {18,36,72,144}-channel concat offsets are never 128-lane-aligned, so the
    concat costs lane-shift layout copies plus a full-res materialization
    that this dataflow skips (``TPU.HEAD_DATAFLOW=presum``)."""
    h, w = xs[0].shape[1], xs[0].shape[2]
    return [xs[0]] + [resize_bilinear(x, h, w) for x in xs[1:]]


def concat_upsampled(xs: Sequence[Array]) -> Array:
    """Upsample all branches to branch-0 resolution and channel-concat
    (enc_hrnet.py:833-839)."""
    return jnp.concatenate(upsampled_branches(xs), axis=-1)


class ConvHead(nn.Module):
    """1x1 conv (C->C) + BN + ReLU + final conv (C->out) — the shared shape of
    the prediction heads and the discriminator head (enc_hrnet.py:323-370,
    1136-1151).

    Accepts either the full-resolution concat (reference dataflow:
    ``conv1(concat(upsample(x_b)))``) or a branch list. For a list, conv1 is
    applied per branch (kernel sliced on fan-in) and the results are summed —
    mathematically identical to conv-of-concat. Two list regimes:

    - raw multi-resolution branches (``TPU.MULTISCALE_HEAD``): the 1x1 conv
      commutes *before* the bilinear upsample, ~8x fewer head FLOPs;
    - pre-upsampled full-res branches (``TPU.HEAD_DATAFLOW=presum``, see
      :func:`upsampled_branches`): the per-branch resize no-ops and only the
      lane-misaligned 270-channel concat is skipped.

    The parameter tree is unchanged: one (1,1,C,C) ``conv1`` kernel, sliced
    per branch, so torch checkpoint import is unaffected.
    """

    out_features: int
    final_kernel: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True) -> Array:
        parts = list(x) if isinstance(x, (list, tuple)) else [x]
        c = sum(p.shape[-1] for p in parts)
        conv1 = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=_kernel_init,
                        name="conv1")
        if len(parts) == 1:
            y = conv1(parts[0])
        else:
            # Create conv1's params with the right fan-in; the 1-pixel probe
            # result is unused and dead-code-eliminated by XLA.
            conv1(jnp.concatenate([p[:1, :1, :1, :] for p in parts], axis=-1))
            kernel = conv1.variables["params"]["kernel"]
            bias = conv1.variables["params"]["bias"]
            h, w = parts[0].shape[1], parts[0].shape[2]
            off, y = 0, None
            for p in parts:
                cb = p.shape[-1]
                k = kernel[:, :, off:off + cb, :].astype(self.dtype)
                yb = jax.lax.conv_general_dilated(
                    p.astype(self.dtype), k, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                yb = resize_bilinear(yb, h, w)
                y = yb if y is None else y + yb
                off += cb
            y = y + bias.astype(self.dtype)
        y = BatchNormAct(act="relu", dtype=self.dtype, name="bn")(y, train)
        y = nn.Conv(self.out_features,
                    (self.final_kernel, self.final_kernel),
                    padding="SAME", use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=_kernel_init,
                    name="conv2")(y)
        return y
