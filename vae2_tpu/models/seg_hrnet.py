"""Legacy HRNetV2 semantic-segmentation model (reference
lib/models/seg_hrnet.py:259-480).

Same trunk vocabulary as the video nets, but with the original stride-2 x2
stem (input at 1/4 resolution) and a single segmentation head: upsample-concat
of all branches -> 1x1 conv + BN + ReLU -> 1x1 conv to NUM_CLASSES
(seg_hrnet.py:323-343). Kept because the VAE^2 nets load HRNet
ImageNet/segmentation pretrained weights (SURVEY.md section 3.5).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .hrnet import ConvHead, HRNetTrunk, StageSpec, stage_specs_from_extra
from .vae2 import _head_dataflow, _head_input

Array = jax.Array


class SegHRNet(nn.Module):
    specs: Tuple[StageSpec, ...]
    num_classes: int = 19
    final_kernel: int = 1
    dtype: Any = jnp.bfloat16
    head_dataflow: str = "concat"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        feats = HRNetTrunk(
            specs=self.specs, stem_stride=2, z_mode="none",
            dtype=self.dtype, name="trunk",
        )(x, None, train)
        y = _head_input(feats, self.head_dataflow)
        logits = ConvHead(self.num_classes, self.final_kernel, self.dtype,
                          name="last_layer")(y, train)
        return logits.astype(jnp.float32)  # (B, H/4, W/4, num_classes)


def get_seg_model(cfg) -> SegHRNet:
    from ..ops.norm import set_default_bn_backend

    set_default_bn_backend(cfg.TPU.FUSED_ABN)
    extra = cfg.MODEL.EXTRA
    dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
    return SegHRNet(
        specs=stage_specs_from_extra(extra),
        num_classes=cfg.DATASET.NUM_CLASSES,
        final_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
        dtype=dtype,
        head_dataflow=_head_dataflow(cfg),
    )
