"""Pallas TPU kernels for the hot ops."""

from .abn import fused_abn, fused_abn_infer

__all__ = ["fused_abn", "fused_abn_infer"]
