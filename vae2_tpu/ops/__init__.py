"""TPU-native ops: normalization, resizing, image metrics, Pallas kernels."""

from .norm import BatchNormAct
from .image import resize_bilinear

__all__ = ["BatchNormAct", "resize_bilinear"]
