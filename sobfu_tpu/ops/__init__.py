"""TPU-native op library (depth preprocessing, rasterisation)."""

from sobfu_tpu.ops import imgproc

__all__ = ["imgproc"]
