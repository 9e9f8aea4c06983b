"""Pallas TPU kernels for the hot compute paths."""

from .fused_posterior import fused_intervals, supports_kernel

__all__ = ["fused_intervals", "supports_kernel"]
