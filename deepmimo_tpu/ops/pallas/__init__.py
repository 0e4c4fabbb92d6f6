"""Pallas TPU kernels for the channel-synthesis hot path."""

from .pathsum import fused_path_sum, pallas_available

__all__ = ["fused_path_sum", "pallas_available"]
