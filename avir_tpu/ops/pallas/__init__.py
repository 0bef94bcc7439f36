"""Pallas TPU kernels for the banded resize passes."""

from .banded_kernel import apply_blocked_pallas
from .fused_kernel import apply_fused_pallas, fused_viable
from .lanes_kernel import apply_lanes_pallas, apply_lanes_xla

__all__ = [
    "apply_blocked_pallas",
    "apply_lanes_pallas",
    "apply_lanes_xla",
    "apply_fused_pallas",
    "fused_viable",
]
