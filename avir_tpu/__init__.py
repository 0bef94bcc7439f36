"""avir_tpu — a TPU-native image resampling framework.

A from-scratch JAX/XLA/Pallas implementation with the full capability set of
the AVIR C++ library (avaneev/avir): the high-quality AVIR pipeline
(2X upsampling pre-stage, Peaked-Cosine-windowed-sinc fractional-delay
filter-bank interpolation, correction filter, sub-pixel shift, sRGB gamma,
error-diffusion dithering, 1-4 channels, 8/16-bit/float I/O, quality
presets) plus the fast LANCIR Lanczos path.

Architecture (TPU-first, not a port): every AVIR filtering step is a linear
operator on a scanline, so the planner composes the entire per-axis step
chain into a single banded operator on the host (float64), and the device
pass becomes blocks of dense matmuls on the MXU.  The thread pool of the
reference is replaced by mesh sharding with halo exchange; the per-fraction
lazy filter creation becomes precomputed tap tables baked into the plan.
"""

from .params import (
    Params,
    PARAMS_DEF,
    PARAMS_ULR,
    PARAMS_LR,
    PARAMS_LOW,
    PARAMS_HIGH,
    PARAMS_ULTRA,
    preset,
)
from .models.avir import ImageResizer, make_resize_fn, resize
from .models.lancir import LancIR, lancir_resize, make_lancir_resize_fn
from . import metrology, native

__version__ = "0.1.0"

__all__ = [
    "Params",
    "PARAMS_DEF",
    "PARAMS_ULR",
    "PARAMS_LR",
    "PARAMS_LOW",
    "PARAMS_HIGH",
    "PARAMS_ULTRA",
    "preset",
    "ImageResizer",
    "make_resize_fn",
    "resize",
    "LancIR",
    "lancir_resize",
    "make_lancir_resize_fn",
    "metrology",
    "native",
]
