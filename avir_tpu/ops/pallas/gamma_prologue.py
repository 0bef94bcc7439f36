"""Linearize-once sRGB prologue kernel for the int8 gamma route.

The fused kernel's in-VMEM linearization (degree-7 Horner + branch,
fused_kernel._srgb_to_linear13_u8poly) is recomputed over the ~1.8x
window overlap of the fused grid — measured ~640 us of the 8K gamma
route's 1.2 ms (docs/perf_analysis.md).  This kernel instead runs the
pack-stage linearization (avir.h:208-220) exactly ONCE over the image
and writes round(linear * 2^13) ALREADY SPLIT into its two radix-128
s8 limb planes (2 B/px total); the fused kernel consumes the limb
windows as direct MXU operands with zero per-window VPU work (the
in-kernel i16 variant measured ~0.5 ms of i16->i32->limb conversion
over the overlapped windows — s8 planes cost the same HBM bytes and
none of that).

Bit-identical to the in-kernel route: the same polynomial evaluates at
the same u8 grid points and the limb split is the same exact integer
decomposition (fused_kernel._int8_limbs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_kernel import _int8_limbs, _srgb_to_linear13_u8poly

# Block shape: lanes per block must be a multiple of 128 (lane tiling)
# AND of every channel count in {1,2,3,4} so the alpha-bypass lane mask
# (lane % c) stays phase-correct across blocks; 1536 = 12*128 = 512*3.
_TR = 256
_TL = 1536


def _kernel(x_ref, hi_ref, lo_ref, *, c, alpha_index, in_gamma_mult):
    xw = (
        x_ref[...].astype(jnp.int32).astype(jnp.float32)
        * jnp.float32(in_gamma_mult)
    )
    q = _srgb_to_linear13_u8poly(xw, c, alpha_index)
    hi, lo = _int8_limbs(q)
    hi_ref[...] = hi
    lo_ref[...] = lo


def apply_gamma_prologue(
    x: jax.Array,
    need_rows: int,
    need_lanes: int,
    c: int,
    alpha_index: int,
    in_gamma_mult: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """[rows, lanes] u8 -> two [rows_p, lanes_p] s8 limb planes
    (hi, lo) of the 13-bit linear-light fixed-point image, padded up to
    at least (need_rows, need_lanes) — the fused kernel's window
    requirements — so the caller never re-pads."""
    rows, lanes = x.shape
    rows_p = -(-max(rows, need_rows) // _TR) * _TR
    lanes_p = -(-max(lanes, need_lanes) // _TL) * _TL
    if rows_p > rows or lanes_p > lanes:
        x = jnp.pad(x, ((0, rows_p - rows), (0, lanes_p - lanes)))
    grid = (rows_p // _TR, lanes_p // _TL)
    spec = pl.BlockSpec((_TR, _TL), lambda i, j: (i, j))
    shape = jax.ShapeDtypeStruct((rows_p, lanes_p), jnp.int8)
    return pl.pallas_call(
        functools.partial(
            _kernel,
            c=c,
            alpha_index=alpha_index,
            in_gamma_mult=in_gamma_mult,
        ),
        grid=grid,
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[shape, shape],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=16 * rows_p * lanes_p,
            bytes_accessed=3 * rows_p * lanes_p,
            transcendentals=0,
        ),
    )(x)
