"""Pallas TPU kernel for the blocked-banded scanline operator.

Replaces the XLA gather+matmul lowering of ops/banded.py with one fused
kernel: for each (output block b, lane tile j) the kernel streams the
input window x[offs[b] : offs[b]+win, j*rt : (j+1)*rt] HBM→VMEM (auto
double-buffered via a ``pl.Element`` block dimension indexed by the
scalar-prefetched offsets), converts it to bf16 **in VMEM** (so a u8
source is never materialized as f32 in HBM), and runs the split-bf16
MXU passes of the precision scheme (see ops/banded.py) with float32
accumulation, writing the f32 output tile.

This is the TPU-native replacement for the reference's SIMD scanline
kernels (avir_float4_sse.h / avir_float8_avx.h, avir.h:3884-4331): the
pointer-walking fractional-delay dot products become MXU tiles over
VMEM-resident strips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..banded import BlockedBandedOp


def _to_f32(xw):
    # Mosaic has no direct u8/u16 -> bf16/f32 cast; go through int32.
    if xw.dtype in (jnp.uint8, jnp.uint16, jnp.int8, jnp.int16):
        return xw.astype(jnp.int32).astype(jnp.float32)
    return xw.astype(jnp.float32)


def _kernel(offs_ref, x_ref, th_ref, tl_ref, out_ref, *, mode):
    xw = _to_f32(x_ref[...])  # [win, rt] f32 in VMEM
    xb = xw.astype(jnp.bfloat16)
    acc = jnp.dot(th_ref[0], xb, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(tl_ref[0], xb, preferred_element_type=jnp.float32)
    if mode == "split3":
        xl = (xw - xb.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            th_ref[0], xl, preferred_element_type=jnp.float32
        )
    elif mode == "exact":
        # Full-precision fallback inside the kernel: f32 dot.
        acc = jnp.dot(
            th_ref[0].astype(jnp.float32) + tl_ref[0].astype(jnp.float32),
            xw,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[...] = acc


def apply_blocked_pallas(
    bop: BlockedBandedOp,
    x: jax.Array,
    mode: str = "split2",
    rt: int = 512,
    interpret: bool = False,
    full_rows: bool = False,
) -> jax.Array:
    """Pallas lowering of ``apply_blocked``: [n_in, R] -> [n_out, R] f32.

    ``mode``: 'split2' (2 bf16 MXU passes — input values must be exact
    in bf16), 'split3' (adds the input-residual pass), 'exact'.
    ``full_rows=True`` returns the unsliced [n_blocks*tile, R] buffer
    (rows past n_out are zero) so a downstream row-consuming kernel can
    read it without a slice copy.
    """
    n, r = x.shape
    B, T, W = bop.taps_hi.shape
    rt = min(rt, max(128, ((r + 127) // 128) * 128))
    r_pad = ((r + rt - 1) // rt) * rt
    pad_rows = max(bop.n_in_pad - n, 0)
    if pad_rows or r_pad != r:
        x = jnp.pad(x, ((0, pad_rows), (0, r_pad - r)))

    grid = (B, r_pad // rt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # offs are 32-aligned at plan time (ops/banded.py); the
            # explicit *32 in the index map lets Mosaic prove the
            # sublane-tiling divisibility of the window start.
            pl.BlockSpec(
                (pl.Element(W), pl.Element(rt)),
                lambda b, j, offs32: (offs32[b] * 32, j * rt),
            ),
            pl.BlockSpec((1, T, W), lambda b, j, offs: (b, 0, 0)),
            pl.BlockSpec((1, T, W), lambda b, j, offs: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, rt), lambda b, j, offs: (b, j)),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * T, r_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * W * r_pad * (3 if mode == "split3" else 2),
            bytes_accessed=(
                B * W * r_pad * x.dtype.itemsize
                + 2 * B * T * W * 2
                + B * T * r_pad * 4
            ),
            transcendentals=0,
        ),
    )(bop.offs // 32, x, bop.taps_hi, bop.taps_lo)
    if full_rows and r_pad == r:
        return out
    return out[: bop.n_out, :r]
