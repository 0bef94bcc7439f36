"""Pallas kernel for the lane-side (right-multiplication) banded pass.

Counterpart of banded_kernel.py for the pass that contracts over the
interleaved lane axis (see ops/lanes.py): each grid step loads a
[row_tile, win*C] window of the input (lane windows are plan-time
128-aligned), multiplies by the block's channel-diagonal tap matrix on
the MXU with the split-bf16 scheme, and writes the [row_tile, tile*C]
slice of the FINAL interleaved output — the whole second pass runs
without a single transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lanes import LaneBlockedOp


def _kernel(offs128_ref, x_ref, th_ref, tl_ref, out_ref, *, mode):
    xw = x_ref[...]
    if xw.dtype in (jnp.uint8, jnp.uint16, jnp.int8, jnp.int16):
        xw = xw.astype(jnp.int32).astype(jnp.float32)
    else:
        xw = xw.astype(jnp.float32)
    xb = xw.astype(jnp.bfloat16)
    acc = jnp.dot(xb, th_ref[0], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xb, tl_ref[0], preferred_element_type=jnp.float32)
    if mode == "split3":
        xl = (xw - xb.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            xl, th_ref[0], preferred_element_type=jnp.float32
        )
    out_ref[...] = acc


def apply_lanes_pallas(
    lop: LaneBlockedOp,
    x: jax.Array,
    mode: str = "split2",
    row_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """[rows, n_in*C] -> [rows, n_out*C] f32, contracting the lane axis."""
    rows, lanes = x.shape
    assert lanes == lop.n_in * lop.c or lanes == lop.lanes_pad
    B, WC, TC = lop.taps_hi.shape
    # Prefer a row tile that divides the row count exactly (multiple of
    # 8 sublanes) — avoids padding and slicing the row axis entirely.
    best = 0
    for cand in range(8, min(row_tile, rows) + 1, 8):
        if rows % cand == 0:
            best = cand
    if best:
        row_tile = best
    else:
        row_tile = min(row_tile, ((rows + 127) // 128) * 128)
    rows_pad = ((rows + row_tile - 1) // row_tile) * row_tile
    if rows_pad != rows or lop.lanes_pad > lanes:
        x = jnp.pad(
            x, ((0, rows_pad - rows), (0, max(lop.lanes_pad - lanes, 0)))
        )

    grid = (B, rows_pad // row_tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # Lane window start offs[b]*c is a multiple of 128 by
            # plan-time row alignment; the *128 makes it provable.
            pl.BlockSpec(
                (pl.Element(row_tile), pl.Element(WC)),
                lambda b, j, offs128: (j * row_tile, offs128[b] * 128),
            ),
            pl.BlockSpec((1, WC, TC), lambda b, j, offs128: (b, 0, 0)),
            pl.BlockSpec((1, WC, TC), lambda b, j, offs128: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((row_tile, TC), lambda b, j, offs128: (j, b)),
    )

    offs128 = lop.offs_l // 128
    out = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, B * TC), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * WC * TC * rows_pad
            * (3 if mode == "split3" else 2),
            bytes_accessed=B * WC * rows_pad * x.dtype.itemsize
            + 2 * B * WC * TC * 2
            + rows_pad * B * TC * 4,
            transcendentals=0,
        ),
    )(offs128, x, lop.taps_hi, lop.taps_lo)
    return out[:rows, : lop.n_out * lop.c]


def apply_lanes_xla(
    lop: LaneBlockedOp, x: jax.Array, mode: str = "split2"
) -> jax.Array:
    """XLA fallback/spec for apply_lanes_pallas (used on CPU)."""
    rows, lanes = x.shape
    if lop.lanes_pad > lanes:
        x = jnp.pad(x, ((0, 0), (0, lop.lanes_pad - lanes)))
    offs = [int(v) for v in jax.device_get(lop.offs_l)]
    wc = lop.win_l
    outs = []
    for b in range(lop.n_blocks):
        xw = jax.lax.slice(x, (0, offs[b]), (rows, offs[b] + wc))
        if mode == "split3":
            xh = xw.astype(jnp.bfloat16)
            xh_b = jax.lax.optimization_barrier(xh)
            xl = (xw - xh_b.astype(jnp.float32)).astype(jnp.bfloat16)
            y = (
                jnp.dot(xh, lop.taps_hi[b], preferred_element_type=jnp.float32)
                + jnp.dot(xh, lop.taps_lo[b], preferred_element_type=jnp.float32)
                + jnp.dot(xl, lop.taps_hi[b], preferred_element_type=jnp.float32)
            )
        else:
            xb = xw.astype(jnp.bfloat16)
            y = jnp.dot(
                xb, lop.taps_hi[b], preferred_element_type=jnp.float32
            ) + jnp.dot(
                xb, lop.taps_lo[b], preferred_element_type=jnp.float32
            )
        outs.append(y)
    return jnp.concatenate(outs, axis=1)[:, : lop.n_out * lop.c]
