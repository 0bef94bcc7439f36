"""Shift-ring variant of the fused kernel for the int8 sRGB-gamma
downsize route.

The plain fused kernel streams a full [win_v, win_h*C] input window
per grid cell; consecutive vertical cells overlap by win_v - delta
rows (delta = the uniform window stride of a constant-k downsize), so
both the window DMA (~1.5x) and — with gamma — the in-VMEM
linearization polynomial (the dominant VPU cost, docs/perf_analysis.md)
are re-done over the overlap.

This kernel instead fetches only each cell's NEW delta rows through a
normal auto-pipelined BlockSpec and maintains the current window in a
persistent VMEM scratch ring holding the LINEARIZED 13-bit limb planes
(fused_kernel._srgb_to_linear13_u8poly + _int8_limbs — bit-identical
values):

  grid (hb, vb') with vb' = Bv + n_pre cells per column
  (n_pre = ceil((win_v - delta) / delta) preload cells):
    vb' < n_pre  (preload): linearize the column window's rows
              [vb'*delta, +delta) into the ring; no output.
    vb' >= n_pre: shift ring up by delta (except the first real cell,
              whose tail rows complete the preloaded window), linearize
              the cell's delta new rows into ring[win_v-delta:], then
              run the same int8 V+H passes as the fused kernel on the
              ring and write the output tile.

Applicability (checked by ``ring_viable``): uniform delta
(constant-stride vertical offsets) with delta and win_v 32-aligned,
int8 mode with gamma, order "vh".  The shift copy moves data DOWN
(dst < src), so Mosaic's increasing-order tiling never overwrites
unread source rows.  The output is bit-identical to the plain fused
kernel's gamma int8 route: same quantized linear light, same limb
arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..banded import BlockedBandedOp
from ..lanes import LaneBlockedOp
from .fused_kernel import (
    _GAMMA_IN_BITS,
    _finish,
    _int8_limbs,
    _int8_passes,
    _int8_x_shift,
    _linear_to_srgb,
    _srgb_to_linear13_u8poly,
)


def uniform_delta(offs: np.ndarray) -> int:
    """The constant window stride, or 0 if offsets are not uniform."""
    if len(offs) < 2:
        return 0
    d = np.diff(np.asarray(offs))
    return int(d[0]) if (d == d[0]).all() and d[0] > 0 else 0


def n_preload(win_v: int, delta: int) -> int:
    return -(-(win_v - delta) // delta)


def ring_viable(
    vop: BlockedBandedOp, lop: LaneBlockedOp, gamma: bool, order: str
) -> bool:
    if not gamma or order != "vh":
        return False
    Wv = vop.taps_hi.shape[2]
    delta = uniform_delta(vop.offs)
    return (
        delta > 0
        and delta % 32 == 0
        and Wv % 32 == 0  # keeps offs + Wv - delta 32-aligned
        and delta < Wv  # otherwise windows don't overlap: plain fused
        and n_preload(Wv, delta) <= 8  # grid-bloat guard for tiny delta
    )


def _kernel(
    offr32_ref, offh128_ref, x_ref,
    tvh_ref, tvl_ref, thh_ref, thl_ref,
    out_ref, ring_hi, ring_lo,
    *, delta, win_v, n_pre, out_max, trunc_bits, scale, round_mode,
    c, alpha_index, in_gamma_mult, out_gamma_mult,
    qv_shift, qh_shift, x_shift, chunk_rel, win_c,
):
    vb = pl.program_id(1)

    xq = _srgb_to_linear13_u8poly(
        x_ref[...].astype(jnp.int32).astype(jnp.float32)
        * jnp.float32(in_gamma_mult),
        c, alpha_index,
    )
    hi, lo = _int8_limbs(xq)

    @pl.when(vb < n_pre)
    def _():
        ring_hi[pl.ds(vb * delta, delta)] = hi
        ring_lo[pl.ds(vb * delta, delta)] = lo

    @pl.when(vb >= n_pre + 1)
    def _():
        # Shift the window up by delta.  dst < src, so the tiled copy
        # never overwrites unread source rows.
        ring_hi[: win_v - delta] = ring_hi[delta:]
        ring_lo[: win_v - delta] = ring_lo[delta:]

    @pl.when(vb >= n_pre)
    def _():
        ring_hi[win_v - delta :] = hi
        ring_lo[win_v - delta :] = lo
        acc = _int8_passes(
            (ring_hi[...], ring_lo[...]),
            tvh_ref, tvl_ref, thh_ref, thl_ref,
            order="vh", qv_shift=qv_shift, qh_shift=qh_shift,
            x_shift=x_shift, gamma=True, c=c,
            alpha_index=alpha_index, in_gamma_mult=in_gamma_mult,
            chunk_rel=chunk_rel, win_c=win_c,
        )
        acc = _linear_to_srgb(acc, c, alpha_index)
        if out_gamma_mult != 0.0:
            acc = acc * jnp.float32(out_gamma_mult)
        _finish(
            acc, out_ref, out_max=out_max, trunc_bits=trunc_bits,
            scale=scale, round_mode=round_mode,
        )


def apply_fused_ring_pallas(
    vop: BlockedBandedOp,
    lop: LaneBlockedOp,
    x: jax.Array,
    out_dtype=jnp.uint8,
    out_max: float = 255.0,
    trunc_bits: int = 0,
    scale: float = 1.0,
    round_mode: str = "biased",
    alpha_index: int = -1,
    in_gamma_mult: float = 1.0,
    out_gamma_mult: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """int8 + sRGB-gamma "vh" fused resize via the shift-ring window.
    Same contract as apply_fused_pallas (callers slice the output)."""
    rows, lanes = x.shape
    c = lop.c
    Bv, Tv, Wv = vop.taps_hi.shape
    Bh, WC, TC = lop.taps_hi.shape
    delta = uniform_delta(vop.offs)
    if delta <= 0 or delta % 32 or Wv % 32 or delta >= Wv:
        raise ValueError("ring kernel needs uniform 32-aligned delta")
    n_pre = n_preload(Wv, delta)
    if vop.taps_q1 is None or lop.taps_q1 is None:
        raise ValueError("operator lacks int8 limb taps")
    qv_shift, qh_shift = vop.q_shift, lop.q_shift
    x_shift = _int8_x_shift(
        vop.l1_max, qv_shift + _GAMMA_IN_BITS, in_max=1.0
    )
    if x_shift < 1:
        raise ValueError("int8 mode infeasible for these taps")
    tv_a, tv_b = vop.taps_q1, vop.taps_q0
    th_a, th_b = lop.ctaps_q1, lop.ctaps_q0
    if th_a is None:
        th_a, th_b = lop.taps_q1, lop.taps_q0
    chunked = th_a is not None and th_a.ndim == 4
    chunk_rel = lop.chunk_rel if chunked else None
    win_c = lop.win_c if chunked else 0

    need_rows = vop.n_in_pad
    need_lanes = lop.lanes_pad
    if vop.pad_top or need_rows > rows or need_lanes > lanes:
        x = jnp.pad(
            x,
            (
                (
                    vop.pad_top,
                    max(need_rows - vop.pad_top - rows, 0),
                ),
                (0, max(need_lanes - lanes, 0)),
            ),
        )

    # Per-cell x block = the delta NEW rows of the cell's window:
    #   vb' <  n_pre: rows [offs[0] + vb'*delta, ... + delta)
    #   vb' >= n_pre: rows [offs[vb'-n_pre] + Wv - delta, ... + delta)
    offs = np.asarray(vop.offs)
    offr = np.concatenate(
        [offs[0] + delta * np.arange(n_pre), offs + (Wv - delta)]
    )

    grid = (Bh, Bv + n_pre)

    if chunked:
        n_ch = th_a.shape[1]
        th_spec = pl.BlockSpec(
            (1, n_ch, win_c, 128), lambda hb, vb, *_: (hb, 0, 0, 0)
        )
    else:
        th_spec = pl.BlockSpec(
            (1, WC, TC), lambda hb, vb, *_: (hb, 0, 0)
        )

    def vmap_idx(hb, vb, *_):
        return (jnp.maximum(vb - n_pre, 0), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(delta), pl.Element(WC)),
                lambda hb, vb, offr32, offh128: (
                    offr32[vb] * 32,
                    offh128[hb] * 128,
                ),
            ),
            pl.BlockSpec((1, Tv, Wv), vmap_idx),
            pl.BlockSpec((1, Tv, Wv), vmap_idx),
            th_spec,
            th_spec,
        ],
        out_specs=pl.BlockSpec(
            (Tv, TC),
            lambda hb, vb, *_: (jnp.maximum(vb - n_pre, 0), hb),
        ),
        scratch_shapes=[
            pltpu.VMEM((Wv, WC), jnp.int8),
            pltpu.VMEM((Wv, WC), jnp.int8),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            delta=delta,
            win_v=Wv,
            n_pre=n_pre,
            out_max=out_max,
            trunc_bits=trunc_bits,
            scale=scale,
            round_mode=round_mode,
            c=c,
            alpha_index=alpha_index,
            in_gamma_mult=in_gamma_mult,
            out_gamma_mult=out_gamma_mult,
            qv_shift=qv_shift,
            qh_shift=qh_shift,
            x_shift=x_shift,
            chunk_rel=chunk_rel,
            win_c=win_c,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bv * Tv, Bh * TC), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bh * Bv * Tv * (
                Wv * WC
                + (th_a.shape[1] * win_c * 128 if chunked else WC * TC)
            ),
            bytes_accessed=Bh * (Bv + n_pre) * delta * WC
            + Bv * Tv * Bh * TC * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(offr // 32, lop.offs_l // 128, x, tv_a, tv_b, th_a, th_b)
    return out
