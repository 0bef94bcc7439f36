"""Planar (de-interleaved) fused two-pass Pallas kernel.

TPU-native equivalent of the reference's de-interleaved processing mode
(``fpclass_def_dil``, /root/reference/avir_dil.h:1014-1038): channels
are processed as separate [H, W] planes, stacked along the row axis of
one device array ``xp`` of shape [c*hp, w] (hp = plane stride, 32-row
aligned).  The win is the horizontal pass: with no channel interleave
in the lanes, its taps are DENSE [win_h, T_h] instead of the
channel-diagonal [win_h*C, T_h*C] of ops/lanes.py — an exact factor-C
reduction of the horizontal MXU work, which dominates the interleaved
fused kernel's cost (the reference's DIL mode exists for the same
reason: channel-parallel SIMD without per-pixel shuffles,
avir_dil.h:29-762).

Grid is (Bh, c, Bv): H taps stay VMEM-resident across a whole
plane-column sweep; the plane index selects the input window's row
base and the output block row.  Everything else (split-bf16 precision,
fused sRGB gamma with alpha bypass — here a whole plane skip —
round/clamp/truncate quantization) matches ops/pallas/fused_kernel.py.

The caller provides the planar-stacked input; models/runtime.py
de-interleaves [h, w*c] -> [c*hp, wp] with one XLA transpose inside the
same jit (raw dtype, so the copy moves 1-2 bytes/element) and
re-interleaves the (much smaller) output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..banded import BlockedBandedOp
from ..lanes import LaneBlockedOp
from .fused_kernel import _linear_to_srgb, _srgb_to_linear


def _kernel(
    offv32_ref, offh128_ref, x_ref,
    tvh_ref, tvl_ref, thh_ref, thl_ref,
    out_ref, *, mode_v, mode_h, out_max, trunc_bits, scale, round_mode,
    gamma, alpha_plane, in_gamma_mult, out_gamma_mult,
):
    p = pl.program_id(1)
    xw = x_ref[...]
    if xw.dtype in (jnp.uint8, jnp.uint16, jnp.int8, jnp.int16):
        xw = xw.astype(jnp.int32).astype(jnp.float32)
    else:
        xw = xw.astype(jnp.float32)
    if gamma:
        # Fused pack stage (avir.h:208-220); the alpha plane bypasses
        # the curve (linear scaling only) — a scalar plane select here,
        # no lane masking needed (cf. the interleaved kernel).
        xs = xw * jnp.float32(in_gamma_mult)
        xg = _srgb_to_linear(xs, 1, -1)
        if alpha_plane >= 0:
            xw = jnp.where(p == alpha_plane, xs, xg)
        else:
            xw = xg

    # ---- vertical pass: [T_v, win_v] @ [win_v, win_h] ---------------
    xb = xw.astype(jnp.bfloat16)
    v = jnp.dot(tvh_ref[0], xb, preferred_element_type=jnp.float32)
    v = v + jnp.dot(tvl_ref[0], xb, preferred_element_type=jnp.float32)
    if mode_v == "split3":
        xl = (xw - xb.astype(jnp.float32)).astype(jnp.bfloat16)
        v = v + jnp.dot(
            tvh_ref[0], xl, preferred_element_type=jnp.float32
        )

    # ---- horizontal pass: [T_v, win_h] @ [win_h, T_h] (dense) -------
    vh = v.astype(jnp.bfloat16)
    acc = jnp.dot(vh, thh_ref[0], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(vh, thl_ref[0], preferred_element_type=jnp.float32)
    if mode_h == "split3":
        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            vl, thh_ref[0], preferred_element_type=jnp.float32
        )

    if gamma:
        # Fused unpack stage (avir.h:299-310).
        ag = _linear_to_srgb(acc, 1, -1)
        if alpha_plane >= 0:
            acc = jnp.where(p == alpha_plane, acc, ag)
        else:
            acc = ag
        if out_gamma_mult != 0.0:
            acc = acc * jnp.float32(out_gamma_mult)

    if out_ref.dtype != jnp.float32:
        if scale != 1.0:
            acc = acc * jnp.float32(scale)
        if trunc_bits > 0:
            out_range = int(out_max)
            tm = jnp.float32(out_max / (out_range >> trunc_bits))
            acc = jnp.floor(acc / tm + 0.5) * tm
        elif round_mode == "even":
            acc = jnp.round(acc)
        else:
            acc = jnp.floor(acc + 0.5)
        acc = jnp.clip(acc, 0.0, out_max)
        out_ref[...] = acc.astype(jnp.int32).astype(out_ref.dtype)
    else:
        out_ref[...] = acc


def plane_stride(vop: BlockedBandedOp) -> int:
    """Row stride between stacked channel planes (32-aligned so window
    starts stay sublane-divisible for every plane)."""
    return -(-vop.n_in_pad // 32) * 32


def apply_planar_pallas(
    vop: BlockedBandedOp,
    pop: LaneBlockedOp,
    xp: jax.Array,
    c: int,
    mode_v: str = "split2",
    mode_h: str = "split3",
    out_dtype=jnp.float32,
    out_max: float = 255.0,
    trunc_bits: int = 0,
    scale: float = 1.0,
    round_mode: str = "biased",
    gamma: bool = False,
    alpha_plane: int = -1,
    in_gamma_mult: float = 1.0,
    out_gamma_mult: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """[c*hp, wp] planar -> [c*Bv*T_v, Bh*T_h] planar; callers slice
    each plane to [new_h, new_w] and re-interleave.  ``pop`` is the
    dense lane form (lane_block_banded(op, 1))."""
    rows, lanes = xp.shape
    Bv, Tv, Wv = vop.taps_hi.shape
    Bh, Wh, Th = pop.taps_hi.shape
    hp = plane_stride(vop)
    assert rows >= c * hp, (rows, c, hp)

    need_lanes = pop.lanes_pad
    if need_lanes > lanes:
        xp = jnp.pad(xp, ((0, 0), (0, need_lanes - lanes)))

    grid = (Bh, c, Bv)
    hp32 = hp // 32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(Wv), pl.Element(Wh)),
                lambda hb, p, vb, offv32, offh128: (
                    (p * hp32 + offv32[vb]) * 32,
                    offh128[hb] * 128,
                ),
            ),
            pl.BlockSpec(
                (1, Tv, Wv), lambda hb, p, vb, *_: (vb, 0, 0)
            ),
            pl.BlockSpec(
                (1, Tv, Wv), lambda hb, p, vb, *_: (vb, 0, 0)
            ),
            pl.BlockSpec(
                (1, Wh, Th), lambda hb, p, vb, *_: (hb, 0, 0)
            ),
            pl.BlockSpec(
                (1, Wh, Th), lambda hb, p, vb, *_: (hb, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (Tv, Th), lambda hb, p, vb, *_: (p * Bv + vb, hb)
        ),
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            mode_v=mode_v,
            mode_h=mode_h,
            out_max=out_max,
            trunc_bits=trunc_bits,
            scale=scale,
            round_mode=round_mode,
            gamma=gamma,
            alpha_plane=alpha_plane,
            in_gamma_mult=in_gamma_mult,
            out_gamma_mult=out_gamma_mult,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (c * Bv * Tv, Bh * Th), out_dtype
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * c * Bh * Bv * Tv * (Wv + Th) * Wh,
            bytes_accessed=c * Bh * Bv * Wv * Wh * xp.dtype.itemsize
            + c * Bv * Tv * Bh * Th * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(vop.offs // 32, pop.offs_l // 128, xp,
      vop.taps_hi, vop.taps_lo, pop.taps_hi, pop.taps_lo)
    return out


def planar_viable(vop: BlockedBandedOp, pop: LaneBlockedOp) -> bool:
    """VMEM-budget check for the planar kernel's block shapes."""
    Bv, Tv, Wv = vop.taps_hi.shape
    Bh, Wh, Th = pop.taps_hi.shape
    vmem = (
        2 * Wv * Wh            # double-buffered input window (u8-worst)
        + 4 * Wv * Wh          # f32 conversion temp
        + 2 * 2 * Tv * Wv * 2  # V taps hi/lo, double-buffered
        + 2 * 2 * Wh * Th * 2  # H taps hi/lo, double-buffered
        + 4 * Tv * Wh          # inter-pass f32 intermediate
        + 2 * 4 * Tv * Th      # output tiles
    )
    return vmem < 14 * 1024 * 1024


def deinterleave(
    src: jax.Array, h: int, w: int, c: int, hp: int, wp: int
) -> jax.Array:
    """[h, w*c] interleaved -> [c*hp, wp] planar-stacked (XLA transpose
    + pad, fused by the compiler into one copy of the raw dtype)."""
    x = src.reshape(h, w, c).transpose(2, 0, 1)  # [c, h, w]
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w)))
    return x.reshape(c * hp, wp)


def reinterleave(
    out_planar: jax.Array, c: int, bv_tv: int, new_h: int, new_w: int
) -> jax.Array:
    """[c*Bv*T_v, Bh*T_h] planar -> [new_h, new_w*c] interleaved."""
    x = out_planar.reshape(c, bv_tv, -1)[:, :new_h, :new_w]
    return x.transpose(1, 2, 0).reshape(new_h, new_w * c)
