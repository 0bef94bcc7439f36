"""Fused two-pass Pallas kernel: the whole separable resize in one
program.

For each (column-block hb, row-block vb) grid cell the kernel:

  1. streams the u8/u16/f32 input window
     x[offs_v[vb] : +win_v, offs_h[hb]*C : +win_h*C] HBM→VMEM
     (element-offset BlockSpecs, auto-pipelined);
  2. vertical pass on the MXU: [T_v, win_v] @ [win_v, win_h*C]
     (split-bf16, f32 accumulation);
  3. horizontal pass on the MXU: [T_v, win_h*C] @ [win_h*C, T_h*C]
     with the channel-diagonal lane-form taps (ops/lanes.py), the
     split of the f32 intermediate done in VMEM;
  4. writes the [T_v, T_h*C] tile of the FINAL interleaved output —
     optionally already quantized (round+clamp) to u8/u16.

The f32 intermediate image never exists in HBM: the only HBM traffic is
the (slightly overlapping) input windows and the output.  The grid
iterates vb innermost so the large horizontal tap blocks stay resident
in VMEM across a whole column of cells.

This is the "speed-of-light" configuration of BASELINE.json: both
separable passes fused over VMEM-resident strips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..banded import BlockedBandedOp
from ..gamma import _pow24i_srgb
from ..lanes import LaneBlockedOp


def _alpha_mask(shape, c, alpha_index):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    return (lane % c) == alpha_index


# Degree-9 least-squares fit (Chebyshev basis, power form) of the
# reference's rational pow24 sRGB segment
# _pow24_srgb((s+0.055)/1.055) over s in [0.04045, 1]: f32-Horner max
# |err| 2.8e-7 in linear light -> <= 0.24 u16 LSB through the <= 12.92
# sRGB slope.  Division-free — the rational form costs one VPU divide
# per element, which dominated the u16/f32 gamma pack stage
# (tools/probe_u16_exec.py decomposition; same trick as the u8-grid
# polynomial _U8_LIN_COEF above, fit on the continuous domain).
# Valid on [0, 1] like the reference's own approximation; out-of-range
# float inputs were undefined behavior before and remain so.
_F32_LIN_COEF = (
    0.0008536138646303981,
    0.035465890603903136,
    0.48196428400734187,
    0.8900508390762532,
    -0.9850409244814118,
    1.257590813503784,
    -1.2337517794771542,
    0.820447767639579,
    -0.32497847508180217,
    0.05739567406964825,
)


def _srgb_to_linear(x, c, alpha_index):
    acc = jnp.float32(_F32_LIN_COEF[-1])
    for a in _F32_LIN_COEF[-2::-1]:
        acc = acc * x + jnp.float32(a)
    lin = jnp.where(x <= 0.04045, x * jnp.float32(1.0 / 12.92), acc)
    if alpha_index in (0, 3) and c == 4:
        lin = jnp.where(_alpha_mask(x.shape, c, alpha_index), x, lin)
    return lin


def _linear_to_srgb(x, c, alpha_index):
    srgb = jnp.where(
        x <= 0.0031308,
        12.92 * x,
        1.055 * _pow24i_srgb(jnp.maximum(x, 0.0031308), jnp.sqrt) - 0.055,
    )
    if alpha_index in (0, 3) and c == 4:
        srgb = jnp.where(_alpha_mask(x.shape, c, alpha_index), x, srgb)
    return srgb


def _int8_limbs(q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split a 15-bit s32 value into balanced radix-128 s8 limbs
    (exact: q == q1 * 128 + q0)."""
    q1 = (q + 64) >> 7
    q0 = q - (q1 << 7)
    return q1.astype(jnp.int8), q0.astype(jnp.int8)


# Input-linearization scale for the gamma int8 path: linear-light
# values lie in [0, 1], so round(lin * 2^13) <= 8192 fits the two-limb
# form, and the 2^-14 quantization error maps to <= 0.2 u8 LSB through
# the steepest part of the sRGB curve (slope 12.92, avir.h:299-310).
_GAMMA_IN_BITS = 13

# Degree-7 least-squares fit (Chebyshev basis, converted to power
# form) of the reference's pow(x, 2.4) sRGB segment (avir.h:162-174)
# over the 245 u8 sample points above the linear cutoff: max |err|
# 3.6e-6 in f32 Horner form — 8x inside the 13-bit quantization
# budget, and division-free (the reference form's rational term costs
# a VPU divide per element, the hot cost of the in-kernel pack stage).
_U8_LIN_COEF = (
    0.0008849456939997724, 0.034331778643864906, 0.4967742755734233,
    0.7946677002602778, -0.6398338110899012, 0.5113014176950982,
    -0.2526727088789862, 0.05454610085971551,
)


def _srgb_to_linear13_u8poly(x, c, alpha_index):
    """round(srgb_to_linear(x) * 2^13) as s32, for x on the u8 grid
    in [0, 1]; the 2^13 scale is folded into the coefficients."""
    k = float(1 << _GAMMA_IN_BITS)
    acc = jnp.float32(_U8_LIN_COEF[-1] * k)
    for a in _U8_LIN_COEF[-2::-1]:
        acc = acc * x + jnp.float32(a * k)
    lin = jnp.where(x <= 0.04045, x * jnp.float32(k / 12.92), acc)
    if alpha_index in (0, 3) and c == 4:
        lin = jnp.where(_alpha_mask(x.shape, c, alpha_index), x * k, lin)
    return jnp.round(lin).astype(jnp.int32)


def _rmul(pairs, chunk_rel, win_c, ptype):
    """Sum of scaled right-multiplications ``sum_k s_k * (x_k @ T_k)``
    over the lane axis, with optionally CHUNKED taps.

    ``pairs`` is a list of (x [M, WC], tap_ref, scale).  Unchunked, tap
    blocks are [1, WC, TC].  Chunked ([1, n_ch, win_c, 128], see
    ops/lanes.py), each 128-lane output chunk contracts only its
    win_c-lane sub-window — x is sliced at the chunk's static
    128-aligned offset, skipping the band's structural zeros (~2x
    fewer MACs at k=4, C=3).  Equal-scale terms are summed in the
    dot's own dtype BEFORE scaling (exact for s32 limb products — the
    recombination rounding must not depend on chunking); integer
    scales then multiply in s32 (exact), float scales cast to f32
    first (overflow-free for the * 2^14 limb weight)."""
    def block(j=None, r=None):
        groups: list[list] = []  # [scale, summed dots] first-seen order
        for x, tref, s in pairs:
            t = tref[0] if j is None else tref[0, j]
            xx = x if r is None else x[:, r : r + win_c]
            p = jnp.dot(xx, t, preferred_element_type=ptype)
            for g in groups:
                if g[0] == s and type(g[0]) is type(s):
                    g[1] = g[1] + p
                    break
            else:
                groups.append([s, p])
        out = None
        for s, p in groups:
            if isinstance(s, float):
                if s != 1.0:
                    p = p.astype(jnp.float32) * jnp.float32(s)
            elif s != 1:
                p = p * ptype(s)
            out = p if out is None else out + p
        return out

    if chunk_rel is None:
        return block()
    return jnp.concatenate(
        [block(j, r) for j, r in enumerate(chunk_rel)], axis=1
    )


def _tap_colsum(tref, chunk_rel, scale):
    """Per-output-lane column sums of an s8 tap block (x-shift
    compensation rows), honoring the chunked form."""
    if chunk_rel is None:
        return scale * jnp.sum(
            tref[0].astype(jnp.int32), axis=0, keepdims=True
        )
    return jnp.concatenate(
        [
            scale * jnp.sum(
                tref[0, j].astype(jnp.int32), axis=0, keepdims=True
            )
            for j in range(len(chunk_rel))
        ],
        axis=1,
    )


def _int8_passes(
    xw, tvh_ref, tvl_ref, thh_ref, thl_ref,
    *, order, qv_shift, qh_shift, x_shift,
    gamma, c, alpha_index, in_gamma_mult, chunk_rel, win_c,
):
    """Both separable passes on the MXU's int8 mode (2x bf16 rate).

    Taps are radix-128 two-limb fixed point (ops/intq.py); the u8
    input is shifted to s8 and compensated with the taps' row sums
    (or, with gamma, linearized on the VPU and quantized to 14-bit
    two-limb fixed point); the inter-pass intermediate is re-quantized
    in VMEM to a 15-bit two-limb form (scale 2^x_shift, chosen at
    build time from the first pass's L1 norm so the high limb fits
    s8).  The negligible lo*lo cross terms (~2^-13 relative) are
    dropped: 5 (6 with gamma) int8 matmuls total = 2.5-3 bf16-pass
    equivalents, vs 5-6 for the bf16 splits.
    """
    q1v, q0v = tvh_ref[0], tvl_ref[0]  # s8 [T_v, win_v]

    def linearize(xw):
        if isinstance(xw, tuple):
            # gamma_pre route: the prologue kernel
            # (ops/pallas/gamma_prologue.py) already wrote the 13-bit
            # linear light as s8 limb planes — direct MXU operands.
            return xw
        # Fused pack stage (avir.h:208-220) in f32 on the VPU, then
        # re-quantized to two s8 limbs: first pass costs 3 int8
        # matmuls.  (Mosaic has no direct u8 -> f32 cast; hop through
        # int32.)
        xq = _srgb_to_linear13_u8poly(
            xw.astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(in_gamma_mult),
            c, alpha_index,
        )
        return _int8_limbs(xq)

    def to_s8(xw):
        # u8 -> s8 (x - 128) as a bit flip of the MSB — one VPU op
        # instead of an int32 round trip; column/row-sum compensation
        # terms undo the -128 shift.  First pass costs 2 int8 matmuls.
        return jax.lax.bitcast_convert_type(
            xw ^ jnp.uint8(128), jnp.int8
        )

    if order == "vh":
        # ---- first (vertical) pass: LHS row taps, unchunked ---------
        if gamma:
            xq1, xq0 = linearize(xw)
            m11 = jnp.dot(q1v, xq1, preferred_element_type=jnp.int32)
            m10 = jnp.dot(q1v, xq0, preferred_element_type=jnp.int32)
            m01 = jnp.dot(q0v, xq1, preferred_element_type=jnp.int32)
            # == (pass result) * 2^(first_bits), tap rounding aside.
            fq = (m11 << 14) + ((m10 + m01) << 7)
            first_bits = _GAMMA_IN_BITS + qv_shift
        else:
            xs = to_s8(xw)
            m1 = jnp.dot(q1v, xs, preferred_element_type=jnp.int32)
            m0 = jnp.dot(q0v, xs, preferred_element_type=jnp.int32)
            rs1 = jnp.sum(q1v.astype(jnp.int32), axis=1, keepdims=True)
            rs0 = jnp.sum(q0v.astype(jnp.int32), axis=1, keepdims=True)
            fq = (m1 << 7) + m0 + ((rs1 << 7) + rs0) * 128
            first_bits = qv_shift
        sh = first_bits - x_shift
        x15 = (fq + (1 << (sh - 1))) >> sh
        x1, x0 = _int8_limbs(x15)
        # ---- second (horizontal) pass: chunked right-mult; limb
        # products recombined in f32 (s32 would overflow the * 2^14).
        acc = _rmul(
            [
                (x1, thh_ref, 16384.0),
                (x0, thh_ref, 128.0),
                (x1, thl_ref, 128.0),
            ],
            chunk_rel, win_c, jnp.int32,
        )
        return acc * jnp.float32(2.0 ** -(x_shift + qh_shift))

    # ---- hv: first (horizontal) pass is the chunked right-mult ------
    if gamma:
        xq1, xq0 = linearize(xw)
        fq = _rmul(
            [
                (xq1, thh_ref, 1 << 14),
                (xq0, thh_ref, 1 << 7),
                (xq1, thl_ref, 1 << 7),
            ],
            chunk_rel, win_c, jnp.int32,
        )
        first_bits = _GAMMA_IN_BITS + qh_shift
    else:
        xs = to_s8(xw)
        fq = _rmul(
            [(xs, thh_ref, 128), (xs, thl_ref, 1)],
            chunk_rel, win_c, jnp.int32,
        )
        fq = fq + (
            _tap_colsum(thh_ref, chunk_rel, 128 * 128)
            + _tap_colsum(thl_ref, chunk_rel, 128)
        )
        first_bits = qh_shift
    sh = first_bits - x_shift
    x15 = (fq + (1 << (sh - 1))) >> sh
    x1, x0 = _int8_limbs(x15)
    # ---- second (vertical) pass: LHS row taps, unchunked ------------
    n11 = jnp.dot(q1v, x1, preferred_element_type=jnp.int32)
    n10 = jnp.dot(q1v, x0, preferred_element_type=jnp.int32)
    n01 = jnp.dot(q0v, x1, preferred_element_type=jnp.int32)
    return (
        n11.astype(jnp.float32) * 16384.0
        + (n10 + n01).astype(jnp.float32) * 128.0
    ) * jnp.float32(2.0 ** -(x_shift + qv_shift))


def _kernel(
    offv32_ref, offh128_ref, x_ref, *refs,
    mode_v, mode_h, out_max, trunc_bits, scale, round_mode,
    c, gamma, alpha_index, in_gamma_mult, out_gamma_mult, order,
    qv_shift=0, qh_shift=0, x_shift=0, chunk_rel=None, win_c=0,
    gamma_pre=False,
):
    if gamma_pre:
        xlo_ref, refs = refs[0], refs[1:]
    tvh_ref, tvl_ref, thh_ref, thl_ref, out_ref = refs
    if mode_v == "int8":
        xw = (x_ref[...], xlo_ref[...]) if gamma_pre else x_ref[...]
        acc = _int8_passes(
            xw, tvh_ref, tvl_ref, thh_ref, thl_ref,
            order=order, qv_shift=qv_shift, qh_shift=qh_shift,
            x_shift=x_shift, gamma=gamma, c=c,
            alpha_index=alpha_index, in_gamma_mult=in_gamma_mult,
            chunk_rel=chunk_rel, win_c=win_c,
        )
        if gamma:
            # Fused unpack stage: linear -> sRGB (avir.h:299-310).
            acc = _linear_to_srgb(acc, c, alpha_index)
            if out_gamma_mult != 0.0:
                acc = acc * jnp.float32(out_gamma_mult)
        _finish(
            acc, out_ref, out_max=out_max, trunc_bits=trunc_bits,
            scale=scale, round_mode=round_mode,
        )
        return
    xw = x_ref[...]
    if xw.dtype in (jnp.uint8, jnp.uint16, jnp.int8, jnp.int16):
        xw = xw.astype(jnp.int32).astype(jnp.float32)
    else:
        xw = xw.astype(jnp.float32)
    if gamma:
        # Fused pack stage: sRGB -> linear on the VPU (avir.h:208-220).
        xw = _srgb_to_linear(
            xw * jnp.float32(in_gamma_mult), c, alpha_index
        )

    if order == "vh":
        # ---- vertical pass: [T_v, win_v] @ [win_v, win_h*C] ---------
        xb = xw.astype(jnp.bfloat16)
        v = jnp.dot(tvh_ref[0], xb, preferred_element_type=jnp.float32)
        v = v + jnp.dot(tvl_ref[0], xb, preferred_element_type=jnp.float32)
        if mode_v == "split3":
            xl = (xw - xb.astype(jnp.float32)).astype(jnp.bfloat16)
            v = v + jnp.dot(
                tvh_ref[0], xl, preferred_element_type=jnp.float32
            )

        # ---- horizontal pass: [T_v, win_h*C] @ [win_h*C, T_h*C] -----
        vh = v.astype(jnp.bfloat16)
        pairs = [(vh, thh_ref, 1.0), (vh, thl_ref, 1.0)]
        if mode_h == "split3":
            vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            pairs.append((vl, thh_ref, 1.0))
        acc = _rmul(pairs, chunk_rel, win_c, jnp.float32)
    else:
        # H-first order (upsizing: win_v < T_v, so running the wide
        # horizontal contraction on the window's few input rows is
        # cheaper than on the tile's many output rows).
        # ---- horizontal pass: [win_v, win_h*C] @ [win_h*C, T_h*C] ---
        xb = xw.astype(jnp.bfloat16)
        pairs = [(xb, thh_ref, 1.0), (xb, thl_ref, 1.0)]
        if mode_h == "split3":
            xl = (xw - xb.astype(jnp.float32)).astype(jnp.bfloat16)
            pairs.append((xl, thh_ref, 1.0))
        hpass = _rmul(pairs, chunk_rel, win_c, jnp.float32)

        # ---- vertical pass: [T_v, win_v] @ [win_v, T_h*C] -----------
        hb_ = hpass.astype(jnp.bfloat16)
        acc = jnp.dot(
            tvh_ref[0], hb_, preferred_element_type=jnp.float32
        )
        acc = acc + jnp.dot(
            tvl_ref[0], hb_, preferred_element_type=jnp.float32
        )
        if mode_v == "split3":
            hl = (hpass - hb_.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                tvh_ref[0], hl, preferred_element_type=jnp.float32
            )

    if gamma:
        # Fused unpack stage: linear -> sRGB (avir.h:299-310).
        acc = _linear_to_srgb(acc, c, alpha_index)
        if out_gamma_mult != 0.0:
            acc = acc * jnp.float32(out_gamma_mult)

    _finish(
        acc, out_ref, out_max=out_max, trunc_bits=trunc_bits,
        scale=scale, round_mode=round_mode,
    )


def _finish(acc, out_ref, *, out_max, trunc_bits, scale, round_mode):
    if out_ref.dtype != jnp.float32:
        # Fused output stage: optional scale, then round + clamp
        # (+ truncation) — the default ditherer (avir.h:4392) or
        # LANCIR's round-half-even (lancir.h:1870-2002).
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
        # Mosaic has no direct f32 -> u8/u16 cast; go through int32.
        out_ref[...] = acc.astype(jnp.int32).astype(out_ref.dtype)
    else:
        out_ref[...] = acc


def apply_fused_pallas(
    vop: BlockedBandedOp,
    lop: LaneBlockedOp,
    x: jax.Array,
    mode_v: str = "split2",
    mode_h: str = "split3",
    out_dtype=jnp.float32,
    out_max: float = 255.0,
    trunc_bits: int = 0,
    scale: float = 1.0,
    round_mode: str = "biased",
    gamma: bool = False,
    alpha_index: int = -1,
    in_gamma_mult: float = 1.0,
    out_gamma_mult: float = 1.0,
    order: str = "vh",
    interpret: bool = False,
    x_lo: jax.Array | None = None,
    out_blocks: int | None = None,
    out_init: jax.Array | None = None,
    compact_out: bool = False,
) -> jax.Array:
    """[n_in_rows, n_in*C] -> [v_blocks*T_v, h_blocks*T_h*C]; callers
    slice to [new_h, new_w*C].  When ``out_dtype`` is an integer type
    the default dither (round/clamp/truncate) is fused into the
    epilogue.

    ``out_blocks``/``out_init`` support the interior/boundary lane
    split (ops/lanes.py block_list): a lane-subset ``lop`` writes its
    blocks into the original columns of an ``out_blocks``-wide buffer;
    ``out_init`` (aliased, never read by the kernel) provides the
    content of the columns this call does not touch, so two calls over
    disjoint subsets assemble the full output with no extra copies.

    ``compact_out=True`` instead writes a lane-subset's blocks to
    columns 0..n_blocks-1 in block order (a compact buffer the caller
    reassembles, e.g. with a lane concat) — the vmap-safe form of the
    split: no aliased ANY-space input, so the call composes under a
    batch dimension.

    ``x_lo`` selects the gamma_pre route: (x, x_lo) are the
    prologue kernel's s8 linear-light limb planes."""
    rows, lanes = x.shape
    c = lop.c
    Bv, Tv, Wv = vop.taps_hi.shape
    Bh, WC, TC = lop.taps_hi.shape

    use_int8 = mode_v == "int8" or mode_h == "int8"
    if x_lo is not None and not (use_int8 and gamma):
        raise ValueError("limb-plane input is the int8 gamma_pre route")
    qv_shift = qh_shift = x_shift = 0
    if use_int8:
        if mode_v != mode_h:
            raise ValueError("int8 mode applies to both passes")
        if x_lo is not None:
            if x.dtype != jnp.int8:
                raise ValueError("limb planes must be s8")
        elif x.dtype != jnp.uint8:
            raise ValueError("int8 mode requires raw u8 input")
        if vop.taps_q1 is None or lop.taps_q1 is None:
            raise ValueError("operator lacks int8 limb taps")
        qv_shift, qh_shift = vop.q_shift, lop.q_shift
        first = vop if order == "vh" else lop
        first_shift = qv_shift if order == "vh" else qh_shift
        x_shift = _int8_x_shift(
            first.l1_max,
            first_shift + (_GAMMA_IN_BITS if gamma else 0),
            in_max=1.0 if gamma else 255.0,
        )
        if x_shift < 1:
            raise ValueError("int8 mode infeasible for these taps")
        tv_a, tv_b = vop.taps_q1, vop.taps_q0
        th_a, th_b = lop.ctaps_q1, lop.ctaps_q0
        if th_a is None:
            th_a, th_b = lop.taps_q1, lop.taps_q0
    else:
        tv_a, tv_b = vop.taps_hi, vop.taps_lo
        th_a, th_b = lop.ctaps_hi, lop.ctaps_lo
        if th_a is None:
            th_a, th_b = lop.taps_hi, lop.taps_lo
    # Chunked-band H taps (ops/lanes.py): ~2x fewer second-pass MACs.
    chunked = th_a is not None and th_a.ndim == 4
    chunk_rel = lop.chunk_rel if chunked else None
    win_c = lop.win_c if chunked else 0

    need_rows = vop.n_in_pad
    need_lanes = lop.lanes_pad
    if need_rows > rows or need_lanes > lanes:
        padding = (
            (0, max(need_rows - rows, 0)),
            (0, max(need_lanes - lanes, 0)),
        )
        x = jnp.pad(x, padding)
        if x_lo is not None:
            x_lo = jnp.pad(x_lo, padding)

    grid = (Bh, Bv)  # vb innermost: H taps stay resident per column

    # Output-column mapping: identity for the full operator; a lane
    # SUBSET (lop.out_idx, see ops/lanes.py block_list) scatters its
    # blocks into the original columns of a shared out buffer.
    import numpy as np

    if compact_out and (out_blocks is not None or out_init is not None):
        raise ValueError("compact_out excludes out_blocks/out_init")
    out_cols = out_blocks if out_blocks is not None else Bh
    oidx = (
        lop.out_idx
        if lop.out_idx is not None and not compact_out
        else np.arange(Bh, dtype=np.int64)
    )

    if chunked:
        n_ch = th_a.shape[1]
        th_spec = pl.BlockSpec(
            (1, n_ch, win_c, 128), lambda hb, vb, *_: (hb, 0, 0, 0)
        )
    else:
        th_spec = pl.BlockSpec(
            (1, WC, TC), lambda hb, vb, *_: (hb, 0, 0)
        )
    x_spec = pl.BlockSpec(
        (pl.Element(Wv), pl.Element(WC)),
        lambda hb, vb, offv32, offh128, oidx_: (
            offv32[vb] * 32,
            offh128[hb] * 128,
        ),
    )
    has_init = out_init is not None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[x_spec]
        + ([x_spec] if x_lo is not None else [])
        + [
            pl.BlockSpec(
                (1, Tv, Wv), lambda hb, vb, *_: (vb, 0, 0)
            ),
            pl.BlockSpec(
                (1, Tv, Wv), lambda hb, vb, *_: (vb, 0, 0)
            ),
            th_spec,
            th_spec,
        ]
        + ([pl.BlockSpec(memory_space=pl.ANY)] if has_init else []),
        out_specs=pl.BlockSpec(
            (Tv, TC),
            lambda hb, vb, offv32, offh128, oidx_: (vb, oidx_[hb]),
        ),
    )

    body = functools.partial(
        _kernel,
        mode_v=mode_v,
        mode_h=mode_h,
        out_max=out_max,
        trunc_bits=trunc_bits,
        scale=scale,
        round_mode=round_mode,
        c=lop.c,
        gamma=gamma,
        alpha_index=alpha_index,
        in_gamma_mult=in_gamma_mult,
        out_gamma_mult=out_gamma_mult,
        order=order,
        qv_shift=qv_shift,
        qh_shift=qh_shift,
        x_shift=x_shift,
        chunk_rel=chunk_rel,
        win_c=win_c,
        gamma_pre=x_lo is not None,
    )

    def entry(offv_ref, offh_ref, oidx_ref, x_ref, *refs, **kw):
        del oidx_ref
        if has_init:  # drop the (never-read) aliased init ref
            refs = refs[:-2] + (refs[-1],)
        return body(offv_ref, offh_ref, x_ref, *refs, **kw)

    # The aliased init (when given) is the 9th/10th flat input:
    # 3 scalars + x (+ x_lo) + 4 tap tensors.
    alias_idx = 3 + 1 + (1 if x_lo is not None else 0) + 4

    out = pl.pallas_call(
        entry,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (Bv * Tv, out_cols * TC), out_dtype
        ),
        interpret=interpret,
        input_output_aliases=({alias_idx: 0} if has_init else {}),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bh * Bv * Tv * (
                Wv * WC
                + (th_a.shape[1] * win_c * 128 if chunked else WC * TC)
            ),
            bytes_accessed=Bh * Bv * Wv * WC
            * x.dtype.itemsize * (2 if x_lo is not None else 1)
            + Bv * Tv * Bh * TC * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(
        vop.offs // 32, lop.offs_l // 128, jnp.asarray(oidx, jnp.int32),
        x,
        *([x_lo] if x_lo is not None else []),
        tv_a, tv_b, th_a, th_b,
        *([out_init] if has_init else []),
    )
    return out


def choose_fused(
    vop: BlockedBandedOp,
    lop: LaneBlockedOp,
    mode1: str,
    mode2: str,
    gamma: bool,
    c: int,
    in_bytes: int = 1,
) -> tuple[bool, str]:
    """(use_fused, order): route between the fused two-pass kernel and
    the two-kernel pipeline (_separable_pass_lanes).

    Empirical rule from on-chip measurements (v5e, device-time ms,
    with the bandwidth-aware pick_tile of ops/banded.py and the
    lane-granular window alignment of ops/lanes.py):

      config                      unfused  fused-vh  fused-hv
      8K->1080p u8 RGB              0.949     0.688     1.530
      4K->8K u16 RGBA gamma         6.119     6.772     6.697  (r2
        u8-shaped tiles; SUPERSEDED by the in_bytes>=2 rule below —
        byte-aware tiles flip it to fused-vh 4.31/3.56 measured)
      4K->8K u8 RGB                 3.635     2.321     2.098
      VGA->XGA u8 RGB               0.043     0.055     0.051

    and for the int8 fixed-point mode (u8-in / 8-bit-out, fused-only;
    gamma rows vs the bf16-unfused gamma route):

      config                      unfused  fused-vh  fused-hv
      8K->1080p u8 RGB                        0.334
      4K->8K u8 RGB                           1.689     1.224
      1080p->4K u8 RGB                        0.416     0.327
      VGA->XGA u8 RGB                         0.039     0.032
    (round-2 numbers: DMA-shaped upsize tiles — pick_tile /
     pick_lane_tile — plus the interior/boundary lane split;
     docs/perf_analysis.md)
      8K->1080p u8 RGB gamma        2.111     1.375
      1080p->4K u8 RGB gamma        0.809               0.759
      VGA->XGA u8 RGB gamma         0.073               0.069

    Fusion removes the f32 intermediate's HBM round trip but pays
    (a) window-overlap recompute of the first pass and (b) in-kernel
    gamma recomputed over those overlapping windows.  Downsizing
    always wins with V-first fusion (the V pass shrinks rows before
    the wide horizontal matmul); upsizing wins with H-FIRST fusion
    (the H matmul runs on the window's fewer input rows) when the
    first pass reads the raw integer image cheaply (split2/int8, no
    gamma).  In int8 mode the fused kernel beats the (bf16) unfused
    route at every measured size (gamma included, using the
    division-free u8 linearization polynomial), so it is used
    whenever viable.  mode1 applies to whichever pass touches the
    raw input.
    """
    del mode2
    downsize = vop.n_out * lop.n_out <= vop.n_in * lop.n_in
    if mode1 == "int8":
        order = "vh" if downsize else "hv"
        use = int8_feasible(vop, lop, order, gamma) and fused_viable(
            vop, lop, order, int8=True
        )
        return use, order
    if downsize:
        return fused_viable(vop, lop, "vh", in_bytes=in_bytes), "vh"
    if in_bytes >= 2:
        # 2/4-byte (u16 / float) upsizes: fused V-first measured
        # fastest at the byte-aware tiles (pick_tile/pick_lane_tile —
        # vt=128, win_c-minimizing lane tile), gamma included
        # (tools/probe_u16_tiles.py, 4K->8K on v5e):
        #
        #   config                  unfused  fused-vh  fused-hv
        #   u16 RGBA gamma            5.90      4.31      5.27
        #   u16 RGBA                  5.31      3.47      3.64
        #   (+ interior/boundary lane split on top: see the r3
        #    perf_analysis 16-bit section)
        #
        # The unfused route loses to the f32 intermediate's HBM round
        # trips plus the XLA-materialized gamma passes; H-first loses
        # because the raw-input H pass runs split3 over the window
        # overlap.  The H-tap VMEM check uses single buffering
        # (h_tap_buffers=1): the taps are indexed by the OUTER grid
        # dim only, so Mosaic does not double-buffer them per vb step
        # (calibrated against measured compile successes/failures at
        # lt=768/576/1152).
        use = fused_viable(
            vop, lop, "vh", in_bytes=in_bytes, h_tap_buffers=1
        )
        return use, "vh"
    big = vop.n_out * lop.n_out * c >= 8_000_000
    use = (
        mode1 == "split2" and not gamma and big
        and fused_viable(vop, lop, "hv")
    )
    return use, "hv" if use else "vh"


def _int8_x_shift(
    first_l1_max: float, first_bits: int, in_max: float = 255.0
) -> int:
    """Inter-pass 15-bit quantization scale: the high limb
    (x15+64)>>7 must fit s8 for |y| <= in_max * l1_max of the first
    pass (in_max is the input's value range: 255 raw, 1.0 linear
    light), and the re-quantizing right shift must be positive.
    first_bits is the first pass's total fixed-point scale (q_shift,
    plus _GAMMA_IN_BITS when the input is quantized linear light)."""
    import math as _math

    if first_l1_max <= 0.0:
        return 0
    x_shift = int(
        _math.floor(_math.log2(16319.0 / (in_max * first_l1_max)))
    )
    return min(x_shift, first_bits - 1)


def int8_feasible(
    vop: BlockedBandedOp,
    lop: LaneBlockedOp,
    order: str = "vh",
    gamma: bool = False,
) -> bool:
    """Limb taps exist and the 15-bit intermediate scale is positive
    (l1_max pathologically large would overflow the high limb)."""
    if vop.taps_q1 is None or lop.taps_q1 is None:
        return False
    # Negative limb shifts arise when range scaling is folded into the
    # taps (float-in -> u16-out); such operators never take the int8
    # route (they aren't u8-out anyway — belt and braces).
    if vop.q_shift <= 0 or lop.q_shift <= 0:
        return False
    first = vop if order == "vh" else lop
    first_shift = vop.q_shift if order == "vh" else lop.q_shift
    if gamma:
        # The gamma first pass recombines limb products with << 14:
        # |xq limbs| <= 64, so the s32 bound is exact from the taps'
        # per-output abs limb sums.
        bound = (
            (64 * first.q_abs1 << 14)
            + (64 * (first.q_abs1 + first.q_abs0) << 7)
            + (1 << 26)
        )
        if bound >= 2**31:
            return False
    first_bits = first_shift + (_GAMMA_IN_BITS if gamma else 0)
    return (
        _int8_x_shift(
            first.l1_max, first_bits, in_max=1.0 if gamma else 255.0
        )
        >= 1
    )


def fused_viable(
    vop: BlockedBandedOp,
    lop: LaneBlockedOp,
    order: str = "vh",
    in_bytes: int = 1,
    int8: bool = False,
    h_tap_buffers: int = 2,
) -> bool:
    """Rough VMEM-budget check for the fused kernel's block shapes.

    Uses the tap representation the kernel actually streams: the
    CHUNKED banded H taps when available (n_ch x win_c x 128 per
    block, ops/lanes.py) rather than the dense [WC, TC] matrix — the
    difference decides viability for wide-lane upsize tiles."""
    Bv, Tv, Wv = vop.taps_hi.shape
    return fused_viable_shapes(
        Tv, Wv, lop, order, in_bytes=in_bytes, int8=int8,
        h_tap_buffers=h_tap_buffers,
    )


def fused_viable_shapes(
    Tv: int,
    Wv: int,
    lop: LaneBlockedOp,
    order: str = "vh",
    in_bytes: int = 1,
    int8: bool = False,
    h_tap_buffers: int = 2,
) -> bool:
    """Shape-based core of ``fused_viable`` — usable before a vertical
    operator exists (e.g. the sharded strip route, whose per-strip V
    blocks are built inside the traced body)."""
    Bh, WC, TC = lop.taps_hi.shape
    inter = Tv * WC if order == "vh" else Wv * TC
    tap_b = 1 if int8 else 2
    if lop.ctaps_hi is not None:
        n_ch = lop.ctaps_hi.shape[1]
        h_tap_el = n_ch * lop.win_c * 128
    else:
        h_tap_el = WC * TC
    vmem = (
        2 * Wv * WC * in_bytes  # double-buffered input window
        + 4 * Wv * WC          # f32 conversion temp
        + 2 * 2 * Tv * Wv * tap_b  # V taps hi/lo, double-buffered
        + h_tap_buffers * 2 * h_tap_el * tap_b  # H taps hi/lo
        + 4 * inter            # inter-pass f32 intermediate
        + 2 * 4 * Tv * TC      # output tiles
    )
    # Conservative estimate; Mosaic schedules within 16 MB VMEM (the
    # 8K-bench shapes, ~13.6 MB by this accounting, compile and run).
    return vmem < 14 * 1024 * 1024
