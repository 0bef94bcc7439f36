"""Fused two-pass kernel with in-VMEM de-interleave ("DIL" mode).

TPU-native successor of ops/pallas/fused_kernel.py that plays the role
of the reference's de-interleaved processing mode (``fpclass_def_dil``,
/root/reference/avir_dil.h:1014-1038).  The interleaved fused kernel's
horizontal matmul embeds channel-diagonal taps ([win_h*C, T_h*C]) and
therefore performs C times the necessary MXU work.  This kernel:

  1. streams the SAME interleaved input windows (no de-interleave HBM
     pass — a whole-image [h,w,c]->[c,h,w] transpose measured 3x slower
     than the entire fused kernel, the classic channels-minor-layout
     trap);
  2. runs the vertical pass interleaved (rows are channel-agnostic):
     v = taps_v @ x -> [T_v, win_h*C];
  3. de-interleaves v in VMEM with strided lane slices v[:, ch::C]
     (a vector shuffle, no HBM traffic) — the moral equivalent of the
     reference DIL mode's per-channel SIMD registers;
  4. runs C DENSE horizontal matmuls [T_v, win_h] @ [win_h, T_h] —
     exactly C times fewer MACs than the diagonal form;
  5. writes channel-GROUPED output tiles [T_v, C*T_h]; the caller
     re-interleaves the (small) output with one cheap XLA permute.

Gamma-in is applied on the interleaved window (lane mask for alpha);
gamma-out per channel plane, where the alpha bypass is a free
trace-time branch.

STATUS: correct in interpret mode (covered by tests), but does NOT
compile under Mosaic — ``vector.extract_strided_slice`` is restricted
to stride 1, and the TPU gather lowering only supports within-register
(128-lane) permutations, so there is no efficient in-VMEM lane
de-interleave primitive today.  The routing layer
(fused_kernel.choose_fused) therefore never selects this kernel; it is
kept as the ready-made fast path for when Mosaic grows strided lane
slices.  (The v1 alternative — whole-image de-interleave in HBM,
planar_kernel.py — compiles but measured 2x slower than the
interleaved fused kernel: the channels-minor transpose costs more than
the channel-diagonal MACs it saves.)
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
    out_ref, *, c, mode_v, mode_h, out_max, trunc_bits, scale,
    round_mode, gamma, alpha_index, in_gamma_mult, out_gamma_mult,
):
    xw = x_ref[...]
    if xw.dtype in (jnp.uint8, jnp.uint16, jnp.int8, jnp.int16):
        xw = xw.astype(jnp.int32).astype(jnp.float32)
    else:
        xw = xw.astype(jnp.float32)
    if gamma:
        xw = _srgb_to_linear(
            xw * jnp.float32(in_gamma_mult), c, alpha_index
        )

    # ---- vertical pass (interleaved): [T_v, W_v] @ [W_v, win_h*C] ---
    xb = xw.astype(jnp.bfloat16)
    v = jnp.dot(tvh_ref[0], xb, preferred_element_type=jnp.float32)
    v = v + jnp.dot(tvl_ref[0], xb, preferred_element_type=jnp.float32)
    if mode_v == "split3":
        xl = (xw - xb.astype(jnp.float32)).astype(jnp.bfloat16)
        v = v + jnp.dot(
            tvh_ref[0], xl, preferred_element_type=jnp.float32
        )

    tv = v.shape[0]
    whc = v.shape[1]
    wh = whc // c
    th = thh_ref.shape[2]

    # ---- de-interleave + dense horizontal pass per channel ----------
    for ch in range(c):
        # VMEM lane-strided slice: the in-register de-interleave.
        vch = jax.lax.slice(v, (0, ch), (tv, whc), (1, c))
        vh_ = vch.astype(jnp.bfloat16)
        acc = jnp.dot(
            vh_, thh_ref[0], preferred_element_type=jnp.float32
        )
        acc = acc + jnp.dot(
            vh_, thl_ref[0], preferred_element_type=jnp.float32
        )
        if mode_h == "split3":
            vl = (vch - vh_.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                vl, thh_ref[0], preferred_element_type=jnp.float32
            )

        if gamma and ch != alpha_index:
            acc = _linear_to_srgb(acc, 1, -1)
        if gamma and out_gamma_mult != 0.0:
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
            acc = acc.astype(jnp.int32).astype(out_ref.dtype)
        out_ref[:, ch * th : (ch + 1) * th] = acc


def apply_planar2_pallas(
    vop: BlockedBandedOp,
    pop: LaneBlockedOp,
    x: jax.Array,
    c: int,
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
    interpret: bool = False,
) -> jax.Array:
    """[n_in_rows, n_in*C] interleaved -> [Bv*T_v, Bh*C*T_h] with
    channel-GROUPED lanes per H block; use ``regroup_channels`` to
    re-interleave.  ``pop`` is the dense lane form
    (lane_block_banded(op, 1)); its window/offset geometry is shared
    with the interleaved window fetch (win_h pixels * C lanes)."""
    rows, lanes = x.shape
    Bv, Tv, Wv = vop.taps_hi.shape
    Bh, Wh, Th = pop.taps_hi.shape

    need_rows = vop.n_in_pad
    need_lanes = pop.lanes_pad * c
    if need_rows > rows or need_lanes > lanes:
        x = jnp.pad(
            x,
            (
                (0, max(need_rows - rows, 0)),
                (0, max(need_lanes - lanes, 0)),
            ),
        )

    grid = (Bh, Bv)
    WhC = Wh * c

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(Wv), pl.Element(WhC)),
                lambda hb, vb, offv32, offh128: (
                    offv32[vb] * 32,
                    offh128[hb] * 128,
                ),
            ),
            pl.BlockSpec(
                (1, Tv, Wv), lambda hb, vb, *_: (vb, 0, 0)
            ),
            pl.BlockSpec(
                (1, Tv, Wv), lambda hb, vb, *_: (vb, 0, 0)
            ),
            pl.BlockSpec(
                (1, Wh, Th), lambda hb, vb, *_: (hb, 0, 0)
            ),
            pl.BlockSpec(
                (1, Wh, Th), lambda hb, vb, *_: (hb, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (Tv, c * Th), lambda hb, vb, *_: (vb, hb)
        ),
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            c=c,
            mode_v=mode_v,
            mode_h=mode_h,
            out_max=out_max,
            trunc_bits=trunc_bits,
            scale=scale,
            round_mode=round_mode,
            gamma=gamma,
            alpha_index=alpha_index,
            in_gamma_mult=in_gamma_mult,
            out_gamma_mult=out_gamma_mult,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (Bv * Tv, Bh * c * Th), out_dtype
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bh * Bv * Tv * (Wv * Wh * c + c * Wh * Th),
            bytes_accessed=Bh * Bv * Wv * Wh * c * x.dtype.itemsize
            + Bv * Tv * Bh * c * Th * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )((vop.offs // 32), (pop.offs_l * c) // 128, x,
      vop.taps_hi, vop.taps_lo, pop.taps_hi, pop.taps_lo)
    return out


def regroup_channels(
    out: jax.Array, c: int, th: int, new_h: int, new_w: int
) -> jax.Array:
    """[Bv*T_v, Bh*C*T_h] channel-grouped -> [new_h, new_w*c]
    interleaved (small output-side permute)."""
    rows, lanes = out.shape
    bh = lanes // (c * th)
    x = out.reshape(rows, bh, c, th).transpose(0, 1, 3, 2)
    return x.reshape(rows, bh * th * c)[:new_h, : new_w * c]


def planar2_viable(
    vop: BlockedBandedOp, pop: LaneBlockedOp, c: int
) -> bool:
    """VMEM-budget check for the in-VMEM de-interleave kernel."""
    Bv, Tv, Wv = vop.taps_hi.shape
    Bh, Wh, Th = pop.taps_hi.shape
    WhC = Wh * c
    vmem = (
        2 * Wv * WhC           # double-buffered input window (u8-worst)
        + 4 * Wv * WhC         # f32 conversion temp
        + 2 * 2 * Tv * Wv * 2  # V taps hi/lo, double-buffered
        + 2 * 2 * Wh * Th * 2  # H taps hi/lo (dense), double-buffered
        + 4 * Tv * WhC         # V intermediate
        + 4 * Tv * Wh          # de-interleaved channel slice
        + 2 * 4 * Tv * c * Th  # output tiles
    )
    return vmem < 14 * 1024 * 1024
