"""Device execution of banded scanline operators.

The planner (plan/compose.py) collapses each axis's filtering chain into a
single banded operator ``out[i] = sum_j taps[i, j] * src[starts[i] + j]``.
This module lowers that operator to the TPU MXU: the output axis is tiled
into blocks of ``tile`` rows; each block reads one contiguous input window
of ``win`` rows (window starts are plan-time constants), and the whole
pass becomes ONE batched dense matmul

    out[b] = A[b] @ x[offs[b] : offs[b] + win]      # [tile,win] @ [win,R]

which XLA tiles onto the systolic array.  This replaces the reference's
pointer-walking per-scanline kernels (doFilter/doResize/doUpsample,
/root/reference/avir.h:3249-4331) — there is no per-pixel gather on
device, only a blockwise contiguous window fetch plus MXU work.

Precision strategy (the TPU analog of the reference's float4/float8 SIMD
classes, avir_float4_sse.h / avir_float8_avx.h): the MXU multiplies
bf16 natively, so float32-accurate results come from error-free
splitting rather than slow full-f32 passes:

  - taps split as A = A_hi + A_lo (two bf16 matrices carrying ~16
    mantissa bits together);
  - 8-bit images are EXACT in bf16 (integers <= 256), so u8 pipelines
    need only 2 MXU passes (A_hi@x + A_lo@x);
  - wider values split as x = x_hi + x_lo, and the negligible
    A_lo@x_lo term (~2^-18 relative) is dropped: 3 passes.

``mode='exact'`` falls back to full float32 (Precision.HIGHEST, 6
passes) for verification.

For u8-in / 8-bit-out pipelines the fused Pallas kernel additionally
supports an MXU int8 mode (2x the bf16 rate): taps quantized to
radix-128 two-limb s8 fixed point (ops/intq.py, limbs precomputed here
as ``taps_q1``/``taps_q0``), input consumed as s8, intermediate
re-quantized to 15 bits in VMEM — 5 int8 matmuls ~ 2.5 bf16-pass
equivalents for the whole resize.

Everything here is shape-static: offsets, window sizes and tap tensors
are baked at plan time, so the resize function is traced once per
(geometry, params) and cached by jit.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..plan.compose import BandedOp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_tile(
    op: BandedOp, bytes_per_el: int = 2, in_bytes: int = 1
) -> int:
    """Choose the output tile size minimizing modeled kernel time.

    ``bytes_per_el`` weighs the HBM term of the generic (downsize)
    cost model and is kept at its tuned default; ``in_bytes`` is the
    INPUT element size and only steers the upsize shortcut (wide
    tiles for 1-byte DMA-bound kernels, 128 for 2/4-byte MAC-bound
    ones — tools/probe_u16_tiles.py).

    Cost model per input column: MXU MACs = n_blocks * tile * win
    (win ~= tile * k + width — small tiles waste less on the dense
    zero-fill of the band) PLUS the window-fetch HBM time expressed in
    MAC-equivalents (~120 MACs per byte at v5e peak-MAC/HBM-bandwidth
    ratio): n_blocks * win * bytes.  The bandwidth term matters on
    upsizing, where the alignment-rounded window makes small tiles
    MAC-equal but double the overlapping-window traffic (and starve
    the MXU's M dimension); 8 rows is the fp32 sublane minimum, so
    candidates start at 64.
    """
    n_out = op.n_out
    if n_out <= 64:
        return _round_up(max(n_out, 8), 8)
    k = (op.starts[-1] - op.starts[0]) / max(n_out - 1, 1)
    if k < 1.0 and n_out >= 512:
        # Upsizing: measured on v5e (tools/probe_upsize.py) — the
        # kernel is DMA-bound on its small strided windows/tiles, and
        # tile=256 amortizes the per-cell fetch best (4K->8K 1.387 ms
        # vs 1.47 at 128 / 1.60 at 192, with the wide lane tile of
        # ops/lanes.py:pick_lane_tile).  For 2/4-byte inputs (u16 /
        # float, split-bf16 MAC-bound rather than DMA-bound) tile=128
        # measured best and keeps the fused kernel inside VMEM
        # (tools/probe_u16_tiles.py: 4K->8K u16 RGBA gamma 4.31 ms at
        # vt=128 vs 4.54 at vt=256 / 4.63 at vt=64).
        return 256 if in_bytes <= 1 else 128
    best, best_cost = 64, None
    for tile in (64, 128, 256, 512):
        win = _round_up(int(math.ceil(tile * k)) + op.width + 8, 128)
        blocks = -(-n_out // tile)
        cost = blocks * win * (tile + 120 * bytes_per_el)
        if best_cost is None or cost < best_cost * 0.98:
            best, best_cost = tile, cost
    return best


@dataclasses.dataclass(frozen=True)
class BlockedBandedOp:
    """Plan-time constant, device-resident form of a BandedOp."""

    n_in: int
    n_out: int
    n_in_pad: int  # input rows after zero-pad (>= offs.max() + win)
    tile: int
    win: int
    offs: jax.Array      # int32 [n_blocks] — input window starts
    taps: jax.Array      # f32 [n_blocks, tile, win]
    taps_hi: jax.Array   # bf16 — round(taps)
    taps_lo: jax.Array   # bf16 — round(taps - taps_hi)
    # int8 fixed-point limbs (ops/intq.py); None when the op was built
    # from traced arrays (sharded halo path) — int8 mode unavailable.
    taps_q1: jax.Array | None = None  # s8 [n_blocks, tile, win]
    taps_q0: jax.Array | None = None  # s8
    q_shift: int = 0
    l1_max: float = 0.0  # max_i sum_j |taps[i, j]| — output magnitude
    # Max per-output abs limb sums along the contraction — s32
    # overflow bounds for the fused kernel's gamma int8 path.
    q_abs1: int = 0
    q_abs0: int = 0
    # Rows of zero-padding prepended to the input (uniform-offset
    # blocking only): offsets/taps are expressed in the padded
    # coordinate system, so callers must shift the input down by
    # pad_top rows before applying the operator.
    pad_top: int = 0

    @property
    def n_blocks(self) -> int:
        return self.offs.shape[0]

    @property
    def flops_per_col(self) -> int:
        return 2 * self.n_blocks * self.tile * self.win


def _bf16_split_np(dense: np.ndarray):
    """(hi, lo) error-free bf16 split in HOST numpy (ml_dtypes),
    bit-identical to the device cast chain hi = bf16(x);
    lo = bf16(x - f32(hi)) — round-to-nearest-even both ways.  Host
    numpy keeps executor builds off the device (each eager device op
    paid a transfer round trip, tools/probe_coldstart.py)."""
    import ml_dtypes

    hi = dense.astype(ml_dtypes.bfloat16)
    lo = (dense - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def block_banded(
    op: BandedOp,
    tile: int | None = None,
    lane_align: int = 128,
    uniform: bool = False,
    in_bytes: int = 1,
) -> BlockedBandedOp:
    """Lower a BandedOp to its blocked dense-matmul form.

    ``uniform=True`` forces a CONSTANT window stride: offs[b] = off0 +
    b*delta with off0 and delta multiples of 32 (the shift-ring
    kernel's contract, ops/pallas/fused_ring_kernel.py).  The boundary
    blocks — whose natural windows the default mode clamps into the
    input — are instead covered by zero-padding ``pad_top`` rows at the
    top (and more at the bottom via ``n_in_pad``); offsets and taps are
    expressed in the padded coordinates.  Raises ValueError when the
    plan's stride pattern is not uniform (non-constant-k)."""
    if tile is None:
        tile = pick_tile(op, in_bytes=in_bytes)
    n_out, width = op.n_out, op.width
    n_blocks = -(-n_out // tile)

    starts = op.starts.astype(np.int64)
    pad_top = 0
    if uniform:
        if n_blocks < 2:
            raise ValueError("uniform blocking needs >= 2 blocks")
        lo_starts = starts[np.arange(n_blocks) * tile]
        # Interior strides of a constant-k plan are exactly tile*k;
        # the first/last may differ (edge clamping in op.starts).
        deltas = np.diff(lo_starts[1:-1])
        if len(deltas) and not (deltas == deltas[0]).all():
            raise ValueError("non-uniform stride")
        delta = int(deltas[0]) if len(deltas) else int(
            np.diff(lo_starts).max()
        )
        if delta <= 0 or delta % 32:
            raise ValueError("stride not a positive multiple of 32")
        # offs[b] must start at or before each block's first tap row;
        # a negative base becomes top padding.
        off0 = int((lo_starts - delta * np.arange(n_blocks)).min())
        off0 = (off0 // 32) * 32
        pad_top = max(0, -off0)
        offs = off0 + pad_top + delta * np.arange(n_blocks)
        starts = starts + pad_top
        spans = np.empty(n_blocks, dtype=np.int64)
        for b in range(n_blocks):
            hi = min(b * tile + tile, n_out)
            spans[b] = starts[hi - 1] + width - offs[b]
        win = _round_up(int(spans.max()), lane_align)
        n_in_pad = max(op.n_in + pad_top, int(offs.max()) + win)
    else:
        offs = np.empty(n_blocks, dtype=np.int64)
        spans = np.empty(n_blocks, dtype=np.int64)
        for b in range(n_blocks):
            lo = b * tile
            hi = min(lo + tile, n_out)
            # Align window starts to the coarsest sublane tiling (32
            # rows, u8) so the Pallas kernel's element-offset windows
            # satisfy Mosaic's divisibility requirement.
            offs[b] = (starts[lo] // 32) * 32
            spans[b] = starts[hi - 1] + width - offs[b]
        win = _round_up(int(spans.max()), lane_align)

        # Pull overrunning tail windows left (32-aligned) so offs+win
        # fits inside the input — padding an 8K source costs a full
        # extra HBM copy.  Only possible when the widened spans still
        # fit in win.
        max_off = (op.n_in - win) // 32 * 32
        if max_off >= 0 and int(
            (spans + np.maximum(offs - max_off, 0)).max()
        ) <= win:
            shift = np.maximum(offs - max_off, 0)
            offs -= shift
            n_in_pad = op.n_in
        else:
            n_in_pad = max(op.n_in, int(offs.max()) + win)

    dense = np.zeros((n_blocks, tile, win), dtype=np.float32)
    rows = np.arange(n_out)
    b_of = rows // tile
    r_of = rows % tile
    col0 = starts - offs[b_of]
    for j in range(width):
        dense[b_of, r_of, col0 + j] = op.taps[:, j]

    # Split-bf16 tap planes computed in HOST numpy (ml_dtypes), not
    # eager jnp: each eager device op would pay a transfer round trip
    # at executor-build time (measured: the u16 flagship's build was
    # 75 s through this rig's tunneled chip vs 0.7 s host-side —
    # tools/probe_coldstart.py).  Values are bit-identical
    # (round-to-nearest-even f32->bf16 both ways).
    hi_np, lo_np = _bf16_split_np(dense)
    # Tensors stay HOST numpy in the dataclass: jit traces embed them
    # as constants, so only the planes a compiled route actually
    # references are ever transferred (the fused route uses the
    # chunked/limb forms — eagerly device_put-ing every full-tap plane
    # shipped ~0.5 GB per u16 executor through the tunnel for nothing).
    taps = dense
    taps_hi = hi_np
    taps_lo = lo_np

    # int8 limb taps exist for u8 pipelines only (the MXU int8 mode
    # requires raw u8 input); quantizing them for 2/4-byte inputs was
    # pure waste — 61 of the u16 flagship's 68 s executor build
    # (tools/probe_coldstart.py).
    q1 = q0 = None
    q_shift = 0
    if in_bytes <= 1:
        from .intq import first_pass_overflow_safe, quantize_limbs

        q1, q0, q_shift = quantize_limbs(dense)
        if not first_pass_overflow_safe(q1, q0, contract_axis=2):
            q1 = q0 = None  # pragma: no cover - pathological taps
    return BlockedBandedOp(
        n_in=op.n_in,
        n_out=n_out,
        n_in_pad=n_in_pad,
        tile=tile,
        win=win,
        offs=np.asarray(offs, dtype=np.int32),
        taps=taps,
        taps_hi=taps_hi,
        taps_lo=taps_lo,
        taps_q1=q1,
        taps_q0=q0,
        q_shift=q_shift,
        l1_max=float(np.abs(dense).sum(axis=2).max()),
        q_abs1=0 if q1 is None else int(
            np.abs(q1.astype(np.int64)).sum(axis=2).max()
        ),
        q_abs0=0 if q0 is None else int(
            np.abs(q0.astype(np.int64)).sum(axis=2).max()
        ),
        pad_top=pad_top,
    )


def _bmm(a: jax.Array, b: jax.Array, precision=None) -> jax.Array:
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def apply_blocked(
    bop: BlockedBandedOp,
    x: jax.Array,
    mode: str = "exact",
) -> jax.Array:
    """Apply the operator along axis 0 of ``x`` ([n_in, R] -> [n_out, R]).

    mode: 'exact' (float32, Precision.HIGHEST), 'split2' (bf16 split
    taps, image cast to bf16 — only for values exactly representable in
    bf16, e.g. 8-bit integers), 'split3' (bf16 split taps AND split
    image).
    """
    r = x.shape[1]
    if bop.pad_top or bop.n_in_pad > x.shape[0]:
        x = jnp.pad(
            x,
            (
                (bop.pad_top, bop.n_in_pad - bop.pad_top - x.shape[0]),
                (0, 0),
            ),
        )
    idx = bop.offs[:, None] + jnp.arange(bop.win, dtype=jnp.int32)[None, :]
    xw = jnp.take(x, idx.reshape(-1), axis=0).reshape(
        bop.n_blocks, bop.win, r
    )
    if mode == "exact":
        y = _bmm(bop.taps, xw, jax.lax.Precision.HIGHEST)
    elif mode == "split2":
        xwb = xw.astype(jnp.bfloat16)
        y = _bmm(bop.taps_hi, xwb) + _bmm(bop.taps_lo, xwb)
    elif mode == "split3":
        xwh = xw.astype(jnp.bfloat16)
        # The barrier stops XLA's excess-precision simplifier from
        # collapsing f32(bf16(x)) back to x, which would zero the
        # residual and silently degrade to single-bf16 accuracy.
        xwh_b = jax.lax.optimization_barrier(xwh)
        xwl = (xw - xwh_b.astype(jnp.float32)).astype(jnp.bfloat16)
        y = (
            _bmm(bop.taps_hi, xwh)
            + _bmm(bop.taps_lo, xwh)
            + _bmm(bop.taps_hi, xwl)
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return y.reshape(bop.n_blocks * bop.tile, r)[: bop.n_out]
