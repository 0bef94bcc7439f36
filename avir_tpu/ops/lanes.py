"""Lane-side blocked form of a banded operator.

The second (horizontal) pass of a resize consumes the first pass's
output [rows, W*C] and must contract over W.  The straightforward
lowering transposes to put W on the leading axis — two large layout
copies that dominate the pipeline's HBM traffic.  This module instead
builds, per output block, a dense RIGHT-multiplication matrix over the
interleaved lane axis:

    out[:, b*T*C : (b+1)*T*C] = x[:, offs_l[b] : offs_l[b] + win_l] @ B[b]

with B[b][q*C + ch - offs_l[b], t*C + ch] = taps[b*T + t, q - start].
The input is consumed in its natural layout and the output IS the final
interleaved [rows, new_w*C] layout — no transposes anywhere.  The
channel-diagonal structure wastes a factor C of MXU work, which is far
cheaper than the transposes it replaces.

Window starts are LANE-granular: ``offs_l`` holds multiples of 128
LANES (the Mosaic lane-tiling requirement), not of 128/gcd(c,128)
pixels.  For channel counts that don't divide 128 (C=3) a window may
therefore start mid-pixel; the tap matrix absorbs the channel phase.
This matters: pixel-granular 128-lane alignment for C=3 needs
128-PIXEL steps, wasting up to 127 pixels (381 zero-tap lanes) of
window per block — measured ~2x extra horizontal MXU work on upsizes.
The only in-kernel consumer of channel phase is the C=4 alpha-bypass
lane mask, and for C in {1,2,4} a 128-lane offset is always
pixel-aligned, so window-local ``lane % c`` stays valid.

This mirrors the reference's interleaved processing mode
(packmode=0, avir.h:4569-4592), where taps are applied across
interleaved channel elements.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..plan.compose import BandedOp
from .banded import _round_up


@dataclasses.dataclass(frozen=True)
class LaneBlockedOp:
    """Right-multiplication lane form.  ``tile`` is in ROWS of the
    original operator (output pixels per block); window geometry
    (``offs_l``, ``win_l``, ``lanes_pad``) is in LANES."""

    n_in: int      # input length (rows of the banded op)
    n_out: int
    c: int         # interleaved channel count
    tile: int      # output rows per block
    win_l: int     # input-window LANES per block (multiple of 128)
    lanes_pad: int  # required input lanes incl. zero-pad
    offs_l: jax.Array    # int32 [n_blocks] — window starts in LANES
    taps_hi: jax.Array   # bf16 [n_blocks, win_l, tile*c]
    taps_lo: jax.Array   # bf16 [n_blocks, win_l, tile*c]
    # int8 fixed-point limbs (ops/intq.py).
    taps_q1: jax.Array | None = None  # s8 [n_blocks, win_l, tile*c]
    taps_q0: jax.Array | None = None  # s8
    q_shift: int = 0
    # Chunked form: the block tap matrix is banded (each output lane
    # contracts only ``width*c`` of the ``win_l`` window lanes), so the
    # [win_l, tile*c] dense matmul wastes MACs on structural zeros.
    # Splitting the outputs into 128-lane chunks, each contracting only
    # its own win_c-lane sub-window (static 128-aligned offsets), cuts
    # the MXU work by win_l/win_c (~2x at k=4, C=3) — the lane-form
    # analog of the reference exploiting filter locality per pixel
    # (doResize tap walks, avir.h:3884-4099).  None when tile*c == 128
    # or the band already fills the window.
    chunk_rel: tuple[int, ...] | None = None  # per-chunk window offset
    win_c: int = 0                            # chunk window lanes
    # Subset form (block_list): original output-column index of each
    # block; None for the full operator (identity mapping).
    out_idx: np.ndarray | None = None
    ctaps_hi: jax.Array | None = None  # bf16 [n_blocks, n_ch, win_c, 128]
    ctaps_lo: jax.Array | None = None
    ctaps_q1: jax.Array | None = None  # s8
    ctaps_q0: jax.Array | None = None
    l1_max: float = 0.0  # max_col sum |taps| — output magnitude bound
    # Max per-output abs limb sums along the contraction — s32
    # overflow bounds for the fused kernel's gamma int8 path.
    q_abs1: int = 0
    q_abs0: int = 0

    @property
    def n_blocks(self) -> int:
        return self.offs_l.shape[0]


def lane_chunk_geometry(
    op: BandedOp, c: int, tile: int
) -> tuple[int, int, int]:
    """(win_l, win_c, n_ch) of the lane form at ``tile``, computed
    from starts/width alone — no dense tap materialization.  Used by
    the tile picker: the chunk window win_c (hence H MACs and the
    chunked-tap VMEM) depends strongly on the tile's phase relative to
    the resize ratio, so candidate tiles must be compared before
    building the operator."""
    n_out, width = op.n_out, op.width
    n_blocks = -(-n_out // tile)
    starts = op.starts.astype(np.int64)
    offs_l = np.empty(n_blocks, dtype=np.int64)
    spans = np.empty(n_blocks, dtype=np.int64)
    for b in range(n_blocks):
        lo = b * tile
        hi = min(lo + tile, n_out)
        offs_l[b] = (starts[lo] * c // 128) * 128
        spans[b] = (starts[hi - 1] + width) * c - offs_l[b]
    win_l = _round_up(int(spans.max()), 128)
    n_ch = (tile * c) // 128
    if n_ch <= 1 or (tile * c) % 128:
        return win_l, 0, n_ch
    rel = np.full(n_ch, np.iinfo(np.int64).max)
    ends = np.zeros(n_ch, dtype=np.int64)
    for b in range(n_blocks):
        lo = b * tile
        for j in range(n_ch):
            p0 = min((lo * c + j * 128) // c, n_out - 1)
            p1 = min((lo * c + j * 128 + 127) // c, n_out - 1)
            s = starts[p0] * c - offs_l[b]
            e = (starts[p1] + width) * c - offs_l[b]
            rel[j] = min(rel[j], (s // 128) * 128)
            ends[j] = max(ends[j], e)
    win_c = _round_up(int((ends - rel).max()), 128)
    return win_l, min(win_c, win_l), n_ch


def pick_lane_tile(
    op: BandedOp, c: int, wide: bool = True, in_bytes: int = 1
) -> int:
    """Default output-pixels-per-block for the lane form.

    Downsizing keeps the small default (window rows are already long —
    win_l ~ tile*c*k).  UPSIZING (k < 1) widens the tile until the
    output block reaches ~2304 lanes: measured on v5e
    (tools/probe_updma.py), strided u8 DMA saturates (>700 GB/s) only
    at >= ~2304-byte rows, and the default 384-lane tiles run the
    whole upsize kernel DMA-bound at ~150-315 GB/s; the wide tile also
    amortizes the filter overhang across 6x more output lanes
    (tools/probe_upsize.py: 4K->8K 1.619 -> 1.387 ms).  The reference's
    counterpart lever is doResize2's stride-2 tap walk
    (/root/reference/avir.h:4114-4331) — same goal, bandwidth-shaped
    for TPU."""
    step = 128 // int(np.gcd(c, 128))
    base = step * max(1, -(-64 // step))
    n_out = op.n_out
    # ``wide=False``: the caller streams the DENSE [win_l, tile*c] tap
    # blocks (the unfused lanes kernel, ops/pallas/lanes_kernel.py),
    # whose bf16 hi/lo pair at the wide tile exceeds the 16 MB scoped
    # VMEM; only the fused kernel's chunked taps afford the wide form.
    if not wide or n_out < 2:
        return base
    k = (op.starts[-1] - op.starts[0]) / (n_out - 1)
    if k >= 1.0 or n_out * c < 4096:
        return base
    if in_bytes <= 1:
        return step * max(1, -(-2304 // (step * c)))
    # 2/4-byte inputs (u16 / float): the split-bf16 upsize kernel is
    # MAC-bound on the chunked H window, and win_c swings wildly with
    # the tile's phase against the resize ratio (measured 4K->8K u16
    # RGBA: tile 576 px -> win_c 1280, Mosaic OOM; 768 px -> win_c 512,
    # 4.31 ms; tools/probe_u16_tiles.py).  Scan DMA-saturating
    # candidates (>= 2304 bytes of output row per block) and take the
    # one minimizing modeled H MACs + tap VMEM.
    lo_px = max(base, step * -(-2304 // (step * c * in_bytes)))
    # Descending: near-ties resolve to the LARGER tile (fewer blocks =
    # less window-overlap DMA, the measured winner at equal win_c).
    cands = sorted(
        {step * -(-px // step) for px in (lo_px, 384, 512, 768, 1024)},
        reverse=True,
    )
    best, best_cost = None, None
    for t in cands:
        if t < lo_px or t * c % 128:
            continue
        win_l, win_c, n_ch = lane_chunk_geometry(op, c, t)
        if win_c == 0:
            win_c = win_l
        tap_bytes = n_ch * win_c * 128 * 2 * 2  # bf16 hi/lo
        if tap_bytes > 8 * 1024 * 1024:
            continue  # chunked taps would blow the fused-kernel VMEM
        blocks = -(-n_out // t)
        # Per-input-row cost in MAC-equivalents: chunked H MACs
        # (x1.5 for the split3 residual pass amortization) plus the
        # window-overlap DMA at ~120 MACs/byte (pick_tile's measured
        # v5e peak-MAC/HBM ratio).  Reproduces the measured ordering
        # 768 px (4.31 ms) < 384 px (4.48) < 1152 px (OOM) at the
        # 4K->8K u16 RGBA config.
        cost = blocks * (
            n_ch * win_c * 128 * 3 // 2 + win_l * in_bytes * 120
        )
        if best_cost is None or cost < best_cost * 0.98:
            best, best_cost = t, cost
    if best is not None:
        return best
    # Every candidate failed the tap-VMEM filter: return the smallest
    # DMA-saturating candidate anyway — the fused-route viability gate
    # (fused_viable) rejects what truly doesn't fit and the UNFUSED
    # route rebuilds at the narrow tile itself (_narrow_lop), whereas
    # returning `base` here could hand the fused kernel a
    # DMA-starved sub-2304-byte tile that IS viable and slow.
    fitting = [t for t in cands if t >= lo_px]
    return min(fitting) if fitting else base


def lane_block_banded(
    op: BandedOp, c: int, tile: int | None = None,
    block_list: list[int] | None = None,
    in_bytes: int = 1,
) -> LaneBlockedOp:
    """Build the lane-side blocked form.

    Window starts are 128-LANE aligned (up to 127 lanes of zero-tap
    slack per block).  The default tile comes from ``pick_lane_tile``
    (a multiple of 128/gcd(c,128) rows, so each output block spans a
    whole number of 128-lane tiles).

    ``block_list`` restricts the result to a SUBSET of output blocks
    (identical offsets/taps — arrays are built for all blocks, then
    sliced — but the chunked-band sub-window ``win_c`` is recomputed
    from the subset alone).  The edge blocks' clamped tap phases
    inflate the shared chunk windows by 1-2 x 128 lanes (the chunk
    slice offsets must be block-invariant), so splitting interior and
    boundary blocks into separate kernel calls tightens the interior
    win_c; ``out_idx`` records each subset block's original column."""
    step = 128 // int(np.gcd(c, 128))
    if tile is None:
        tile = pick_lane_tile(op, c, in_bytes=in_bytes)
    n_out, width = op.n_out, op.width
    n_blocks = -(-n_out // tile)
    starts = op.starts.astype(np.int64)

    offs_l = np.empty(n_blocks, dtype=np.int64)
    spans_l = np.empty(n_blocks, dtype=np.int64)
    for b in range(n_blocks):
        lo = b * tile
        hi = min(lo + tile, n_out)
        offs_l[b] = (starts[lo] * c // 128) * 128
        spans_l[b] = (starts[hi - 1] + width) * c - offs_l[b]
    win_l = _round_up(int(spans_l.max()), 128)
    # Pull overrunning tail windows left (128-lane aligned) to avoid
    # padding the input lanes.
    max_off = (op.n_in * c - win_l) // 128 * 128
    if max_off >= 0 and int(
        (spans_l + np.maximum(offs_l - max_off, 0)).max()
    ) <= win_l:
        offs_l -= np.maximum(offs_l - max_off, 0)
    lanes_pad = int(offs_l.max()) + win_l

    dense = np.zeros((n_blocks, win_l, tile * c), dtype=np.float32)
    for b in range(n_blocks):
        lo = b * tile
        hi = min(lo + tile, n_out)
        for i in range(lo, hi):
            s_l = int(starts[i]) * c - int(offs_l[b])
            t = i - lo
            for ch in range(c):
                dense[
                    b,
                    (s_l + ch) : (s_l + width * c + ch) : c,
                    t * c + ch,
                ] = op.taps[i]

    # Fixed-point scales, norms and overflow bounds come from the FULL
    # operator so block subsets stay bit-identical to the full form.
    # Limbs are u8-pipeline-only (see ops/banded.py): skipping them for
    # 2/4-byte inputs removes the dominant executor-build cost.
    q1 = q0 = None
    q_shift = 0
    if in_bytes <= 1:
        from .intq import first_pass_overflow_safe, quantize_limbs

        q1, q0, q_shift = quantize_limbs(dense)
        if not first_pass_overflow_safe(q1, q0, contract_axis=1):
            q1 = q0 = None  # pragma: no cover - pathological taps
    l1_max = float(np.abs(dense).sum(axis=1).max())
    q_abs1 = 0 if q1 is None else int(
        np.abs(q1.astype(np.int64)).sum(axis=1).max()
    )
    q_abs0 = 0 if q0 is None else int(
        np.abs(q0.astype(np.int64)).sum(axis=1).max()
    )

    out_idx = None
    if block_list is not None:
        out_idx = np.asarray(block_list, dtype=np.int64)
        dense = dense[out_idx]
        offs_l = offs_l[out_idx]
        if q1 is not None:
            q1, q0 = q1[out_idx], q0[out_idx]

    # Host-numpy bf16 split (bit-identical to the device cast): eager
    # jnp conversions here cost a device round trip PER OP at
    # executor-build time — and the chunked form below then fetched
    # the split planes BACK from the device for slicing.  Measured
    # through the tunneled chip: 75 s -> host-side sub-second
    # (tools/probe_coldstart.py).
    from .banded import _bf16_split_np

    hi_np, lo_np = _bf16_split_np(dense)
    # Host numpy (see ops/banded.py): jit embeds only what a route
    # actually uses.
    taps_hi = hi_np
    taps_lo = lo_np

    # Chunked banded form: per 128-lane output chunk, the sub-window of
    # contraction lanes actually touched (uniform across blocks up to
    # fractional phase; offsets 128-aligned so the kernel's in-VMEM
    # slices are legal).  bf16 rounding and limb splitting are
    # elementwise, so slicing the already-split tensors keeps the
    # chunked and full forms numerically identical.
    chunk_rel = None
    win_c = 0
    c_hi = c_lo = c_q1 = c_q0 = None
    n_ch = (tile * c) // 128
    if n_ch > 1 and (tile * c) % 128 == 0:
        rel = np.empty(n_ch, dtype=np.int64)
        ends = np.empty(n_ch, dtype=np.int64)
        for j in range(n_ch):
            used = np.nonzero(
                np.any(dense[:, :, j * 128 : (j + 1) * 128], axis=(0, 2))
            )[0]
            lo_u, hi_u = (
                (int(used[0]), int(used[-1]) + 1) if used.size else (0, 1)
            )
            rel[j] = (lo_u // 128) * 128
            ends[j] = hi_u
        win_c = _round_up(int((ends - rel).max()), 128)
        if win_c < win_l:
            rel = np.minimum(rel, win_l - win_c)
            chunk_rel = tuple(int(r) for r in rel)
            sl = [
                (slice(None), slice(r, r + win_c),
                 slice(j * 128, (j + 1) * 128))
                for j, r in enumerate(chunk_rel)
            ]
            c_hi = np.stack([hi_np[s] for s in sl], axis=1)
            c_lo = np.stack([lo_np[s] for s in sl], axis=1)
            if q1 is not None:
                c_q1 = np.stack([q1[s] for s in sl], axis=1)
                c_q0 = np.stack([q0[s] for s in sl], axis=1)
    return LaneBlockedOp(
        n_in=op.n_in,
        n_out=n_out,
        c=c,
        tile=tile,
        win_l=win_l,
        lanes_pad=lanes_pad,
        offs_l=np.asarray(offs_l, dtype=np.int32),
        taps_hi=taps_hi,
        taps_lo=taps_lo,
        taps_q1=q1,
        taps_q0=q0,
        q_shift=q_shift,
        chunk_rel=chunk_rel,
        win_c=win_c,
        ctaps_hi=c_hi,
        ctaps_lo=c_lo,
        ctaps_q1=c_q1,
        ctaps_q0=c_q0,
        l1_max=l1_max,
        q_abs1=q_abs1,
        q_abs0=q_abs0,
        out_idx=out_idx,
    )
