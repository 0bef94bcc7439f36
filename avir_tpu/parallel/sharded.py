"""Multi-chip sharded execution: scanline parallelism over a device mesh.

The reference's only parallelism is a thread pool fanning scanlines across
host threads (/root/reference/avir.h:2102-2225, 4861-4894).  The TPU-native
equivalent shards image ROWS across a mesh axis:

  - the horizontal pass needs only full scanlines, which every device has
    (W is unsharded) — embarrassingly parallel, zero communication;
  - the vertical pass contracts over the sharded row axis; each device
    computes its strip of output rows from its input strip plus small
    HALO regions exchanged with mesh neighbors via ``jax.lax.ppermute``
    over ICI.  The halo size is the banded operator's overhang past the
    strip boundary — known statically from the plan (it is exactly the
    reference's per-step InPrefix/InSuffix requirement,
    avir.h:5899-5900, reborn as a communication pattern).

A second mesh axis gives batch data-parallelism for free (images are
independent).  When a plan's vertical band is wider than a strip (extreme
downsizing on many devices), the builder falls back to a row
``all_gather`` for correctness.

All collectives are XLA collectives inside one jitted ``shard_map`` —
there is no NCCL/MPI equivalent to manage.

Row padding: inputs whose height is not a multiple of the row-mesh size
are zero-padded with ``pad_rows``.  This is sound because the composed
vertical taps only ever reference rows < src_h (edge clamping is folded
into the taps at compose time), so pad rows are processed by the local H
pass but never read by the V pass.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Optional

logger = logging.getLogger("avir_tpu.parallel")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.banded import BandedOp, _round_up, apply_blocked, block_banded
from ..ops.dither import default_dither_jnp
from ..ops.gamma import linear_to_srgb_jnp, srgb_to_linear_jnp
from ..plan.plan import ResizePlan


@dataclasses.dataclass(frozen=True)
class ShardedVOp:
    """Per-device blocked form of the vertical banded operator.

    Device d owns output rows [d*m, (d+1)*m) (m = padded n_out / n_dev)
    and reads input rows [d*strip - halo_lo, (d+1)*strip + halo_hi) in
    global coordinates (or all rows in the all-gather fallback).
    """

    n_in: int            # global input rows (unpadded image height)
    n_out: int           # global output rows (unpadded)
    strip: int           # input rows per device (of the padded height)
    m: int               # output rows per device
    halo_lo: int
    halo_hi: int
    win: int
    tile: int
    offs: np.ndarray     # int32 [n_dev, blocks] — local window starts
    taps: np.ndarray     # f32 [n_dev, blocks, tile, win]
    use_all_gather: bool
    # INTERIOR block range [b_int0, b_int1): blocks whose windows lie
    # fully inside the local strip on EVERY device (no halo rows), so
    # their compute can be issued independently of — and overlapped
    # with — the halo ppermutes (BASELINE north star: "collective
    # permutes overlapped with interior convolution compute").  The
    # border blocks are the prefix [0, b_int0) and suffix [b_int1, B).
    b_int0: int = 0
    b_int1: int = 0


def _interior_split(
    offs: np.ndarray,
    valid: np.ndarray,
    halo_lo: int,
    strip: int,
    win: int,
) -> tuple[int, int]:
    """Classify blocks as interior (window inside the local strip on
    every device that uses them) vs border, and repair unused entries.

    Mutates ``offs``: entries where ``valid`` is False (blocks with no
    real output rows on that device; taps are all zero) borrow a valid
    device's offset so that interior-rebased slicing stays in range.
    Returns the contiguous interior range [b0, b1) — (0, 0) when the
    interior is empty or non-contiguous (falls back to all-border,
    i.e. the previous non-overlapped behavior).  The fallback is
    correct but forfeits the halo/compute overlap; it is logged at
    DEBUG so deployments can notice (it happens when strips are so
    small relative to the V window that every block touches a halo —
    e.g. many devices on a short image — or, pathologically, when
    clamped edge windows make the interior set non-contiguous)."""
    n_dev, blocks = offs.shape
    inter = np.zeros(blocks, dtype=bool)
    for b in range(blocks):
        vd = np.nonzero(valid[:, b])[0]
        assert vd.size > 0  # device 0 always owns all its blocks
        o = offs[vd, b]
        inter[b] = bool(
            (o >= halo_lo).all() and (o + win <= halo_lo + strip).all()
        )
        for d in range(n_dev):
            if not valid[d, b]:
                offs[d, b] = o[0]
    if not inter.any():
        logger.debug(
            "interior/halo overlap disabled: no interior blocks "
            "(strip=%d, win=%d, halo_lo=%d, blocks=%d)",
            strip, win, halo_lo, blocks,
        )
        return 0, 0
    b0 = int(np.argmax(inter))
    b1 = blocks - int(np.argmax(inter[::-1]))
    if not inter[b0:b1].all():
        logger.debug(
            "interior/halo overlap disabled: interior blocks "
            "non-contiguous (strip=%d, win=%d, halo_lo=%d, mask=%s)",
            strip, win, halo_lo, inter.tolist(),
        )
        return 0, 0
    return b0, b1


def shard_v_op(
    op: BandedOp, n_dev: int, padded_h: int, tile: int = 64
) -> ShardedVOp:
    """Split a vertical BandedOp into per-device blocked operators with
    uniform shapes and compute the halo requirement."""
    assert padded_h % n_dev == 0 and padded_h >= op.n_in
    n_out, width = op.n_out, op.width
    m = -(-n_out // n_dev)
    strip = padded_h // n_dev
    blocks = -(-m // tile)
    starts = op.starts.astype(np.int64)

    # Global input range needed by each device's output rows.
    need_lo = np.empty(n_dev, dtype=np.int64)
    need_hi = np.empty(n_dev, dtype=np.int64)
    for d in range(n_dev):
        lo, hi = d * m, min((d + 1) * m, n_out)
        if lo >= n_out:  # device owns only padding rows
            need_lo[d] = min(d * strip, op.n_in)
            need_hi[d] = need_lo[d]
        else:
            need_lo[d] = starts[lo]
            need_hi[d] = starts[hi - 1] + width

    halo_lo = int(max(0, np.max(np.arange(n_dev) * strip - need_lo)))
    halo_hi = int(
        max(0, np.max(need_hi - (np.arange(n_dev) + 1) * strip))
    )
    use_all_gather = halo_lo > strip or halo_hi > strip
    if use_all_gather:
        halo_lo = 0
        halo_hi = 0

    # Window size: max span of any tile-block of output rows.
    win = 0
    for b0 in range(0, n_out, tile):
        b1 = min(b0 + tile, n_out)
        win = max(win, int(starts[b1 - 1]) + width - int(starts[b0]))
    win = _round_up(win, 128)

    offs = np.zeros((n_dev, blocks), dtype=np.int64)
    taps = np.zeros((n_dev, blocks, tile, win), dtype=np.float32)
    valid = np.zeros((n_dev, blocks), dtype=bool)
    for d in range(n_dev):
        base = 0 if use_all_gather else d * strip - halo_lo
        for b in range(blocks):
            lo = d * m + b * tile
            # Clamp to this device's own rows: block rows past m are
            # discarded by the executor's out[:m] slice.
            hi = min(lo + tile, (d + 1) * m, n_out)
            if lo >= min((d + 1) * m, n_out):
                continue
            off = int(starts[lo]) - base
            assert off >= 0
            offs[d, b] = off
            valid[d, b] = True
            for i in range(lo, hi):
                c0 = int(starts[i]) - base - off
                taps[d, b, i - lo, c0 : c0 + width] = op.taps[i]

    b0 = b1 = 0
    if not use_all_gather:
        b0, b1 = _interior_split(offs, valid, halo_lo, strip, win)
    return ShardedVOp(
        n_in=op.n_in,
        n_out=n_out,
        strip=strip,
        m=m,
        halo_lo=halo_lo,
        halo_hi=halo_hi,
        win=win,
        tile=tile,
        offs=offs.astype(np.int32),
        taps=taps,
        use_all_gather=use_all_gather,
        b_int0=b0,
        b_int1=b1,
    )


def shard_v_blocked(
    op: BandedOp, n_dev: int, padded_h: int, tile: int | None = None,
    in_bytes: int = 1,
) -> ShardedVOp:
    """Like ``shard_v_op`` but with 32-row-aligned local window starts,
    matching the alignment contract of the Pallas kernels
    (ops/pallas/*): per-device taps can then be fed straight into
    ``apply_fused_pallas`` as the vertical operator, with the raw input
    strip (+ exchanged halos) as the kernel input."""
    from ..ops.banded import pick_tile

    if tile is None:
        tile = pick_tile(op, in_bytes=in_bytes)
    base_sv = shard_v_op(op, n_dev, padded_h, tile=tile)
    if base_sv.use_all_gather:
        return base_sv
    n_out, width = op.n_out, op.width
    m, strip = base_sv.m, base_sv.strip
    halo_lo, halo_hi = base_sv.halo_lo, base_sv.halo_hi
    # 32-align the low halo so interior window starts stay 32-aligned
    # after rebasing to strip coordinates (offs - halo_lo): the extra
    # exchanged rows carry zero taps.
    if halo_lo > 0 and _round_up(halo_lo, 32) <= strip:
        halo_lo = _round_up(halo_lo, 32)
    blocks = -(-m // tile)
    starts = op.starts.astype(np.int64)

    # 32-aligning the window starts can push them up to 31 rows lower;
    # widen the window to keep every block's span covered.
    win = 0
    for b0 in range(0, n_out, tile):
        b1 = min(b0 + tile, n_out)
        win = max(win, int(starts[b1 - 1]) + width - int(starts[b0]))
    win = _round_up(win + 31, 32)

    # 32-align the extended strip itself (by taking a few extra halo
    # rows from the next device; taps there are zero so values are
    # irrelevant), then pull windows left so offs+win fits inside it —
    # otherwise the Pallas kernel zero-pads the strip, a full extra
    # HBM copy (same trick as ops/banded.py:block_banded).
    ext_len = halo_lo + strip + halo_hi
    ext_pad = _round_up(ext_len, 32)
    if ext_pad >= win and ext_pad - ext_len + halo_hi <= strip:
        halo_hi += ext_pad - ext_len
        max_off = ext_pad - win
    else:
        max_off = None  # tiny strip: accept the pad copy

    offs = np.zeros((n_dev, blocks), dtype=np.int64)
    taps = np.zeros((n_dev, blocks, tile, win), dtype=np.float32)
    valid = np.zeros((n_dev, blocks), dtype=bool)
    for d in range(n_dev):
        base = d * strip - halo_lo
        for b in range(blocks):
            lo = d * m + b * tile
            # Clamp to this device's own rows (see shard_v_op): rows
            # past m are discarded, and giving them the next device's
            # taps would widen the window past the strip.
            hi = min(lo + tile, (d + 1) * m, n_out)
            if lo >= min((d + 1) * m, n_out):
                continue
            off = ((int(starts[lo]) - base) // 32) * 32
            if max_off is not None:
                off = min(off, max_off)
            assert off >= 0, (d, b, off)
            offs[d, b] = off
            valid[d, b] = True
            for i in range(lo, hi):
                c0 = int(starts[i]) - base - off
                taps[d, b, i - lo, c0 : c0 + width] = op.taps[i]

    b0, b1 = _interior_split(offs, valid, halo_lo, strip, win)
    # Interior rebasing (offs - halo_lo) must keep the Pallas kernels'
    # 32-row alignment; otherwise treat everything as border.
    if halo_lo % 32:
        logger.debug(
            "interior/halo overlap disabled: halo_lo=%d not 32-aligned",
            halo_lo,
        )
        b0 = b1 = 0
    return ShardedVOp(
        n_in=op.n_in,
        n_out=n_out,
        strip=strip,
        m=m,
        halo_lo=halo_lo,
        halo_hi=halo_hi,
        win=win,
        tile=tile,
        offs=offs.astype(np.int32),
        taps=taps,
        use_all_gather=False,
        b_int0=b0,
        b_int1=b1,
    )


@dataclasses.dataclass(frozen=True)
class ShardedLaneOp:
    """Per-device lane-blocked form of the HORIZONTAL banded operator
    for 2-D (rows x cols) sharding: device column j owns output pixels
    [j*m, (j+1)*m) and reads input lanes
    [j*strip_lanes - halo_lo, (j+1)*strip_lanes + halo_hi) of the
    interleaved [rows, W*C] image.  Window starts are 128-lane aligned
    in LOCAL coordinates (each device's tap matrices absorb its own
    sub-128 phase), so the per-device taps can feed the fused Pallas
    kernel directly (ops/pallas/fused_kernel.py) as its lane-side
    operator — the 2-D analog of ``shard_v_blocked``."""

    n_out: int           # global output pixels
    c: int
    m: int               # output pixels per device
    tile: int            # output pixels per block
    strip_lanes: int     # input lanes per device
    halo_lo: int         # lanes (multiple of c; 128 when possible)
    halo_hi: int         # lanes
    win_l: int           # window lanes per block (multiple of 128)
    lanes_pad: int       # required extended-lane count incl. zero-pad
    offs_l: np.ndarray   # i32 [n_dev, blocks] — local window starts
    taps_hi: np.ndarray  # bf16 [n_dev, blocks, win_l, tile*c]
    taps_lo: np.ndarray
    taps_q1: np.ndarray | None  # s8 limbs (u8 pipelines)
    taps_q0: np.ndarray | None
    q_shift: int
    chunk_rel: tuple[int, ...] | None  # shared across devices/blocks
    win_c: int
    ctaps_hi: np.ndarray | None  # bf16 [n_dev, blocks, n_ch, win_c, 128]
    ctaps_lo: np.ndarray | None
    ctaps_q1: np.ndarray | None
    ctaps_q0: np.ndarray | None
    l1_max: float
    q_abs1: int
    q_abs0: int
    use_all_gather: bool
    b_int0: int = 0
    b_int1: int = 0

    @property
    def n_blocks(self) -> int:
        return self.offs_l.shape[1]


def shard_lane_blocked(
    op: BandedOp, n_dev: int, padded_w: int, c: int,
    tile: int | None = None, in_bytes: int = 1,
) -> ShardedLaneOp:
    """Split the horizontal BandedOp into per-device lane-blocked
    operators with uniform shapes and compute the column-halo
    requirement (in lanes).

    Quantization scales, norms and the chunked-band sub-windows are
    computed over ALL devices' taps, so every device shares the fused
    kernel's fixed-point scales and static chunk offsets (bit-parity
    with the single-chip lane operator, whose scales derive from the
    same global tap set — ops/lanes.py).  ``halo_lo`` is rounded to a
    multiple of 128 lanes when that fits the strip (keeps local window
    starts 128-aligned after interior rebasing and preserves the C=4
    alpha-bypass channel phase); taps absorb any remaining per-device
    sub-128 phase."""
    from ..ops.lanes import pick_lane_tile

    if tile is None:
        tile = pick_lane_tile(op, c, in_bytes=in_bytes)
    assert padded_w % n_dev == 0 and padded_w >= op.n_in
    n_out, width = op.n_out, op.width
    m = -(-n_out // n_dev)
    strip_lanes = (padded_w // n_dev) * c
    blocks = -(-m // tile)
    starts = op.starts.astype(np.int64)

    # Global lane range needed by each device's output pixels.
    need_lo = np.empty(n_dev, dtype=np.int64)
    need_hi = np.empty(n_dev, dtype=np.int64)
    for d in range(n_dev):
        lo, hi = d * m, min((d + 1) * m, n_out)
        if lo >= n_out:  # device owns only padding columns
            need_lo[d] = min(d * strip_lanes, op.n_in * c)
            need_hi[d] = need_lo[d]
        else:
            need_lo[d] = starts[lo] * c
            need_hi[d] = (starts[hi - 1] + width) * c

    halo_lo = int(
        max(0, np.max(np.arange(n_dev) * strip_lanes - need_lo))
    )
    halo_hi = int(
        max(0, np.max(need_hi - (np.arange(n_dev) + 1) * strip_lanes))
    )
    if halo_lo > strip_lanes or halo_hi > strip_lanes:
        return ShardedLaneOp(
            n_out=n_out, c=c, m=m, tile=tile,
            strip_lanes=strip_lanes, halo_lo=0, halo_hi=0,
            win_l=0, lanes_pad=0,
            offs_l=np.zeros((n_dev, blocks), np.int32),
            taps_hi=None, taps_lo=None, taps_q1=None, taps_q0=None,
            q_shift=0, chunk_rel=None, win_c=0,
            ctaps_hi=None, ctaps_lo=None, ctaps_q1=None, ctaps_q0=None,
            l1_max=0.0, q_abs1=0, q_abs0=0, use_all_gather=True,
        )
    # 128-align the low halo when it fits (local window starts stay
    # 128-aligned after interior rebasing); otherwise keep the channel
    # phase only (multiple of c — required by the C=4 alpha-bypass
    # lane mask, whose window-local ``lane % c`` assumes pixel-aligned
    # global window starts).
    if halo_lo > 0:
        if _round_up(halo_lo, 128) <= strip_lanes:
            halo_lo = _round_up(halo_lo, 128)
        else:
            halo_lo = _round_up(halo_lo, c)

    # Uniform window size: max span over all (device, block) windows,
    # plus up to 127 lanes of floor-alignment slack.
    offs = np.zeros((n_dev, blocks), dtype=np.int64)
    spans = np.zeros((n_dev, blocks), dtype=np.int64)
    valid = np.zeros((n_dev, blocks), dtype=bool)
    for d in range(n_dev):
        base = d * strip_lanes - halo_lo
        for b in range(blocks):
            lo = d * m + b * tile
            hi = min(lo + tile, (d + 1) * m, n_out)
            if lo >= min((d + 1) * m, n_out):
                continue
            off = ((starts[lo] * c - base) // 128) * 128
            assert off >= 0, (d, b, off)
            offs[d, b] = off
            spans[d, b] = (starts[hi - 1] + width) * c - base - off
            valid[d, b] = True
    win_l = _round_up(int(spans.max()), 128)

    # Overrunning tail windows: pull them left so they end at the
    # buffer's end (the extra left coverage carries zero taps and
    # costs nothing).  The pulled offsets must stay 128-aligned, so
    # first bump the high halo by < 128 lanes to make
    # ext_len - win_l a multiple of 128 — after which the pull always
    # covers (every window's end fits in ext_len by construction).
    # Only when the bump doesn't fit the strip does the old fallback
    # run: a full halo extension, else the kernel-side pad copy.
    ext_len = halo_lo + strip_lanes + halo_hi
    lanes_need = int(offs.max()) + win_l
    if lanes_need > ext_len:
        delta = (-(ext_len - win_l)) % 128
        if delta and halo_hi + delta <= strip_lanes:
            halo_hi += delta
            ext_len += delta
        max_off = ext_len - win_l
        pull = np.maximum(offs - max(max_off, 0), 0)
        if (
            max_off >= 0
            and max_off % 128 == 0
            and int((spans + pull).max()) <= win_l
        ):
            offs -= pull
        else:
            extra = int(offs.max()) + win_l - ext_len
            if extra > 0 and halo_hi + extra <= strip_lanes:
                halo_hi += extra
                ext_len += extra
    lanes_pad = max(int(offs.max()) + win_l, ext_len)

    dense = np.zeros(
        (n_dev, blocks, win_l, tile * c), dtype=np.float32
    )
    for d in range(n_dev):
        base = d * strip_lanes - halo_lo
        for b in range(blocks):
            if not valid[d, b]:
                continue
            lo = d * m + b * tile
            hi = min(lo + tile, (d + 1) * m, n_out)
            for i in range(lo, hi):
                s_l = int(starts[i]) * c - base - int(offs[d, b])
                t = i - lo
                for ch in range(c):
                    dense[
                        d, b,
                        (s_l + ch) : (s_l + width * c + ch) : c,
                        t * c + ch,
                    ] = op.taps[i]

    # Shared fixed-point scales / norms over ALL devices (bit-parity
    # with the single-chip lane operator; see ops/lanes.py).
    q1 = q0 = None
    q_shift = 0
    if in_bytes <= 1:
        from ..ops.intq import first_pass_overflow_safe, quantize_limbs

        q1, q0, q_shift = quantize_limbs(dense)
        if not first_pass_overflow_safe(q1, q0, contract_axis=2):
            q1 = q0 = None  # pragma: no cover - pathological taps
    l1_max = float(np.abs(dense).sum(axis=2).max())
    q_abs1 = 0 if q1 is None else int(
        np.abs(q1.astype(np.int64)).sum(axis=2).max()
    )
    q_abs0 = 0 if q0 is None else int(
        np.abs(q0.astype(np.int64)).sum(axis=2).max()
    )

    from ..ops.banded import _bf16_split_np

    hi_np, lo_np = _bf16_split_np(dense)

    # Chunked banded form: per 128-lane output chunk, the sub-window
    # of contraction lanes touched across ALL devices and blocks (the
    # chunk offsets are baked into the kernel as static constants, so
    # they must be device-invariant).
    chunk_rel = None
    win_c = 0
    c_hi = c_lo = c_q1 = c_q0 = None
    n_ch = (tile * c) // 128
    if n_ch > 1 and (tile * c) % 128 == 0:
        rel = np.empty(n_ch, dtype=np.int64)
        ends = np.empty(n_ch, dtype=np.int64)
        for j in range(n_ch):
            used = np.nonzero(
                np.any(
                    dense[:, :, :, j * 128 : (j + 1) * 128],
                    axis=(0, 1, 3),
                )
            )[0]
            lo_u, hi_u = (
                (int(used[0]), int(used[-1]) + 1)
                if used.size else (0, 1)
            )
            rel[j] = (lo_u // 128) * 128
            ends[j] = hi_u
        win_c = _round_up(int((ends - rel).max()), 128)
        if win_c < win_l:
            rel = np.minimum(rel, win_l - win_c)
            chunk_rel = tuple(int(r) for r in rel)
            sl = [
                (slice(None), slice(None), slice(r, r + win_c),
                 slice(j * 128, (j + 1) * 128))
                for j, r in enumerate(chunk_rel)
            ]
            c_hi = np.stack([hi_np[s] for s in sl], axis=2)
            c_lo = np.stack([lo_np[s] for s in sl], axis=2)
            if q1 is not None:
                c_q1 = np.stack([q1[s] for s in sl], axis=2)
                c_q0 = np.stack([q0[s] for s in sl], axis=2)

    b0, b1 = _interior_split(
        offs, valid, halo_lo, strip_lanes, win_l
    )
    if halo_lo % 128:
        # Interior rebasing (offs - halo_lo) must keep 128-lane
        # alignment for the kernel's element-offset windows.
        logger.debug(
            "2-D interior/halo overlap disabled on cols: halo_lo=%d "
            "not 128-aligned", halo_lo,
        )
        b0 = b1 = 0
    return ShardedLaneOp(
        n_out=n_out, c=c, m=m, tile=tile,
        strip_lanes=strip_lanes, halo_lo=halo_lo, halo_hi=halo_hi,
        win_l=win_l, lanes_pad=lanes_pad,
        offs_l=offs.astype(np.int32),
        taps_hi=hi_np, taps_lo=lo_np, taps_q1=q1, taps_q0=q0,
        q_shift=q_shift, chunk_rel=chunk_rel, win_c=win_c,
        ctaps_hi=c_hi, ctaps_lo=c_lo, ctaps_q1=c_q1, ctaps_q0=c_q0,
        l1_max=l1_max, q_abs1=q_abs1, q_abs0=q_abs0,
        use_all_gather=False, b_int0=b0, b_int1=b1,
    )


def _apply_local_blocked(
    x: jax.Array, offs: jax.Array, taps: jax.Array, mode: str
) -> jax.Array:
    """x [n_local, R]; offs [blocks]; taps [blocks, tile, win] ->
    [blocks*tile, R].  Windows are dynamic slices of the local buffer
    (offsets differ per device; shapes are uniform).  ``mode`` follows
    the split-bf16 precision scheme of ops/banded.py."""
    blocks, tile, win = taps.shape
    r = x.shape[1]
    xw = jnp.stack(
        [
            jax.lax.dynamic_slice(x, (offs[b], 0), (win, r))
            for b in range(blocks)
        ]
    )

    def bmm(a, b, precision=None):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=precision,
            preferred_element_type=jnp.float32,
        )

    if mode == "exact":
        y = bmm(taps, xw, jax.lax.Precision.HIGHEST)
    else:
        th = taps.astype(jnp.bfloat16)
        tl = (taps - th.astype(jnp.float32)).astype(jnp.bfloat16)
        th = jax.lax.optimization_barrier(th)
        if mode == "split2":
            xb = xw.astype(jnp.bfloat16)
            y = bmm(th, xb) + bmm(tl, xb)
        else:  # split3
            xh = xw.astype(jnp.bfloat16)
            xh_b = jax.lax.optimization_barrier(xh)
            xl = (xw - xh_b.astype(jnp.float32)).astype(jnp.bfloat16)
            y = bmm(th, xh) + bmm(tl, xh) + bmm(th, xl)
    return y.reshape(blocks * tile, r)


def _halo_permutes(x, svop, rows_axis, fwd, bwd):
    """Issue the two halo ppermutes (returned un-consumed so the
    scheduler can overlap them with interior compute)."""
    h_lo = (
        jax.lax.ppermute(x[-svop.halo_lo :], rows_axis, fwd)
        if svop.halo_lo > 0
        else None
    )
    h_hi = (
        jax.lax.ppermute(x[: svop.halo_hi], rows_axis, bwd)
        if svop.halo_hi > 0
        else None
    )
    return h_lo, h_hi


def _overlapped_v(
    x, v_offs, v_taps, svop, rows_axis, fwd, bwd, mode, apply_fn
):
    """Vertical pass with halo exchange overlapped with interior
    compute (the BASELINE north-star structure: "collective permutes
    overlapped with interior convolution compute").

    The interior blocks [b_int0, b_int1) read only local strip rows, so
    their matmuls carry no data dependency on the ppermutes; XLA's
    scheduler can run them while the collectives are in flight.  Only
    the border blocks (first/last few output tiles) wait for the
    assembled ext buffer.  Results are bitwise identical to the
    non-overlapped formulation (same taps, same windows, same op
    order within each block)."""
    b0, b1 = svop.b_int0, svop.b_int1
    blocks = v_taps.shape[0]
    if b1 <= b0:  # no interior: previous (blocking) behavior
        h_lo, h_hi = _halo_permutes(x, svop, rows_axis, fwd, bwd)
        parts = [p for p in (h_lo, x, h_hi) if p is not None]
        ext = jnp.concatenate(parts, axis=0)
        need = int(svop.offs.max()) + svop.win
        if need > ext.shape[0]:
            ext = jnp.pad(ext, ((0, need - ext.shape[0]), (0, 0)))
        return apply_fn(ext, v_offs, v_taps, mode)

    h_lo, h_hi = _halo_permutes(x, svop, rows_axis, fwd, bwd)
    ys = []
    ext = None
    if b0 > 0 or b1 < blocks:
        parts = [p for p in (h_lo, x, h_hi) if p is not None]
        ext = jnp.concatenate(parts, axis=0)
        need = int(svop.offs.max()) + svop.win
        if need > ext.shape[0]:
            ext = jnp.pad(ext, ((0, need - ext.shape[0]), (0, 0)))
    if b0 > 0:
        ys.append(apply_fn(ext, v_offs[:b0], v_taps[:b0], mode))
    # Interior: windows rebased from ext to strip coordinates — no
    # dependency on the collectives.
    ys.append(
        apply_fn(x, v_offs[b0:b1] - svop.halo_lo, v_taps[b0:b1], mode)
    )
    if b1 < blocks:
        ys.append(apply_fn(ext, v_offs[b1:], v_taps[b1:], mode))
    return jnp.concatenate(ys, axis=0) if len(ys) > 1 else ys[0]


def _pallas_strip_fn(
    svb: ShardedVOp,
    lop,
    h_op,
    ext_rows: int,
    use_int8: bool,
    split_lanes: bool,
    modes: tuple,
    fused_kwargs: dict,
    qmeta: tuple,
    new_wc: int,
    rows_axis: str,
    fwd,
    bwd,
    interpret: bool,
    in_bytes: int = 1,
):
    """Per-device strip body for the Pallas fused-kernel route, shared
    by the AVIR and LANCIR sharded executors.

    Runs the SAME fused two-pass kernel as the single-chip hot path on
    the local strip, with halo ppermutes issued BEFORE the interior
    blocks' kernel call (which reads only local rows) so XLA can
    overlap the collectives with interior compute; only the border
    blocks' (smaller) kernel calls consume the assembled ext buffer."""
    from ..ops.banded import BlockedBandedOp

    v_qshift, v_l1, v_qa1, v_qa0 = qmeta
    blocks = -(-svb.m // svb.tile)

    def mk_vop(offs_sub, taps_sub, n_in, n_in_pad, q1, q0):
        th = taps_sub.astype(jnp.bfloat16)
        th = jax.lax.optimization_barrier(th)
        tl = (taps_sub - th.astype(jnp.float32)).astype(jnp.bfloat16)
        return BlockedBandedOp(
            n_in=n_in,
            n_out=taps_sub.shape[0] * svb.tile,
            n_in_pad=n_in_pad,
            tile=svb.tile,
            win=svb.win,
            offs=offs_sub,
            taps=taps_sub,
            taps_hi=th,
            taps_lo=tl,
            taps_q1=q1,
            taps_q0=q0,
            q_shift=v_qshift,
            l1_max=v_l1,
            q_abs1=v_qa1,
            q_abs0=v_qa0,
        )

    # Interior/boundary LANE split (same mechanism as the single-chip
    # executors, models/runtime.py:_split_lane_ops): tightens the
    # interior chunk window when the edge lane-blocks inflate it.
    # Under a batch axis (split_lanes=False: the body gets vmapped and
    # the split's aliased out_init can't carry a batch dim) the
    # vmap-safe COMPACT+CONCAT assembly is used instead, when the
    # modeled interior H-MAC saving beats the concat's output copy.
    from ..models.runtime import _concat_split_ok, _split_lane_ops

    lop_int, lop_bnd = _split_lane_ops(
        h_op, lop, lop.c, in_bytes=in_bytes
    )
    split_concat = False
    if not split_lanes and lop_int is not None:
        split_concat = _concat_split_ok(
            blocks, svb.tile, lop, lop_int, modes[1],
            fused_kwargs.get("gamma", False),
            jnp.dtype(fused_kwargs["out_dtype"]).itemsize,
        )
        if not split_concat:
            lop_int = lop_bnd = None

    def fused_call(vop_local, xin):
        from ..models.runtime import fused_split_call

        return fused_split_call(
            vop_local, lop, lop_int, lop_bnd, xin,
            modes[0], modes[1],
            concat=split_concat, interpret=interpret,
            order="vh", **fused_kwargs,
        )

    def build_ext(x, h_lo, h_hi):
        parts = [p for p in (h_lo, x, h_hi) if p is not None]
        rows_e = sum(p.shape[0] for p in parts)
        if ext_rows > rows_e:
            parts.append(
                jnp.zeros((ext_rows - rows_e, x.shape[1]), x.dtype)
            )
        return jnp.concatenate(parts, axis=0)

    def pallas_fn(x, v_offs, v_taps, *v_q):
        # x: RAW [strip, W*C] local rows.
        v_offs, v_taps = v_offs[0], v_taps[0]
        q1 = v_q[0][0] if use_int8 else None
        q0 = v_q[1][0] if use_int8 else None
        strip = x.shape[0]
        # Pre-pad lanes once so none of the kernel calls re-pads.
        if x.shape[1] < lop.lanes_pad:
            x = jnp.pad(x, ((0, 0), (0, lop.lanes_pad - x.shape[1])))
        b0, b1 = svb.b_int0, svb.b_int1
        h_lo, h_hi = _halo_permutes(x, svb, rows_axis, fwd, bwd)
        if b1 <= b0:  # no interior blocks: blocking fallback
            ext = build_ext(x, h_lo, h_hi)
            vop_local = mk_vop(
                v_offs, v_taps, ext.shape[0], ext_rows, q1, q0
            )
            return fused_call(vop_local, ext)[: svb.m, :new_wc]

        ext = None
        if b0 > 0 or b1 < blocks:
            ext = build_ext(x, h_lo, h_hi)
        outs = []
        if b0 > 0:
            v_lo = mk_vop(
                v_offs[:b0], v_taps[:b0], ext.shape[0], ext_rows,
                None if q1 is None else q1[:b0],
                None if q0 is None else q0[:b0],
            )
            outs.append(
                fused_call(v_lo, ext)[: b0 * svb.tile, :new_wc]
            )
        # Interior: windows rebased to strip coordinates — no data
        # dependency on the ppermutes.  n_in_pad must be 32-row
        # aligned: real Mosaic rejects the kernel with a VMEM OOM when
        # the pl.Element-windowed input's padded length is not a
        # multiple of 32 (measured on v5e: u16 4K->8K strips with
        # strip=2160 fail, 2176 compile; the pad rows carry zero taps
        # and are never read).
        v_int = mk_vop(
            v_offs[b0:b1] - svb.halo_lo, v_taps[b0:b1], strip,
            _round_up(strip, 32),
            None if q1 is None else q1[b0:b1],
            None if q0 is None else q0[b0:b1],
        )
        outs.append(
            fused_call(v_int, x)[: (b1 - b0) * svb.tile, :new_wc]
        )
        if b1 < blocks:
            v_hi = mk_vop(
                v_offs[b1:], v_taps[b1:], ext.shape[0], ext_rows,
                None if q1 is None else q1[b1:],
                None if q0 is None else q0[b1:],
            )
            outs.append(fused_call(v_hi, ext)[:, :new_wc])
        out2 = (
            jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
        )
        return out2[: svb.m]

    return pallas_fn


class _ShapeOnly:
    """Stand-in for a tap tensor consumed only for its ``.shape`` at
    trace time (apply_fused_pallas reads lop.taps_hi.shape even when
    the kernel streams the chunked/int8 forms).

    CONTRACT: any field of LaneBlockedOp / the fused-viability probes
    populated with a _ShapeOnly must never have its VALUES touched —
    a future apply_fused_pallas/fused_viable_shapes change that casts
    or barriers those taps on the chunked/int8 paths would surface as
    an AttributeError on this class at trace time; extend this class
    (or pass real arrays) if that contract needs to change."""

    def __init__(self, shape):
        self.shape = tuple(shape)


def _h_tap_arrays(slb: ShardedLaneOp, use_int8: bool):
    """(ta, tb, chunked) — the two per-device H tap tensors the fused
    kernel streams for this mode, as host numpy [n_dev, blocks, ...]."""
    if use_int8:
        if slb.ctaps_q1 is not None:
            return slb.ctaps_q1, slb.ctaps_q0, True
        return slb.taps_q1, slb.taps_q0, False
    if slb.ctaps_hi is not None:
        return slb.ctaps_hi, slb.ctaps_lo, True
    return slb.taps_hi, slb.taps_lo, False


def _pallas_strip_fn_2d(
    svb: ShardedVOp,
    slb: ShardedLaneOp,
    ext_rows: int,
    use_int8: bool,
    modes: tuple,
    fused_kwargs: dict,
    v_qmeta: tuple,
    v_q_np: tuple,
    m_h: int,
    out_lanes: int,
    rows_axis: str,
    cols_axis: str,
    fwd_r, bwd_r, fwd_c, bwd_c,
    interpret: bool,
    in_bytes: int = 1,
):
    """Per-device tile body for the 2-D (rows x cols) fused-Pallas
    route: both halo exchanges ride the RAW integer tile (cheapest
    bytes, and the fused kernel needs the raw window anyway — V and H
    run inside ONE kernel, so there is no f32 intermediate to exchange
    on), then the SAME fused two-pass kernel as the single-chip hot
    path runs on the doubly-extended tile.

    Overlap structure (u8 tiles with ``halo_overlap=True``; the
    DEFAULT since round 5 is ONE blocking call — on-chip A/B showed
    the split re-streams the full H tap set per call for ~2x the
    per-device time at production grids, far exceeding the <= ~45 us
    of halo it hides; 2/4-byte tiles always run the blocking call,
    same Mosaic scoped-VMEM constraint as the 1-D strips):

      A. (V-interior x H-interior) blocks on the LOCAL tile — no data
         dependency on either collective;
      B. (V-interior x H-border) blocks on the column-extended tile —
         overlaps the row-halo ppermutes;
      C. (V-border x all-H) blocks on the fully extended tile.

    The redundant work vs. exchanging the f32 intermediate between
    passes is the V pass over the halo COLUMNS (halo_lanes/ext_lanes
    of V MACs, a few percent at production geometries) — bought back
    many times over by running both passes at the fused kernel's
    single-chip rate (VERDICT r4 item 1).

    Returns (body, consts, const_specs): ``consts`` are host-numpy
    per-device tap/offset tensors, sharded over ``rows_axis`` (V) or
    ``cols_axis`` (H)."""
    from jax.sharding import PartitionSpec as _P

    from ..ops.banded import BlockedBandedOp

    v_qshift, v_l1, v_qa1, v_qa0 = v_qmeta
    n_blocks_v = svb.taps.shape[1]
    n_blocks_h = slb.n_blocks
    tc = slb.tile * slb.c

    b0v, b1v = svb.b_int0, svb.b_int1
    b0h, b1h = slb.b_int0, slb.b_int1
    split = (
        in_bytes == 1
        and b1v > b0v
        and not (b0v == 0 and b1v == n_blocks_v)
    )
    # Without H-interior blocks the (A, B) pair collapses into one
    # (V-interior x all-H) call on the column-extended tile — the
    # column-halo time goes exposed but the row halos still overlap.
    split_h = split and b1h > b0h and not (
        b0h == 0 and b1h == n_blocks_h
    )
    if not split:
        b0v, b1v = 0, 0
    if not split_h:
        b0h, b1h = 0, 0

    ta_np, tb_np, chunked = _h_tap_arrays(slb, use_int8)
    h_bnd_idx = list(range(b0h)) + list(range(b1h, n_blocks_h))

    def h_subset(idx):
        idx = np.asarray(idx, dtype=np.int64)
        return (
            slb.offs_l[:, idx],
            np.ascontiguousarray(ta_np[:, idx]),
            np.ascontiguousarray(tb_np[:, idx]),
        )

    # Const layout: V group then H group(s); specs mirror the axes.
    consts: list = [svb.offs, svb.taps, *v_q_np]
    specs: list = [_P(rows_axis)] * len(consts)
    if split_h:
        off_i, ta_i, tb_i = h_subset(range(b0h, b1h))
        off_b, ta_b, tb_b = h_subset(h_bnd_idx)
        h_consts = [off_i, ta_i, tb_i, off_b, ta_b, tb_b]
    else:
        h_consts = [slb.offs_l, ta_np, tb_np]
    consts += h_consts
    specs += [_P(cols_axis)] * len(h_consts)

    def mk_vop(offs_sub, taps_sub, n_in, n_in_pad, q1, q0):
        th = taps_sub.astype(jnp.bfloat16)
        th = jax.lax.optimization_barrier(th)
        tl = (taps_sub - th.astype(jnp.float32)).astype(jnp.bfloat16)
        return BlockedBandedOp(
            n_in=n_in,
            n_out=taps_sub.shape[0] * svb.tile,
            n_in_pad=n_in_pad,
            tile=svb.tile,
            win=svb.win,
            offs=offs_sub,
            taps=taps_sub,
            taps_hi=th,
            taps_lo=tl,
            taps_q1=q1,
            taps_q0=q0,
            q_shift=v_qshift,
            l1_max=v_l1,
            q_abs1=v_qa1,
            q_abs0=v_qa0,
        )

    def mk_lop(offs_sub, ta, tb, lanes_pad):
        nb = offs_sub.shape[0]
        kw = dict(
            n_in=slb.strip_lanes // slb.c,
            n_out=nb * slb.tile,
            c=slb.c,
            tile=slb.tile,
            win_l=slb.win_l,
            lanes_pad=lanes_pad,
            offs_l=offs_sub,
            q_shift=slb.q_shift,
            l1_max=slb.l1_max,
            q_abs1=slb.q_abs1,
            q_abs0=slb.q_abs0,
            chunk_rel=slb.chunk_rel if chunked else None,
            win_c=slb.win_c if chunked else 0,
        )
        stub = _ShapeOnly((nb, slb.win_l, tc))
        if use_int8:
            kw["taps_hi"] = stub
            kw["taps_lo"] = stub
            if chunked:
                kw["ctaps_q1"], kw["ctaps_q0"] = ta, tb
                # The kernel streams the chunked limbs; the dense limb
                # fields only gate the is-None feasibility check.
                kw["taps_q1"] = stub
                kw["taps_q0"] = stub
            else:
                kw["taps_q1"], kw["taps_q0"] = ta, tb
        elif chunked:
            kw["taps_hi"] = stub
            kw["taps_lo"] = stub
            kw["ctaps_hi"], kw["ctaps_lo"] = ta, tb
        else:
            kw["taps_hi"], kw["taps_lo"] = ta, tb
        from ..ops.lanes import LaneBlockedOp

        return LaneBlockedOp(**kw)

    def fused(vop_local, lop_local, xin):
        from ..ops.pallas.fused_kernel import apply_fused_pallas

        mv, mh = modes
        return apply_fused_pallas(
            vop_local, lop_local, xin, mv, mh,
            order="vh", interpret=interpret, **fused_kwargs,
        )

    strip_pad = _round_up(svb.strip, 32)

    def pad_to(x, rows, lanes):
        parts_l = [x]
        if lanes > x.shape[1]:
            parts_l.append(
                jnp.zeros((x.shape[0], lanes - x.shape[1]), x.dtype)
            )
        x = (
            jnp.concatenate(parts_l, axis=1)
            if len(parts_l) > 1 else x
        )
        if rows > x.shape[0]:
            x = jnp.concatenate(
                [x, jnp.zeros((rows - x.shape[0], lanes), x.dtype)]
            )
        return x

    def compute(x, xc, ext, cs):
        """Collective-free per-device compute.  ``x`` is the raw local
        tile, ``xc`` the column-extended tile, ``ext`` the fully
        (rows+cols) extended tile; ``cs`` the per-device tap consts
        (no leading device dim).  The halo assembly is the caller's:
        ``body`` below builds xc/ext from ppermutes under shard_map;
        tools/probe_strip2d_tpu.py slices them from the padded image
        host-side to run the exact per-device kernels of an (r x s)
        mesh on ONE real chip (mesh-emulation validation)."""
        v_offs, v_taps = cs[0], cs[1]
        pos = 2
        if use_int8:
            vq1, vq0 = cs[2], cs[3]
            pos = 4
        else:
            vq1 = vq0 = None
        hc = cs[pos:]

        if not split:
            ext = pad_to(ext, ext_rows, slb.lanes_pad)
            h_offs, h_ta, h_tb = hc
            vop_l = mk_vop(
                v_offs, v_taps, ext.shape[0], ext_rows, vq1, vq0
            )
            lop_l = mk_lop(h_offs, h_ta, h_tb, slb.lanes_pad)
            out = fused(vop_l, lop_l, ext)
            return out[:m_h, :out_lanes]

        def vq_sub(q, lo, hi):
            return None if q is None else q[lo:hi]

        # A: interior x interior on the LOCAL tile — issued with no
        # dependency on either collective.
        if split_h:
            (h_off_i, h_ta_i, h_tb_i,
             h_off_b, h_ta_b, h_tb_b) = hc
            x_loc = pad_to(x, strip_pad, slb.strip_lanes)
            vop_int = mk_vop(
                v_offs[b0v:b1v] - svb.halo_lo, v_taps[b0v:b1v],
                x_loc.shape[0], strip_pad,
                vq_sub(vq1, b0v, b1v), vq_sub(vq0, b0v, b1v),
            )
            lop_int = mk_lop(
                h_off_i - slb.halo_lo, h_ta_i, h_tb_i,
                slb.strip_lanes,
            )
            out_a = fused(vop_int, lop_int, x_loc)
            # B: interior-V x border-H on the column-extended tile —
            # overlaps the row-halo ppermutes.
            xc_p = pad_to(xc, strip_pad, slb.lanes_pad)
            lop_bnd = mk_lop(h_off_b, h_ta_b, h_tb_b, slb.lanes_pad)
            out_b = fused(vop_int, lop_bnd, xc_p)
            mid = jnp.concatenate(
                [
                    out_b[:, : b0h * tc],
                    out_a,
                    out_b[:, b0h * tc :],
                ],
                axis=1,
            )
        else:
            h_offs, h_ta, h_tb = hc
            xc_p = pad_to(xc, strip_pad, slb.lanes_pad)
            vop_int = mk_vop(
                v_offs[b0v:b1v] - svb.halo_lo, v_taps[b0v:b1v],
                xc_p.shape[0], strip_pad,
                vq_sub(vq1, b0v, b1v), vq_sub(vq0, b0v, b1v),
            )
            lop_all = mk_lop(h_offs, h_ta, h_tb, slb.lanes_pad)
            mid = fused(vop_int, lop_all, xc_p)

        # C: border-V x all-H on the fully extended tile (one call:
        # lo and hi border blocks stacked; output rows are compact in
        # that order).
        ext = pad_to(ext, ext_rows, slb.lanes_pad)
        vb_idx = list(range(b0v)) + list(range(b1v, n_blocks_v))
        if vb_idx:
            v_off_b = jnp.concatenate(
                [v_offs[:b0v], v_offs[b1v:]]
            )
            v_tap_b = jnp.concatenate(
                [v_taps[:b0v], v_taps[b1v:]]
            )
            q1b = (
                None if vq1 is None
                else jnp.concatenate([vq1[:b0v], vq1[b1v:]])
            )
            q0b = (
                None if vq0 is None
                else jnp.concatenate([vq0[:b0v], vq0[b1v:]])
            )
            vop_bnd = mk_vop(
                v_off_b, v_tap_b, ext.shape[0], ext_rows, q1b, q0b
            )
            if split_h:
                # Reassemble the full H operator for the border rows:
                # interior and border tap consts concatenated back in
                # original block order.
                (h_off_i, h_ta_i, h_tb_i,
                 h_off_b, h_ta_b, h_tb_b) = hc
                h_off_full = jnp.concatenate(
                    [h_off_b[:b0h], h_off_i, h_off_b[b0h:]]
                )
                h_ta_full = jnp.concatenate(
                    [h_ta_b[:b0h], h_ta_i, h_ta_b[b0h:]]
                )
                h_tb_full = jnp.concatenate(
                    [h_tb_b[:b0h], h_tb_i, h_tb_b[b0h:]]
                )
            else:
                h_off_full, h_ta_full, h_tb_full = hc
            lop_full = mk_lop(
                h_off_full, h_ta_full, h_tb_full, slb.lanes_pad
            )
            out_c = fused(vop_bnd, lop_full, ext)
            out = jnp.concatenate(
                [
                    out_c[: b0v * svb.tile],
                    mid,
                    out_c[b0v * svb.tile :],
                ],
                axis=0,
            )
        else:
            out = mid
        return out[:m_h, :out_lanes]

    def body(x, *cs):
        # x: [strip_r, strip_lanes] raw local tile.  XLA schedules by
        # data dependency, so the split path's interior call (which
        # reads only x) still issues before either collective's
        # results are consumed.
        cs = [a[0] for a in cs]

        # --- column halos on the raw tile (cols_axis) ----------------
        c_lo = (
            jax.lax.ppermute(
                x[:, -slb.halo_lo :], cols_axis, fwd_c
            )
            if slb.halo_lo > 0 else None
        )
        c_hi = (
            jax.lax.ppermute(x[:, : slb.halo_hi], cols_axis, bwd_c)
            if slb.halo_hi > 0 else None
        )
        parts = [p for p in (c_lo, x, c_hi) if p is not None]
        xc = (
            jnp.concatenate(parts, axis=1)
            if len(parts) > 1 else parts[0]
        )

        # --- row halos on the column-extended tile (rows_axis) -------
        r_lo = (
            jax.lax.ppermute(xc[-svb.halo_lo :], rows_axis, fwd_r)
            if svb.halo_lo > 0 else None
        )
        r_hi = (
            jax.lax.ppermute(xc[: svb.halo_hi], rows_axis, bwd_r)
            if svb.halo_hi > 0 else None
        )
        parts = [p for p in (r_lo, xc, r_hi) if p is not None]
        ext = (
            jnp.concatenate(parts, axis=0)
            if len(parts) > 1 else parts[0]
        )
        return compute(x, xc, ext, cs)

    return body, compute, consts, specs


@dataclasses.dataclass(frozen=True)
class Pallas2DSetup:
    """Resolved fused-Pallas route for the 2-D maker.  ``body`` is the
    shard_map per-device function (ppermute halos); ``compute`` the
    collective-free kernel chain (x, xc, ext, per-device consts) used
    by the mesh-emulation probe (tools/probe_strip2d_tpu.py) to run
    every device's exact kernels of an (r x s) mesh on one real chip."""

    body: Callable
    compute: Callable
    consts: tuple
    specs: tuple
    svb: ShardedVOp
    slb: ShardedLaneOp
    m_h: int
    out_lanes: int
    use_int8: bool


def _pallas_2d_setup(
    plan: ResizePlan,
    r: int,
    s: int,
    padded_h: int,
    padded_w: int,
    precision: str,
    mode_first: str,
    mode_second: str,
    errdiff: bool,
    trunc_bits: int,
    out_dt,
    m_h: int,
    m_w: int,
    rows_axis: str,
    cols_axis: str,
    fwd_r, bwd_r, fwd_c, bwd_c,
    engine: str,
    interpret: bool,
    pallas_tile: int | None,
    halo_overlap: bool = False,
) -> Optional[Pallas2DSetup]:
    """AVIR wrapper over ``_pallas_2d_setup_core``: distill the
    ResizePlan's dtype/int8/output rules, or None when the
    engine/viability rules route to the portable XLA body (same
    selection logic as the 1-D maker)."""
    in_b = 4 if plan.is_in_float else (
        1 if plan.in_type_max == 255.0 else 2
    )
    int8_candidate = (
        precision == "auto"
        and not plan.is_in_float
        and plan.in_type_max == 255.0
        and not plan.is_out_float
        and plan.out_type_max == 255.0
        and not errdiff
        # Sub-8-bit outputs quantize in 2^trunc_bits-LSB steps; keep
        # the bf16 splits' headroom (same exclusion as the single-chip
        # int8_ok, models/runtime.py).
        and trunc_bits == 0
    )
    fused_kwargs = dict(
        out_dtype=(
            out_dt
            if not plan.is_out_float and not errdiff
            else jnp.float32
        ),
        out_max=plan.out_type_max,
        trunc_bits=0 if errdiff else trunc_bits,
        gamma=plan.use_srgb_gamma,
        alpha_index=plan.alpha_index,
        in_gamma_mult=plan.in_gamma_mult,
        out_gamma_mult=plan.out_gamma_mult,
    )
    return _pallas_2d_setup_core(
        plan.v.op, plan.h.op, plan.el_count, in_b, r, s,
        padded_h, padded_w, precision, mode_first, mode_second,
        int8_candidate, plan.use_srgb_gamma, fused_kwargs,
        m_h, m_w, rows_axis, cols_axis,
        fwd_r, bwd_r, fwd_c, bwd_c, engine, interpret, pallas_tile,
        halo_overlap=halo_overlap,
    )


def _pallas_2d_setup_core(
    v_op: BandedOp,
    h_op: BandedOp,
    c: int,
    in_b: int,
    r: int,
    s: int,
    padded_h: int,
    padded_w: int,
    precision: str,
    mode_first: str,
    mode_second: str,
    int8_candidate: bool,
    int8_gamma: bool,
    fused_kwargs: dict,
    m_h: int,
    m_w: int,
    rows_axis: str,
    cols_axis: str,
    fwd_r, bwd_r, fwd_c, bwd_c,
    engine: str,
    interpret: bool,
    pallas_tile: int | None,
    halo_overlap: bool = False,
) -> Optional[Pallas2DSetup]:
    """Build the fused-Pallas per-device route for ``r x s`` 2-D
    sharding from distilled operator/dtype inputs (shared by the AVIR
    and LANCIR 2-D makers), or None when the engine/viability rules
    route to the portable XLA body."""
    if not (_use_pallas_strips(engine, interpret)
            and precision != "exact"):
        return None
    svb = shard_v_blocked(
        v_op, r, padded_h, tile=pallas_tile, in_bytes=in_b
    )
    slb = shard_lane_blocked(
        h_op, s, padded_w, c, in_bytes=in_b
    )
    if svb.use_all_gather or slb.use_all_gather:
        logger.debug(
            "2-D pallas strips unavailable (halo exceeds a strip "
            "on some axis); falling back to the XLA route"
        )
        return None
    if not interpret:
        import types

        from ..ops.pallas.fused_kernel import fused_viable_shapes

        probe_h = types.SimpleNamespace(
            taps_hi=_ShapeOnly(
                (slb.n_blocks, slb.win_l, slb.tile * c)
            ),
            ctaps_hi=(
                None if slb.ctaps_hi is None
                else _ShapeOnly(
                    (slb.n_blocks, slb.ctaps_hi.shape[2],
                     slb.win_c, 128)
                )
            ),
            win_c=slb.win_c,
        )
        downsize = (
            v_op.n_out * h_op.n_out <= v_op.n_in * h_op.n_in
        )
        htb = 1 if (in_b >= 2 and not downsize) else 2
        if not fused_viable_shapes(
            svb.tile, svb.win, probe_h, "vh", in_bytes=in_b,
            h_tap_buffers=htb,
        ):
            logger.debug(
                "2-D pallas strips not VMEM-viable for this config; "
                "falling back to the XLA route"
            )
            return None
    if in_b >= 2 or not halo_overlap:
        # One blocking kernel is the measured DEFAULT (round 5,
        # on-chip A/B comparison at 8K and 16K grids): the 3-call
        # interior/border split re-streams the full H tap set per
        # call, costing ~2x the per-device kernel time at production
        # grids (8K 2x2: 0.40 -> 0.19 ms gross) while the halo
        # exposure it hides is <= ~45 us.  2/4-byte tiles must also
        # avoid the split (scoped-VMEM staging of the border-call
        # outputs).  ``halo_overlap=True`` restores the split for
        # fabrics where comm dominates.
        svb = dataclasses.replace(svb, b_int0=0, b_int1=0)
        slb = dataclasses.replace(slb, b_int0=0, b_int1=0)
    ext_rows = _round_up(
        max(
            int(svb.offs.max()) + svb.win,
            svb.halo_lo + svb.strip + svb.halo_hi,
        ),
        32,
    )
    use_int8 = int8_candidate and slb.taps_q1 is not None
    v_q_np = ()
    v_qshift = 0
    v_l1 = 0.0
    v_qa1 = v_qa0 = 0
    if use_int8:
        import types

        from ..ops.intq import (
            first_pass_overflow_safe,
            quantize_limbs,
        )
        from ..ops.pallas.fused_kernel import int8_feasible

        q1, q0, v_qshift = quantize_limbs(svb.taps)
        v_l1 = float(np.abs(svb.taps).sum(axis=3).max())
        v_qa1 = int(np.abs(q1.astype(np.int64)).sum(axis=3).max())
        v_qa0 = int(np.abs(q0.astype(np.int64)).sum(axis=3).max())
        probe_v = types.SimpleNamespace(
            taps_q1=q1, q_shift=v_qshift, l1_max=v_l1,
            q_abs1=v_qa1, q_abs0=v_qa0,
        )
        probe_hq = types.SimpleNamespace(
            taps_q1=slb.taps_q1, q_shift=slb.q_shift,
            l1_max=slb.l1_max, q_abs1=slb.q_abs1,
            q_abs0=slb.q_abs0,
        )
        use_int8 = first_pass_overflow_safe(
            q1, q0, contract_axis=3
        ) and int8_feasible(
            probe_v, probe_hq, "vh", int8_gamma
        )
        if use_int8:
            v_q_np = (q1, q0)

    pbody, pcompute, pconsts, pspecs = _pallas_strip_fn_2d(
        svb, slb, ext_rows, use_int8,
        ("int8", "int8") if use_int8 else (
            mode_first, mode_second
        ),
        fused_kwargs,
        (v_qshift, v_l1, v_qa1, v_qa0),
        v_q_np,
        m_h, m_w * c, rows_axis, cols_axis,
        fwd_r, bwd_r, fwd_c, bwd_c, interpret, in_bytes=in_b,
    )
    return Pallas2DSetup(
        body=pbody,
        compute=pcompute,
        consts=tuple(pconsts),
        specs=tuple(pspecs),
        svb=svb,
        slb=slb,
        m_h=m_h,
        out_lanes=m_w * c,
        use_int8=use_int8,
    )


def _slice_padded_out(
    out, mesh, new_h, new_wc, rows_axis, cols_axis=None,
    batch_axis=None,
):
    """Final [..., :new_h, :new_wc] slice of the padded sharded output.

    JAX cannot slice a SHARDED dim to an extent that does not divide
    the mesh axis (shards would be cut unevenly); per-device row/col
    counts are ceil-divided, so the slice is a no-op exactly when the
    target extent divides the axis.  For awkward sizes, reshard the
    affected dim to replicated first — the post-resize output is
    small, and evenly-dividing sizes keep the sharded fast path."""
    from jax.sharding import NamedSharding

    need_h = out.shape[-2] != new_h
    need_w = cols_axis is not None and out.shape[-1] != new_wc
    if need_h or need_w:
        spec = ([batch_axis] if batch_axis is not None else []) + [
            None if need_h else rows_axis,
            None if need_w else cols_axis,
        ]
        out = jax.sharding.reshard(
            out, NamedSharding(mesh, P(*spec))
        )
    return out[..., :new_h, :new_wc]


def pad_rows(src: np.ndarray, n_dev: int) -> np.ndarray:
    """Zero-pad image rows (axis -2 of [..., H, WC]) to a multiple of the
    row-mesh size."""
    h = src.shape[-2]
    pad = (-h) % n_dev
    if pad == 0:
        return src
    widths = [(0, 0)] * src.ndim
    widths[-2] = (0, pad)
    return np.pad(src, widths)


def _use_pallas_strips(engine: str, interpret: bool) -> bool:
    if engine == "xla":
        return False
    if engine == "pallas" or interpret:
        return True
    return jax.default_backend() not in ("cpu", "gpu")


def make_sharded_avir_executor(
    plan: ResizePlan,
    mesh: Mesh,
    rows_axis: str = "sp",
    batch_axis: Optional[str] = None,
    precision: str = "auto",
    tile: int = 64,
    engine: str = "auto",
    interpret: bool = False,
    pallas_tile: int | None = None,
    dither: str = "default",
    halo_overlap: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Compile a ResizePlan into a sharded executor over ``mesh``.

    Input: [H_pad, W*C] flattened-interleaved image with H_pad a multiple
    of the row-mesh size (see ``pad_rows``) — or [B, H_pad, W*C] when
    ``batch_axis`` is given.  Rows are sharded over ``rows_axis``, batch
    over ``batch_axis``.  Output is [new_h, new_w*C] (plus batch dim),
    row-sharded the same way.

    On a TPU backend (``engine='auto'``/'pallas') each device runs the
    SAME fused two-pass Pallas kernel as the single-chip path on its
    raw strip plus exchanged halo rows: halos are ppermute'd on the raw
    integer input (the cheapest representation), and pack/gamma/V/H/
    quantize all happen inside the per-device kernel.  Per-chip work is
    therefore identical to the single-chip hot path; the only additions
    are the halo collectives.  ``engine='xla'`` keeps the portable
    gather+matmul route (used on CPU meshes); ``interpret=True`` forces
    the Pallas route in interpreter mode for CPU-mesh testing.

    ``dither``: "default" (round+clamp, per-strip — no communication)
    or "errdiff"/"errdiff-wavefront"/"errdiff-device" (error diffusion).
    Error diffusion is inherently serial across the whole image (the
    reference serializes it onto one thread too, avir.h:5047-5068), so
    the sharded executor gathers the small PRE-dither float output
    strips with one ``all_gather``, runs the in-graph scan replicated
    on every device (wavefront by default; "errdiff-device" keeps the
    sequential nested scan), and each device keeps its own strip of the
    dithered rows — output stays row-sharded like the default path.
    Ignored for float outputs (nothing to quantize, as in the
    reference).
    """
    from ..models.runtime import resolve_modes

    errdiff = dither in (
        "errdiff", "errdiff-wavefront", "errdiff-device"
    ) and not plan.is_out_float
    if dither not in (
        "default", "errdiff", "errdiff-wavefront", "errdiff-device"
    ):
        raise ValueError(f"unknown dither {dither!r}")
    errdiff_impl = "scan" if dither == "errdiff-device" else "wavefront"

    n_dev = mesh.shape[rows_axis]
    in_exact_bf16 = (
        not plan.is_in_float
        and plan.in_type_max == 255.0
        and not plan.use_srgb_gamma
    )
    mode_first, mode_second = resolve_modes(precision, in_exact_bf16)
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    new_w, new_h = plan.new_w, plan.new_h
    padded_h = h + ((-h) % n_dev)

    svop = shard_v_op(plan.v.op, n_dev, padded_h, tile=tile)
    in_b = 4 if plan.is_in_float else (
        1 if plan.in_type_max == 255.0 else 2
    )
    hop = block_banded(plan.h.op, in_bytes=in_b)

    out_bits = 8 if plan.out_type_max == 255.0 else 16
    trunc_bits = 0 if plan.is_out_float else out_bits - plan.res_bit_depth
    out_dt = (
        jnp.float32
        if plan.is_out_float
        else (jnp.uint8 if plan.out_type_max == 255.0 else jnp.uint16)
    )

    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]

    pallas_strips = (
        _use_pallas_strips(engine, interpret)
        and precision != "exact"
        and not svop.use_all_gather
    )
    if pallas_strips:
        from ..ops.lanes import lane_block_banded
        from ..ops.pallas.fused_kernel import fused_viable_shapes

        svb = shard_v_blocked(
            plan.v.op, n_dev, padded_h, tile=pallas_tile,
            in_bytes=in_b,
        )
        lop = lane_block_banded(plan.h.op, c, in_bytes=in_b)
        # VMEM viability of the per-strip fused kernel (the single-chip
        # executors route through choose_fused; the strip route must
        # gate itself or 2/4-byte configs can fail Mosaic compilation).
        # Mirrors choose_fused's per-path H-tap accounting (ADVICE r3):
        # single-buffered taps only on the calibrated 2/4-byte upsize
        # path; the conservative 2x elsewhere.  interpret mode has no
        # VMEM limit (CPU-mesh tests).
        downsize = (
            plan.v.op.n_out * plan.h.op.n_out
            <= plan.v.op.n_in * plan.h.op.n_in
        )
        htb = 1 if (in_b >= 2 and not downsize) else 2
        if not interpret and not fused_viable_shapes(
            svb.tile, svb.win, lop, "vh", in_bytes=in_b,
            h_tap_buffers=htb,
        ):
            logger.debug(
                "sharded pallas strips not VMEM-viable for this "
                "config; falling back to the XLA route"
            )
            pallas_strips = False
    if pallas_strips:
        if in_b >= 2 or not halo_overlap:
            # ONE blocking kernel over the assembled ext buffer is
            # the measured default (round 5: the interior/border
            # V-split re-streams the full H tap set per call —
            # ~1.4-1.7x the per-device time at 8K/16K strip
            # geometries vs <= ~45 us of hidden halo;
            # ``halo_overlap=True`` restores the split).  2/4-byte
            # strips must also avoid it: the split's small
            # border-call outputs get staged by XLA in scoped VMEM
            # (S(1)) on top of the kernel's own ~12 MB frame,
            # exceeding the 16 MB scoped limit at real Mosaic compile
            # (measured on v5e: u16 4K->8K strips fail split, pass
            # unsplit — tools/probe_strip_tpu.py).
            svb = dataclasses.replace(svb, b_int0=0, b_int1=0)
        offs_c = jnp.asarray(svb.offs)
        taps_c = jnp.asarray(svb.taps)
        ext_rows = _round_up(
            max(
                int(svb.offs.max()) + svb.win,
                svb.halo_lo + svb.strip + svb.halo_hi,
            ),
            32,  # Mosaic needs 32-aligned padded input lengths
        )
        blocks = svb.taps.shape[1]

        # The MXU int8 fixed-point mode (ops/intq.py), exactly as on
        # the single-chip path: per-device limb taps quantized with
        # ONE global shift so every strip shares the kernel's
        # fixed-point scales.
        use_int8 = (
            precision == "auto"
            and not plan.is_in_float
            and plan.in_type_max == 255.0
            and not plan.is_out_float
            and plan.out_type_max == 255.0
            and lop.taps_q1 is not None
            # errdiff feeds back its quantizer residual; the pre-dither
            # image must be full precision — and sub-8-bit outputs
            # quantize in 2^trunc_bits-LSB steps (same exclusions as
            # the single-chip int8_ok, models/runtime.py).
            and not errdiff
            and trunc_bits == 0
        )
        q_consts = ()
        v_qshift = 0
        v_l1 = 0.0
        v_qa1 = v_qa0 = 0
        if use_int8:
            import types

            from ..ops.intq import (
                first_pass_overflow_safe,
                quantize_limbs,
            )
            from ..ops.pallas.fused_kernel import int8_feasible

            q1, q0, v_qshift = quantize_limbs(svb.taps)
            v_l1 = float(np.abs(svb.taps).sum(axis=3).max())
            v_qa1 = int(np.abs(q1.astype(np.int64)).sum(axis=3).max())
            v_qa0 = int(np.abs(q0.astype(np.int64)).sum(axis=3).max())
            # Stand-in for the local BlockedBandedOp (built only inside
            # the traced body): int8_feasible reads just these fields.
            probe = types.SimpleNamespace(
                taps_q1=q1, q_shift=v_qshift, l1_max=v_l1,
                q_abs1=v_qa1, q_abs0=v_qa0,
            )
            use_int8 = first_pass_overflow_safe(
                q1, q0, contract_axis=3
            ) and int8_feasible(probe, lop, "vh", plan.use_srgb_gamma)
            if use_int8:
                q_consts = (jnp.asarray(q1), jnp.asarray(q0))

        pallas_fn = _pallas_strip_fn(
            svb, lop, plan.h.op, ext_rows, use_int8,
            batch_axis is None,
            ("int8", "int8") if use_int8 else (
                mode_first, mode_second
            ),
            dict(
                # errdiff: the kernel emits the PRE-dither float image
                # (gamma-out applied, no quantization) — the epilogue
                # below gathers and dithers it (cf. return_predither,
                # models/runtime.py).
                out_dtype=(
                    out_dt
                    if not plan.is_out_float and not errdiff
                    else jnp.float32
                ),
                out_max=plan.out_type_max,
                trunc_bits=0 if errdiff else trunc_bits,
                gamma=plan.use_srgb_gamma,
                alpha_index=plan.alpha_index,
                in_gamma_mult=plan.in_gamma_mult,
                out_gamma_mult=plan.out_gamma_mult,
            ),
            (v_qshift, v_l1, v_qa1, v_qa0),
            new_w * c, rows_axis, fwd, bwd, interpret,
            in_bytes=in_b,
        )

    else:
        offs_c = jnp.asarray(svop.offs)
        taps_c = jnp.asarray(svop.taps)

    def shard_fn(x, v_offs, v_taps):
        # x: [strip, W*C] local rows; v_offs [1, blocks]; v_taps [1, ...]
        v_offs = v_offs[0]
        v_taps = v_taps[0]
        strip = x.shape[0]
        x = x.astype(jnp.float32)

        # --- pack + gamma + H pass (row-local) ------------------------
        if plan.use_srgb_gamma:
            x3 = x.reshape(strip, w, c) * jnp.float32(plan.in_gamma_mult)
            x = srgb_to_linear_jnp(x3, plan.alpha_index).reshape(
                strip, w * c
            )
        x = x.reshape(strip, w, c).transpose(1, 0, 2).reshape(
            w, strip * c
        )
        x = apply_blocked(hop, x, mode_first)  # [new_w, strip*c]
        x = (
            x.reshape(new_w, strip, c)
            .transpose(1, 0, 2)
            .reshape(strip, new_w * c)
        )

        # --- V pass: halos overlapped with interior compute -----------
        if svop.use_all_gather:
            ext = jax.lax.all_gather(x, rows_axis, tiled=True)
            need = int(svop.offs.max()) + svop.win
            if need > ext.shape[0]:
                ext = jnp.pad(ext, ((0, need - ext.shape[0]), (0, 0)))
            y = _apply_local_blocked(ext, v_offs, v_taps, mode_second)
        else:
            y = _overlapped_v(
                x, v_offs, v_taps, svop, rows_axis, fwd, bwd,
                mode_second, _apply_local_blocked,
            )
        y = y[: svop.m]  # [m, new_w*c]

        # --- output conditioning --------------------------------------
        if plan.use_srgb_gamma:
            y3 = linear_to_srgb_jnp(
                y.reshape(svop.m, new_w, c), plan.alpha_index
            )
            if plan.out_gamma_mult != 0.0:
                y3 = y3 * jnp.float32(plan.out_gamma_mult)
            y = y3.reshape(svop.m, new_w * c)
        if not plan.is_out_float:
            if errdiff:
                return y  # pre-dither float; epilogue gathers+dithers
            y = default_dither_jnp(y, trunc_bits, plan.out_type_max)
        return y.astype(out_dt)

    body = pallas_fn if pallas_strips else shard_fn
    if errdiff:
        from ..ops.dither import (
            errdiff_dither_jnp,
            errdiff_dither_wavefront_jnp,
        )

        ed = (
            errdiff_dither_wavefront_jnp
            if errdiff_impl == "wavefront"
            else errdiff_dither_jnp
        )
        m = svop.m
        inner_body = body

        def body(x, *consts):
            # Per-device pre-dither float strip -> one all_gather of
            # the (small, post-resize) image -> the serial scan runs
            # replicated in-graph -> each device keeps its own rows.
            y = inner_body(x, *consts)  # [m, new_w*c] float32
            full = jax.lax.all_gather(y, rows_axis, tiled=True)
            img = full[:new_h].reshape(new_h, new_w, c)
            d = ed(img, trunc_bits, plan.out_type_max)
            d = d.reshape(new_h, new_w * c)
            if n_dev * m > new_h:
                d = jnp.pad(d, ((0, n_dev * m - new_h), (0, 0)))
            i = jax.lax.axis_index(rows_axis)
            mine = jax.lax.dynamic_slice_in_dim(d, i * m, m, axis=0)
            return mine.astype(out_dt)

    consts = (offs_c, taps_c) + (q_consts if pallas_strips else ())
    const_spec = P(rows_axis)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-
    # axes annotation, which the checker would otherwise reject.
    if batch_axis is None:
        inner = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(rows_axis, None),)
            + (const_spec,) * len(consts),
            out_specs=P(rows_axis, None),
            check_vma=False,
        )
    else:
        inner = jax.shard_map(
            jax.vmap(body, in_axes=(0,) + (None,) * len(consts)),
            mesh=mesh,
            in_specs=(P(batch_axis, rows_axis, None),)
            + (const_spec,) * len(consts),
            out_specs=P(batch_axis, rows_axis, None),
            check_vma=False,
        )

    @jax.jit
    def run(src: jax.Array) -> jax.Array:
        out = inner(src, *consts)
        return _slice_padded_out(
            out, mesh, new_h, out.shape[-1], rows_axis,
            batch_axis=batch_axis,
        )

    return run


def make_sharded_lancir_executor(
    plan,
    mesh: Mesh,
    rows_axis: str = "sp",
    batch_axis: Optional[str] = None,
    precision: str = "auto",
    tile: int = 64,
    engine: str = "auto",
    interpret: bool = False,
    pallas_tile: int | None = None,
    halo_overlap: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Sharded executor for a LancirPlan (same row-strip + halo scheme
    as the AVIR maker; round-half-even output stage).

    On a TPU backend (``engine='auto'``/'pallas'), integer-output plans
    run the SAME fused Pallas strip kernel as the single-chip LANCIR
    hot path — including the MXU int8 fixed-point mode for u8 pipelines
    — so per-device work matches the fast path the reference designed
    LANCIR for (/root/reference/README.md:369-372, lancir.h:386-713);
    only the halo collectives are added (overlapped with interior
    compute).  Float outputs and ``engine='xla'`` take the portable
    gather+matmul route."""
    from ..models.runtime import resolve_modes

    n_dev = mesh.shape[rows_axis]
    mode_first, mode_second = resolve_modes(
        precision, plan.in_exact_bf16
    )
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    new_w, new_h = plan.new_w, plan.new_h
    padded_h = h + ((-h) % n_dev)

    svop = shard_v_op(plan.v, n_dev, padded_h, tile=tile)
    hop = block_banded(plan.h, in_bytes=plan.in_itemsize)
    out_dt = (
        jnp.float32
        if plan.is_out_float
        else (jnp.uint8 if plan.clamp == 255.0 else jnp.uint16)
    )

    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]

    pallas_strips = (
        _use_pallas_strips(engine, interpret)
        and precision != "exact"
        and not plan.is_out_float
        and not svop.use_all_gather
    )
    if pallas_strips:
        from ..ops.lanes import lane_block_banded
        from ..ops.pallas.fused_kernel import (
            fused_viable_shapes,
            int8_feasible,
        )

        svb = shard_v_blocked(
            plan.v, n_dev, padded_h, tile=pallas_tile,
            in_bytes=plan.in_itemsize,
        )
        lop = lane_block_banded(plan.h, c, in_bytes=plan.in_itemsize)
        # Same per-path H-tap accounting as the AVIR maker (ADVICE r3).
        downsize = (
            plan.v.n_out * plan.h.n_out <= plan.v.n_in * plan.h.n_in
        )
        htb = 1 if (plan.in_itemsize >= 2 and not downsize) else 2
        if not interpret and not fused_viable_shapes(
            svb.tile, svb.win, lop, "vh",
            in_bytes=plan.in_itemsize, h_tap_buffers=htb,
        ):
            logger.debug(
                "sharded LANCIR pallas strips not VMEM-viable; "
                "falling back to the XLA route"
            )
            pallas_strips = False
    if pallas_strips:
        if plan.in_itemsize >= 2 or not halo_overlap:
            # One blocking kernel by default (see the AVIR maker:
            # measured faster than the V split at production strip
            # geometries; 2/4-byte strips additionally blow the
            # scoped VMEM limit when split).
            svb = dataclasses.replace(svb, b_int0=0, b_int1=0)
        offs_c = jnp.asarray(svb.offs)
        taps_c = jnp.asarray(svb.taps)
        ext_rows = _round_up(
            max(
                int(svb.offs.max()) + svb.win,
                svb.halo_lo + svb.strip + svb.halo_hi,
            ),
            32,  # Mosaic needs 32-aligned padded input lengths
        )

        use_int8 = (
            precision == "auto"
            and plan.in_exact_bf16
            and plan.clamp == 255.0
            and lop.taps_q1 is not None
        )
        q_consts = ()
        v_qshift = 0
        v_l1 = 0.0
        v_qa1 = v_qa0 = 0
        if use_int8:
            import types

            from ..ops.intq import (
                first_pass_overflow_safe,
                quantize_limbs,
            )

            q1, q0, v_qshift = quantize_limbs(svb.taps)
            v_l1 = float(np.abs(svb.taps).sum(axis=3).max())
            v_qa1 = int(np.abs(q1.astype(np.int64)).sum(axis=3).max())
            v_qa0 = int(np.abs(q0.astype(np.int64)).sum(axis=3).max())
            probe = types.SimpleNamespace(
                taps_q1=q1, q_shift=v_qshift, l1_max=v_l1,
                q_abs1=v_qa1, q_abs0=v_qa0,
            )
            use_int8 = first_pass_overflow_safe(
                q1, q0, contract_axis=3
            ) and int8_feasible(probe, lop, "vh", False)
            if use_int8:
                q_consts = (jnp.asarray(q1), jnp.asarray(q0))

        pallas_fn = _pallas_strip_fn(
            svb, lop, plan.h, ext_rows, use_int8,
            batch_axis is None,
            ("int8", "int8") if use_int8 else (
                mode_first, mode_second
            ),
            dict(
                out_dtype=out_dt,
                out_max=plan.clamp,
                scale=plan.out_mul,
                round_mode="even",
            ),
            (v_qshift, v_l1, v_qa1, v_qa0),
            new_w * c, rows_axis, fwd, bwd, interpret,
            in_bytes=plan.in_itemsize,
        )
    else:
        offs_c = jnp.asarray(svop.offs)
        taps_c = jnp.asarray(svop.taps)

    def shard_fn(x, v_offs, v_taps):
        v_offs = v_offs[0]
        v_taps = v_taps[0]
        strip = x.shape[0]
        x = x.astype(jnp.float32)
        x = x.reshape(strip, w, c).transpose(1, 0, 2).reshape(
            w, strip * c
        )
        x = apply_blocked(hop, x, mode_first)
        x = (
            x.reshape(new_w, strip, c)
            .transpose(1, 0, 2)
            .reshape(strip, new_w * c)
        )
        if svop.use_all_gather:
            ext = jax.lax.all_gather(x, rows_axis, tiled=True)
            need = int(svop.offs.max()) + svop.win
            if need > ext.shape[0]:
                ext = jnp.pad(ext, ((0, need - ext.shape[0]), (0, 0)))
            y = _apply_local_blocked(ext, v_offs, v_taps, mode_second)
        else:
            y = _overlapped_v(
                x, v_offs, v_taps, svop, rows_axis, fwd, bwd,
                mode_second, _apply_local_blocked,
            )
        y = y[: svop.m]
        if plan.out_mul != 1.0:
            y = y * jnp.float32(plan.out_mul)
        if plan.is_out_float:
            return y
        y = jnp.clip(jnp.round(y), 0.0, plan.clamp)
        return y.astype(out_dt)

    body = pallas_fn if pallas_strips else shard_fn
    consts = (offs_c, taps_c) + (q_consts if pallas_strips else ())
    const_spec = P(rows_axis)
    if batch_axis is None:
        inner = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(rows_axis, None),)
            + (const_spec,) * len(consts),
            out_specs=P(rows_axis, None),
            check_vma=False,
        )
    else:
        inner = jax.shard_map(
            jax.vmap(body, in_axes=(0,) + (None,) * len(consts)),
            mesh=mesh,
            in_specs=(P(batch_axis, rows_axis, None),)
            + (const_spec,) * len(consts),
            out_specs=P(batch_axis, rows_axis, None),
            check_vma=False,
        )

    @jax.jit
    def run(src: jax.Array) -> jax.Array:
        out = inner(src, *consts)
        return _slice_padded_out(
            out, mesh, new_h, out.shape[-1], rows_axis,
            batch_axis=batch_axis,
        )

    return run


def make_sharded_lancir_executor_2d(
    plan,
    mesh: Mesh,
    rows_axis: str = "sp",
    cols_axis: str = "cp",
    batch_axis: Optional[str] = None,
    precision: str = "auto",
    tile: int = 64,
    engine: str = "auto",
    interpret: bool = False,
    pallas_tile: int | None = None,
    halo_overlap: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """2-D (rows x cols) intra-image sharding for a LancirPlan — the
    LANCIR analog of ``make_sharded_avir_executor_2d`` (same fused
    tile body via ``_pallas_2d_setup_core``, raw-tile halos on both
    axes, LANCIR's out_mul + round-half-even output stage; the
    portable XLA body for CPU meshes / float outputs /
    ``engine='xla'``).  Input ``[H_pad, W_pad*C]``
    (``pad_rows`` + ``pad_cols``), or batched with ``batch_axis``."""
    from ..models.runtime import resolve_modes

    r = mesh.shape[rows_axis]
    s = mesh.shape[cols_axis]
    mode_first, mode_second = resolve_modes(
        precision, plan.in_exact_bf16
    )
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    new_w, new_h = plan.new_w, plan.new_h
    padded_h = h + ((-h) % r)
    padded_w = w + ((-w) % s)
    in_b = plan.in_itemsize

    svv = shard_v_op(plan.v, r, padded_h, tile=tile)
    svh = shard_v_op(plan.h, s, padded_w, tile=tile)
    m_h, m_w = svv.m, svh.m
    out_dt = (
        jnp.float32
        if plan.is_out_float
        else (jnp.uint8 if plan.clamp == 255.0 else jnp.uint16)
    )

    fwd_r = [(i, i + 1) for i in range(r - 1)]
    bwd_r = [(i + 1, i) for i in range(r - 1)]
    fwd_c = [(i, i + 1) for i in range(s - 1)]
    bwd_c = [(i + 1, i) for i in range(s - 1)]

    p2d = None
    if not plan.is_out_float:
        p2d = _pallas_2d_setup_core(
            plan.v, plan.h, c, in_b, r, s, padded_h, padded_w,
            precision, mode_first, mode_second,
            int8_candidate=(
                precision == "auto"
                and plan.in_exact_bf16
                and plan.clamp == 255.0
            ),
            int8_gamma=False,
            fused_kwargs=dict(
                out_dtype=out_dt,
                out_max=plan.clamp,
                scale=plan.out_mul,
                round_mode="even",
            ),
            m_h=m_h, m_w=m_w,
            rows_axis=rows_axis, cols_axis=cols_axis,
            fwd_r=fwd_r, bwd_r=bwd_r, fwd_c=fwd_c, bwd_c=bwd_c,
            engine=engine, interpret=interpret,
            pallas_tile=pallas_tile, halo_overlap=halo_overlap,
        )
    pallas_strips = p2d is not None

    def body(x, v_offs, v_taps, h_offs, h_taps):
        # x: [hs, ws*c] raw local tile.
        v_offs, v_taps = v_offs[0], v_taps[0]
        h_offs, h_taps = h_offs[0], h_taps[0]
        hs = x.shape[0]
        xf = x.astype(jnp.float32)
        ws_loc = xf.shape[1] // c
        xt = xf.reshape(hs, ws_loc, c).transpose(1, 0, 2).reshape(
            ws_loc, hs * c
        )

        if svh.use_all_gather:
            ext = jax.lax.all_gather(xt, cols_axis, tiled=True)
            need = int(svh.offs.max()) + svh.win
            if need > ext.shape[0]:
                ext = jnp.pad(ext, ((0, need - ext.shape[0]), (0, 0)))
            y = _apply_local_blocked(ext, h_offs, h_taps, mode_first)
        else:
            y = _overlapped_v(
                xt, h_offs, h_taps, svh, cols_axis, fwd_c, bwd_c,
                mode_first, _apply_local_blocked,
            )
        y = y[:m_w]
        y = y.reshape(m_w, hs, c).transpose(1, 0, 2).reshape(
            hs, m_w * c
        )

        if svv.use_all_gather:
            ext_r = jax.lax.all_gather(y, rows_axis, tiled=True)
            need_r = int(svv.offs.max()) + svv.win
            if need_r > ext_r.shape[0]:
                ext_r = jnp.pad(
                    ext_r, ((0, need_r - ext_r.shape[0]), (0, 0))
                )
            z = _apply_local_blocked(
                ext_r, v_offs, v_taps, mode_second
            )
        else:
            z = _overlapped_v(
                y, v_offs, v_taps, svv, rows_axis, fwd_r, bwd_r,
                mode_second, _apply_local_blocked,
            )
        z = z[:m_h]
        if plan.out_mul != 1.0:
            z = z * jnp.float32(plan.out_mul)
        if plan.is_out_float:
            return z
        z = jnp.clip(jnp.round(z), 0.0, plan.clamp)
        return z.astype(out_dt)

    if pallas_strips:
        body = p2d.body
        consts = tuple(jnp.asarray(a) for a in p2d.consts)
        cspecs = tuple(p2d.specs)
    else:
        # XLA-route tap consts transfer to the device only when that
        # route is actually taken (they are dead on the fused route —
        # and device_puts are expensive on tunnel-attached rigs).
        consts = (
            jnp.asarray(svv.offs), jnp.asarray(svv.taps),
            jnp.asarray(svh.offs), jnp.asarray(svh.taps),
        )
        cspecs = (
            P(rows_axis), P(rows_axis), P(cols_axis), P(cols_axis)
        )

    if batch_axis is None:
        inner = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(rows_axis, cols_axis),) + cspecs,
            out_specs=P(rows_axis, cols_axis),
            check_vma=False,
        )
    else:
        inner = jax.shard_map(
            jax.vmap(body, in_axes=(0,) + (None,) * len(consts)),
            mesh=mesh,
            in_specs=(P(batch_axis, rows_axis, cols_axis),) + cspecs,
            out_specs=P(batch_axis, rows_axis, cols_axis),
            check_vma=False,
        )

    @jax.jit
    def run(src: jax.Array) -> jax.Array:
        out = inner(src, *consts)
        return _slice_padded_out(
            out, mesh, new_h, new_w * c, rows_axis,
            cols_axis=cols_axis, batch_axis=batch_axis,
        )

    return run


def pad_cols(src: np.ndarray, n_dev: int, c: int) -> np.ndarray:
    """Zero-pad image columns (axis -1 holds W*C interleaved lanes) to
    a multiple of the col-mesh size.  Sound for the same reason as
    ``pad_rows``: composed horizontal taps never reference columns
    >= src_w."""
    w = src.shape[-1] // c
    pad = (-w) % n_dev
    if pad == 0:
        return src
    widths = [(0, 0)] * src.ndim
    widths[-1] = (0, pad * c)
    return np.pad(src, widths)


def _halo_fits(
    op: BandedOp, n_dev: int, padded_len: int, c: int = 1
) -> bool:
    """Cheap halo-viability test — the ``use_all_gather`` rule of
    ``shard_v_op`` / ``shard_lane_blocked`` (every device's window
    overhang fits the neighbouring strip) WITHOUT densifying any
    taps: microseconds instead of seconds, for pre-flight queries
    like ``suggest_grid``.  ``c`` > 1 tests the lane (column) axis."""
    if n_dev == 1:
        return True
    n_out, width = op.n_out, op.width
    m = -(-n_out // n_dev)
    strip = (padded_len // n_dev) * c
    starts = op.starts.astype(np.int64)
    d = np.arange(n_dev)
    lo = np.minimum(d * m, n_out - 1)
    hi = np.minimum((d + 1) * m, n_out) - 1
    need_lo = np.where(
        d * m >= n_out,
        np.minimum(d * strip, op.n_in * c),
        starts[lo] * c,
    )
    need_hi = np.where(
        d * m >= n_out,
        need_lo,
        (starts[np.maximum(hi, 0)] + width) * c,
    )
    halo_lo = int(max(0, np.max(d * strip - need_lo)))
    halo_hi = int(max(0, np.max(need_hi - (d + 1) * strip)))
    return halo_lo <= strip and halo_hi <= strip


def suggest_grid(plan: ResizePlan, n_devices: int) -> tuple[int, int]:
    """Recommend an (rows, cols) grid for ``n_devices`` chips on one
    image, from the round-5 measured tables (docs/scaling.md,
    tools/probe_strip2d_tpu.py): COLUMN sharding beats row sharding at
    every measured device count — (1, s) keeps the V pass's full
    output-block grid depth and shrinks only the lane extent, while
    (r, 1) cuts the V grid into r few-block kernels that cannot
    amortize ramp-up (8K n=4: 1x4 = 0.80 vs 4x1 = 0.53 measured
    per-chip efficiency).

    Returns the smallest-rows factorization whose BOTH axes stay on
    the ppermute halo path (halo <= strip; the all_gather fallback
    forfeits the scaling), preferring pure columns, then 2-D, then
    pure rows."""
    c = plan.el_count
    h, w = plan.src_h, plan.src_w
    best = None
    for r in [d for d in range(1, n_devices + 1)
              if n_devices % d == 0]:
        s = n_devices // r
        padded_h = h + ((-h) % r)
        padded_w = w + ((-w) % s)
        if padded_h // r < 8 or padded_w // s < 8:
            continue
        if _halo_fits(plan.v.op, r, padded_h) and _halo_fits(
            plan.h.op, s, padded_w, c
        ):
            return (r, s)
        if best is None:
            best = (r, s)
    return best if best is not None else (1, n_devices)


def make_sharded_avir_executor_2d(
    plan: ResizePlan,
    mesh: Mesh,
    rows_axis: str = "sp",
    cols_axis: str = "cp",
    batch_axis: Optional[str] = None,
    precision: str = "auto",
    tile: int = 64,
    dither: str = "default",
    engine: str = "auto",
    interpret: bool = False,
    pallas_tile: int | None = None,
    halo_overlap: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """2-D intra-image sharding: rows x columns over an (r x s) mesh
    grid (VERDICT r3 item 5 / SURVEY §2.3's distributed equivalent).

    Row-only sharding hits INTERIOR EXTINCTION once strips shrink to
    the vertical band's window (~n=8 at 8K): every block touches a
    halo and the overlap credit dies.  Sharding BOTH axes keeps strips
    fat in both dimensions at the same device count — n=8 as 2x4 has
    2160-row x 1920-col tiles at 8K vs 540-row full-width strips — so
    each pass keeps interior blocks and the knee moves out.

    Two per-device bodies (same selection rule as the 1-D maker):

    On a TPU backend (``engine='auto'``/'pallas'; ``interpret=True``
    forces it on CPU meshes) each device runs the SAME fused two-pass
    Pallas kernel as the single-chip hot path — int8 fixed-point for
    u8 pipelines — on its raw tile extended by BOTH halos
    (``_pallas_strip_fn_2d``): column halos ppermute along
    ``cols_axis`` on the raw integer tile, row halos along
    ``rows_axis`` on the column-extended raw tile (both exchanges ride
    the cheapest bytes; V and H run inside one kernel, so there is no
    f32 intermediate to exchange on), with the (interior x interior)
    kernel call issued before either collective's results are
    consumed.  Per-chip work matches the single-chip fused kernel plus
    the V pass over the halo columns (a few percent).

    ``engine='xla'`` (or non-viable configs) keeps the portable
    gather+matmul body — the classic 2-D stencil decomposition with an
    exchange per pass:

      1. pack + gamma on the local tile (elementwise — bit-identical
         to linearizing the assembled image);
      2. column halos ppermute along ``cols_axis`` on the f32
         TRANSPOSED tile, H pass contracting the local column extent
         (interior column blocks overlap the ppermutes);
      3. row halos ppermute along ``rows_axis`` on the f32 H-resized
         tile (now new_w/s columns wide);
      4. V pass, gamma-out, dither.

    Input: [H_pad, W_pad*C] (``pad_rows`` + ``pad_cols``), or
    [B, H_pad, W_pad*C] with ``batch_axis``.  Output [new_h, new_w*C]
    sharded over (rows_axis, cols_axis).

    ``dither="errdiff"`` gathers the small pre-dither output over both
    axes and runs the wavefront in-graph, as in the 1-D maker.
    """
    from ..models.runtime import resolve_modes

    errdiff = dither in (
        "errdiff", "errdiff-wavefront", "errdiff-device"
    ) and not plan.is_out_float
    if dither not in (
        "default", "errdiff", "errdiff-wavefront", "errdiff-device"
    ):
        raise ValueError(f"unknown dither {dither!r}")

    r = mesh.shape[rows_axis]
    s = mesh.shape[cols_axis]
    in_exact_bf16 = (
        not plan.is_in_float
        and plan.in_type_max == 255.0
        and not plan.use_srgb_gamma
    )
    mode_first, mode_second = resolve_modes(precision, in_exact_bf16)
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    new_w, new_h = plan.new_w, plan.new_h
    padded_h = h + ((-h) % r)
    padded_w = w + ((-w) % s)

    svv = shard_v_op(plan.v.op, r, padded_h, tile=tile)
    svh = shard_v_op(plan.h.op, s, padded_w, tile=tile)
    m_h, m_w = svv.m, svh.m
    in_b = 4 if plan.is_in_float else (
        1 if plan.in_type_max == 255.0 else 2
    )

    out_bits = 8 if plan.out_type_max == 255.0 else 16
    trunc_bits = 0 if plan.is_out_float else out_bits - plan.res_bit_depth
    out_dt = (
        jnp.float32
        if plan.is_out_float
        else (jnp.uint8 if plan.out_type_max == 255.0 else jnp.uint16)
    )

    fwd_r = [(i, i + 1) for i in range(r - 1)]
    bwd_r = [(i + 1, i) for i in range(r - 1)]
    fwd_c = [(i, i + 1) for i in range(s - 1)]
    bwd_c = [(i + 1, i) for i in range(s - 1)]

    # --- fused-Pallas per-device body (the TPU production route) ------
    p2d = _pallas_2d_setup(
        plan, r, s, padded_h, padded_w, precision,
        mode_first, mode_second, errdiff, trunc_bits, out_dt,
        m_h, m_w, rows_axis, cols_axis,
        fwd_r, bwd_r, fwd_c, bwd_c, engine, interpret, pallas_tile,
        halo_overlap=halo_overlap,
    )
    pallas_strips = p2d is not None

    def body(x, v_offs, v_taps, h_offs, h_taps):
        # x: [hs, ws*c] raw local tile.
        v_offs, v_taps = v_offs[0], v_taps[0]
        h_offs, h_taps = h_offs[0], h_taps[0]
        hs = x.shape[0]

        # --- pack + gamma on the LOCAL tile ---------------------------
        # Gamma is elementwise, so linearizing before the halo exchange
        # yields bit-identical values to linearizing the assembled ext
        # (each column's owner computes the same function of the same
        # bytes) — and lets the H pass use the SAME interior/border
        # overlap machinery as the V pass: interior column blocks read
        # only local columns, so their matmuls are issued before the
        # ppermutes' results are consumed.
        xf = x.astype(jnp.float32)
        if plan.use_srgb_gamma:
            x3 = xf.reshape(hs, -1, c) * jnp.float32(
                plan.in_gamma_mult
            )
            xf = srgb_to_linear_jnp(x3, plan.alpha_index).reshape(
                hs, -1
            )
        ws_loc = xf.shape[1] // c
        xt = xf.reshape(hs, ws_loc, c).transpose(1, 0, 2).reshape(
            ws_loc, hs * c
        )

        # --- H pass: column halos overlapped with interior compute ----
        if svh.use_all_gather:
            ext = jax.lax.all_gather(xt, cols_axis, tiled=True)
            need = int(svh.offs.max()) + svh.win
            if need > ext.shape[0]:
                ext = jnp.pad(ext, ((0, need - ext.shape[0]), (0, 0)))
            y = _apply_local_blocked(ext, h_offs, h_taps, mode_first)
        else:
            y = _overlapped_v(
                xt, h_offs, h_taps, svh, cols_axis, fwd_c, bwd_c,
                mode_first, _apply_local_blocked,
            )
        y = y[:m_w]  # [m_w, hs*c]
        y = y.reshape(m_w, hs, c).transpose(1, 0, 2).reshape(
            hs, m_w * c
        )

        # --- row halos on the f32 intermediate + V pass ---------------
        if svv.use_all_gather:
            ext_r = jax.lax.all_gather(y, rows_axis, tiled=True)
            need_r = int(svv.offs.max()) + svv.win
            if need_r > ext_r.shape[0]:
                ext_r = jnp.pad(
                    ext_r, ((0, need_r - ext_r.shape[0]), (0, 0))
                )
            z = _apply_local_blocked(
                ext_r, v_offs, v_taps, mode_second
            )
        else:
            z = _overlapped_v(
                y, v_offs, v_taps, svv, rows_axis, fwd_r, bwd_r,
                mode_second, _apply_local_blocked,
            )
        z = z[:m_h]  # [m_h, m_w*c]

        # --- output conditioning --------------------------------------
        if plan.use_srgb_gamma:
            z3 = linear_to_srgb_jnp(
                z.reshape(m_h, m_w, c), plan.alpha_index
            )
            if plan.out_gamma_mult != 0.0:
                z3 = z3 * jnp.float32(plan.out_gamma_mult)
            z = z3.reshape(m_h, m_w * c)
        if plan.is_out_float:
            return z
        if errdiff:
            return z  # pre-dither float; epilogue below
        z = default_dither_jnp(z, trunc_bits, plan.out_type_max)
        return z.astype(out_dt)

    if pallas_strips:
        body = p2d.body
        consts = tuple(jnp.asarray(a) for a in p2d.consts)
        cspecs = tuple(p2d.specs)
    else:
        # XLA-route tap consts transfer to the device only when that
        # route is actually taken (they are dead on the fused route —
        # and device_puts are expensive on tunnel-attached rigs).
        consts = (
            jnp.asarray(svv.offs), jnp.asarray(svv.taps),
            jnp.asarray(svh.offs), jnp.asarray(svh.taps),
        )
        cspecs = (
            P(rows_axis), P(rows_axis), P(cols_axis), P(cols_axis)
        )

    if errdiff:
        from ..ops.dither import (
            errdiff_dither_jnp,
            errdiff_dither_wavefront_jnp,
        )

        ed = (
            errdiff_dither_jnp
            if dither == "errdiff-device"
            else errdiff_dither_wavefront_jnp
        )
        inner_body = body

        def body(x, *consts):  # noqa: F811 — errdiff wrapper
            z = inner_body(x, *consts)  # [m_h, m_w*c] float
            fc = jax.lax.all_gather(z, cols_axis, axis=1, tiled=True)
            full = jax.lax.all_gather(fc, rows_axis, tiled=True)
            img = full[:new_h, : new_w * c].reshape(new_h, new_w, c)
            d = ed(img, trunc_bits, plan.out_type_max)
            d = d.reshape(new_h, new_w * c)
            d = jnp.pad(
                d,
                (
                    (0, r * m_h - new_h),
                    (0, (s * m_w - new_w) * c),
                ),
            )
            i = jax.lax.axis_index(rows_axis)
            j = jax.lax.axis_index(cols_axis)
            mine = jax.lax.dynamic_slice(
                d, (i * m_h, j * m_w * c), (m_h, m_w * c)
            )
            return mine.astype(out_dt)

    if batch_axis is None:
        inner = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(rows_axis, cols_axis),) + cspecs,
            out_specs=P(rows_axis, cols_axis),
            check_vma=False,
        )
    else:
        inner = jax.shard_map(
            jax.vmap(body, in_axes=(0,) + (None,) * len(consts)),
            mesh=mesh,
            in_specs=(P(batch_axis, rows_axis, cols_axis),) + cspecs,
            out_specs=P(batch_axis, rows_axis, cols_axis),
            check_vma=False,
        )

    @jax.jit
    def run(src: jax.Array) -> jax.Array:
        out = inner(src, *consts)
        return _slice_padded_out(
            out, mesh, new_h, new_w * c, rows_axis,
            cols_axis=cols_axis, batch_axis=batch_axis,
        )

    return run
