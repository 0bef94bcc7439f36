"""Lane-side blocked form of a banded operator.

The second (horizontal) pass of a resize consumes the first pass's
output [rows, W*C] and must contract over W.  The straightforward
lowering transposes to put W on the leading axis — two large layout
copies that dominate the pipeline's HBM traffic.  This module instead
builds, per output block, a dense RIGHT-multiplication matrix over the
interleaved lane axis:

    out[:, b*T*C : (b+1)*T*C] = x[:, offs[b]*C : offs[b]*C + win*C] @ B[b]

with B[b][w*C + ch, t*C + ch] = taps[b*T + t, w] (zero across channels).
The input is consumed in its natural layout and the output IS the final
interleaved [rows, new_w*C] layout — no transposes anywhere.  The
channel-diagonal structure wastes a factor C of MXU work, which is far
cheaper than the transposes it replaces.

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
    """Right-multiplication lane form; all sizes in units of ROWS of the
    original operator (multiply by ``c`` for lane counts)."""

    n_in: int      # input length (rows of the banded op)
    n_out: int
    c: int         # interleaved channel count
    tile: int      # output rows per block
    win: int       # input-window rows per block
    lanes_pad: int  # required input lanes incl. zero-pad
    offs: jax.Array      # int32 [n_blocks] — window starts in ROWS
    taps_hi: jax.Array   # bf16 [n_blocks, win*c, tile*c]
    taps_lo: jax.Array   # bf16 [n_blocks, win*c, tile*c]

    @property
    def n_blocks(self) -> int:
        return self.offs.shape[0]


def lane_block_banded(
    op: BandedOp, c: int, tile: int | None = None, row_align: int | None = None
) -> LaneBlockedOp:
    """Build the lane-side blocked form.

    Window starts are aligned to ``row_align`` rows so that the lane
    offset offs*c is a multiple of 128 (Mosaic lane-tiling
    requirement); the loosest legal alignment is 128/gcd(c,128) rows —
    e.g. 32 rows for 4-channel data — which shrinks the window
    alignment slack (up to row_align-1 wasted leading pixels per
    block, pure zero-tap MACs).  The default tile is the smallest
    multiple of 128/gcd(c,128) rows >= 64, so each output block spans a
    whole number of 128-lane tiles."""
    step = 128 // int(np.gcd(c, 128))
    if row_align is None:
        row_align = step
    if tile is None:
        tile = step * max(1, -(-64 // step))
    n_out, width = op.n_out, op.width
    n_blocks = -(-n_out // tile)
    starts = op.starts.astype(np.int64)

    offs = np.empty(n_blocks, dtype=np.int64)
    spans = np.empty(n_blocks, dtype=np.int64)
    for b in range(n_blocks):
        lo = b * tile
        hi = min(lo + tile, n_out)
        offs[b] = (starts[lo] // row_align) * row_align
        spans[b] = starts[hi - 1] + width - offs[b]
    win = _round_up(int(spans.max()), 128 // max(1, np.gcd(c, 128)))
    # Keep win*c a multiple of 128 lanes.
    while (win * c) % 128:
        win += 1
    # Pull overrunning tail windows left (row_align-aligned) to avoid
    # padding the input lanes.
    max_off = (op.n_in - win) // row_align * row_align
    if max_off >= 0 and int(
        (spans + np.maximum(offs - max_off, 0)).max()
    ) <= win:
        offs -= np.maximum(offs - max_off, 0)
    lanes_pad = (int(offs.max()) + win) * c

    dense = np.zeros((n_blocks, win * c, tile * c), dtype=np.float32)
    for b in range(n_blocks):
        lo = b * tile
        hi = min(lo + tile, n_out)
        for i in range(lo, hi):
            w0 = int(starts[i]) - int(offs[b])
            t = i - lo
            for ch in range(c):
                dense[
                    b,
                    (w0 * c + ch) : ((w0 + width) * c + ch) : c,
                    t * c + ch,
                ] = op.taps[i]

    taps = jnp.asarray(dense)
    taps_hi = taps.astype(jnp.bfloat16)
    taps_lo = (taps - taps_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return LaneBlockedOp(
        n_in=op.n_in,
        n_out=n_out,
        c=c,
        tile=tile,
        win=win,
        lanes_pad=lanes_pad,
        offs=jnp.asarray(offs, dtype=jnp.int32),
        taps_hi=taps_hi,
        taps_lo=taps_lo,
    )
