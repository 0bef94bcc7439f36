"""Pallas TPU kernel for the anti-diagonal wavefront errdiff scan.

The lax.scan formulation of the wavefront (ops/dither.py) is bound by
the While loop's per-step xs slice / ys update machinery (~3 us per
diagonal at 8K, tools/probe_wavefront_ops.py) while the VPU work per
step is ~0.1 us.  This kernel streams the skewed planar diagonals
S [T, C*R] through VMEM in chunks of K, keeps the three noise carries
resident in VMEM scratch across the (sequential) grid, and runs the K
diagonal steps of a chunk as straight-line VPU code — the scan becomes
VPU-bound instead of loop-overhead-bound.

Each diagonal is processed as an (8, G) value (G = padded C*R/8) so
all eight sublanes work: the first (1, C*R) formulation ran one
sublane and measured 8x slower at 8K.  The flat shift by one position
(row y reads row y-1 within each channel plane) carries the last lane
of each sublane row into the next row's head.

Semantics are identical to ``ops/dither._wavefront_rows`` (single-block
path): same weights, same reassociated per-pixel sums, same masked
noise discard at row ends (the reference's behavior,
/root/reference/avir.h:4504-4524).  The carry hand-off across chunks is
exact — scratch persists between grid steps on the sequentially
executed TPU grid.

Engine parity: bit-identical to the lax.scan path for unit-step
quantization (trunc_bits=0); for truncating configs whose step is not
f32-exact, XLA may fuse the quantize arithmetic (round*tm, cur-z0)
differently across the two programs, flipping isolated half-step
boundary pixels — bounded at one quantization step (tested), the same
tolerance every errdiff variant carries vs the f64 oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..banded import _round_up
from ..dither import (
    W_CUR_RIGHT,
    W_NEXT_CENTER,
    W_NEXT_LEFT,
    W_NEXT_RIGHT,
    round_biased,
)

_SUB = 8  # sublane count: each diagonal computes as (8, G)


def _kernel(
    s_ref, o_ref, n1_ref, d1_ref, d2_ref, d3_ref, *,
    K: int, w: int, c: int, r: int, G: int,
    tm: float, tmi: float, out_max: float,
):
    tau = pl.program_id(0)

    @pl.when(tau == 0)
    def _init():
        z = jnp.zeros((_SUB, G), jnp.float32)
        n1_ref[...] = z
        d1_ref[...] = z
        d2_ref[...] = z
        d3_ref[...] = z

    # Flat planar index j = sub*G + lane = ch*r + y (C planes of R
    # rows, ops/dither._skew_rows; trailing pad lanes j >= c*r are
    # permanently masked).
    jj = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUB, G), 0) * G
        + jax.lax.broadcasted_iota(jnp.int32, (_SUB, G), 1)
    )
    yy2 = 2 * (jj % r)
    dead = jj >= c * r
    head0 = ((jj % r) == 0) | dead
    lane0 = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUB, G), 1) == 0
    )
    zero = jnp.zeros((_SUB, G), jnp.float32)

    def down(a):
        # Row y reads row y-1: shift ONE flat position, via two
        # native rotates and selects ONLY (Mosaic rejects concats /
        # slices with mismatched lane offsets).  Lane rotate gives
        # b[i, l] = a[i, l-1] with b[i, 0] = a[i, G-1]; lane 0 must
        # instead take the PREVIOUS sublane row's last lane, i.e.
        # b[i-1, 0] — a sublane rotate of b selected at lane 0.  The
        # one wrong wraparound cell (sublane 0, lane 0 = flat j 0) is
        # zeroed by head0 (j % r == 0).  Channel-plane heads (y = 0)
        # and pad lanes read zero (also kills the cross-plane leak).
        b = pltpu.roll(a, 1, 1)
        colv = pltpu.roll(b, 1, 0)
        sh = jnp.where(lane0, colv, b)
        return jnp.where(head0, zero, sh)

    # Shifted-carry scheme (see ops/dither._wavefront_rows): carry the
    # ALREADY-shifted noise vectors d_k = down(noise(t-k)), so each
    # step performs ONE down() (two rotates) instead of three —
    # the rotates sit on the recurrence's critical path.
    # trunc_bits == 0 has tm == tmi == 1.0: the quantizer multiplies
    # are exact identities, and eliding them removes two VPU ops from
    # the serial recurrence (~40% of the step at G = 128 — measured,
    # tools/probe_wavefront_carry_ablate.py).  Bit-exact either way.
    unit_tm = tm == 1.0 and tmi == 1.0
    a1 = n1_ref[...]
    b1 = d1_ref[...]
    b2 = d2_ref[...]
    b3 = d3_ref[...]
    for k in range(K):
        t = tau * K + k
        s_t = s_ref[k]
        cur = (
            s_t
            + W_CUR_RIGHT * a1
            + W_NEXT_LEFT * b1
            + W_NEXT_CENTER * b2
            + W_NEXT_RIGHT * b3
        )
        z0 = (
            round_biased(cur)
            if unit_tm
            else round_biased(cur * tmi) * tm
        )
        x_of = t - yy2
        m = (x_of >= 0) & (x_of < w) & ~dead
        noise = jnp.where(m, cur - z0, 0.0)
        o_ref[k] = jnp.clip(z0, 0.0, out_max)
        a1, b1, b2, b3 = noise, down(noise), b1, b2
    n1_ref[...] = a1
    d1_ref[...] = b1
    d2_ref[...] = b2
    d3_ref[...] = b3


def _kernel_carry(
    s_ref, hd_ref, init_ref, o_ref, n_ref,
    n1_ref, d1_ref, d2_ref, d3_ref, *,
    K: int, w: int, c: int, r: int, G: int,
    tm: float, tmi: float, out_max: float,
):
    """Carry-block variant of ``_kernel`` (the row-blocked wavefront,
    VERDICT r4 item 3): row 0 of each channel plane reads the PREVIOUS
    block's last-row noise instead of zero.  The per-step head scalars
    (nlp[(t+3)*c + ch], precomputed host-side from the carried noise —
    same indexing as ops/dither._wavefront_rows) stream in via an SMEM
    block ``hd_ref`` [K, c]; the three t=0 carry heads via
    ``init_ref`` [3, c].  The full noise stream is emitted as a second
    output so the caller can slice this block's last-row noise (lane
    ch*r + r-1 at steps 2(r-1)+x) for the next block."""
    tau = pl.program_id(0)

    jj = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUB, G), 0) * G
        + jax.lax.broadcasted_iota(jnp.int32, (_SUB, G), 1)
    )
    yy2 = 2 * (jj % r)
    dead = jj >= c * r
    head0 = ((jj % r) == 0) | dead
    lane0 = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUB, G), 1) == 0
    )
    zero = jnp.zeros((_SUB, G), jnp.float32)
    # Row-0 lane positions of each channel plane (where the carried
    # noise is inserted): jj == ch*r.
    planes = [jj == ch * r for ch in range(c)]

    def insert(a, scalars):
        for ch in range(c):
            a = jnp.where(planes[ch], scalars[ch], a)
        return a

    @pl.when(tau == 0)
    def _init():
        n1_ref[...] = zero
        # d_k(t=0) = down(zero) with head nlp[(3-k)*c + ch]
        # (ops/dither._wavefront_rows init).
        for k, ref in ((1, d1_ref), (2, d2_ref), (3, d3_ref)):
            ref[...] = insert(
                zero, [init_ref[3 - k, ch] for ch in range(c)]
            )

    def down(a, heads):
        b = pltpu.roll(a, 1, 1)
        colv = pltpu.roll(b, 1, 0)
        sh = jnp.where(lane0, colv, b)
        return insert(jnp.where(head0, zero, sh), heads)

    # trunc_bits == 0 has tm == tmi == 1.0: the quantizer multiplies
    # are exact identities, and eliding them removes two VPU ops from
    # the serial recurrence (~40% of the step at G = 128 — measured,
    # tools/probe_wavefront_carry_ablate.py).  Bit-exact either way.
    unit_tm = tm == 1.0 and tmi == 1.0
    a1 = n1_ref[...]
    b1 = d1_ref[...]
    b2 = d2_ref[...]
    b3 = d3_ref[...]
    for k in range(K):
        t = tau * K + k
        s_t = s_ref[k]
        cur = (
            s_t
            + W_CUR_RIGHT * a1
            + W_NEXT_LEFT * b1
            + W_NEXT_CENTER * b2
            + W_NEXT_RIGHT * b3
        )
        z0 = (
            round_biased(cur)
            if unit_tm
            else round_biased(cur * tmi) * tm
        )
        x_of = t - yy2
        m = (x_of >= 0) & (x_of < w) & ~dead
        noise = jnp.where(m, cur - z0, 0.0)
        o_ref[k] = jnp.clip(z0, 0.0, out_max)
        n_ref[k] = noise
        heads = [hd_ref[k, ch] for ch in range(c)]
        a1, b1, b2, b3 = noise, down(noise, heads), b1, b2
    n1_ref[...] = a1
    d1_ref[...] = b1
    d2_ref[...] = b2
    d3_ref[...] = b3


def wavefront_scan_pallas_carry(
    S: jax.Array,
    w: int,
    c: int,
    tm: float,
    tmi: float,
    out_max: float,
    n_last: jax.Array,
    interpret: bool = False,
    chunk: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Row-blocked wavefront block scan with cross-block noise carry:
    quantize the skewed stream S [T, C*R] of ONE row block given the
    previous block's last-row noise ``n_last`` [W*C] (zeros for the
    top block).  Returns (O [T, C*R], nf [W*C]) — the quantized stream
    and THIS block's last-row noise.

    Semantics mirror ``ops/dither._wavefront_rows`` with
    ``n_last is not None``: the per-step d1 head reads
    nlp[(t+3)*c + ch] and the t=0 carries read nlp[(3-k)*c + ch],
    where nlp is n_last shifted one pixel right."""
    T, cr = S.shape
    r = cr // c
    G = _round_up(-(-cr // _SUB), 128)
    K = chunk or max(
        8, min(128, (8 << 20) // (16 * _SUB * G)) // 8 * 8
    )
    T_pad = -(-T // K) * K
    if T_pad > T or G * _SUB > cr:
        S = jnp.pad(S, ((0, T_pad - T), (0, G * _SUB - cr)))
    S3 = S.reshape(T_pad, _SUB, G)

    # nlp[(j+1)*c + ch] = n_last[j*c + ch]; head streams (f32, SMEM).
    # Built by concatenation — the .at[].set scatter formulation cost
    # ~0.3 ms/block of device time at 8K (profiled round 5).
    nlp = jnp.concatenate(
        [
            jnp.zeros((c,), jnp.float32),
            n_last.astype(jnp.float32),
            jnp.zeros(((T_pad + 3) * c - w * c,), jnp.float32),
        ]
    )
    nlp_r = nlp.reshape(-1, c)
    hd = nlp_r[3 : 3 + T_pad]            # [T_pad, c]
    init = nlp_r[:3]                     # rows 0..2 = nlp[(3-k)c], k=3..1

    out, ns = pl.pallas_call(
        functools.partial(
            _kernel_carry,
            K=K, w=w, c=c, r=r, G=G,
            tm=float(tm), tmi=float(tmi), out_max=float(out_max),
        ),
        grid=(T_pad // K,),
        in_specs=[
            pl.BlockSpec((K, _SUB, G), lambda tau: (tau, 0, 0)),
            pl.BlockSpec(
                (K, c), lambda tau: (tau, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (3, c), lambda tau: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((K, _SUB, G), lambda tau: (tau, 0, 0)),
            pl.BlockSpec((K, _SUB, G), lambda tau: (tau, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, _SUB, G), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, _SUB, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SUB, G), jnp.float32),
            pltpu.VMEM((_SUB, G), jnp.float32),
            pltpu.VMEM((_SUB, G), jnp.float32),
            pltpu.VMEM((_SUB, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(S3, hd, init)
    O = out.reshape(T_pad, _SUB * G)[:T, :cr]
    # This block's last-row noise: lane ch*r + (r-1) at steps
    # 2(r-1) + x, x in [0, w).  Extracted with an exact one-hot
    # matmul — a strided lax.slice (stride r) lowered to a ~0.4
    # ms/block While-gather (profiled round 5); a single-nonzero f32
    # dot at HIGHEST precision is bit-exact and rides the MXU.
    nsf = ns.reshape(T_pad, _SUB * G)
    sel = np.zeros((cr, c), np.float32)
    for ch in range(c):
        sel[ch * r + (r - 1), ch] = 1.0
    nf = jax.lax.dot_general(
        nsf[2 * (r - 1) : 2 * (r - 1) + w, :cr],
        jnp.asarray(sel),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(w * c)
    return O, nf


def wavefront_scan_pallas(
    S: jax.Array,
    w: int,
    c: int,
    tm: float,
    tmi: float,
    out_max: float,
    interpret: bool = False,
    chunk: int | None = None,
) -> jax.Array:
    """Quantize the skewed planar diagonal stream S [T, C*R] (row t =
    diagonal t as C planes of R rows each) -> same-shape float32
    output.  T is padded here to the chunk size; padded steps are
    fully masked by construction (their x offsets fall past every
    row's end)."""
    T, cr = S.shape
    r = cr // c
    # Lane-align G so the per-step rotates never cross a ragged tile
    # edge (the padding lives at the END of the flat planar vector and
    # stays dead-masked).
    G = _round_up(-(-cr // _SUB), 128)
    # Chunk size: in+out blocks double-buffered within ~8 MB VMEM.
    # The K diagonal steps are UNROLLED straight-line code, so K also
    # bounds program size; ``chunk`` overrides (tests use small chunks
    # — interpret mode pays per-op Python overhead on the unroll).
    K = chunk or max(
        8, min(128, (8 << 20) // (16 * _SUB * G)) // 8 * 8
    )
    T_pad = -(-T // K) * K
    if T_pad > T or G * _SUB > cr:
        S = jnp.pad(S, ((0, T_pad - T), (0, G * _SUB - cr)))
    S3 = S.reshape(T_pad, _SUB, G)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            K=K, w=w, c=c, r=r, G=G,
            tm=float(tm), tmi=float(tmi), out_max=float(out_max),
        ),
        grid=(T_pad // K,),
        in_specs=[
            pl.BlockSpec((K, _SUB, G), lambda tau: (tau, 0, 0))
        ],
        out_specs=pl.BlockSpec((K, _SUB, G), lambda tau: (tau, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (T_pad, _SUB, G), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((_SUB, G), jnp.float32),
            pltpu.VMEM((_SUB, G), jnp.float32),
            pltpu.VMEM((_SUB, G), jnp.float32),
            pltpu.VMEM((_SUB, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(S3)
    return out.reshape(T_pad, _SUB * G)[:T, :cr]
