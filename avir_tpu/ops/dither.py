"""Output-conditioning (dither) ops, device side.

Re-derivations of the reference's ditherers:
  - default: round + clamp (+ bit-depth truncation via TrMul),
    CImageResizerDithererDefINL (/root/reference/avir.h:4351-4427).
  - error diffusion: CImageResizerDithererErrdINL
    (/root/reference/avir.h:4440-4525) with its machine-optimized
    weights (current row right 0.364842; next row left 0.207305,
    center 0.364842, right 0.063011).

Error diffusion is genuinely recursive along the scan direction (the
reference serializes it onto one thread, avir.h:5047-5068).  Here it is a
``lax.scan`` over rows wrapping a ``lax.scan`` over pixels, vectorized
across channels and across any batch dimension — the only sequential op
in the framework, kept semantically exact rather than approximated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

W_CUR_RIGHT = 0.364842
W_NEXT_LEFT = 0.207305
W_NEXT_CENTER = 0.364842
W_NEXT_RIGHT = 0.063011


def round_biased(v: jax.Array) -> jax.Array:
    """The reference's typecast round: half away from zero via truncation
    (avir.h:130-135)."""
    return jnp.where(v >= 0, jnp.floor(v + 0.5), -jnp.floor(0.5 - v))


def trunc_mul(trunc_bits: int, out_max: float) -> float:
    out_range = int(out_max)
    return out_max / (out_range >> trunc_bits) if trunc_bits > 0 else 1.0


def default_dither_jnp(
    v: jax.Array, trunc_bits: int, out_max: float
) -> jax.Array:
    """Round + clamp (+ optional bit-depth truncation),
    avir.h:4392-4419.  Non-negative-range rounding is plain floor(v+.5)."""
    tm = trunc_mul(trunc_bits, out_max)
    if trunc_bits > 0:
        v = jnp.floor(v / tm + 0.5) * tm
    else:
        v = jnp.floor(v + 0.5)
    return jnp.clip(v, 0.0, out_max)


def errdiff_dither_jnp(
    img: jax.Array, trunc_bits: int, out_max: float
) -> jax.Array:
    """Error-diffusion dither of ``img`` [H, W, C] (float32) →
    quantized float32 in [0, out_max].

    Exact scan-ordered semantics of the reference (avir.h:4485-4525):
    noise at pixel (y, p, ch) diffuses to (y, p+1)·0.364842,
    (y+1, p−1)·0.207305, (y+1, p)·0.364842, (y+1, p+1)·0.063011, same
    channel.
    """
    h, w, c = img.shape
    tm = jnp.float32(trunc_mul(trunc_bits, out_max))
    tmi = jnp.float32(1.0) / tm
    out_max = jnp.float32(out_max)

    def quant(v):
        return round_biased(v * tmi) * tm

    def pixel_step(noise_prev, val):
        # val: [C] current pixel (already incl. prev-row diffusion).
        cur = val + noise_prev * W_CUR_RIGHT
        z0 = quant(cur)
        noise = cur - z0
        return noise, (jnp.clip(z0, 0.0, out_max), noise)

    def row_step(carry_next, row):
        # carry_next: [W, C] diffusion accumulated for this row.
        row = row + carry_next
        _, (out_row, noise) = jax.lax.scan(
            pixel_step, jnp.zeros((c,), img.dtype), row
        )
        # Build next row's diffusion from this row's noise.
        nxt = noise * W_NEXT_CENTER
        nxt = nxt.at[: w - 1].add(noise[1:] * W_NEXT_LEFT)
        nxt = nxt.at[1:].add(noise[: w - 1] * W_NEXT_RIGHT)
        return nxt, out_row

    _, out = jax.lax.scan(row_step, jnp.zeros((w, c), img.dtype), img)
    return out


# Row-block size selection for the wavefront: the skewed scan buffers
# cost ~(W + 2R) * nb * R * C floats (R = rows per block, nb = H/R
# blocks).  For wide images R = H (one block, W + 2H - 2 steps, the
# fewest possible) keeps the blowup factor (W + 2H)/W modest; for
# TALL-NARROW images that factor is quadratic-in-H waste (ADVICE r3:
# a 16384x64 image would skew gigabytes), so rows are processed in
# blocks with the last row's noise carried between blocks — memory
# turns linear at the cost of more, smaller scan steps
# ((H/R)(W + 2R) vs W + 2H).
_WAVEFRONT_BLOWUP = 8


def _skew_rows(block: jax.Array, w: int, c: int):
    """[R_rows, W*C] flat interleaved -> skewed planar diagonals
    S [T, C*R_rows] (row t = diagonal t as C planes of R_rows each),
    gather-free: the pad + flat-reshape trick shifts row y right by
    2c*y (one linear copy), then ONE pure 2-D transpose (XLA's tiled
    transpose kernel) reaches the planar layout."""
    r = block.shape[0]
    T = 2 * (r - 1) + w
    R = T * c
    s = 2 * c
    P = jnp.pad(block, ((0, 0), (0, R + s - w * c)))  # [r, R+s]
    D = P.reshape(-1)[: r * R].reshape(r, R)
    return D.T.reshape(T, c * r)


def _unskew_rows(O2: jax.Array, r: int, w: int, c: int):
    """Inverse of ``_skew_rows``: O [T, C*R_rows] -> [R_rows, W*C]."""
    T = 2 * (r - 1) + w
    R = T * c
    s = 2 * c
    Ot = O2.reshape(R, r).T  # [r, R]
    F = jnp.concatenate(
        [Ot.reshape(-1), jnp.zeros((r * s,), Ot.dtype)]
    )
    return F.reshape(r, R + s)[:, : w * c]


def _wavefront_rows(
    block: jax.Array,
    n_last,
    tm: jax.Array,
    tmi: jax.Array,
    out_max: jax.Array,
    unroll: int,
    w: int,
    c: int,
):
    """Wavefront-quantize one row block [R, W*C] (FLAT interleaved)
    given the previous block's last-row noise ``n_last`` [W*C] (or
    None for the top of the image).  Returns (quantized block,
    this block's last-row noise [W*C]).

    Layout note (measured, tools/probe_wavefront.py): every
    materialized array here is 2-D with a LARGE minor dim.  The
    original [.., .., C] formulation spent 73-90% of its time in the
    skew/unskew copies because C-minor arrays tile-pad 3 -> 128 lanes
    on TPU (42x the bytes); the flat layout removed ~90% of the
    wavefront's runtime."""
    r = block.shape[0]
    T = 2 * (r - 1) + w
    R = T * c
    s = 2 * c

    # Skew (GATHER-FREE): row y shifted right by 2c*y via the pad +
    # flat-reshape trick — padding each row to width R + 2c and
    # re-viewing the flat buffer with row stride R makes every row
    # start 2c lanes later than the previous one:
    #   D[y, j] = P_flat[y*R + j] = P[y, j - 2c*y]   (zeros when the
    #   index crosses into the previous row's zero tail).
    # Then ONE pure 2-D transpose (XLA's tiled transpose kernel) and a
    # free reshape give the PLANAR scan layout S[t] = [c, r] (y in
    # lanes).  Measured (tools/probe_wavefront_ops.py): the per-row
    # jnp.roll skew lowered to gathers, and any 3-D permute with the
    # tiny c minor dim ran ~10 GB/s — both formulations were 3-12x
    # slower end to end than this one.
    S = _skew_rows(block, w, c).reshape(T, c, r)

    # Validity mask, precomputed and streamed with S; broadcasts over
    # the c sublanes in-step, no repeat.
    x_of = jnp.arange(T)[:, None] - 2 * jnp.arange(r)[None, :]
    M = (x_of >= 0) & (x_of < w)  # [T, r]

    emit_last = n_last is not None
    if emit_last:
        # nlp[(j+1)*c + ch] = n_last[j*c + ch] (zero outside): row 0
        # of this block reads the previous block's noise at columns
        # x-1 / x / x+1.  The shifted-carry scheme below gathers the
        # head for step t+1's d1 while computing step t, so indices
        # reach (t+4)*c.
        nlp = jnp.zeros(((T + 4) * c,), block.dtype)
        nlp = nlp.at[c : (w + 1) * c].set(n_last)

    def down(a, head):  # y -> y-1 alignment; ``head`` fills row 0
        return jnp.concatenate([head, a[:, :-1]], axis=1)

    zhead = jnp.zeros((c, 1), block.dtype)

    # Shifted-carry scheme: instead of re-shifting three historical
    # noise vectors every step (3 shifts), carry the ALREADY-shifted
    # values — d_k at step t equals down(noise(t-k)), and d_{k+1} of
    # the next step is just this step's d_k.  One shift per step,
    # bit-identical sums.
    def step(carry, inp):
        n1, d1, d2, d3 = carry  # noise(t-1); down(noise(t-1..t-3))
        if emit_last:
            s_t, m_t, t = inp
        else:
            s_t, m_t = inp
        cur = (
            s_t
            + W_CUR_RIGHT * n1      # (y, x-1)
            + W_NEXT_LEFT * d1      # (y-1, x+1)
            + W_NEXT_CENTER * d2    # (y-1, x)
            + W_NEXT_RIGHT * d3     # (y-1, x-1)
        )
        z0 = round_biased(cur * tmi) * tm
        # Out-of-image cells must contribute ZERO noise (the reference
        # discards diffusion past the row ends, avir.h:4504-4524).
        noise = jnp.where(m_t[None, :], cur - z0, 0.0)
        out_t = jnp.clip(z0, 0.0, out_max)
        if emit_last:
            # Head for d1 used at step t+1: down(n(t)) row 0 reads the
            # previous block's noise at nlp index t+3.
            h = jax.lax.dynamic_slice(
                nlp, ((t + 3) * c,), (c,)
            )[:, None]
        else:
            h = zhead
        ys = (out_t, noise[:, -1]) if emit_last else out_t
        return (noise, down(noise, h), d1, d2), ys

    zero = jnp.zeros((c, r), block.dtype)
    if emit_last:
        # Initial shifted carries: rows y >= 1 start from zero noise,
        # but row 0's neighbors live in the previous block — d_k(t=0)
        # head = nlp[3 - k].
        init = tuple(
            down(zero, nlp[(3 - k) * c : (4 - k) * c, None])
            for k in (1, 2, 3)
        )
    else:
        init = (zero, zero, zero)
    xs = (S, M, jnp.arange(T)) if emit_last else (S, M)
    # ``unroll``: amortizes the While-loop iteration overhead across
    # several diagonals per trip (measured: tools/probe_wavefront.py).
    _, ys = jax.lax.scan(
        step, (zero,) + init, xs, unroll=unroll
    )
    if emit_last:
        O, ns = ys  # ns: [T, c]
        nf = ns[2 * (r - 1) : 2 * (r - 1) + w].reshape(w * c)
    else:
        O, nf = ys, None
    out = _unskew_rows(O.reshape(T, c * r), r, w, c)
    return out, nf


def errdiff_dither_wavefront_jnp(
    img: jax.Array, trunc_bits: int, out_max: float,
    unroll: int = 8,
    block_rows: int | None = None,
    engine: str = "auto",
    interpret: bool = False,
    pallas_chunk: int | None = None,
) -> jax.Array:
    """Anti-diagonal WAVEFRONT formulation of the error-diffusion
    recurrence — same weights and scan-order dependency structure as
    ``errdiff_dither_jnp``, restructured for the VPU.

    Pixel (y, x) depends on (y, x-1), (y-1, x-1), (y-1, x), and
    (y-1, x+1); along the anti-diagonal index t = 2y + x those sources
    live at t-1, t-3, t-2, and t-1 — so ALL pixels on one diagonal are
    mutually independent and the image quantizes in W + 2H - 2 scan
    steps of [H, C]-vector work instead of H*W sequential pixel steps
    (the nested-scan variant above).

    Tall-narrow images (2H >> W) take the ROW-BLOCKED wavefront
    automatically (``_WAVEFRONT_BLOWUP``): blocks of ``block_rows``
    rows scan in sequence with the last row's noise carried across,
    keeping memory linear in the image size.  ``block_rows`` overrides
    the auto choice (W-sized blocks balance step count ~4H against
    buffer width for extreme aspect ratios).

    Exactness: the diffusion sums are reassociated (one fused sum per
    pixel instead of the serial carry accumulation), so results can
    differ from the sequential formulation by float-rounding of the
    diffused noise — bounded well under 1 output LSB; tests gate both
    variants against the f64 host oracle at <= 1 LSB.  The blocked and
    single-block paths compute bit-identical pixels (same sums, same
    order).

    ``engine``: "auto" (Pallas diagonal-scan kernel on TPU backends,
    lax.scan elsewhere), "pallas" (force the kernel), or "xla" (force
    the lax.scan formulation).  ``interpret=True`` implies the Pallas
    engine (interpreter mode — the CPU-mesh test configuration) and
    conflicts with engine="xla".  The row-blocked route runs the
    carry-kernel variant (``wavefront_scan_pallas_carry``) under the
    same engine rules: the previous block's last-row noise streams
    into the next block's kernel as SMEM head scalars."""
    if engine not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown wavefront engine {engine!r}")
    if interpret and engine == "xla":
        raise ValueError("interpret=True implies the Pallas engine")
    h, w, c = img.shape
    out_max_py = float(out_max)
    tm_py = trunc_mul(trunc_bits, out_max_py)
    tm = jnp.float32(tm_py)
    tmi = jnp.float32(1.0) / tm
    out_max = jnp.float32(out_max)

    # Engine selection, shared by the block-size policy and both
    # dispatch sites below (keep them in lockstep).
    use_pallas = engine == "pallas" or interpret or (
        engine == "auto"
        and jax.default_backend() not in ("cpu", "gpu")
    )
    if block_rows is None:
        if use_pallas:
            # Pallas carry-kernel route: per-step latency is LINEAR in
            # the planar vector width G = roundup(C*R/8, 128) up to
            # G = 256 and ~3x worse beyond (VMEM spilling of the four
            # carry vectors — measured, tools/probe_wavefront_g.py:
            # 0.146/0.298/0.87/1.92 us/step at G = 128/256/384/896).
            # Total scan cost ~ (H/R)(W + 2R) * t_step(G(R)) is
            # minimized by the LARGEST R that keeps G at the 128-lane
            # floor: R = 1024/C (8K errdiff: 64 -> ~18 ms modeled).
            # Blocks also shrink the skew-transpose blowup to
            # (W + 2R)/W.
            block_rows = max(8, min(h, 1024 // c))
        elif 2 * h <= (_WAVEFRONT_BLOWUP - 1) * w:
            block_rows = h  # wide image: one block, fewest steps
        else:
            block_rows = max(8, ((_WAVEFRONT_BLOWUP - 1) * w) // 2)
    block_rows = min(block_rows, h)

    flat = img.reshape(h, w * c)
    if block_rows >= h:
        # The Pallas kernel (ops/pallas/wavefront_kernel.py) keeps
        # the noise carries in VMEM scratch and streams diagonal
        # chunks, removing the XLA While loop's per-step slice/update
        # overhead (measured ~4x the VPU work at 8K).  lax.scan
        # remains the portable path (CPU/GPU backends).
        if use_pallas:
            from .pallas.wavefront_kernel import wavefront_scan_pallas

            S = _skew_rows(flat.astype(jnp.float32), w, c)
            # tmi must be the SAME f32 value the scan path computes
            # (jnp.float32(1.0)/tm) — a float64 reciprocal differs by
            # 1 ulp for some trunc configs and can flip round_biased
            # at half-step boundaries, breaking engine parity.
            tmi_f32 = float(np.float32(1.0) / np.float32(tm_py))
            O = wavefront_scan_pallas(
                S, w, c, tm_py, tmi_f32, out_max_py,
                interpret=interpret, chunk=pallas_chunk,
            )
            return _unskew_rows(O, h, w, c).reshape(h, w, c)
        out, _ = _wavefront_rows(
            flat, None, tm, tmi, out_max, unroll, w, c
        )
        return out.reshape(h, w, c)

    nb = -(-h // block_rows)
    pad = nb * block_rows - h
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    blocks = flat.reshape(nb, block_rows, w * c)

    if use_pallas:
        # Row-blocked Pallas route (VERDICT r4 item 3): each block
        # runs the carry kernel (ops/pallas/wavefront_kernel.py) with
        # the previous block's last-row noise streamed in as SMEM
        # head scalars.  Smaller blocks shrink BOTH the per-step
        # planar vector G = C*R/8 (the wide-vector VMEM streaming
        # that bounds the full-image kernel) and the skew-transpose
        # blowup ((W + 2R)/W instead of (W + 2H)/W).  The block chain
        # is a PYTHON loop (nb is small and static): under lax.scan
        # the xs-slice / ys-stack machinery and unfused copies around
        # the kernel cost more device time than the kernel itself
        # (profiled at 8K: ~22 of 34 ms).
        from .pallas.wavefront_kernel import wavefront_scan_pallas_carry

        tmi_f32 = float(np.float32(1.0) / np.float32(tm_py))
        rb = block_rows
        n_last = jnp.zeros((w * c,), jnp.float32)
        outs = []
        for b in range(nb):
            s_b = _skew_rows(
                flat[b * rb : (b + 1) * rb].astype(jnp.float32),
                w, c,
            )
            o_b, n_last = wavefront_scan_pallas_carry(
                s_b, w, c, tm_py, tmi_f32, out_max_py, n_last,
                interpret=interpret, chunk=pallas_chunk,
            )
            outs.append(_unskew_rows(o_b, rb, w, c))
        O = jnp.concatenate(outs, axis=0)
        return O.reshape(nb * block_rows, w, c)[:h]

    def blk_step(n_last, block):
        out_b, n_next = _wavefront_rows(
            block, n_last, tm, tmi, out_max, unroll, w, c
        )
        return n_next, out_b

    _, O = jax.lax.scan(
        blk_step, jnp.zeros((w * c,), jnp.float32), blocks
    )
    return O.reshape(nb * block_rows, w, c)[:h]
