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


def errdiff_dither_wavefront_jnp(
    img: jax.Array, trunc_bits: int, out_max: float,
    unroll: int = 8,
) -> jax.Array:
    """Anti-diagonal WAVEFRONT formulation of the error-diffusion
    recurrence — same weights and scan-order dependency structure as
    ``errdiff_dither_jnp``, restructured for the VPU.

    Pixel (y, x) depends on (y, x-1), (y-1, x-1), (y-1, x), and
    (y-1, x+1); along the anti-diagonal index t = 2y + x those sources
    live at t-1, t-3, t-2, and t-1 — so ALL pixels on one diagonal are
    mutually independent and the image quantizes in W + 2H - 2 scan
    steps of [H, C]-vector work instead of H*W sequential pixel steps
    (the nested-scan variant above).  The skewed buffer costs
    ~(W + 2H) * H * C floats of HBM — fine up to 8K on a 16 GB chip.

    Exactness: the diffusion sums are reassociated (one fused sum per
    pixel instead of the serial carry accumulation), so results can
    differ from the sequential formulation by float-rounding of the
    diffused noise — bounded well under 1 output LSB; tests gate both
    variants against the f64 host oracle at <= 1 LSB."""
    h, w, c = img.shape
    tm = jnp.float32(trunc_mul(trunc_bits, out_max))
    tmi = jnp.float32(1.0) / tm
    out_max = jnp.float32(out_max)
    T = 2 * (h - 1) + w

    # Skew: S[t, y] = img[y, t - 2y] (invalid cells zero).
    shifts = 2 * jnp.arange(h)
    padded = jnp.pad(img, ((0, 0), (0, T - w), (0, 0)))
    rolled = jax.vmap(lambda row, s: jnp.roll(row, s, axis=0))(
        padded, shifts
    )
    S = rolled.transpose(1, 0, 2)  # [T, h, c]
    tt = jnp.arange(T)[:, None]
    yy = jnp.arange(h)[None, :]
    x_of = tt - 2 * yy
    M = (x_of >= 0) & (x_of < w)  # [T, h] validity

    def down(a):  # y -> y-1 alignment (row y reads row y-1's noise)
        return jnp.concatenate(
            [jnp.zeros((1, c), a.dtype), a[:-1]], axis=0
        )

    def step(carry, inp):
        n1, n2, n3 = carry  # noise at t-1, t-2, t-3: [h, c]
        s_t, m_t = inp
        cur = (
            s_t
            + W_CUR_RIGHT * n1          # (y, x-1)
            + W_NEXT_LEFT * down(n1)    # (y-1, x+1)
            + W_NEXT_CENTER * down(n2)  # (y-1, x)
            + W_NEXT_RIGHT * down(n3)   # (y-1, x-1)
        )
        z0 = round_biased(cur * tmi) * tm
        # Out-of-image cells must contribute ZERO noise (the reference
        # discards diffusion past the row ends, avir.h:4504-4524).
        noise = jnp.where(m_t[:, None], cur - z0, 0.0)
        return (noise, n1, n2), jnp.clip(z0, 0.0, out_max)

    zero = jnp.zeros((h, c), img.dtype)
    # ``unroll``: the scan is latency-bound (each of the W+2H-2 steps
    # does only [H, C] of VPU work but pays the XLA While-loop
    # iteration overhead); unrolling amortizes that overhead across
    # several diagonals per loop trip (measured on v5e:
    # tools/probe_wavefront.py, docs/perf_analysis.md).
    _, O = jax.lax.scan(
        step, (zero, zero, zero), (S, M), unroll=unroll
    )
    # Unskew: out[y, x] = O[2y + x, y].
    Ot = O.transpose(1, 0, 2)  # [h, T, c]
    out = jax.vmap(lambda row, s: jnp.roll(row, -s, axis=0))(
        Ot, shifts
    )
    return out[:, :w]
