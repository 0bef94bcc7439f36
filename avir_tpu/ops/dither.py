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
