"""Per-op profiler breakdown of wavefront-scan variants (round 4).

The flat-layout rewrite made the skew ~20x cheaper but the scan
~10x slower at 1080p (tools/probe_wavefront.py); this probe compares
scan formulations with the profiler's per-op durations to find the
hot op.

Variants (all identical semantics, 1080p, trunc 0):
  flat        — current: 1-D [h*c] carries, streamed bool mask
  flat_imask  — 1-D carries, in-step mask from a constant yy vector
  rows2d      — [h, c] carries, S materialized [T, h, c] (the
                pre-round-4 layout), streamed [T, h] mask
  planar      — [c, h] carries (y in lanes), S [T, c*h] flat planar

Usage: /opt/venv/bin/python tools/probe_wavefront_ops.py [h w c]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from avir_tpu.ops.dither import (
    W_CUR_RIGHT,
    W_NEXT_CENTER,
    W_NEXT_LEFT,
    W_NEXT_RIGHT,
    round_biased,
)
from avir_tpu.utils.benchmarking import device_ms

h, w, c = (
    (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
    if len(sys.argv) > 3
    else (1080, 1920, 3)
)
T = 2 * (h - 1) + w
rng = np.random.default_rng(5)
img = (rng.random((h, w, c)) * 255.0).astype(np.float32)


def skew_flat(flat):
    R, s = T * c, 2 * c
    P = jnp.pad(flat, ((0, 0), (0, R + s - w * c)))
    D = P.reshape(-1)[: h * R].reshape(h, R)
    return D.reshape(h, T, c).transpose(1, 0, 2).reshape(T, h * c)


def unskew_flat(O):
    R, s = T * c, 2 * c
    Ot = O.reshape(T, h, c).transpose(1, 0, 2).reshape(h, R)
    F = jnp.concatenate(
        [Ot.reshape(-1), jnp.zeros((h * s,), Ot.dtype)]
    )
    return F.reshape(h, R + s)[:, : w * c]


def mask2d():
    x_of = jnp.arange(T)[:, None] - 2 * jnp.arange(h)[None, :]
    return (x_of >= 0) & (x_of < w)  # [T, h]


def scan_flat(flat, in_step_mask, barrier=False, unroll=1,
              pin_layout=False):
    S = skew_flat(flat)
    if barrier:
        # Stop XLA from fusing the skew transpose INTO the scan loop
        # (per-step strided gathers); force S materialized [T, h*c].
        S = jax.lax.optimization_barrier(S)
    if pin_layout:
        # optimization_barrier does NOT pin the LAYOUT: XLA may store
        # S dim-1-major (making the skew transpose free but every
        # loop-step slice strided).  Pin row-major so the transpose
        # happens ONCE as a bulk copy.
        from jax.experimental.layout import Layout
        from jax.experimental.layout import with_layout_constraint

        S = with_layout_constraint(S, Layout((0, 1)))
    zero = jnp.zeros((h * c,), jnp.float32)
    yy2 = jnp.repeat(2 * jnp.arange(h), c)  # [h*c] const

    def down(a):
        return jnp.concatenate([zero[:c], a[: -c]])

    def step(carry, inp):
        n1, n2, n3 = carry
        if in_step_mask:
            s_t, t = inp
            m_t = (yy2 <= t) & (t - yy2 < w)
        else:
            s_t, m_t = inp
        cur = (
            s_t + W_CUR_RIGHT * n1 + W_NEXT_LEFT * down(n1)
            + W_NEXT_CENTER * down(n2) + W_NEXT_RIGHT * down(n3)
        )
        z0 = round_biased(cur)
        noise = jnp.where(m_t, cur - z0, 0.0)
        return (noise, n1, n2), jnp.clip(z0, 0.0, 255.0)

    xs = (
        (S, jnp.arange(T))
        if in_step_mask
        else (S, jnp.repeat(mask2d(), c, axis=1))
    )
    _, O = jax.lax.scan(
        step, (zero, zero, zero), xs, unroll=unroll
    )
    if pin_layout:
        from jax.experimental.layout import Layout
        from jax.experimental.layout import with_layout_constraint

        O = with_layout_constraint(O, Layout((0, 1)))
    if barrier:
        O = jax.lax.optimization_barrier(O)
    return unskew_flat(O)


def scan_rows2d(flat):
    S = skew_flat(flat).reshape(T, h, c)
    M = mask2d()
    zero = jnp.zeros((h, c), jnp.float32)

    def down(a):
        return jnp.concatenate([zero[:1], a[:-1]], axis=0)

    def step(carry, inp):
        n1, n2, n3 = carry
        s_t, m_t = inp
        cur = (
            s_t + W_CUR_RIGHT * n1 + W_NEXT_LEFT * down(n1)
            + W_NEXT_CENTER * down(n2) + W_NEXT_RIGHT * down(n3)
        )
        z0 = round_biased(cur)
        noise = jnp.where(m_t[:, None], cur - z0, 0.0)
        return (noise, n1, n2), jnp.clip(z0, 0.0, 255.0)

    _, O = jax.lax.scan(step, (zero, zero, zero), (S, M))
    return unskew_flat(O.reshape(T, h * c))


def scan_planar2d(flat, unroll=1):
    # ALL data movement as pure 2-D transposes (XLA's tiled transpose
    # kernels), never a 3-D permute with a tiny minor dim:
    #   D [h, T*c] --2-D T--> [T*c, h] --free reshape--> S [T, c, h]
    # Scan slices are [c, h] planar (y in lanes): mask broadcasts
    # along sublanes with no repeat, down() is a 1-lane shift.
    R, s = T * c, 2 * c
    P = jnp.pad(flat, ((0, 0), (0, R + s - w * c)))
    D = P.reshape(-1)[: h * R].reshape(h, R)
    S = D.T.reshape(T, c, h)
    M = mask2d()  # [T, h]
    zero = jnp.zeros((c, h), jnp.float32)

    def down(a):
        return jnp.concatenate([zero[:, :1], a[:, :-1]], axis=1)

    def step(carry, inp):
        n1, n2, n3 = carry
        s_t, m_t = inp
        cur = (
            s_t + W_CUR_RIGHT * n1 + W_NEXT_LEFT * down(n1)
            + W_NEXT_CENTER * down(n2) + W_NEXT_RIGHT * down(n3)
        )
        z0 = round_biased(cur)
        noise = jnp.where(m_t[None, :], cur - z0, 0.0)
        return (noise, n1, n2), jnp.clip(z0, 0.0, 255.0)

    _, O = jax.lax.scan(
        step, (zero, zero, zero), (S, M), unroll=unroll
    )
    Ot = O.reshape(R, h).T  # 2-D transpose back -> [h, T*c]
    F = jnp.concatenate(
        [Ot.reshape(-1), jnp.zeros((h * s,), Ot.dtype)]
    )
    return F.reshape(h, R + s)[:, : w * c]


def scan_planar(flat):
    # S [T, h*c] -> planar [T, c, h]: y in LANES, c in sublanes.
    S = skew_flat(flat).reshape(T, h, c).transpose(0, 2, 1)
    M = mask2d()  # [T, h]
    zero = jnp.zeros((c, h), jnp.float32)

    def down(a):
        return jnp.concatenate([zero[:, :1], a[:, :-1]], axis=1)

    def step(carry, inp):
        n1, n2, n3 = carry
        s_t, m_t = inp
        cur = (
            s_t + W_CUR_RIGHT * n1 + W_NEXT_LEFT * down(n1)
            + W_NEXT_CENTER * down(n2) + W_NEXT_RIGHT * down(n3)
        )
        z0 = round_biased(cur)
        noise = jnp.where(m_t[None, :], cur - z0, 0.0)
        return (noise, n1, n2), jnp.clip(z0, 0.0, 255.0)

    _, O = jax.lax.scan(step, (zero, zero, zero), (S, M))
    return unskew_flat(O.transpose(0, 2, 1).reshape(T, h * c))


flat = jnp.asarray(img.reshape(h, w * c))
variants = {
    "planar2d": jax.jit(scan_planar2d),
    "planar2d_u4": jax.jit(lambda x: scan_planar2d(x, unroll=4)),
    "planar2d_u8": jax.jit(lambda x: scan_planar2d(x, unroll=8)),
    "planar2d_u16": jax.jit(lambda x: scan_planar2d(x, unroll=16)),
    "flat": jax.jit(lambda x: scan_flat(x, False)),
}
ref = None
for name, fn in variants.items():
    try:
        out = np.asarray(fn(flat))
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), f"{name} mismatch"
        ms, ops = device_ms(fn, flat, n=5)
        top = sorted(ops.items(), key=lambda kv: -kv[1])[:6]
        print(f"{name:12s} {ms:8.3f} ms  {ms * 1e3 / T:6.3f} us/step",
              flush=True)
        for op, t in top:
            print(f"    {t:8.3f} ms  {op[:90]}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} ERROR {type(e).__name__}: {e}"[:300],
              flush=True)
