"""Ablate the shift-ring gamma kernel to locate its measured slowness.

probe_gpre.py measured the ring route at 2.17 ms kernel time on the 8K
headline vs 1.216 for the in-kernel route, far above the ~1.0 ms model.
This probe times stripped variants (wrong results, same structure):

  full     — the real kernel
  noshift  — shift copy removed
  nommH    — H matmuls removed (V + epilogue on truncated acc)
  nomm     — all matmuls removed (poly + scratch writes + epilogue)
  nopoly   — poly replaced by a cheap cast (DMA + scratch + matmuls)
  nowrite  — poly runs, scratch never written (matmuls read stale ring)

Run on the real chip.  Results go to docs/perf_analysis.md.
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avir_tpu.ops.banded import block_banded
from avir_tpu.ops.lanes import lane_block_banded
from avir_tpu.ops.pallas.fused_kernel import (
    _GAMMA_IN_BITS,
    _finish,
    _int8_limbs,
    _int8_passes,
    _int8_x_shift,
    _linear_to_srgb,
    _srgb_to_linear13_u8poly,
)
from avir_tpu.ops.pallas.fused_ring_kernel import n_preload, uniform_delta
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms


def _kernel(
    offr32_ref, offh128_ref, x_ref,
    tvh_ref, tvl_ref, thh_ref, thl_ref,
    out_ref, ring_hi, ring_lo,
    *, delta, win_v, n_pre, c, alpha_index, in_gamma_mult,
    out_gamma_mult, qv_shift, qh_shift, x_shift, chunk_rel, win_c,
    shift=True, mm="both", poly=True, write=True,
):
    vb = pl.program_id(1)

    if poly:
        xq = _srgb_to_linear13_u8poly(
            x_ref[...].astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(in_gamma_mult),
            c, alpha_index,
        )
    else:
        xq = x_ref[...].astype(jnp.int32) * 16
    hi, lo = _int8_limbs(xq)

    if write:
        @pl.when(vb < n_pre)
        def _():
            ring_hi[pl.ds(vb * delta, delta)] = hi
            ring_lo[pl.ds(vb * delta, delta)] = lo

    if shift:
        @pl.when(vb >= n_pre + 1)
        def _():
            ring_hi[: win_v - delta] = ring_hi[delta:]
            ring_lo[: win_v - delta] = ring_lo[delta:]

    @pl.when(vb >= n_pre)
    def _():
        if write:
            ring_hi[win_v - delta :] = hi
            ring_lo[win_v - delta :] = lo
        if mm == "both":
            acc = _int8_passes(
                (ring_hi[...], ring_lo[...]),
                tvh_ref, tvl_ref, thh_ref, thl_ref,
                order="vh", qv_shift=qv_shift, qh_shift=qh_shift,
                x_shift=x_shift, gamma=True, c=c,
                alpha_index=alpha_index, in_gamma_mult=in_gamma_mult,
                chunk_rel=chunk_rel, win_c=win_c,
            )
        elif mm == "vonly":
            a = jax.lax.dot_general(
                tvh_ref[0], ring_hi[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = a[:, : out_ref.shape[1]].astype(jnp.float32) * (
                1.0 / 2**qv_shift
            )
        else:  # none
            acc = (
                ring_hi[: out_ref.shape[0], : out_ref.shape[1]]
                .astype(jnp.float32)
            )
        acc = _linear_to_srgb(acc, c, alpha_index)
        if out_gamma_mult != 0.0:
            acc = acc * jnp.float32(out_gamma_mult)
        _finish(acc, out_ref, out_max=255.0, trunc_bits=0, scale=1.0,
                round_mode="biased")


def run_variant(name, vop, lop, x, **flags):
    rows, lanes = x.shape
    c = lop.c
    Bv, Tv, Wv = vop.taps_hi.shape
    Bh = lop.taps_hi.shape[0] if lop.ctaps_q1 is None else (
        lop.ctaps_q1.shape[0]
    )
    delta = uniform_delta(vop.offs)
    n_pre = n_preload(Wv, delta)
    qv_shift, qh_shift = vop.q_shift, lop.q_shift
    x_shift = _int8_x_shift(
        vop.l1_max, qv_shift + _GAMMA_IN_BITS, in_max=1.0
    )
    th_a, th_b = lop.ctaps_q1, lop.ctaps_q0
    if th_a is None:
        th_a, th_b = lop.taps_q1, lop.taps_q0
    chunked = th_a.ndim == 4
    chunk_rel = lop.chunk_rel if chunked else None
    win_c = lop.win_c if chunked else 0
    WC = Wv  # unused
    TC = th_a.shape[-1] if not chunked else lop.tile * c
    WCl = lop.taps_hi.shape[1]

    need_rows = vop.n_in_pad
    need_lanes = lop.lanes_pad
    x = jnp.pad(
        x,
        (
            (vop.pad_top, max(need_rows - vop.pad_top - rows, 0)),
            (0, max(need_lanes - lanes, 0)),
        ),
    )
    offs = np.asarray(vop.offs)
    offr = np.concatenate(
        [offs[0] + delta * np.arange(n_pre), offs + (Wv - delta)]
    )
    grid = (Bh, Bv + n_pre)
    if chunked:
        n_ch = th_a.shape[1]
        th_spec = pl.BlockSpec(
            (1, n_ch, win_c, 128), lambda hb, vb, *_: (hb, 0, 0, 0)
        )
    else:
        th_spec = pl.BlockSpec(
            (1, WCl, TC), lambda hb, vb, *_: (hb, 0, 0)
        )

    def vmap_idx(hb, vb, *_):
        return (jnp.maximum(vb - n_pre, 0), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(delta), pl.Element(WCl)),
                lambda hb, vb, offr32, offh128: (
                    offr32[vb] * 32,
                    offh128[hb] * 128,
                ),
            ),
            pl.BlockSpec((1, Tv, Wv), vmap_idx),
            pl.BlockSpec((1, Tv, Wv), vmap_idx),
            th_spec,
            th_spec,
        ],
        out_specs=pl.BlockSpec(
            (Tv, TC),
            lambda hb, vb, *_: (jnp.maximum(vb - n_pre, 0), hb),
        ),
        scratch_shapes=[
            pltpu.VMEM((Wv, WCl), jnp.int8),
            pltpu.VMEM((Wv, WCl), jnp.int8),
        ],
    )
    f = jax.jit(
        lambda xx: pl.pallas_call(
            functools.partial(
                _kernel,
                delta=delta, win_v=Wv, n_pre=n_pre, c=c,
                alpha_index=-1, in_gamma_mult=1.0 / 255.0,
                out_gamma_mult=255.0,
                qv_shift=qv_shift, qh_shift=qh_shift, x_shift=x_shift,
                chunk_rel=chunk_rel, win_c=win_c, **flags,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (Bv * Tv, Bh * TC), jnp.uint8
            ),
        )(
            offr // 32, lop.offs_l // 128, xx,
            vop.taps_q1, vop.taps_q0, th_a, th_b,
        )
    )
    jax.block_until_ready(f(x))
    ms, _ = device_ms(lambda: f(x))
    print(f"{name:10s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, (4320, 7680 * 3), dtype=np.uint8)
    plan = build_resize_plan(
        7680, 4320, 1920, 1080, 3, np.uint8, np.uint8,
        use_srgb_gamma=True,
    )
    vop = block_banded(plan.v.op, uniform=True)
    lop = lane_block_banded(plan.h.op, 3)
    x = jnp.asarray(src)
    run_variant("full", vop, lop, x)
    run_variant("noshift", vop, lop, x, shift=False)
    run_variant("nommH", vop, lop, x, mm="vonly")
    run_variant("nomm", vop, lop, x, mm="none")
    run_variant("nopoly", vop, lop, x, poly=False)
    run_variant("nowrite", vop, lop, x, write=False)
    run_variant("bare", vop, lop, x, poly=False, write=False,
                shift=False, mm="none")
    return 0


if __name__ == "__main__":
    sys.exit(main())
