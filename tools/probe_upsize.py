"""Upsize perf ablation (4K->8K / 1080p->4K u8 RGB, int8 fused-hv).

The 8K-downsize kernel got a full floor/ablation analysis
(docs/perf_analysis.md); this probe produces the same for upsizing,
where the fused int8 route measures ~1.64 ms at 4K->8K vs a ~170 us
pure-traffic floor.  Hypothesis to test: upsizing is bound by
per-OUTPUT-pixel work (inter-pass requant + epilogue round/clamp/pack
on 100 Mpx) rather than matmul MACs or DMA.

Variants (standalone kernels at the real fused-hv grid/window shapes):
  dma      — fetch the window, write a u8 slice of it (DMA floor)
  epi      — dma + the real epilogue arithmetic on a broadcast f32
  mmH      — dma + H matmuls (2 limbs) + cheap store
  mmHV     — dma + H + V matmuls (4 matmuls) + cheap store
  requant  — dma + H matmuls + 15-bit requant/limb-split + V + epilogue
             == the full int8 pipeline re-assembled here
  full     — apply_fused_pallas int8 hv (the production kernel)

Run on the real chip; record in docs/perf_analysis.md.
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
from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    ("1080p->4K", 1920, 1080, 3840, 2160),
    ("4K->8K", 3840, 2160, 7680, 4320),
]


def variant(name, plan, vop, lop, x, stage):
    """Standalone kernel at the fused-hv grid: H pass on the raw u8
    window, V pass on the H output, epilogue to u8."""
    c = lop.c
    Bv, Tv, Wv = vop.taps_q1.shape
    Bh, WC, TC = lop.taps_q1.shape
    grid = (Bv, Bh)  # hb innermost for hv order (V taps resident)

    qh, qv = lop.q_shift, vop.q_shift

    def kernel(offv32, offh128, x_ref, thh, thl, tvh, tvl, o_ref):
        xw = x_ref[...]
        if stage == "dma":
            o_ref[...] = xw[: o_ref.shape[0], : o_ref.shape[1]].astype(
                jnp.uint8
            )
            return
        if stage == "epi":
            acc = (
                xw[: o_ref.shape[0], : o_ref.shape[1]]
                .astype(jnp.int32).astype(jnp.float32)
            )
            o_ref[...] = jnp.clip(
                acc + 0.5, 0.0, 255.0
            ).astype(jnp.int32).astype(jnp.uint8)
            return
        xs = (xw.astype(jnp.int32) - 128).astype(jnp.int8)
        # H pass: [Wv, WC] @ [WC, TC] contracting lanes.
        a1 = jax.lax.dot_general(
            xs, thh[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        a0 = jax.lax.dot_general(
            xs, thl[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if stage == "mmH":
            o_ref[...] = (
                (a1 + a0)[: o_ref.shape[0], : o_ref.shape[1]]
                .astype(jnp.uint8)
            )
            return
        y = a1.astype(jnp.float32) + a0.astype(jnp.float32) * (
            1.0 / 128.0
        )
        # requant to 15-bit limbs (the production inter-pass step)
        y15 = jnp.round(y * jnp.float32(2.0 ** (-qh) * 4.0))
        hi = jnp.floor(y15 * (1.0 / 128.0) + 0.5)
        lo = y15 - hi * 128.0
        if stage == "mmHV":
            hi8 = hi.astype(jnp.int8)
            b1 = jax.lax.dot_general(
                tvh[0], hi8,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            b0 = jax.lax.dot_general(
                tvl[0], hi8,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o_ref[...] = (b1 + b0)[
                : o_ref.shape[0], : o_ref.shape[1]
            ].astype(jnp.uint8)
            return
        # full re-assembly: both V limb matmuls on both x limbs' sum
        hi8 = hi.astype(jnp.int8)
        lo8 = lo.astype(jnp.int8)
        b = None
        for t in (tvh[0], tvl[0]):
            for xx, s in ((hi8, 128.0), (lo8, 1.0)):
                m = jax.lax.dot_general(
                    t, xx,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * s
                b = m if b is None else b + m
        acc = b * jnp.float32(2.0 ** (qh - qv) / 4.0 / 128.0)
        o_ref[...] = jnp.clip(
            acc[: o_ref.shape[0], : o_ref.shape[1]] + 0.5, 0.0, 255.0
        ).astype(jnp.int32).astype(jnp.uint8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(Wv), pl.Element(WC)),
                lambda vb, hb, offv32, offh128: (
                    offv32[vb] * 32,
                    offh128[hb] * 128,
                ),
            ),
            pl.BlockSpec((1, WC, TC), lambda vb, hb, *_: (hb, 0, 0)),
            pl.BlockSpec((1, WC, TC), lambda vb, hb, *_: (hb, 0, 0)),
            pl.BlockSpec((1, Tv, Wv), lambda vb, hb, *_: (vb, 0, 0)),
            pl.BlockSpec((1, Tv, Wv), lambda vb, hb, *_: (vb, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (Tv, TC), lambda vb, hb, *_: (vb, hb)
        ),
    )
    rows, lanes = x.shape
    xp = jnp.pad(
        x,
        (
            (0, max(vop.n_in_pad - rows, 0)),
            (0, max(lop.lanes_pad - lanes, 0)),
        ),
    )
    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (Bv * Tv, Bh * TC), jnp.uint8
            ),
        )(
            vop.offs // 32, lop.offs_l // 128, a,
            lop.taps_q1, lop.taps_q0, vop.taps_q1, vop.taps_q0,
        )
    )
    jax.block_until_ready(f(xp))
    ms, _ = device_ms(lambda: f(xp))
    print(f"  {name:8s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(11)
    for cname, sw, sh, nw, nh in CONFIGS:
        src = rng.integers(0, 256, (sh, sw * 3), dtype=np.uint8)
        plan = build_resize_plan(
            sw, sh, nw, nh, 3, np.uint8, np.uint8
        )
        vop = block_banded(plan.v.op)
        lop = lane_block_banded(plan.h.op, 3)
        Bv, Tv, Wv = vop.taps_q1.shape
        Bh, WC, TC = lop.taps_q1.shape
        print(
            f"{cname}: grid {Bv}x{Bh}, win [{Wv},{WC}], "
            f"out tile [{Tv},{TC}]",
            flush=True,
        )
        x = jnp.asarray(src)
        d = jax.device_put(src)
        full = jax.jit(
            lambda a: apply_fused_pallas(
                vop, lop, a, "int8", "int8", out_dtype=jnp.uint8,
                out_max=255.0, order="hv",
            )[: plan.new_h, : plan.new_w * 3]
        )
        jax.block_until_ready(full(d))
        base = np.asarray(full(d))
        ms, _ = device_ms(lambda: full(d))
        print(f"  {'full':8s} {ms:7.3f} ms", flush=True)
        if "sweep" not in sys.argv:
            for stage in ("dma", "epi", "mmH", "mmHV", "requant"):
                variant(stage, plan, vop, lop, x, stage)

        # Tile sweep: upsize windows are tiny ([128, 384]) so the DMA
        # runs at poor efficiency with ~4x overlap; bigger tiles
        # lengthen the fetch rows and amortize the filter overhang.
        from avir_tpu.ops.pallas.fused_kernel import fused_viable

        for tv, th in (
            (192, 768), (256, 768), (384, 768), (192, 896),
            (448, 768), (192, 1152),
        ):
            try:
                vop2 = block_banded(plan.v.op, tile=tv)
                lop2 = lane_block_banded(plan.h.op, 3, tile=th)
            except Exception as e:
                print(f"  tile {tv}x{th}: build fail {e}", flush=True)
                continue
            if not fused_viable(vop2, lop2, "hv", int8=True):
                print(f"  tile {tv}x{th}: not viable (VMEM)", flush=True)
                continue
            f2 = jax.jit(
                lambda a, v=vop2, l=lop2: apply_fused_pallas(
                    v, l, a, "int8", "int8", out_dtype=jnp.uint8,
                    out_max=255.0, order="hv",
                )[: plan.new_h, : plan.new_w * 3]
            )
            try:
                got = np.asarray(jax.block_until_ready(f2(d)))
            except Exception as e:
                msg = str(e).replace("\n", " ")[:90]
                print(f"  tile {tv}x{th}: FAIL {msg}", flush=True)
                continue
            ms2, _ = device_ms(lambda: f2(d))
            same = np.array_equal(got, base)
            wv2 = vop2.taps_q1.shape[2]
            wl2 = lop2.win_l
            print(
                f"  tile {tv}x{th}: {ms2:7.3f} ms  win [{wv2},{wl2}]"
                f"  same={same}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
