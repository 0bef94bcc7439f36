"""Mosaic capability + cost probe for the planar-H ("/C MAC") attack.

The fused kernel's horizontal pass wastes a factor of C in MXU MACs
because the inter-pass intermediate is channel-interleaved on the LANE
axis (taps are channel-diagonal).  Candidate fix: transpose the
intermediate in VMEM so channels land on the SUBLANE axis (strided
sublane access is cheap where strided lane access is not), run C dense
per-channel H matmuls at M=128, and re-interleave via a small 0/1
scatter matmul.  This probe measures whether each primitive compiles
under Mosaic and what it costs at the 8K-headline shapes:

  V-out intermediate per cell: [Tv=64, WC=1792]
  H chunk matmul today:        s8 [64, 1024] @ [1024, 128]
  planar H matmul candidate:   s8 [128, 576] @ [576, 64] (per channel)

Run on the real chip (Mosaic legality cannot be probed in interpret
mode).  Results recorded in docs/perf_analysis.md.
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avir_tpu.utils.benchmarking import device_ms

GRID = 32
REPS = 64


def run_variant(name, body, out_shape, scratch_shapes, check=None):
    """body(out_ref, *scratch) runs REPS iterations of the op under
    test; reports per-op cost in us.  Tiny HBM I/O so DMA never hides
    the measured compute."""
    def kernel(o_ref, *scratch):
        body(o_ref, *scratch)

    try:
        f = jax.jit(
            lambda: pl.pallas_call(
                kernel,
                grid=(GRID,),
                in_specs=[],
                out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                scratch_shapes=scratch_shapes,
            )()
        )
        out = np.asarray(jax.block_until_ready(f()))
        if check is not None:
            ok = check(out)
        else:
            ok = True
        ms, _ = device_ms(f, n=10)
        per_op_us = ms * 1e3 / (GRID * REPS)
        print(f"{name:28s} {ms:8.3f} ms  {per_op_us:8.3f} us/op  ok={ok}",
              flush=True)
        return per_op_us
    except Exception as e:
        msg = str(e).replace("\n", " ")[:140]
        print(f"{name:28s} FAIL: {msg}", flush=True)
        return float("nan")


def fill_f32(ref, shape):
    # Mosaic's tpu.iota wants integer results; convert after.
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    ref[...] = r * 0.25 + c * 0.5


def loop(n, fn, acc_ref):
    def body(k, _):
        fn(k)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def main():
    print(f"backend={jax.default_backend()}  grid={GRID} reps={REPS}",
          flush=True)

    # --- baseline: VPU add + accumulate at intermediate shape ---------
    def v_add(o_ref, src, acc):
        fill_f32(src, (64, 1792))

        def it(k):
            acc[...] = acc[...] + (src[...] + k.astype(jnp.float32))

        loop(REPS, it, acc)
        o_ref[...] = acc[:8, :128]

    base = run_variant(
        "add_f32 [64,1792]", v_add, (8, 128),
        [pltpu.VMEM((64, 1792), jnp.float32),
         pltpu.VMEM((64, 1792), jnp.float32)],
    )

    # --- f32 transpose [64,1792] -> [1792,64] -------------------------
    def v_xpose(o_ref, src, acc):
        fill_f32(src, (64, 1792))

        def it(k):
            acc[...] = acc[...] + (src[...] + k.astype(jnp.float32)).T

        loop(REPS, it, acc)
        o_ref[...] = jnp.pad(acc[:8, :64], ((0, 0), (0, 64)))

    run_variant(
        "xpose_f32 [64,1792]->T", v_xpose, (8, 128),
        [pltpu.VMEM((64, 1792), jnp.float32),
         pltpu.VMEM((1792, 64), jnp.float32)],
    )

    # --- s8 transpose --------------------------------------------------
    def v_xpose_s8(o_ref, src, acc):
        r = jax.lax.broadcasted_iota(jnp.int32, (64, 1792), 0)
        src[...] = (r % 127).astype(jnp.int8)

        def it(k):
            acc[...] = acc[...] + src[...].T.astype(jnp.int32).astype(
                jnp.float32
            )

        loop(REPS, it, acc)
        o_ref[...] = jnp.pad(acc[:8, :64], ((0, 0), (0, 64)))

    run_variant(
        "xpose_s8 [64,1792]->T", v_xpose_s8, (8, 128),
        [pltpu.VMEM((64, 1792), jnp.int8),
         pltpu.VMEM((1792, 64), jnp.float32)],
    )

    # --- s8 astype-only baseline (for the xpose_s8 delta) --------------
    def v_s8_conv(o_ref, src, acc):
        r = jax.lax.broadcasted_iota(jnp.int32, (64, 1792), 0)
        src[...] = (r % 127).astype(jnp.int8)

        def it(k):
            acc[...] = acc[...] + src[...].astype(jnp.int32).astype(
                jnp.float32
            )

        loop(REPS, it, acc)
        o_ref[...] = acc[:8, :128]

    run_variant(
        "s8->f32 conv [64,1792]", v_s8_conv, (8, 128),
        [pltpu.VMEM((64, 1792), jnp.int8),
         pltpu.VMEM((64, 1792), jnp.float32)],
    )

    # --- sublane-strided slice [1728,64][0::3] -> [576,64] -------------
    def v_subslice(o_ref, src, acc):
        fill_f32(src, (1728, 64))

        def it(k):
            y = (src[...] + k.astype(jnp.float32))[0::3, :]
            acc[...] = acc[...] + y

        loop(REPS, it, acc)
        o_ref[...] = acc[:8, :64]

    def chk_sub(out):
        # after REPS iters: acc[r, c] = sum_k (3r*0.25 + c*0.5 + k)
        k = np.arange(REPS).sum()
        r = np.arange(8)[:, None] * 3 * 0.25
        c = np.arange(64)[None, :] * 0.5
        exp = REPS * (r + c) + k
        return bool(np.allclose(out[:, :64], exp))

    run_variant(
        "subslice f32 [0::3]", v_subslice, (8, 64),
        [pltpu.VMEM((1728, 64), jnp.float32),
         pltpu.VMEM((576, 64), jnp.float32)],
        check=chk_sub,
    )

    # --- sublane-strided slice on REF (no full materialize) ------------
    def v_subslice_ref(o_ref, src, acc):
        fill_f32(src, (1728, 64))

        def it(k):
            acc[...] = acc[...] + src[0::3, :] + k.astype(jnp.float32)

        loop(REPS, it, acc)
        o_ref[...] = acc[:8, :64]

    run_variant(
        "subslice-ref f32 [0::3]", v_subslice_ref, (8, 64),
        [pltpu.VMEM((1728, 64), jnp.float32),
         pltpu.VMEM((576, 64), jnp.float32)],
    )

    # --- lane-strided slice (expected to fail / be slow) ----------------
    def v_laneslice(o_ref, src, acc):
        fill_f32(src, (64, 1728))

        def it(k):
            y = (src[...] + k.astype(jnp.float32))[:, 0::3]
            acc[...] = acc[...] + y

        loop(REPS, it, acc)
        o_ref[...] = acc[:8, :128]

    run_variant(
        "laneslice f32 [:,0::3]", v_laneslice, (8, 128),
        [pltpu.VMEM((64, 1728), jnp.float32),
         pltpu.VMEM((64, 576), jnp.float32)],
    )

    # --- matmul shapes: current H chunk vs planar candidate ------------
    def mk_mm(m, k_, n):
        def v_mm(o_ref, a, b, acc):
            ra = jax.lax.broadcasted_iota(jnp.int32, (m, k_), 1)
            a[...] = (ra % 113 - 56).astype(jnp.int8)
            rb = jax.lax.broadcasted_iota(jnp.int32, (k_, n), 0)
            b[...] = (rb % 109 - 54).astype(jnp.int8)

            def it(kk):
                acc[...] = acc[...] + jax.lax.dot_general(
                    a[...], b[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)

            loop(REPS, it, acc)
            o_ref[...] = acc[:8, :128] if n >= 128 else jnp.pad(
                acc[:8, :], ((0, 0), (0, 128 - n))
            )

        us = run_variant(
            f"mm_s8 [{m},{k_}]@[{k_},{n}]", v_mm, (8, 128),
            [pltpu.VMEM((m, k_), jnp.int8),
             pltpu.VMEM((k_, n), jnp.int8),
             pltpu.VMEM((m, n), jnp.float32)],
        )
        if us == us:
            tmacs = m * k_ * n / us / 1e6
            print(f"{'':28s} -> {tmacs:.0f} TMAC/s", flush=True)

    mk_mm(64, 1024, 128)   # today's H chunk
    mk_mm(128, 576, 64)    # planar candidate (per channel)
    mk_mm(128, 1792, 64)   # planar, unchunked window
    mk_mm(384, 576, 64)    # planar, 3 channels stacked on M
    mk_mm(64, 64, 1792)    # I64-transpose-matmul equivalent cost shape

    # --- transpose via s8 identity matmul -------------------------------
    def v_mmI(o_ref, a, i64, acc):
        ra = jax.lax.broadcasted_iota(jnp.int32, (64, 1792), 1)
        a[...] = (ra % 113 - 56).astype(jnp.int8)
        r = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)
        i64[...] = (r == c).astype(jnp.int8)

        def it(kk):
            acc[...] = acc[...] + jax.lax.dot_general(
                a[...], i64[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)

        loop(REPS, it, acc)
        o_ref[...] = acc[:8, :64]

    run_variant(
        "mmI64 xpose s8[64,1792]", v_mmI, (8, 64),
        [pltpu.VMEM((64, 1792), jnp.int8),
         pltpu.VMEM((64, 64), jnp.int8),
         pltpu.VMEM((1792, 64), jnp.float32)],
    )

    return 0


if __name__ == "__main__":
    sys.exit(main())
