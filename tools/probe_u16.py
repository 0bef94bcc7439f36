"""Measure 16-bit and float-I/O pipeline routes (VERDICT r2 item 1).

The flagship gap: 4K->8K u16 RGBA + gamma (BASELINE configs[2]) ran
UNFUSED at 6.02 ms vs a ~0.45 ms traffic floor.  This probe measures,
in ONE process:

  - the current auto route,
  - the fused bf16 kernel (split3 x split3) forced at both orders,
  - per-stage ablations of the winning order (DMA / matmuls / gamma
    VPU / epilogue decomposition),

for the named u16 configs plus f32 float-I/O rows for the README perf
table.  Results feed docs/perf_analysis.md's 16-bit section.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avir_tpu.models.runtime import make_avir_executor
from avir_tpu.ops.banded import block_banded
from avir_tpu.ops.lanes import lane_block_banded
from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas, fused_viable
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    # name, sw, sh, nw, nh, c, tin, tout, gamma
    ("4K->8K u16 RGBA gamma", 3840, 2160, 7680, 4320, 4,
     np.uint16, np.uint16, True),
    ("4K->8K u16 RGBA", 3840, 2160, 7680, 4320, 4,
     np.uint16, np.uint16, False),
    ("8K->1080p u16 RGB", 7680, 4320, 1920, 1080, 3,
     np.uint16, np.uint16, False),
    ("8K->1080p u16 RGB gamma", 7680, 4320, 1920, 1080, 3,
     np.uint16, np.uint16, True),
    ("8K->1080p f32 RGB", 7680, 4320, 1920, 1080, 3,
     np.float32, np.float32, False),
    ("4K->8K f32 RGB", 3840, 2160, 7680, 4320, 3,
     np.float32, np.float32, False),
]


def make_src(rng, sh, sw, c, tin):
    if np.dtype(tin).kind == "f":
        return rng.random((sh, sw * c), dtype=np.float32)
    hi = 256 if np.dtype(tin).itemsize == 1 else 65536
    return rng.integers(0, hi, (sh, sw * c), dtype=tin)


def main():
    want = sys.argv[1:]
    rng = np.random.default_rng(7)
    for name, sw, sh, nw, nh, c, tin, tout, gamma in CONFIGS:
        if want and not any(w in name for w in want):
            continue
        src = make_src(rng, sh, sw, c, tin)
        plan = build_resize_plan(
            sw, sh, nw, nh, c, tin, tout, use_srgb_gamma=gamma
        )
        d = jax.device_put(src)

        # Current auto route.
        fn = make_avir_executor(plan)
        out_auto = np.asarray(fn(d))
        t_auto, _ = device_ms(lambda: fn(d))

        # Forced fused bf16 at both orders.
        vop = block_banded(plan.v.op)
        lop = lane_block_banded(plan.h.op, c)
        is_float = np.dtype(tout).kind == "f"
        out_dt = (
            jnp.float32 if is_float
            else (jnp.uint8 if plan.out_type_max == 255.0 else jnp.uint16)
        )
        res = {}
        for order in ("vh", "hv"):
            ok = fused_viable(
                vop, lop, order, in_bytes=np.dtype(tin).itemsize
            )
            if not ok:
                res[order] = (float("nan"), "not-viable")
                continue
            fused = jax.jit(
                lambda x, order=order: apply_fused_pallas(
                    vop, lop, x, "split3", "split3",
                    out_dtype=out_dt,
                    out_max=plan.out_type_max,
                    gamma=gamma,
                    alpha_index=plan.alpha_index,
                    in_gamma_mult=plan.in_gamma_mult,
                    out_gamma_mult=plan.out_gamma_mult,
                    order=order,
                )[: vop.n_out, : lop.n_out * c]
            )
            try:
                out_f = np.asarray(jax.block_until_ready(fused(d)))
            except Exception as e:  # Mosaic/VMEM failures
                res[order] = (float("nan"), str(e).splitlines()[0][:60])
                continue
            t_f, _ = device_ms(lambda f=fused: f(d))
            if is_float:
                err = float(np.abs(out_f - out_auto).max())
            else:
                err = float(
                    np.abs(
                        out_f.astype(np.int64) - out_auto.astype(np.int64)
                    ).max()
                )
            res[order] = (t_f, f"maxdiff={err:g}")
        print(
            f"{name}: auto {t_auto:.3f}  "
            f"fused-vh {res['vh'][0]:.3f} ({res['vh'][1]})  "
            f"fused-hv {res['hv'][0]:.3f} ({res['hv'][1]})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
