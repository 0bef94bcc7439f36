"""Measure the gamma-prologue (limb-plane) route vs the in-kernel
gamma route, with per-stage ablations, in ONE process."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from avir_tpu.models.runtime import make_avir_executor
from avir_tpu.ops.banded import block_banded
from avir_tpu.ops.lanes import lane_block_banded
from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas
from avir_tpu.ops.pallas.gamma_prologue import apply_gamma_prologue
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    ("VGA->XGA", 640, 480, 1024, 768),
    ("1080p->4K", 1920, 1080, 3840, 2160),
    ("4K->720p", 3840, 2160, 1280, 720),
    ("8K->1080p", 7680, 4320, 1920, 1080),
]


def main():
    import jax.numpy as jnp

    want = sys.argv[1:]
    rng = np.random.default_rng(11)
    for name, sw, sh, nw, nh in CONFIGS:
        if want and not any(w in name for w in want):
            continue
        src = rng.integers(0, 256, (sh, sw * 3), dtype=np.uint8)
        plan = build_resize_plan(
            sw, sh, nw, nh, 3, np.uint8, np.uint8, use_srgb_gamma=True
        )
        vop = block_banded(plan.v.op)
        lop = lane_block_banded(plan.h.op, 3)
        d = jax.device_put(src)

        os.environ["AVIR_TPU_GAMMA_ROUTE"] = "prologue"
        try:
            fn_new = make_avir_executor(plan)
            out_new = np.asarray(fn_new(d))
            t_new, _ = device_ms(lambda: fn_new(d))
        finally:
            os.environ["AVIR_TPU_GAMMA_ROUTE"] = "inkernel"
        try:
            fn_old = make_avir_executor(plan)
            out_old = np.asarray(fn_old(d))
            t_old, _ = device_ms(lambda: fn_old(d))
        finally:
            os.environ.pop("AVIR_TPU_GAMMA_ROUTE")

        # Stage ablations: prologue alone, main-on-limbs alone.
        pro = jax.jit(
            lambda x: apply_gamma_prologue(
                x, vop.n_in_pad, lop.lanes_pad, 3,
                plan.alpha_index, plan.in_gamma_mult,
            )
        )
        hi, lo = jax.block_until_ready(pro(d))
        t_pro, ops_pro = device_ms(lambda: pro(d))
        downsize = nw * nh <= sw * sh
        order = "vh" if downsize else "hv"
        main = jax.jit(
            lambda a, b: apply_fused_pallas(
                vop, lop, a, "int8", "int8", x_lo=b,
                out_dtype=jnp.uint8, out_max=255.0, gamma=True,
                alpha_index=plan.alpha_index,
                in_gamma_mult=plan.in_gamma_mult,
                out_gamma_mult=plan.out_gamma_mult, order=order,
            )
        )
        jax.block_until_ready(main(hi, lo))
        t_main, _ = device_ms(lambda: main(hi, lo))

        # Shift-ring kernel (fused_ring_kernel.py) via the executor
        # route (builds the uniform-offset vop internally).
        from avir_tpu.ops.pallas.fused_ring_kernel import (
            apply_fused_ring_pallas,
            ring_viable,
        )

        t_ring = float("nan")
        ring_same = "-"
        try:
            vop_ring = block_banded(plan.v.op, uniform=True)
        except ValueError:
            vop_ring = None
        if vop_ring is not None and ring_viable(vop_ring, lop, True, "vh"):
            os.environ["AVIR_TPU_GAMMA_ROUTE"] = "ring"
            try:
                ringf = make_avir_executor(plan)
                out_ring = np.asarray(ringf(d))
                t_ring, _ = device_ms(lambda: ringf(d))
            finally:
                os.environ.pop("AVIR_TPU_GAMMA_ROUTE")
            ring_same = bool(np.array_equal(out_ring, out_old))

        same = np.array_equal(out_new, out_old)
        pro_ops = sorted(ops_pro.items(), key=lambda kv: -kv[1])[:3]
        print(
            f"{name}: inkernel {t_old:.3f}  prologue-route {t_new:.3f}  "
            f"prologue {t_pro:.3f} {[(k, round(v, 3)) for k, v in pro_ops]}  "
            f"main {t_main:.3f}  ring {t_ring:.3f} (same={ring_same})  "
            f"identical={same}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
