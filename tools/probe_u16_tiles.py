"""Tile-grid probe for the 16-bit/float UPSIZE fused route (VERDICT r3
work): the default (u8-shaped) wide tiles blow the VMEM budget with
2/4-byte inputs, so the fused kernel was never viable for BASELINE
config 3 (4K->8K u16 RGBA gamma, 5.99 ms unfused).  This probe force-
compiles the fused kernel over a (v_tile, lane_tile, order) grid —
letting Mosaic, not the conservative fused_viable estimate, decide —
and measures device time + accuracy vs the unfused auto route.

Usage: python tools/probe_u16_tiles.py [config-substring ...]
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
from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    ("4K->8K u16 RGBA gamma", 3840, 2160, 7680, 4320, 4,
     np.uint16, np.uint16, True),
    ("4K->8K u16 RGBA", 3840, 2160, 7680, 4320, 4,
     np.uint16, np.uint16, False),
    ("4K->8K f32 RGB", 3840, 2160, 7680, 4320, 3,
     np.float32, np.float32, False),
]

GRID = [
    # (v_tile, lane_tile)
    (128, 768),
    (64, 768),
    (128, 1152),
    (128, 576),
    (128, 384),
    (256, 768),
]


def main():
    want = sys.argv[1:]
    rng = np.random.default_rng(7)
    for name, sw, sh, nw, nh, c, tin, tout, gamma in CONFIGS:
        if want and not any(w in name for w in want):
            continue
        if np.dtype(tin).kind == "f":
            src = rng.random((sh, sw * c), dtype=np.float32)
        else:
            src = rng.integers(0, 65536, (sh, sw * c), dtype=tin)
        plan = build_resize_plan(
            sw, sh, nw, nh, c, tin, tout,
            use_srgb_gamma=gamma, res_bit_depth=16,
        )
        d = jax.device_put(src)
        fn = make_avir_executor(plan)
        out_auto = np.asarray(fn(d))
        t_auto, _ = device_ms(lambda: fn(d))
        print(f"{name}: auto {t_auto:.3f} ms", flush=True)

        is_float = np.dtype(tout).kind == "f"
        out_dt = (
            jnp.float32 if is_float
            else (jnp.uint8 if plan.out_type_max == 255.0 else jnp.uint16)
        )
        in_bytes = np.dtype(tin).itemsize
        for vt, lt in GRID:
            try:
                vop = block_banded(plan.v.op, tile=vt)
                lop = lane_block_banded(plan.h.op, c, tile=lt)
            except Exception as e:
                print(f"  vt={vt} lt={lt}: build fail {e}", flush=True)
                continue
            for order in ("hv", "vh"):
                fused = jax.jit(
                    lambda x, order=order, vop=vop, lop=lop:
                    apply_fused_pallas(
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
                except Exception as e:
                    msg = str(e).splitlines()[0][:90]
                    print(f"  vt={vt} lt={lt} {order}: FAIL {msg}",
                          flush=True)
                    continue
                t_f, _ = device_ms(lambda f=fused: f(d))
                if is_float:
                    err = float(np.abs(out_f - out_auto).max())
                else:
                    err = int(
                        np.abs(
                            out_f.astype(np.int64)
                            - out_auto.astype(np.int64)
                        ).max()
                    )
                print(
                    f"  vt={vt} lt={lt} {order}: {t_f:.3f} ms  "
                    f"maxdiff={err}",
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
