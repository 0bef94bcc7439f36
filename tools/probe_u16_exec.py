"""Executor-level 16-bit / float measurement (perf_analysis 16-bit
section): the PRODUCTION auto route (fused V-first + interior/boundary
lane split at the byte-aware tiles) for the named BASELINE configs,
with accuracy vs the f64 host oracle and a differential MXU/VPU/DMA
decomposition.

Decomposition method (no extra kernels): precision="fast" runs the
same fused kernel with split2 passes (4 matmul units vs split3's 6),
so t_mm_unit = (t_auto - t_fast) / 2, MXU = 6 units, and the
remainder is DMA + VPU + epilogue; the gamma VPU cost is the
(gamma - no-gamma) difference at equal modes.  Traffic floor =
(in + out bytes) / 740 GB/s (the measured streaming ceiling,
docs/perf_analysis.md).

Usage: python tools/probe_u16_exec.py [config-substring ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from avir_tpu.models.host_reference import execute_plan_rows_numpy
from avir_tpu.models.runtime import make_avir_executor
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    ("4K->8K u16 RGBA gamma", 3840, 2160, 7680, 4320, 4,
     np.uint16, np.uint16, True),
    ("4K->8K u16 RGBA", 3840, 2160, 7680, 4320, 4,
     np.uint16, np.uint16, False),
    ("4K->8K f32 RGB", 3840, 2160, 7680, 4320, 3,
     np.float32, np.float32, False),
    ("8K->1080p u16 RGB gamma", 7680, 4320, 1920, 1080, 3,
     np.uint16, np.uint16, True),
    ("8K->1080p u16 RGB", 7680, 4320, 1920, 1080, 3,
     np.uint16, np.uint16, False),
    ("8K->1080p f32 RGB", 7680, 4320, 1920, 1080, 3,
     np.float32, np.float32, False),
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
        out = np.asarray(fn(d))
        t_auto, _ = device_ms(lambda: fn(d))
        fn_fast = make_avir_executor(plan, precision="fast")
        jax.block_until_ready(fn_fast(d))
        t_fast, _ = device_ms(lambda: fn_fast(d))

        # Accuracy vs the f64 oracle on 48 sampled output rows.
        rows = np.linspace(0, nh - 1, 48).astype(np.int64)
        rows = np.unique(rows)
        oracle = execute_plan_rows_numpy(
            plan, src.reshape(sh, sw, c), rows
        ).reshape(len(rows), nw * c)
        got = out[rows]
        if np.dtype(tout).kind == "f":
            err = float(np.abs(got - oracle).max())
        else:
            err = int(
                np.abs(
                    got.astype(np.int64) - oracle.astype(np.int64)
                ).max()
            )

        in_b = src.nbytes
        out_b = out.nbytes
        floor_ms = (in_b + out_b) / 740e9 * 1e3
        unit = (t_auto - t_fast) / 2.0
        mxu = 6 * unit
        rest = t_auto - mxu
        print(
            f"{name}: auto {t_auto:.3f} ms (split={fn.lane_split})  "
            f"fast {t_fast:.3f}  -> mxu~{mxu:.2f} rest~{rest:.2f}  "
            f"floor {floor_ms:.3f} ms ({(in_b + out_b) / 1e6:.0f} MB)  "
            f"maxdiff={err}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
