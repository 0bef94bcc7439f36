"""Gamma-route V-tile probe (VERDICT r2 item 2).

The Tv=128/256 dead-end table in docs/perf_analysis.md was measured on
the NON-gamma int8 kernel, where V MACs dominate and bigger tiles
lose.  On the GAMMA route the dominant cost is the in-kernel
linearization polynomial recomputed over the window overlap
(~1.76x at Tv=64); Tv=128 cuts the overlap to ~1.38x (saves ~220 us of
polynomial) at ~+116 us of V MACs — a projected ~100 us net win never
probed at gamma shapes.  This measures the production executor
(fused int8 + in-kernel gamma + lane split) at Tv in {default, 128,
192} for the gamma configs.

Usage: python tools/probe_gamma_tv.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from avir_tpu.models.runtime import make_avir_executor
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    ("8K->1080p u8 RGB gamma", 7680, 4320, 1920, 1080, 3, True),
    ("4K->720p u8 RGB gamma", 3840, 2160, 1280, 720, 3, True),
]


def main():
    rng = np.random.default_rng(3)
    for name, sw, sh, nw, nh, c, gamma in CONFIGS:
        src = rng.integers(0, 256, (sh, sw * c), dtype=np.uint8)
        plan = build_resize_plan(
            sw, sh, nw, nh, c, np.uint8, np.uint8, use_srgb_gamma=gamma
        )
        d = jax.device_put(src)
        res = {}
        base = None
        for tv in (None, 96, 128, 192):
            try:
                fn = make_avir_executor(plan, tile=tv)
                out = np.asarray(fn(d))
            except Exception as e:  # Mosaic VMEM OOM etc.
                res[tv] = float("nan")
                print(f"  Tv={tv}: FAIL {str(e).splitlines()[0][:70]}",
                      flush=True)
                continue
            if base is None:
                base = out
            else:
                err = int(
                    np.abs(
                        out.astype(np.int64) - base.astype(np.int64)
                    ).max()
                )
                assert err <= 1, (tv, err)
            t, _ = device_ms(lambda: fn(d))
            res[tv] = t
        print(
            f"{name}: default {res[None]:.3f}  Tv=96 {res[96]:.3f}  "
            f"Tv=128 {res[128]:.3f}  Tv=192 {res[192]:.3f} ms",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
