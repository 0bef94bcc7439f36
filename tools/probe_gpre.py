"""Measure the gamma-prologue route vs the in-kernel gamma route."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from avir_tpu.models.runtime import make_avir_executor
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    ("8K->1080p", 7680, 4320, 1920, 1080),
    ("1080p->4K", 1920, 1080, 3840, 2160),
    ("VGA->XGA", 640, 480, 1024, 768),
    ("4K->720p", 3840, 2160, 1280, 720),
]


def main():
    rng = np.random.default_rng(11)
    for name, sw, sh, nw, nh in CONFIGS:
        src = rng.integers(0, 256, (sh, sw * 3), dtype=np.uint8)
        plan = build_resize_plan(
            sw, sh, nw, nh, 3, np.uint8, np.uint8, use_srgb_gamma=True
        )
        d = jax.device_put(src)
        import avir_tpu.models.runtime as rt

        fn_new = make_avir_executor(plan)
        out_new = np.asarray(fn_new(d))
        t_new, _ = device_ms(lambda: fn_new(d))

        # Force the old in-kernel route by raising the threshold.
        import avir_tpu.ops.pallas.fused_kernel as fk

        orig = fk.fused_viable
        fk.fused_viable = (
            lambda vop, lop, order="vh", in_bytes=1:
            orig(vop, lop, order) if in_bytes == 1 else False
        )
        try:
            fn_old = make_avir_executor(plan)
            out_old = np.asarray(fn_old(d))
            t_old, _ = device_ms(lambda: fn_old(d))
        finally:
            fk.fused_viable = orig
        same = np.array_equal(out_new, out_old)
        print(
            f"{name}: old {t_old:.3f} ms  new {t_new:.3f} ms  "
            f"bit-identical={same}  maxdiff="
            f"{np.abs(out_new.astype(int) - out_old.astype(int)).max()}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
