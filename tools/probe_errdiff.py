"""Error-diffusion route measurement (VERDICT r2 item 6).

Measures, per output size, the two errdiff implementations:

  A. host route (dither="errdiff"): device pipeline with
     return_predither (f32) -> device->host transfer -> native C++
     serial scan (native/avir_host.cpp).  Decomposed into device /
     transfer / scan components.
  B. device route (dither="errdiff-device"): in-graph nested lax.scan
     (exact scan-ordered semantics) — h*w sequential steps.

Results feed the size-based routing in models/avir.py and
docs/perf_analysis.md.  NOTE: on this rig the device<->host transfer
rides the axon tunnel (~25 ms RTT + low bandwidth), so the transfer
component is an upper bound vs a real PCIe-attached host.

Usage: python tools/probe_errdiff.py [config-substring ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from avir_tpu import native
from avir_tpu.models.runtime import make_avir_executor
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    # name, sw, sh, nw, nh (u8 RGB downsizes, errdiff on the output)
    ("VGA out", 1280, 960, 640, 480),
    ("1080p out", 3840, 2160, 1920, 1080),
    ("4K out", 7680, 4320, 3840, 2160),
]


def main():
    want = sys.argv[1:]
    rng = np.random.default_rng(11)
    c = 3
    for name, sw, sh, nw, nh in CONFIGS:
        if want and not any(w in name for w in want):
            continue
        src = rng.integers(0, 256, (sh, sw * c), dtype=np.uint8)
        plan = build_resize_plan(sw, sh, nw, nh, c, np.uint8, np.uint8)
        d = jax.device_put(src)

        # Route A decomposition.
        fn_pre = make_avir_executor(plan, return_predither=True)
        jax.block_until_ready(fn_pre(d))
        t_dev, _ = device_ms(lambda: fn_pre(d))
        # transfer: device->host of the f32 predither image
        outs = fn_pre(d)
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        pre = np.asarray(outs)
        t_xfer = (time.perf_counter() - t0) * 1e3
        pre64 = pre.astype(np.float64).reshape(nh, nw, c)
        t0 = time.perf_counter()
        native.errdiff_dither(pre64, 0, 255.0)
        t_scan = (time.perf_counter() - t0) * 1e3
        # end-to-end wall
        t0 = time.perf_counter()
        p = np.asarray(fn_pre(d)).astype(np.float64).reshape(nh, nw, c)
        native.errdiff_dither(p, 0, 255.0)
        t_wall_a = (time.perf_counter() - t0) * 1e3

        # Route C: anti-diagonal wavefront (device).
        import jax.numpy as jnp

        from avir_tpu.ops.dither import errdiff_dither_wavefront_jnp

        @jax.jit
        def fn_wave(x):
            pre = fn_pre(x).reshape(nh, nw, c)
            o = errdiff_dither_wavefront_jnp(pre, 0, 255.0)
            return o.reshape(nh, nw * c).astype(jnp.uint8)

        jax.block_until_ready(fn_wave(d))
        t_wave, _ = device_ms(lambda: fn_wave(d))

        # Route B: in-graph nested scan.
        if "B" in os.environ.get("AVIR_ERRDIFF_ROUTES", "B"):
            fn_dev = make_avir_executor(plan, errdiff=True)
            t0 = time.perf_counter()
            jax.block_until_ready(fn_dev(d))  # includes compile
            t_compile_b = (time.perf_counter() - t0) * 1e3
            t0 = time.perf_counter()
            jax.block_until_ready(fn_dev(d))
            t_wall_b = (time.perf_counter() - t0) * 1e3
        else:
            t_wall_b = t_compile_b = float("nan")

        print(
            f"{name} ({nw}x{nh}): host-route wall {t_wall_a:.1f} ms "
            f"(device {t_dev:.2f} + xfer {t_xfer:.1f} + scan "
            f"{t_scan:.1f})   wavefront device {t_wave:.2f} ms   "
            f"nested-scan wall {t_wall_b:.1f} ms "
            f"(first call incl. compile {t_compile_b:.0f})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
