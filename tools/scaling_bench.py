"""Scaling-efficiency benchmark: sharded resize over 1..N devices.

Measures the sharded executor's wall-clock per step at each mesh size
and reports pixels/s scaling efficiency vs the 1-device run
(BASELINE target: >= 0.8 at N >= 2 hosts).  On this dev image only a
CPU mesh is available (one real TPU chip), so the numbers validate the
communication structure, not real ICI bandwidth; run on a pod slice
for the real measurement.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py [src_h src_w new_h new_w]
"""

import sys
import time

sys.path.insert(0, sys.path[0] + "/..")

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor,
        pad_rows,
    )
    from avir_tpu.plan.plan import build_resize_plan

    args = [int(a) for a in sys.argv[1:]] or [1024, 1536, 512, 768]
    src_h, src_w, new_h, new_w = args

    n = len(jax.devices())
    plan = build_resize_plan(
        src_w, src_h, new_w, new_h, 3, np.uint8, np.uint8
    )
    src = np.random.default_rng(0).integers(
        0, 256, (src_h, src_w * 3), dtype=np.uint8
    )

    base = None
    print(f"devices={n}  image {src_w}x{src_h} -> {new_w}x{new_h}")
    for nd in [d for d in (1, 2, 4, 8, 16, 32) if d <= n]:
        mesh = jax.make_mesh((nd,), ("sp",))
        fn = make_sharded_avir_executor(plan, mesh, rows_axis="sp")
        x = jax.device_put(pad_rows(src, nd))
        out = fn(x)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(10):
            t0 = time.perf_counter()
            out = fn(x)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        if base is None:
            base = best
        eff = base / (best * nd)
        print(
            f"  n={nd:3d}  {best*1e3:8.2f} ms/step   speedup "
            f"{base/best:6.2f}x   efficiency {eff:.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
