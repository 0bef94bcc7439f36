"""Scaling-efficiency benchmark: sharded resize over 1..N devices,
measured against the analytic scaling model.

Measures the sharded executor's wall-clock per step at each mesh size
and reports pixels/s scaling efficiency vs the 1-device run (BASELINE
target: >= 0.8 at N >= 2 hosts), next to the prediction of
avir_tpu/parallel/scaling_model.py run with CPU-host constants.  On
this dev image only a CPU mesh is available (one real TPU chip), so
the measured numbers validate the communication structure and the
model — NOT real ICI rates; the same model with v5e constants is the
published pod-scale prediction (docs/scaling.md).

CAVEAT (shared cores): the 8 virtual devices timeshare the host's
physical cores, so measured compute stops speeding up at n = cores;
the model's ``cores`` cap reproduces that regime.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py [config ...]
Configs: down, gamma, up, lancir (default: all).
"""

import os
import sys
import time

sys.path.insert(0, sys.path[0] + "/..")

import numpy as np  # noqa: E402

CONFIGS = {
    "down": dict(sw=1536, sh=1024, nw=768, nh=512, gamma=False,
                 lancir=False),
    "gamma": dict(sw=1536, sh=1024, nw=768, nh=512, gamma=True,
                  lancir=False),
    "up": dict(sw=768, sh=512, nw=1536, nh=1024, gamma=False,
               lancir=False),
    "lancir": dict(sw=1536, sh=1024, nw=768, nh=512, gamma=False,
                   lancir=True),
}


def bench_fn(fn, x, reps=10):
    import jax

    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    import jax

    from avir_tpu.parallel.scaling_model import model_scaling
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor,
        make_sharded_lancir_executor,
        pad_rows,
    )
    from avir_tpu.plan.lancir_plan import build_lancir_plan
    from avir_tpu.plan.plan import build_resize_plan

    want = sys.argv[1:] or list(CONFIGS)
    n = len(jax.devices())
    cores = os.cpu_count() or 1
    rng = np.random.default_rng(0)

    for name in want:
        cfg = CONFIGS[name]
        sw, sh, nw, nh = cfg["sw"], cfg["sh"], cfg["nw"], cfg["nh"]
        if cfg["lancir"]:
            plan = build_lancir_plan(
                sw, sh, nw, nh, 3, np.uint8, np.uint8
            )
        else:
            plan = build_resize_plan(
                sw, sh, nw, nh, 3, np.uint8, np.uint8,
                use_srgb_gamma=cfg["gamma"],
            )
        src = rng.integers(0, 256, (sh, sw * 3), dtype=np.uint8)
        print(
            f"\n{name}: {sw}x{sh} -> {nw}x{nh}"
            f"{' +gamma' if cfg['gamma'] else ''}"
            f"{' (LANCIR)' if cfg['lancir'] else ''}   "
            f"devices={n} cores={cores}"
        )
        base = None
        meas = {}
        for nd in [d for d in (1, 2, 4, 8, 16) if d <= n]:
            mesh = jax.make_mesh((nd,), ("sp",))
            mk = (
                make_sharded_lancir_executor
                if cfg["lancir"]
                else make_sharded_avir_executor
            )
            fn = mk(plan, mesh, rows_axis="sp")
            x = jax.device_put(pad_rows(src, nd))
            best = bench_fn(fn, x)
            meas[nd] = best
            if base is None:
                base = best
            eff = base / (best * nd)
            print(
                f"  n={nd:3d}  {best * 1e3:8.2f} ms/step   speedup "
                f"{base / best:6.2f}x   efficiency {eff:.2f}"
            )
        # Model with CPU-host constants (compute capped at the core
        # count; generous local "link": shared-memory copies).
        pts = model_scaling(
            plan, meas[1], n_devs=[d for d in (2, 4, 8) if d <= n],
            bw=8e9, lat=30e-6, t_dispatch=50e-6, cores=cores,
        )
        pred = "  model(cpu): " + "  ".join(
            f"n={p.n_dev}:{p.efficiency:.2f}" for p in pts
        )
        act = "  actual    : " + "  ".join(
            f"n={d}:{base / (meas[d] * d):.2f}"
            for d in (2, 4, 8) if d in meas
        )
        print(pred)
        print(act)

        # 2-D rows x cols grids at the same device counts (VERDICT r3
        # item 5): structural validation of the 2-D executor on the
        # CPU mesh; the v5e prediction uses model_scaling_2d.
        if cfg["lancir"]:
            continue
        from avir_tpu.parallel.sharded import (
            make_sharded_avir_executor_2d,
            pad_cols,
        )

        for (r, s) in ((2, 2), (2, 4), (4, 2)):
            if r * s > n:
                continue
            mesh = jax.make_mesh((r, s), ("sp", "cp"))
            fn2 = make_sharded_avir_executor_2d(
                plan, mesh, rows_axis="sp", cols_axis="cp"
            )
            x2 = jax.device_put(pad_cols(pad_rows(src, r), s, 3))
            best = bench_fn(fn2, x2)
            eff = base / (best * r * s)
            print(
                f"  2d {r}x{s} (n={r * s})  {best * 1e3:8.2f} ms/step"
                f"   efficiency {eff:.2f}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
