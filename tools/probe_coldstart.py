"""Quantify cold-start cost: plan build + executor build + jit compile.

A serving deployment's first-request latency has three terms the steady
state never pays (VERDICT r3 item 6):

  1. PLAN BUILD — float64 filter design + banded-operator composition
     (scipy sparse chains; the reference's ctor builds its
     FixedFilterBank eagerly, avir.h:4630-4639).  Amortized by the
     disk plan cache (plan/cache.py).
  2. EXECUTOR BUILD — host-side blocking/lane decomposition + trace
     prep (make_avir_executor before the first call).
  3. JIT COMPILE — XLA/Mosaic compilation on the first call.
     Amortized across processes by JAX's persistent compilation cache
     (set JAX_COMPILATION_CACHE_DIR, or pass --compile-cache DIR here).

Usage:
  /opt/venv/bin/python tools/probe_coldstart.py [--compile-cache DIR]
      [configs...]
Prints one JSON line per config.  Run twice with the same
--compile-cache DIR to measure the warm-process compile path.
"""

import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

CONFIGS = {
    # name: (sw, sh, nw, nh, ch, tin, tout, gamma, alpha)
    "readme": (640, 480, 1024, 768, 3, "u8", "u8", 0, -1),
    "headline": (7680, 4320, 1920, 1080, 3, "u8", "u8", 0, -1),
    "u16": (3840, 2160, 7680, 4320, 4, "u16", "u16", 1, 3),
    "16k": (16384, 16384, 4096, 4096, 3, "u8", "u8", 0, -1),
}
DT = {"u8": np.uint8, "u16": np.uint16}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--compile-cache", default=None)
    ap.add_argument("configs", nargs="*", default=None)
    args = ap.parse_args()

    import jax

    if args.compile_cache:
        jax.config.update(
            "jax_compilation_cache_dir", args.compile_cache
        )
        # Cache every compilation (defaults skip sub-second compiles).
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.plan.cache import build_resize_plan_cached
    from avir_tpu.plan.plan import build_resize_plan

    names = args.configs or list(CONFIGS)
    for name in names:
        sw, sh, nw, nh, ch, tin, tout, gamma, alpha = CONFIGS[name]
        kw = dict(
            src_w=sw, src_h=sh, new_w=nw, new_h=nh, el_count=ch,
            in_dtype=np.dtype(DT[tin]), out_dtype=np.dtype(DT[tout]),
            use_srgb_gamma=bool(gamma), alpha_index=alpha,
        )
        rec = {"config": name, "backend": jax.default_backend()}

        t0 = time.perf_counter()
        plan = build_resize_plan(**kw)
        rec["plan_cold_s"] = round(time.perf_counter() - t0, 3)

        cdir = tempfile.mkdtemp(prefix="avir_plancache_")
        try:
            t0 = time.perf_counter()
            build_resize_plan_cached(cache_dir=cdir, **kw)  # miss+save
            rec["plan_miss_save_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            build_resize_plan_cached(cache_dir=cdir, **kw)  # disk hit
            rec["plan_disk_warm_s"] = round(
                time.perf_counter() - t0, 3
            )
        finally:
            shutil.rmtree(cdir, ignore_errors=True)

        t0 = time.perf_counter()
        fn = make_avir_executor(plan)
        rec["executor_build_s"] = round(time.perf_counter() - t0, 3)

        rng = np.random.default_rng(0)
        src = rng.integers(
            0, int(np.iinfo(DT[tin]).max) + 1, (sh, sw * ch),
            dtype=DT[tin],
        )
        d = jax.device_put(src)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(d))
        rec["first_call_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(d))
        rec["steady_call_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
