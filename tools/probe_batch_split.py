"""Measure the vmap-safe compact+concat lane split on batched paths
(VERDICT r2 item 3 'Done' criterion: a measured resize_batch
improvement).

Compares the vmapped executor (split_lanes=False, as resize_batch and
the traceable factories build it) WITH the concat split (auto) vs
WITHOUT (profitability forced off), on-device time.

Usage: python tools/probe_batch_split.py
"""

import os
import sys
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import avir_tpu.models.runtime as rt
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CONFIGS = [
    ("4x 4K->720p u8 RGB", 4, 3840, 2160, 1280, 720, False),
    ("4x 4K->720p u8 RGB gamma", 4, 3840, 2160, 1280, 720, True),
    ("2x 8K->1080p u8 RGB", 2, 7680, 4320, 1920, 1080, False),
]


def main():
    rng = np.random.default_rng(17)
    for name, n, sw, sh, nw, nh, gamma in CONFIGS:
        plan = build_resize_plan(
            sw, sh, nw, nh, 3, np.uint8, np.uint8, use_srgb_gamma=gamma
        )
        batch = rng.integers(0, 256, (n, sh, sw * 3), dtype=np.uint8)
        d = jax.device_put(batch)

        single = rt.make_avir_executor(plan, split_lanes=False)
        assert single.lane_split == "concat", single.lane_split
        fn = jax.jit(jax.vmap(single))
        out_c = np.asarray(jax.block_until_ready(fn(d)))
        t_c, _ = device_ms(lambda: fn(d))

        with mock.patch.object(
            rt, "_concat_split_ok", lambda *a: False
        ):
            base = rt.make_avir_executor(plan, split_lanes=False)
        assert base.lane_split is None
        fn0 = jax.jit(jax.vmap(base))
        out_0 = np.asarray(jax.block_until_ready(fn0(d)))
        t_0, _ = device_ms(lambda: fn0(d))

        err = int(
            np.abs(out_c.astype(np.int64) - out_0.astype(np.int64)).max()
        )
        print(
            f"{name}: no-split {t_0:.3f} ms  concat-split {t_c:.3f} ms "
            f"({(t_0 / t_c - 1) * 100:+.1f}%)  maxdiff={err}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
