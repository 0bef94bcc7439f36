"""TPU probe: fused int8 kernel tile/alignment sweep on the headline
8K->1080p u8 RGB config.

Usage: probe_tiles.py <spec> [spec...] with spec = vtile,valign,htile
e.g. probe_tiles.py 64,128,128 64,32,128 32,32,128
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avir_tpu.ops.banded import block_banded
from avir_tpu.ops.lanes import lane_block_banded
from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas, int8_feasible
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

SW, SH, NW, NH, C = 7680, 4320, 1920, 1080, 3


def main():
    plan = build_resize_plan(SW, SH, NW, NH, C, np.uint8, np.uint8)
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, (SH, SW * C), dtype=np.uint8)
    d = jax.device_put(src)
    ref = None
    for spec in sys.argv[1:]:
        vt, va, ht = (int(t) for t in spec.split(","))
        vop = block_banded(plan.v.op, tile=vt, lane_align=va)
        lop = lane_block_banded(plan.h.op, C, tile=ht)
        if not int8_feasible(vop, lop, "vh"):
            print(f"v=({vt},{va}) h={ht}: int8 infeasible", flush=True)
            continue

        @jax.jit
        def f(x, vop=vop, lop=lop):
            o = apply_fused_pallas(
                vop, lop, x, "int8", "int8",
                out_dtype=jnp.uint8, out_max=255.0, order="vh")
            return o[:NH, :NW * C]

        try:
            ms, _ = device_ms(f, d, n=5)
            out = np.asarray(jax.block_until_ready(f(d)))
            if ref is None:
                ref = out.astype(np.int32)
                md = 0
            else:
                md = int(np.abs(out.astype(np.int32) - ref).max())
            print(
                f"v=({vt:3d},{va:3d}) h={ht:3d}  win_v={vop.win:5d} "
                f"win_l={lop.win_l:5d}  {ms:7.3f} ms  "
                f"{SW*SH/1e6/(ms/1e3):7.0f} Mpix/s in  maxdiff {md}",
                flush=True,
            )
        except Exception as e:
            print(f"v=({vt},{va}) h={ht}: FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
