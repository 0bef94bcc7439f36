"""TPU probe: gamma u8 pipelines — the bf16 unfused route (current
production) vs the int8 fixed-point fused route, one config per run.

Usage: probe_int8_gamma.py <cfg-index>   (0=8K down, 1=4K up, 2=VGA)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avir_tpu.models.runtime import _separable_pass_lanes, resolve_modes
from avir_tpu.ops.banded import block_banded
from avir_tpu.ops.gamma import linear_to_srgb_2d, srgb_to_linear_2d
from avir_tpu.ops.lanes import lane_block_banded
from avir_tpu.ops.pallas.fused_kernel import (
    apply_fused_pallas,
    int8_feasible,
)
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms

CFGS = [
    ("8K->1080p u8 RGB gamma", 7680, 4320, 1920, 1080, 3),
    ("1080p->4K u8 RGB gamma", 1920, 1080, 3840, 2160, 3),
    ("VGA->XGA u8 RGB gamma", 640, 480, 1024, 768, 3),
]


def probe(name, sw, sh, nw, nh, c):
    plan = build_resize_plan(
        sw, sh, nw, nh, c, np.uint8, np.uint8, use_srgb_gamma=True
    )
    vop = block_banded(plan.v.op)
    lop = lane_block_banded(plan.h.op, c)
    mode1, mode2 = resolve_modes("auto", False)
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, (sh, sw * c), dtype=np.uint8)
    d = jax.device_put(src)

    gk = dict(
        gamma=True, alpha_index=plan.alpha_index,
        in_gamma_mult=plan.in_gamma_mult,
        out_gamma_mult=plan.out_gamma_mult,
    )

    def mk_fused(mv, mh, order):
        @jax.jit
        def f(x):
            o = apply_fused_pallas(
                vop, lop, x, mv, mh, out_dtype=jnp.uint8,
                out_max=255.0, order=order, **gk)
            return o[: plan.new_h, : plan.new_w * c]
        return f

    @jax.jit
    def f_unf(x):
        x = srgb_to_linear_2d(
            x.astype(jnp.float32) * jnp.float32(plan.in_gamma_mult),
            c, plan.alpha_index)
        y = _separable_pass_lanes(x, vop, lop, sh, sw, c, mode1, mode2)
        y = y.reshape(plan.new_h, plan.new_w * c)
        y = linear_to_srgb_2d(y, c, plan.alpha_index)
        if plan.out_gamma_mult:
            y = y * jnp.float32(plan.out_gamma_mult)
        y = jnp.clip(jnp.floor(y + 0.5), 0, 255.0)
        return y.astype(jnp.uint8)

    order = "vh" if nw * nh <= sw * sh else "hv"
    variants = [("bf16-unfused", f_unf)]
    if int8_feasible(vop, lop, order, gamma=True):
        variants.append(
            (f"int8-fused-{order}", mk_fused("int8", "int8", order))
        )
    else:
        print(f"{name:26s} int8-fused-{order}: infeasible", flush=True)

    mpix = nw * nh / 1e6
    ref = None
    for tag, fn in variants:
        ms, _ = device_ms(fn, d, n=5)
        out = np.asarray(jax.block_until_ready(fn(d))).astype(np.int32)
        if ref is None:
            ref = out  # accuracy relative to the bf16 production route
            extra = ""
        else:
            err = np.abs(out - ref)
            mse = float((err.astype(np.float64) ** 2).mean())
            psnr = 10 * np.log10(255.0**2 / mse) if mse else float("inf")
            extra = f"  maxdiff {err.max():2d}  psnr-vs-bf16 {psnr:5.1f} dB"
        print(f"{name:26s} {tag:14s} {ms:8.3f} ms  "
              f"{mpix / (ms / 1e3):8.0f} Mpix/s out{extra}", flush=True)


if __name__ == "__main__":
    probe(*CFGS[int(sys.argv[1])])
