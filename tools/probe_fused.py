"""TPU probe: unfused vs fused-vh/hv vs planar on up/downsize configs."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avir_tpu.models.runtime import _separable_pass_lanes, resolve_modes
from avir_tpu.ops.banded import block_banded
from avir_tpu.ops.lanes import lane_block_banded
from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas, fused_viable
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.utils.benchmarking import device_ms


def probe(name, sw, sh, nw, nh, c, dt, gamma=False, alpha_index=-1, bits=None):
    kw = {}
    if gamma:
        kw = dict(use_srgb_gamma=True, alpha_index=alpha_index)
    if bits:
        kw["res_bit_depth"] = bits
    plan = build_resize_plan(sw, sh, nw, nh, c, dt, dt, **kw)
    vop = block_banded(plan.v.op)
    lop = lane_block_banded(plan.h.op, c)
    mode1, mode2 = resolve_modes(
        "auto",
        not plan.is_in_float and plan.in_type_max == 255.0 and not gamma,
    )
    out_dt = jnp.uint8 if plan.out_type_max == 255.0 else jnp.uint16
    rng = np.random.default_rng(5)
    info = np.iinfo(dt)
    src = rng.integers(0, info.max + 1, (sh, sw * c), dtype=dt)
    d = jax.device_put(src)

    gk = dict(
        gamma=gamma, alpha_index=alpha_index,
        in_gamma_mult=plan.in_gamma_mult,
        out_gamma_mult=plan.out_gamma_mult,
    ) if gamma else {}

    @jax.jit
    def f_vh(x):
        o = apply_fused_pallas(
            vop, lop, x, mode1, mode2, out_dtype=out_dt,
            out_max=plan.out_type_max, order="vh", **gk)
        return o[: plan.new_h, : plan.new_w * c]

    @jax.jit
    def f_hv(x):
        o = apply_fused_pallas(
            vop, lop, x, mode2, mode1, out_dtype=out_dt,
            out_max=plan.out_type_max, order="hv", **gk)
        return o[: plan.new_h, : plan.new_w * c]

    @jax.jit
    def f_unf(x):
        if gamma:
            from avir_tpu.ops.gamma import (
                linear_to_srgb_2d, srgb_to_linear_2d,
            )
            x = srgb_to_linear_2d(
                x.astype(jnp.float32) * jnp.float32(plan.in_gamma_mult),
                c, alpha_index)
        y = _separable_pass_lanes(x, vop, lop, sh, sw, c, mode1, mode2)
        y = y.reshape(plan.new_h, plan.new_w * c)
        if gamma:
            from avir_tpu.ops.gamma import linear_to_srgb_2d
            y = linear_to_srgb_2d(y, c, alpha_index)
            if plan.out_gamma_mult:
                y = y * jnp.float32(plan.out_gamma_mult)
        y = jnp.clip(jnp.floor(y + 0.5), 0, plan.out_type_max)
        return y.astype(out_dt)

    from avir_tpu.ops.pallas.planar2_kernel import (
        apply_planar2_pallas, regroup_channels,
    )

    pop = lane_block_banded(plan.h.op, 1)

    @jax.jit
    def f_planar2(x):
        o = apply_planar2_pallas(
            vop, pop, x, c, mode1, mode2, out_dtype=out_dt,
            out_max=plan.out_type_max, **gk)
        return regroup_channels(
            o, c, pop.tile, plan.new_h, plan.new_w
        )

    del f_planar2  # planar2 does not compile under Mosaic (no strided
    # lane slices); keep the probe focused on working variants.
    mpix = nw * nh / 1e6
    res = {}
    for tag, fn in (
        ("unfused", f_unf), ("fused-vh", f_vh), ("fused-hv", f_hv),
    ):
        try:
            ms, _ = device_ms(fn, d, n=5)
            res[tag] = ms
            print(f"{name:28s} {tag:9s} {ms:8.3f} ms  "
                  f"{mpix / (ms / 1e3):9.0f} Mpix/s out")
        except Exception as e:
            print(f"{name:28s} {tag:9s} FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")
    return res


if __name__ == "__main__":
    probe("8K->1080p u8 RGB", 7680, 4320, 1920, 1080, 3, np.uint8)
    probe("4K->8K u16 RGBA gamma", 3840, 2160, 7680, 4320, 4, np.uint16,
          gamma=True, alpha_index=3, bits=16)
    probe("4K->8K u8 RGB", 3840, 2160, 7680, 4320, 3, np.uint8)
    probe("640x480->1024x768 u8 RGB", 640, 480, 1024, 768, 3, np.uint8)
