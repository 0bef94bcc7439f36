"""Randomized-config property tests: device pipeline vs the float64
host oracle.

The golden suite pins 35 hand-picked configs against the compiled
reference; this sweep walks a seeded random sample of the whole
parameter space (sizes down to 1 px, channel counts, dtype mixes,
sub-pixel shifts, presets, gamma, alpha bypass) and checks the jitted
device executors against ``execute_plan_numpy`` — the float64 host
implementation that the golden tests validate against the reference.
The reference itself has no such sweep (SURVEY.md §4); its closest
analog is the Dr.Memory robustness testing (reference README.md:212).
"""

import numpy as np
import pytest

import avir_tpu
from avir_tpu import ImageResizer
from avir_tpu.models.host_reference import execute_plan_numpy
from avir_tpu.plan.plan import build_resize_plan

from conftest import psnr

PRESETS = ["ultra", "high", "def", "low", "lr", "ulr"]
DTYPES = [np.uint8, np.uint16, np.float32]


def _gen_config(rng):
    sw = int(rng.integers(1, 97))
    sh = int(rng.integers(1, 97))
    nw = int(rng.integers(1, 97))
    nh = int(rng.integers(1, 97))
    ch = int(rng.integers(1, 5))
    tin = DTYPES[rng.integers(0, 3)]
    tout = tin if rng.random() < 0.7 else DTYPES[rng.integers(0, 3)]
    kc = rng.random()
    k = 0.0 if kc < 0.5 else float(rng.uniform(0.2, 5.0)) * (
        -1.0 if kc > 0.85 else 1.0
    )
    ox = float(rng.uniform(-2, 2)) if rng.random() < 0.5 else 0.0
    oy = float(rng.uniform(-2, 2)) if rng.random() < 0.5 else 0.0
    gamma = bool(rng.random() < 0.3)
    alpha = int(rng.choice([0, 3])) if (ch == 4 and rng.random() < 0.5) else -1
    preset = PRESETS[rng.integers(0, len(PRESETS))]
    bits = 16 if np.dtype(tout).itemsize == 2 else 8
    if np.dtype(tout).kind == "f":
        bits = 8
    elif rng.random() < 0.25:
        # Sub-8/16-bit significant depth: the remainder is truncated
        # away by the ditherer (TrMul, avir.h:4351-4427).
        bits = int(rng.integers(1, bits))
    precision = "exact" if rng.random() < 0.15 else "auto"
    # Forced build mode (CImageResizerVars.BuildMode, avir.h:2530-2532):
    # every mode must deliver near-identical results.
    bm = int(rng.integers(0, 4)) if rng.random() < 0.25 else -1
    return dict(
        sw=sw, sh=sh, nw=nw, nh=nh, ch=ch, tin=tin, tout=tout,
        k=k, ox=ox, oy=oy, gamma=gamma, alpha=alpha, preset=preset,
        bits=bits, precision=precision, build_mode=bm,
    )


def _src_for(cfg, rng):
    shape = (cfg["sh"], cfg["sw"], cfg["ch"])
    if np.dtype(cfg["tin"]).kind == "f":
        return rng.random(shape, dtype=np.float32)
    hi = 256 if np.dtype(cfg["tin"]).itemsize == 1 else 65536
    return rng.integers(0, hi, shape, dtype=cfg["tin"])


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_avir_vs_host_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _gen_config(rng)
    src = _src_for(cfg, rng)

    rz = ImageResizer(
        res_bit_depth=cfg["bits"], params=avir_tpu.preset(cfg["preset"])
    )
    out = rz.resize(
        src, cfg["nw"], cfg["nh"], k=cfg["k"], ox=cfg["ox"], oy=cfg["oy"],
        out_dtype=cfg["tout"], use_srgb_gamma=cfg["gamma"],
        alpha_index=cfg["alpha"], precision=cfg["precision"],
        build_mode=cfg["build_mode"],
    )

    plan = build_resize_plan(
        cfg["sw"], cfg["sh"], cfg["nw"], cfg["nh"], cfg["ch"],
        np.dtype(cfg["tin"]), np.dtype(cfg["tout"]),
        k=cfg["k"], ox=cfg["ox"], oy=cfg["oy"],
        params=avir_tpu.preset(cfg["preset"]),
        res_bit_depth=cfg["bits"], use_srgb_gamma=cfg["gamma"],
        alpha_index=cfg["alpha"], build_mode=cfg["build_mode"],
    )
    ref = execute_plan_numpy(plan, src)

    assert out.shape == ref.shape, cfg
    assert out.dtype == ref.dtype, cfg
    if np.dtype(cfg["tout"]).kind == "f":
        peak = 1.0 if np.dtype(cfg["tin"]).kind == "f" else (
            255.0 if np.dtype(cfg["tin"]).itemsize == 1 else 65535.0
        )
        np.testing.assert_allclose(
            out, ref, rtol=0, atol=2e-4 * peak, err_msg=str(cfg)
        )
    else:
        peak = 255.0 if np.dtype(cfg["tout"]).itemsize == 1 else 65535.0
        maxdiff = np.abs(
            out.astype(np.float64) - ref.astype(np.float64)
        ).max()
        lsb_tol = 1 if peak == 255.0 else 4
        # Truncated depths quantize in 2^trunc-LSB steps; allow one.
        out_bits = 8 if peak == 255.0 else 16
        step = int(peak) / ((int(peak) >> (out_bits - cfg["bits"])))
        lsb_tol = max(lsb_tol, int(np.ceil(step)))
        assert maxdiff <= lsb_tol, (maxdiff, cfg)
        if out.size >= 64 and cfg["bits"] == out_bits:
            assert psnr(out, ref, peak) >= 60.0, cfg


def _run_lancir_host(plan, src, out_dtype):
    from avir_tpu.models.host_reference import apply_banded_numpy

    x = src.astype(np.float64)
    x = np.moveaxis(x, 1, 0)
    x = apply_banded_numpy(plan.h, x)
    x = np.moveaxis(x, 0, 1)
    x = apply_banded_numpy(plan.v, x)
    if plan.is_out_float:
        return (x * plan.out_mul).astype(np.float32)
    return np.rint(np.clip(x * plan.out_mul, 0, plan.clamp)).astype(
        out_dtype
    )


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_lancir_vs_host_oracle(seed):
    from avir_tpu import LancIR
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    rng = np.random.default_rng(5000 + seed)
    cfg = _gen_config(rng)
    kx, ky = cfg["k"], cfg["k"]
    if rng.random() < 0.5:
        ky = 0.0 if rng.random() < 0.5 else float(rng.uniform(0.2, 5.0))
    la = float(rng.uniform(2.0, 4.0)) if rng.random() < 0.5 else 3.0
    src = _src_for(cfg, rng)

    out = LancIR().resize(
        src, cfg["nw"], cfg["nh"], kx=kx, ky=ky,
        ox=cfg["ox"], oy=cfg["oy"], la=la, out_dtype=cfg["tout"],
    )
    plan = build_lancir_plan(
        cfg["sw"], cfg["sh"], cfg["nw"], cfg["nh"], cfg["ch"],
        np.dtype(cfg["tin"]), np.dtype(cfg["tout"]),
        kx=kx, ky=ky, ox=cfg["ox"], oy=cfg["oy"], la=la,
    )
    ref = _run_lancir_host(plan, src, np.dtype(cfg["tout"]))

    assert out.shape == ref.shape, cfg
    if np.dtype(cfg["tout"]).kind == "f":
        peak = 1.0 if np.dtype(cfg["tin"]).kind == "f" else (
            255.0 if np.dtype(cfg["tin"]).itemsize == 1 else 65535.0
        )
        np.testing.assert_allclose(
            out, ref, rtol=0, atol=2e-4 * peak, err_msg=str(cfg)
        )
    else:
        peak = 255.0 if np.dtype(cfg["tout"]).itemsize == 1 else 65535.0
        maxdiff = np.abs(
            out.astype(np.float64) - ref.astype(np.float64)
        ).max()
        lsb_tol = 1 if peak == 255.0 else 4
        assert maxdiff <= lsb_tol, (maxdiff, cfg)
        if out.size >= 64:
            assert psnr(out, ref, peak) >= 60.0, cfg
