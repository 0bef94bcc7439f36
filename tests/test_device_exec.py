"""Device-path golden tests: the jitted JAX executors vs outputs of the
compiled reference library, on every golden config.

Arithmetic differs from the reference (float32 composed-band matmuls vs
the reference's stepwise float32 scanline walks), so integer outputs are
gated at small-LSB maxdiff plus >= 60 dB PSNR, floats at 1e-4 absolute
(values are in the input's integer range for the f32 configs).
"""

import numpy as np
import pytest

from conftest import load_golden, psnr, xorshift128_fill

import avir_tpu
from avir_tpu import ImageResizer, LancIR

from test_plan_golden import _M, AVIR_CONFIGS, LANCIR_CONFIGS, DT


@pytest.mark.parametrize("name", AVIR_CONFIGS)
def test_avir_device_golden(name):
    cfg = _M[name]
    src = xorshift128_fill(
        (cfg["sh"], cfg["sw"], cfg["ch"]), DT[cfg["tin"]], cfg["seed"]
    )
    rz = ImageResizer(
        res_bit_depth=cfg["bitdepth"],
        params=avir_tpu.preset(cfg["preset"]),
    )
    out = rz.resize(
        src, cfg["nw"], cfg["nh"],
        k=cfg["k"], ox=cfg["ox"], oy=cfg["oy"],
        out_dtype=DT[cfg["tout"]],
        use_srgb_gamma=bool(cfg["gamma"]),
        alpha_index=cfg["alphaidx"],
        dither=("errdiff" if cfg["dither"] == "errd" else "default"),
    )
    ref = load_golden(name)
    assert out.shape == ref.shape
    assert out.dtype == ref.dtype

    if cfg["tout"] in ("f32", "f64"):
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)
    else:
        peak = 255.0 if cfg["tout"] == "u8" else 65535.0
        maxdiff = np.abs(
            out.astype(np.float64) - ref.astype(np.float64)
        ).max()
        lsb_tol = 1 if cfg["tout"] == "u8" else 4
        # One quantization step for error diffusion (tie-break noise in
        # the serial recurrence; see test_plan_golden).
        out_bits = 8 if cfg["tout"] == "u8" else 16
        if cfg["dither"] == "errd":
            # one quantization step plus the device pipeline's own LSB
            lsb_tol = lsb_tol + (1 << (out_bits - cfg["bitdepth"]))
        assert maxdiff <= lsb_tol, f"maxdiff {maxdiff}"
        assert psnr(out, ref, peak) >= 60.0


@pytest.mark.parametrize("name", LANCIR_CONFIGS)
def test_lancir_device_golden(name):
    cfg = _M[name]
    src = xorshift128_fill(
        (cfg["sh"], cfg["sw"], cfg["ch"]), DT[cfg["tin"]], cfg["seed"]
    )
    out = LancIR().resize(
        src, cfg["nw"], cfg["nh"],
        kx=cfg["kx"], ky=cfg["ky"], ox=cfg["ox"], oy=cfg["oy"],
        la=cfg["la"], out_dtype=DT[cfg["tout"]],
    )
    ref = load_golden(name)
    assert out.shape == ref.shape

    if cfg["tout"] in ("f32", "f64"):
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-4)
    else:
        peak = 255.0 if cfg["tout"] == "u8" else 65535.0
        maxdiff = np.abs(
            out.astype(np.float64) - ref.astype(np.float64)
        ).max()
        lsb_tol = 1 if cfg["tout"] == "u8" else 4
        assert maxdiff <= lsb_tol, f"maxdiff {maxdiff}"
        assert psnr(out, ref, peak) >= 60.0


def test_grayscale_2d_roundtrip():
    src = xorshift128_fill((40, 30), np.uint8, 77)
    out = avir_tpu.resize(src, 45, 60)
    assert out.shape == (60, 45)
    assert out.dtype == np.uint8


def test_fast_mode_quality():
    """bf16 fast mode must still clear 50 dB PSNR vs the exact path."""
    cfg = _M["a_readme"]
    src = xorshift128_fill(
        (cfg["sh"], cfg["sw"], cfg["ch"]), np.uint8, cfg["seed"]
    )
    exact = avir_tpu.resize(src, cfg["nw"], cfg["nh"])
    fastv = avir_tpu.resize(src, cfg["nw"], cfg["nh"], precision="fast")
    assert psnr(exact, fastv, 255.0) >= 50.0
