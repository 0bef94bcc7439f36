"""End-to-end parity against the reference's SHIPPED binary.

The golden suite pins the math against oracles dumped by compiling the
reference headers (tests/golden); this module additionally runs the
author's prebuilt ``imageresize`` executable
(/root/reference/bin/linux-x64/imageresize) on this host and compares
our CLI's output files pixel-for-pixel — covering the full user-facing
path (PNG decode, flag semantics, resize, quantize, PNG encode) against
the exact artifact a reference user would run.

Skipped when the binary is absent or not runnable on this platform.
"""

import os
import pathlib
import shutil
import stat
import subprocess

import numpy as np
import pytest
from PIL import Image

from conftest import psnr, xorshift128_fill

REF_BIN = pathlib.Path("/root/reference/bin/linux-x64/imageresize")


@pytest.fixture(scope="module")
def ref_bin(tmp_path_factory):
    if not REF_BIN.exists():
        pytest.skip("reference binary not present")
    d = tmp_path_factory.mktemp("refbin")
    exe = d / "imageresize"
    shutil.copy(REF_BIN, exe)
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR)
    probe = subprocess.run(
        [str(exe)], capture_output=True, text=True, timeout=60
    )
    if "imageresize" not in (probe.stdout + probe.stderr):
        pytest.skip("reference binary not runnable here")
    return exe


def _run_pair(ref_bin, tmp_path, img, size, ref_flags, our_args, name):
    src = tmp_path / f"{name}_in.png"
    Image.fromarray(img).save(src)
    ref_out = tmp_path / f"{name}_ref.png"
    our_out = tmp_path / f"{name}_ours.png"
    subprocess.run(
        [str(ref_bin), str(src), str(ref_out), size] + ref_flags,
        check=True, capture_output=True, timeout=300,
    )
    from avir_tpu.cli import main as cli_main

    rc = cli_main(
        [str(src), str(our_out), f"--out-size={size}"] + our_args
    )
    assert rc == 0
    a = np.asarray(Image.open(ref_out)).astype(np.int64)
    b = np.asarray(Image.open(our_out)).astype(np.int64)
    if a.ndim == 3 and b.ndim == 2:
        # the binary's decoder upconverts grayscale PNGs to RGB; ours
        # keeps them grayscale — identical per channel
        b = np.repeat(b[:, :, None], a.shape[2], axis=2)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    return a, b


CASES = [
    # (name, size, ref flags, our CLI args, max LSB, min PSNR)
    ("down_def", "97x73", [], [], 1, 70.0),
    ("up_def", "151x83", [], [], 1, 70.0),
    ("down_ultra", "80x60", ["--algparams=ultra"],
     ["--algparams=ultra"], 1, 70.0),
    ("down_ulr", "80x60", ["--algparams=ulr"],
     ["--algparams=ulr"], 1, 70.0),
    ("gamma", "80x60", ["-g"], ["--gamma"], 2, 62.0),
    ("lancir", "97x73", ["--lancir"], ["--lancir"], 1, 70.0),
    # error diffusion is a serial recurrence: f32-vs-f64 noise in the
    # pre-dither image can flip individual quantization steps, so gate
    # on PSNR with a small LSB allowance
    ("dither", "64x48", ["--dither"], ["--dither"], 3, 52.0),
]


@pytest.mark.parametrize(
    "name,size,rflags,oargs,lsb,min_psnr",
    CASES, ids=[c[0] for c in CASES],
)
def test_binary_parity(
    ref_bin, tmp_path, name, size, rflags, oargs, lsb, min_psnr
):
    img = xorshift128_fill((120, 160, 3), np.uint8, 4242)
    a, b = _run_pair(ref_bin, tmp_path, img, size, rflags, oargs, name)
    maxdiff = np.abs(a - b).max()
    assert maxdiff <= lsb, (name, maxdiff)
    # The 1-LSB bound holds on every backend; the PSNR thresholds were
    # calibrated on the CPU backend.  On real TPU the split-bf16
    # route's half-LSB tie rounding lands differently (same ops,
    # different fusion/rounding order in hardware), flipping ~1% of
    # pixels by one step vs the binary (measured 63.6-66.9 dB at the
    # 70-dB cases) — still above the 60-dB quality gate.
    import jax

    if jax.default_backend() not in ("cpu", "gpu"):
        min_psnr = min(min_psnr, 62.0)
    assert psnr(a, b, 255.0) >= min_psnr, (name, psnr(a, b, 255.0))


@pytest.mark.parametrize("seed", range(6))
def test_binary_parity_fuzz(ref_bin, tmp_path, seed):
    """Randomized geometry/preset sweep against the shipped binary —
    odd sizes, channel counts and presets the hand-picked cases miss."""
    rng = np.random.default_rng(7000 + seed)
    sw = int(rng.integers(16, 200))
    sh = int(rng.integers(16, 200))
    nw = int(rng.integers(8, 220))
    nh = int(rng.integers(8, 220))
    ch = int(rng.choice([1, 3, 4]))
    preset = str(rng.choice(["def", "low", "high", "lr"]))
    img = xorshift128_fill((sh, sw, ch), np.uint8, 7100 + seed)
    if ch == 1:
        img = img[:, :, 0]  # PIL grayscale
    a, b = _run_pair(
        ref_bin, tmp_path, img, f"{nw}x{nh}",
        [f"--algparams={preset}"], [f"--algparams={preset}"],
        f"fuzz{seed}",
    )
    assert np.abs(a - b).max() <= 1, (seed, sw, sh, nw, nh, ch, preset)


def test_binary_parity_zero_dim_autocalc(ref_bin, tmp_path):
    """'WIDTHx0' proportional auto-calculation matches the binary."""
    img = xorshift128_fill((120, 160, 3), np.uint8, 611)
    a, b = _run_pair(
        ref_bin, tmp_path, img, "80x0", [], [], "autocalc"
    )
    assert a.shape == (60, 80, 3)
    assert np.abs(a - b).max() <= 1


def test_binary_parity_png48(ref_bin, tmp_path):
    """16-bit (PNG-48) pipeline end to end, plus --force-8bit."""
    from avir_tpu import native
    from avir_tpu.cli import main as cli_main

    img16 = xorshift128_fill((60, 80, 3), np.uint16, 555)
    src = tmp_path / "in16.png"
    src.write_bytes(native.png_encode(img16))

    ref_out = tmp_path / "ref16.png"
    our_out = tmp_path / "ours16.png"
    subprocess.run(
        [str(ref_bin), str(src), str(ref_out), "50x40"],
        check=True, capture_output=True, timeout=300,
    )
    assert cli_main([str(src), str(our_out), "--out-size=50x40"]) == 0
    a = native.png_decode(ref_out.read_bytes()).astype(np.int64)
    b = native.png_decode(our_out.read_bytes()).astype(np.int64)
    assert a.shape == b.shape and a.dtype == b.dtype
    # 16-bit outputs: the reference computes f32, we split-bf16 — a few
    # 16-bit LSBs of noise; gate tight via PSNR + small LSB bound.
    assert np.abs(a - b).max() <= 8, np.abs(a - b).max()
    assert psnr(a, b, 65535.0) >= 80.0

    ref8 = tmp_path / "ref8.png"
    our8 = tmp_path / "ours8.png"
    subprocess.run(
        [str(ref_bin), str(src), str(ref8), "50x40", "--force-8bit"],
        check=True, capture_output=True, timeout=300,
    )
    assert cli_main(
        [str(src), str(our8), "--out-size=50x40", "--force-8bit"]
    ) == 0
    a8 = np.asarray(Image.open(ref8)).astype(np.int64)
    b8 = np.asarray(Image.open(our8)).astype(np.int64)
    assert a8.shape == b8.shape
    assert np.abs(a8 - b8).max() <= 1


def test_binary_parity_1bit_dither(ref_bin, tmp_path):
    """--1bit dithered output (the reference's dither-quality
    evaluation mode): identical density within 2%, both strictly
    2-valued."""
    from avir_tpu.cli import main as cli_main

    img = xorshift128_fill((96, 128, 1), np.uint8, 787)[:, :, 0]
    src = tmp_path / "g.png"
    Image.fromarray(img).save(src)
    ref_out = tmp_path / "ref1.png"
    our_out = tmp_path / "ours1.png"
    subprocess.run(
        [str(ref_bin), str(src), str(ref_out), "96x72", "--dither",
         "-1"],
        check=True, capture_output=True, timeout=300,
    )
    assert cli_main(
        [str(src), str(our_out), "--out-size=96x72", "--dither",
         "--1bit"]
    ) == 0
    a = np.asarray(Image.open(ref_out)).astype(np.int64)
    b = np.asarray(Image.open(our_out)).astype(np.int64)
    assert set(np.unique(a)) <= {0, 255}
    assert set(np.unique(b)) <= {0, 255}
    # the serial error-diffusion recurrence amplifies f32-vs-f64 noise
    # into different (but statistically equivalent) dot patterns
    assert abs(a.mean() - b.mean()) <= 0.02 * 255.0


def test_binary_parity_zero_flush(ref_bin, tmp_path):
    """--zero-flush RGBA filtration semantics match."""
    from avir_tpu.cli import main as cli_main

    img = xorshift128_fill((80, 100, 4), np.uint8, 901)
    src = tmp_path / "rgba.png"
    Image.fromarray(img).save(src)
    ref_out = tmp_path / "refz.png"
    our_out = tmp_path / "oursz.png"
    subprocess.run(
        [str(ref_bin), str(src), str(ref_out), "60x48",
         "--zero-flush=64"],
        check=True, capture_output=True, timeout=300,
    )
    assert cli_main(
        [str(src), str(our_out), "--out-size=60x48", "--zero-flush=64"]
    ) == 0
    a = np.asarray(Image.open(ref_out)).astype(np.int64)
    b = np.asarray(Image.open(our_out)).astype(np.int64)
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= 1


def test_binary_parity_reflection(ref_bin, tmp_path):
    """--reflection effect: output RGBA with alpha-faded flipped rows
    appended AFTER resizing (height in output pixels)."""
    img = xorshift128_fill((60, 80, 3), np.uint8, 313)
    a, b = _run_pair(
        ref_bin, tmp_path, img, "40x0",
        ["--reflection=15*0.4*0.0"], ["--reflection=15*0.4*0.0"],
        "refl3",
    )
    assert a.shape == (45, 40, 4)
    assert np.abs(a - b).max() <= 1
    rgba = xorshift128_fill((40, 50, 4), np.uint8, 314)
    a, b = _run_pair(
        ref_bin, tmp_path, rgba, "25x0",
        ["--reflection=10*0.8*0.2"], ["--reflection=10*0.8*0.2"],
        "refl4",
    )
    assert a.shape == (30, 25, 4)
    assert np.abs(a - b).max() <= 1


def test_binary_parity_autoscale_reflection(ref_bin, tmp_path):
    """--auto-scale + --reflection: resize first, reflection height
    scaled by the factor (output naming schemes differ; pixel content
    compared)."""
    from avir_tpu.cli import main as cli_main

    img = xorshift128_fill((60, 80, 3), np.uint8, 321)
    src = tmp_path / "as_in.png"
    Image.fromarray(img).save(src)
    subprocess.run(
        [str(ref_bin), str(src), str(tmp_path / "as_ref.png"),
         "80x60", "--auto-scale=0.5", "--reflection=10*0.5"],
        check=True, capture_output=True, timeout=300,
    )
    assert cli_main(
        [str(src), str(tmp_path / "as_ours.png"), "--out-size=80x60",
         "--auto-scale=0.5", "--reflection=10*0.5"]
    ) == 0
    a = np.asarray(Image.open(tmp_path / "as_ref-1.png")).astype(int)
    b = np.asarray(
        Image.open(tmp_path / "as_ours-1.png")
    ).astype(int)
    assert a.shape == b.shape == (35, 40, 4)
    assert np.abs(a - b).max() <= 1


def test_binary_parity_fit_and_crop(ref_bin, tmp_path):
    """--fit and --crop geometry semantics match the binary."""
    img = xorshift128_fill((90, 160, 3), np.uint8, 77)
    a, b = _run_pair(
        ref_bin, tmp_path, img, "64x64", ["--fit"], ["--fit"], "fit"
    )
    assert np.abs(a - b).max() <= 1
    a, b = _run_pair(
        ref_bin, tmp_path, img, "64x64", ["--crop=11"], ["--crop=11"],
        "crop",
    )
    assert np.abs(a - b).max() <= 1
