"""End-to-end smoke tests for the imageresize-equivalent CLI
(avir_tpu/cli.py), covering the recovered flag surface of the
reference's prebuilt tool (/root/reference/README.md:234-249)."""

import json

import numpy as np
import pytest

from avir_tpu import cli, native

from conftest import xorshift128_fill


def _write_png(path, arr):
    path.write_bytes(native.png_encode(arr))


@pytest.fixture()
def rgb_png(tmp_path):
    src = xorshift128_fill((48, 64, 3), np.uint8, 101)
    p = tmp_path / "in.png"
    _write_png(p, src)
    return p, src


def test_basic_resize_png(tmp_path, rgb_png):
    inp, _ = rgb_png
    out = tmp_path / "out.png"
    assert cli.main([str(inp), str(out), "--out-size=32x24"]) == 0
    got = cli.load_image(str(out))
    assert got.shape == (24, 32, 3) and got.dtype == np.uint8


def test_aspect_auto_axis(tmp_path, rgb_png):
    inp, _ = rgb_png
    out = tmp_path / "out.png"
    assert cli.main([str(inp), str(out), "--out-size=32x0"]) == 0
    assert cli.load_image(str(out)).shape == (24, 32, 3)


def test_lancir_and_preset(tmp_path, rgb_png):
    inp, _ = rgb_png
    out = tmp_path / "l.png"
    assert cli.main(
        [str(inp), str(out), "--out-size=20x16", "--lancir"]
    ) == 0
    assert cli.load_image(str(out)).shape == (16, 20, 3)
    out2 = tmp_path / "u.png"
    assert cli.main(
        [str(inp), str(out2), "--out-size=20x16", "--algparams=ultra"]
    ) == 0


def test_lancir_rejects_gamma(tmp_path, rgb_png):
    inp, _ = rgb_png
    with pytest.raises(SystemExit):
        cli.main(
            [str(inp), str(tmp_path / "x.png"), "--out-size=20x16",
             "--lancir", "--gamma"]
        )


def test_dither_and_1bit(tmp_path, rgb_png):
    inp, _ = rgb_png
    out = tmp_path / "d.png"
    assert cli.main(
        [str(inp), str(out), "--out-size=24x16", "--dither"]
    ) == 0
    out1 = tmp_path / "b.png"
    assert cli.main(
        [str(inp), str(out1), "--out-size=24x16", "--dither", "--1bit"]
    ) == 0
    got = cli.load_image(str(out1))
    # 1-bit output quantizes to {0, 255}.
    assert set(np.unique(got)) <= {0, 255}
    with pytest.raises(SystemExit):
        cli.main(
            [str(inp), str(tmp_path / "y.png"), "--out-size=24x16",
             "--1bit"]
        )


def test_16bit_roundtrip_and_force8(tmp_path):
    src = xorshift128_fill((32, 40, 3), np.uint16, 7)
    inp = tmp_path / "in16.png"
    _write_png(inp, src)
    out = tmp_path / "out16.png"
    assert cli.main([str(inp), str(out), "--out-size=20x16"]) == 0
    assert cli.load_image(str(out)).dtype == np.uint16
    out8 = tmp_path / "out8.png"
    assert cli.main(
        [str(inp), str(out8), "--out-size=20x16", "--force-8bit"]
    ) == 0
    assert cli.load_image(str(out8)).dtype == np.uint8


def test_gamma_alpha_zero_flush(tmp_path):
    """--zero-flush zeroes whole INPUT pixels (RGB and alpha) below
    the alpha threshold BEFORE resizing — semantics verified against
    the shipped imageresize binary (tests/test_reference_binary.py)."""
    import avir_tpu

    src = xorshift128_fill((32, 32, 4), np.uint8, 31)
    src[:8, :8, 3] = 0  # transparent corner
    inp = tmp_path / "in.png"
    _write_png(inp, src)
    out = tmp_path / "out.png"
    assert cli.main(
        [str(inp), str(out), "--out-size=16x16", "--gamma",
         "--zero-flush=8"]
    ) == 0
    got = cli.load_image(str(out))
    assert got.shape == (16, 16, 4)
    flushed = np.array(src)
    flushed[src[:, :, 3] < 8] = 0
    rz = avir_tpu.ImageResizer(res_bit_depth=8, src_bit_depth=8)
    expect = rz.resize(
        flushed, 16, 16, use_srgb_gamma=True, alpha_index=3
    )
    np.testing.assert_array_equal(got, expect)


def test_auto_scale(tmp_path, rgb_png, capsys):
    inp, _ = rgb_png
    out = tmp_path / "s.png"
    assert cli.main(
        [str(inp), str(out), "--auto-scale=0.5;1.0"]
    ) == 0
    produced = json.loads(capsys.readouterr().out)["__file-list"]
    assert len(produced) == 2
    # reference-tool format: suffix "-N", {"f": idx, "w":, "h":}
    sizes = sorted((v["w"], v["h"]) for v in produced.values())
    assert sizes == [(32, 24), (64, 48)]
    for path in produced:
        assert path.endswith(("-1.png", "-2.png"))
        assert cli.load_image(path) is not None


def test_crop_and_fit(tmp_path, rgb_png):
    inp, _ = rgb_png
    out = tmp_path / "c.png"
    assert cli.main(
        [str(inp), str(out), "--out-size=16x16", "--crop=11"]
    ) == 0
    assert cli.load_image(str(out)).shape == (16, 16, 3)
    outf = tmp_path / "f.png"
    assert cli.main(
        [str(inp), str(outf), "--out-size=32x32", "--fit"]
    ) == 0
    # 64x48 fits into 32x32 as 32x24.
    assert cli.load_image(str(outf)).shape == (24, 32, 3)
    with pytest.raises(SystemExit):
        cli.main(
            [str(inp), str(tmp_path / "z.png"), "--out-size=16x16",
             "--crop=11", "--fit"]
        )


def test_reflection(tmp_path, rgb_png):
    """Reflection output is RGBA: flipped rows appended after the
    resize, faded via the alpha channel (semantics verified against
    the shipped binary, tests/test_reference_binary.py)."""
    inp, _ = rgb_png
    out = tmp_path / "r.png"
    assert cli.main(
        [str(inp), str(out), "--out-size=32x24", "--reflection=8*0.5"]
    ) == 0
    got = cli.load_image(str(out))
    assert got.shape == (32, 32, 4)
    assert (got[:24, :, 3] == 255).all()
    np.testing.assert_array_equal(got[24:, :, :3], got[16:24, :, :3][::-1])
    ramp = np.rint(255.0 * np.linspace(0.5, 0.0, 8)).astype(int)
    np.testing.assert_array_equal(got[24:, 0, 3].astype(int), ramp)


def test_jpeg_output(tmp_path, rgb_png):
    inp, _ = rgb_png
    out = tmp_path / "o.jpg"
    assert cli.main(
        [str(inp), str(out), "--out-size=32x24", "--out-quality=85",
         "--jpeg-low-cs"]
    ) == 0
    assert cli.load_image(str(out)).shape == (24, 32, 3)
    # --jpeg-low-cs must emit 4:2:2 (the reference binary's usage
    # string: "4:2:2 chrominance sub-sampling"), i.e. luma sampled
    # 2x1 relative to 1x1 chroma — NOT 4:2:0's 2x2.
    from PIL import Image, JpegImagePlugin

    with Image.open(out) as im:
        assert JpegImagePlugin.get_sampling(im) == 1  # 4:2:2

    out444 = tmp_path / "o444.jpg"
    assert cli.main(
        [str(inp), str(out444), "--out-size=32x24", "--out-quality=85"]
    ) == 0
    with Image.open(out444) as im:
        assert JpegImagePlugin.get_sampling(im) == 0  # 4:4:4
