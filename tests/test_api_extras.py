"""Batch API and plan-cache tests."""

import numpy as np

import avir_tpu
from avir_tpu.plan.cache import build_resize_plan_cached
from avir_tpu.plan.plan import build_resize_plan

from conftest import xorshift128_fill


def test_resize_batch_matches_loop():
    batch = np.stack(
        [xorshift128_fill((40, 56, 3), np.uint8, 100 + i) for i in range(3)]
    )
    rz = avir_tpu.ImageResizer()
    got = rz.resize_batch(batch, 28, 20)
    assert got.shape == (3, 20, 28, 3)
    for i in range(3):
        single = rz.resize(batch[i], 28, 20)
        assert np.abs(got[i].astype(int) - single.astype(int)).max() <= 1


def test_degenerate_inputs():
    """Degenerate-size behavior mirrors the reference: zero source ->
    blank output (avir.h:4686-4697), zero target -> error, 1-pixel
    sources resize by edge replication."""
    import pytest

    rz = avir_tpu.ImageResizer()
    out = rz.resize(np.zeros((0, 0, 3), dtype=np.uint8), 8, 6)
    assert out.shape == (6, 8, 3) and not out.any()
    lz = avir_tpu.LancIR()
    out = lz.resize(np.zeros((0, 5, 3), dtype=np.uint8), 8, 6)
    assert out.shape == (6, 8, 3) and not out.any()
    with pytest.raises(ValueError):
        rz.resize(np.zeros((4, 4, 3), dtype=np.uint8), 0, 6)
    with pytest.raises(ValueError):
        lz.resize(np.zeros((4, 4, 3), dtype=np.uint8), 8, 0)

    one = np.full((1, 1, 3), 200, dtype=np.uint8)
    out = rz.resize(one, 5, 4)
    assert out.shape == (4, 5, 3)
    assert np.abs(out.astype(int) - 200).max() <= 1
    out = lz.resize(one, 5, 4)
    assert np.abs(out.astype(int) - 200).max() <= 1


def test_plan_cache_roundtrip(tmp_path):
    kwargs = dict(
        src_w=97, src_h=61, new_w=151, new_h=83, el_count=3,
        in_dtype=np.uint8, out_dtype=np.uint8,
    )
    p1 = build_resize_plan_cached(cache_dir=tmp_path, **kwargs)
    assert len(list(tmp_path.glob("plan_*.npz"))) == 1
    p2 = build_resize_plan_cached(cache_dir=tmp_path, **kwargs)  # hit
    ref = build_resize_plan(**kwargs)
    for ax in ("h", "v"):
        a, b, c = (
            getattr(p1, ax).op, getattr(p2, ax).op, getattr(ref, ax).op
        )
        np.testing.assert_array_equal(b.starts, c.starts)
        np.testing.assert_array_equal(b.taps, c.taps)
        np.testing.assert_array_equal(a.taps, c.taps)
        assert b.n_in == c.n_in and b.n_out == c.n_out


def test_plan_cache_used_by_resizer(tmp_path, monkeypatch):
    monkeypatch.setenv("AVIR_TPU_CACHE", str(tmp_path))
    src = xorshift128_fill((40, 56, 3), np.uint8, 9)
    rz = avir_tpu.ImageResizer(plan_cache=True)
    out1 = rz.resize(src, 28, 20)
    assert len(list(tmp_path.glob("plan_*.npz"))) == 1
    rz2 = avir_tpu.ImageResizer(plan_cache=True)
    out2 = rz2.resize(src, 28, 20)
    np.testing.assert_array_equal(out1, out2)


def test_float64_dtype_round_trip():
    """float64 images (the reference's fptype=double mode,
    avir.h:4569-4592) keep their dtype through both drivers; device
    compute is float32, so values agree with the f32 route."""
    src = xorshift128_fill((40, 30, 3), np.float64, 12)
    out = avir_tpu.resize(src, 20, 15)
    assert out.dtype == np.float64
    out32 = avir_tpu.resize(src.astype(np.float32), 20, 15)
    np.testing.assert_allclose(out, out32, rtol=0, atol=1e-5)

    lout = avir_tpu.lancir_resize(src, 20, 15)
    assert lout.dtype == np.float64


def test_f64_host_route_matches_golden():
    """precision="f64" computes in true float64 on the host oracle
    (the reference's fptype=double mode, avir.h:4569-4592) and matches
    the golden a_f64 dump at the host tolerance."""
    import json

    from conftest import GOLDEN_DIR, load_golden

    with open(GOLDEN_DIR / "manifest.json") as f:
        cfg = json.load(f)["a_f64"]
    src = xorshift128_fill(
        (cfg["sh"], cfg["sw"], cfg["ch"]), np.float64, cfg["seed"]
    )
    rz = avir_tpu.ImageResizer(res_bit_depth=cfg["bitdepth"])
    out = rz.resize(src, cfg["nw"], cfg["nh"], precision="f64")
    assert out.dtype == np.float64
    ref = load_golden("a_f64")
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-7)
    # engine="host" is the same route
    out2 = rz.resize(src, cfg["nw"], cfg["nh"], engine="host")
    np.testing.assert_array_equal(out, out2)


def test_f64_host_route_int_and_errdiff():
    """The host route covers integer outputs (incl. error diffusion via
    the native scan) and stays within 1 LSB of the device route."""
    src = xorshift128_fill((48, 64, 3), np.uint8, 77)
    rz = avir_tpu.ImageResizer()
    host = rz.resize(src, 32, 24, precision="f64")
    dev = rz.resize(src, 32, 24)
    assert host.dtype == np.uint8
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1

    hd = rz.resize(src, 32, 24, precision="f64", dither="errdiff")
    assert hd.dtype == np.uint8 and hd.shape == (24, 32, 3)
    # errdiff quantization noise stays bounded vs the undithered image
    assert np.abs(hd.astype(int) - host.astype(int)).max() <= 2


def test_f64_lancir_host_route():
    """LANCIR precision="f64" runs the float64 host oracle and matches
    the device route within 1 LSB (u8) / 5e-7 (float)."""
    src = xorshift128_fill((40, 56, 3), np.uint8, 31)
    lz = avir_tpu.LancIR()
    host = lz.resize(src, 28, 20, precision="f64")
    dev = lz.resize(src, 28, 20)
    assert host.dtype == np.uint8
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1

    srcf = xorshift128_fill((30, 40, 2), np.float64, 32)
    outf = lz.resize(srcf, 50, 60, precision="f64")
    assert outf.dtype == np.float64
    ref32 = lz.resize(srcf.astype(np.float32), 50, 60)
    np.testing.assert_allclose(outf, ref32, rtol=0, atol=5e-5)


def test_out_param_strided_destination():
    """out= writes the result into a preallocated (possibly strided)
    destination — the reference's NewBuf + NewSSize output contract
    (avir.h:4680-4692, lancir.h:260-307)."""
    src = xorshift128_fill((48, 64, 3), np.uint8, 21)
    big = np.zeros((60, 80, 3), dtype=np.uint8)
    view = big[10:34, 20:52]  # [24, 32, 3] strided destination
    rz = avir_tpu.ImageResizer()
    ret = rz.resize(src, 32, 24, out=view)
    assert ret is view
    np.testing.assert_array_equal(view, rz.resize(src, 32, 24))
    assert not big[:10].any() and not big[34:].any()  # no overwrite

    lz = avir_tpu.LancIR()
    view2 = big[10:34, 20:52]
    ret2 = lz.resize(src, 32, 24, out=view2)
    assert ret2 is view2
    np.testing.assert_array_equal(view2, lz.resize(src, 32, 24))

    import pytest

    with pytest.raises(ValueError):
        rz.resize(src, 32, 24, out=np.zeros((5, 5, 3), np.uint8))


def test_vmapped_paths_disable_lane_split(monkeypatch):
    """Batch and traceable executors must be built with
    split_lanes=False: the interior/boundary lane split's aliased
    out_init input cannot carry a batch dimension through the Mosaic
    lowering (ANY-space blocks need trivial index maps), so a vmapped
    split executor fails to compile on TPU."""
    import avir_tpu.models.avir as mavir
    import avir_tpu.models.lancir as mlancir
    import avir_tpu.models.runtime as mrt

    captured = []
    orig = mrt.make_avir_executor

    def spy(plan, *a, **kw):
        captured.append(kw)
        return orig(plan, *a, **kw)

    # patch the source module (covers in-function imports) AND the
    # drivers' bound globals
    monkeypatch.setattr(mrt, "make_avir_executor", spy)
    monkeypatch.setattr(mavir, "make_avir_executor", spy)
    batch = np.stack(
        [xorshift128_fill((24, 32, 3), np.uint8, i) for i in range(2)]
    )
    avir_tpu.ImageResizer().resize_batch(batch, 16, 12)
    assert captured and captured[-1].get("split_lanes") is False
    avir_tpu.make_resize_fn((24, 32, 3), np.uint8, 16, 12)
    assert captured[-1].get("split_lanes") is False

    captured2 = []
    orig_l = mrt.make_lancir_executor

    def spy_l(plan, *a, **kw):
        captured2.append(kw)
        return orig_l(plan, *a, **kw)

    monkeypatch.setattr(mrt, "make_lancir_executor", spy_l)
    monkeypatch.setattr(mlancir, "make_lancir_executor", spy_l)
    avir_tpu.LancIR().resize_batch(batch, 16, 12)
    assert captured2 and captured2[-1].get("split_lanes") is False
    avir_tpu.make_lancir_resize_fn((24, 32, 3), np.uint8, 16, 12)
    assert captured2[-1].get("split_lanes") is False


def test_lancir_resize_batch():
    """LANCIR batch resize (the video-batching role of the reference's
    stateful CLancIR buffer reuse, lancir.h:319-324) matches per-frame
    results."""
    batch = np.stack(
        [xorshift128_fill((48, 64, 3), np.uint8, 200 + i) for i in range(3)]
    )
    lz = avir_tpu.LancIR()
    got = lz.resize_batch(batch, 40, 30)
    assert got.shape == (3, 30, 40, 3) and got.dtype == np.uint8
    for i in range(3):
        single = lz.resize(batch[i], 40, 30)
        np.testing.assert_array_equal(got[i], single)
    # f64 precision routes per frame through the host oracle
    gf = lz.resize_batch(batch, 40, 30, precision="f64")
    assert np.abs(gf.astype(int) - got.astype(int)).max() <= 1


def test_custom_ditherer_slot():
    """dither= accepts a callable — the extension slot the reference
    exposes as the fpclass ditherer template parameter
    (avir.h:4569-4592), with RndSeed plumbed through
    (avir.h:2533-2535)."""
    calls = []

    def noise_dither(img, trunc_bits, out_max, rnd_seed):
        calls.append((img.shape, trunc_bits, out_max, rnd_seed))
        rng = np.random.default_rng(rnd_seed)
        noisy = img + rng.uniform(-0.5, 0.5, img.shape)
        return np.clip(np.floor(noisy + 0.5), 0, out_max)

    src = xorshift128_fill((48, 64, 3), np.uint8, 99)
    rz = avir_tpu.ImageResizer()
    out1 = rz.resize(src, 32, 24, dither=noise_dither, rnd_seed=1)
    out2 = rz.resize(src, 32, 24, dither=noise_dither, rnd_seed=2)
    base = rz.resize(src, 32, 24)
    assert out1.dtype == np.uint8 and out1.shape == (24, 32, 3)
    assert calls and calls[0] == ((24, 32, 3), 0, 255.0, 1)
    assert not np.array_equal(out1, out2)  # rnd_seed reaches the slot
    assert np.abs(out1.astype(int) - base.astype(int)).max() <= 2

    # host engine routes through the same slot
    outh = rz.resize(
        src, 32, 24, dither=noise_dither, rnd_seed=1, precision="f64"
    )
    assert np.abs(outh.astype(int) - out1.astype(int)).max() <= 1

    # batch path falls back to per-image host finishing
    outb = rz.resize_batch(
        np.stack([src, src]), 32, 24, dither=noise_dither, rnd_seed=1
    )
    np.testing.assert_array_equal(outb[0], out1)


def test_strided_view_roi_input():
    """Both drivers accept strided sub-rectangle views of a larger
    buffer (the reference's SrcScanlineSize / SrcSSize stride contract,
    avir.h:4680-4692, lancir.h:260-307) and produce output identical to
    resizing a contiguous copy of the window.  The host engine reads
    the view through its strides without a flattening copy."""
    big = xorshift128_fill((100, 140, 3), np.uint8, 55)
    view = big[20:68, 30:94]          # [48, 64, 3] non-contiguous
    assert not view.flags["C_CONTIGUOUS"]
    dense = np.ascontiguousarray(view)

    rz = avir_tpu.ImageResizer()
    np.testing.assert_array_equal(
        rz.resize(view, 32, 24), rz.resize(dense, 32, 24)
    )
    np.testing.assert_array_equal(
        rz.resize(view, 32, 24, precision="f64"),
        rz.resize(dense, 32, 24, precision="f64"),
    )
    lz = avir_tpu.LancIR()
    np.testing.assert_array_equal(
        lz.resize(view, 32, 24), lz.resize(dense, 32, 24)
    )
    np.testing.assert_array_equal(
        lz.resize(view, 32, 24, precision="f64"),
        lz.resize(dense, 32, 24, precision="f64"),
    )

    # channel-strided view (e.g. dropping alpha from RGBA in place)
    rgba = xorshift128_fill((40, 56, 4), np.uint8, 56)
    rgb_view = rgba[:, :, :3]
    np.testing.assert_array_equal(
        rz.resize(rgb_view, 28, 20),
        rz.resize(np.ascontiguousarray(rgb_view), 28, 20),
    )


def test_make_resize_fn_traceable():
    """make_resize_fn composes under the caller's jit/vmap and matches
    the host-driver route."""
    import jax
    import jax.numpy as jnp

    import avir_tpu

    rng = np.random.default_rng(9)
    batch = rng.integers(0, 256, (3, 60, 80, 3), dtype=np.uint8)
    fn = avir_tpu.make_resize_fn((60, 80, 3), np.uint8, 40, 30)

    out = np.asarray(jax.jit(jax.vmap(fn))(jnp.asarray(batch)))
    assert out.shape == (3, 30, 40, 3) and out.dtype == np.uint8
    for i in range(3):
        ref = avir_tpu.resize(batch[i], 40, 30)
        assert np.abs(out[i].astype(int) - ref.astype(int)).max() <= 1

    # grayscale 2-D shape, float output, gamma
    g = rng.integers(0, 256, (50, 70), dtype=np.uint8)
    fng = avir_tpu.make_resize_fn(
        (50, 70), np.uint8, 35, 25, out_dtype=np.float32,
        use_srgb_gamma=True,
    )
    og = np.asarray(jax.jit(fng)(jnp.asarray(g)))
    assert og.shape == (25, 35) and og.dtype == np.float32
    rz = avir_tpu.ImageResizer()
    ref = rz.resize(g, 35, 25, out_dtype=np.float32, use_srgb_gamma=True)
    assert np.abs(og - ref).max() <= 1e-3


def test_make_lancir_resize_fn_traceable():
    import jax
    import jax.numpy as jnp

    import avir_tpu

    rng = np.random.default_rng(13)
    batch = rng.integers(0, 256, (2, 48, 64, 3), dtype=np.uint8)
    fn = avir_tpu.make_lancir_resize_fn((48, 64, 3), np.uint8, 80, 56)
    out = np.asarray(jax.jit(jax.vmap(fn))(jnp.asarray(batch)))
    assert out.shape == (2, 56, 80, 3) and out.dtype == np.uint8
    for i in range(2):
        ref = avir_tpu.lancir_resize(batch[i], 80, 56)
        assert np.abs(out[i].astype(int) - ref.astype(int)).max() <= 1


def test_make_resize_fn_flat_layout():
    """flat=True speaks the executors' native [H, W*C] contract."""
    import jax
    import jax.numpy as jnp

    import avir_tpu

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
    fn = avir_tpu.make_resize_fn(
        (60, 80, 3), np.uint8, 40, 30, flat=True
    )
    out = np.asarray(jax.jit(fn)(jnp.asarray(img.reshape(60, 240))))
    assert out.shape == (30, 40 * 3)
    ref = avir_tpu.resize(img, 40, 30)
    assert np.abs(
        out.reshape(30, 40, 3).astype(int) - ref.astype(int)
    ).max() <= 1


def test_sampled_row_oracle_matches_full():
    """execute_plan_rows_numpy == execute_plan_numpy[rows] exactly —
    the sampled oracle behind the 16K multi-process parity scenario
    (tests/mesh/mp_worker.py) and any pod-scale check."""
    from avir_tpu.models.host_reference import (
        execute_plan_numpy,
        execute_plan_rows_numpy,
    )

    for gamma, tin, tout in (
        (False, np.uint8, np.uint8),
        (True, np.uint8, np.uint8),
        (False, np.uint16, np.uint16),
        (True, np.uint16, np.float32),
    ):
        src = xorshift128_fill((96, 64, 3), tin, 55)
        plan = build_resize_plan(
            64, 96, 40, 60, 3, tin, tout, use_srgb_gamma=gamma
        )
        full = execute_plan_numpy(plan, src)
        rows = np.array([0, 1, 7, 30, 31, 59])
        got = execute_plan_rows_numpy(plan, src, rows)
        np.testing.assert_array_equal(got, full[rows])
        # caller's row ORDER is preserved (incl. duplicates)
        rows2 = np.array([30, 7, 59, 7])
        got2 = execute_plan_rows_numpy(plan, src, rows2)
        np.testing.assert_array_equal(got2, full[rows2])


def test_float_in_u16_out_large_taps():
    """float-in -> u16-out plans fold the 65535x range scaling into
    the composed taps; the int8 limb quantizer must hand back a
    NEGATIVE shift (rejected by the int8 feasibility gates) instead of
    raising and killing the whole executor build (found by the
    extended fuzz sweep, round 3)."""
    from avir_tpu.models.host_reference import execute_plan_numpy

    rng = np.random.default_rng(8)
    src = rng.random((60, 85, 2), dtype=np.float32)
    rz = avir_tpu.ImageResizer(
        res_bit_depth=16, params=avir_tpu.preset("high")
    )
    out = rz.resize(
        src, 19, 88, k=0.2836, ox=0.711, oy=-1.365,
        out_dtype=np.uint16,
    )
    plan = build_resize_plan(
        85, 60, 19, 88, 2, np.float32, np.uint16,
        k=0.2836, ox=0.711, oy=-1.365,
        params=avir_tpu.preset("high"), res_bit_depth=16,
    )
    ref = execute_plan_numpy(plan, src)
    assert np.abs(
        out.astype(np.float64) - ref.astype(np.float64)
    ).max() <= 4
