"""Sharded-execution tests on the 8-device CPU mesh: halo-exchange row
sharding must reproduce the single-chip results (and hence the golden
oracles) at LSB tolerance.

Not collected by the default suite (no test_ filename); launched by
tests/test_mesh.py in a subprocess whose environment guarantees 8 CPU
devices.  Can also be run directly:
  env -u PALLAS_AXON_POOL_IPS python -m pytest tests/mesh/sharded_mesh.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import conftest  # noqa: F401  (sets JAX_PLATFORMS/XLA_FLAGS before jax)
import jax
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import avir_tpu
from avir_tpu.parallel.sharded import (
    make_sharded_avir_executor,
    pad_rows,
    shard_v_op,
)
from avir_tpu.plan.plan import build_resize_plan

from conftest import load_golden, psnr, xorshift128_fill  # noqa: E402
from test_plan_golden import _M, DT


def row_mesh(n=8, name="sp"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


@pytest.mark.parametrize("name", ["a_readme", "a_down8x"])
def test_sharded_matches_golden(name):
    cfg = _M[name]
    src = xorshift128_fill(
        (cfg["sh"], cfg["sw"], cfg["ch"]), DT[cfg["tin"]], cfg["seed"]
    )
    plan = build_resize_plan(
        cfg["sw"], cfg["sh"], cfg["nw"], cfg["nh"], cfg["ch"],
        src.dtype, DT[cfg["tout"]],
    )
    mesh = row_mesh()
    fn = make_sharded_avir_executor(plan, mesh, rows_axis="sp")
    flat = pad_rows(src.reshape(cfg["sh"], -1), 8)
    out = np.asarray(fn(flat)).reshape(cfg["nh"], cfg["nw"], cfg["ch"])
    ref = load_golden(name)
    maxdiff = np.abs(out.astype(np.int64) - ref.astype(np.int64)).max()
    assert maxdiff <= 1, maxdiff
    assert psnr(out, ref, 255.0) >= 60.0


def test_sharded_gamma_alpha():
    cfg = _M["a_rgba8gamma"]
    src = xorshift128_fill(
        (cfg["sh"], cfg["sw"], cfg["ch"]), np.uint8, cfg["seed"]
    )
    plan = build_resize_plan(
        cfg["sw"], cfg["sh"], cfg["nw"], cfg["nh"], cfg["ch"],
        np.uint8, np.uint8, use_srgb_gamma=True, alpha_index=3,
    )
    mesh = row_mesh()
    fn = make_sharded_avir_executor(plan, mesh)
    flat = pad_rows(src.reshape(cfg["sh"], -1), 8)
    out = np.asarray(fn(flat)).reshape(cfg["nh"], cfg["nw"], cfg["ch"])
    ref = load_golden("a_rgba8gamma")
    maxdiff = np.abs(out.astype(np.int64) - ref.astype(np.int64)).max()
    assert maxdiff <= 1, maxdiff


def test_all_gather_fallback():
    """Tiny strips + wide band force the all-gather path."""
    src = xorshift128_fill((16, 64, 3), np.uint8, 99)
    plan = build_resize_plan(64, 16, 32, 8, 3, np.uint8, np.uint8)
    svop = shard_v_op(plan.v.op, 8, 16)
    assert svop.use_all_gather
    mesh = row_mesh()
    fn = make_sharded_avir_executor(plan, mesh)
    out = np.asarray(fn(src.reshape(16, -1))).reshape(8, 32, 3)
    single = avir_tpu.resize(src, 32, 8)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_halo_path_used_and_matches_single():
    """Enough rows that halos (not all-gather) are exercised."""
    src = xorshift128_fill((256, 96, 3), np.uint8, 123)
    plan = build_resize_plan(96, 256, 64, 160, 3, np.uint8, np.uint8)
    svop = shard_v_op(plan.v.op, 8, 256)
    assert not svop.use_all_gather
    assert svop.halo_lo > 0 or svop.halo_hi > 0
    mesh = row_mesh()
    fn = make_sharded_avir_executor(plan, mesh)
    out = np.asarray(fn(src.reshape(256, -1))).reshape(160, 64, 3)
    single = avir_tpu.resize(src, 64, 160)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_batch_dp_plus_rows_sp():
    """2-D mesh: batch data-parallel x row sharding."""
    mesh = jax.make_mesh((2, 4), ("dp", "sp"))
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (4, 64, 48, 3), dtype=np.uint8)
    plan = build_resize_plan(48, 64, 24, 32, 3, np.uint8, np.uint8)
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", batch_axis="dp"
    )
    out = np.asarray(fn(batch.reshape(4, 64, -1)))
    assert out.shape == (4, 32, 24 * 3)
    for i in range(4):
        single = avir_tpu.resize(batch[i], 24, 32)
        got = out[i].reshape(32, 24, 3)
        assert np.abs(got.astype(int) - single.astype(int)).max() <= 1


def test_multihost_mesh_helper():
    from avir_tpu.parallel import multihost

    mesh = multihost.make_dp_sp_mesh(sp=4)
    assert mesh.shape["sp"] == 4 and mesh.shape["dp"] == 2
    mesh_all = multihost.make_dp_sp_mesh()
    assert mesh_all.shape["sp"] == 8 and mesh_all.shape["dp"] == 1


def test_sharded_lancir():
    from avir_tpu.parallel.sharded import make_sharded_lancir_executor
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    src = xorshift128_fill((96, 80, 4), np.uint8, 321)
    plan = build_lancir_plan(80, 96, 56, 64, 4, np.uint8, np.uint8)
    mesh = row_mesh()
    fn = make_sharded_lancir_executor(plan, mesh)
    out = np.asarray(fn(src.reshape(96, -1))).reshape(64, 56, 4)
    single = avir_tpu.lancir_resize(src, 56, 64)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_pallas_strips_matches_single():
    """Per-device fused-Pallas strip route (interpret mode on the CPU
    mesh) vs the single-chip result: raw halo exchange + in-kernel
    pack/V/H/quantize."""
    src = xorshift128_fill((256, 96, 3), np.uint8, 77)
    plan = build_resize_plan(96, 256, 64, 160, 3, np.uint8, np.uint8)
    mesh = row_mesh()
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", engine="pallas", interpret=True
    )
    out = np.asarray(fn(src.reshape(256, -1))).reshape(160, 64, 3)
    single = avir_tpu.resize(src, 64, 160)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_pallas_strips_gamma_alpha():
    """Pallas strip route with in-kernel sRGB gamma + alpha bypass."""
    src = xorshift128_fill((128, 64, 4), np.uint8, 91)
    plan = build_resize_plan(
        64, 128, 32, 64, 4, np.uint8, np.uint8,
        use_srgb_gamma=True, alpha_index=3,
    )
    mesh = row_mesh()
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", engine="pallas", interpret=True
    )
    out = np.asarray(fn(src.reshape(128, -1))).reshape(64, 32, 4)
    rz = avir_tpu.ImageResizer()
    single = rz.resize(src, 32, 64, use_srgb_gamma=True, alpha_index=3)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_overlapped_interior_split_xla():
    """The overlapped-halo structure (interior blocks computed
    independently of the ppermutes) is exercised and matches the
    single-chip result.  512x1024 -> 256x512 on 2 devices gives
    interior blocks [1, 3) of 4 on the XLA route."""
    src = xorshift128_fill((1024, 512, 3), np.uint8, 407)
    plan = build_resize_plan(512, 1024, 256, 512, 3, np.uint8, np.uint8)
    so = shard_v_op(plan.v.op, 2, 1024)
    assert so.b_int1 > so.b_int0 > 0, (so.b_int0, so.b_int1)
    mesh = row_mesh(2)
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", engine="xla"
    )
    out = np.asarray(fn(src.reshape(1024, -1))).reshape(512, 256, 3)
    single = avir_tpu.resize(src, 256, 512)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_overlapped_interior_split_pallas():
    """Interior/border split on the fused-Pallas strip route (three
    kernel calls, permutes overlapped) is bitwise-stable vs the
    single-chip result."""
    from avir_tpu.parallel.sharded import shard_v_blocked

    src = xorshift128_fill((1024, 128, 3), np.uint8, 409)
    plan = build_resize_plan(128, 1024, 64, 512, 3, np.uint8, np.uint8)
    sb = shard_v_blocked(plan.v.op, 2, 1024, tile=64)
    assert sb.b_int1 > sb.b_int0 > 0, (sb.b_int0, sb.b_int1)
    mesh = row_mesh(2)
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", engine="pallas", interpret=True,
        pallas_tile=64, halo_overlap=True,
    )
    out = np.asarray(fn(src.reshape(1024, -1))).reshape(512, 64, 3)
    single = avir_tpu.resize(src, 64, 512)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_lancir_pallas_strips():
    """LANCIR through the fused-Pallas int8 strip route (VERDICT r1
    item 4): per-device work identical to the single-chip LANCIR hot
    path, <= 1 LSB vs single-chip."""
    from avir_tpu.parallel.sharded import make_sharded_lancir_executor
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    src = xorshift128_fill((256, 96, 3), np.uint8, 411)
    plan = build_lancir_plan(96, 256, 64, 160, 3, np.uint8, np.uint8)
    mesh = row_mesh()
    fn = make_sharded_lancir_executor(
        plan, mesh, rows_axis="sp", engine="pallas", interpret=True
    )
    out = np.asarray(fn(src.reshape(256, -1))).reshape(160, 64, 3)
    single = avir_tpu.lancir_resize(src, 64, 160)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_lancir_pallas_strips_u16():
    """LANCIR pallas strips with u16 output (split-bf16 modes +
    round-half-even epilogue)."""
    from avir_tpu.parallel.sharded import make_sharded_lancir_executor
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    src = xorshift128_fill((128, 64, 2), np.uint16, 413)
    plan = build_lancir_plan(64, 128, 48, 96, 2, np.uint16, np.uint16)
    mesh = row_mesh(4)
    fn = make_sharded_lancir_executor(
        plan, mesh, rows_axis="sp", engine="pallas", interpret=True
    )
    out = np.asarray(fn(src.reshape(128, -1))).reshape(96, 48, 2)
    lz = avir_tpu.LancIR()
    single = lz.resize(src, 48, 96)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_interior_split_fallback_logged(caplog):
    """When strips are too small for any interior block the overlap is
    forfeited (correct but slower); the fallback must be observable at
    DEBUG level (VERDICT r2 item 8)."""
    import logging

    # strip=128 but the 64-row tile's window spans 256 rows: every
    # block touches a halo, no interior exists.
    plan = build_resize_plan(64, 256, 32, 128, 3, np.uint8, np.uint8)
    with caplog.at_level(logging.DEBUG, logger="avir_tpu.parallel"):
        so = shard_v_op(plan.v.op, 2, 256)
    assert not so.use_all_gather and so.b_int1 <= so.b_int0
    assert any(
        "interior/halo overlap disabled" in r.message
        for r in caplog.records
    ), [r.message for r in caplog.records]


def test_sharded_batch_strips_concat_lane_split():
    """dp x sp batched fused strips regain the interior/boundary lane
    split via the vmap-safe compact+concat assembly (VERDICT r2
    item 3; the aliased out_init form can't carry the batch dim).
    Profitability is geometry-dependent (engages at the 8K headline),
    so the decision is forced here to exercise the assembly under
    shard_map + vmap at CPU-testable size."""
    from unittest import mock

    import avir_tpu.models.runtime as rt
    from avir_tpu.models.runtime import _split_lane_ops
    from avir_tpu.ops.lanes import lane_block_banded

    rng = np.random.default_rng(5)
    batch = rng.integers(0, 256, (2, 768, 2048, 3), dtype=np.uint8)
    plan = build_resize_plan(2048, 768, 512, 192, 3, np.uint8, np.uint8)
    lop = lane_block_banded(plan.h.op, 3)
    li, _ = _split_lane_ops(plan.h.op, lop, 3)
    assert li is not None  # split available
    mesh = jax.make_mesh((2, 2), ("dp", "sp"))
    with mock.patch.object(rt, "_concat_split_ok", lambda *a: True):
        fn = make_sharded_avir_executor(
            plan, mesh, rows_axis="sp", batch_axis="dp",
            engine="pallas", interpret=True,
        )
    out = np.asarray(fn(batch.reshape(2, 768, -1)))
    for i in range(2):
        single = avir_tpu.resize(batch[i], 512, 192)
        got = out[i].reshape(192, 512, 3)
        assert np.abs(got.astype(int) - single.astype(int)).max() <= 1


def test_sharded_strips_with_lane_split():
    """Sharded fused strips with the interior/boundary LANE split
    engaged (2048-px-wide rows give 4 lane blocks with an inflated
    shared chunk window): matches single-chip <= 1 LSB."""
    from avir_tpu.models.runtime import _split_lane_ops
    from avir_tpu.ops.lanes import lane_block_banded

    src = xorshift128_fill((768, 2048, 3), np.uint8, 419)
    plan = build_resize_plan(2048, 768, 512, 192, 3, np.uint8, np.uint8)
    lop = lane_block_banded(plan.h.op, 3)
    li, _ = _split_lane_ops(plan.h.op, lop, 3)
    assert li is not None  # split engaged
    mesh = row_mesh(2)
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", engine="pallas", interpret=True
    )
    out = np.asarray(fn(src.reshape(768, -1))).reshape(192, 512, 3)
    single = avir_tpu.resize(src, 512, 192)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_errdiff_matches_single_xla():
    """Multi-chip error diffusion (VERDICT r3 item 3): the XLA route
    gathers the pre-dither float strips, runs the wavefront in-graph
    replicated, and each device keeps its rows — vs the single-chip
    errdiff executor at <= 1 quantization step."""
    from avir_tpu.models.avir import ImageResizer

    src = xorshift128_fill((256, 96, 3), np.uint8, 207)
    plan = build_resize_plan(96, 256, 64, 160, 3, np.uint8, np.uint8)
    mesh = row_mesh()
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", dither="errdiff"
    )
    out = np.asarray(fn(src.reshape(256, -1)))
    assert out.dtype == np.uint8 and out.shape == (160, 64 * 3)
    out = out.reshape(160, 64, 3)
    single = ImageResizer().resize(src, 64, 160, dither="errdiff")
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_errdiff_pallas_strips():
    """Errdiff through the fused-Pallas strip route: the strip kernel
    emits the pre-dither float (no in-kernel quantize, int8 mode
    disabled), then the shared gather+wavefront epilogue dithers."""
    from avir_tpu.models.avir import ImageResizer

    src = xorshift128_fill((256, 96, 3), np.uint8, 505)
    plan = build_resize_plan(96, 256, 64, 160, 3, np.uint8, np.uint8)
    mesh = row_mesh()
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", engine="pallas", interpret=True,
        dither="errdiff",
    )
    out = np.asarray(fn(src.reshape(256, -1)))
    assert out.dtype == np.uint8
    out = out.reshape(160, 64, 3)
    single = ImageResizer().resize(src, 64, 160, dither="errdiff")
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_errdiff_batch_dp_sp():
    """Errdiff under dp x sp (vmapped body): the all_gather +
    dynamic-slice epilogue must be vmap-safe."""
    from avir_tpu.models.avir import ImageResizer

    mesh = jax.make_mesh((2, 4), ("dp", "sp"))
    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, (4, 64, 48, 3), dtype=np.uint8)
    plan = build_resize_plan(48, 64, 24, 32, 3, np.uint8, np.uint8)
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", batch_axis="dp", dither="errdiff"
    )
    out = np.asarray(fn(batch.reshape(4, 64, -1)))
    assert out.shape == (4, 32, 24 * 3)
    rz = ImageResizer()
    for i in range(4):
        single = rz.resize(batch[i], 24, 32, dither="errdiff")
        got = out[i].reshape(32, 24, 3)
        assert np.abs(got.astype(int) - single.astype(int)).max() <= 1


def test_sharded_errdiff_16bit_trunc():
    """Errdiff with bit-depth truncation (res_bit_depth < out bits):
    the epilogue must honor trunc_bits."""
    from avir_tpu.models.avir import ImageResizer

    src = xorshift128_fill((128, 64, 3), np.uint16, 613)
    plan = build_resize_plan(
        64, 128, 32, 64, 3, np.uint16, np.uint16, res_bit_depth=12
    )
    mesh = row_mesh()
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", dither="errdiff"
    )
    out = np.asarray(fn(src.reshape(128, -1))).reshape(64, 32, 3)
    single = ImageResizer(
        res_bit_depth=12, src_bit_depth=16
    ).resize(src, 32, 64, dither="errdiff")
    step = 65535.0 / (65535 >> 4)
    assert np.abs(
        out.astype(np.int64) - single.astype(np.int64)
    ).max() <= step


def test_sharded_2d_rows_cols():
    """2-D intra-image sharding (rows x cols, VERDICT r3 item 5): both
    passes exchange halos along their own mesh axis; matches the
    single-chip result <= 1 LSB."""
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor_2d,
        pad_cols,
    )

    mesh = jax.make_mesh((2, 4), ("sp", "cp"))
    src = xorshift128_fill((192, 256, 3), np.uint8, 808)
    plan = build_resize_plan(256, 192, 128, 96, 3, np.uint8, np.uint8)
    fn = make_sharded_avir_executor_2d(
        plan, mesh, rows_axis="sp", cols_axis="cp"
    )
    flat = pad_cols(pad_rows(src.reshape(192, -1), 2), 4, 3)
    out = np.asarray(fn(flat)).reshape(96, 128, 3)
    single = avir_tpu.resize(src, 128, 96)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_2d_gamma_upsize_oddshapes():
    """2-D sharding with gamma+alpha, an upsize, and sizes that do not
    divide the mesh (exercises pad_rows/pad_cols and partial tiles)."""
    from avir_tpu.models.avir import ImageResizer
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor_2d,
        pad_cols,
    )

    mesh = jax.make_mesh((4, 2), ("sp", "cp"))
    src = xorshift128_fill((90, 70, 4), np.uint8, 909)
    plan = build_resize_plan(
        70, 90, 110, 130, 4, np.uint8, np.uint8,
        use_srgb_gamma=True, alpha_index=3,
    )
    fn = make_sharded_avir_executor_2d(plan, mesh)
    flat = pad_cols(pad_rows(src.reshape(90, -1), 4), 2, 4)
    out = np.asarray(fn(flat)).reshape(130, 110, 4)
    rz = ImageResizer()
    single = rz.resize(
        src, 110, 130, use_srgb_gamma=True, alpha_index=3
    )
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_2d_errdiff_and_batch():
    """2-D sharding with error diffusion, and under a batch axis."""
    from avir_tpu.models.avir import ImageResizer
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor_2d,
        pad_cols,
    )

    mesh = jax.make_mesh((2, 2, 2), ("dp", "sp", "cp"))
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)
    plan = build_resize_plan(48, 64, 24, 32, 3, np.uint8, np.uint8)
    fn = make_sharded_avir_executor_2d(
        plan, mesh, batch_axis="dp", dither="errdiff"
    )
    flat = pad_cols(batch.reshape(2, 64, -1), 2, 3)
    out = np.asarray(fn(flat))
    assert out.shape == (2, 32, 24 * 3)
    rz = ImageResizer()
    for i in range(2):
        single = rz.resize(batch[i], 24, 32, dither="errdiff")
        got = out[i].reshape(32, 24, 3)
        assert np.abs(got.astype(int) - single.astype(int)).max() <= 1


def test_sharded_2d_pallas_strips_matches_single():
    """The fused-Pallas 2-D tile body (VERDICT r4 item 1): both halo
    exchanges ride the RAW tile and each device runs the single-chip
    fused int8 kernel on its doubly-extended tile, with the
    interior x interior call issued before either collective.  Matches
    the single-chip result <= 1 LSB."""
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor_2d,
        pad_cols,
    )

    mesh = jax.make_mesh((2, 4), ("sp", "cp"))
    src = xorshift128_fill((192, 256, 3), np.uint8, 811)
    plan = build_resize_plan(256, 192, 128, 96, 3, np.uint8, np.uint8)
    fn = make_sharded_avir_executor_2d(
        plan, mesh, engine="pallas", interpret=True
    )
    flat = pad_cols(pad_rows(src.reshape(192, -1), 2), 4, 3)
    out = np.asarray(fn(flat)).reshape(96, 128, 3)
    single = avir_tpu.resize(src, 128, 96)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_2d_pallas_strips_gamma_oddshapes():
    """2-D pallas strips with in-kernel sRGB gamma + alpha bypass on
    odd (non-dividing) shapes and a 4x2 grid."""
    from avir_tpu.models.avir import ImageResizer
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor_2d,
        pad_cols,
    )

    mesh = jax.make_mesh((4, 2), ("sp", "cp"))
    src = xorshift128_fill((90, 70, 4), np.uint8, 912)
    plan = build_resize_plan(
        70, 90, 50, 62, 4, np.uint8, np.uint8,
        use_srgb_gamma=True, alpha_index=3,
    )
    fn = make_sharded_avir_executor_2d(
        plan, mesh, engine="pallas", interpret=True
    )
    flat = pad_cols(pad_rows(src.reshape(90, -1), 4), 2, 4)
    out = np.asarray(fn(flat)).reshape(62, 50, 4)
    rz = ImageResizer()
    single = rz.resize(
        src, 50, 62, use_srgb_gamma=True, alpha_index=3
    )
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_2d_pallas_strips_upsize_u16():
    """2-D pallas strips on a u16 upsize (split-bf16 modes, single
    blocking kernel — the 2/4-byte scoped-VMEM rule): parity with the
    single-chip FUSED route <= 1 LSB (the fused kernel itself carries
    the suite's 4-LSB u16 envelope vs the f64 oracle)."""
    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor_2d,
        pad_cols,
    )
    import avir_tpu.ops.pallas.fused_kernel as fk

    orig = fk.apply_fused_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    mesh = jax.make_mesh((2, 2), ("sp", "cp"))
    src = xorshift128_fill((96, 128, 4), np.uint16, 913)
    plan = build_resize_plan(
        128, 96, 192, 256, 4, np.uint16, np.uint16,
        res_bit_depth=16,
    )
    fn = make_sharded_avir_executor_2d(
        plan, mesh, engine="pallas", interpret=True
    )
    flat = pad_cols(pad_rows(src.reshape(96, -1), 2), 2, 4)
    out = np.asarray(fn(flat)).reshape(256, 192, 4)
    fk.apply_fused_pallas = interp
    try:
        single = np.asarray(
            make_avir_executor(plan, engine="pallas")(
                src.reshape(96, -1)
            )
        ).reshape(256, 192, 4)
    finally:
        fk.apply_fused_pallas = orig
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_2d_pallas_errdiff_and_batch():
    """2-D pallas strips with error diffusion (pre-dither gather over
    both axes) and under a dp batch axis (vmapped tile body)."""
    from avir_tpu.models.avir import ImageResizer
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor_2d,
        pad_cols,
    )

    mesh = jax.make_mesh((2, 2, 2), ("dp", "sp", "cp"))
    rng = np.random.default_rng(5)
    batch = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)
    plan = build_resize_plan(48, 64, 24, 32, 3, np.uint8, np.uint8)
    fn = make_sharded_avir_executor_2d(
        plan, mesh, batch_axis="dp", dither="errdiff",
        engine="pallas", interpret=True,
    )
    flat = pad_cols(batch.reshape(2, 64, -1), 2, 3)
    out = np.asarray(fn(flat))
    assert out.shape == (2, 32, 24 * 3)
    rz = ImageResizer()
    for i in range(2):
        single = rz.resize(batch[i], 24, 32, dither="errdiff")
        got = out[i].reshape(32, 24, 3)
        assert np.abs(got.astype(int) - single.astype(int)).max() <= 1


def test_sharded_2d_pallas_overlapped_three_call():
    """A geometry with interior blocks on BOTH axes exercises the full
    overlapped structure: (V-int x H-int) on the local tile,
    (V-int x H-border) on the column-extended tile, (V-border x all-H)
    on the fully extended tile."""
    from avir_tpu.parallel.sharded import (
        make_sharded_avir_executor_2d,
        pad_cols,
        shard_lane_blocked,
        shard_v_blocked,
    )

    plan = build_resize_plan(
        1536, 1536, 768, 768, 3, np.uint8, np.uint8
    )
    # Preconditions: the split must actually engage on this geometry.
    svb = shard_v_blocked(plan.v.op, 2, 1536, in_bytes=1)
    slb = shard_lane_blocked(plan.h.op, 2, 1536, 3, in_bytes=1)
    assert svb.b_int1 > svb.b_int0 and 0 < svb.b_int0
    assert slb.b_int1 > slb.b_int0 and 0 < slb.b_int0

    mesh = jax.make_mesh((2, 2), ("sp", "cp"))
    src = xorshift128_fill((1536, 1536, 3), np.uint8, 914)
    fn = make_sharded_avir_executor_2d(
        plan, mesh, engine="pallas", interpret=True,
        halo_overlap=True,
    )
    out = np.asarray(fn(src.reshape(1536, -1))).reshape(768, 768, 3)
    single = avir_tpu.resize(src, 768, 768)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1


def test_sharded_2d_geom_emulation_matches_mesh():
    """The mesh-emulation used by tools/probe_strip2d_tpu.py (slice
    the zero-extended padded image instead of ppermuting halos, run
    each device's ``compute`` without collectives) is bit-identical to
    the real shard_map executor — guards the real-TPU probe's assembly
    logic against drift."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as SP

    from avir_tpu.models.runtime import resolve_modes
    from avir_tpu.parallel.sharded import (
        _pallas_2d_setup,
        make_sharded_avir_executor_2d,
        shard_v_op,
    )

    r, s = 2, 4
    plan = build_resize_plan(256, 192, 128, 96, 3, np.uint8, np.uint8)
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    padded_h = h + ((-h) % r)
    padded_w = w + ((-w) % s)
    svv = shard_v_op(plan.v.op, r, padded_h, tile=64)
    svh = shard_v_op(plan.h.op, s, padded_w, tile=64)
    mf, ms = resolve_modes("auto", True)
    p2d = _pallas_2d_setup(
        plan, r, s, padded_h, padded_w, "auto", mf, ms,
        False, 0, jnp.uint8, svv.m, svh.m, "sp", "cp",
        [], [], [], [], "pallas", True, None,
    )
    assert p2d is not None
    svb, slb = p2d.svb, p2d.slb
    strip_r, sl = svb.strip, slb.strip_lanes
    hlr, hhr = svb.halo_lo, svb.halo_hi
    hll, hhl = slb.halo_lo, slb.halo_hi

    src = xorshift128_fill((h, w * c), np.uint8, 915)
    pimg = np.zeros((padded_h, padded_w * c), np.uint8)
    pimg[:h, : w * c] = src
    z = np.pad(pimg, ((hlr, hhr), (hll, hhl)))

    rows_spec = SP("sp")
    out_rows = []
    for i in range(r):
        row = []
        for j in range(s):
            cs = [
                jnp.asarray(
                    np.asarray(cst)[i if spec == rows_spec else j]
                )
                for cst, spec in zip(p2d.consts, p2d.specs)
            ]
            x = jnp.asarray(
                pimg[i * strip_r : (i + 1) * strip_r,
                     j * sl : (j + 1) * sl]
            )
            ext = jnp.asarray(
                z[i * strip_r : i * strip_r + hlr + strip_r + hhr,
                  j * sl : j * sl + hll + sl + hhl]
            )
            xc = ext[hlr : hlr + strip_r, :]
            row.append(np.asarray(p2d.compute(x, xc, ext, cs)))
        out_rows.append(np.concatenate(row, axis=1))
    emulated = np.concatenate(out_rows, axis=0)[
        : plan.new_h, : plan.new_w * c
    ]

    mesh = jax.make_mesh((r, s), ("sp", "cp"))
    fn = make_sharded_avir_executor_2d(
        plan, mesh, engine="pallas", interpret=True
    )
    mesh_out = np.asarray(fn(jnp.asarray(pimg)))
    np.testing.assert_array_equal(emulated, mesh_out)


def test_sharded_lancir_2d_rows_cols():
    """2-D (rows x cols) LANCIR executor matches the single-chip
    result on both engines (round 5; same tile body via
    _pallas_2d_setup_core, LANCIR round-half-even epilogue)."""
    from avir_tpu.parallel.sharded import (
        make_sharded_lancir_executor_2d,
        pad_cols,
    )
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    mesh = jax.make_mesh((2, 4), ("sp", "cp"))
    src = xorshift128_fill((192, 256, 3), np.uint8, 920)
    plan = build_lancir_plan(256, 192, 128, 96, 3,
                             np.uint8, np.uint8)
    single = avir_tpu.lancir_resize(src, 128, 96)
    flat = pad_cols(pad_rows(src.reshape(192, -1), 2), 4, 3)
    for kw in (dict(), dict(engine="pallas", interpret=True)):
        fn = make_sharded_lancir_executor_2d(plan, mesh, **kw)
        out = np.asarray(fn(flat)).reshape(96, 128, 3)
        assert np.abs(
            out.astype(int) - single.astype(int)
        ).max() <= 1, kw


def test_sharded_lancir_2d_u16_batch_oddshapes():
    """2-D LANCIR: u16 upsize with non-dividing sizes, and the batch
    axis over a 3-axis mesh."""
    from avir_tpu.parallel.sharded import (
        make_sharded_lancir_executor_2d,
        pad_cols,
    )
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    mesh = jax.make_mesh((4, 2), ("sp", "cp"))
    src = xorshift128_fill((90, 70, 4), np.uint16, 921)
    plan = build_lancir_plan(70, 90, 110, 130, 4,
                             np.uint16, np.uint16)
    fn = make_sharded_lancir_executor_2d(
        plan, mesh, engine="pallas", interpret=True
    )
    flat = pad_cols(pad_rows(src.reshape(90, -1), 4), 2, 4)
    out = np.asarray(fn(flat)).reshape(130, 110, 4)
    single = avir_tpu.lancir_resize(src, 110, 130)
    assert np.abs(out.astype(int) - single.astype(int)).max() <= 1

    mesh3 = jax.make_mesh((2, 2, 2), ("dp", "sp", "cp"))
    batch = np.stack([
        xorshift128_fill((64, 48, 3), np.uint8, 930 + i)
        for i in range(2)
    ])
    plan3 = build_lancir_plan(48, 64, 24, 32, 3, np.uint8, np.uint8)
    fn3 = make_sharded_lancir_executor_2d(
        plan3, mesh3, batch_axis="dp"
    )
    flat3 = pad_cols(batch.reshape(2, 64, -1), 2, 3)
    out3 = np.asarray(fn3(flat3))
    for i in range(2):
        single3 = avir_tpu.lancir_resize(batch[i], 24, 32)
        got = out3[i].reshape(32, 24, 3)
        assert np.abs(
            got.astype(int) - single3.astype(int)
        ).max() <= 1
