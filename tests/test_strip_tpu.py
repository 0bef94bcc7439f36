"""Real-TPU validation of the fused-Pallas STRIP route (VERDICT r3
item 1): builds the sharded executors over a 1-device mesh on the real
chip — same strip kernel bodies, degenerate collectives — and checks
<= 1 LSB against the single-chip executors.

Skipped on CPU (the CPU suite covers the strip bodies in interpret
mode; only real Mosaic validates their VMEM scheduling).  Run with:

  AVIR_TEST_TPU=1 python -m pytest tests/test_strip_tpu.py -v

Full-size measured strip results live in tools/probe_strip_tpu.py and
docs/perf_analysis.md.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu"),
    reason="needs the real TPU (run with AVIR_TEST_TPU=1)",
)


def _mesh1():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:1]), ("sp",))


def _maxdiff(a, b):
    return int(
        np.abs(
            np.asarray(a).astype(np.int64)
            - np.asarray(b).astype(np.int64)
        ).max()
    )


@pytest.mark.parametrize(
    "sw,sh,nw,nh,ch,dt,gamma,alpha",
    [
        (1024, 768, 512, 384, 3, np.uint8, False, -1),   # int8 strip
        (640, 480, 1024, 768, 3, np.uint8, False, -1),   # upsize
        (512, 384, 256, 192, 4, np.uint8, True, 3),      # gamma+alpha
        (512, 384, 1024, 768, 4, np.uint16, True, 3),    # u16 2-byte
    ],
)
def test_avir_strip_route_real_mosaic(sw, sh, nw, nh, ch, dt, gamma,
                                      alpha):
    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.parallel.sharded import make_sharded_avir_executor
    from avir_tpu.plan.plan import build_resize_plan

    rng = np.random.default_rng(11)
    src = rng.integers(
        0, int(np.iinfo(dt).max) + 1, (sh, sw, ch), dtype=dt
    )
    plan = build_resize_plan(
        sw, sh, nw, nh, ch, dt, dt,
        use_srgb_gamma=gamma, alpha_index=alpha,
    )
    single = make_avir_executor(plan)
    sharded = make_sharded_avir_executor(plan, _mesh1())
    flat = src.reshape(sh, sw * ch)
    a = single(jax.device_put(flat))
    b = sharded(jax.device_put(flat))
    assert _maxdiff(a, b) <= 1


def test_lancir_strip_route_real_mosaic():
    from avir_tpu.models.runtime import make_lancir_executor
    from avir_tpu.parallel.sharded import make_sharded_lancir_executor
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    rng = np.random.default_rng(12)
    src = rng.integers(0, 256, (768, 1024, 4), dtype=np.uint8)
    plan = build_lancir_plan(
        1024, 768, 640, 480, 4, np.uint8, np.uint8
    )
    single = make_lancir_executor(plan)
    sharded = make_sharded_lancir_executor(plan, _mesh1())
    flat = src.reshape(768, 1024 * 4)
    a = single(jax.device_put(flat))
    b = sharded(jax.device_put(flat))
    assert _maxdiff(a, b) <= 1


def test_sharded_errdiff_real_mosaic():
    """Multi-chip error diffusion on the real chip (1-device mesh):
    the strip kernel emits pre-dither float, the all_gather epilogue
    runs the PALLAS wavefront kernel inside shard_map — real Mosaic
    has to compile both in one program."""
    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.parallel.sharded import make_sharded_avir_executor
    from avir_tpu.plan.plan import build_resize_plan

    rng = np.random.default_rng(13)
    src = rng.integers(0, 256, (768, 1024, 3), dtype=np.uint8)
    plan = build_resize_plan(
        1024, 768, 512, 384, 3, np.uint8, np.uint8
    )
    single = make_avir_executor(
        plan, errdiff=True, errdiff_impl="wavefront"
    )
    sharded = make_sharded_avir_executor(
        plan, _mesh1(), dither="errdiff"
    )
    flat = src.reshape(768, 1024 * 3)
    a = single(jax.device_put(flat))
    b = sharded(jax.device_put(flat))
    assert _maxdiff(a, b) <= 1


def test_wavefront_pallas_kernel_real_mosaic():
    """The wavefront diagonal-scan kernel vs the lax.scan formulation
    on real hardware (bit-identical; interpret-mode parity is covered
    on CPU)."""
    from avir_tpu.ops.dither import errdiff_dither_wavefront_jnp

    rng = np.random.default_rng(14)
    img = (rng.random((384, 512, 3)) * 255.0).astype(np.float32)
    d = jax.device_put(img)
    pk = np.asarray(
        jax.jit(
            lambda x: errdiff_dither_wavefront_jnp(
                x, 0, 255.0, engine="pallas"
            )
        )(d)
    )
    scan = np.asarray(
        jax.jit(
            lambda x: errdiff_dither_wavefront_jnp(
                x, 0, 255.0, engine="xla"
            )
        )(d)
    )
    np.testing.assert_array_equal(pk, scan)


def test_resize_batch_errdiff_real_mosaic():
    """resize_batch with error diffusion on the chip: the Pallas
    wavefront kernel under vmap (batched grid + per-element scratch
    reset) through real Mosaic."""
    from avir_tpu.models.avir import ImageResizer

    rng = np.random.default_rng(15)
    batch = rng.integers(0, 256, (3, 96, 128, 3), dtype=np.uint8)
    rz = ImageResizer()
    out = rz.resize_batch(batch, 64, 48, dither="errdiff")
    assert out.shape == (3, 48, 64, 3)
    for i in range(3):
        single = rz.resize(batch[i], 64, 48, dither="errdiff")
        assert (
            np.abs(out[i].astype(int) - single.astype(int)).max() <= 1
        )


def test_sharded_errdiff_batch_real_mosaic():
    """dp x sp batched sharded errdiff on the chip: vmapped strip body
    + all_gather + vmapped Pallas wavefront inside shard_map."""
    from jax.sharding import Mesh

    from avir_tpu.models.avir import ImageResizer
    from avir_tpu.parallel.sharded import make_sharded_avir_executor
    from avir_tpu.plan.plan import build_resize_plan

    mesh = Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "sp")
    )
    rng = np.random.default_rng(16)
    batch = rng.integers(0, 256, (2, 256, 96, 3), dtype=np.uint8)
    plan = build_resize_plan(96, 256, 64, 160, 3, np.uint8, np.uint8)
    fn = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", batch_axis="dp", dither="errdiff"
    )
    out = np.asarray(fn(batch.reshape(2, 256, 96 * 3)))
    rz = ImageResizer()
    for i in range(2):
        single = rz.resize(batch[i], 64, 160, dither="errdiff")
        got = out[i].reshape(160, 64, 3)
        assert (
            np.abs(got.astype(int) - single.astype(int)).max() <= 1
        )


def test_avir_2d_route_real_mosaic():
    """2-D rows x cols fused tile body over a 1x1 mesh on the real
    chip (VERDICT r4 item 1): real Mosaic compiles the 2-D kernel
    bodies through the production maker.  Full-size per-device
    measurements live in tools/probe_strip2d_tpu.py and
    docs/scaling.md."""
    from jax.sharding import Mesh

    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.parallel.sharded import make_sharded_avir_executor_2d
    from avir_tpu.plan.plan import build_resize_plan

    mesh = Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("sp", "cp")
    )
    rng = np.random.default_rng(15)
    src = rng.integers(0, 256, (768, 1024 * 3), dtype=np.uint8)
    plan = build_resize_plan(
        1024, 768, 512, 384, 3, np.uint8, np.uint8
    )
    single = make_avir_executor(plan)
    sharded = make_sharded_avir_executor_2d(
        plan, mesh, engine="pallas"
    )
    d = jax.device_put(src)
    assert _maxdiff(single(d), sharded(d)) <= 1


def test_avir_2d_split_kernels_real_mosaic():
    """The (r, s) > 1 per-device kernel-call structure (interior /
    border splits, rebased offsets, halo-extended windows) compiled by
    REAL Mosaic via the mesh emulation of tools/probe_strip2d_tpu.py:
    every device's exact calls run on the one chip and the assembled
    result matches the single-chip executor."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as SP

    from avir_tpu.models.runtime import make_avir_executor, resolve_modes
    from avir_tpu.parallel.sharded import _pallas_2d_setup, shard_v_op
    from avir_tpu.plan.plan import build_resize_plan

    r, s = 2, 2
    plan = build_resize_plan(512, 384, 256, 192, 3, np.uint8, np.uint8)
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    svv = shard_v_op(plan.v.op, r, h, tile=64)
    svh = shard_v_op(plan.h.op, s, w, tile=64)
    mf, ms = resolve_modes("auto", True)
    p2d = _pallas_2d_setup(
        plan, r, s, h, w, "auto", mf, ms, False, 0, jnp.uint8,
        svv.m, svh.m, "sp", "cp", [], [], [], [], "pallas", False,
        None,
    )
    assert p2d is not None
    svb, slb = p2d.svb, p2d.slb
    strip_r, sl = svb.strip, slb.strip_lanes
    hlr, hhr = svb.halo_lo, svb.halo_hi
    hll, hhl = slb.halo_lo, slb.halo_hi

    rng = np.random.default_rng(16)
    src = rng.integers(0, 256, (h, w * c), dtype=np.uint8)
    z = np.pad(src, ((hlr, hhr), (hll, hhl)))
    single = make_avir_executor(plan)
    a = single(jax.device_put(src))

    cfun = jax.jit(
        lambda x, xc, ext, *cs: p2d.compute(x, xc, ext, list(cs))
    )
    rows_spec = SP("sp")
    out_rows = []
    for i in range(r):
        row = []
        for j in range(s):
            cs = tuple(
                jnp.asarray(
                    np.asarray(cst)[i if spec == rows_spec else j]
                )
                for cst, spec in zip(p2d.consts, p2d.specs)
            )
            x = jnp.asarray(
                src[i * strip_r : (i + 1) * strip_r,
                    j * sl : (j + 1) * sl]
            )
            ext = jnp.asarray(
                z[i * strip_r : i * strip_r + hlr + strip_r + hhr,
                  j * sl : j * sl + hll + sl + hhl]
            )
            xc = ext[hlr : hlr + strip_r, :]
            row.append(cfun(x, xc, ext, *cs))
        out_rows.append(np.concatenate([np.asarray(o) for o in row],
                                       axis=1))
    full = np.concatenate(out_rows, axis=0)[
        : plan.new_h, : plan.new_w * c
    ]
    assert _maxdiff(np.asarray(a), full) <= 1


def test_lancir_2d_route_real_mosaic():
    """2-D LANCIR maker over a 1x1 mesh on the real chip."""
    from jax.sharding import Mesh

    from avir_tpu.models.runtime import make_lancir_executor
    from avir_tpu.parallel.sharded import (
        make_sharded_lancir_executor_2d,
    )
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    mesh = Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("sp", "cp")
    )
    rng = np.random.default_rng(17)
    src = rng.integers(0, 256, (768, 1024 * 4), dtype=np.uint8)
    plan = build_lancir_plan(
        1024, 768, 640, 480, 4, np.uint8, np.uint8
    )
    single = make_lancir_executor(plan)
    sharded = make_sharded_lancir_executor_2d(
        plan, mesh, engine="pallas"
    )
    d = jax.device_put(src)
    assert _maxdiff(single(d), sharded(d)) <= 1


def test_avir_2d_errdiff_real_mosaic():
    """2-D maker with in-graph error diffusion on the real chip: the
    fused tile body emits pre-dither float, the gather epilogue runs
    the row-blocked Pallas wavefront carry kernel inside shard_map —
    real Mosaic compiles both in one program over the 2-D mesh."""
    from jax.sharding import Mesh

    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.parallel.sharded import make_sharded_avir_executor_2d
    from avir_tpu.plan.plan import build_resize_plan

    mesh = Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("sp", "cp")
    )
    rng = np.random.default_rng(18)
    src = rng.integers(0, 256, (768, 1024 * 3), dtype=np.uint8)
    plan = build_resize_plan(
        1024, 768, 512, 384, 3, np.uint8, np.uint8
    )
    single = make_avir_executor(
        plan, errdiff=True, errdiff_impl="wavefront"
    )
    sharded = make_sharded_avir_executor_2d(
        plan, mesh, dither="errdiff"
    )
    d = jax.device_put(src)
    assert _maxdiff(single(d), sharded(d)) <= 1
