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
