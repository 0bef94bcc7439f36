"""Pallas banded-kernel tests (interpret mode, pinned to the CPU
device — interpret mode on the TPU backend uses default-precision dots
and is not numerically faithful; the compiled Mosaic path is exercised
on the real chip by bench.py and the TPU spot checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _on_cpu():
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        yield
        return
    with jax.default_device(cpu):
        yield

from avir_tpu.ops.banded import apply_blocked, block_banded
from avir_tpu.ops.pallas.banded_kernel import apply_blocked_pallas
from avir_tpu.plan.plan import build_resize_plan

from conftest import xorshift128_fill


def _ops():
    plan = build_resize_plan(200, 150, 80, 60, 3, np.uint8, np.uint8)
    return block_banded(plan.v.op), block_banded(plan.h.op)


def test_split2_matches_xla_u8():
    vop, _ = _ops()
    x = xorshift128_fill((150, 600), np.uint8, 3)
    ref = np.asarray(
        apply_blocked(vop, jnp.asarray(x, jnp.float32), "split2")
    )
    got = np.asarray(
        apply_blocked_pallas(vop, jnp.asarray(x), "split2", interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_split3_matches_xla_f32():
    vop, _ = _ops()
    x = (
        xorshift128_fill((150, 600), np.uint16, 4).astype(np.float32)
        / 257.0
    )
    ref = np.asarray(
        apply_blocked(vop, jnp.asarray(x), "exact")
    )
    got = np.asarray(
        apply_blocked_pallas(vop, jnp.asarray(x), "split3", interpret=True)
    )
    # split3 carries ~16 mantissa bits of the taps: ppm-level agreement.
    np.testing.assert_allclose(
        got, ref, atol=np.abs(ref).max() * 1e-5
    )


def test_lane_padding():
    """R not a multiple of the lane tile exercises the pad/slice path."""
    vop, _ = _ops()
    x = xorshift128_fill((150, 130), np.uint8, 5)
    ref = np.asarray(
        apply_blocked(vop, jnp.asarray(x, jnp.float32), "split2")
    )
    got = np.asarray(
        apply_blocked_pallas(vop, jnp.asarray(x), "split2", interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_lanes_matches_transpose_route():
    """Lane-side (right-multiply) form vs the transpose route."""
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.lanes_kernel import (
        apply_lanes_pallas,
        apply_lanes_xla,
    )

    plan = build_resize_plan(200, 150, 80, 60, 3, np.uint8, np.uint8)
    hop_row = block_banded(plan.h.op)
    lop = lane_block_banded(plan.h.op, 3)
    x = xorshift128_fill((60, 200 * 3), np.uint8, 11).astype(np.float32)
    xr = (
        jnp.asarray(x)
        .reshape(60, 200, 3)
        .transpose(1, 0, 2)
        .reshape(200, 180)
    )
    ref = np.asarray(apply_blocked(hop_row, xr, "exact"))
    ref = ref.reshape(80, 60, 3).transpose(1, 0, 2).reshape(60, 240)
    tol = np.abs(ref).max() * 1e-4
    got = np.asarray(apply_lanes_xla(lop, jnp.asarray(x), "split2"))
    np.testing.assert_allclose(got, ref, atol=tol)
    got_p = np.asarray(
        apply_lanes_pallas(lop, jnp.asarray(x), "split2", interpret=True)
    )
    np.testing.assert_allclose(got_p, ref, atol=tol)


def test_fused_two_pass_kernel():
    """Fused V+H mega-kernel vs the exact two-stage route."""
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas

    plan = build_resize_plan(200, 150, 80, 60, 3, np.uint8, np.uint8)
    vop = block_banded(plan.v.op)
    hop = block_banded(plan.h.op)
    lop = lane_block_banded(plan.h.op, 3)
    x = xorshift128_fill((150, 600), np.uint8, 21)

    v = apply_blocked(vop, jnp.asarray(x, jnp.float32), "exact")[:60]
    t = (
        np.asarray(v)
        .reshape(60, 200, 3)
        .transpose(1, 0, 2)
        .reshape(200, 180)
    )
    ref = (
        np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
        .reshape(80, 60, 3)
        .transpose(1, 0, 2)
        .reshape(60, 240)
    )

    out = np.asarray(
        apply_fused_pallas(vop, lop, jnp.asarray(x), interpret=True)
    )[:60, :240]
    np.testing.assert_allclose(out, ref, atol=np.abs(ref).max() * 1e-4)

    outq = np.asarray(
        apply_fused_pallas(
            vop, lop, jnp.asarray(x), out_dtype=jnp.uint8,
            interpret=True,
        )
    )[:60, :240]
    refq = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)
    assert np.abs(outq.astype(int) - refq.astype(int)).max() <= 1


def test_fused_kernel_hv_order_upsize():
    """H-first fused order (upsize) vs the exact two-stage route."""
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas

    plan = build_resize_plan(80, 60, 200, 150, 3, np.uint8, np.uint8)
    vop = block_banded(plan.v.op)
    hop = block_banded(plan.h.op)
    lop = lane_block_banded(plan.h.op, 3)
    x = xorshift128_fill((60, 240), np.uint8, 77)

    v = apply_blocked(vop, jnp.asarray(x, jnp.float32), "exact")[:150]
    t = (
        np.asarray(v).reshape(150, 80, 3).transpose(1, 0, 2)
        .reshape(80, 450)
    )
    ref = (
        np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
        .reshape(200, 150, 3).transpose(1, 0, 2).reshape(150, 600)
    )

    # mode_h (first pass, raw u8 input) split2; mode_v split3.
    out = np.asarray(
        apply_fused_pallas(
            vop, lop, jnp.asarray(x), "split3", "split2",
            order="hv", interpret=True,
        )
    )[:150, :600]
    np.testing.assert_allclose(out, ref, atol=np.abs(ref).max() * 1e-4)


def test_fused_kernel_wide_upsize_tiles():
    """The DMA-shaped upsize tiles (pick_tile=256 rows,
    pick_lane_tile ~2304 lanes — docs/perf_analysis.md upsizing
    section) produce <= 1 LSB vs the f64 oracle through the production
    executor in interpret mode.  Sized to actually trigger the wide
    path (n_out*c >= 4096 and k < 1 on both axes)."""
    from avir_tpu.models.host_reference import execute_plan_numpy
    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.ops.lanes import pick_lane_tile

    plan = build_resize_plan(512, 600, 1536, 1800, 3, np.uint8, np.uint8)
    assert pick_lane_tile(plan.h.op, 3) == 768  # wide path engaged
    from avir_tpu.ops.banded import pick_tile

    assert pick_tile(plan.v.op) == 256
    x = xorshift128_fill((600, 512 * 3), np.uint8, 83)
    fn = make_avir_executor(plan, engine="pallas")
    # interpret mode: conftest runs on CPU
    out = np.asarray(_interpret_executor(fn, plan, x))
    ref = execute_plan_numpy(plan, x.reshape(600, 512, 3)).reshape(
        1800, 1536 * 3
    )
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_fused_kernel_interior_boundary_split():
    """Interior/boundary lane split (ops/lanes.py block_list +
    fused_kernel out_init aliasing): the two-call assembly is
    BIT-IDENTICAL to the single-call int8 route (the interior's
    tighter chunk window only drops structural-zero columns; s32 adds
    are exact) and <= 1 LSB vs the f64 oracle end to end."""
    from avir_tpu.models.host_reference import execute_plan_numpy
    from avir_tpu.models.runtime import (
        _split_lane_ops,
        make_avir_executor,
    )
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas

    plan = build_resize_plan(2048, 1536, 512, 384, 3, np.uint8, np.uint8)
    vop = block_banded(plan.v.op)
    lop = lane_block_banded(plan.h.op, 3)
    li, lb = _split_lane_ops(plan.h.op, lop, 3)
    assert li is not None and li.win_c < lop.win_c
    assert list(np.asarray(lb.out_idx)) == [0, lop.n_blocks - 1]

    x = xorshift128_fill((1536, 2048 * 3), np.uint8, 91)
    xj = jnp.asarray(x)
    kw = dict(out_dtype=jnp.uint8, out_max=255.0, order="vh",
              interpret=True)
    single = np.asarray(
        apply_fused_pallas(vop, lop, xj, "int8", "int8", **kw)
    )
    ob = apply_fused_pallas(
        vop, lb, xj, "int8", "int8", out_blocks=lop.n_blocks, **kw
    )
    split = np.asarray(
        apply_fused_pallas(
            vop, li, xj, "int8", "int8", out_blocks=lop.n_blocks,
            out_init=ob, **kw,
        )
    )
    np.testing.assert_array_equal(split, single)

    # and through the production executor
    fn = make_avir_executor(plan, engine="pallas")
    out = np.asarray(_interpret_executor(fn, plan, x))
    ref = execute_plan_numpy(plan, x.reshape(1536, 2048, 3)).reshape(
        384, 512 * 3
    )
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_fused_upsize_u16_and_f32_route():
    """2/4-byte upsizes route through the fused V-first kernel at the
    byte-aware tiles (VERDICT r3: BASELINE config 3 ran unfused at
    6 ms) — executor output <= 4 LSB u16 / 2e-4 f32 vs the f64 oracle,
    gamma included."""
    from avir_tpu.models.host_reference import execute_plan_numpy
    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.ops.pallas.fused_kernel import choose_fused

    from conftest import psnr

    # Tolerances: the u16-gamma pipeline's split3+f32-gamma accuracy
    # is ~5 LSB worst-case on this config on the UNFUSED route too
    # (one pixel at 5; measured) — the fused route must not be worse.
    for tin, gamma, tol in (
        (np.uint16, True, 5),
        (np.uint16, False, 4),
        (np.float32, False, 2e-4 * 65535.0),
    ):
        plan = build_resize_plan(
            512, 600, 1536, 1800, 3, tin,
            tin if tin != np.float32 else np.float32,
            use_srgb_gamma=gamma, res_bit_depth=16,
        )
        x = xorshift128_fill((600, 512 * 3), tin, 83)
        fn = make_avir_executor(plan, engine="pallas")
        out = np.asarray(_interpret_executor(fn, plan, x))
        ref = execute_plan_numpy(
            plan, x.reshape(600, 512, 3)
        ).reshape(1800, 1536 * 3)
        err = np.abs(
            out.astype(np.float64) - ref.astype(np.float64)
        ).max()
        assert err <= tol, (tin, gamma, err)
        if tin == np.uint16:
            assert psnr(out, ref, 65535.0) >= 60.0, (tin, gamma)


def test_fused_upsize_u16_single_channel():
    """c=1 u16 upsize exercises the byte-aware tile picker's
    1152-px candidate (tile*c must stay a 128-lane multiple) through
    the production executor."""
    from avir_tpu.models.host_reference import execute_plan_numpy
    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.ops.lanes import pick_lane_tile

    plan = build_resize_plan(
        2048, 64, 4608, 128, 1, np.uint16, np.uint16,
        res_bit_depth=16,
    )
    lt = pick_lane_tile(plan.h.op, 1, in_bytes=2)
    assert lt * 1 % 128 == 0 and lt >= 1152
    x = xorshift128_fill((64, 2048), np.uint16, 59)
    fn = make_avir_executor(plan, engine="pallas")
    out = np.asarray(_interpret_executor(fn, plan, x))
    ref = execute_plan_numpy(plan, x.reshape(64, 2048, 1)).reshape(
        128, 4608
    )
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 4


def test_fused_kernel_compact_split_vmap():
    """Vmap-safe lane split (compact_out + lane concat): bit-identical
    to the single-call int8 route, and — the property the aliased
    out_init assembly lacks — composes under jax.vmap, recovering the
    interior/boundary H-MAC saving on batched paths
    (models/avir.py resize_batch, parallel/sharded.py dp x sp)."""
    from avir_tpu.models.runtime import _split_lane_ops
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas

    plan = build_resize_plan(2048, 1536, 512, 384, 3, np.uint8, np.uint8)
    vop = block_banded(plan.v.op)
    lop = lane_block_banded(plan.h.op, 3)
    li, lb = _split_lane_ops(plan.h.op, lop, 3)
    assert li is not None

    kw = dict(out_dtype=jnp.uint8, out_max=255.0, order="vh",
              interpret=True)
    tc = lop.tile * 3

    def compact(xj):
        ob = apply_fused_pallas(
            vop, lb, xj, "int8", "int8", compact_out=True, **kw
        )
        oi = apply_fused_pallas(
            vop, li, xj, "int8", "int8", compact_out=True, **kw
        )
        return jnp.concatenate([ob[:, :tc], oi, ob[:, tc:]], axis=1)

    x = xorshift128_fill((1536, 2048 * 3), np.uint8, 17)
    xj = jnp.asarray(x)
    single = np.asarray(
        apply_fused_pallas(vop, lop, xj, "int8", "int8", **kw)
    )
    np.testing.assert_array_equal(np.asarray(compact(xj)), single)

    # under a batch dimension (pre-pad: vmapped bodies can't pad)
    x2 = xorshift128_fill((1536, 2048 * 3), np.uint8, 18)
    need_r, need_l = vop.n_in_pad, lop.lanes_pad
    batch = np.zeros((2, max(1536, need_r), max(2048 * 3, need_l)),
                     np.uint8)
    batch[0, :1536, : 2048 * 3] = x
    batch[1, :1536, : 2048 * 3] = x2
    outs = np.asarray(jax.vmap(compact)(jnp.asarray(batch)))
    np.testing.assert_array_equal(outs[0], single)
    single2 = np.asarray(
        apply_fused_pallas(
            vop, lop, jnp.asarray(batch[1]), "int8", "int8", **kw
        )
    )
    np.testing.assert_array_equal(outs[1], single2)


def test_executor_concat_split_engages():
    """The batch-path executors (split_lanes=False) regain the lane
    split via the concat assembly when modeled profitable
    (VERDICT r2 item 3): engaged at the 8K headline geometry, and the
    end-to-end vmapped output matches the single-image executor."""
    from unittest import mock

    import avir_tpu.models.runtime as rt

    # Decision engages at the 8K downsize (both gamma and not).
    for gamma in (False, True):
        plan8k = build_resize_plan(
            7680, 4320, 1920, 1080, 3, np.uint8, np.uint8,
            use_srgb_gamma=gamma,
        )
        fn = rt.make_avir_executor(
            plan8k, engine="pallas", split_lanes=False
        )
        assert fn.lane_split == "concat", gamma
        fn1 = rt.make_avir_executor(plan8k, engine="pallas")
        assert fn1.lane_split == "alias", gamma

    # End-to-end parity at a CPU-sized geometry (force the decision —
    # profitability is geometry-dependent, the plumbing is not).
    plan = build_resize_plan(2048, 1536, 512, 384, 3, np.uint8, np.uint8)
    with mock.patch.object(rt, "_concat_split_ok", lambda *a: True):
        fn = rt.make_avir_executor(
            plan, engine="pallas", split_lanes=False
        )
    assert fn.lane_split == "concat"
    x = xorshift128_fill((1536, 2048 * 3), np.uint8, 29)
    out_c = np.asarray(_interpret_executor(fn, plan, x))
    fn_ref = rt.make_avir_executor(plan, engine="pallas")
    out_a = np.asarray(_interpret_executor(fn_ref, plan, x))
    np.testing.assert_array_equal(out_c, out_a)

    # and composed under vmap — the property that motivated the
    # concat assembly in the first place.
    vm = jax.vmap(fn)
    outs = _interpret_executor(vm, plan, np.stack([x, x]))
    np.testing.assert_array_equal(np.asarray(outs)[0], out_c)


def _interpret_executor(fn, plan, x):
    """Run the pallas-engine executor under interpret mode on CPU."""
    import jax.numpy as jnp
    from unittest import mock

    import avir_tpu.ops.pallas.fused_kernel as fk
    import avir_tpu.ops.pallas.banded_kernel as bk
    import avir_tpu.ops.pallas.lanes_kernel as lk

    orig_fused = fk.apply_fused_pallas

    def fused_i(*a, **kw):
        kw["interpret"] = True
        return orig_fused(*a, **kw)

    orig_b = bk.apply_blocked_pallas

    def b_i(*a, **kw):
        kw["interpret"] = True
        return orig_b(*a, **kw)

    orig_l = lk.apply_lanes_pallas

    def l_i(*a, **kw):
        kw["interpret"] = True
        return orig_l(*a, **kw)

    with mock.patch.object(fk, "apply_fused_pallas", fused_i), \
         mock.patch.object(bk, "apply_blocked_pallas", b_i), \
         mock.patch.object(lk, "apply_lanes_pallas", l_i):
        return fn(jnp.asarray(x))


def test_fused_kernel_int8_mode():
    """MXU-int8 fixed-point route (ops/intq.py) vs the exact route:
    quantized output within 1 LSB, both pass orders."""
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas

    for sw, sh, nw, nh, order, seed in (
        (200, 150, 80, 60, "vh", 21),
        (80, 60, 200, 150, "hv", 77),
    ):
        plan = build_resize_plan(sw, sh, nw, nh, 3, np.uint8, np.uint8)
        vop = block_banded(plan.v.op)
        hop = block_banded(plan.h.op)
        lop = lane_block_banded(plan.h.op, 3)
        x = xorshift128_fill((sh, sw * 3), np.uint8, seed)

        v = apply_blocked(vop, jnp.asarray(x, jnp.float32), "exact")[:nh]
        t = (
            np.asarray(v).reshape(nh, sw, 3).transpose(1, 0, 2)
            .reshape(sw, nh * 3)
        )
        ref = (
            np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
            .reshape(nw, nh, 3).transpose(1, 0, 2).reshape(nh, nw * 3)
        )
        refq = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)

        outq = np.asarray(
            apply_fused_pallas(
                vop, lop, jnp.asarray(x), "int8", "int8",
                out_dtype=jnp.uint8, order=order, interpret=True,
            )
        )[:nh, :nw * 3]
        assert np.abs(outq.astype(int) - refq.astype(int)).max() <= 1


def test_int8_limb_quantization_exact():
    """Two-limb radix-128 split reconstructs round(taps * 2^shift)."""
    from avir_tpu.ops.intq import quantize_limbs

    rng = np.random.default_rng(5)
    taps = rng.standard_normal((7, 33)) * 1.4
    q1, q0, shift = quantize_limbs(taps)
    q = q1.astype(np.int64) * 128 + q0.astype(np.int64)
    np.testing.assert_array_equal(
        q, np.round(taps * (1 << shift)).astype(np.int64)
    )
    assert np.abs(q - taps * (1 << shift)).max() <= 0.5


def test_int8_mode_rejects_ineligible_inputs():
    """int8 mode is u8-in only, both passes together."""
    import pytest

    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas

    plan = build_resize_plan(64, 48, 32, 24, 3, np.uint8, np.uint8)
    vop = block_banded(plan.v.op)
    lop = lane_block_banded(plan.h.op, 3)
    xf = jnp.zeros((48, 192), jnp.float32)
    xu = jnp.zeros((48, 192), jnp.uint8)
    with pytest.raises(ValueError):
        apply_fused_pallas(vop, lop, xf, "int8", "int8", interpret=True)
    with pytest.raises(ValueError):
        apply_fused_pallas(vop, lop, xu, "int8", "split3", interpret=True)


def test_fused_kernel_int8_gamma_mode():
    """MXU-int8 route with the fused sRGB gamma stages vs the exact
    linear-light route: quantized output within 1 LSB, both orders."""
    from avir_tpu.ops.gamma import linear_to_srgb_2d, srgb_to_linear_2d
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas

    for sw, sh, nw, nh, order, seed in (
        (200, 150, 80, 60, "vh", 33),
        (80, 60, 200, 150, "hv", 91),
    ):
        plan = build_resize_plan(
            sw, sh, nw, nh, 3, np.uint8, np.uint8, use_srgb_gamma=True
        )
        vop = block_banded(plan.v.op)
        hop = block_banded(plan.h.op)
        lop = lane_block_banded(plan.h.op, 3)
        x = xorshift128_fill((sh, sw * 3), np.uint8, seed)

        lin = srgb_to_linear_2d(
            jnp.asarray(x, jnp.float32)
            * jnp.float32(plan.in_gamma_mult),
            3,
            plan.alpha_index,
        )
        v = apply_blocked(vop, lin, "exact")[:nh]
        t = (
            np.asarray(v).reshape(nh, sw, 3).transpose(1, 0, 2)
            .reshape(sw, nh * 3)
        )
        ref = (
            np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
            .reshape(nw, nh, 3).transpose(1, 0, 2).reshape(nh, nw * 3)
        )
        ref = np.asarray(
            linear_to_srgb_2d(jnp.asarray(ref), 3, plan.alpha_index)
        ) * plan.out_gamma_mult
        refq = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)

        outq = np.asarray(
            apply_fused_pallas(
                vop, lop, jnp.asarray(x), "int8", "int8",
                out_dtype=jnp.uint8, order=order, gamma=True,
                alpha_index=plan.alpha_index,
                in_gamma_mult=plan.in_gamma_mult,
                out_gamma_mult=plan.out_gamma_mult,
                interpret=True,
            )
        )[:nh, :nw * 3]
        assert np.abs(outq.astype(int) - refq.astype(int)).max() <= 1


def test_planar_fused_kernel():
    """Planar (de-interleaved) fused kernel vs the exact two-stage
    route, u8 RGB downsize."""
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.planar_kernel import (
        apply_planar_pallas,
        deinterleave,
        plane_stride,
        reinterleave,
    )

    plan = build_resize_plan(200, 150, 80, 60, 3, np.uint8, np.uint8)
    vop = block_banded(plan.v.op)
    hop = block_banded(plan.h.op)
    pop = lane_block_banded(plan.h.op, 1)
    x = xorshift128_fill((150, 600), np.uint8, 55)

    v = apply_blocked(vop, jnp.asarray(x, jnp.float32), "exact")[:60]
    t = (
        np.asarray(v).reshape(60, 200, 3).transpose(1, 0, 2)
        .reshape(200, 180)
    )
    ref = (
        np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
        .reshape(80, 60, 3).transpose(1, 0, 2).reshape(60, 240)
    )

    hp = plane_stride(vop)
    wp = max(200, pop.lanes_pad)
    xp = deinterleave(jnp.asarray(x), 150, 200, 3, hp, wp)
    outp = apply_planar_pallas(
        vop, pop, xp, 3, "split2", "split3", interpret=True
    )
    out = np.asarray(
        reinterleave(outp, 3, vop.n_blocks * vop.tile, 60, 80)
    )
    np.testing.assert_allclose(out, ref, atol=np.abs(ref).max() * 1e-4)

    outq = apply_planar_pallas(
        vop, pop, xp, 3, "split2", "split3",
        out_dtype=jnp.uint8, interpret=True,
    )
    outq = np.asarray(
        reinterleave(outq, 3, vop.n_blocks * vop.tile, 60, 80)
    )
    refq = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)
    assert np.abs(outq.astype(int) - refq.astype(int)).max() <= 1


def test_planar_fused_kernel_gamma_alpha():
    """Planar fused kernel with in-kernel gamma: the alpha plane is a
    whole-plane bypass (u16 RGBA upsize)."""
    from avir_tpu.ops.gamma import linear_to_srgb_2d, srgb_to_linear_2d
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.planar_kernel import (
        apply_planar_pallas,
        deinterleave,
        plane_stride,
        reinterleave,
    )

    plan = build_resize_plan(
        96, 80, 144, 120, 4, np.uint16, np.uint16,
        res_bit_depth=16, use_srgb_gamma=True, alpha_index=3,
    )
    vop = block_banded(plan.v.op)
    hop = block_banded(plan.h.op)
    pop = lane_block_banded(plan.h.op, 1)
    x = xorshift128_fill((80, 384), np.uint16, 91)

    lin = srgb_to_linear_2d(
        jnp.asarray(x, jnp.float32) * jnp.float32(plan.in_gamma_mult),
        4, 3,
    )
    v = apply_blocked(vop, lin, "exact")[:120]
    t = (
        np.asarray(v).reshape(120, 96, 4).transpose(1, 0, 2)
        .reshape(96, 480)
    )
    ref = (
        np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
        .reshape(144, 120, 4).transpose(1, 0, 2).reshape(120, 576)
    )
    ref = np.asarray(linear_to_srgb_2d(jnp.asarray(ref), 4, 3))
    if plan.out_gamma_mult != 0.0:
        ref = ref * plan.out_gamma_mult
    refq = np.clip(np.floor(ref + 0.5), 0, 65535).astype(np.uint16)

    hp = plane_stride(vop)
    wp = max(96, pop.lanes_pad)
    xp = deinterleave(jnp.asarray(x), 80, 96, 4, hp, wp)
    outp = apply_planar_pallas(
        vop, pop, xp, 4, "split3", "split3",
        out_dtype=jnp.uint16, out_max=65535.0,
        gamma=True, alpha_plane=3,
        in_gamma_mult=plan.in_gamma_mult,
        out_gamma_mult=plan.out_gamma_mult,
        interpret=True,
    )
    out = np.asarray(
        reinterleave(outp, 4, vop.n_blocks * vop.tile, 120, 144)
    ).reshape(120, 144, 4).reshape(120, 576)
    assert np.abs(out.astype(int) - refq.astype(int)).max() <= 24


def test_planar2_fused_kernel():
    """In-VMEM de-interleave kernel (planar2) vs exact route, u8 RGB."""
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.planar2_kernel import (
        apply_planar2_pallas,
        regroup_channels,
    )

    plan = build_resize_plan(200, 150, 80, 60, 3, np.uint8, np.uint8)
    vop = block_banded(plan.v.op)
    hop = block_banded(plan.h.op)
    pop = lane_block_banded(plan.h.op, 1)
    x = xorshift128_fill((150, 600), np.uint8, 60)

    v = apply_blocked(vop, jnp.asarray(x, jnp.float32), "exact")[:60]
    t = (
        np.asarray(v).reshape(60, 200, 3).transpose(1, 0, 2)
        .reshape(200, 180)
    )
    ref = (
        np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
        .reshape(80, 60, 3).transpose(1, 0, 2).reshape(60, 240)
    )

    outg = apply_planar2_pallas(
        vop, pop, jnp.asarray(x), 3, "split2", "split3",
        interpret=True,
    )
    out = np.asarray(regroup_channels(outg, 3, pop.tile, 60, 80))
    np.testing.assert_allclose(out, ref, atol=np.abs(ref).max() * 1e-4)

    outq = apply_planar2_pallas(
        vop, pop, jnp.asarray(x), 3, "split2", "split3",
        out_dtype=jnp.uint8, interpret=True,
    )
    outq = np.asarray(regroup_channels(outq, 3, pop.tile, 60, 80))
    refq = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)
    assert np.abs(outq.astype(int) - refq.astype(int)).max() <= 1


def test_planar2_fused_kernel_gamma_alpha():
    """planar2 with in-kernel gamma + alpha bypass (u16 RGBA)."""
    from avir_tpu.ops.gamma import linear_to_srgb_2d, srgb_to_linear_2d
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.planar2_kernel import (
        apply_planar2_pallas,
        regroup_channels,
    )

    plan = build_resize_plan(
        96, 80, 144, 120, 4, np.uint16, np.uint16,
        res_bit_depth=16, use_srgb_gamma=True, alpha_index=3,
    )
    vop = block_banded(plan.v.op)
    hop = block_banded(plan.h.op)
    pop = lane_block_banded(plan.h.op, 1)
    x = xorshift128_fill((80, 384), np.uint16, 92)

    lin = srgb_to_linear_2d(
        jnp.asarray(x, jnp.float32) * jnp.float32(plan.in_gamma_mult),
        4, 3,
    )
    v = apply_blocked(vop, lin, "exact")[:120]
    t = (
        np.asarray(v).reshape(120, 96, 4).transpose(1, 0, 2)
        .reshape(96, 480)
    )
    ref = (
        np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
        .reshape(144, 120, 4).transpose(1, 0, 2).reshape(120, 576)
    )
    ref = np.asarray(linear_to_srgb_2d(jnp.asarray(ref), 4, 3))
    if plan.out_gamma_mult != 0.0:
        ref = ref * plan.out_gamma_mult
    refq = np.clip(np.floor(ref + 0.5), 0, 65535).astype(np.uint16)

    outg = apply_planar2_pallas(
        vop, pop, jnp.asarray(x), 4, "split3", "split3",
        out_dtype=jnp.uint16, out_max=65535.0,
        gamma=True, alpha_index=3,
        in_gamma_mult=plan.in_gamma_mult,
        out_gamma_mult=plan.out_gamma_mult,
        interpret=True,
    )
    out = np.asarray(regroup_channels(outg, 4, pop.tile, 120, 144))
    assert np.abs(out.astype(int) - refq.astype(int)).max() <= 24


def test_fused_kernel_gamma_alpha():
    """Fused kernel with in-kernel sRGB gamma (u16 RGBA, alpha bypass)
    vs the unfused route (gamma -> exact passes -> gamma-out)."""
    from avir_tpu.ops.gamma import linear_to_srgb_2d, srgb_to_linear_2d
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas

    plan = build_resize_plan(
        160, 120, 64, 48, 4, np.uint16, np.uint16,
        res_bit_depth=16, use_srgb_gamma=True, alpha_index=3,
    )
    vop = block_banded(plan.v.op)
    hop = block_banded(plan.h.op)
    lop = lane_block_banded(plan.h.op, 4)
    x = xorshift128_fill((120, 640), np.uint16, 31)

    lin = srgb_to_linear_2d(
        jnp.asarray(x, jnp.float32) * jnp.float32(plan.in_gamma_mult),
        4, 3,
    )
    v = apply_blocked(vop, lin, "exact")[:48]
    t = (
        np.asarray(v).reshape(48, 160, 4).transpose(1, 0, 2)
        .reshape(160, 192)
    )
    ref = (
        np.asarray(apply_blocked(hop, jnp.asarray(t), "exact"))
        .reshape(64, 48, 4).transpose(1, 0, 2).reshape(48, 256)
    )
    ref = np.asarray(linear_to_srgb_2d(jnp.asarray(ref), 4, 3))
    if plan.out_gamma_mult != 0.0:
        ref = ref * plan.out_gamma_mult

    out = np.asarray(
        apply_fused_pallas(
            vop, lop, jnp.asarray(x), "split3", "split3",
            out_dtype=jnp.uint16, out_max=65535.0,
            gamma=True, alpha_index=3,
            in_gamma_mult=plan.in_gamma_mult,
            out_gamma_mult=plan.out_gamma_mult,
            interpret=True,
        )
    )[:48, :256]
    refq = np.clip(np.floor(ref + 0.5), 0, 65535).astype(np.uint16)
    # split-bf16 passes under a gamma nonlinearity: allow a few LSBs.
    assert np.abs(out.astype(int) - refq.astype(int)).max() <= 24


def test_fused_kernel_gamma_prologue_route():
    """Linearize-once prologue (gamma_prologue.py) + limb-plane fused
    kernel is bit-identical to the in-kernel int8 gamma route."""
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas
    from avir_tpu.ops.pallas.gamma_prologue import apply_gamma_prologue

    for sw, sh, nw, nh, order, c, alpha, seed in (
        (200, 150, 80, 60, "vh", 3, -1, 33),
        (80, 60, 200, 150, "hv", 4, 3, 91),
    ):
        plan = build_resize_plan(
            sw, sh, nw, nh, c, np.uint8, np.uint8,
            use_srgb_gamma=True, alpha_index=alpha,
        )
        vop = block_banded(plan.v.op)
        lop = lane_block_banded(plan.h.op, c)
        x = xorshift128_fill((sh, sw * c), np.uint8, seed)

        kw = dict(
            out_dtype=jnp.uint8, order=order, gamma=True,
            alpha_index=plan.alpha_index,
            in_gamma_mult=plan.in_gamma_mult,
            out_gamma_mult=plan.out_gamma_mult,
            interpret=True,
        )
        base = np.asarray(
            apply_fused_pallas(
                vop, lop, jnp.asarray(x), "int8", "int8", **kw
            )
        )[:nh, : nw * c]
        hi, lo = apply_gamma_prologue(
            jnp.asarray(x), vop.n_in_pad, lop.lanes_pad, c,
            plan.alpha_index, plan.in_gamma_mult, interpret=True,
        )
        got = np.asarray(
            apply_fused_pallas(
                vop, lop, hi, "int8", "int8", x_lo=lo, **kw
            )
        )[:nh, : nw * c]
        np.testing.assert_array_equal(got, base)


def test_fused_ring_kernel_matches_fused():
    """Shift-ring gamma kernel (fused_ring_kernel.py) is bit-identical
    to the plain fused int8 gamma route."""
    from avir_tpu.ops.lanes import lane_block_banded
    from avir_tpu.ops.pallas.fused_kernel import apply_fused_pallas
    from avir_tpu.ops.pallas.fused_ring_kernel import (
        apply_fused_ring_pallas,
        ring_viable,
    )

    for sw, sh, nw, nh, c, alpha, tile, seed, uniform in (
        (256, 768, 64, 192, 3, -1, 64, 5, False),     # n_pre == 1
        (128, 768, 32, 192, 4, 3, 64, 9, False),      # n_pre == 1, alpha
        (384, 512, 96, 128, 3, -1, None, 17, False),  # n_pre == 2
        # uniform-offset blocking: boundary clamping replaced by
        # pad_top (the 8K-headline geometry analog)
        (512, 1024, 128, 256, 3, -1, 64, 23, True),
        (256, 960, 128, 480, 4, 3, 64, 29, True),     # 2x, pad_top
    ):
        plan = build_resize_plan(
            sw, sh, nw, nh, c, np.uint8, np.uint8,
            use_srgb_gamma=True, alpha_index=alpha,
        )
        vop = block_banded(plan.v.op, tile=tile)
        lop = lane_block_banded(plan.h.op, c)
        ring_vop = vop
        if uniform:
            ring_vop = block_banded(plan.v.op, tile=tile, uniform=True)
            assert ring_vop.pad_top > 0, (sw, sh, nw, nh)
        assert ring_viable(ring_vop, lop, True, "vh"), (sw, sh, nw, nh)
        x = xorshift128_fill((sh, sw * c), np.uint8, seed)

        kw = dict(
            out_dtype=jnp.uint8, alpha_index=plan.alpha_index,
            in_gamma_mult=plan.in_gamma_mult,
            out_gamma_mult=plan.out_gamma_mult,
            interpret=True,
        )
        base = np.asarray(
            apply_fused_pallas(
                vop, lop, jnp.asarray(x), "int8", "int8",
                order="vh", gamma=True, **kw
            )
        )[:nh, : nw * c]
        got = np.asarray(
            apply_fused_ring_pallas(ring_vop, lop, jnp.asarray(x), **kw)
        )[:nh, : nw * c]
        np.testing.assert_array_equal(got, base)
