"""Pallas banded-kernel tests (interpret mode on CPU; the compiled
Mosaic path is exercised on the real chip by bench.py and the TPU spot
checks)."""

import jax.numpy as jnp
import numpy as np

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
