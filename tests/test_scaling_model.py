"""Analytic pod-scaling model (parallel/scaling_model.py): exactness
of the plan-derived quantities and the published claims' shape."""

import numpy as np

from avir_tpu.parallel.scaling_model import ScalePoint, model_scaling
from avir_tpu.plan.plan import build_resize_plan


def test_halo_bytes_exact_and_eff_bounded():
    plan = build_resize_plan(
        7680, 4320, 1920, 1080, 3, np.uint8, np.uint8
    )
    pts = model_scaling(plan, 334e-6, n_devs=(2, 4, 8))
    from avir_tpu.parallel.sharded import shard_v_blocked

    for p in pts:
        assert isinstance(p, ScalePoint)
        sv = shard_v_blocked(
            plan.v.op, p.n_dev, 4320 + ((-4320) % p.n_dev)
        )
        assert p.halo_rows == max(sv.halo_lo, sv.halo_hi)
        assert p.halo_bytes == p.halo_rows * 7680 * 3
        assert 0.0 < p.efficiency <= 1.0
    # efficiency decreases with device count for a fixed image
    effs = [p.efficiency for p in pts]
    assert effs == sorted(effs, reverse=True)


def test_16k_config_meets_baseline_target():
    """The BASELINE multi-host geometry (16K x 16K -> 4K) must hold
    >= 0.8 predicted efficiency through 8 chips — the basis of the
    docs/scaling.md claim."""
    plan = build_resize_plan(
        16384, 16384, 4096, 4096, 3, np.uint8, np.uint8
    )
    pts = model_scaling(plan, 1.34e-3, n_devs=(2, 4, 8))
    for p in pts:
        assert p.efficiency >= 0.8, (p.n_dev, p.efficiency)
    # and the interior/halo overlap is actually engaged (halo hidden)
    assert all(p.t_exposed_us == 0.0 for p in pts)


def test_lancir_plan_adapter():
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    lp = build_lancir_plan(1536, 1024, 768, 512, 3, np.uint8, np.uint8)
    pts = model_scaling(lp, 100e-6, n_devs=(2, 4))
    assert len(pts) == 2 and all(p.efficiency > 0 for p in pts)


def test_cores_cap():
    plan = build_resize_plan(
        1536, 1024, 768, 512, 3, np.uint8, np.uint8
    )
    free = model_scaling(plan, 1e-3, n_devs=(8,))[0]
    capped = model_scaling(plan, 1e-3, n_devs=(8,), cores=4)[0]
    assert capped.t_comp_us > free.t_comp_us
    assert capped.efficiency < free.efficiency


def test_errdiff_model_floor_bounded():
    """Sharded error diffusion replicates the full-image wavefront on
    every device (parallel/sharded.py errdiff epilogue), so modeled
    efficiency is floor-bounded by t_wavefront and must fall below the
    dither='default' efficiency at every n (VERDICT r4 item 4)."""
    from avir_tpu.parallel.scaling_model import (
        ScalePointErrdiff,
        model_scaling_errdiff,
    )

    plan = build_resize_plan(
        7680, 4320, 1920, 1080, 3, np.uint8, np.uint8
    )
    t_chip, t_wf = 334e-6, 2.16e-3  # measured (docs/perf_analysis.md)
    pts = model_scaling_errdiff(plan, t_chip, t_wf, n_devs=(2, 4, 8))
    base = model_scaling(plan, t_chip, n_devs=(2, 4, 8))
    for p, b in zip(pts, base):
        assert isinstance(p, ScalePointErrdiff)
        assert p.t_wavefront_us == t_wf * 1e6
        assert p.t_step_us > p.t_wavefront_us  # wavefront is a floor
        assert p.efficiency < b.efficiency
        # hard upper bound: even with a free resize, n devices cannot
        # beat (t_chip + t_wf) / (n * t_wf)
        assert p.efficiency <= (t_chip + t_wf) / (p.n_dev * t_wf)
    # efficiency still decreases with n
    effs = [p.efficiency for p in pts]
    assert effs == sorted(effs, reverse=True)


def test_u16_itemsize_halo_bytes():
    """Halo bytes must use the REAL input element size (u16 = 2 B,
    float = 4 B), and the model's tile must match the byte-aware tile
    the production strip route picks."""
    from avir_tpu.plan.lancir_plan import build_lancir_plan

    lp = build_lancir_plan(
        1536, 1024, 768, 512, 3, np.uint16, np.uint16
    )
    p = model_scaling(lp, 100e-6, n_devs=(2,))[0]
    assert p.halo_bytes == p.halo_rows * 1536 * 3 * 2  # 2 B/element

    plan = build_resize_plan(
        1536, 1024, 768, 512, 3, np.float32, np.float32
    )
    p2 = model_scaling(plan, 100e-6, n_devs=(2,))[0]
    assert p2.halo_bytes == p2.halo_rows * 1536 * 3 * 4  # 4 B/element


def test_suggest_grid_column_first():
    """suggest_grid prefers column sharding (the round-5 measured
    winner) and falls back to rows when the lane halo stops fitting
    the strip (tall-narrow images)."""
    from avir_tpu.parallel.sharded import (
        shard_lane_blocked,
        suggest_grid,
    )

    p8k = build_resize_plan(7680, 4320, 1920, 1080, 3,
                            np.uint8, np.uint8)
    assert suggest_grid(p8k, 4) == (1, 4)
    assert suggest_grid(p8k, 8) == (1, 8)

    tall = build_resize_plan(64, 8192, 32, 4096, 3,
                             np.uint8, np.uint8)
    r, s = suggest_grid(tall, 8)
    assert r > 1  # pure columns not viable on a 64-px-wide image
    if s > 1:
        slb = shard_lane_blocked(tall.h.op, s, 64, 3, in_bytes=1)
        assert not slb.use_all_gather
