"""Analytic pod-scaling model for the sharded executors.

Only one real chip is reachable from this rig, so pod-scale efficiency
cannot be measured directly; this module predicts it from quantities
that CAN be measured or derived here (BASELINE north star: ">= 0.8
scaling efficiency at N >= 2 hosts"):

  - the plan's exact halo traffic (``shard_v_blocked``: halo_lo/halo_hi
    rows x row bytes, exchanged with each neighbor by one ``ppermute``
    per direction — disjoint ICI links, so the two directions overlap);
  - the measured single-chip kernel time for the config (bench.py /
    tools/probe_*.py, or any caller-supplied number);
  - the interior/border block split (``b_int0``/``b_int1``): interior
    compute is issued before the collectives' results are consumed
    (parallel/sharded.py:_pallas_strip_fn), so halo time is EXPOSED
    only beyond the interior blocks' compute;
  - link constants of the target fabric (defaults: TPU v5e ICI,
    DCN for the cross-host dp axis).

Model per mesh size n (row-strip axis sp):

  t_comp(n)  = t_chip * (blocks_n / blocks_1) / n + t_dispatch * calls
  t_halo(n)  = lat_ici + max(halo_lo, halo_hi) * row_bytes / bw_ici
  t_exposed  = max(0, t_halo - t_interior)         # overlap credit
  t_step(n)  = t_comp(n) + t_exposed
  eff(n)     = t_chip / (n * t_step(n))

The dp (batch) axis adds NO steady-state communication — each host
resizes its own batch elements; DCN is touched only by dispatch/result
transport outside the step — so cross-host efficiency at fixed
per-host work is the sp efficiency computed here (the reference's
thread pool has the same property across threads, avir.h:3556-3623).

The same model with CPU-host constants is validated against the
measured 8-device CPU mesh in tools/scaling_bench.py; see
docs/scaling.md for the published table.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# --- fabric constants (documented assumptions, overridable) -----------
# TPU v5e ICI: 2-D torus, one link per direction per axis; ~45 GB/s
# each way per link with ~1 us software-visible latency.  The sp axis
# is laid out along one torus dimension so halo ppermutes ride single
# ICI hops.  DCN (cross-host): ~25 GB/s/host, ~10 us — used only by
# the dp axis, which exchanges nothing during a step.
V5E_ICI_BW = 45e9
V5E_ICI_LAT = 1e-6
DCN_BW = 25e9
DCN_LAT = 10e-6
# Per-kernel-call dispatch/tail overhead (Pallas grid ramp-up/down);
# the strip body issues up to 3 fused-kernel calls (border lo /
# interior / border hi).
T_DISPATCH = 5e-6


@dataclasses.dataclass
class ScalePoint:
    n_dev: int
    strip_rows: int
    halo_rows: int          # max one-direction halo rows
    halo_bytes: int         # bytes ppermuted per device per direction
    t_comp_us: float
    t_halo_us: float
    t_interior_us: float
    t_exposed_us: float
    t_step_us: float
    efficiency: float
    all_gather: bool


def model_scaling(
    plan,
    t_chip_s: float,
    n_devs=(2, 4, 8, 16, 32),
    *,
    bw=V5E_ICI_BW,
    lat=V5E_ICI_LAT,
    t_dispatch=T_DISPATCH,
    in_itemsize: int | None = None,
    cores: int | None = None,
) -> list[ScalePoint]:
    """Predict row-strip scaling efficiency for ``plan`` from the
    measured single-chip step time ``t_chip_s``.

    ``plan`` needs only ``.v.op`` / ``.src_h`` / ``.src_w`` /
    ``.el_count`` and an input dtype (AVIR ResizePlan and LancirPlan
    both qualify via the thin adapters below).

    ``cores`` caps the compute parallelism (virtual-device CPU meshes
    timeshare physical cores: n devices on c cores speed compute up by
    min(n, c), while halo traffic still scales with n — the regime
    tools/scaling_bench.py validates the model in).

    Scope note (round 5): the interior-overlap credit (``t_int``)
    models the XLA route's ``_overlapped_v`` structure.  The fused
    Pallas strip route now defaults to ONE blocking kernel per device
    (``halo_overlap=False`` — the split measured ~1.4-2x slower than
    the halo it hides), so for fused-route predictions the credit
    should be treated as zero; the published v5e tables use measured
    per-device times instead (tools/scaling_2d_report.py)."""
    from .sharded import shard_v_blocked

    v_op = plan.v.op if hasattr(plan, "v") and hasattr(plan.v, "op") \
        else plan.v
    h = plan.src_h
    c = plan.el_count
    if in_itemsize is None:
        # LancirPlan carries in_itemsize directly; ResizePlan derives
        # it from the float/type-max fields (must match the bytes the
        # production strip route ships per row).
        in_itemsize = getattr(plan, "in_itemsize", None)
        if in_itemsize is None:
            in_itemsize = 4 if getattr(plan, "is_in_float", False) else (
                1 if getattr(plan, "in_type_max", 255.0) == 255.0 else 2
            )
    row_bytes = plan.src_w * c * in_itemsize

    out = []
    for n in n_devs:
        padded_h = h + ((-h) % n)
        # Same byte-aware tile the production strip route uses.
        sv = shard_v_blocked(v_op, n, padded_h, in_bytes=in_itemsize)
        blocks_n = sv.taps.shape[1]
        blocks_1 = -(-v_op.n_out // sv.tile)  # single-chip block count
        # Per-device compute: the measured chip time scaled by the
        # share of output-row blocks each device runs (block count,
        # not raw rows — padding blocks cost full tiles), plus
        # dispatch overhead for the up-to-3 strip kernel calls.
        work_ratio = blocks_n * n / max(blocks_1, 1)
        calls = 1 if sv.b_int1 <= sv.b_int0 else (
            1 + (1 if sv.b_int0 > 0 else 0)
            + (1 if sv.b_int1 < blocks_n else 0)
        )
        par = n if cores is None else min(n, cores)
        t_comp = t_chip_s * work_ratio / par + t_dispatch * calls
        if sv.use_all_gather:
            # Fallback: the whole (H-passed) image all-gathers; no
            # overlap.  bytes ~ (n-1)/n of the f32 intermediate.
            ag_bytes = int(
                (n - 1) / n * v_op.n_in
                * getattr(plan, "new_w", plan.src_w) * c * 4
            )
            t_halo = lat * int(np.ceil(np.log2(n))) + ag_bytes / bw
            t_int = 0.0
        else:
            halo = max(sv.halo_lo, sv.halo_hi)
            t_halo = lat + halo * row_bytes / bw
            n_int = max(sv.b_int1 - sv.b_int0, 0)
            # 2/4-byte strips run the blocking single-kernel body (the
            # V split's border outputs blow Mosaic's scoped VMEM —
            # parallel/sharded.py), so no overlap credit there.
            if in_itemsize >= 2:
                n_int = 0
            t_int = (
                t_chip_s * (n_int * n / max(blocks_1, 1)) / par
            )
        t_exposed = max(0.0, t_halo - t_int)
        t_step = t_comp + t_exposed
        out.append(
            ScalePoint(
                n_dev=n,
                strip_rows=sv.strip,
                halo_rows=0 if sv.use_all_gather
                else max(sv.halo_lo, sv.halo_hi),
                halo_bytes=0 if sv.use_all_gather
                else max(sv.halo_lo, sv.halo_hi) * row_bytes,
                t_comp_us=t_comp * 1e6,
                t_halo_us=t_halo * 1e6,
                t_interior_us=t_int * 1e6,
                t_exposed_us=t_exposed * 1e6,
                t_step_us=t_step * 1e6,
                efficiency=t_chip_s / (n * t_step),
                all_gather=sv.use_all_gather,
            )
        )
    return out


def format_table(points: list[ScalePoint]) -> str:
    lines = [
        "  n  strip  halo(rows/KB)  comp(us)  halo(us)  exposed  "
        "step(us)   eff",
    ]
    for p in points:
        lines.append(
            f"{p.n_dev:3d}  {p.strip_rows:5d}  "
            f"{p.halo_rows:4d}/{p.halo_bytes / 1024:7.1f}  "
            f"{p.t_comp_us:8.1f}  {p.t_halo_us:8.2f}  "
            f"{p.t_exposed_us:7.2f}  {p.t_step_us:8.1f}  "
            f"{p.efficiency:5.2f}"
            + ("  [all-gather]" if p.all_gather else "")
        )
    return "\n".join(lines)


@dataclasses.dataclass
class ScalePointErrdiff:
    n_dev: int
    t_resize_us: float      # sharded resize step (from model_scaling)
    t_gather_us: float      # all_gather of the pre-dither output
    t_wavefront_us: float   # full-image wavefront, replicated
    t_step_us: float
    efficiency: float


def model_scaling_errdiff(
    plan,
    t_chip_s: float,
    t_wavefront_s: float,
    n_devs=(2, 4, 8, 16),
    *,
    bw=V5E_ICI_BW,
    lat=V5E_ICI_LAT,
    t_dispatch=T_DISPATCH,
    in_itemsize: int | None = None,
) -> list[ScalePointErrdiff]:
    """Model the sharded ``dither="errdiff"`` step (VERDICT r4 item 4).

    The mesh path (parallel/sharded.py, errdiff epilogue) computes the
    pre-dither float strips sharded, all_gathers the SMALL post-resize
    image over the mesh, runs the full-image wavefront REPLICATED on
    every device (the recurrence is serial across the whole image — the
    reference serializes it onto one thread too, avir.h:5047-5068), and
    re-shards the rows.  Step time is therefore floor-bounded by the
    full-image wavefront:

      t_step(n) = t_resize_step(n) + t_allgather(n) + t_wavefront

    with efficiency measured against the single-chip errdiff step
    (t_chip + t_wavefront).  ``t_wavefront_s`` is the measured
    full-image wavefront time for the OUTPUT size
    (tools/probe_errdiff.py / docs/perf_analysis.md).
    """
    base = model_scaling(
        plan, t_chip_s, n_devs, bw=bw, lat=lat,
        t_dispatch=t_dispatch, in_itemsize=in_itemsize,
    )
    new_w = getattr(plan, "new_w", plan.src_w)
    new_h = getattr(plan, "new_h", None)
    if new_h is None:
        new_h = plan.v.op.n_out if hasattr(plan.v, "op") \
            else plan.v.n_out
    out_bytes = new_h * new_w * plan.el_count * 4  # f32 pre-dither
    t_single = t_chip_s + t_wavefront_s
    out = []
    for p in base:
        n = p.n_dev
        t_ag = lat * max(1, int(np.ceil(np.log2(n)))) \
            + (n - 1) / n * out_bytes / bw
        t_step = p.t_step_us * 1e-6 + t_ag + t_wavefront_s
        out.append(
            ScalePointErrdiff(
                n_dev=n,
                t_resize_us=p.t_step_us,
                t_gather_us=t_ag * 1e6,
                t_wavefront_us=t_wavefront_s * 1e6,
                t_step_us=t_step * 1e6,
                efficiency=t_single / (n * t_step),
            )
        )
    return out


def format_table_errdiff(points: list[ScalePointErrdiff]) -> str:
    lines = [
        "  n  resize(us)  gather(us)  wavefront(us)  step(us)   eff",
    ]
    for p in points:
        lines.append(
            f"{p.n_dev:3d}  {p.t_resize_us:10.1f}  "
            f"{p.t_gather_us:10.2f}  {p.t_wavefront_us:13.1f}  "
            f"{p.t_step_us:8.1f}  {p.efficiency:5.2f}"
        )
    return "\n".join(lines)


def model_scaling_2d(
    plan,
    t_chip_s: float,
    grids=((1, 2), (2, 2), (2, 4), (4, 2), (4, 4), (2, 8), (4, 8)),
    *,
    bw=V5E_ICI_BW,
    lat=V5E_ICI_LAT,
    t_dispatch=T_DISPATCH,
    in_itemsize: int | None = None,
    tile: int = 64,
) -> list["ScalePoint2D"]:
    """Predict 2-D (rows x cols) intra-image scaling efficiency of
    the PORTABLE XLA engine of ``make_sharded_avir_executor_2d`` from
    the measured single-chip time.

    The production fused-Pallas 2-D route is no longer modeled this
    way: its per-chip term is MEASURED on the real chip by
    tools/probe_strip2d_tpu.py (mesh emulation) and combined with the
    raw-byte halo fabric model by tools/scaling_2d_report.py — see
    docs/scaling.md for the published tables.  This function remains
    the prediction for CPU meshes and engine="xla" (f32
    transposed-tile column halos, per-pass exchanges).

    Differences from the 1-D model:

      - per-device compute is apportioned between the two passes by
        exact MAC counts (the H pass contracts the local row extent,
        the V pass the already-H-resized column extent), with each
        axis's block-padding overhead applied to its own pass;
      - TWO halo exchanges: column halos on the raw tile (cheap
        integer bytes scaled by the 1/r row extent) and row halos on
        the f32 intermediate (scaled by the 1/s column extent) —
        sharding one axis SHRINKS the other axis's halo bytes;
      - each exchange's overlap credit comes from its own pass's
        interior blocks.

    The structural win over 1-D rows: at equal device count, strips
    stay fat in BOTH dimensions, so interior extinction (the 1-D knee
    at strip ~ V-window rows) is deferred to much larger n.
    """
    from .sharded import shard_v_op

    v_op = plan.v.op if hasattr(plan, "v") and hasattr(plan.v, "op") \
        else plan.v
    h_op = plan.h.op if hasattr(plan, "h") and hasattr(plan.h, "op") \
        else plan.h
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    if in_itemsize is None:
        in_itemsize = getattr(plan, "in_itemsize", None)
        if in_itemsize is None:
            in_itemsize = 4 if getattr(plan, "is_in_float", False) else (
                1 if getattr(plan, "in_type_max", 255.0) == 255.0 else 2
            )

    # Single-chip MAC totals at the same tile (V first on full width,
    # H on the resized height) apportion t_chip between the passes.
    bl_v1 = -(-v_op.n_out // tile)
    bl_h1 = -(-h_op.n_out // tile)
    sv1 = shard_v_op(v_op, 1, h + ((-h) % 1), tile=tile)
    sh1 = shard_v_op(h_op, 1, w + ((-w) % 1), tile=tile)
    M_v1 = bl_v1 * tile * sv1.win * (w * c)
    M_h1 = bl_h1 * tile * sh1.win * (v_op.n_out * c)
    M1 = M_v1 + M_h1

    out = []
    for r, s in grids:
        n = r * s
        svv = shard_v_op(v_op, r, h + ((-h) % r), tile=tile)
        svh = shard_v_op(h_op, s, w + ((-w) % s), tile=tile)
        hs = (h + ((-h) % r)) // r          # local raw rows
        bl_v = svv.taps.shape[1]
        bl_h = svh.taps.shape[1]
        # Per-device MACs: H pass on [hs, ws] raw tile; V pass on the
        # H-resized [hs, m_w] tile.
        M_h_dev = bl_h * tile * svh.win * (hs * c)
        M_v_dev = bl_v * tile * svv.win * (svh.m * c)
        t_comp = (
            t_chip_s * (M_h_dev + M_v_dev) / M1 + t_dispatch * 2
        )
        # Column halos (raw integer bytes, 1/r of the rows).
        if svh.use_all_gather:
            ag = (s - 1) / s * w * hs * c * in_itemsize
            t_halo_c = lat * max(1, int(np.ceil(np.log2(max(s, 2))))) \
                + ag / bw
            t_int_h = 0.0
        else:
            halo_c = max(svh.halo_lo, svh.halo_hi)
            # The executor exchanges column halos on the f32
            # TRANSPOSED tile (gamma applied locally first) so the H
            # pass can run through the same interior/border overlap as
            # the V pass — 4 bytes/element regardless of input dtype,
            # but with the interior-H compute credit (earned:
            # _overlapped_v on cols_axis, parallel/sharded.py).
            t_halo_c = lat + halo_c * hs * c * 4 / bw
            n_int_h = max(svh.b_int1 - svh.b_int0, 0)
            t_int_h = t_chip_s * (
                n_int_h * tile * svh.win * hs * c
            ) / M1
        t_exp_c = max(0.0, t_halo_c - t_int_h) if s > 1 else 0.0
        # Row halos (f32 intermediate, 1/s of the columns).
        if svv.use_all_gather:
            ag = (r - 1) / r * v_op.n_in * svh.m * c * 4
            t_halo_r = lat * max(1, int(np.ceil(np.log2(max(r, 2))))) \
                + ag / bw
            t_int_v = 0.0
        else:
            halo_r = max(svv.halo_lo, svv.halo_hi)
            t_halo_r = lat + halo_r * svh.m * c * 4 / bw
            n_int_v = max(svv.b_int1 - svv.b_int0, 0)
            t_int_v = t_chip_s * (
                n_int_v * tile * svv.win * svh.m * c
            ) / M1
        t_exp_r = max(0.0, t_halo_r - t_int_v) if r > 1 else 0.0
        t_step = t_comp + t_exp_c + t_exp_r
        out.append(
            ScalePoint2D(
                r=r, s=s, n_dev=n,
                tile_rows=hs, tile_cols=(w + ((-w) % s)) // s,
                t_comp_us=t_comp * 1e6,
                t_exposed_col_us=t_exp_c * 1e6,
                t_exposed_row_us=t_exp_r * 1e6,
                t_step_us=t_step * 1e6,
                efficiency=t_chip_s / (n * t_step),
                all_gather=svv.use_all_gather or svh.use_all_gather,
            )
        )
    return out


@dataclasses.dataclass
class ScalePoint2D:
    r: int
    s: int
    n_dev: int
    tile_rows: int
    tile_cols: int
    t_comp_us: float
    t_exposed_col_us: float
    t_exposed_row_us: float
    t_step_us: float
    efficiency: float
    all_gather: bool


def format_table_2d(points: list[ScalePoint2D]) -> str:
    lines = [
        "  r x s    n   tile(rxc)    comp(us)  exp.col  exp.row  "
        "step(us)   eff",
    ]
    for p in points:
        lines.append(
            f"{p.r:3d}x{p.s:<3d} {p.n_dev:4d}  "
            f"{p.tile_rows:5d}x{p.tile_cols:<5d}  "
            f"{p.t_comp_us:9.1f}  {p.t_exposed_col_us:7.2f}  "
            f"{p.t_exposed_row_us:7.2f}  {p.t_step_us:8.1f}  "
            f"{p.efficiency:5.2f}"
            + ("  [all-gather]" if p.all_gather else "")
        )
    return "\n".join(lines)
