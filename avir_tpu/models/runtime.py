"""Single-device jitted execution of resize plans.

Builds one ``jax.jit``-compiled function per plan: pack (dtype + gamma) →
horizontal blocked-banded matmul → vertical blocked-banded matmul →
gamma-out → dither → unpack.  All geometry is static; XLA fuses the
elementwise stages into the matmuls' prologue/epilogue, which is the TPU
equivalent of the reference's fused packScanline/doResize/unpackScanline
scanline walks (/root/reference/avir.h:6522-6619).

Precision tiers (see ops/banded.py for the split-bf16 scheme):
  - "auto" (default): error-free bf16 splitting — 2 MXU passes when the
    pass input is exact in bf16 (8-bit integers, no gamma), 3 otherwise.
    Matches the reference's default float32 arithmetic
    (/root/reference/avir.h:4603) at integer-output tolerances.  For
    u8-in / 8-bit-out / no-gamma plans on the fused Pallas route, auto
    upgrades further to the MXU's int8 fixed-point mode (ops/intq.py):
    2x the bf16 matmul rate at >= 64 dB vs the float64 oracle (<= 1 LSB).
  - "exact": full float32 accumulation (Precision.HIGHEST, 6 passes).
  - "fast": single-bf16 everywhere (2 passes, ~50 dB vs exact) for
    throughput-over-fidelity uses.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.banded import BlockedBandedOp, apply_blocked, block_banded
from ..ops.dither import (
    default_dither_jnp,
    errdiff_dither_jnp,
    errdiff_dither_wavefront_jnp,
)
from ..ops.gamma import linear_to_srgb_2d, srgb_to_linear_2d
from ..plan.lancir_plan import LancirPlan
from ..plan.plan import ResizePlan


def _narrow_lop(h_op, lop, c: int, in_bytes: int = 1):
    """Rebuild the lane-blocked H operator at the narrow tile when the
    route ends up UNFUSED: apply_lanes_pallas streams the dense
    [win_l, tile*c] bf16 tap blocks, which at the wide upsize tile
    (ops/lanes.py:pick_lane_tile) exceed the 16 MB scoped VMEM."""
    from ..ops.lanes import lane_block_banded, pick_lane_tile

    base = pick_lane_tile(h_op, c, wide=False)
    if lop.tile == base:
        return lop
    return lane_block_banded(h_op, c, tile=base, in_bytes=in_bytes)


def _pad_for_fused(a: jax.Array, vop, lop) -> jax.Array:
    """Pre-pad once so split fused calls don't each re-pad."""
    r, l = a.shape
    if vop.n_in_pad > r or lop.lanes_pad > l:
        a = jnp.pad(
            a,
            (
                (0, max(vop.n_in_pad - r, 0)),
                (0, max(lop.lanes_pad - l, 0)),
            ),
        )
    return a


def _split_lane_ops(h_op, lop, c: int, in_bytes: int = 1):
    """(lop_interior, lop_boundary) when splitting the lane blocks into
    interior and boundary kernel calls tightens the interior chunk
    window by >= 128 lanes, else (None, None).

    The chunked H taps' per-chunk slice offsets must be block-invariant
    within one kernel call, so the edge blocks' clamped tap phases
    inflate win_c for everyone (1024 vs 768 at the 8K headline).  Two
    calls over disjoint block subsets — assembled in one output buffer
    via out_init aliasing, no extra copies — let the interior run at
    its own tight window (~25% fewer interior H MACs)."""
    if lop.ctaps_hi is None or lop.n_blocks < 4:
        return None, None
    from ..ops.lanes import lane_block_banded

    interior = list(range(1, lop.n_blocks - 1))
    cand = lane_block_banded(
        h_op, c, tile=lop.tile, block_list=interior, in_bytes=in_bytes
    )
    if cand.chunk_rel is None or cand.win_c > lop.win_c - 128:
        return None, None
    bnd = lane_block_banded(
        h_op, c, tile=lop.tile, block_list=[0, lop.n_blocks - 1],
        in_bytes=in_bytes,
    )
    return cand, bnd


def _concat_split_ok(
    n_vblocks: int,
    v_tile: int,
    lop,
    lop_int,
    mode_h: str,
    gamma: bool,
    out_itemsize: int,
) -> bool:
    """Decide the vmap-safe lane split: two compact kernel calls plus a
    lane CONCAT (one extra HBM round trip of the output) instead of the
    aliased out_init assembly, which cannot carry a batch dimension
    through Mosaic.  Engage only when the modeled interior H-MAC saving
    beats the concat's copy cost (measured v5e orders of magnitude:
    ~100 TMAC/s int8 / ~50 TMAC/s bf16 effective at these shapes,
    ~0.6 TB/s streamed HBM)."""
    if lop_int is None or lop.ctaps_hi is None:
        return False
    n_int = lop.n_blocks - 2
    n_ch = lop.ctaps_hi.shape[1]
    saving_macs = (
        n_vblocks * v_tile * n_int * n_ch
        * (lop.win_c - lop_int.win_c) * 128
    )
    if mode_h == "int8":
        n_prod, mxu_rate = (3 if gamma else 2), 100e12
    else:
        n_prod, mxu_rate = (3 if mode_h == "split3" else 2), 50e12
    save_s = n_prod * saving_macs / mxu_rate
    out_bytes = (
        n_vblocks * v_tile * lop.n_blocks * lop.tile * lop.c
        * out_itemsize
    )
    copy_s = 2 * out_bytes / 600e9
    # ~5 us margin for the second kernel call's dispatch/ramp —
    # calibrated on v5e (tools/probe_batch_split.py): 2x 8K->1080p
    # measured +6.3% with the split (model net +7 us), 4x 4K->720p a
    # wash (model net +2.3 us); the margin keeps the former and drops
    # the latter.
    return save_s > copy_s + 5e-6


def fused_split_call(
    vop, lop, lop_int, lop_bnd, xin, mv, mh, *,
    concat: bool = False,
    x_lo=None,
    interpret: bool = False,
    **kw,
):
    """One fused-kernel invocation with the interior/boundary lane
    split applied — the single shared assembly for the single-chip
    AVIR/LANCIR executors and the sharded strip bodies.

    ``lop_int is None``: plain single call.  Split with
    ``concat=False``: boundary blocks first, interior scattered into
    the same buffer via out_init aliasing (zero extra copies; cannot
    carry a batch dim).  ``concat=True``: two COMPACT calls + one lane
    concat — the vmap-safe form (see _concat_split_ok).  Callers
    pre-pad ``xin`` (and ``x_lo``) when splitting so the two calls
    don't each re-pad."""
    from ..ops.pallas.fused_kernel import apply_fused_pallas

    if lop_int is None:
        return apply_fused_pallas(
            vop, lop, xin, mv, mh, x_lo=x_lo, interpret=interpret, **kw
        )
    if concat:
        tc = lop.tile * lop.c
        ob = apply_fused_pallas(
            vop, lop_bnd, xin, mv, mh, x_lo=x_lo,
            compact_out=True, interpret=interpret, **kw,
        )
        oi = apply_fused_pallas(
            vop, lop_int, xin, mv, mh, x_lo=x_lo,
            compact_out=True, interpret=interpret, **kw,
        )
        return jnp.concatenate([ob[:, :tc], oi, ob[:, tc:]], axis=1)
    ob = apply_fused_pallas(
        vop, lop_bnd, xin, mv, mh, x_lo=x_lo,
        out_blocks=lop.n_blocks, interpret=interpret, **kw,
    )
    return apply_fused_pallas(
        vop, lop_int, xin, mv, mh, x_lo=x_lo,
        out_blocks=lop.n_blocks, out_init=ob, interpret=interpret, **kw,
    )


def _use_pallas(engine: str) -> bool:
    """Pallas kernels need a real TPU backend (Mosaic); XLA otherwise."""
    if engine == "xla":
        return False
    if engine == "pallas":
        return True
    return jax.default_backend() not in ("cpu", "gpu")


def _apply(bop: BlockedBandedOp, x, mode: str, pallas: bool):
    if pallas and mode in ("split2", "split3"):
        from ..ops.pallas.banded_kernel import apply_blocked_pallas

        return apply_blocked_pallas(bop, x, mode)
    return apply_blocked(bop, x, mode)


def _separable_pass_lanes(
    x: jax.Array,
    vop: BlockedBandedOp,
    lop,
    h: int,
    w: int,
    c: int,
    mode_first: str,
    mode_second: str,
) -> jax.Array:
    """Transpose-free pipeline (Pallas engine): the vertical pass
    contracts rows with the row-blocked kernel; the horizontal pass
    contracts the interleaved lane axis with the lane-blocked kernel,
    producing the final [new_h, new_w, C] layout directly.  Pass order
    minimizes modeled MXU work.

    ``x`` is [h, w*c] and may be an INTEGER array: the first kernel
    converts in VMEM, so the f32 source image is never materialized in
    HBM (pack fusion, cf. packScanline avir.h:2777-2971)."""
    from ..ops.pallas.banded_kernel import apply_blocked_pallas
    from ..ops.pallas.lanes_kernel import apply_lanes_pallas

    new_h, new_w = vop.n_out, lop.n_out
    flops_v = vop.n_blocks * vop.tile * vop.win
    flops_h = lop.n_blocks * lop.win_l * lop.tile * c
    cost_vh = flops_v * w * c + flops_h * new_h
    cost_hv = flops_h * h + flops_v * new_w * c
    if cost_vh <= cost_hv:
        # Keep the V output unsliced ([blocks*tile, w*c], zero tail
        # rows) — the lane kernel consumes any row count, and slicing
        # the big intermediate costs an HBM round trip.
        x = apply_blocked_pallas(vop, x, mode_first, full_rows=True)
        x = apply_lanes_pallas(lop, x, mode_second)
        x = x[:new_h]                                   # tiny slice
    else:
        x = apply_lanes_pallas(lop, x, mode_first)     # [h, new_w*c]
        x = apply_blocked_pallas(vop, x, mode_second)  # [new_h, new_w*c]
    return x


def _out_dtype(is_float: bool, type_max: float):
    if is_float:
        return jnp.float32
    return jnp.uint8 if type_max == 255.0 else jnp.uint16


def resolve_modes(
    precision: str, first_input_exact_bf16: bool
) -> tuple[str, str]:
    """(first_pass_mode, second_pass_mode) for a precision tier."""
    if precision == "exact":
        return "exact", "exact"
    if precision == "fast":
        return "split2", "split2"
    if precision == "auto":
        first = "split2" if first_input_exact_bf16 else "split3"
        return first, "split3"
    raise ValueError(f"unknown precision {precision!r}")


def _separable_pass(
    x: jax.Array,
    hop: BlockedBandedOp,
    vop: BlockedBandedOp,
    h: int,
    w: int,
    c: int,
    mode_first: str,
    mode_second: str,
    pallas: bool = False,
) -> jax.Array:
    """[H, W, C] float32 → [new_h, new_w, C]: two blocked matmuls over
    the leading axis with the other axes flattened into the 128-lane
    dimension.

    Pass order is chosen to transpose the SMALLER representation: the
    vertical pass runs directly on the [H, W*C] layout (no transpose),
    so running the axis that shrinks the image first minimizes the
    bytes moved by the one unavoidable transpose between passes.  The
    passes are linear operators on separate axes, so they commute
    exactly (the reference hard-codes H-then-V, avir.h:4861-5000)."""
    new_w, new_h = hop.n_out, vop.n_out
    v_first = new_h * w <= h * new_w
    if v_first:
        x = x.reshape(h, w * c)
        x = _apply(vop, x, mode_first, pallas)  # [new_h, W*C]
        x = x.reshape(new_h, w, c).transpose(1, 0, 2).reshape(
            w, new_h * c
        )
        x = _apply(hop, x, mode_second, pallas)  # [new_w, new_h*C]
        return x.reshape(new_w, new_h, c).transpose(1, 0, 2)
    x = x.transpose(1, 0, 2).reshape(w, h * c)
    x = _apply(hop, x, mode_first, pallas)  # [new_w, H*C]
    x = x.reshape(new_w, h, c).transpose(1, 0, 2).reshape(h, new_w * c)
    x = _apply(vop, x, mode_second, pallas)  # [new_h, new_w*C]
    return x.reshape(new_h, new_w, c)


def make_avir_executor(
    plan: ResizePlan,
    errdiff: bool = False,
    precision: str = "auto",
    tile: int | None = None,
    return_predither: bool = False,
    engine: str = "auto",
    split_lanes: bool = True,
    errdiff_impl: str = "scan",
) -> Callable[[jax.Array], jax.Array]:
    """Compile a ResizePlan into a jitted [H, W, C] -> [new_h, new_w, C]
    resize function.

    ``return_predither=True`` skips the device dither/unpack and returns
    the float32 image (after gamma-out) so a host-side ditherer — e.g.
    the native error-diffusion scan, which is serial by nature — can
    finish the job (cf. the reference's single-threaded dither stage,
    avir.h:5047-5068)."""
    in_bytes = 4 if plan.is_in_float else (
        1 if plan.in_type_max == 255.0 else 2
    )
    hop = block_banded(plan.h.op, tile=tile, in_bytes=in_bytes)
    vop = block_banded(plan.v.op, tile=tile, in_bytes=in_bytes)
    pallas = _use_pallas(engine)
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    lop = None
    if pallas:
        from ..ops.lanes import lane_block_banded

        lop = lane_block_banded(plan.h.op, c, in_bytes=in_bytes)
    out_dt = _out_dtype(plan.is_out_float, plan.out_type_max)

    in_exact_bf16 = (
        not plan.is_in_float
        and plan.in_type_max == 255.0
        and not plan.use_srgb_gamma
    )
    mode1, mode2 = resolve_modes(precision, in_exact_bf16)

    out_bits = 8 if plan.out_type_max == 255.0 else 16
    trunc_bits = 0 if plan.is_out_float else out_bits - plan.res_bit_depth

    # The MXU's int8 mode (ops/intq.py) halves matmul time at >= 65 dB
    # vs the f64 oracle — eligible whenever the pipeline is u8-in /
    # 8-bit-quantized-out.  With gamma the kernel linearizes on the
    # VPU and quantizes to 13-bit linear light (fused_kernel.py).
    # Error diffusion is excluded: the recursive quantizer feeds back
    # its residual (avir.h:4504-4524), amplifying the int8 path's
    # ~2^-14 tap noise into extra +-1 flips — the pre-dither image
    # must be full precision, like the reference's all-f32 pipeline.
    int8_ok = (
        precision == "auto"
        and not plan.is_in_float
        and plan.in_type_max == 255.0
        and not plan.is_out_float
        and plan.out_type_max == 255.0
        and not errdiff
        and not return_predither
        # Sub-8-bit outputs quantize in 2^trunc_bits-LSB steps, so a
        # near-boundary value flips a whole step on ~2^-14 noise; keep
        # the bf16 splits' headroom there (rare, perf-immaterial).
        and trunc_bits == 0
    )
    fused = False
    forder = "vh"
    if pallas and mode1 != "exact":
        from ..ops.pallas.fused_kernel import choose_fused

        if int8_ok:
            mode1 = mode2 = "int8"
        fused, forder = choose_fused(
            vop, lop, mode1, mode2, plan.use_srgb_gamma, c,
            in_bytes=in_bytes,
        )
        if not fused and mode1 == "int8":
            mode1, mode2 = resolve_modes(precision, in_exact_bf16)
        if not fused:
            lop = _narrow_lop(plan.h.op, lop, c, in_bytes=in_bytes)
    mv, mh = (mode1, mode2) if forder == "vh" else (mode2, mode1)

    # Gamma-route selection for the int8 fused path.  Three
    # implementations of the sRGB pack stage exist (all bit-identical):
    #   - "inkernel": linearization polynomial inside the fused kernel,
    #     recomputed over the window overlap;
    #   - "prologue": linearize-once kernel writing s8 limb planes
    #     (2 B/px) consumed as direct MXU operands
    #     (ops/pallas/gamma_prologue.py);
    #   - "ring": shift-ring fused kernel — only the new delta rows are
    #     fetched and linearized per cell (ops/pallas/fused_ring_kernel
    #     .py; uniform-stride downsizes only).
    # Measured on v5e (tools/probe_gpre.py / probe_ring_ablate.py,
    # docs/perf_analysis.md; inkernel re-measured with round 2's
    # interior/boundary lane split):
    #            inkernel  prologue   ring
    #   VGA->XGA    0.063     0.084      -    ms
    #   1080p->4K   0.761     0.793      -
    #   4K->720p    0.373     0.648   0.653
    #   8K->1080p   1.180     2.019   2.324
    # "inkernel" wins everywhere: the separated routes pay the sRGB
    # polynomial at ~3x lower VPU throughput when its output must be
    # stored (prologue: HBM limb planes; ring: VMEM scratch) instead of
    # feeding the MXU from registers, which costs more than the window
    # overlap they eliminate.  auto therefore always takes "inkernel";
    # AVIR_TPU_GAMMA_ROUTE overrides for re-probing.
    gamma_pre = False
    use_ring = False
    vop_ring = None
    if fused and mode1 == "int8" and plan.use_srgb_gamma:
        import os

        from ..ops.pallas.fused_kernel import fused_viable
        from ..ops.pallas.fused_ring_kernel import ring_viable

        route = os.environ.get("AVIR_TPU_GAMMA_ROUTE", "auto")
        # The ring kernel needs constant window strides; the uniform
        # blocking mode trades the boundary blocks' clamped offsets for
        # top/bottom zero padding (one extra HBM copy of the source).
        try:
            vop_ring = block_banded(plan.v.op, tile=tile, uniform=True)
        except ValueError:
            vop_ring = None
        ring_ok = (
            vop_ring is not None
            and vop_ring.taps_q1 is not None
            and ring_viable(vop_ring, lop, True, forder)
        )
        pre_ok = fused_viable(vop, lop, forder, in_bytes=2)
        if route == "ring":
            use_ring = ring_ok
            if not ring_ok:
                import warnings

                warnings.warn(
                    "AVIR_TPU_GAMMA_ROUTE=ring not viable for this "
                    "config (needs a uniform-stride int8 downsize); "
                    "falling back to the in-kernel route"
                )
        elif route == "prologue":
            gamma_pre = pre_ok
            if not pre_ok:
                import warnings

                warnings.warn(
                    "AVIR_TPU_GAMMA_ROUTE=prologue not viable for this "
                    "config (VMEM budget); falling back to the "
                    "in-kernel route"
                )
        elif route != "inkernel":
            # auto == inkernel: the measured winner at every size (see
            # the route table above); re-probe with tools/probe_gpre.py
            # before changing this.
            pass

    # split_lanes=False marks executors that will be vmapped (batch /
    # traceable paths): the split's aliased out_init input cannot carry
    # a batch dimension through the Mosaic lowering (ANY-space blocks
    # need trivial index maps).  Those paths instead use the vmap-safe
    # COMPACT+CONCAT assembly when the modeled H-MAC saving beats the
    # concat's output copy (_concat_split_ok).
    lop_int = lop_bnd = None
    split_concat = False
    if fused and not use_ring:
        lop_int, lop_bnd = _split_lane_ops(
            plan.h.op, lop, c, in_bytes=in_bytes
        )
        if not split_lanes and lop_int is not None:
            split_concat = _concat_split_ok(
                vop.n_blocks, vop.tile, lop, lop_int,
                mh, plan.use_srgb_gamma,
                1 if plan.out_type_max == 255.0 else (
                    4 if plan.is_out_float else 2
                ),
            )
            if not split_concat:
                lop_int = lop_bnd = None

    @jax.jit
    def run(src: jax.Array) -> jax.Array:
        # src is [h, w*c] (2-D interleaved) — keeps host<->device
        # transfers and device layouts free of C-minor tile padding.
        if fused:
            # The fused kernel takes the RAW image and applies gamma,
            # both passes, gamma-out and quantization internally.
            fuse_quant = (
                not plan.is_out_float
                and not errdiff
                and not return_predither
            )
            if use_ring:
                from ..ops.pallas.fused_ring_kernel import (
                    apply_fused_ring_pallas,
                )

                # use_ring implies int8_ok, which excludes errdiff /
                # predither / float output — quantization always fuses.
                out2 = apply_fused_ring_pallas(
                    vop_ring, lop, src,
                    out_dtype=out_dt,
                    out_max=plan.out_type_max,
                    trunc_bits=trunc_bits,
                    alpha_index=plan.alpha_index,
                    in_gamma_mult=plan.in_gamma_mult,
                    out_gamma_mult=plan.out_gamma_mult,
                )
                return out2[: vop.n_out, : hop.n_out * c]
            xin, xlo = src, None
            if gamma_pre:
                from ..ops.pallas.gamma_prologue import (
                    apply_gamma_prologue,
                )

                xin, xlo = apply_gamma_prologue(
                    src, vop.n_in_pad, lop.lanes_pad, c,
                    plan.alpha_index, plan.in_gamma_mult,
                )
            kw = dict(
                out_dtype=(out_dt if fuse_quant else jnp.float32),
                out_max=plan.out_type_max,
                trunc_bits=trunc_bits if fuse_quant else 0,
                gamma=plan.use_srgb_gamma,
                alpha_index=plan.alpha_index,
                in_gamma_mult=plan.in_gamma_mult,
                out_gamma_mult=plan.out_gamma_mult,
                order=forder,
            )
            if lop_int is not None:
                xin = _pad_for_fused(xin, vop, lop)
                if xlo is not None:
                    xlo = _pad_for_fused(xlo, vop, lop)
            out2 = fused_split_call(
                vop, lop, lop_int, lop_bnd, xin, mv, mh,
                concat=split_concat, x_lo=xlo, **kw,
            )
            x = out2[: vop.n_out, : hop.n_out * c]
            if fuse_quant or plan.is_out_float or return_predither:
                return x
            # errdiff-device on the (already gamma-corrected) float
            ed = (
                errdiff_dither_wavefront_jnp
                if errdiff_impl == "wavefront"
                else errdiff_dither_jnp
            )
            x3 = ed(
                x.reshape(vop.n_out, hop.n_out, c),
                trunc_bits,
                plan.out_type_max,
            )
            return x3.reshape(vop.n_out, hop.n_out * c).astype(out_dt)
        if plan.use_srgb_gamma:
            x = srgb_to_linear_2d(
                src.astype(jnp.float32) * jnp.float32(plan.in_gamma_mult),
                c,
                plan.alpha_index,
            )
        else:
            x = src  # raw dtype; pallas kernels convert in VMEM
        if pallas and mode1 != "exact":
            x = _separable_pass_lanes(x, vop, lop, h, w, c, mode1, mode2)
        else:
            if not plan.use_srgb_gamma:
                x = x.astype(jnp.float32)
            x = _separable_pass(
                x.reshape(h, w, c), hop, vop, h, w, c, mode1, mode2,
                pallas,
            )
        x = x.reshape(vop.n_out, hop.n_out * c)
        if plan.use_srgb_gamma:
            x = linear_to_srgb_2d(x, c, plan.alpha_index)
            if plan.out_gamma_mult != 0.0:
                x = x * jnp.float32(plan.out_gamma_mult)
        if plan.is_out_float or return_predither:
            return x
        if errdiff:
            ed = (
                errdiff_dither_wavefront_jnp
                if errdiff_impl == "wavefront"
                else errdiff_dither_jnp
            )
            x3 = ed(
                x.reshape(vop.n_out, hop.n_out, c),
                trunc_bits,
                plan.out_type_max,
            )
            return x3.reshape(vop.n_out, hop.n_out * c).astype(out_dt)
        x = default_dither_jnp(x, trunc_bits, plan.out_type_max)
        return x.astype(out_dt)

    # Observability: which interior/boundary lane-split assembly the
    # executor uses (None / "alias" / "concat") — tested, and useful
    # when debugging batch-path performance.
    run.lane_split = (
        "concat" if split_concat else (
            "alias" if lop_int is not None else None
        )
    )
    run.errdiff_impl = errdiff_impl if errdiff else None
    return run


def make_lancir_executor(
    plan: LancirPlan,
    precision: str = "auto",
    tile: int | None = None,
    engine: str = "auto",
    split_lanes: bool = True,
) -> Callable[[jax.Array], jax.Array]:
    """Compile a LancirPlan into a jitted resize function.

    Output rounding is round-half-even, matching the reference's SIMD
    nearest-even conversions (/root/reference/lancir.h:1870-2002).
    """
    in_bytes = plan.in_itemsize
    hop = block_banded(plan.h, tile=tile, in_bytes=in_bytes)
    vop = block_banded(plan.v, tile=tile, in_bytes=in_bytes)
    pallas = _use_pallas(engine)
    h, w, c = plan.src_h, plan.src_w, plan.el_count
    lop = None
    if pallas:
        from ..ops.lanes import lane_block_banded

        lop = lane_block_banded(plan.h, c, in_bytes=in_bytes)
    out_dt = _out_dtype(plan.is_out_float, plan.clamp)

    in_exact_bf16 = plan.in_exact_bf16
    mode1, mode2 = resolve_modes(precision, in_exact_bf16)

    int8_ok = (
        precision == "auto"
        and in_exact_bf16
        and not plan.is_out_float
        and plan.clamp == 255.0
    )
    fused = False
    forder = "vh"
    if pallas and mode1 != "exact":
        from ..ops.pallas.fused_kernel import choose_fused

        if int8_ok:
            mode1 = mode2 = "int8"
        fused, forder = choose_fused(
            vop, lop, mode1, mode2, False, c, in_bytes=in_bytes
        )
        if not fused and mode1 == "int8":
            mode1, mode2 = resolve_modes(precision, in_exact_bf16)
        if not fused:
            lop = _narrow_lop(plan.h, lop, c, in_bytes=in_bytes)
    mv, mh = (mode1, mode2) if forder == "vh" else (mode2, mode1)
    lop_int = lop_bnd = None
    split_concat = False
    if fused:
        lop_int, lop_bnd = _split_lane_ops(
            plan.h, lop, c, in_bytes=in_bytes
        )
        # split_lanes=False marks vmapped callers (batch path): use the
        # vmap-safe compact+concat assembly when modeled profitable,
        # else no split (see make_avir_executor).
        if not split_lanes and lop_int is not None:
            split_concat = _concat_split_ok(
                vop.n_blocks, vop.tile, lop, lop_int, mh, False,
                4 if plan.is_out_float else (
                    1 if plan.clamp == 255.0 else 2
                ),
            )
            if not split_concat:
                lop_int = lop_bnd = None

    @jax.jit
    def run(src: jax.Array) -> jax.Array:
        # src is [h, w*c]; output is [new_h, new_w*c].
        if fused:
            kw = dict(
                out_dtype=(
                    out_dt if not plan.is_out_float else jnp.float32
                ),
                out_max=plan.clamp,
                scale=plan.out_mul,
                round_mode="even",
                order=forder,
            )
            xin = (
                _pad_for_fused(src, vop, lop)
                if lop_int is not None else src
            )
            out2 = fused_split_call(
                vop, lop, lop_int, lop_bnd, xin, mv, mh,
                concat=split_concat, **kw,
            )
            x = out2[: vop.n_out, : hop.n_out * c]
            if not plan.is_out_float:
                return x
            if plan.out_mul != 1.0:
                x = x * jnp.float32(plan.out_mul)
            return x
        if pallas and mode1 != "exact":
            x = _separable_pass_lanes(src, vop, lop, h, w, c, mode1, mode2)
        else:
            x = src.reshape(h, w, c).astype(jnp.float32)
            x = _separable_pass(
                x, hop, vop, h, w, c, mode1, mode2, pallas
            )
        x = x.reshape(vop.n_out, hop.n_out * c)
        if plan.out_mul != 1.0:
            x = x * jnp.float32(plan.out_mul)
        if plan.is_out_float:
            return x
        x = jnp.clip(jnp.round(x), 0.0, plan.clamp)
        return x.astype(out_dt)

    run.lane_split = (
        "concat" if split_concat else (
            "alias" if lop_int is not None else None
        )
    )
    return run
