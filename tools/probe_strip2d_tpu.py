"""Run the fused-Pallas 2-D (rows x cols) route on the real TPU chip.

Round-4 verdict item 1: the 2-D executor shipped the fused per-device
body validated only in interpret mode on CPU meshes; its published
scaling tables assumed the fused kernel's per-chip time without real
Mosaic ever compiling the 2-D tile kernels.  Two modes close that:

mesh1 — build ``make_sharded_avir_executor_2d`` over a 1x1 device mesh
        on the real chip (same kernel bodies, degenerate collectives),
        parity <= 1 LSB vs the single-chip executor ON DEVICE, and
        per-chip time vs single-chip (target: within ~5%).

geom  — mesh-EMULATION at real multi-chip geometry: build the
        production (r x s) per-device kernels via ``_pallas_2d_setup``,
        assemble every device's raw / column-extended / fully-extended
        tiles by slicing the zero-extended padded image ON DEVICE
        (bit-identical to the ppermute halos, including the zero-filled
        mesh edges), run each device's exact kernel-call structure
        (the overlapped A/B/C split for u8, the blocking single call
        for u16) on the one real chip, reassemble, parity-check against
        the single-chip executor, and measure per-device time — the
        per-chip term the 2-D tables in docs/scaling.md are built on.
        Sources are generated on device (random bits): nothing heavier
        than a scalar crosses the tunnel.

Usage:
  /opt/venv/bin/python tools/probe_strip2d_tpu.py mesh1 [names...]
  /opt/venv/bin/python tools/probe_strip2d_tpu.py geom  [names...]

Prints one JSON line per (config, grid).
"""

import json
import logging
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

logging.basicConfig(stream=sys.stderr, level=logging.INFO)

# name: (sw, sh, nw, nh, ch, tin, tout, gamma, alpha)
CONFIGS = {
    "headline": (7680, 4320, 1920, 1080, 3, "u8", "u8", 0, -1),
    "gamma": (7680, 4320, 1920, 1080, 4, "u8", "u8", 1, 3),
    "u16": (3840, 2160, 7680, 4320, 4, "u16", "u16", 1, 3),
    "upsize": (640, 480, 1024, 768, 3, "u8", "u8", 0, -1),
    "hd16k": (16384, 16384, 4096, 4096, 3, "u8", "u8", 0, -1),
}
DT = {"u8": np.uint8, "u16": np.uint16}
# geom grids per config (rows x cols meshes worth publishing).  The
# (n, 1) grids are the 1-D row-strip structure (degenerate lane op) —
# the measured per-strip term for the 1-D tables in docs/scaling.md.
GEOM_GRIDS = {
    "headline": [
        (2, 1), (4, 1), (8, 1), (16, 1), (1, 4),
        (2, 2), (2, 4), (4, 4),
    ],
    "gamma": [(4, 1), (2, 4)],
    "u16": [(2, 1), (2, 2)],
    "upsize": [(2, 1), (4, 1), (2, 2)],
    "hd16k": [(4, 1), (8, 1), (16, 1), (4, 4), (8, 4)],
}


def _plan_for(name):
    from avir_tpu.plan.plan import build_resize_plan

    sw, sh, nw, nh, ch, tin, tout, gamma, alpha = CONFIGS[name]
    return build_resize_plan(
        sw, sh, nw, nh, ch, DT[tin], DT[tout],
        use_srgb_gamma=bool(gamma), alpha_index=alpha,
    ), (sw, sh, nw, nh, ch, DT[tin])


def _device_src(plan, dt):
    import jax
    import jax.numpy as jnp

    h, wc = plan.src_h, plan.src_w * plan.el_count
    jdt = jnp.uint8 if dt == np.uint8 else jnp.uint16
    # Chunked: threefry's u32 intermediates for a one-shot 16K source
    # exhaust HBM on the shared chip.
    rows = max(1, min(h, (64 << 20) // wc))
    keys = jax.random.split(jax.random.PRNGKey(7), -(-h // rows))
    gen = jax.jit(
        lambda k: jax.random.bits(k, (rows, wc), dtype=jdt)
    )
    parts = [gen(k) for k in keys]
    return jnp.concatenate(parts, axis=0)[:h]


def run_mesh1(names):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.parallel.sharded import make_sharded_avir_executor_2d
    from avir_tpu.utils.benchmarking import device_ms

    assert jax.default_backend() not in ("cpu", "gpu"), "need the TPU"
    mesh = Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("sp", "cp")
    )

    @jax.jit
    def maxdiff(a, b):
        return jnp.max(
            jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
        )

    for name in names:
        info = {"mode": "mesh1", "config": name}
        try:
            plan, (sw, sh, nw, nh, ch, dt) = _plan_for(name)
            single = make_avir_executor(plan)
            sharded = make_sharded_avir_executor_2d(
                plan, mesh, engine="pallas"
            )
            src = _device_src(plan, dt)
            a = single(src)
            b = sharded(src)
            info["maxdiff"] = int(np.asarray(maxdiff(a, b)))
            ms_single, _ = device_ms(single, src, n=10)
            ms_2d, _ = device_ms(sharded, src, n=10)
            info["single_ms"] = round(ms_single, 3)
            info["mesh1_ms"] = round(ms_2d, 3)
            info["ratio"] = round(ms_2d / ms_single, 3)
            info["ok"] = info["maxdiff"] <= 1
        except Exception as e:  # noqa: BLE001 — report and continue
            info["ok"] = False
            info["error"] = f"{type(e).__name__}: {e}"[:500]
        print(json.dumps(info), flush=True)


def _setup_2d(plan, r, s):
    import jax.numpy as jnp

    from avir_tpu.models.runtime import resolve_modes
    from avir_tpu.parallel.sharded import _pallas_2d_setup, shard_v_op

    h, w = plan.src_h, plan.src_w
    padded_h = h + ((-h) % r)
    padded_w = w + ((-w) % s)
    svv = shard_v_op(plan.v.op, r, padded_h, tile=64)
    svh = shard_v_op(plan.h.op, s, padded_w, tile=64)
    in_exact_bf16 = (
        not plan.is_in_float
        and plan.in_type_max == 255.0
        and not plan.use_srgb_gamma
    )
    mf, ms = resolve_modes("auto", in_exact_bf16)
    out_bits = 8 if plan.out_type_max == 255.0 else 16
    trunc = 0 if plan.is_out_float else out_bits - plan.res_bit_depth
    out_dt = (
        jnp.float32 if plan.is_out_float
        else (jnp.uint8 if plan.out_type_max == 255.0 else jnp.uint16)
    )
    p2d = _pallas_2d_setup(
        plan, r, s, padded_h, padded_w, "auto", mf, ms,
        False, trunc, out_dt, svv.m, svh.m, "sp", "cp",
        [], [], [], [], "pallas", False, None,
    )
    return p2d, padded_h, padded_w


def run_geom(names):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.utils.benchmarking import device_ms

    assert jax.default_backend() not in ("cpu", "gpu"), "need the TPU"

    @jax.jit
    def maxdiff(a, b):
        return jnp.max(
            jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
        )

    for name in names:
        # name or name:RxS,RxS — explicit grid override.
        grids = None
        if ":" in name:
            name, spec = name.split(":", 1)
            grids = [
                tuple(int(v) for v in g.split("x"))
                for g in spec.split(",")
            ]
        plan, (sw, sh, nw, nh, ch, dt) = _plan_for(name)
        single = make_avir_executor(plan)
        src = _device_src(plan, dt)
        a = single(src)
        for (r, s) in (grids or GEOM_GRIDS.get(name, [])):
            info = {
                "mode": "geom", "config": name, "grid": f"{r}x{s}",
            }
            try:
                p2d, padded_h, padded_w = _setup_2d(plan, r, s)
                if p2d is None:
                    info["ok"] = False
                    info["error"] = "fused route not viable"
                    print(json.dumps(info), flush=True)
                    continue
                svb, slb = p2d.svb, p2d.slb
                strip_r, sl = svb.strip, slb.strip_lanes
                hlr, hhr = svb.halo_lo, svb.halo_hi
                hll, hhl = slb.halo_lo, slb.halo_hi
                info["int8"] = p2d.use_int8

                pad = jax.jit(
                    lambda x: jnp.pad(
                        x,
                        (
                            (0, padded_h - x.shape[0]),
                            (0, padded_w * ch - x.shape[1]),
                        ),
                    )
                )
                full_p = pad(src)
                zext = jax.jit(
                    lambda x: jnp.pad(x, ((hlr, hhr), (hll, hhl)))
                )
                Z = zext(full_p)

                # The ppermute halos are exactly the neighbours' edge
                # regions — i.e. a contiguous slice of the globally
                # zero-extended image (zeros where a mesh edge has no
                # neighbour, matching ppermute's zero fill).  Slice
                # and compute in ONE jit: feeding the extended tile as
                # a jit ARGUMENT gives it XLA's tiled u16 entry
                # layout, whose relayout for the kernel's row-major
                # operand constraint is staged in scoped VMEM and can
                # blow the 16 MB budget (probe artifact; the maker
                # assembles ext in-graph and never hits it).
                def slices(Pimg, Zimg, i, j):
                    x = jax.lax.dynamic_slice(
                        Pimg, (i * strip_r, j * sl), (strip_r, sl)
                    )
                    ext = jax.lax.dynamic_slice(
                        Zimg,
                        (i * strip_r, j * sl),
                        (hlr + strip_r + hhr, hll + sl + hhl),
                    )
                    xc = ext[hlr : hlr + strip_r, :]
                    return x, xc, ext

                @jax.jit
                def cfun(Pimg, Zimg, i, j, *cs):
                    x, xc, ext = slices(Pimg, Zimg, i, j)
                    return p2d.compute(x, xc, ext, list(cs))

                # The in-graph slice copies are timed separately and
                # netted out so dev_ms stays comparable to the
                # shard_map body (which receives its tile sharded).
                sfun = jax.jit(slices)
                rows_spec = P("sp")
                # Tap tensors once to the device; per-device slices
                # stay on device (the tunnel is slow).
                dconsts = [jnp.asarray(np.asarray(c_))
                           for c_ in p2d.consts]

                # Timing uses the ARGS form (clean kernel-only
                # device time, the published methodology); parity uses
                # the in-graph-slice form (robust to the scoped-VMEM
                # relayout artifact).  When the args form cannot
                # compile, timing falls back to the closure form with
                # the ext-slice cost netted out (one-call kernels read
                # only ext; x/xc are dead-coded).
                tfun = jax.jit(
                    lambda x, xc, ext, *cs: p2d.compute(
                        x, xc, ext, list(cs)
                    )
                )

                def closure_fun(i, j, cs):
                    # Fallback: consts CLOSED OVER (graph constants)
                    # and static slice starts — avoids the tiled
                    # entry-layout relayouts that XLA stages in scoped
                    # VMEM for big tap arguments (per-device
                    # recompile; used only when the arg form hits the
                    # scoped budget).
                    @jax.jit
                    def f(Pimg, Zimg):
                        x, xc, ext = slices(
                            Pimg, Zimg, jnp.int32(i), jnp.int32(j)
                        )
                        return p2d.compute(x, xc, ext, list(cs))

                    return f

                use_closure = False
                dev_ms = []
                out_rows = []
                for i in range(r):
                    row_outs = []
                    for j in range(s):
                        cs = tuple(
                            cst[i if spec == rows_spec else j]
                            for cst, spec in zip(
                                dconsts, p2d.specs
                            )
                        )
                        ii = jnp.int32(i)
                        jj = jnp.int32(j)
                        cf = None
                        if not use_closure:
                            try:
                                o = jax.block_until_ready(
                                    cfun(full_p, Z, ii, jj, *cs)
                                )
                            except Exception as e:  # noqa: BLE001
                                if "vmem" not in str(e).lower():
                                    raise
                                use_closure = True
                        if use_closure:
                            cf = closure_fun(i, j, cs)
                            o = jax.block_until_ready(cf(full_p, Z))
                        row_outs.append(o)
                        # Time two representative devices per grid
                        # (shapes and compute are identical across
                        # devices; only halo VALUES differ).
                        if (i, j) in ((0, 0), (r // 2, s // 2)):
                            x_d, xc_d, ext_d = sfun(
                                full_p, Z, ii, jj
                            )
                            try:
                                ms, _ = device_ms(
                                    tfun, x_d, xc_d, ext_d, *cs,
                                    n=10,
                                )
                            except Exception as e:  # noqa: BLE001
                                if "vmem" not in str(e).lower():
                                    raise
                                cf2 = cf or closure_fun(i, j, cs)
                                ms, _ = device_ms(
                                    cf2, full_p, Z, n=10
                                )
                                efun = jax.jit(
                                    lambda Pimg, Zimg: slices(
                                        Pimg, Zimg, ii, jj
                                    )[2]
                                )
                                ms_e, _ = device_ms(
                                    efun, full_p, Z, n=10
                                )
                                ms -= ms_e
                            dev_ms.append(round(ms, 3))
                    out_rows.append(
                        jnp.concatenate(row_outs, axis=1)
                    )
                info["const_mode"] = (
                    "closure" if use_closure else "args"
                )
                full = jnp.concatenate(out_rows, axis=0)[
                    :nh, : nw * ch
                ]
                info["maxdiff"] = int(np.asarray(maxdiff(a, full)))
                info["dev_ms"] = dev_ms
                info["max_dev_ms"] = max(dev_ms)
                ms_single, _ = device_ms(single, src, n=10)
                info["single_ms"] = round(ms_single, 3)
                info["per_chip_ratio"] = round(
                    max(dev_ms) / ms_single, 3
                )
                info["ok"] = info["maxdiff"] <= 1
            except Exception as e:  # noqa: BLE001
                info["ok"] = False
                info["error"] = f"{type(e).__name__}: {e}"[:3000]
            print(json.dumps(info), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "mesh1"
    names = sys.argv[2:] or (
        ["headline", "gamma", "u16", "upsize"]
        if mode == "mesh1"
        else ["headline", "gamma", "u16", "hd16k"]
    )
    if mode == "mesh1":
        run_mesh1(names)
    else:
        run_geom(names)
