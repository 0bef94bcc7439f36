"""Generate the measured-per-chip scaling tables for docs/scaling.md
(VERDICT r4 item 1: publish 2-D numbers on a per-chip term the shipped
executor actually achieves).

Per-chip compute times are MEASURED on the real v5e chip by
tools/probe_strip2d_tpu.py (mesh-emulation mode: every device's exact
fused-kernel calls, host-assembled halos; see MEASURED below).  The
communication term is modeled from the plan's exact halo geometry
(shard_v_blocked / shard_lane_blocked raw-byte halos — the fused route
exchanges BOTH halos on the raw integer tile) with v5e ICI constants,
credited with the overlap of the interior kernel call (issued before
either collective's results are consumed):

  t_exposed = max(0, t_halo_col + t_halo_row - frac_interior * t_dev)
  eff(r,s)  = t_single / (r*s * (t_dev + t_exposed))

Run on the 8-device CPU env (geometry only — no TPU needed):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      /opt/venv/bin/python tools/scaling_2d_report.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

from avir_tpu.parallel.scaling_model import V5E_ICI_BW, V5E_ICI_LAT

# Measured on the real v5e chip, 2026-08-21 (tools/probe_strip2d_tpu.py
# geom mode; ms per device, <= 1 LSB parity vs single chip in every
# row).  single: the single-chip fused executor on the same source.
# Round-5 one-call default (halo_overlap=False) measurements.
MEASURED = {
    # config: (single_ms, {(r, s): dev_ms})
    "headline": (0.334, {
        (2, 1): 0.199, (4, 1): 0.120, (8, 1): 0.076, (16, 1): 0.058,
        (1, 2): 0.219, (1, 4): 0.105, (1, 8): 0.050, (1, 16): 0.025,
        (2, 2): 0.123, (2, 4): 0.059, (2, 8): 0.029, (4, 4): 0.036,
    }),
    "gamma": (2.059, {(4, 1): 0.624, (2, 4): 0.311}),
    "u16": (3.56, {(2, 1): 1.991, (2, 2): 0.840}),
    "hd16k": (2.735, {
        (4, 1): 0.749, (8, 1): 0.393, (16, 1): 0.217,
        (1, 8): 0.343, (2, 8): 0.175,
        (4, 4): 0.180, (8, 4): 0.096,
    }),
    "upsize": (0.032, {
        (2, 1): 0.026, (4, 1): 0.016, (2, 2): 0.016,
    }),
}
PLANS = {
    "headline": (7680, 4320, 1920, 1080, 3, "u8", False),
    "gamma": (7680, 4320, 1920, 1080, 4, "u8", True),
    "u16": (3840, 2160, 7680, 4320, 4, "u16", True),
    "hd16k": (16384, 16384, 4096, 4096, 3, "u8", False),
    "upsize": (640, 480, 1024, 768, 3, "u8", False),
}
DT = {"u8": np.uint8, "u16": np.uint16}


def comm_terms(plan, r, s, in_b):
    """(t_halo_col_s, t_halo_row_s, frac_interior) from exact plan
    geometry — raw-byte halos, fused 2-D route."""
    from avir_tpu.parallel.sharded import (
        shard_lane_blocked,
        shard_v_blocked,
    )

    h, w, c = plan.src_h, plan.src_w, plan.el_count
    padded_h = h + ((-h) % r)
    padded_w = w + ((-w) % s)
    svb = shard_v_blocked(plan.v.op, r, padded_h, in_bytes=in_b)
    slb = shard_lane_blocked(plan.h.op, s, padded_w, c, in_bytes=in_b)
    if svb.use_all_gather or slb.use_all_gather:
        return None
    strip_r, sl = svb.strip, slb.strip_lanes
    t_c = 0.0
    if s > 1 and max(slb.halo_lo, slb.halo_hi) > 0:
        t_c = V5E_ICI_LAT + (
            max(slb.halo_lo, slb.halo_hi) * strip_r * in_b
        ) / V5E_ICI_BW
    t_r = 0.0
    if r > 1 and max(svb.halo_lo, svb.halo_hi) > 0:
        xc_lanes = slb.halo_lo + sl + slb.halo_hi
        t_r = V5E_ICI_LAT + (
            max(svb.halo_lo, svb.halo_hi) * xc_lanes * in_b
        ) / V5E_ICI_BW
    # Round 5: the shipped default is ONE blocking kernel per device
    # (the 3-call interior/border split measured ~2x slower than the
    # <= 45 us of halo it hides — parallel/sharded.py), so no overlap
    # credit: both halo times are fully exposed.
    return t_c, t_r, 0.0


def main():
    from avir_tpu.plan.plan import build_resize_plan

    for name, (single_ms, grids) in MEASURED.items():
        sw, sh, nw, nh, ch, tin, gamma = PLANS[name]
        plan = build_resize_plan(
            sw, sh, nw, nh, ch, DT[tin], DT[tin],
            use_srgb_gamma=gamma, alpha_index=3 if gamma else -1,
        )
        in_b = 1 if tin == "u8" else 2
        print(f"\n## {name}  ({sw}x{sh} -> {nw}x{nh}, "
              f"single-chip {single_ms} ms)")
        print("| grid | n | dev ms | halo col/row us | exposed us "
              "| step ms | eff |")
        print("|---|---|---|---|---|---|---|")
        for (r, s), dev in sorted(grids.items(),
                                  key=lambda kv: (kv[0][0] * kv[0][1],
                                                  kv[0])):
            if dev is None:
                continue
            ct = comm_terms(plan, r, s, in_b)
            if ct is None:
                print(f"| {r}x{s} | {r * s} | {dev} | all-gather | "
                      "- | - | - |")
                continue
            t_c, t_r, frac = ct
            t_int = frac * dev * 1e-3
            exposed = max(0.0, t_c + t_r - t_int)
            step = dev * 1e-3 + exposed
            eff = single_ms * 1e-3 / ((r * s) * step)
            print(
                f"| {r}x{s} | {r * s} | {dev:.3f} | "
                f"{t_c * 1e6:.0f}/{t_r * 1e6:.0f} | "
                f"{exposed * 1e6:.0f} | {step * 1e3:.3f} | "
                f"**{eff:.2f}** |"
            )


if __name__ == "__main__":
    main()
