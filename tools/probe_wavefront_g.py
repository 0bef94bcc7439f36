"""Measure the Pallas wavefront kernel's per-step latency vs the
planar vector width G = round_up(C*H/8, 128).

Hypothesis (VERDICT r4 item 3 follow-up): the ~1.4-2.6 us/step at 8K
is VMEM streaming of wide carry vectors — four (8, G) carries plus
temporaries exceed the vector register file for G ~ 1664 (H = 4320),
so every step round-trips VMEM.  If t_step collapses for small G, a
ROW-BLOCKED Pallas wavefront (blocks of R rows, noise carried across
blocks) wins twice: smaller G per step AND less skew-transpose traffic
(blowup (W + 2R)/W instead of (W + 2H)/W).

For each height (fixed W = 7680): measures skew+unskew alone, the full
Pallas wavefront, and reports (full - skew) / T as per-step latency.

Usage: /opt/venv/bin/python tools/probe_wavefront_g.py [heights...]
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

HEIGHTS = [256, 512, 1024, 2160, 4320]
W, C = 7680, 3


def main(heights):
    import jax
    import jax.numpy as jnp

    from avir_tpu.ops.dither import (
        _skew_rows,
        _unskew_rows,
        errdiff_dither_wavefront_jnp,
    )
    from avir_tpu.utils.benchmarking import device_ms

    for h in heights:
        h = int(h)
        T = 2 * (h - 1) + W
        G = -(-C * h // 8)
        G = (G + 127) // 128 * 128
        info = {"h": h, "w": W, "T": T, "G": G}
        try:
            img8 = jax.random.bits(
                jax.random.PRNGKey(1), (h, W * C), dtype=jnp.uint8
            )
            d = jax.block_until_ready(
                jax.jit(
                    lambda x: x.astype(jnp.float32).reshape(h, W, C)
                )(img8)
            )

            @jax.jit
            def skew_only(x):
                flat = x.reshape(h, W * C)
                s = _skew_rows(flat, W, C)
                return _unskew_rows(s, h, W, C)

            @jax.jit
            def wf(x):
                return errdiff_dither_wavefront_jnp(
                    x, 0, 255.0, block_rows=h
                )

            ms_skew, _ = device_ms(skew_only, d, n=10)
            ms_full, _ = device_ms(wf, d, n=10)
            info["skew_ms"] = round(ms_skew, 3)
            info["full_ms"] = round(ms_full, 3)
            info["step_us"] = round(
                (ms_full - ms_skew) * 1e3 / T, 3
            )
            info["ok"] = True
        except Exception as e:  # noqa: BLE001
            info["ok"] = False
            info["error"] = f"{type(e).__name__}: {e}"[:400]
        print(json.dumps(info), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or HEIGHTS)
