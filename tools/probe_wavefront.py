"""Decompose + attack the wavefront errdiff scan's per-step overhead.

Round-3 verdict: the wavefront ditherer runs at 3.2-8.3 us per
diagonal step while the VPU work per step is tens of nanoseconds —
~100x overhead-bound, the framework's slowest stage.  This probe
measures, on the real chip:

  1. the skew/unskew data movement alone (scan replaced by identity),
  2. the full scan at several lax.scan unroll factors,
  3. the quantize-only floor (round+clamp, no scan) for context.

Usage: /opt/venv/bin/python tools/probe_wavefront.py [sizes...]
Prints one JSON line per (size, variant).
"""

import functools
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

SIZES = {
    "1080p": (1080, 1920, 3),
    "8k": (4320, 7680, 3),
    "tall": (4096, 256, 3),
}


def main(names):
    import jax
    import jax.numpy as jnp

    from avir_tpu.ops.dither import (
        default_dither_jnp,
        errdiff_dither_wavefront_jnp,
    )
    from avir_tpu.utils.benchmarking import device_ms

    for name in names:
        h, w, c = SIZES[name]
        T = 2 * (h - 1) + w
        rng = np.random.default_rng(5)
        # Ship u8 through the tunnel and widen on device (CLAUDE.md
        # round-3 lesson: big f32 device_puts are pathologically slow
        # on this rig); the one-time cast is outside the timed fns.
        img8 = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        d = jax.block_until_ready(
            jax.jit(lambda x: x.astype(jnp.float32))(
                jax.device_put(img8)
            )
        )

        @jax.jit
        def skew_only(x):
            # Same FLAT pad+reshape skew/unskew as the wavefront
            # (round 4: the channels-minor layout tile-padded 3 -> 128
            # lanes, and per-row jnp.roll lowered to gathers — the two
            # were 73-90% of the runtime), with the scan replaced by a
            # copy: isolates the data-movement cost.
            flat = x.reshape(h, w * c)
            R, s = T * c, 2 * c
            P = jnp.pad(flat, ((0, 0), (0, R + s - w * c)))
            D = P.reshape(-1)[: h * R].reshape(h, R)
            S = D.reshape(h, T, c).transpose(1, 0, 2).reshape(
                T, h * c
            )
            O = S + 1.0
            Ot = O.reshape(T, h, c).transpose(1, 0, 2).reshape(h, R)
            F = jnp.concatenate(
                [Ot.reshape(-1), jnp.zeros((h * s,), Ot.dtype)]
            )
            return F.reshape(h, R + s)[:, : w * c].reshape(h, w, c)

        variants = {"skew_only": skew_only,
                    "quant_only": jax.jit(
                        lambda x: default_dither_jnp(x, 0, 255.0)),
                    # NOTE: tall-narrow sizes auto-route to the
                    # row-blocked lax.scan BEFORE the engine pick, so
                    # this variant is labeled by the route taken.
                    (
                        "pallas"
                        if 2 * h <= 7 * w
                        else "auto(blocked-scan)"
                    ): jax.jit(
                        functools.partial(
                            errdiff_dither_wavefront_jnp,
                            trunc_bits=0, out_max=255.0,
                            engine="pallas",
                        )
                    )}
        for unroll in (1, 8):
            variants[f"scan_u{unroll}"] = jax.jit(
                functools.partial(
                    errdiff_dither_wavefront_jnp,
                    trunc_bits=0, out_max=255.0, unroll=unroll,
                    engine="xla",
                )
            )

        for vname, fn in variants.items():
            try:
                ms, _ = device_ms(fn, d, n=5)
                rec = {
                    "size": name, "variant": vname,
                    "ms": round(ms, 3),
                    "us_per_step": round(ms * 1e3 / T, 3),
                }
            except Exception as e:  # noqa: BLE001
                rec = {
                    "size": name, "variant": vname,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(SIZES))
