"""Validate + measure the row-blocked Pallas wavefront on the real
chip (VERDICT r4 item 3).

For each size: times the NEW default route (carry-kernel blocks at the
G=128 optimum, ops/dither.py auto policy), the old single-block Pallas
route (block_rows=h), checks parity between them and against the
lax.scan blocked formulation (engine='xla', same blocks) — expected
bit-exact at trunc_bits=0 — and reports the implied per-step latency.

Usage: /opt/venv/bin/python tools/probe_wavefront_blocked.py [names...]
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

SIZES = {
    "1080p": (1080, 1920, 3),
    "4k": (4096, 4096, 3),
    "8k": (4320, 7680, 3),
    "8k4": (4320, 7680, 4),
}


def main(names):
    import jax
    import jax.numpy as jnp

    from avir_tpu.ops.dither import errdiff_dither_wavefront_jnp
    from avir_tpu.utils.benchmarking import device_ms

    assert jax.default_backend() not in ("cpu", "gpu"), "need the TPU"

    @jax.jit
    def maxdiff(a, b):
        return jnp.max(jnp.abs(a - b))

    for name in names:
        h, w, c = SIZES[name]
        rb = max(8, min(h, 1024 // c))
        nb = -(-h // rb)
        info = {
            "size": name, "h": h, "w": w, "c": c,
            "block_rows": rb, "blocks": nb,
            "steps": nb * (2 * (rb - 1) + w),
        }
        try:
            img8 = jax.random.bits(
                jax.random.PRNGKey(3), (h, w * c), dtype=jnp.uint8
            )
            d = jax.block_until_ready(
                jax.jit(
                    lambda x: x.astype(jnp.float32).reshape(h, w, c)
                )(img8)
            )

            new = jax.jit(
                lambda x: errdiff_dither_wavefront_jnp(x, 0, 255.0)
            )
            old = jax.jit(
                lambda x: errdiff_dither_wavefront_jnp(
                    x, 0, 255.0, block_rows=h
                )
            )
            xla_b = jax.jit(
                lambda x: errdiff_dither_wavefront_jnp(
                    x, 0, 255.0, engine="xla", block_rows=rb
                )
            )
            a = new(d)
            info["diff_vs_single"] = float(
                np.asarray(maxdiff(a, old(d)))
            )
            info["diff_vs_xla_blocked"] = float(
                np.asarray(maxdiff(a, xla_b(d)))
            )
            ms_new, _ = device_ms(new, d, n=10)
            ms_old, _ = device_ms(old, d, n=10)
            info["new_ms"] = round(ms_new, 3)
            info["old_ms"] = round(ms_old, 3)
            info["speedup"] = round(ms_old / ms_new, 2)
            info["step_us"] = round(ms_new * 1e3 / info["steps"], 3)
            info["ok"] = (
                info["diff_vs_single"] == 0.0
                and info["diff_vs_xla_blocked"] == 0.0
            )
        except Exception as e:  # noqa: BLE001
            info["ok"] = False
            info["error"] = f"{type(e).__name__}: {e}"[:600]
        print(json.dumps(info), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(SIZES))
