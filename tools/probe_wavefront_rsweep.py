"""Sweep the carry-kernel block size R at 8K to pin the auto policy
(ops/dither.py: block_rows = 1024//C keeps G at the 128-lane floor;
this sweep asks whether the carry variant's fixed per-step overhead
favors larger blocks).

Usage: /opt/venv/bin/python tools/probe_wavefront_rsweep.py [R...]
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

H, W, C = 4320, 7680, 3
RS = [256, 341, 512, 682, 864, 1024]


def main(rs):
    import jax
    import jax.numpy as jnp

    from avir_tpu.ops.dither import errdiff_dither_wavefront_jnp
    from avir_tpu.utils.benchmarking import device_ms

    img8 = jax.random.bits(
        jax.random.PRNGKey(3), (H, W * C), dtype=jnp.uint8
    )
    d = jax.block_until_ready(
        jax.jit(lambda x: x.astype(jnp.float32).reshape(H, W, C))(
            img8
        )
    )
    base = None
    for rb in rs:
        rb = int(rb)
        nb = -(-H // rb)
        steps = nb * (2 * (rb - 1) + W)
        info = {"R": rb, "blocks": nb, "steps": steps,
                "G": (-(-C * rb // 8) + 127) // 128 * 128}
        try:
            fn = jax.jit(
                lambda x, rb=rb: errdiff_dither_wavefront_jnp(
                    x, 0, 255.0, block_rows=rb
                )
            )
            out = fn(d)
            if base is None:
                base = out
            else:
                info["maxdiff"] = float(
                    np.abs(
                        np.asarray(out) - np.asarray(base)
                    ).max()
                )
            ms, _ = device_ms(fn, d, n=10)
            info["ms"] = round(ms, 3)
            info["step_us"] = round(ms * 1e3 / steps, 3)
            info["ok"] = True
        except Exception as e:  # noqa: BLE001
            info["ok"] = False
            info["error"] = f"{type(e).__name__}: {e}"[:400]
        print(json.dumps(info), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or RS)
