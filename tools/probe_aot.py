"""Serving cold-start: AOT executable serialization (VERDICT r4
item 6).

Measures, for the flagship configs, whether
``jax.experimental.serialize_executable`` can snapshot the COMPILED
executor and reload it in a fresh process-analog — the deployment
answer to the 9-19 s first-call Mosaic/XLA compile (the persistent
compilation cache covers the same HLO across processes; AOT
serialization removes even the cache's re-link cost and pins the
binary).

Reports: compile seconds, serialized size, deserialize+load seconds,
first-call-after-load correctness vs the live executor.

Usage: /opt/venv/bin/python tools/probe_aot.py [configs...]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

CONFIGS = {
    "readme": (640, 480, 1024, 768, 3, "u8", "u8", 0, -1),
    "headline": (7680, 4320, 1920, 1080, 3, "u8", "u8", 0, -1),
    "u16": (3840, 2160, 7680, 4320, 4, "u16", "u16", 1, 3),
}
DT = {"u8": np.uint8, "u16": np.uint16}


def main(names):
    import jax
    import jax.numpy as jnp

    from avir_tpu.models.runtime import make_avir_executor
    from avir_tpu.plan.plan import build_resize_plan

    for name in names:
        sw, sh, nw, nh, ch, tin, tout, gamma, alpha = CONFIGS[name]
        info = {"config": name}
        try:
            plan = build_resize_plan(
                sw, sh, nw, nh, ch, DT[tin], DT[tout],
                use_srgb_gamma=bool(gamma), alpha_index=alpha,
            )
            fn = make_avir_executor(plan)
            src = jax.random.bits(
                jax.random.PRNGKey(5), (sh, sw * ch),
                dtype=jnp.uint8 if tin == "u8" else jnp.uint16,
            )
            t0 = time.perf_counter()
            lowered = fn.lower(src)
            compiled = lowered.compile()
            info["compile_s"] = round(time.perf_counter() - t0, 2)

            from jax.experimental.serialize_executable import (
                deserialize_and_load,
                serialize,
            )

            t0 = time.perf_counter()
            payload, in_tree, out_tree = serialize(compiled)
            info["serialize_s"] = round(time.perf_counter() - t0, 2)
            info["payload_mb"] = round(len(payload) / 2**20, 2)

            t0 = time.perf_counter()
            loaded = deserialize_and_load(payload, in_tree, out_tree)
            info["load_s"] = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            out = jax.block_until_ready(loaded(src))
            info["first_call_s"] = round(time.perf_counter() - t0, 2)
            want = jax.block_until_ready(compiled(src))
            info["maxdiff"] = int(
                np.asarray(
                    jnp.max(
                        jnp.abs(
                            out.astype(jnp.int32)
                            - want.astype(jnp.int32)
                        )
                    )
                )
            )
            info["ok"] = info["maxdiff"] == 0
        except Exception as e:  # noqa: BLE001
            info["ok"] = False
            info["error"] = f"{type(e).__name__}: {e}"[:800]
        print(json.dumps(info), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(CONFIGS))
