import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from avir_tpu.plan.lancir_plan import build_lancir_plan
from avir_tpu.models.runtime import make_lancir_executor
from avir_tpu.utils.benchmarking import device_ms

rng = np.random.default_rng(0)
for name, sw, sh, nw, nh, c in (
    ("1080p->720p RGBA (BASELINE cfg)", 1920, 1080, 1280, 720, 4),
    ("8K->1080p RGB", 7680, 4320, 1920, 1080, 3),
    ("1080p->4K RGB", 1920, 1080, 3840, 2160, 3),
):
    src = rng.integers(0, 256, (sh, sw * c), dtype=np.uint8)
    plan = build_lancir_plan(sw, sh, nw, nh, c, np.uint8, np.uint8)
    run = make_lancir_executor(plan)
    xd = jax.device_put(jnp.asarray(src))
    jax.block_until_ready(run(xd))
    ms, _ = device_ms(run, xd, n=20)
    print(f"{name:34s}: {ms:.3f} ms  in {sw*sh/1e6/(ms/1e3):.0f} Mpix/s  out {nw*nh/1e6/(ms/1e3):.0f} Mpix/s")
