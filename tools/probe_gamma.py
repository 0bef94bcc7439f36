import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.models.runtime import make_avir_executor
from avir_tpu.utils.benchmarking import device_ms

rng = np.random.default_rng(0)
src = rng.integers(0, 256, (4320, 7680 * 3), dtype=np.uint8)
xd = jax.device_put(jnp.asarray(src))
plan = build_resize_plan(7680, 4320, 1920, 1080, 3, np.uint8, np.uint8, use_srgb_gamma=True)
run = make_avir_executor(plan)
jax.block_until_ready(run(xd))
ms, _ = device_ms(run, xd, n=20)
print(f"8K->1080p gamma: {ms:.3f} ms ({4320*7680/1e6/(ms/1e3):.0f} Mpix/s)")
