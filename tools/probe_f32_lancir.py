"""Measure the f32-in/f32-out LANCIR path on the real chip (VERDICT r3
item 8: README needs a float LANCIR row — the reference supports float
I/O through the same template, lancir.h:386-713).

Usage: /opt/venv/bin/python tools/probe_f32_lancir.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import numpy as np
import jax

from avir_tpu.models.runtime import make_lancir_executor
from avir_tpu.plan.lancir_plan import build_lancir_plan
from avir_tpu.utils.benchmarking import device_ms

rng = np.random.default_rng(0)
# Sources kept <= ~35 MB: large f32 device_puts are pathologically
# slow through this rig's tunnel (CLAUDE.md round-3 lesson).
for name, sw, sh, nw, nh, c in (
    ("1080p->720p RGBA f32", 1920, 1080, 1280, 720, 4),
    ("1080p->4K RGB f32", 1920, 1080, 3840, 2160, 3),
):
    src = rng.random((sh, sw * c), dtype=np.float32) * 255.0
    plan = build_lancir_plan(
        sw, sh, nw, nh, c, np.float32, np.float32
    )
    run = make_lancir_executor(plan)
    xd = jax.device_put(src)
    jax.block_until_ready(run(xd))
    ms, _ = device_ms(run, xd, n=20)
    print(
        f"{name:24s}: {ms:.3f} ms  "
        f"in {sw * sh / 1e6 / (ms / 1e3):.0f} Mpix/s",
        flush=True,
    )
