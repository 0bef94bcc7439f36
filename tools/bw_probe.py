import sys; sys.path.insert(0, "/root/repo")
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from avir_tpu.utils.benchmarking import device_ms

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 256, (4320, 23040), dtype=np.uint8))

# 1) full-row streaming: grid over 32-row blocks, read [32, 23040], write [32, 128]
def k1(x_ref, o_ref):
    o_ref[...] = x_ref[:, :128]
f1 = jax.jit(lambda x: pl.pallas_call(
    k1, grid=(4320//32,),
    in_specs=[pl.BlockSpec((32, 23040), lambda i: (i, 0))],
    out_specs=pl.BlockSpec((32, 128), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((4320, 128), jnp.uint8))(x))
jax.block_until_ready(f1(x))
ms, _ = device_ms(f1, x, n=20)
print(f"row-stream 32x23040: {ms*1e3:7.1f} us -> {x.size/ms*1e3/1e9:.0f} GB/s")

# 2) bigger blocks 128 rows
f2 = jax.jit(lambda x: pl.pallas_call(
    k1, grid=(4320//128 + (1 if 4320%128 else 0),),
    in_specs=[pl.BlockSpec((128, 23040), lambda i: (i, 0))],
    out_specs=pl.BlockSpec((128, 128), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((4352, 128), jnp.uint8))(x))
try:
    jax.block_until_ready(f2(x))
    ms, _ = device_ms(f2, x, n=20)
    print(f"row-stream 128x23040: {ms*1e3:7.1f} us -> {x.size/ms*1e3/1e9:.0f} GB/s")
except Exception as e:
    print("128-row fail:", str(e).splitlines()[0][:120])

# 3) headline window pattern, same as ablation dma but u8 out
from avir_tpu.plan.plan import build_resize_plan
from avir_tpu.ops.banded import block_banded
from avir_tpu.ops.lanes import lane_block_banded
plan = build_resize_plan(7680, 4320, 1920, 1080, 3, np.uint8, np.uint8)
vop = block_banded(plan.v.op); lop = lane_block_banded(plan.h.op, 3)
Bv, Tv, Wv = vop.taps_q1.shape
Bh = lop.ctaps_q1.shape[0]; WC = lop.taps_hi.shape[1]; TC = lop.taps_hi.shape[2]
from jax.experimental.pallas import tpu as pltpu
def k3(ov, oh, x_ref, o_ref):
    o_ref[...] = x_ref[:Tv, :TC]
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(Bh, Bv),
    in_specs=[pl.BlockSpec((pl.Element(Wv), pl.Element(WC)),
                           lambda hb, vb, ov, oh: (ov[vb]*32, oh[hb]*128))],
    out_specs=pl.BlockSpec((Tv, TC), lambda hb, vb, *_: (vb, hb)))
f3 = jax.jit(lambda a, b, x: pl.pallas_call(
    k3, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((Bv*Tv, Bh*TC), jnp.uint8))(a, b, x))
args = (vop.offs//32, lop.offs_l//128, x)
jax.block_until_ready(f3(*args))
ms, _ = device_ms(f3, *args, n=20)
rd = Bh*Bv*Wv*WC
print(f"window-dma u8-out:  {ms*1e3:7.1f} us -> {rd/ms*1e3/1e9:.0f} GB/s read ({rd/1e6:.1f} MB)")
