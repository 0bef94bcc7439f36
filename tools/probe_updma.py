"""DMA-rate probe for the upsize kernel's access patterns.

probe_upsize.py showed 4K->8K is DMA-bound (dma-only 1.35 of 1.62 ms
full) with both sides moving ~200 MB at ~150 GB/s — far below the
740 GB/s contiguous ceiling and the 681 GB/s the downsize kernel's
[384, 1792] windows reach.  This probe separates READ and WRITE rates
as a function of block row length (bytes per strided row) on a
[4352, 23040] u8 array (the 8K output geometry).

  read:  windows [R, L] u8 in, one tiny [8, 128] out block
  write: no inputs, [R, L] u8 out tiles filled from iota

Run on the real chip; results drive the upsize tile-shape fix.
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avir_tpu.utils.benchmarking import device_ms

ROWS, LANES = 4352, 23040


def read_rate(r, l):
    gv = ROWS // r
    gh = LANES // l
    x = jnp.zeros((ROWS, LANES), jnp.uint8)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[:8, :128]

    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel,
            grid=(gv, gh),
            in_specs=[
                pl.BlockSpec((r, l), lambda i, j: (i, j)),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint8),
        )(a)
    )
    jax.block_until_ready(f(x))
    ms, _ = device_ms(lambda: f(x))
    mb = gv * gh * r * l / 1e6
    print(
        f"read  [{r:4d},{l:5d}] ({l:5d} B rows): {ms:7.3f} ms  "
        f"{mb / ms:6.1f} GB/s",
        flush=True,
    )


def write_rate(r, l):
    gv = ROWS // r
    gh = LANES // l

    def kernel(o_ref):
        o_ref[...] = jax.lax.broadcasted_iota(
            jnp.int32, o_ref.shape, 1
        ).astype(jnp.uint8)

    f = jax.jit(
        lambda: pl.pallas_call(
            kernel,
            grid=(gv, gh),
            in_specs=[],
            out_specs=pl.BlockSpec((r, l), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint8),
        )()
    )
    jax.block_until_ready(f())
    ms, _ = device_ms(f)
    mb = ROWS * LANES / 1e6
    print(
        f"write [{r:4d},{l:5d}] ({l:5d} B rows): {ms:7.3f} ms  "
        f"{mb / ms:6.1f} GB/s",
        flush=True,
    )


def main():
    for r, l in (
        (128, 384), (128, 768), (128, 1536), (256, 1536),
        (128, 4608), (256, 4608), (64, 23040), (256, 2304),
    ):
        read_rate(r, l)
    for r, l in (
        (128, 384), (128, 768), (128, 1536), (256, 1536),
        (128, 4608), (256, 4608), (64, 23040), (256, 2304),
    ):
        write_rate(r, l)
    return 0


if __name__ == "__main__":
    sys.exit(main())
