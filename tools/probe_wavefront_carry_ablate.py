"""Ablate the carry kernel's per-step overhead vs the plain wavefront
kernel (timing-only variants; outputs are NOT semantically valid).

The no-carry kernel steps at 0.146 us (G = 128); the carry kernel at
~0.315 us.  Two candidate costs: the SMEM head scalars + 3
insert-selects on the recurrence path, and the full noise-stream
second output.  This probe times stripped variants to attribute the
difference — the data behind docs/perf_analysis.md's "remaining
levers" estimates.

Usage: /opt/venv/bin/python tools/probe_wavefront_carry_ablate.py
"""

import functools
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

H, W, C = 4320, 7680, 3
RB = 341  # the auto policy's block size at c=3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from avir_tpu.ops.banded import _round_up
    from avir_tpu.ops.dither import _skew_rows
    from avir_tpu.ops.pallas import wavefront_kernel as wk
    from avir_tpu.utils.benchmarking import device_ms

    assert jax.default_backend() not in ("cpu", "gpu"), "need the TPU"

    block = jax.random.uniform(
        jax.random.PRNGKey(0), (RB, W * C), jnp.float32, 0.0, 255.0
    )
    S = jax.block_until_ready(
        jax.jit(lambda b: _skew_rows(b, W, C))(block)
    )
    T, cr = S.shape
    r = cr // C
    G = _round_up(-(-cr // wk._SUB), 128)
    K = max(8, min(128, (8 << 20) // (16 * wk._SUB * G)) // 8 * 8)
    T_pad = -(-T // K) * K
    Sp = jnp.pad(S, ((0, T_pad - T), (0, G * wk._SUB - cr)))
    S3 = Sp.reshape(T_pad, wk._SUB, G)
    n_last = jnp.zeros((W * C,), jnp.float32)

    def run_plain():
        return wk.wavefront_scan_pallas(
            S, W, C, 1.0, 1.0, 255.0
        )

    def run_carry():
        return wk.wavefront_scan_pallas_carry(
            S, W, C, 1.0, 1.0, 255.0, n_last
        )

    # Variant kernels (timing only): strip one overhead each.
    def make_variant(no_heads: bool, no_ns: bool):
        base = functools.partial(
            wk._kernel_carry,
            K=K, w=W, c=C, r=r, G=G, tm=1.0, tmi=1.0, out_max=255.0,
        )

        def kern(s_ref, hd_ref, init_ref, o_ref, n_ref,
                 n1_ref, d1_ref, d2_ref, d3_ref):
            # Re-run the real kernel body but with the stripped
            # behavior patched in via globals is fragile; instead
            # re-derive a minimal loop matching _kernel_carry.
            tau = pl.program_id(0)
            jj = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (wk._SUB, G), 0
                ) * G
                + jax.lax.broadcasted_iota(
                    jnp.int32, (wk._SUB, G), 1
                )
            )
            yy2 = 2 * (jj % r)
            dead = jj >= C * r
            head0 = ((jj % r) == 0) | dead
            lane0 = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (wk._SUB, G), 1
                ) == 0
            )
            zero = jnp.zeros((wk._SUB, G), jnp.float32)
            planes = [jj == ch * r for ch in range(C)]

            def insert(a, scalars):
                if no_heads:
                    return a
                for ch in range(C):
                    a = jnp.where(planes[ch], scalars[ch], a)
                return a

            @pl.when(tau == 0)
            def _init():
                n1_ref[...] = zero
                for k_, ref in ((1, d1_ref), (2, d2_ref),
                                (3, d3_ref)):
                    ref[...] = insert(
                        zero,
                        [init_ref[3 - k_, ch] for ch in range(C)],
                    )

            def down(a, heads):
                b = pltpu.roll(a, 1, 1)
                colv = pltpu.roll(b, 1, 0)
                sh = jnp.where(lane0, colv, b)
                return insert(jnp.where(head0, zero, sh), heads)

            a1 = n1_ref[...]
            b1 = d1_ref[...]
            b2 = d2_ref[...]
            b3 = d3_ref[...]
            for k_ in range(K):
                t = tau * K + k_
                s_t = s_ref[k_]
                cur = (
                    s_t
                    + wk.W_CUR_RIGHT * a1
                    + wk.W_NEXT_LEFT * b1
                    + wk.W_NEXT_CENTER * b2
                    + wk.W_NEXT_RIGHT * b3
                )
                z0 = wk.round_biased(cur)
                x_of = t - yy2
                m = (x_of >= 0) & (x_of < W) & ~dead
                noise = jnp.where(m, cur - z0, 0.0)
                o_ref[k_] = jnp.clip(z0, 0.0, 255.0)
                if not no_ns:
                    n_ref[k_] = noise
                heads = [hd_ref[k_, ch] for ch in range(C)]
                a1, b1, b2, b3 = noise, down(noise, heads), b1, b2
            n1_ref[...] = a1
            d1_ref[...] = b1
            d2_ref[...] = b2
            d3_ref[...] = b3

        del base
        nlp = jnp.zeros(((T_pad + 4) * C,), jnp.float32)
        hd = nlp.reshape(-1, C)[3 : 3 + T_pad]
        init = nlp.reshape(-1, C)[:3]
        outs = [
            jax.ShapeDtypeStruct((T_pad, wk._SUB, G), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, wk._SUB, G), jnp.float32),
        ]
        fn = pl.pallas_call(
            kern,
            grid=(T_pad // K,),
            in_specs=[
                pl.BlockSpec((K, wk._SUB, G), lambda tau: (tau, 0, 0)),
                pl.BlockSpec((K, C), lambda tau: (tau, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((3, C), lambda tau: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((K, wk._SUB, G), lambda tau: (tau, 0, 0)),
                pl.BlockSpec((K, wk._SUB, G), lambda tau: (tau, 0, 0)),
            ],
            out_shape=outs,
            scratch_shapes=[
                pltpu.VMEM((wk._SUB, G), jnp.float32)
                for _ in range(4)
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )
        return lambda: fn(S3, hd, init)

    variants = {
        "plain_nocarry": run_plain,
        "carry_full": run_carry,
        "carry_no_heads": make_variant(True, False),
        "carry_no_ns": make_variant(False, True),
        "carry_no_both": make_variant(True, True),
    }
    for name, fn in variants.items():
        info = {"variant": name, "T": T, "G": G, "K": K}
        try:
            jax.block_until_ready(fn())
            ms, _ = device_ms(fn, n=10)
            info["ms"] = round(ms, 3)
            info["step_us"] = round(ms * 1e3 / T, 3)
            info["ok"] = True
        except Exception as e:  # noqa: BLE001
            info["ok"] = False
            info["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(info), flush=True)


if __name__ == "__main__":
    main()
