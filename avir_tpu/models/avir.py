"""AVIR pipeline driver: the public resize API.

TPU-native equivalent of ``avir::CImageResizer<>::resizeImage``
(/root/reference/avir.h:4609-5092): the constructor fixes bit depths and
the quality preset; ``resize`` plans (host, cached) and executes (device,
jitted) a full H+V resize with optional sub-pixel shift, sRGB gamma and
dithering.  Unlike the reference the object IS safe to reuse concurrently
— plans and compiled executors are immutable once built.
"""

from __future__ import annotations

import numpy as np

from ..params import PARAMS_DEF, Params
from ..plan.plan import build_resize_plan
from ..utils.excache import ExecutorCache
from .runtime import make_avir_executor


def _host_executor(plan, sh, sw, ch, dither, rnd_seed=0):
    """Float64 host-oracle executor (the public precision="f64" /
    engine="host" route): NumPy double-precision compute end to end,
    the reference's fptype=double mode (avir.h:4569-4592).  Error
    diffusion runs through the native serial scan when available;
    callable ``dither`` is the custom-ditherer slot (see
    ImageResizer.resize).

    Takes the [H, W, C] array DIRECTLY (possibly a strided view of a
    larger buffer — the reference's SrcScanlineSize contract,
    avir.h:4680-4692) and never copies the input."""
    from .host_reference import execute_plan_numpy

    custom = callable(dither)
    # All errdiff spellings run the native serial scan on the host
    # engine (the f64 route has no device to put a wavefront on).
    errdiff = dither in (
        "errdiff", "errdiff-device", "errdiff-wavefront"
    )

    def run(src3):
        if (not errdiff and not custom) or plan.is_out_float:
            return execute_plan_numpy(src=src3, plan=plan)
        pre = execute_plan_numpy(plan, src3, return_predither=True)
        out_bits = 8 if plan.out_type_max == 255.0 else 16
        trunc_bits = out_bits - plan.res_bit_depth
        out_dt = np.uint8 if out_bits == 8 else np.uint16
        if custom:
            return np.asarray(
                dither(pre, trunc_bits, plan.out_type_max, rnd_seed)
            ).astype(out_dt)
        from .. import native

        out = native.errdiff_dither(pre, trunc_bits, plan.out_type_max)
        return out.astype(out_dt)

    run.host_3d = True  # driver passes [H, W, C] without flattening
    return run


class ImageResizer:
    """Image resizer with a fixed quality preset and output bit depth.

    Mirrors the constructor contract of the reference
    (avir.h:4630-4639): ``res_bit_depth`` is the significant output bit
    depth (8 or 16, or lower for dithered low-bit output),
    ``src_bit_depth`` defaults to it.
    """

    def __init__(
        self,
        res_bit_depth: int = 8,
        src_bit_depth: int = 0,
        params: Params = PARAMS_DEF,
        plan_cache: bool = False,
    ):
        self.res_bit_depth = res_bit_depth
        self.src_bit_depth = src_bit_depth
        self.params = params
        self.plan_cache = plan_cache
        # Bounded LRU (a long-lived resizer fed many geometries must
        # not grow executors without limit) with weakref-safe custom-
        # ditherer identity tokens (id() can be recycled after GC).
        self._cache = ExecutorCache(maxsize=64)

    def _executor(self, key, build):
        return self._cache.get_or_build(key, build)

    def resize(
        self,
        src: np.ndarray,
        new_w: int,
        new_h: int,
        k: float = 0.0,
        ox: float = 0.0,
        oy: float = 0.0,
        out_dtype=None,
        use_srgb_gamma: bool = False,
        alpha_index: int = -1,
        dither: str = "default",
        build_mode: int = -1,
        precision: str = "auto",
        rnd_seed: int = 0,
        engine: str = "auto",
        out: np.ndarray | None = None,
    ) -> np.ndarray:
        """Resize ``src`` ([H, W, C] or [H, W]) to new_w x new_h.

        ``out``: optional preallocated destination of the output shape
        and dtype — may be a strided view of a larger buffer (the
        reference's NewBuf + NewSSize output-stride contract,
        avir.h:4680-4692, lancir.h:260-307); the result is written into
        it through its strides and returned.

        ``k``: 0 = auto per-axis scale with centering; >0 = uniform scale
        with centering; <0 = |k| without centering (avir.h:4709-4736).
        ``ox``/``oy``: sub-pixel shift in source pixels.
        ``dither``: "default" (round+clamp), "errdiff" (error
        diffusion via the on-device anti-diagonal wavefront scan — the
        measured winner at every output size, tools/probe_errdiff.py /
        tools/probe_wavefront.py; the native host serial scan remains
        the engine="host" / precision="f64" path and the semantics
        oracle the wavefront is tested against), "errdiff-device"
        (sequential
        nested lax.scan, exact scan-order float semantics; slow for
        large images — the recurrence is serial, as in the reference's
        single-threaded dither stage, avir.h:5047-5068),
        "errdiff-wavefront" (force the wavefront scan), or a CUSTOM
        CALLABLE ``fn(img, trunc_bits, out_max, rnd_seed) -> array``
        — the extension slot the reference exposes as the fpclass
        ditherer template parameter (avir.h:4569-4592): ``img`` is the
        float64 [new_h, new_w, C] image after gamma-out, and the
        callable returns the quantized image (any dtype castable to
        the output dtype).
        ``rnd_seed`` mirrors CImageResizerVars.RndSeed
        (avir.h:2533-2535), passed through to custom ditherers; like
        the reference's shipped ditherers, the built-in ones are
        deterministic and ignore it.
        ``precision``: "auto" / "exact" / "fast" device tiers (see
        models/runtime.py), or "f64" — true double-precision compute on
        the host oracle, the reference's fptype=double mode
        (avir.h:4569-4592; TPUs have no f64 units, so this runs the
        NumPy float64 pipeline).  ``engine``: "auto" / "pallas" /
        "xla" device engines, or "host" (implied by precision="f64").
        Returns a NumPy array in the output dtype.
        """
        if precision == "f64":
            engine = "host"
        src = np.asarray(src)
        squeeze = src.ndim == 2
        if squeeze:
            src = src[:, :, None]
        sh, sw, ch = src.shape
        if out_dtype is None:
            out_dtype = src.dtype
        out_dtype = np.dtype(out_dtype)

        if new_w <= 0 or new_h <= 0:
            raise ValueError("target size must be positive")
        if sw == 0 or sh == 0:
            out = np.zeros((new_h, new_w, ch), dtype=out_dtype)
            return out[:, :, 0] if squeeze else out

        import os

        custom_dither = callable(dither)
        key = (
            sw, sh, new_w, new_h, ch, src.dtype.str, out_dtype.str,
            k, ox, oy, use_srgb_gamma, alpha_index,
            # custom ditherers cache per callable identity — weakref-
            # safe token, never recycled (utils/excache.py)
            self._cache.token(dither) if custom_dither else dither,
            rnd_seed if custom_dither else 0,
            build_mode, precision, engine,
            # routing env knob participates in executor identity
            os.environ.get("AVIR_TPU_GAMMA_ROUTE", "auto"),
        )

        # Error-diffusion routing (measured, tools/probe_errdiff.py):
        # "errdiff" runs the on-device anti-diagonal WAVEFRONT scan
        # (ops/dither.py) — the winner at every output size over the
        # native host scan (which would add a device->host transfer of
        # the f32 pre-dither image); "errdiff-device" keeps the
        # sequential nested scan (exact scan-order float semantics).
        # Float outputs ignore dither (nothing to quantize, as in the
        # reference).
        wavefront = dither == "errdiff-wavefront" or (
            dither == "errdiff" and out_dtype.kind != "f"
        )

        def build():
            plan_kwargs = dict(
                src_w=sw, src_h=sh, new_w=new_w, new_h=new_h,
                el_count=ch, in_dtype=src.dtype, out_dtype=out_dtype,
                k=k, ox=ox, oy=oy, params=self.params,
                res_bit_depth=self.res_bit_depth,
                src_bit_depth=self.src_bit_depth,
                use_srgb_gamma=use_srgb_gamma,
                alpha_index=alpha_index,
                build_mode=build_mode,
            )
            if self.plan_cache:
                from ..plan.cache import build_resize_plan_cached

                plan = build_resize_plan_cached(**plan_kwargs)
            else:
                plan = build_resize_plan(**plan_kwargs)
            if engine == "host":
                return _host_executor(
                    plan, sh, sw, ch, dither, rnd_seed
                )
            use_custom = custom_dither and out_dtype.kind != "f"
            fn = make_avir_executor(
                plan,
                errdiff=(dither == "errdiff-device") or wavefront,
                errdiff_impl="wavefront" if wavefront else "scan",
                precision=precision,
                return_predither=use_custom,
                engine=engine,
            )
            if not use_custom:
                return fn

            out_bits = 8 if out_dtype.itemsize == 1 else 16
            out_max = float((1 << out_bits) - 1)
            trunc_bits = out_bits - self.res_bit_depth

            # Custom-ditherer slot (the reference's fpclass ditherer
            # template parameter, avir.h:4569-4592).
            def run(x):
                pre = np.asarray(fn(x), dtype=np.float64).reshape(
                    new_h, new_w, ch
                )
                return np.asarray(
                    dither(pre, trunc_bits, out_max, rnd_seed)
                ).astype(out_dtype)

            return run

        fn = self._executor(key, build)
        # The host engine consumes the (possibly strided) [H, W, C]
        # view as-is — zero-copy window resizing, the reference's
        # SrcScanlineSize contract (avir.h:4680-4692).  Device engines
        # flatten to the executors' [H, W*C] layout (a copy only for
        # non-contiguous views; the device transfer packs anyway).
        arg = src if getattr(fn, "host_3d", False) else src.reshape(
            sh, sw * ch
        )
        res = np.asarray(fn(arg)).reshape(new_h, new_w, ch)
        if res.dtype != out_dtype:
            # float64 round-trip (the reference's fptype=double mode,
            # avir.h:4569-4592): device compute is float32 — TPUs have
            # no f64 units — but the API preserves the dtype.
            res = res.astype(out_dtype)
        res = res[:, :, 0] if squeeze else res
        if out is not None:
            # NewBuf/NewSSize output contract: write through the
            # destination's strides (may be a view of a larger buffer).
            if out.shape != res.shape:
                raise ValueError(
                    f"out shape {out.shape} != result {res.shape}"
                )
            np.copyto(out, res, casting="same_kind")
            return out
        return res


    def resize_batch(
        self,
        batch: np.ndarray,
        new_w: int,
        new_h: int,
        **kwargs,
    ) -> np.ndarray:
        """Resize a batch [N, H, W, C] of same-shape images in one
        device program (vmapped pipeline) — the serving-path analog of
        the reference's per-call reuse for video batching
        (lancir.h:319-324).  Error diffusion stays ON DEVICE via the
        vmapped anti-diagonal wavefront scan (ops/dither.py); only
        custom-callable ditherers (host code) run per image."""
        import jax

        batch = np.asarray(batch)
        if batch.ndim != 4:
            raise ValueError("batch must be [N, H, W, C]")
        n, sh, sw, ch = batch.shape
        if callable(kwargs.get("dither")):
            # host custom-ditherer stages run per image
            return np.stack(
                [self.resize(im, new_w, new_h, **kwargs) for im in batch]
            )
        probe = batch[0]
        import os

        # Normalized scalar key (mirrors resize()): dtype spellings
        # collapse via np.dtype().str and unhashable kwargs can't leak
        # in (each field is read out explicitly).
        out_dtype = np.dtype(kwargs.get("out_dtype") or batch.dtype)
        key = (
            "batch", n, sw, sh, new_w, new_h, ch, batch.dtype.str,
            out_dtype.str,
            kwargs.get("k", 0.0), kwargs.get("ox", 0.0),
            kwargs.get("oy", 0.0),
            kwargs.get("use_srgb_gamma", False),
            kwargs.get("alpha_index", -1),
            kwargs.get("dither", "default"),
            kwargs.get("build_mode", -1),
            kwargs.get("precision", "auto"),
            kwargs.get("engine", "auto"),
            os.environ.get("AVIR_TPU_GAMMA_ROUTE", "auto"),
        )

        def build():
            single = self._single_executor(probe, new_w, new_h, **kwargs)
            return jax.jit(jax.vmap(single))

        flat = batch.reshape(n, sh, sw * ch)
        out = np.asarray(self._executor(key, build)(flat)).reshape(
            n, new_h, new_w, ch
        )
        out_dtype = np.dtype(kwargs.get("out_dtype") or batch.dtype)
        if out.dtype != out_dtype:
            out = out.astype(out_dtype)  # float64 round-trip
        return out

    def _single_executor(self, src, new_w, new_h, **kwargs):
        """Build (uncached) the jitted single-image executor for the
        config implied by (src, kwargs)."""
        out_dtype = np.dtype(kwargs.get("out_dtype") or src.dtype)
        plan = build_resize_plan(
            src.shape[1], src.shape[0], new_w, new_h, src.shape[2],
            src.dtype, out_dtype,
            k=kwargs.get("k", 0.0), ox=kwargs.get("ox", 0.0),
            oy=kwargs.get("oy", 0.0), params=self.params,
            res_bit_depth=self.res_bit_depth,
            src_bit_depth=self.src_bit_depth,
            use_srgb_gamma=kwargs.get("use_srgb_gamma", False),
            alpha_index=kwargs.get("alpha_index", -1),
            build_mode=kwargs.get("build_mode", -1),
        )
        dither = kwargs.get("dither", "default")
        return make_avir_executor(
            plan, precision=kwargs.get("precision", "auto"),
            engine=kwargs.get("engine", "auto"),
            # in-graph error diffusion: "errdiff" batches via the
            # vmappable wavefront scan (the auto-route winner at every
            # size, tools/probe_errdiff.py)
            errdiff=dither in (
                "errdiff", "errdiff-device", "errdiff-wavefront"
            ),
            errdiff_impl=(
                "scan" if dither == "errdiff-device" else "wavefront"
            ),
            # vmapped below: the aliased out_init assembly can't
            # carry a batch dim — split_lanes=False selects the
            # vmap-safe compact+concat lane split when profitable
            split_lanes=False,
        )


def resize(src: np.ndarray, new_w: int, new_h: int, **kwargs) -> np.ndarray:
    """One-shot resize with the default preset (see ImageResizer.resize).

    Extra keyword arguments ``params``, ``res_bit_depth`` and
    ``src_bit_depth`` configure the resizer itself.
    """
    rz = ImageResizer(
        res_bit_depth=kwargs.pop("res_bit_depth", 8),
        src_bit_depth=kwargs.pop("src_bit_depth", 0),
        params=kwargs.pop("params", PARAMS_DEF),
    )
    return rz.resize(src, new_w, new_h, **kwargs)


def _traceable_wrapper(run, src_shape, sh, sw, ch, new_w, new_h,
                       squeeze, flat):
    """Shared [H, W, C]/[H, W*C] <-> executor adapter for the traceable
    factories (make_resize_fn / make_lancir_resize_fn)."""
    import jax.numpy as jnp

    expect = (sh, sw * ch) if flat else tuple(src_shape)

    def fn(x):
        x = jnp.asarray(x)
        if x.shape != expect:
            raise ValueError(
                f"expected input shape {expect}, got {x.shape}"
            )
        out = run(x.reshape(sh, sw * ch))
        if flat:
            return out
        out = out.reshape(new_h, new_w, ch)
        return out[:, :, 0] if squeeze else out

    return fn


def make_resize_fn(
    src_shape,
    in_dtype,
    new_w: int,
    new_h: int,
    out_dtype=None,
    k: float = 0.0,
    ox: float = 0.0,
    oy: float = 0.0,
    params: Params = PARAMS_DEF,
    res_bit_depth: int = 8,
    src_bit_depth: int = 0,
    use_srgb_gamma: bool = False,
    alpha_index: int = -1,
    dither: str = "default",
    build_mode: int = -1,
    precision: str = "auto",
    engine: str = "auto",
    flat: bool = False,
):
    """Build a TRACEABLE resize function [H, W, C] -> [new_h, new_w, C]
    (or [H, W] -> [new_h, new_w]) for in-graph use: the returned
    callable takes and returns jax arrays and composes under the
    caller's own ``jax.jit`` / ``vmap`` / ``shard_map`` — e.g. fused
    into a serving or input pipeline.  The reference has no analog
    (its entry point is a host call, avir.h:4680); this is the
    TPU-native equivalent of linking the resizer into a larger
    program.

    LAYOUT NOTE: if the returned fn is the OUTERMOST jitted program,
    a channels-minor [H, W, C] input is committed to the device with
    the C axis padded to the 128-lane tile (C=3 -> ~42x the HBM).
    Inside a larger program XLA folds the reshape away, but when the
    resize is the whole program pass ``flat=True`` to make fn speak
    the executors' native flat [H, W*C] -> [new_h, new_w*C] contract
    instead (zero padding waste).

    ``dither``: "default", "errdiff" (the in-graph wavefront scan —
    fully traceable and vmappable), "errdiff-wavefront" (same), or
    "errdiff-device" (the sequential nested scan); the host-scan route
    and custom callables are not traceable.
    """
    from ..plan.plan import build_resize_plan
    from .runtime import make_avir_executor

    if dither not in (
        "default", "errdiff", "errdiff-wavefront", "errdiff-device"
    ):
        raise ValueError(
            "traceable resize supports dither='default', 'errdiff',"
            " 'errdiff-wavefront' or 'errdiff-device'"
        )
    squeeze = len(src_shape) == 2
    sh, sw = src_shape[0], src_shape[1]
    ch = 1 if squeeze else src_shape[2]
    in_dtype = np.dtype(in_dtype)
    out_dt = np.dtype(out_dtype) if out_dtype is not None else in_dtype
    plan = build_resize_plan(
        sw, sh, new_w, new_h, ch, in_dtype, out_dt,
        k=k, ox=ox, oy=oy, params=params,
        res_bit_depth=res_bit_depth, src_bit_depth=src_bit_depth,
        use_srgb_gamma=use_srgb_gamma, alpha_index=alpha_index,
        build_mode=build_mode,
    )
    run = make_avir_executor(
        plan,
        errdiff=(dither != "default"),
        errdiff_impl=(
            "scan" if dither == "errdiff-device" else "wavefront"
        ),
        precision=precision,
        engine=engine,
        # traceable fns compose under the caller's vmap: the aliased
        # out_init assembly can't carry a batch dim, so this selects
        # the vmap-safe compact+concat lane split when profitable
        split_lanes=False,
    )
    return _traceable_wrapper(
        run, src_shape, sh, sw, ch, new_w, new_h, squeeze, flat
    )
