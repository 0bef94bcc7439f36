"""LANCIR driver: the fast Lanczos resize path.

TPU-native equivalent of ``avir::CLancIR::resizeImage``
(/root/reference/lancir.h:386-713).  Unlike the reference object (which
is explicitly NOT thread-safe, lancir.h:319-324), this driver only holds
immutable cached plans/executors and is safe to share.
"""

from __future__ import annotations

import numpy as np

from ..plan.lancir_plan import build_lancir_plan
from ..utils.excache import ExecutorCache
from .runtime import make_lancir_executor


class LancIR:
    def __init__(self):
        # Bounded LRU executor cache (see utils/excache.py).
        self._cache = ExecutorCache(maxsize=64)

    def resize(
        self,
        src: np.ndarray,
        new_w: int,
        new_h: int,
        kx: float = 0.0,
        ky: float = 0.0,
        ox: float = 0.0,
        oy: float = 0.0,
        la: float = 3.0,
        out_dtype=None,
        precision: str = "auto",
        out: np.ndarray | None = None,
    ) -> np.ndarray:
        """Lanczos resize of ``src`` ([H, W, C] or [H, W]).

        ``out``: optional preallocated destination, possibly a strided
        view (the reference's NewBuf + NewSSize output contract,
        lancir.h:260-307); written through its strides and returned.

        ``kx``/``ky``: 0 = auto scale with centering; >0 = given scale
        with centering; <0 = |k| without centering (lancir.h:430-457).
        ``la``: Lanczos window size, >= 2 (lancir.h:291-307).
        ``precision``: "auto" / "exact" / "fast" device tiers, or
        "f64" — true double-precision compute on the host oracle (the
        reference's T=double instantiation, lancir.h:386-390).
        """
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
            # Degenerate source: blank output (cf. lancir.h:392-425's
            # argument validation / early-outs).
            out = np.zeros((new_h, new_w, ch), dtype=out_dtype)
            return out[:, :, 0] if squeeze else out

        key = (
            sw, sh, new_w, new_h, ch, src.dtype.str, out_dtype.str,
            kx, ky, ox, oy, la, precision,
        )
        def build():
            plan = build_lancir_plan(
                sw, sh, new_w, new_h, ch, src.dtype, out_dtype,
                kx=kx, ky=ky, ox=ox, oy=oy, la=la,
            )
            if precision == "f64":
                from .host_reference import execute_lancir_numpy

                def fn(src3, _plan=plan):
                    return execute_lancir_numpy(_plan, src3)

                # zero-copy strided-view input (the reference's
                # SrcSSize stride contract, lancir.h:260-307)
                fn.host_3d = True
                return fn
            return make_lancir_executor(plan, precision=precision)

        fn = self._cache.get_or_build(key, build)
        arg = src if getattr(fn, "host_3d", False) else src.reshape(
            sh, sw * ch
        )
        res = np.asarray(fn(arg)).reshape(new_h, new_w, ch)
        if res.dtype != out_dtype:
            # float64 round-trip (reference templates on T = double,
            # lancir.h:386-390): f32 device compute, dtype preserved.
            res = res.astype(out_dtype)
        res = res[:, :, 0] if squeeze else res
        if out is not None:
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
        """Resize a batch [N, H, W, C] of same-shape frames in one
        device program (vmapped pipeline) — the TPU-native form of the
        reference's video batching, where one stateful CLancIR object
        reuses its buffers across frames (lancir.h:319-324)."""
        import jax

        batch = np.asarray(batch)
        if batch.ndim != 4:
            raise ValueError("batch must be [N, H, W, C]")
        n, sh, sw, ch = batch.shape
        out_dtype = np.dtype(kwargs.get("out_dtype") or batch.dtype)
        if kwargs.get("precision") == "f64":
            return np.stack(
                [self.resize(im, new_w, new_h, **kwargs) for im in batch]
            )
        key = (
            "batch", n, sw, sh, new_w, new_h, ch, batch.dtype.str,
            out_dtype.str,
            kwargs.get("kx", 0.0), kwargs.get("ky", 0.0),
            kwargs.get("ox", 0.0), kwargs.get("oy", 0.0),
            kwargs.get("la", 3.0), kwargs.get("precision", "auto"),
        )
        def build():
            plan = build_lancir_plan(
                sw, sh, new_w, new_h, ch, batch.dtype, out_dtype,
                kx=kwargs.get("kx", 0.0), ky=kwargs.get("ky", 0.0),
                ox=kwargs.get("ox", 0.0), oy=kwargs.get("oy", 0.0),
                la=kwargs.get("la", 3.0),
            )
            single = make_lancir_executor(
                plan, precision=kwargs.get("precision", "auto"),
                split_lanes=False,  # vmapped: see ImageResizer
            )
            return jax.jit(jax.vmap(single))

        fn = self._cache.get_or_build(key, build)
        flat = batch.reshape(n, sh, sw * ch)
        out = np.asarray(fn(flat)).reshape(n, new_h, new_w, ch)
        if out.dtype != out_dtype:
            out = out.astype(out_dtype)  # float64 round-trip
        return out


def lancir_resize(
    src: np.ndarray, new_w: int, new_h: int, **kwargs
) -> np.ndarray:
    """One-shot LANCIR resize (see LancIR.resize)."""
    return LancIR().resize(src, new_w, new_h, **kwargs)


def make_lancir_resize_fn(
    src_shape,
    in_dtype,
    new_w: int,
    new_h: int,
    kx: float = 0.0,
    ky: float = 0.0,
    ox: float = 0.0,
    oy: float = 0.0,
    la: float = 3.0,
    out_dtype=None,
    precision: str = "auto",
    engine: str = "auto",
    flat: bool = False,
):
    """Traceable LANCIR resize [H, W, C] -> [new_h, new_w, C] (or 2-D
    grayscale) for in-graph use — the Lanczos-path counterpart of
    ``make_resize_fn`` (see models/avir.py, incl. the layout note on
    ``flat``)."""
    from .avir import _traceable_wrapper

    squeeze = len(src_shape) == 2
    sh, sw = src_shape[0], src_shape[1]
    ch = 1 if squeeze else src_shape[2]
    in_dtype = np.dtype(in_dtype)
    out_dt = np.dtype(out_dtype) if out_dtype is not None else in_dtype
    plan = build_lancir_plan(
        sw, sh, new_w, new_h, ch, in_dtype, out_dt,
        kx=kx, ky=ky, ox=ox, oy=oy, la=la,
    )
    run = make_lancir_executor(
        plan, precision=precision, engine=engine, split_lanes=False
    )
    return _traceable_wrapper(
        run, src_shape, sh, sw, ch, new_w, new_h, squeeze, flat
    )
