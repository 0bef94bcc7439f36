"""ctypes bindings for the native host runtime (native/avir_host.cpp).

Builds the shared library on first use (g++ + zlib, both baked into the
image) and caches it next to the source.  Every entry point has a pure
NumPy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_SRC = pathlib.Path(__file__).parent.parent.parent / "native" / "avir_host.cpp"
_LIB = _SRC.parent / "libavir_host.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (
                not _LIB.exists()
                or _LIB.stat().st_mtime < _SRC.stat().st_mtime
            ):
                subprocess.run(
                    [
                        "g++", "-O2", "-shared", "-fPIC",
                        "-o", str(_LIB), str(_SRC), "-lz",
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.avir_errdiff_dither.restype = ctypes.c_int
            lib.avir_errdiff_dither.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int, ctypes.c_double,
            ]
            lib.avir_png_encode.restype = ctypes.c_int64
            lib.avir_png_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.avir_png_info.restype = ctypes.c_int
            lib.avir_png_info.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.avir_png_decode.restype = ctypes.c_int
            lib.avir_png_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.avir_free.restype = None
            lib.avir_free.argtypes = [ctypes.c_void_p]
            lib.avir_xs128_fill.restype = None
            lib.avir_xs128_fill.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint32,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def have_native() -> bool:
    return _load() is not None


def errdiff_dither(
    img: np.ndarray, trunc_bits: int, out_max: float
) -> np.ndarray:
    """Error-diffusion dither of [H, W, C] float -> quantized float64 in
    [0, out_max].  Exact reference scan semantics (avir.h:4485-4525)."""
    h, w, c = img.shape
    buf = np.ascontiguousarray(img, dtype=np.float64)
    lib = _load()
    if lib is not None:
        rc = lib.avir_errdiff_dither(
            buf.ctypes.data, h, w, c, trunc_bits, float(out_max)
        )
        if rc == 0:
            return buf
    from ..models.host_reference import errdiff_dither as np_errdiff

    return np_errdiff(buf, trunc_bits, out_max)


def xs128_words(n: int, seed: int):
    """n words of the xorshift128 test PRNG (bit-exact vs the golden
    generator and tests/conftest.py), or None without the native lib."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.uint32)
    lib.avir_xs128_fill(out.ctypes.data, n, seed & 0xFFFFFFFF)
    return out


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode [H, W, C] (or [H, W]) uint8/uint16 to PNG bytes."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    if pixels.dtype == np.uint8:
        depth = 8
    elif pixels.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"unsupported dtype {pixels.dtype}")
    lib = _load()
    if lib is None:
        raise RuntimeError("native PNG codec unavailable (no compiler?)")
    buf = np.ascontiguousarray(pixels)
    out = ctypes.c_void_p()
    n = lib.avir_png_encode(
        buf.ctypes.data, w, h, c, depth, ctypes.byref(out)
    )
    if n < 0:
        raise ValueError("PNG encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.avir_free(out)


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes to [H, W, C] uint8/uint16 (C in 1..4)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native PNG codec unavailable (no compiler?)")
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    ch = ctypes.c_int()
    depth = ctypes.c_int()
    rc = lib.avir_png_info(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(ch), ctypes.byref(depth),
    )
    if rc != 0:
        raise ValueError(f"unsupported or invalid PNG (code {rc})")
    dtype = np.uint8 if depth.value == 8 else np.uint16
    out = np.empty((h.value, w.value, ch.value), dtype=dtype)
    rc = lib.avir_png_decode(data, len(data), out.ctypes.data)
    if rc != 0:
        raise ValueError(f"PNG decode failed (code {rc})")
    return out
