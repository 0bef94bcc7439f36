"""Test configuration.

Tests prefer a virtual 8-device CPU backend so sharding paths can be
exercised without TPU pod hardware.  In environments where a TPU plugin
was eagerly registered at interpreter start (sitecustomize), these env
settings are too late and the suite runs single-device on the real chip —
mesh tests are therefore isolated in tests/mesh/ and launched by
test_mesh.py in a subprocess with a sanitized environment.
"""

import os

if not os.environ.get("AVIR_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import json
import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden" / "data"


@pytest.fixture(scope="session")
def golden_manifest():
    with open(GOLDEN_DIR / "manifest.json") as f:
        return json.load(f)


def load_golden(name: str) -> np.ndarray:
    return np.load(GOLDEN_DIR / f"{name}.npy")


def xorshift128_fill(shape, dtype, seed: int) -> np.ndarray:
    """Bit-exact mirror of the golden generator's XS128 PRNG
    (tests/golden/src/gen_golden.cpp).  Uses the native C stream when
    available (the Python loop costs ~9 min for a 16K source); the
    pure-Python fallback below is the specification both are tested
    against."""
    n = int(np.prod(shape))
    try:
        from avir_tpu.native import xs128_words

        bits = xs128_words(n + 16, seed)
    except Exception:
        bits = None
    if bits is not None:
        bits = bits[16:]
        return _xs_map(bits, shape, dtype)
    M = 0xFFFFFFFF
    x = (123456789 ^ ((seed * 2654435761) & M)) & M
    y = (362436069 ^ ((seed * 0x9E3779B9) & M)) & M
    z = (521288629 + seed) & M
    w = (88675123 ^ ((seed << 7) & M)) & M

    out = np.empty(n + 16, dtype=np.uint32)
    for i in range(n + 16):
        t = (x ^ ((x << 11) & M)) & M
        x, y, z = y, z, w
        w = (w ^ (w >> 19) ^ t ^ (t >> 8)) & M
        out[i] = w
    bits = out[16:]
    return _xs_map(bits, shape, dtype)


def _xs_map(bits, shape, dtype):

    if dtype == np.uint8:
        return (bits >> 24).astype(np.uint8).reshape(shape)
    if dtype == np.uint16:
        return (bits >> 16).astype(np.uint16).reshape(shape)
    if dtype == np.float32:
        return (bits.astype(np.float64) / 4294967296.0).astype(
            np.float32
        ).reshape(shape)
    if dtype == np.float64:
        return (bits.astype(np.float64) / 4294967296.0).reshape(shape)
    raise ValueError(dtype)


def psnr(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(peak * peak / mse)
