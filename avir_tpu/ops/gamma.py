"""sRGB gamma conversion.

Reimplements the reference's polynomial approximations of pow(x, 2.4) and
pow(x, 1/2.4) (avir.h:162-196) so that gamma-corrected outputs match the
reference at integer-output tolerance.  The uint8 fast-path LUT of the
reference (avir.h:231-289) is these same approximations tabulated, so no
separate table is needed.

Both NumPy (host spec) and jnp (device) variants are provided; the device
variant is pure elementwise math that XLA fuses into adjacent kernels.
"""

from __future__ import annotations

import numpy as np


def _pow24_srgb(x):
    """Approximation of x**2.4 for x in ~[0.09, 1] (avir.h:162-174)."""
    x2 = x * x
    x3 = x2 * x
    x4 = x2 * x2
    return (
        0.0985766365536824
        + 0.839474952656502 * x2
        + 0.363287814061725 * x3
        - 0.0125559718896615 / (0.12758338921578 + 0.290283465468235 * x)
        - 0.231757513261358 * x
        - 0.0395365717969074 * x4
    )


def _pow24i_srgb(x, sqrt):
    """Approximation of x**(1/2.4) for x in ~[0.003, 1]
    (avir.h:185-196)."""
    sx = sqrt(x)
    ssx = sqrt(sx)
    sssx = sqrt(ssx)
    return (
        0.000213364515060263
        + 0.0149409239419218 * x
        + 0.433973412731747 * sx
        + ssx
        * (
            0.659628181609715 * sssx
            - 0.0380957908841466
            - 0.0706476137208521 * sx
        )
    )


def srgb_to_linear_np(s: np.ndarray, alpha_index: int = -1) -> np.ndarray:
    """convertSRGB2Lin (avir.h:208-220); s pre-scaled to [0, 1].

    alpha_index 0 or 3 bypasses the conversion for that channel of
    4-channel data (linear scaling only)."""
    lin = np.where(
        s <= 0.04045, s / 12.92, _pow24_srgb((s + 0.055) / 1.055)
    )
    if alpha_index in (0, 3) and s.ndim >= 1 and s.shape[-1] == 4:
        lin = lin.copy()
        lin[..., alpha_index] = s[..., alpha_index]
    return lin


def linear_to_srgb_np(s: np.ndarray, alpha_index: int = -1) -> np.ndarray:
    """convertLin2SRGB (avir.h:299-310)."""
    # The approximation branch only applies above 0.0031308; clamp its
    # argument so the unselected branch never evaluates sqrt of a
    # negative value.
    srgb = np.where(
        s <= 0.0031308,
        12.92 * s,
        1.055 * _pow24i_srgb(np.maximum(s, 0.0031308), np.sqrt) - 0.055,
    )
    if alpha_index in (0, 3) and s.ndim >= 1 and s.shape[-1] == 4:
        srgb = srgb.copy()
        srgb[..., alpha_index] = s[..., alpha_index]
    return srgb


def srgb_to_linear_jnp(s, alpha_index: int = -1):
    import jax.numpy as jnp

    lin = jnp.where(
        s <= 0.04045, s / 12.92, _pow24_srgb((s + 0.055) / 1.055)
    )
    if alpha_index in (0, 3) and s.ndim >= 1 and s.shape[-1] == 4:
        lin = lin.at[..., alpha_index].set(s[..., alpha_index])
    return lin


def linear_to_srgb_jnp(s, alpha_index: int = -1):
    import jax.numpy as jnp

    srgb = jnp.where(
        s <= 0.0031308,
        12.92 * s,
        1.055 * _pow24i_srgb(jnp.maximum(s, 0.0031308), jnp.sqrt) - 0.055,
    )
    if alpha_index in (0, 3) and s.ndim >= 1 and s.shape[-1] == 4:
        srgb = srgb.at[..., alpha_index].set(s[..., alpha_index])
    return srgb


def srgb_to_linear_2d(x, c: int, alpha_index: int = -1):
    """2-D variant: x is [rows, W*C] interleaved; the alpha channel (for
    4-channel data, index 0 or 3) bypasses conversion via a lane mask —
    keeps the device array in its clean 2-D layout."""
    import jax.numpy as jnp

    lin = jnp.where(
        x <= 0.04045, x / 12.92, _pow24_srgb((x + 0.055) / 1.055)
    )
    if alpha_index in (0, 3) and c == 4:
        mask = (jnp.arange(x.shape[1]) % c) == alpha_index
        lin = jnp.where(mask[None, :], x, lin)
    return lin


def linear_to_srgb_2d(x, c: int, alpha_index: int = -1):
    import jax.numpy as jnp

    srgb = jnp.where(
        x <= 0.0031308,
        12.92 * x,
        1.055 * _pow24i_srgb(jnp.maximum(x, 0.0031308), jnp.sqrt) - 0.055,
    )
    if alpha_index in (0, 3) and c == 4:
        mask = (jnp.arange(x.shape[1]) % c) == alpha_index
        srgb = jnp.where(mask[None, :], x, srgb)
    return srgb
