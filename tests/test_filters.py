"""Filter-design layer tests against golden data dumped from the compiled
reference library."""

import numpy as np
import pytest

from conftest import load_golden, xorshift128_fill

from avir_tpu.filters import (
    FirEq,
    FracFilterBank,
    calc_fir_response,
    lanczos_filter,
    normalize_fir,
    peaked_cosine_lpf,
    peaked_cosine_window,
)
from avir_tpu.filters.lanczos import FRAC_COUNT, LanczosBank


def test_prng_matches_reference_harness():
    got = xorshift128_fill((64,), np.uint8, 42)
    ref = load_golden("prng_check")
    np.testing.assert_array_equal(got, (ref >> 24).astype(np.uint8))


def test_peaked_cosine_window():
    ref = load_golden("f_window")
    got = peaked_cosine_window(4.76449, 24.5, 25)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)

    ref2 = load_golden("f_window2")
    got2 = peaked_cosine_window(1.0, 7.3, 8)
    np.testing.assert_allclose(got2, ref2, rtol=0, atol=1e-9)


def test_peaked_cosine_lpf():
    ref = load_golden("f_lpf_norm")
    got = peaked_cosine_lpf(9.2, 1.3, 4.76449, dc_gain=1.0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)

    ref_raw = load_golden("f_lpf_raw")
    got_raw = peaked_cosine_lpf(9.2, 1.3, 4.76449, dc_gain=0.0)
    np.testing.assert_allclose(got_raw, ref_raw, rtol=0, atol=1e-9)

    ref_hb = load_golden("f_lpf_hb")
    got_hb = peaked_cosine_lpf(
        24.0, np.pi * 0.46437 * 2.0, 1.94609, dc_gain=1.0
    )
    np.testing.assert_allclose(got_hb, ref_hb, rtol=0, atol=1e-9)


def test_fir_eq():
    bins = 1.0 + 0.5 * np.sin(np.arange(65) * 0.3)

    eq = FirEq(2.0, 6.4262, 65, 0.0, 1.0, False, 0.97946)
    meta = load_golden("f_eq_meta")
    assert eq.filter_len == meta[0]
    assert eq.latency == meta[1]
    got = eq.build_filter(bins)
    np.testing.assert_allclose(got, load_golden("f_eq"), rtol=0, atol=1e-9)

    eq2 = FirEq(2.0 * 0.31, 7.0, 65, 0.0, 0.31, False, 1.2)
    got2 = eq2.build_filter(bins)
    np.testing.assert_allclose(
        got2, load_golden("f_eq_bw"), rtol=0, atol=1e-9
    )


def test_fir_response_against_eq_design():
    # The EQ filter's measured response should roughly track the requested
    # band gains in the controllable range (approximate by design).
    bins = 1.0 + 0.3 * np.sin(np.arange(65) * 0.08)
    eq = FirEq(2.0, 30.0, 65, 0.0, 1.0, False, 1.2)
    flt = eq.build_filter(bins)
    for j in [5, 20, 40]:
        th = np.pi * j / 64
        re, im = calc_fir_response(flt, th, fltlat=eq.latency)
        mag = np.hypot(re, im)
        assert abs(mag - bins[j]) < 0.05


def test_normalize_fir():
    taps = np.array([1.0, 2.0, 3.0])
    out = normalize_fir(taps, 2.0)
    assert abs(out.sum() - 2.0) < 1e-15


@pytest.mark.parametrize(
    "name,frac_count,order,base_len,cutoff,alpha,ids",
    [
        ("f_bank_o1", 10, 1, 18.0 / 0.7, 0.7372 * 0.7, 6.41341, [0, 3, 9]),
        ("f_bank_o0", 44, 0, 18.0, 0.7372, 6.41341, [0, 21, 43]),
    ],
)
def test_frac_filter_bank(name, frac_count, order, base_len, cutoff, alpha, ids):
    meta = load_golden(name + "_meta")
    bank = FracFilterBank(frac_count, order, base_len, cutoff, alpha)
    assert bank.filter_len == meta[0]
    ref = load_golden(name)
    for row, i in enumerate(ids):
        if order == 1:
            np.testing.assert_allclose(
                bank.filters[i], ref[row, 0], rtol=0, atol=2e-7
            )
            np.testing.assert_allclose(
                bank.deltas[i], ref[row, 1], rtol=0, atol=2e-7
            )
        else:
            np.testing.assert_allclose(
                bank.filters[i], ref[row], rtol=0, atol=2e-7
            )


def test_frac_filter_bank_ext():
    meta = load_golden("f_bank_ext_meta")
    ext = peaked_cosine_lpf(6.0, 2.2, 4.0, dc_gain=2.0)
    bank = FracFilterBank(10, 1, 18.0, 0.7372, 6.41341, ext_filter=ext)
    assert bank.filter_len == meta[0]
    ref = load_golden("f_bank_ext")
    for row, i in enumerate([0, 5, 9]):
        np.testing.assert_allclose(
            bank.filters[i], ref[row, 0], rtol=0, atol=2e-6
        )
        np.testing.assert_allclose(
            bank.deltas[i], ref[row, 1], rtol=0, atol=2e-6
        )


@pytest.mark.parametrize(
    "name,la,k,fracs",
    [
        ("f_lanc_k17", 3.0, 1.7, [0.0, 0.37, 0.5, 1.0]),
        ("f_lanc_k08", 2.0, 0.8, [0.0, 0.25, 0.662, 1.0]),
    ],
)
def test_lanczos_filters(name, la, k, fracs):
    meta = load_golden(name + "_meta")
    ref = load_golden(name)
    bank = LanczosBank(la, k)
    assert bank.kernel_len == meta[0]
    for row, x in enumerate(fracs):
        got = bank.filter_for_frac(x)
        np.testing.assert_allclose(got, ref[row], rtol=0, atol=3e-7)


def test_lanczos_dc_gain():
    for d in [0.0, 0.123, 0.5, 0.999, 1.0]:
        flt = lanczos_filter(3.0, 2.3, d)
        assert abs(flt.sum(dtype=np.float64) - 1.0) < 1e-6
