"""FR/DR/PE property tests (frtest methodology, SURVEY.md §4).

Asserts the reference's published quality characteristics
(/root/reference/README.md:378-404) on the TPU pipeline:
  - AVIR's frequency response is flat through the passband;
  - two-way-resize dynamic range is high at low frequencies and
    degrades toward Nyquist (aliasing-limited);
  - AVIR's round-trip dynamic range beats Lanczos-3 (LANCIR) at low
    frequencies.
Sizes are reduced vs the reference harness (16384x12, 128 freqs) to
keep CI fast; the avir_tpu.metrology API exposes the full-size sweep.
"""

import numpy as np
import pytest

from avir_tpu.metrology import fr_dr_pe_at, k_sweep, make_grating, measure


@pytest.fixture(scope="module")
def avir_up():
    return measure(
        algo="avir", upsample=True, n_freqs=6, src_w=2048, k_step=0.7
    )


@pytest.fixture(scope="module")
def lancir_up():
    return measure(
        algo="lancir", upsample=True, n_freqs=6, src_w=2048, k_step=0.7
    )


def test_avir_fr_flat_passband(avir_up):
    passband = avir_up[avir_up[:, 0] <= 0.6]
    assert len(passband) >= 4
    assert np.abs(passband[:, 1]).max() <= 0.15, passband


def test_avir_dr_high_at_low_freq(avir_up):
    low = avir_up[avir_up[:, 0] <= 0.1]
    assert (low[:, 2] <= -70.0).all(), low
    assert (low[:, 3] <= -55.0).all(), low


def test_avir_dr_degrades_toward_nyquist(avir_up):
    assert avir_up[-1, 2] > avir_up[0, 2] + 20.0


def test_avir_beats_lancir_dr(avir_up, lancir_up):
    low_a = avir_up[avir_up[:, 0] <= 0.2][:, 2]
    low_l = lancir_up[lancir_up[:, 0] <= 0.2][:, 2]
    assert (low_a <= low_l - 8.0).all(), (low_a, low_l)


def test_downsample_dr():
    t = measure(
        algo="avir", upsample=False, n_freqs=3, src_w=2048, k_step=0.7,
        size_coeff=0.4,
    )
    low = t[t[:, 0] <= 0.1]
    assert (low[:, 2] <= -60.0).all(), t


def test_grating_properties():
    g = make_grating(512, 4, np.pi * 0.25)
    assert abs(float(g.mean())) < 1e-6
    assert abs(float((g.astype(np.float64) ** 2).mean()) - 1.0) < 1e-6


def test_k_sweep_matches_reference():
    ks = k_sweep(0.3, 0.95, True)
    assert ks[0] == 1.0
    assert all(k > 0.3 for k in ks)
    assert len(ks) == 24  # 0.95**23 > 0.3 > 0.95**24


def test_preset_quality_ordering():
    """White-noise round-trip RMS reproduces the published preset
    linearity ordering (avir.h preset score comments):
    Ultra < High < Def < Low < LR < ULR."""
    from avir_tpu.metrology import whitenoise_roundtrip_rms

    scores = [
        whitenoise_roundtrip_rms(p, size=(192, 192), k=1.4142)
        for p in ["ultra", "high", "def", "low", "lr", "ulr"]
    ]
    assert all(
        a < b for a, b in zip(scores, scores[1:])
    ), scores


# ---------------------------------------------------------------------
# Full-fidelity published tables (docs/frtest_*.tsv): the comparison
# artifacts are regenerated with tools/frtest.py at the reference
# harness's full settings (128 freqs, 16384 px, x0.95 sweep,
# frtest.cpp:21-24,222-241).  These tests (a) gate the tables'
# quality characteristics far tighter than the fast CI sweep above and
# (b) re-measure sampled rows at the exact full settings so a stale or
# wrongly-regenerated artifact fails CI.

import pathlib

DOCS = pathlib.Path(__file__).parent.parent / "docs"
FULL = dict(n_freqs=128, src_w=16384, k_step=0.95)


def _table(name):
    t = np.loadtxt(DOCS / f"frtest_{name}.tsv", skiprows=1)
    assert t.shape == (FULL["n_freqs"], 4), t.shape
    return t


def test_full_tables_quality_gates():
    au, ad = _table("avir_up"), _table("avir_down")
    lu, ld = _table("lanc3_up"), _table("lanc3_down")
    # AVIR FR flatness (the reference's headline claim,
    # README.md:378-404) — 0.05 dB through half Nyquist upsampling,
    # 0.05 dB through two thirds of the downsampling passband.
    assert np.abs(au[au[:, 0] <= 0.5][:, 1]).max() <= 0.08
    assert np.abs(ad[ad[:, 0] <= 0.2][:, 1]).max() <= 0.05
    # Lanczos-3 is measurably less flat at the band edge.
    assert np.abs(lu[lu[:, 0] <= 0.5][:, 1]).max() >= 0.10
    # Round-trip dynamic range: AVIR >= 20 dB better at low freqs.
    for a, l in ((au, lu), (ad, ld)):
        la = a[a[:, 0] <= 0.1][:, 2]
        ll = l[l[:, 0] <= 0.1][:, 2]
        assert la.max() <= -65.0 and la.max() <= ll.max() - 18.0
    # Aliasing limits DR toward Nyquist (README.md:401-404).
    assert au[-1, 2] >= au[0, 2] + 30.0


@pytest.mark.parametrize(
    "algo,name,upsample", [("avir", "avir_up", True),
                           ("lancir", "lanc3_down", False)]
)
def test_full_tables_fresh_spotcheck(algo, name, upsample):
    """Re-measure two sampled rows of the published table at the full
    settings; the artifact must match the live pipeline."""
    import math

    import avir_tpu
    from avir_tpu.metrology import fr_dr_pe_at, k_sweep, make_grating

    t = _table(name)
    if algo == "avir":
        rz = avir_tpu.ImageResizer(res_bit_depth=16)

        def resize_fn(img, w, h, k):
            return rz.resize(img, w, h, k=-k)

    else:
        lz = avir_tpu.LancIR()

        def resize_fn(img, w, h, k):
            return lz.resize(img, w, h, kx=-k, ky=-k)

    ks = k_sweep(0.3, FULL["k_step"], upsample)
    for j in (16, 100):
        f = t[j, 0]
        src = make_grating(FULL["src_w"], 12, math.pi * f)
        fr, dr, pe = fr_dr_pe_at(resize_fn, src, ks)
        assert abs(fr - t[j, 1]) <= 0.05, (j, fr, t[j])
        assert abs(dr - t[j, 2]) <= 1.0, (j, dr, t[j])
        assert abs(pe - t[j, 3]) <= 2.0, (j, pe, t[j])
