"""Render the FR/DR comparison plots from the measured frtest tables.

Reproduces the reference's README comparison artifacts
(/root/reference/other/_fr_up.png, _dr_up.png; methodology
/root/reference/other/frtest.cpp) from the tables produced by
``tools/frtest.py`` (docs/frtest_*.tsv): frequency response and
two-way-resize dynamic range, AVIR default preset vs Lanczos-3
(the LANCIR algorithm), measured on this framework's device pipelines.

Usage: python tools/frtest_plots.py  (writes docs/fr_{up,down}.png,
docs/dr_{up,down}.png)
"""

import os
import sys

import numpy as np

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs")

# Reference-instance categorical palette, slots 1-2 (validated
# blue/orange pair); text/grid wear neutral ink tokens.
C_AVIR = "#2a78d6"
C_LANC = "#eb6834"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e4e3df"
SURFACE = "#fcfcfb"


def _load(name):
    path = os.path.join(DOCS, name)
    data = np.loadtxt(path, skiprows=1)
    return data[:, 0], data[:, 1], data[:, 2], data[:, 3]


def _style(ax, title, ylabel):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=10)
    ax.set_xlabel("normalized frequency (×Nyquist)", color=INK2, fontsize=9)
    ax.set_ylabel(ylabel, color=INK2, fontsize=9)
    ax.set_xscale("log")
    ax.grid(True, which="major", color=GRID, linewidth=0.6)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=8)


def _plot(out, title, ylabel, fa, y_avir, fl, y_lanc):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=140)
    fig.patch.set_facecolor(SURFACE)
    _style(ax, title, ylabel)
    ax.plot(fa, y_avir, color=C_AVIR, linewidth=2.0, label="AVIR (Def)")
    ax.plot(fl, y_lanc, color=C_LANC, linewidth=2.0, label="Lanczos-3")
    # Direct labels at the geometric midpoint of each table's span
    # (a fixed frequency would sit at the axis edge for the
    # downsampling sweeps); clamp keeps short tables in range.
    def _mid_idx(f):
        mid = float(np.sqrt(f[0] * f[-1]))
        return min(np.searchsorted(f, mid), len(f) - 1)

    ia, il = _mid_idx(fa), _mid_idx(fl)
    ax.annotate("AVIR", (fa[ia], y_avir[ia]), textcoords="offset points",
                xytext=(6, 8), color=C_AVIR, fontsize=9, fontweight="bold")
    ax.annotate("Lanczos-3", (fl[il], y_lanc[il]), textcoords="offset points",
                xytext=(6, -14), color=C_LANC, fontsize=9, fontweight="bold")
    leg = ax.legend(loc="lower left", fontsize=8, frameon=False)
    for t in leg.get_texts():
        t.set_color(INK2)
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    plt.close(fig)
    print("wrote", out)


def main():
    for direction in ("up", "down"):
        fa, fr_a, dr_a, _pe_a = _load(f"frtest_avir_{direction}.tsv")
        fl, fr_l, dr_l, _pe_l = _load(f"frtest_lanc3_{direction}.tsv")
        arrow = "upsampling" if direction == "up" else "downsampling"
        _plot(
            os.path.join(DOCS, f"fr_{direction}.png"),
            f"Frequency response, {arrow} sweep (0 dB = transparent)",
            "response (dB)", fa, fr_a, fl, fr_l,
        )
        _plot(
            os.path.join(DOCS, f"dr_{direction}.png"),
            f"Two-way resize error, {arrow} sweep (lower = better)",
            "round-trip RMS error (dB)", fa, dr_a, fl, dr_l,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
