"""Full-size FR/DR/PE table dump — the frtest.cpp equivalent.

Prints the same tab-separated table as the reference harness
(/root/reference/other/frtest.cpp:171-251): freq/Nyquist, FR dB, DR dB,
PE dB over 128 log-spaced frequencies, each aggregated over the x0.95
k-factor sweep.

Usage:
  python tools/frtest.py [avir|lancir] [up|down] [--fast]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from avir_tpu.metrology import measure  # noqa: E402


def main() -> int:
    algo = "avir"
    upsample = True
    fast = False
    for a in sys.argv[1:]:
        if a in ("avir", "lancir"):
            algo = a
        elif a == "up":
            upsample = True
        elif a == "down":
            upsample = False
        elif a == "--fast":
            fast = True
        else:
            print(__doc__)
            return 2

    kwargs = (
        dict(n_freqs=32, src_w=4096, k_step=0.85)
        if fast
        else dict(n_freqs=128, src_w=1024 * 16, k_step=0.95)
    )
    name = ("AVIR" if algo == "avir" else "Lanc3") + (
        "-up" if upsample else "-down"
    )
    print(f"\t{name} FR\t{name} DR\t{name} PE")
    t = measure(algo=algo, upsample=upsample, **kwargs)
    for f, fr, dr, pe in t:
        print(f"{f:.6f}\t{fr:.6f}\t{dr:.6f}\t{pe:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
