"""Persistent plan cache: precomputed tap tables on disk.

The reference amortizes filter design through in-memory bank caching and
parameter-equality early-outs (avir.h:1741-1747, 2693-2714); the TPU
analog is (a) jit's in-process executable cache and (b) this disk cache
of composed banded operators, so warm process starts skip the float64
filter design + composition entirely (~0.5 s for an 8K plan).

Entries are .npz files keyed by a hash of every plan-affecting argument.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
import tempfile
from typing import Optional

import numpy as np

from .compose import BandedOp
from .plan import AxisPlan, ResizePlan, build_resize_plan

_SCALARS = (
    "src_w", "src_h", "new_w", "new_h", "el_count", "use_srgb_gamma",
    "in_gamma_mult", "out_gamma_mult", "alpha_index", "is_in_float",
    "is_out_float", "in_type_max", "out_type_max", "res_bit_depth",
)


def default_cache_dir() -> pathlib.Path:
    return pathlib.Path(
        os.environ.get(
            "AVIR_TPU_CACHE",
            os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "avir_tpu",
            ),
        )
    )


def plan_cache_key(kwargs: dict) -> str:
    blob = json.dumps(
        {k: repr(v) for k, v in sorted(kwargs.items())}, sort_keys=True
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:32]


def save_plan(plan: ResizePlan, path: pathlib.Path) -> None:
    arrays = {}
    meta = {k: getattr(plan, k) for k in _SCALARS}
    for ax in ("h", "v"):
        a: AxisPlan = getattr(plan, ax)
        arrays[f"{ax}_starts"] = a.op.starts
        arrays[f"{ax}_taps"] = a.op.taps
        meta[f"{ax}_n_in"] = a.op.n_in
        meta[f"{ax}_n_out"] = a.op.n_out
        meta[f"{ax}_build_mode"] = a.build_mode
        meta[f"{ax}_k"] = a.k
        meta[f"{ax}_o"] = a.o
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(
                f, meta=json.dumps(meta), **arrays
            )
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_plan(path: pathlib.Path) -> Optional[ResizePlan]:
    try:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            axes = {}
            for ax in ("h", "v"):
                axes[ax] = AxisPlan(
                    op=BandedOp(
                        n_in=int(meta[f"{ax}_n_in"]),
                        n_out=int(meta[f"{ax}_n_out"]),
                        starts=z[f"{ax}_starts"],
                        taps=z[f"{ax}_taps"],
                    ),
                    build_mode=int(meta[f"{ax}_build_mode"]),
                    k=float(meta[f"{ax}_k"]),
                    o=float(meta[f"{ax}_o"]),
                )
        return ResizePlan(
            h=axes["h"], v=axes["v"],
            **{k: meta[k] for k in _SCALARS},
        )
    except (OSError, KeyError, ValueError, json.JSONDecodeError):
        return None


def build_resize_plan_cached(
    *, cache_dir: Optional[os.PathLike] = None, **kwargs
) -> ResizePlan:
    """build_resize_plan with a disk cache (set cache_dir=None to use
    $AVIR_TPU_CACHE or ~/.cache/avir_tpu)."""
    cdir = pathlib.Path(cache_dir) if cache_dir else default_cache_dir()
    path = cdir / f"plan_{plan_cache_key(kwargs)}.npz"
    if path.exists():
        plan = load_plan(path)
        if plan is not None:
            return plan
    plan = build_resize_plan(**kwargs)
    try:
        save_plan(plan, path)
    except OSError:
        pass  # read-only cache dir — stay functional
    return plan
