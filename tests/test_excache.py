"""Executor-cache hygiene (utils/excache.py, VERDICT r2 item 7):
bounded LRU eviction and GC-safe custom-ditherer identity tokens
(``id()`` can be recycled after collection; tokens can not)."""

import gc
import threading

import numpy as np

from avir_tpu.utils.excache import ExecutorCache


def test_lru_eviction_order():
    c = ExecutorCache(maxsize=3)
    built = []

    def mk(k):
        def build():
            built.append(k)
            return f"v{k}"
        return build

    for k in range(3):
        assert c.get_or_build(k, mk(k)) == f"v{k}"
    assert len(c) == 3 and built == [0, 1, 2]

    # touch 0 so 1 becomes LRU, then insert 3 -> 1 evicted
    assert c.get_or_build(0, mk(0)) == "v0"
    assert built == [0, 1, 2]  # hit, not rebuilt
    c.get_or_build(3, mk(3))
    assert len(c) == 3
    assert c.get_or_build(0, mk(0)) == "v0" and built == [0, 1, 2, 3]
    c.get_or_build(1, mk(1))  # rebuilt: was evicted
    assert built == [0, 1, 2, 3, 1]


def test_concurrent_build_single_winner():
    c = ExecutorCache(maxsize=8)
    barrier = threading.Barrier(4)
    results = []

    def build():
        return object()  # distinct per call

    def worker():
        barrier.wait()
        results.append(c.get_or_build("k", build))

    ts = [threading.Thread(target=worker) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len({id(r) for r in results}) == 1  # all share one entry


def test_tokens_stable_and_distinct():
    c = ExecutorCache()

    def f1(img, tb, om, seed):
        return img

    def f2(img, tb, om, seed):
        return img

    t1, t2 = c.token(f1), c.token(f2)
    assert t1 != t2
    assert c.token(f1) == t1  # stable for a live callable


def test_tokens_not_recycled_after_gc():
    """A collected callable's token is pruned; a NEW callable — even
    one reusing the dead callable's id() — gets a fresh token, so a
    stale executor can never be hit (the failure mode of id()-keys)."""
    c = ExecutorCache()

    def mk():
        def f(img, tb, om, seed):
            return img
        return f

    f = mk()
    t_old = c.token(f)
    del f
    gc.collect()
    t_new = c.token(mk())
    assert t_new > t_old  # fresh, monotonic — never recycled
    # dead entry pruned (reaped in-lock from the death queue)
    assert t_old not in {tok for tok, _ in c._toks.values()}


def test_token_lookup_is_o1_for_live_callables():
    """token() must not scan all live tokens per call (ADVICE r3): with
    many registered callables, a repeat lookup touches only the
    id-indexed entry."""
    c = ExecutorCache()
    fns = []

    def mk(i):
        def f(img, tb, om, seed):
            return img + i
        return f

    for i in range(500):
        fns.append(mk(i))
        c.token(fns[-1])
    toks = [c.token(f) for f in fns]
    assert len(set(toks)) == 500
    assert all(c.token(f) == t for f, t in zip(fns, toks))


def test_driver_custom_dither_keys_survive_gc():
    """End-to-end: two successive (dead-then-new) custom ditherers on
    ImageResizer produce two distinct cache entries."""
    from avir_tpu.models.avir import ImageResizer

    rz = ImageResizer()
    src = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(16, 12, 3)

    def mk(bias):
        def d(img, trunc_bits, out_max, rnd_seed):
            return np.clip(np.floor(img + bias), 0, out_max)
        return d

    d1 = mk(0.25)
    rz.resize(src, 8, 8, dither=d1)
    n1 = len(rz._cache)
    del d1
    gc.collect()
    rz.resize(src, 8, 8, dither=mk(0.75))
    assert len(rz._cache) == n1 + 1  # distinct executor, no stale hit
