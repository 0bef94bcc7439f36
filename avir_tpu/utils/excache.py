"""Bounded executor cache with weakref-safe identity tokens.

The drivers (models/avir.py, models/lancir.py) cache one compiled
executor per (geometry, params, ...) key.  Two hygiene requirements:

  - the cache must be BOUNDED: a long-lived resizer fed many distinct
    geometries (e.g. a thumbnail service) must not grow its executor
    map without limit — eviction is LRU;
  - cache keys for CUSTOM DITHERER callables must be identity-safe
    across garbage collection: ``id(fn)`` can be reused by a new
    callable after ``fn`` is collected, silently hitting a stale
    executor.  ``token()`` hands out a monotonically increasing token
    per live callable, tracked by weak reference, so a recycled id can
    never alias a previous key.

The reference has no analog (its resizer holds one filter bank and the
user manages object lifetime, avir.h:4630-4639); this is hygiene for
the long-lived-service usage mode the TPU framework targets.
"""

from __future__ import annotations

import itertools
import threading
import weakref
from collections import OrderedDict


class ExecutorCache:
    """Thread-safe LRU map from hashable keys to built executors."""

    def __init__(self, maxsize: int = 64):
        self.maxsize = maxsize
        self._map: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self._toks: dict[int, object] = {}  # token -> weakref (or obj)
        self._tok_iter = itertools.count()

    def __len__(self) -> int:
        return len(self._map)

    def get_or_build(self, key, build):
        """Return the cached value for ``key``, building (outside the
        lock is NOT needed — builds are idempotent and rare) and
        LRU-evicting as necessary."""
        with self._lock:
            fn = self._map.get(key)
            if fn is not None:
                self._map.move_to_end(key)
                return fn
        fn = build()
        with self._lock:
            # Another thread may have built concurrently; keep the
            # first entry so all callers share one executor.
            cur = self._map.get(key)
            if cur is not None:
                self._map.move_to_end(key)
                return cur
            self._map[key] = fn
            while len(self._map) > self.maxsize:
                self._map.popitem(last=False)
        return fn

    def token(self, obj) -> int:
        """Identity token for a live callable, safe against id() reuse.

        Tokens are never recycled: a new callable always gets a fresh
        token even if it occupies a collected callable's memory.  The
        callable is tracked by weakref when possible (dead entries are
        pruned by the weakref callback); un-weakreffable callables are
        pinned by a strong reference instead (bounded: one per distinct
        callable still reachable from the token map, pruned when the
        cache itself is cleared)."""
        with self._lock:
            # Iterate a snapshot and prune dead refs HERE, under the
            # lock — a weakref finalizer callback would fire on
            # whatever thread drops the last reference and mutate
            # _toks without (and unable to take) this non-reentrant
            # lock, racing this very iteration.
            found = None
            dead = []
            for tok, ref in list(self._toks.items()):
                target = ref() if isinstance(ref, weakref.ref) else ref
                if target is None:
                    dead.append(tok)
                elif target is obj:
                    found = tok
            for tok in dead:
                del self._toks[tok]
            if found is not None:
                return found
            tok = next(self._tok_iter)
            try:
                self._toks[tok] = weakref.ref(obj)
            except TypeError:  # no __weakref__ slot: pin identity
                self._toks[tok] = obj
            return tok

    def clear(self) -> None:
        with self._lock:
            self._map.clear()
            self._toks.clear()
