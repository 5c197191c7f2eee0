"""Two-level derived-value cache — contrib/Core SegmentCache analogue.

The reference caches arbitrary per-reader, per-key values: outer key is
the IndexReader held WEAKLY, inner key a string (commonly a field name),
with ``Warm`` = compute-and-discard and a dead-reference sweep on every
write (src/contrib/Core/Util/Cache/SegmentCache.cs:32-155; the WeakKey
wrapper at :156-190 keys by the reader's identity hash).

Spark-first reading: the values cached here are small driver-side
handles — typically a cached DataFrame lineage for a per-index-generation
derived view (sorted field values, stop sets, bucket tables), never
materialized rows.  The weak outer key is what keeps a long-running
driver from leaking one handle per index generation, the same leak the
engine's ``unpersist_derived`` plugs for its built-in views.
"""

from __future__ import annotations

import threading
import weakref
from typing import Any, Callable, Generic, TypeVar

T = TypeVar("T")


class SegmentCache(Generic[T]):
    """Outer key = index object identity (weak), inner key = string.

    Subclass and override ``create_value`` (the reference's abstract
    CreateValue, SegmentCache.cs:60) or pass a callable."""

    def __init__(self, create_value: Callable[[Any, str], T] | None = None):
        if create_value is not None:
            self.create_value = create_value  # type: ignore[assignment]
        # id(outer) -> (weakref to outer, {inner_key: value}); keyed by
        # identity like the reference's WeakKey hashcode so the outer
        # object needs no __hash__ of its own
        self._cache: dict[int, tuple[weakref.ref, dict[str, T]]] = {}
        self._lock = threading.Lock()

    def create_value(self, index: Any, key: str) -> T:  # pragma: no cover
        raise NotImplementedError("subclass or pass create_value=")

    @property
    def key_count(self) -> int:
        """Live outer keys (SegmentCache.cs:71 KeyCount)."""
        with self._lock:
            return sum(1 for ref, _ in self._cache.values()
                       if ref() is not None)

    def warm(self, index: Any, key: str) -> None:
        """Compute-and-discard (SegmentCache.cs:81-84: Warm calls Get)."""
        self.get(index, key)

    def get(self, index: Any, key: str,
            supplier: Callable[[], T] | None = None) -> T:
        """``supplier`` (optional) overrides create_value for this call —
        the anonymous-DocValues idiom callers use when the computation
        closes over more than (index, key)."""
        oid = id(index)
        with self._lock:
            hit = self._cache.get(oid)
            if hit is not None and hit[0]() is index and key in hit[1]:
                return hit[1][key]
        # compute outside the lock (the reference computes between its
        # read and write lock sections, SegmentCache.cs:92-150)
        val = supplier() if supplier is not None else \
            self.create_value(index, key)
        with self._lock:
            hit = self._cache.get(oid)
            if hit is None or hit[0]() is not index:
                self._cache[oid] = (weakref.ref(index), {key: val})
            elif key not in hit[1]:
                hit[1][key] = val
            else:
                # another thread won the race; keep its value
                val = hit[1][key]
            # yank the gc'd weak references (SegmentCache.cs:137-143)
            dead = [k for k, (ref, _) in self._cache.items()
                    if ref() is None]
            for k in dead:
                del self._cache[k]
        return val
