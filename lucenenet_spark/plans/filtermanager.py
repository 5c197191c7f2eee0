"""FilterManager — canonical filter instances with bounded cache
(src/Lucene.Net/Search/FilterManager.cs:29-106).

The reference keeps a singleton map hashcode -> (filter, timestamp) so
equal filters used by many searchers resolve to ONE instance (its
motivation is RMI marshalling; ours is driver-side plan reuse: one
canonical AST object means CachingWrapperFilter keys,
cached_span_filter_result repr keys, and Searcher._filter_cache entries
all coalesce).  The FilterCleaner thread (FilterManager.cs:152-196)
sorts entries oldest-first and evicts down to ``cache_clean_size`` when
the map grows past it — here that pass runs inline at insert time, which
is deterministic on a driver and needs no daemon.

Timestamps are a monotonic insertion/touch counter, not wall-clock: the
eviction ORDER is what the reference's timestamps encode, and a counter
encodes it reproducibly.
"""

from __future__ import annotations

import threading

DEFAULT_CACHE_CLEAN_SIZE = 100  # FilterManager.cs:44


class FilterManager:
    """Process-wide singleton (FilterManager.Instance,
    FilterManager.cs:58-66); instantiable directly for tests."""

    _instance: "FilterManager | None" = None
    _instance_lock = threading.Lock()

    def __init__(self, cache_clean_size: int = DEFAULT_CACHE_CLEAN_SIZE):
        self.cache_clean_size = cache_clean_size
        self._clock = 0
        self._cache: dict = {}  # filter -> [canonical, last_touch]
        self._lock = threading.Lock()

    @classmethod
    def instance(cls) -> "FilterManager":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def set_cache_size(self, value: int) -> None:
        """FilterManager.SetCacheSize (FilterManager.cs:85)."""
        self.cache_clean_size = value

    def __len__(self) -> int:
        return len(self._cache)

    def get_filter(self, f):
        """The canonical instance of an equal filter
        (FilterManager.GetFilter, FilterManager.cs:106-124): a hit
        refreshes the entry's timestamp and returns the FIRST instance
        ever cached; a miss inserts and may trigger the clean pass.
        Filters are the frozen AST nodes — hashable by value."""
        with self._lock:
            self._clock += 1
            hit = self._cache.get(f)
            if hit is not None:
                hit[1] = self._clock
                return hit[0]
            self._cache[f] = [f, self._clock]
            if len(self._cache) > self.cache_clean_size:
                self._clean()
            return f

    def _clean(self) -> None:
        """Oldest-first eviction down to cache_clean_size (the
        FilterCleaner sort-and-remove pass, FilterManager.cs:176-196)."""
        excess = len(self._cache) - self.cache_clean_size
        if excess <= 0:
            return
        oldest = sorted(self._cache.items(), key=lambda kv: kv[1][1])
        for key, _ in oldest[:excess]:
            del self._cache[key]
