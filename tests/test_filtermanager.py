"""FilterManager: canonical instance per equal filter, touch-refreshed
oldest-first eviction bounded at cache_clean_size."""

from __future__ import annotations

from lucenenet_spark.plans import ast
from lucenenet_spark.plans.filtermanager import FilterManager


def test_canonical_instance():
    fm = FilterManager()
    a = ast.Prefix("se", field="content")
    b = ast.Prefix("se", field="content")
    assert a is not b and a == b
    assert fm.get_filter(a) is a
    assert fm.get_filter(b) is a  # equal filter -> FIRST instance


def test_eviction_oldest_first():
    fm = FilterManager(cache_clean_size=3)
    f = [ast.Term(f"t{i}") for i in range(4)]
    for x in f[:3]:
        fm.get_filter(x)
    fm.get_filter(f[0])          # touch refreshes f0's timestamp
    fm.get_filter(f[3])          # overflow -> evict oldest (f1)
    assert len(fm) == 3
    assert fm.get_filter(ast.Term("t0")) is f[0]   # survived (touched)
    assert fm.get_filter(ast.Term("t1")) is not f[1]  # evicted, re-cached


def test_singleton():
    assert FilterManager.instance() is FilterManager.instance()
