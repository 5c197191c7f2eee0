"""NearSpansOrdered walk: kernel (functions/spanwalk.py) vs the
independent bisect re-derivation (oracle/pybm25.ordered_spans_ref),
golden cases traced from the reference's own doc comments, and the
engine end-to-end on repeated-term corpora."""

import random

import pytest

from lucenenet_spark.functions.spanwalk import ordered_spans
from lucenenet_spark.oracle.pybm25 import ordered_spans_ref


def w1(*positions):
    return [(p, p + 1) for p in sorted(positions)]


def _walk(lists, slop):
    return [(s, e) for s, e, _ in ordered_spans(lists, slop)]


def test_reference_doc_example():
    # NearSpansOrdered.cs:35-43: "t1 t2 t1 t3 t2 t3" with slop >= 1
    # matches twice: t1@0..t3@3 and t1@2..t3@5
    lists = [w1(0, 2), w1(1, 4), w1(3, 5)]
    assert _walk(lists, 1) == [(0, 4), (2, 6)]
    # slop 0: both matches have one intervening position -> no match
    assert _walk(lists, 0) == []


def test_repeats_shrink_to_tightest():
    # doc "a a b": tuples give (0,3) and (1,3); the walk shrinks to the
    # tightest and advances past it -> only (1, 3)
    assert _walk([w1(0, 1), w1(2)], 5) == [(1, 3)]


def test_adjacent_pair_and_chosen_starts():
    out = ordered_spans([w1(0), w1(1)], 0)
    assert out == [(0, 2, (0, 1))]


def test_overlap_adds_no_slop():
    # wider sub-spans may overlap; only non-overlapping gaps count
    # (NearSpansOrdered.cs:408-412)
    lists = [[(0, 3)], [(2, 4)]]
    assert _walk(lists, 0) == [(0, 4)]


def test_fuzz_kernel_vs_independent_ref():
    rng = random.Random(20260817)
    for trial in range(3000):
        n = rng.randint(2, 4)
        slop = rng.randint(0, 4)
        lists = []
        for _ in range(n):
            k = rng.randint(1, 6)
            ps = sorted(rng.sample(range(0, 14), k))
            lists.append(w1(*ps))
        got = _walk([list(c) for c in lists], slop)
        want = ordered_spans_ref([list(c) for c in lists], slop)
        assert got == want, (trial, lists, slop, got, want)


def test_fuzz_wide_spans():
    # nested SpanNear clauses produce wide spans; fuzz those too
    rng = random.Random(7)
    for trial in range(1500):
        n = rng.randint(2, 3)
        slop = rng.randint(0, 5)
        lists = []
        for _ in range(n):
            spans = set()
            for _ in range(rng.randint(1, 5)):
                s = rng.randint(0, 10)
                spans.add((s, s + rng.randint(1, 3)))
            lists.append(sorted(spans))
        got = _walk([list(c) for c in lists], slop)
        want = ordered_spans_ref([list(c) for c in lists], slop)
        assert got == want, (trial, lists, slop, got, want)


def test_walk_is_subset_of_tuples():
    # every walk match satisfies the tuple spec's order+slop bound
    rng = random.Random(99)
    for _ in range(500):
        lists = [w1(*sorted(rng.sample(range(12), rng.randint(1, 5))))
                 for _ in range(rng.randint(2, 3))]
        slop = rng.randint(0, 4)
        tuples = set()
        import itertools
        for tup in itertools.product(*lists):
            if any(tup[i][0] < tup[i - 1][1] for i in range(1, len(tup))):
                continue
            s0 = min(t[0] for t in tup)
            e0 = max(t[1] for t in tup)
            if (e0 - s0) - sum(t[1] - t[0] for t in tup) <= slop:
                tuples.add((s0, e0))
        for s, e in _walk(lists, slop):
            assert (s, e) in tuples


# "a" is in the English stop set (analysis/tokenizers.py) so repeated-term
# docs use non-stopword tokens aa/bb/xx
_REPEAT_DOCS = [
    (0, "aa aa bb xx"),
    (1, "t1 t2 t1 t3 t2 t3"),
    (2, "aa bb aa bb"),
    (3, "aa xx bb aa bb"),
]


@pytest.fixture(scope="module")
def repeat_index(spark):
    from lucenenet_spark.index.segments import build_segmented_index
    docs = _REPEAT_DOCS
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return build_segmented_index(spark, df, text_col="text",
                                 id_col="doc_id", field_name="text")


def test_engine_walk_end_to_end(spark, repeat_index):
    """Spark lucene-spec spans == pybm25 oracle on repeated-term docs."""
    from lucenenet_spark.oracle.pybm25 import OracleIndex
    from lucenenet_spark.plans import ast
    from lucenenet_spark.plans.lowering import Searcher

    oi = OracleIndex()
    for d, t in _REPEAT_DOCS:
        oi.add(d, {"text": t})
    for q in [
        ast.SpanNear((ast.SpanTerm("aa"), ast.SpanTerm("bb")), slop=1),
        ast.SpanNear((ast.SpanTerm("t1"), ast.SpanTerm("t2"),
                      ast.SpanTerm("t3")), slop=1),
        ast.SpanNear((ast.SpanTerm("aa"), ast.SpanTerm("bb")), slop=0),
    ]:
        got = {r.doc_id: r.score for r in
               Searcher(repeat_index).search(q, 10).collect()}
        want = {d: round(s, 6) for d, s in oi.top_k(q, 10)}
        assert got.keys() == want.keys(), (q, got, want)
        assert got, q  # non-vacuous: stopword-free fixture must match
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=2e-6), (q, d)


def test_engine_specs_diverge_on_repeats(spark, repeat_index):
    """Divergence witness: all_tuples counts the loose (0,3) span in
    "aa aa bb", the reference walk does not."""
    from lucenenet_spark.plans import ast
    from lucenenet_spark.plans.lowering import Searcher
    qa = ast.SpanNear((ast.SpanTerm("aa"), ast.SpanTerm("bb")), slop=1,
                      spec="all_tuples")
    ql = ast.SpanNear((ast.SpanTerm("aa"), ast.SpanTerm("bb")), slop=1)
    sa = {r.doc_id: r.score for r in
          Searcher(repeat_index).search(qa, 10).collect()}
    sl = {r.doc_id: r.score for r in
          Searcher(repeat_index).search(ql, 10).collect()}
    assert sa[0] > sl[0]  # extra tuple -> higher freq for doc 0
