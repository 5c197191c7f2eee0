"""Randomized positional-operator stress: a seeded random corpus and a
bank of sloppy-phrase / span queries, engine vs the pure-Python oracle
(QueryUtils.Check-style consistency discipline, SURVEY §5, but with
value-exact top-k instead of iterator laws)."""

import random

import pytest

from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.oracle.pybm25 import OracleIndex
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _mk_docs(seed=1234, n=60):
    rng = random.Random(seed)
    return [(i, " ".join(rng.choice(VOCAB)
                         for _ in range(rng.randint(3, 25))))
            for i in range(n)]


DOCS = _mk_docs()


@pytest.fixture(scope="module")
def engines(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_segmented_index(spark, docs, text_col="text",
                                field_name="text")
    oi = OracleIndex()
    for i, t in DOCS:
        oi.add(i, {"text": t})
    return Searcher(idx), oi


def _qbank(seed=77):
    rng = random.Random(seed)
    qs = []
    for _ in range(6):
        terms = tuple(rng.sample(VOCAB, rng.randint(2, 4)))
        qs.append(ast.Phrase(terms, slop=rng.randint(0, 4)))
    for _ in range(6):
        leaves = tuple(ast.SpanTerm(t) for t in
                       rng.sample(VOCAB, rng.randint(2, 3)))
        qs.append(ast.SpanNear(leaves, slop=rng.randint(0, 5),
                               in_order=rng.random() < 0.5))
    qs.append(ast.SpanNot(
        ast.SpanNear((ast.SpanTerm("alpha"), ast.SpanTerm("beta")), slop=3),
        ast.SpanTerm("gamma")))
    qs.append(ast.SpanFirst(ast.SpanOr(
        (ast.SpanTerm("delta"), ast.SpanTerm("eps"))), end=5))
    return qs


@pytest.mark.parametrize("qi", range(14))
def test_random_positional_query(engines, qi):
    s, oi = engines
    q = _qbank()[qi]
    got = [(r["doc_id"], r["score"]) for r in s.search(q, 15).collect()]
    want = oi.top_k(q, 15)
    assert got == want, f"{q}: {got[:4]} != {want[:4]}"
