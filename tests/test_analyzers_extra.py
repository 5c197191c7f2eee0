"""CharTokenizer family + custom-analyzer seam + collector extras
(WhitespaceTokenizer/LetterTokenizer/LowerCaseTokenizer,
src/Lucene.Net/Analysis/{Whitespace,Letter,LowerCase}Tokenizer.cs;
PositiveScoresOnlyCollector; CachingWrapperFilter; AddIndexesNoOptimize)."""

import pytest

from lucenenet_spark.analysis.tokenizers import (
    tokenize_letter, tokenize_lowercase, tokenize_whitespace)
from lucenenet_spark.index.segments import (
    add_indexes, build_segmented_index)
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher


def test_char_tokenizer_family():
    t = "Foo-Bar baz2 QUX"
    assert tokenize_whitespace(t) == [("Foo-Bar", 0), ("baz2", 1), ("QUX", 2)]
    assert tokenize_letter(t) == [("Foo", 0), ("Bar", 1), ("baz", 2), ("QUX", 3)]
    assert tokenize_lowercase(t) == [("foo", 0), ("bar", 1), ("baz", 2), ("qux", 3)]
    assert tokenize_whitespace(None) == []


def test_whitespace_analyzer_index_is_case_sensitive(spark):
    docs = spark.createDataFrame(
        [(0, "Foo bar"), (1, "foo bar"), (2, "FOO baz")],
        "doc_id long, text string")
    idx = build_segmented_index(spark, docs, text_col="text",
                                field_name="text",
                                analyzer=tokenize_whitespace)
    s = Searcher(idx)
    assert {r["doc_id"] for r in s.search(ast.Term("foo"), 10).collect()} == {1}
    assert {r["doc_id"] for r in s.search(ast.Term("Foo"), 10).collect()} == {0}
    # the standard chain would have conflated all three
    std = build_segmented_index(spark, docs, text_col="text",
                                field_name="text")
    assert {r["doc_id"] for r in
            Searcher(std).search(ast.Term("foo"), 10).collect()} == {0, 1, 2}


def test_positive_scores_only_collector(spark):
    docs = spark.createDataFrame(
        [(0, "x y", -5), (1, "x z", 3)], "doc_id long, text string, v long")
    idx = build_segmented_index(spark, docs, text_col="text",
                                field_name="text")
    s = Searcher(idx)
    q = ast.CustomScore(ast.Term("x"), ("v",))  # negative for doc 0
    allhits = s.search(q, 10).collect()
    pos = s.search(q, 10, positive_only=True).collect()
    assert {r["doc_id"] for r in allhits} == {0, 1}
    assert {r["doc_id"] for r in pos} == {1}


def test_cached_filter_memo(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} common") for i in range(9)],
        "doc_id long, text string")
    idx = build_segmented_index(spark, docs, text_col="text",
                                field_name="text")
    s = Searcher(idx)
    f1 = s.cached_filter(ast.Prefix("tok0"))
    f2 = s.cached_filter(ast.Prefix("tok0"))
    assert f1 is f2  # memoized per query value
    assert {r["doc_id"] for r in f1.collect()} == {0, 3, 6}


def test_add_indexes_no_optimize(spark):
    a_docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string")
    b_docs = spark.createDataFrame(
        [(10, "alpha delta"), (11, "delta gamma")], "doc_id long, text string")
    both = a_docs.unionByName(b_docs)
    a = build_segmented_index(spark, a_docs, text_col="text",
                              field_name="text")
    b = build_segmented_index(spark, b_docs, text_col="text",
                              field_name="text")
    merged = add_indexes(a, b)
    fresh = build_segmented_index(spark, both, text_col="text",
                                  field_name="text")
    assert merged.n_docs == fresh.n_docs == 4
    assert merged.avgdl == pytest.approx(fresh.avgdl)
    for q in (ast.Term("alpha"), ast.Term("gamma"),
              ast.Bool(should=(ast.Term("alpha"), ast.Term("delta")))):
        x = [tuple(r) for r in Searcher(merged).search(q, 10).collect()]
        y = [tuple(r) for r in Searcher(fresh).search(q, 10).collect()]
        assert x == y, q
    # seg_ids were rebased: no collision between the two source indexes
    assert merged.segments.select("seg_id").distinct().count() >= 2


def test_mapping_char_filter():
    from lucenenet_spark.analysis.charfilter import (
        MappingCharFilter, mapping_analyzer)

    f = MappingCharFilter({"&": " and ", "ph": "f", "œ": "oe"})
    assert f("AT&T graphs œuvre") == "AT and T grafs oeuvre"
    assert f(None) is None
    # longest match wins over a shorter prefix
    g = MappingCharFilter({"a": "x", "ab": "y"})
    assert g("ab a") == "y x"
    an = mapping_analyzer({"&": " and "})
    assert an("cats & dogs") == [("cats", 0), ("dogs", 2)]  # 'and' = stopword hole


def test_mapping_char_filter_index(spark):
    from lucenenet_spark.analysis.charfilter import mapping_analyzer

    an = mapping_analyzer({"ph": "f"})
    docs = spark.createDataFrame(
        [(0, "the photo graph"), (1, "foto fans")],
        "doc_id long, text string")
    idx = build_segmented_index(spark, docs, text_col="text",
                                field_name="text", analyzer=an)
    s = Searcher(idx)
    hits = {r["doc_id"] for r in s.search(ast.Term("foto"), 10).collect()}
    assert hits == {0, 1}


def test_time_limiting_collector(spark):
    from lucenenet_spark.plans.lowering import TimeExceededError
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    docs = with_doc_ids(corpus_df(spark, 400, partitions=4),
                        ("repo", "path"))
    idx = build_segmented_index(spark, docs, text_col="content",
                                field_name="content")
    s = Searcher(idx)
    q = ast.Term("index", field="content")
    # generous budget: identical to the plain collector
    rows = s.search_with_timeout(q, 10, timeout_sec=120.0)
    assert [tuple(r) for r in rows] == [
        tuple(r) for r in s.search(q, 10).collect()]
    # impossible budget: aborts with the reference's exception analogue
    with pytest.raises(TimeExceededError):
        s.search_with_timeout(q, 10, timeout_sec=0.001)
    # the searcher is still usable after a cancelled group
    assert len(s.search(q, 10).collect()) == 10
