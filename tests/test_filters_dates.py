"""contrib BooleanFilter algebra, collated TermRange, and QueryParser
date ranges (DateTools resolutions)."""

import pytest

from lucenenet_spark.index.segments import build_segmented_index
from lucenenet_spark.plans import ast
from lucenenet_spark.plans.lowering import Searcher
from lucenenet_spark.queryparser import datetools as dt
from lucenenet_spark.queryparser.parser import QueryParser

DOCS = [
    (0, "stream batch merge", "cafe", "20240105"),
    (1, "stable vector merge", "café", "20240120"),
    (2, "batch vector scan", "caffz", "20240215"),
    (3, "stream merge scan", "dog", "20231231"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, word string, date string")
    return build_segmented_index(
        spark, df, text_col="text", id_col="doc_id", field_name="text",
        keyword_cols={"word": "word", "date": "date"})


def _ids(frame):
    return sorted(r.doc_id for r in frame.collect())


# ---- BooleanFilter (src/contrib/Queries/BooleanFilter.cs)

def test_boolean_filter_should_union(spark, idx):
    f = ast.BooleanFilter(should=(ast.Term("stream"), ast.Term("scan")))
    assert _ids(Searcher(idx).search(f, 10)) == [0, 2, 3]


def test_boolean_filter_must_intersect(spark, idx):
    f = ast.BooleanFilter(must=(ast.Term("merge"), ast.Term("stream")))
    assert _ids(Searcher(idx).search(f, 10)) == [0, 3]


def test_boolean_filter_only_must_not_is_all_minus(spark, idx):
    # BooleanFilter.GetDocIdSet missing-bits path: base = all docs
    f = ast.BooleanFilter(must_not=(ast.Term("vector"),))
    assert _ids(Searcher(idx).search(f, 10)) == [0, 3]


def test_boolean_filter_composed(spark, idx):
    f = ast.BooleanFilter(should=(ast.Prefix("st"), ast.Term("scan")),
                          must=(ast.Term("merge"),),
                          must_not=(ast.Term("vector"),))
    assert _ids(Searcher(idx).search(f, 10)) == [0, 3]


def test_filtered_query_with_boolean_filter(spark, idx):
    q = ast.Filtered(ast.Term("merge"),
                     ast.BooleanFilter(must_not=(ast.Term("vector"),)))
    got = Searcher(idx).search(q, 10).collect()
    assert sorted(r.doc_id for r in got) == [0, 3]
    # scored like the inner query, not constant
    assert all(r.score > 0 and r.score != 1.0 for r in got)


def test_boolean_filter_constant_score(spark, idx):
    f = ast.BooleanFilter(should=(ast.Term("scan"),), boost=2.5)
    got = Searcher(idx).search(f, 10).collect()
    assert {r.doc_id: r.score for r in got} == {2: 2.5, 3: 2.5}


# ---- collated TermRange (TermRangeTermEnum.cs:35 collator seam)

def test_term_range_collated_folded(spark, idx):
    raw = ast.TermRange("cafe", "cafg", field="word")
    # codepoint compare excludes the accented term
    assert _ids(Searcher(idx).search(raw, 10)) == [0, 2]
    coll = ast.TermRange("cafe", "cafg", field="word", collation="folded")
    assert _ids(Searcher(idx).search(coll, 10)) == [0, 1, 2]


def test_term_range_unknown_collation_raises(spark, idx):
    with pytest.raises(NotImplementedError):
        Searcher(idx).search(
            ast.TermRange("a", "b", field="word", collation="tr_TR"), 10)


# ---- DateTools + QueryParser date ranges (QueryParser.cs:743-798)

def test_datetools_formats():
    d = dt.parse_date("2024-01-05")
    assert dt.date_to_string(d, "DAY") == "20240105"
    assert dt.date_to_string(d, "MONTH") == "202401"
    assert dt.date_to_string(d, "MILLISECOND") == "20240105000000000"
    assert dt.parse_date("01/05/2024") == d
    assert dt.parse_date("not-a-date") is None


def test_parser_date_range_rewrite():
    p = QueryParser(default_field="text", keyword_fields={"date"},
                    field_date_resolutions={"date": "DAY"})
    q = p.parse("date:[2024-01-01 TO 2024-01-31]")
    assert isinstance(q, ast.TermRange)
    assert (q.lower, q.upper) == ("20240101", "20240131")
    # SECOND resolution: inclusive upper pushed to end-of-day
    p2 = QueryParser(default_field="text",
                    field_date_resolutions={"date": "SECOND"})
    q2 = p2.parse("date:[2024-01-01 TO 2024-01-31]")
    assert q2.upper == "20240131235959"
    # exclusive upper keeps start-of-day
    q3 = p2.parse("date:{2024-01-01 TO 2024-01-31}")
    assert q3.upper == "20240131000000"


def test_parser_locale_date_formats():
    """SetLocale analogue (QueryParser.cs:302/:765-772): a parser built
    with its own strptime patterns parses that locale's short dates; the
    default patterns then no longer apply."""
    p = QueryParser(default_field="text", keyword_fields={"date"},
                    field_date_resolutions={"date": "DAY"},
                    date_formats=("%d.%m.%Y",))
    q = p.parse("date:[01.02.2024 TO 15.04.2024]")
    assert isinstance(q, ast.TermRange)
    assert (q.lower, q.upper) == ("20240201", "20240415")
    # ISO bounds are NOT dates under this locale: lexicographic fallback
    q2 = p.parse("date:[2024-02-01 TO 2024-04-15]")
    assert (q2.lower, q2.upper) == ("2024-02-01", "2024-04-15")


def test_parser_non_date_range_stays_lexicographic():
    p = QueryParser(default_field="text", date_resolution="DAY")
    q = p.parse("text:[apple TO cherry]")
    assert (q.lower, q.upper) == ("apple", "cherry")


def test_parser_date_range_end_to_end(spark, idx):
    p = QueryParser(default_field="text", keyword_fields={"date"},
                    field_date_resolutions={"date": "DAY"})
    q = p.parse("date:[2024-01-01 TO 2024-01-31]")
    assert _ids(Searcher(idx).search(q, 10)) == [0, 1]


def test_parser_range_collation_forwarded():
    p = QueryParser(default_field="text", range_collation="folded")
    q = p.parse("word:[cafe TO cafg]")
    assert q.collation == "folded"


def test_parser_leading_wildcard_rejected_by_default():
    from lucenenet_spark.queryparser.parser import ParseError
    p = QueryParser(default_field="text")
    with pytest.raises(ParseError):
        p.parse("*ern")
    with pytest.raises(ParseError):
        p.parse("?ern")
    q = QueryParser(default_field="text",
                    allow_leading_wildcard=True).parse("*ern")
    assert isinstance(q, ast.Wildcard)
