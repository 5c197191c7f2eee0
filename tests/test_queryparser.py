"""QueryParser surface tests — AST golden assertions in the style of the
reference's TestQueryParser (test/Lucene.Net.Test/QueryParsers/)."""

from __future__ import annotations

import pytest

from lucenenet_spark.plans import ast
from lucenenet_spark.queryparser.parser import ParseError, QueryParser, parse


def t(x, **kw):
    return ast.Term(x, **kw)


def test_single_term():
    assert parse("spark") == t("spark")


def test_stopword_only_is_matchall():
    assert parse("the") == ast.MatchAll()


def test_default_or():
    q = parse("spark merge")
    assert q == ast.Bool(should=(t("spark"), t("merge")))


def test_and_promotes_previous():
    q = parse("spark AND merge")
    assert q == ast.Bool(must=(t("spark"), t("merge")))


def test_mixed_and_or():
    q = parse("spark OR merge AND batch")
    assert q == ast.Bool(must=(t("merge"), t("batch")), should=(t("spark"),))


def test_plus_minus():
    q = parse("+spark -merge batch")
    assert q == ast.Bool(must=(t("spark"),), should=(t("batch"),),
                         must_not=(t("merge"),))


def test_not_keyword_and_bang():
    assert parse("spark NOT merge") == parse("spark !merge")
    q = parse("spark NOT merge")
    assert q == ast.Bool(should=(t("spark"),), must_not=(t("merge"),))


def test_field_override():
    q = parse("source:src0 spark")
    assert q == ast.Bool(should=(t("src0", field="source"), t("spark")))


def test_boost():
    q = parse("spark^2 merge")
    assert q == ast.Bool(should=(t("spark", boost=2.0), t("merge")))


def test_phrase():
    q = parse('"table hash"')
    assert q == ast.Phrase(("table", "hash"), offsets=(0, 1))


def test_phrase_slop_and_boost():
    q = parse('"table hash"~3^2')
    assert q == ast.Phrase(("table", "hash"), slop=3, offsets=(0, 1), boost=2.0)


def test_phrase_stopword_hole():
    # "state of the art": of/the are stopwords -> offsets keep the holes
    q = parse('"state of the art"')
    assert q == ast.Phrase(("state", "art"), offsets=(0, 3))


def test_single_token_phrase_folds_to_term():
    assert parse('"spark"') == t("spark")


def test_prefix():
    assert parse("spar*") == ast.Prefix("spar")


def test_wildcard():
    assert parse("s?an") == ast.Wildcard("s?an")
    assert parse("s*an*") == ast.Wildcard("s*an*")


def test_fuzzy_default_and_explicit():
    assert parse("scan~") == ast.Fuzzy("scan", min_similarity=0.5)
    assert parse("scan~0.7") == ast.Fuzzy("scan", min_similarity=0.7)


def test_range_inclusive_exclusive():
    assert parse("[query TO sort]") == ast.TermRange("query", "sort")
    assert parse("{query TO sort}") == ast.TermRange(
        "query", "sort", include_lower=False, include_upper=False)
    assert parse("[* TO sort]") == ast.TermRange(None, "sort")


def test_grouping_with_boost():
    q = parse("(spark OR merge)^2 AND batch")
    grp = ast.Bool(should=(t("spark"), t("merge")), boost=2.0)
    assert q == ast.Bool(must=(grp, t("batch")))


def test_escaped_special():
    # escaped colon: NOT a field prefix; the analyzer then splits the
    # unescaped text on the non-alnum colon -> a 2-term phrase
    assert parse(r"foo\:bar") == ast.Phrase(("foo", "bar"), offsets=(0, 1))
    q = parse(r"spark\*")  # escaped star -> literal, analyzed as plain term
    assert q == t("spark")


def test_field_scoped_group():
    # Lucene applies the field to every clause of the group
    q = parse("title:(foo bar)")
    assert q == ast.Bool(should=(t("foo", field="title"),
                                 t("bar", field="title")))
    # explicit prefix inside a group overrides the group scope
    q2 = parse("title:(foo body:bar)")
    assert q2 == ast.Bool(should=(t("foo", field="title"),
                                  t("bar", field="body")))


def test_multifield_parser_expansion():
    from lucenenet_spark.queryparser.parser import MultiFieldQueryParser
    mp = MultiFieldQueryParser({"text": 1.0, "source": 2.0},
                               keyword_fields={"source"})
    q = mp.parse("spark")
    assert q == ast.Bool(should=(t("spark"),
                                 t("spark", field="source", boost=2.0)))
    # explicit field suppresses the expansion
    assert mp.parse("text:spark") == t("spark")


def test_keyword_field_not_analyzed():
    p = QueryParser(keyword_fields={"source"})
    q = p.parse("source:SRC0.x")
    assert q == t("SRC0.x", field="source")


def test_multi_token_term_becomes_phrase():
    # one query "term" that the analyzer splits (e.g. hyphenated)
    q = parse("doc_id")  # standard analyzer splits on _
    assert q == ast.Phrase(("doc", "id"), offsets=(0, 1))


def test_parse_errors():
    with pytest.raises(ParseError):
        parse("(spark")
    with pytest.raises(ParseError):
        parse("[query TO")
    with pytest.raises(ParseError):
        parse("field:")


@pytest.mark.usefixtures("spark")
def test_parsed_equals_programmatic(spark, documents_index):
    """Parsed query and hand-built AST produce identical top-k."""
    from lucenenet_spark.plans.lowering import Searcher

    s = Searcher(documents_index)
    pairs = [
        ("spark AND merge",
         ast.Bool(must=(t("spark"), t("merge")))),
        ("spark merge batch",
         ast.Bool(should=(t("spark"), t("merge"), t("batch")))),
        ('"table hash"', ast.Phrase(("table", "hash"))),
        ("spar*", ast.Prefix("spar")),
    ]
    for text, prog in pairs:
        a = [tuple(r) for r in s.search(parse(text), 10).collect()]
        b = [tuple(r) for r in s.search(prog, 10).collect()]
        assert a == b, text


# ---------------- round-4 session: parser config knobs + Escape


def test_escape_roundtrip():
    """QueryParser.Escape (QueryParser.cs:1175-1190): escaped special
    chars parse back as literal term text."""
    from lucenenet_spark.queryparser.parser import QueryParser, escape

    s = "c++ (2+2):3 ~wild*"
    esc = escape(s)
    assert "\\+" in esc and "\\(" in esc and "\\*" in esc and "\\~" in esc
    q = QueryParser("content").parse(f"title:{escape('a+b')}")
    from lucenenet_spark.plans import ast
    assert q == ast.Term("a+b", field="title") or isinstance(q, ast.Term)


def test_default_operator_and():
    """SetDefaultOperator(AND): bare terms are required; OR demotes."""
    from lucenenet_spark.plans import ast
    from lucenenet_spark.queryparser.parser import QueryParser

    p = QueryParser("content", default_operator="AND")
    q = p.parse("spark merge")
    assert isinstance(q, ast.Bool)
    assert len(q.must) == 2 and not q.should
    q2 = p.parse("spark OR merge")
    assert len(q2.should) == 2 and not q2.must
    q3 = p.parse("spark merge OR batch")
    # "merge OR batch": OR demotes merge; spark stays required
    assert len(q3.must) == 1 and len(q3.should) == 2


def test_phrase_slop_and_fuzzy_defaults():
    from lucenenet_spark.plans import ast
    from lucenenet_spark.queryparser.parser import QueryParser

    p = QueryParser("content", phrase_slop=2, fuzzy_min_sim=0.7)
    q = p.parse('"spark merge"')
    assert isinstance(q, ast.Phrase) and q.slop == 2
    q2 = p.parse('"spark merge"~4')     # explicit ~ wins
    assert q2.slop == 4
    q3 = p.parse("sprak~")
    assert isinstance(q3, ast.Fuzzy) and q3.min_similarity == 0.7
