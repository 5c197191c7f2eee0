"""Sinks + Miscellaneous stream utilities vs the reference tests
(test/contrib/Analyzers/Sinks/*.cs, Miscellaneous/*.cs)."""

from __future__ import annotations

from lucenenet_spark.analysis.sinks import (
    ALPHANUM, EMAIL, HOST, NUM, APOSTROPHE, ACRONYM, COMPANY,
    classify_token, date_recognizer_sink, empty_token_stream,
    prefix_and_suffix_aware, prefix_aware, single_token_stream,
    tee_sink, token_range_sink, token_type_sink,
    tokenize_standard_typed, whitespace_tokens_offsets)


class TestSinks:
    def test_date_recognizer(self):
        # DateRecognizerSinkTokenizerTest: 18 whitespace tokens, 2 dates
        text = ("The quick red fox jumped over the lazy brown dogs on "
                "7/11/2006  The dogs finally reacted on 7/12/2006")
        toks = whitespace_tokens_offsets(text)
        assert len(toks) == 18
        sinks = tee_sink(toks, {"date": date_recognizer_sink()})
        assert [t[0] for t in sinks["date"]] == ["7/11/2006", "7/12/2006"]

    def test_token_range(self):
        # TokenRangeSinkTokenizerTest: range [2, 4) over 10 tokens -> 2
        text = "The quick red fox jumped over the lazy brown dogs"
        toks = whitespace_tokens_offsets(text)
        assert len(toks) == 10
        sinks = tee_sink(toks, {"range": token_range_sink(2, 4)})
        assert [t[0] for t in sinks["range"]] == ["red", "fox"]

    def test_token_type(self):
        toks = tokenize_standard_typed(
            "visit bob@example.com or www.example.com for 3.7 info")
        sinks = tee_sink(toks, {
            "email": token_type_sink(EMAIL),
            "host": token_type_sink(HOST),
            "num": token_type_sink(NUM),
        })
        assert [t[0] for t in sinks["email"]] == ["bob@example.com"]
        assert [t[0] for t in sinks["host"]] == ["www.example.com"]
        assert [t[0] for t in sinks["num"]] == ["3.7"]

    def test_one_pass_many_sinks(self):
        toks = whitespace_tokens_offsets("a b c d")
        sinks = tee_sink(toks, {"lo": token_range_sink(0, 2),
                                "hi": token_range_sink(2, 4)})
        assert [t[0] for t in sinks["lo"]] == ["a", "b"]
        assert [t[0] for t in sinks["hi"]] == ["c", "d"]


class TestClassify:
    def test_types(self):
        assert classify_token("spark") == ALPHANUM
        assert classify_token("o'reilly") == APOSTROPHE
        assert classify_token("at&t") == COMPANY
        assert classify_token("bob@mail.org") == EMAIL
        assert classify_token("i.b.m.") == ACRONYM
        assert classify_token("www.site.com") == HOST
        assert classify_token("1-2") == NUM


class TestMiscStreams:
    def test_empty_and_single(self):
        assert empty_token_stream() == []
        assert single_token_stream("hello") == [("hello", 0, 0, 5)]

    def test_prefix_aware(self):
        # TestPrefixAwareTokenFilter: ["a"] + ["b"] -> a(0,1) b(1,2)
        out = prefix_aware(single_token_stream("a"),
                           single_token_stream("b"))
        assert out == [("a", 0, 0, 1), ("b", 1, 1, 2)]

    def test_prefix_and_suffix_aware(self):
        # TestPrefixAndSuffixAwareTokenFilter: ^ + [hello world] + $
        inp = whitespace_tokens_offsets("hello world")
        out = prefix_and_suffix_aware(
            single_token_stream("^"), inp, single_token_stream("$"))
        assert [t[0] for t in out] == ["^", "hello", "world", "$"]
        # offsets shift past each previous stream's end
        assert out[0][2:] == (0, 1)
        assert out[1][2:] == (1, 6)
        assert out[2][2:] == (7, 12)
        assert out[3][2:] == (12, 13)
        # positions renumber sequentially
        assert [t[1] for t in out] == [0, 1, 2, 3]

    def test_prefix_empty(self):
        out = prefix_aware(empty_token_stream(),
                           single_token_stream("x"))
        assert out == [("x", 0, 0, 1)]


class TestAnalysisExt:
    def test_unaccented_word(self):
        from lucenenet_spark.analysis.misc import unaccented_word_analyzer
        an = unaccented_word_analyzer()
        assert an("Café au Lait") == [("cafe", 0), ("au", 1), ("lait", 2)]

    def test_single_char(self):
        from lucenenet_spark.analysis.misc import single_char_token_analyzer
        an = single_char_token_analyzer()
        out = an("ab ç1")
        # consecutive positions across tokens -> substring = phrase
        assert out == [("a", 0), ("b", 1), ("c", 2), ("1", 3)]

    def test_thai_parity(self):
        import pytest as _pytest
        from lucenenet_spark.analysis.misc import thai_word_filter
        with _pytest.raises(NotImplementedError):
            thai_word_filter([("ab", 0)])
