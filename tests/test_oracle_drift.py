"""Oracle self-containment: oracle/tables.py carries TRANSCRIBED copies
of every spec constant the DuckDB oracle needs (VERDICT r4 watch #5) —
sqlgen must import nothing from the engine packages, and each copy must
stay bit-equal to its engine counterpart so a one-sided edit fails here
instead of silently passing both sides of the correctness gate.
"""

import ast
import pathlib
import random

from lucenenet_spark.oracle import tables as T


def test_sqlgen_imports_no_engine_modules():
    src = pathlib.Path("lucenenet_spark/oracle/sqlgen.py").read_text()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            # level=2 ("..analysis" etc.) or absolute engine imports
            mod = node.module or ""
            assert node.level < 2, f"engine-relative import: {mod}"
            assert not mod.startswith("lucenenet_spark."), mod
        elif isinstance(node, ast.Import):
            for a in node.names:
                assert not a.name.startswith("lucenenet_spark."), a.name


def test_constant_copies_match_engine():
    from lucenenet_spark.analysis import intl as I
    from lucenenet_spark.analysis import snowball as S
    from lucenenet_spark.analysis import tokenizers as TK
    from lucenenet_spark.functions import textstats as TS
    from lucenenet_spark.operators import dedup as D

    assert T.ENGLISH_STOP_WORDS == TK.ENGLISH_STOP_WORDS
    assert T.STANDARD_ALTERNATION == TK.STANDARD_ALTERNATION
    assert T.MAX_TOKEN_LENGTH == TK.MAX_TOKEN_LENGTH
    assert T.LANG_MARKERS == TS.LANG_MARKERS
    assert T.SB_EXC1 == S._EXC1
    assert T.SB_EXC2 == S._EXC2
    assert T.SB_DOUBLES == S._DOUBLES
    assert T.SB_VALID_LI == S._VALID_LI
    assert T.SB_STEP2 == S._STEP2
    assert T.SB_STEP3 == S._STEP3
    assert T.SB_STEP4 == S._STEP4
    assert T.SB_S_ENDING == S._S_ENDING
    assert T.SB_ST_ENDING == S._ST_ENDING
    assert T.GERMAN_STOP_WORDS == S.GERMAN_STOP_WORDS
    for name in (
        "RU_PERFECTIVE_GERUND_1", "RU_PERFECTIVE_GERUND_2",
        "RU_REFLEXIVE", "RU_ADJECTIVE", "RU_PARTICIPLE_1",
        "RU_PARTICIPLE_2", "RU_VERB_1", "RU_VERB_2", "RU_NOUN",
        "RU_DERIVATIONAL", "RU_SUPERLATIVE", "_AR_PREFIXES",
        "_AR_SUFFIXES", "RUSSIAN_STOP_WORDS", "GREEK_STOP_WORDS",
        "ARABIC_STOP_WORDS", "CZECH_STOP_WORDS",
    ):
        assert getattr(T, name) == getattr(I, name), name
    assert T.M30 == D.M30
    assert T.MH_PRIME == D.MH_PRIME


def test_snowball_ext_copies_match_engine():
    from lucenenet_spark.analysis import snowball_ext as X
    for name in (
        "SV_VOWELS", "SV_S_ENDING", "SV_MAIN", "SV_PAIRS", "SV_OTHER",
        "DA_VOWELS", "DA_S_ENDING", "DA_MAIN", "DA_PAIRS", "DA_OTHER",
        "NO_VOWELS", "NO_S_ENDING", "NO_MAIN", "NO_PAIRS", "NO_OTHER",
        "FI_VOWELS", "FI_V_RESTR", "FI_AEI", "FI_PARTICLE_END",
        "FI_LONG", "FI_PARTICLE", "FI_POSS", "FI_A1", "FI_A2", "FI_A3",
        "FI_CASE", "FI_OTHER", "FI_TPLUR",
        "RO_VOWELS", "RO_STEP0", "RO_COMBO", "RO_COMBO_REPL", "RO_STD",
        "RO_VERB", "RO_VOWEL_SUF",
        "HU_VOWELS", "HU_DIGRAPHS", "HU_DOUBLE", "HU_INSTRUM",
        "HU_CASE", "HU_CASE_SPECIAL", "HU_CASE_OTHER", "HU_FACTIVE",
        "HU_PLURAL", "HU_OWNED", "HU_SING_OWNER", "HU_PLUR_OWNER",
        "NL_VOWELS", "NL_ACCENTS", "NL_STEP1", "NL_D_SUFFIX",
        "ES_VOWELS", "ES_PRON", "ES_PRE_MARK", "ES_MARK_REPL", "ES_STD",
        "ES_A3", "ES_A4", "ES_A5", "ES_Y_VERB", "ES_VERB",
        "ES_RESIDUAL", "ES_POST", "PT_VOWELS", "PT_STD", "PT_A2",
        "PT_A3", "PT_A4", "PT_VERB", "PT_RESIDUAL", "PT_FORM",
        "IT_VOWELS", "IT_AEIO", "IT_ACCENTS", "IT_PRON", "IT_PRE_MARK",
        "IT_STD", "IT_A4", "IT_A5", "IT_VERB", "FR_VOWELS",
        "FR_KEEP_S", "FR_STD", "FR_A1", "FR_A2", "FR_I_VERB",
        "FR_VERB", "FR_RESIDUAL", "FR_DOUBLES",
    ):
        assert getattr(T, name) == getattr(X, name), name


def test_lovins_copies_match_engine():
    from lucenenet_spark.analysis import lovins as L
    for name in ("LOVINS_ENDINGS", "LOVINS_DOUBLES", "LOVINS_RESPELL"):
        assert getattr(T, name) == getattr(L, name), name


def test_helper_copies_match_engine():
    from lucenenet_spark.analysis.tokenizers import tokenize_standard
    from lucenenet_spark.functions.numbertools import long_to_string
    from lucenenet_spark.operators.dedup import mh_consts
    from lucenenet_spark.operators.spell import word_grams

    assert T.mh_consts(64) == mh_consts(64)
    for w in ("a", "ab", "abc", "abcd", "abcde", "merging", "mergingmachine"):
        assert T.word_grams(w) == word_grams(w), w
    rng = random.Random(7)
    edge = [0, 1, -1, 42, -42, (1 << 63) - 1, -(1 << 63), 10**12, -10**12]
    for v in edge + [rng.randint(-(1 << 63), (1 << 63) - 1)
                     for _ in range(2000)]:
        assert T.long_to_string(v) == long_to_string(v), v
    for txt in (None, "", "O'Reilly's AT&T a.b.c. host.name. 1.2-3 the x",
                "mail@a-b.com u.s.a. 3.14 foo_bar-9"):
        assert T.tokenize_standard(txt) == tokenize_standard(txt), txt
