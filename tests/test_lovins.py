"""Lovins stemmer (analysis/lovins.py) — goldens from the published
1968 examples where the generated code agrees, plus cases pinning the
reference's own dead-branch quirks (LovinsStemmer.cs r_H/r_O/r_R)."""

import pytest

from lucenenet_spark.analysis.lovins import lovins_stem

GOLD = [
    # classic published examples
    ("nationally", "nat"), ("sitting", "sit"),
    ("magnesia", "magnes"), ("magnesite", "magnes"),
    ("involution", "involut"), ("believes", "belief"),
    ("induction", "induc"), ("assumption", "assum"),
    ("absorption", "absorb"), ("analyzable", "analys"),
    # undouble after ending removal
    ("happiness", "hap"),
    # respell with the preceding-char gates
    ("suspension", "suspens"),   # 'ion' Q: stem 'suspens' ends n -> Q fails;
                                 # 'on' S: 'suspensi' ... traced via code
    # condition E blocks after e
    ("knees", "knee"),
    # min-stem conditions: tiny words unchanged
    ("a", "a"), ("es", "es"), ("is", "is"),
    # H quirk: 'itic' only removed after ll (then the ll undoubles)
    ("crystallitic", "crystal"),
]


@pytest.mark.parametrize("word,want", GOLD)
def test_lovins_goldens(word, want):
    assert lovins_stem(word) == want


def test_lovins_single_pass_properties():
    import random
    rng = random.Random("lovins")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(1500):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 15)))
        out = lovins_stem(w)
        assert isinstance(out, str)
        # one ending pass + undouble + respell can't grow the word by
        # more than the largest respell delta (olv -> olut)
        assert len(out) <= len(w) + 1


def test_lovins_condition_quirks():
    from lucenenet_spark.analysis.lovins import _cond
    # H: the generated 't' branch is dead
    assert _cond("H", "goll")
    assert not _cond("H", "goat")
    # O: 'l' branch dead; R: 'n' branch dead
    assert _cond("O", "taxi") and not _cond("O", "tall")
    assert _cond("R", "star") and not _cond("R", "stan")
