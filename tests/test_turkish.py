"""Snowball Turkish (analysis/turkish.py) — goldens hand-traced
against the generated control flow of
src/contrib/Snowball/SF/Snowball/Ext/TurkishStemmer.cs, plus the
SnowballFilter buffer contract and structural properties."""

import pytest

from lucenenet_spark.analysis import turkish as T

GOLD = [
    # noun chain: lAr / possessive / case endings converge
    ("kitaplar", "kitap"), ("kitapları", "kitap"),
    ("kitaplarını", "kitap"), ("kitaplarından", "kitap"),
    ("evler", "ev"), ("evlerinde", "ev"), ("evin", "ev"),
    ("evinde", "ev"), ("evden", "ev"),
    # ki chain: DA branch then possessive
    ("evimizdeki", "ev"), ("sokaktaki", "sokak"),
    # nominal verb: yDU after harmony, with the optional y
    ("geldim", "gel"), ("geldiler", "gel"), ("gelmiş", "gel"),
    # one nominal-verb pass only: ti removed, mis stays
    ("gelmişti", "gelmiş"),
    # DUr branch
    ("güzeldir", "güzel"),
    # branch 3 unsets the continue flag: noun suffixes (the ki chain)
    # are skipped after a bare lAr (the generated code's own quirk)
    ("sokaktakiler", "sokaktaki"),
    # yA with optional y + harmony
    ("türkiye", "türki"),
    # possessive m with the optional-U gate (known overstemming)
    ("kalem", "kale"),
    # postlude: g -> +U then final softening
    ("yapacağı", "yapacak"),
    # one-syllable gate: untouched
    ("dağ", "dağ"), ("ağ", "ağ"), ("ev", "ev"),
    # reserved words skip the postlude
    ("ad", "ad"), ("soyad", "soyad"),
    # harmony failure blocks the suffix (lar after front vowels only
    # when an earlier back vowel answers)
    ("arabalar", "araba"), ("arkadaşlarımla", "arkadaş"),
    ("çocuklarının", "çocuk"),
]


@pytest.mark.parametrize("word,want", GOLD)
def test_turkish_goldens(word, want):
    assert T.turkish_stem(word) == want


def test_stem_never_crashes_on_fuzz():
    import random
    rng = random.Random("turkish")
    alpha = "abcçdefgğhıijklmnoöprsştuüvyz"
    for _ in range(2000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        out = T.turkish_stem(w)
        assert isinstance(out, str) and len(out) <= len(w) + 1

def test_stem_is_prefix_or_postluded():
    """Every stem is a prefix of the input, possibly with the postlude
    vowel-append / final-consonant softening applied."""
    import random
    rng = random.Random(42)
    alpha = "abcçdefgğhıijklmnoöprsştuüvyz"
    soften = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    for _ in range(1000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 12)))
        out = T.turkish_stem(w)
        core = out
        if out and out[-1] in "ıiuü" and not w.startswith(out):
            core = out[:-1]  # appended harmony vowel
        if core and not w.startswith(core):
            assert core[-1] in soften.values()
            assert any(w.startswith(core[:-1] + k)
                       for k, v in soften.items() if v == core[-1])
        else:
            assert w.startswith(core)


def test_vowel_harmony_contract():
    # the last vowel before the position must be answered by an
    # EARLIER class member, anywhere in the prefix
    assert T._harmony("kitaplar", 8)   # a ... a
    assert not T._harmony("xxx", 3)    # no vowel at all
    assert not T._harmony("lar", 3)    # vowel with nothing before it


def test_analyzer_positions():
    an = T.turkish_snowball_analyzer()
    toks = an("kitaplar evler")
    assert toks == [("kitap", 0), ("ev", 1)]
