"""contrib Snowball Lovins — the 1968 Lovins single-pass English
stemmer as generated for the reference
(src/contrib/Snowball/SF/Snowball/Ext/LovinsStemmer.cs): one longest-
match pass over 294 endings, each gated by a context condition A-Z/
AA/BB/CC evaluated against the remaining stem (conditions fail through
to shorter endings INSIDE the among, exactly find_among_b's trie
fallback), then an undouble of trailing bb/dd/gg/ll/mm/nn/pp/rr/ss/tt,
then 34 respell rules (uad->uas ... yz->ys, five of them gated on the
preceding character).

Two generated-code quirks are preserved deliberately (output parity
with the reference, not with the published algorithm): the or-exits of
conditions H, O and R jump to the wrong label, making their first
alternative dead — H is effectively "stem ends ll" (the 't' branch
never wins, LovinsStemmer.cs:216-262), O is "ends i" and R is
"ends r".
"""

from __future__ import annotations

LOVINS_ENDINGS = [
    ("s'", 'A'), ('a', 'A'), ('ia', 'A'), ('ata', 'A'), ('ic', 'A'),
    ('aic', 'A'), ('allic', 'BB'), ('aric', 'A'), ('atic', 'B'),
    ('itic', 'H'), ('antic', 'C'), ('istic', 'A'), ('alistic', 'B'),
    ('aristic', 'A'), ('ivistic', 'A'), ('ed', 'E'), ('anced', 'B'),
    ('enced', 'A'), ('ished', 'A'), ('ied', 'A'), ('ened', 'E'),
    ('ioned', 'A'), ('ated', 'I'), ('ented', 'C'), ('ized', 'F'),
    ('arized', 'A'), ('oid', 'A'), ('aroid', 'A'), ('hood', 'A'),
    ('ehood', 'A'), ('ihood', 'A'), ('elihood', 'E'), ('ward', 'A'),
    ('e', 'A'), ('ae', 'A'), ('ance', 'B'), ('icance', 'A'),
    ('ence', 'A'), ('ide', 'L'), ('icide', 'A'), ('otide', 'A'),
    ('age', 'B'), ('able', 'A'), ('atable', 'A'), ('izable', 'E'),
    ('arizable', 'A'), ('ible', 'A'), ('encible', 'A'), ('ene', 'E'),
    ('ine', 'M'), ('idine', 'I'), ('one', 'R'), ('ature', 'E'),
    ('eature', 'Z'), ('ese', 'A'), ('wise', 'A'), ('ate', 'A'),
    ('entiate', 'A'), ('inate', 'A'), ('ionate', 'D'), ('ite', 'AA'),
    ('ive', 'A'), ('ative', 'A'), ('ize', 'F'), ('alize', 'A'),
    ('icalize', 'A'), ('ialize', 'A'), ('entialize', 'A'),
    ('ionalize', 'A'), ('arize', 'A'), ('ing', 'N'), ('ancing', 'B'),
    ('encing', 'A'), ('aging', 'B'), ('ening', 'E'), ('ioning', 'A'),
    ('ating', 'I'), ('enting', 'C'), ('ying', 'B'), ('izing', 'F'),
    ('arizing', 'A'), ('ish', 'C'), ('yish', 'A'), ('i', 'A'),
    ('al', 'BB'), ('ical', 'A'), ('aical', 'A'), ('istical', 'A'),
    ('oidal', 'A'), ('eal', 'Y'), ('ial', 'A'), ('ancial', 'A'),
    ('arial', 'A'), ('ential', 'A'), ('ional', 'A'), ('ational', 'B'),
    ('izational', 'A'), ('ental', 'A'), ('ful', 'A'), ('eful', 'A'),
    ('iful', 'A'), ('yl', 'R'), ('ism', 'B'), ('icism', 'A'),
    ('oidism', 'A'), ('alism', 'B'), ('icalism', 'A'),
    ('ionalism', 'A'), ('inism', 'J'), ('ativism', 'A'), ('um', 'U'),
    ('ium', 'A'), ('ian', 'A'), ('ician', 'A'), ('en', 'F'),
    ('ogen', 'A'), ('on', 'S'), ('ion', 'Q'), ('ation', 'B'),
    ('ication', 'G'), ('entiation', 'A'), ('ination', 'A'),
    ('isation', 'A'), ('arisation', 'A'), ('entation', 'A'),
    ('ization', 'F'), ('arization', 'A'), ('action', 'G'), ('o', 'A'),
    ('ar', 'X'), ('ear', 'Y'), ('ier', 'A'), ('ariser', 'A'),
    ('izer', 'F'), ('arizer', 'A'), ('or', 'T'), ('ator', 'A'),
    ('s', 'W'), ("'s", 'A'), ('as', 'B'), ('ics', 'A'),
    ('istics', 'A'), ('es', 'E'), ('ances', 'B'), ('ences', 'A'),
    ('ides', 'L'), ('oides', 'A'), ('ages', 'B'), ('ies', 'P'),
    ('acies', 'A'), ('ancies', 'A'), ('encies', 'A'), ('aries', 'A'),
    ('ities', 'A'), ('alities', 'A'), ('ivities', 'A'), ('ines', 'M'),
    ('nesses', 'A'), ('ates', 'A'), ('atives', 'A'), ('ings', 'N'),
    ('is', 'A'), ('als', 'BB'), ('ials', 'A'), ('entials', 'A'),
    ('ionals', 'A'), ('isms', 'B'), ('ians', 'A'), ('icians', 'A'),
    ('ions', 'B'), ('ations', 'B'), ('arisations', 'A'),
    ('entations', 'A'), ('izations', 'A'), ('arizations', 'A'),
    ('ars', 'O'), ('iers', 'A'), ('izers', 'F'), ('ators', 'A'),
    ('less', 'A'), ('eless', 'A'), ('ness', 'A'), ('eness', 'E'),
    ('ableness', 'A'), ('eableness', 'E'), ('ibleness', 'A'),
    ('ateness', 'A'), ('iteness', 'A'), ('iveness', 'A'),
    ('ativeness', 'A'), ('ingness', 'A'), ('ishness', 'A'),
    ('iness', 'A'), ('ariness', 'E'), ('alness', 'A'),
    ('icalness', 'A'), ('antialness', 'A'), ('entialness', 'A'),
    ('ionalness', 'A'), ('fulness', 'A'), ('lessness', 'A'),
    ('ousness', 'A'), ('eousness', 'A'), ('iousness', 'A'),
    ('itousness', 'A'), ('entness', 'A'), ('ants', 'B'), ('ists', 'A'),
    ('icists', 'A'), ('us', 'V'), ('ous', 'A'), ('eous', 'A'),
    ('aceous', 'A'), ('antaneous', 'A'), ('ious', 'A'),
    ('acious', 'B'), ('itous', 'A'), ('ant', 'B'), ('icant', 'A'),
    ('ent', 'C'), ('ement', 'A'), ('izement', 'A'), ('ist', 'A'),
    ('icist', 'A'), ('alist', 'A'), ('icalist', 'A'), ('ialist', 'A'),
    ('ionist', 'A'), ('entist', 'A'), ('y', 'B'), ('acy', 'A'),
    ('ancy', 'B'), ('ency', 'A'), ('ly', 'B'), ('ealy', 'Y'),
    ('ably', 'A'), ('ibly', 'A'), ('edly', 'E'), ('iedly', 'A'),
    ('ely', 'E'), ('ately', 'A'), ('ively', 'A'), ('atively', 'A'),
    ('ingly', 'B'), ('atingly', 'A'), ('ily', 'A'), ('lily', 'A'),
    ('arily', 'A'), ('ally', 'B'), ('ically', 'A'), ('aically', 'A'),
    ('allically', 'C'), ('istically', 'A'), ('alistically', 'B'),
    ('oidally', 'A'), ('ially', 'A'), ('entially', 'A'),
    ('ionally', 'A'), ('ationally', 'B'), ('izationally', 'B'),
    ('entally', 'A'), ('fully', 'A'), ('efully', 'A'), ('ifully', 'A'),
    ('enly', 'E'), ('arly', 'K'), ('early', 'Y'), ('lessly', 'A'),
    ('ously', 'A'), ('eously', 'A'), ('iously', 'A'), ('ently', 'A'),
    ('ary', 'F'), ('ery', 'E'), ('icianry', 'A'), ('atory', 'A'),
    ('ity', 'A'), ('acity', 'A'), ('icity', 'A'), ('eity', 'A'),
    ('ality', 'A'), ('icality', 'A'), ('iality', 'A'),
    ('antiality', 'A'), ('entiality', 'A'), ('ionality', 'A'),
    ('elity', 'A'), ('ability', 'A'), ('izability', 'A'),
    ('arizability', 'A'), ('ibility', 'A'), ('inity', 'CC'),
    ('arity', 'B'), ('ivity', 'A'),
]

def _cond(name: str, s: str) -> bool:
    """Context condition over the remaining stem s (cursor at the
    ending start; hop N = len(s) >= N)."""
    n = len(s)
    if name == "A":
        return n >= 2
    if name == "B":
        return n >= 3
    if name == "C":
        return n >= 4
    if name == "D":
        return n >= 5
    if name == "E":
        return n >= 2 and not s.endswith("e")
    if name == "F":
        return n >= 3 and not s.endswith("e")
    if name == "G":
        return n >= 3 and s.endswith("f")
    if name == "H":  # generated-code quirk: 't' branch dead
        return n >= 2 and s.endswith("ll")
    if name == "I":
        return n >= 2 and not s.endswith(("o", "e"))
    if name == "J":
        return n >= 2 and not s.endswith(("a", "e"))
    if name == "K":
        return n >= 3 and (s.endswith(("l", "i"))
                           or (s.endswith("e") and s[-3:-2] == "u"))
    if name == "L":
        return (n >= 2 and not s.endswith(("u", "x"))
                and not (s.endswith("s") and not s.endswith("os")))
    if name == "M":
        return n >= 2 and not s.endswith(("a", "c", "e", "m"))
    if name == "N":
        return n >= 3 and (s[-3:-2] != "s" or n >= 4)
    if name == "O":  # generated-code quirk: 'l' branch dead
        return n >= 2 and s.endswith("i")
    if name == "P":
        return n >= 2 and not s.endswith("c")
    if name == "Q":
        return n >= 3 and not s.endswith(("l", "n"))
    if name == "R":  # generated-code quirk: 'n' branch dead
        return n >= 2 and s.endswith("r")
    if name == "S":
        return n >= 2 and (s.endswith("dr") or (
            s.endswith("t") and not s.endswith("tt")))
    if name == "T":
        return n >= 2 and (s.endswith("s") or (
            s.endswith("t") and not s.endswith("ot")))
    if name == "U":
        return n >= 2 and s.endswith(("l", "m", "n", "r"))
    if name == "V":
        return n >= 2 and s.endswith("c")
    if name == "W":
        return n >= 2 and not s.endswith(("s", "u"))
    if name == "X":
        return n >= 2 and (s.endswith(("l", "i"))
                           or (s.endswith("e") and s[-3:-2] == "u"))
    if name == "Y":
        return n >= 2 and s.endswith("in")
    if name == "Z":
        return n >= 2 and not s.endswith("f")
    if name == "AA":
        return n >= 2 and s.endswith(
            ("d", "f", "ph", "th", "l", "er", "or", "es", "t"))
    if name == "BB":
        return n >= 3 and not s.endswith(("met", "ryst"))
    # CC
    return n >= 2 and s.endswith("l")


LOVINS_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr",
                  "ss", "tt")

# (suffix, replacement, forbidden preceding chars)
LOVINS_RESPELL = [
    ("uad", "uas", ""), ("vad", "vas", ""), ("cid", "cis", ""),
    ("lid", "lis", ""), ("erid", "eris", ""), ("pand", "pans", ""),
    ("end", "ens", "s"), ("ond", "ons", ""), ("lud", "lus", ""),
    ("rud", "rus", ""), ("ul", "l", "aio"), ("her", "hes", "pt"),
    ("metr", "meter", ""), ("istr", "ister", ""), ("urs", "ur", ""),
    ("uct", "uc", ""), ("et", "es", "n"), ("mit", "mis", ""),
    ("ent", "ens", "m"), ("umpt", "um", ""), ("rpt", "rb", ""),
    ("ert", "ers", ""), ("yt", "ys", ""), ("iev", "ief", ""),
    ("olv", "olut", ""), ("ax", "ac", ""), ("ex", "ec", ""),
    ("bex", "bic", ""), ("dex", "dic", ""), ("pex", "pic", ""),
    ("tex", "tic", ""), ("ix", "ic", ""), ("lux", "luc", ""),
    ("yz", "ys", ""),
]


def lovins_stem(word: str) -> str:
    w = word
    # endings: longest suffix whose condition passes (in-among
    # fallthrough), delete
    best = None
    for suf, cond in LOVINS_ENDINGS:
        if (w.endswith(suf)
                and (best is None or len(suf) > len(best))
                and _cond(cond, w[: len(w) - len(suf)])):
            best = suf
    if best is not None:
        w = w[: -len(best)]
    # undouble (delete one of the trailing pair)
    if w.endswith(LOVINS_DOUBLES):
        w = w[:-1]
    # respell: longest matching rule; a failed character gate aborts
    hit = None
    for suf, rep, notpre in LOVINS_RESPELL:
        if w.endswith(suf) and (hit is None or len(suf) > len(hit[0])):
            hit = (suf, rep, notpre)
    if hit is not None:
        suf, rep, notpre = hit
        p = len(w) - len(suf)
        if not (notpre and p >= 1 and w[p - 1] in notpre):
            w = w[:p] + rep
    return w


def lovins_analyzer():
    from .snowball_ext import _plain_snowball_analyzer
    return _plain_snowball_analyzer(lovins_stem)
