"""Dictionary-based compound-word decompounding (contrib Analyzers/
Compound): split German-style compounds into dictionary subwords, parts
stacked at the compound's position.

Mirrors DictionaryCompoundWordTokenFilter.DecomposeInternal
(src/contrib/Analyzers/Compound/DictionaryCompoundWordTokenFilter.cs:
40-88) exactly, including its quirks: tokens shorter than minWordSize
pass through undecomposed; candidate subwords start at every offset
`i < len - minSubwordSize` and take lengths `j` from minSubwordSize-1
(sic — the reference's off-by-one admits subwords one char below the
minimum) up to maxSubwordSize with `i + j <= len`; onlyLongestMatch
keeps one longest dictionary hit per start offset.  The original
compound token is always emitted; parts follow at the SAME position
(posIncrement=0, CompoundWordTokenFilterBase.cs).

The hyphenation-grammar variant (HyphenationCompoundWordTokenFilter)
needs external XML hyphenation patterns the sandbox does not ship; the
dictionary variant covers the reference's own test usage.
"""

from __future__ import annotations

from .tokenizers import tokenize_standard

DEFAULT_MIN_WORD_SIZE = 5     # CompoundWordTokenFilterBase.cs:33
DEFAULT_MIN_SUBWORD_SIZE = 2  # :38
DEFAULT_MAX_SUBWORD_SIZE = 15


def decompose(token: str, dictionary: set[str],
              min_word_size: int = DEFAULT_MIN_WORD_SIZE,
              min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
              max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
              only_longest_match: bool = False) -> list[str]:
    """Dictionary subword parts of one (already lowercased) token."""
    n = len(token)
    if n < min_word_size:
        return []
    parts: list[str] = []
    for i in range(0, n - min_subword_size):
        longest: str | None = None
        for j in range(min_subword_size - 1, max_subword_size + 1):
            if i + j > n:
                break
            sub = token[i:i + j]
            if sub in dictionary:
                if only_longest_match:
                    if longest is None or len(longest) < j:
                        longest = sub
                else:
                    parts.append(sub)
        if only_longest_match and longest is not None:
            parts.append(longest)
    return parts


def compound_tokens(text: str | None, dictionary: set[str],
                    **kw) -> list[tuple[str, int]]:
    """Standard chain + decompounded parts stacked at the compound's
    position (original token always kept)."""
    out: list[tuple[str, int]] = []
    for tok, pos in tokenize_standard(text):
        out.append((tok, pos))
        out.extend((p, pos) for p in decompose(tok, dictionary, **kw))
    return out


def compound_analyzer(dictionary: set[str], **kw):
    """analyzer= callable for the index builders."""
    dic = {w.lower() for w in dictionary}

    def analyze(text):
        return compound_tokens(text, dic, **kw)

    return analyze


# ---- HyphenationCompoundWordTokenFilter (round 5) ---------------------
# src/contrib/Analyzers/Compound/HyphenationCompoundWordTokenFilter.cs
# + Hyphenation/HyphenationTree.cs (the reference ships the full FOP
# port commented out; the semantics below mirror that code line for
# line).  The TeX/Liang pattern machinery needs no external XML: a
# HyphenationPatterns takes plain "a1bc2"-style pattern strings (the
# published format the FOP XML wraps) plus optional "wo-rd" exceptions.

import string as _string

_DEFAULT_CLASSES = {c: c for c in _string.ascii_lowercase}
_DEFAULT_CLASSES.update({c.upper(): c for c in _string.ascii_lowercase})
for _lo in "äöüßåéèêëàâîïôûçíóúãõì":
    _DEFAULT_CLASSES[_lo] = _lo
    _DEFAULT_CLASSES[_lo.upper()] = _lo


def _parse_pattern(pat: str) -> tuple[str, list[int]]:
    """'a1bc2' -> ('abc', [0, 1, 0, 2]): vals[k] = digit before the
    k-th letter (vals[m] = digit after the last) — the TeX convention
    PatternParser feeds the tree with."""
    letters: list[str] = []
    vals = [0]
    for ch in pat:
        if ch.isdigit():
            vals[-1] = int(ch)
        else:
            letters.append(ch)
            vals.append(0)
    return "".join(letters), vals


class HyphenationPatterns:
    """HyphenationTree.hyphenate (HyphenationTree.cs:326-415) over a
    plain pattern list: normalize through the character classes
    (leading non-letters skipped, trailing dropped, interior -> not
    hyphenatable), check the exception list, else run the Liang
    interletter-value algorithm over the '.'-framed word; points are
    odd-valued interletter positions within [remain, len - push]; the
    result carries the synthetic 0 and len endpoints exactly like
    Hyphenation.GetHyphenationPoints."""

    def __init__(self, patterns, exceptions=None, classes=None):
        self.patterns = [_parse_pattern(p) for p in patterns]
        self.classes = dict(_DEFAULT_CLASSES if classes is None
                            else classes)
        self.exceptions = {}
        for exc in (exceptions or ()):
            word = exc.replace("-", "")
            pts, j = [], 0
            for part in exc.split("-")[:-1]:
                j += len(part)
                pts.append(j)
            self.exceptions[word] = pts

    def hyphenate(self, word: str, remain: int = 1,
                  push: int = 1) -> list[int] | None:
        ignore_begin = 0
        out: list[str] = []
        end_of_letters = False
        for i, ch in enumerate(word):
            nc = self.classes.get(ch)
            if nc is None:
                if i == ignore_begin:
                    ignore_begin += 1
                else:
                    end_of_letters = True
            elif end_of_letters:
                return None  # letter after an interior non-letter
            else:
                out.append(nc)
        norm = "".join(out)
        n = len(norm)
        if n < remain + push:
            return None
        points: list[int] = []
        if norm in self.exceptions:
            points = [j + ignore_begin for j in self.exceptions[norm]
                      if remain <= j < n - push]
        else:
            framed = "." + norm + "."
            il = [0] * (n + 3)
            for i in range(0, n + 1):
                for letters, vals in self.patterns:
                    if framed.startswith(letters, i):
                        for k, v in enumerate(vals):
                            if i + k < len(il) and v > il[i + k]:
                                il[i + k] = v
            points = [i + ignore_begin for i in range(n)
                      if il[i + 1] & 1 and remain <= i <= n - push]
        if not points:
            return None
        return [0] + points + [n]


def hyphenation_decompose(token: str, hyphenator: HyphenationPatterns,
                          dictionary: set[str],
                          min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                          min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                          max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                          only_longest_match: bool = False) -> list[str]:
    """HyphenationCompoundWordTokenFilter.DecomposeInternal
    (HyphenationCompoundWordTokenFilter.cs:162-228) — including the
    genitive-s quirk: when the dictionary misses a part, the part one
    char shorter is tried WITHOUT re-checking minSubwordSize."""
    if len(token) < min_word_size:
        return []
    hyp = hyphenator.hyphenate(token, 1, 1)
    if hyp is None:
        return []
    low = token.lower()
    parts: list[str] = []
    for i in range(len(hyp)):
        start = hyp[i]
        longest: str | None = None
        for j in range(1, len(hyp) - i):
            plen = hyp[i + j] - start
            if plen > max_subword_size:
                break
            if plen < min_subword_size:
                continue
            cand = None
            if low[start:start + plen] in dictionary:
                cand = low[start:start + plen]
            elif low[start:start + plen - 1] in dictionary:
                cand = low[start:start + plen - 1]
            if cand is not None:
                if only_longest_match:
                    if longest is None or len(longest) < len(cand):
                        longest = cand
                else:
                    parts.append(cand)
        if only_longest_match and longest is not None:
            parts.append(longest)
    return parts


def hyphenation_compound_tokens(text, hyphenator, dictionary,
                                **kw) -> list[tuple[str, int]]:
    """Standard chain + hyphenation-decompounded parts stacked at the
    compound's position (original token always kept)."""
    out: list[tuple[str, int]] = []
    for tok, pos in tokenize_standard(text):
        out.append((tok, pos))
        out.extend((p, pos)
                   for p in hyphenation_decompose(tok, hyphenator,
                                                  dictionary, **kw))
    return out


def hyphenation_compound_analyzer(hyphenator, dictionary, **kw):
    """analyzer= callable for the index builders."""
    dic = {w.lower() for w in dictionary}

    def analyze(text):
        return hyphenation_compound_tokens(text, hyphenator, dic, **kw)
    return analyze
