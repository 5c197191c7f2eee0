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
