"""CJK bigram analysis (contrib Analyzers/CJK).

CJKTokenizer (src/contrib/Analyzers/CJK/CJKTokenizer.cs) segments mixed
text into:
- latin/digit runs: one lowercased token per run (the SINGLE_TOKEN_TYPE
  path), and
- CJK runs (Han ideographs, hiragana, katakana, hangul): OVERLAPPING
  BIGRAMS — "C1C2C3" emits "C1C2", "C2C3" (the DOUBLE_TOKEN_TYPE path
  with preIsTokened backtracking); an isolated CJK char emits itself.

Positions advance by one per emitted token (each bigram is its own
position — the reference emits them as consecutive tokens, which is
what makes CJK phrase queries work at slop 0).  CJKAnalyzer then
applies the English stop set to the latin tokens
(CJKAnalyzer.cs: StopFilter over STOP_WORDS), leaving holes.
"""

from __future__ import annotations

from .tokenizers import ENGLISH_STOP_WORDS, MAX_TOKEN_LENGTH

_CJK_RANGES = (
    (0x1100, 0x11FF),    # hangul jamo
    (0x3040, 0x309F),    # hiragana
    (0x30A0, 0x30FF),    # katakana
    (0x3400, 0x4DBF),    # CJK ext A
    (0x4E00, 0x9FFF),    # CJK unified ideographs
    (0xAC00, 0xD7AF),    # hangul syllables
    (0xF900, 0xFAFF),    # CJK compatibility ideographs
    (0xFF65, 0xFFDC),    # halfwidth katakana/hangul forms
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _is_latin(ch: str) -> bool:
    return ch.isascii() and ch.isalnum() or ch in "_+#"  # CJKTokenizer.cs charset


def cjk_tokens(text: str | None, stopwords=ENGLISH_STOP_WORDS
               ) -> list[tuple[str, int]]:
    """(token, position) under the CJK bigram spec; stop/length removal
    leaves position holes like the standard chain."""
    if not text:
        return []
    out: list[tuple[str, int]] = []
    pos = 0
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if _is_latin(ch):
            j = i
            while j < n and _is_latin(text[j]):
                j += 1
            tok = text[i:j].lower()
            if len(tok) <= MAX_TOKEN_LENGTH and (
                    not stopwords or tok not in stopwords):
                out.append((tok, pos))
            pos += 1
            i = j
        elif _is_cjk(ch):
            j = i
            while j < n and _is_cjk(text[j]):
                j += 1
            run = text[i:j]
            if len(run) == 1:
                out.append((run, pos))
                pos += 1
            else:
                for k in range(len(run) - 1):
                    out.append((run[k:k + 2], pos))
                    pos += 1
            i = j
        else:
            i += 1
    return out


def cjk_analyzer(stopwords=ENGLISH_STOP_WORDS):
    """analyzer= callable for the index builders (CJKAnalyzer chain)."""
    def analyze(text):
        return cjk_tokens(text, stopwords)
    return analyze


# --- ChineseAnalyzer (contrib Analyzers/Cn) ---------------------------
#
# ChineseTokenizer (src/contrib/Analyzers/Cn/ChineseTokenizer.cs:145-168)
# differs from CJKTokenizer: each OtherLetter (Lo) char is its OWN
# token, while Ll/Lu/Nd chars accumulate into a lowercased run.
# ChineseFilter (ChineseFilter.cs:56-115) then drops its 30-word English
# stop set, single-char latin tokens, and tokens starting with a digit
# ("numeric tokens are removed").  The filter does not track skipped
# positions, so surviving tokens sit at CONSECUTIVE positions (no
# holes) — pinned by test_chinese_no_position_holes.

CHINESE_STOP_WORDS = frozenset(
    "and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split())


def _cat(ch: str) -> str:
    import unicodedata
    return unicodedata.category(ch)


def chinese_tokens(text: str | None) -> list[tuple[str, int]]:
    """(token, position) under the ChineseAnalyzer chain."""
    if not text:
        return []
    raw: list[str] = []
    buf: list[str] = []
    for ch in text:
        c = _cat(ch)
        if c in ("Ll", "Lu", "Nd"):
            buf.append(ch.lower())
            if len(buf) == MAX_TOKEN_LENGTH:
                raw.append("".join(buf))
                buf = []
        elif c == "Lo":
            if buf:
                raw.append("".join(buf))
                buf = []
            raw.append(ch)
        else:
            if buf:
                raw.append("".join(buf))
                buf = []
    if buf:
        raw.append("".join(buf))
    out: list[tuple[str, int]] = []
    pos = 0
    for tok in raw:
        if tok in CHINESE_STOP_WORDS:
            continue
        c0 = _cat(tok[0])
        if c0 == "Lo" or (c0 in ("Ll", "Lu") and len(tok) > 1):
            out.append((tok, pos))
            pos += 1
        # digits-first and single-char latin tokens are dropped
    return out


def chinese_analyzer():
    """analyzer= callable for the index builders (ChineseAnalyzer chain)."""
    def analyze(text):
        return chinese_tokens(text)
    return analyze
