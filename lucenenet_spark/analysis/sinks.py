"""contrib Sinks + Miscellaneous token-stream utilities.

TeeSinkTokenFilter and its three contrib sink filters
(src/contrib/Analyzers/Sinks/: DateRecognizerSinkFilter,
TokenRangeSinkFilter, TokenTypeSinkFilter) plus the Miscellaneous
stream combinators (src/contrib/Analyzers/Miscellaneous/:
PrefixAwareTokenStream, PrefixAndSuffixAwareTokenFilter,
SingleTokenTokenStream, EmptyTokenStream).

Spark-first shape: a token stream here is the materialized list an
analyzer returns, so the tee is a single analysis pass whose side
outputs (sinks) are plain per-predicate partitions of the emitted
tokens — exactly what a `mapInPandas` over documents would emit as
extra columns.  No re-tokenization per sink (the reference's whole
point: one pass, many consumers).

Token tuples: (term, pos) or the offsets variant
(term, pos, start, end); predicates receive the full tuple.
"""

from __future__ import annotations

import re

from .tokenizers import (
    ACRONYM_RE, STANDARD_TOKEN_RE, tokenize_standard_offsets)

# StandardTokenizer.TOKEN_TYPES (StandardTokenizer.cs:64-81)
ALPHANUM, APOSTROPHE, ACRONYM = "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>"
COMPANY, EMAIL, HOST, NUM = "<COMPANY>", "<EMAIL>", "<HOST>", "<NUM>"

_EMAIL_RE = re.compile(
    r"[a-z0-9]+(?:[._-][a-z0-9]+)*@[a-z0-9]+(?:[.-][a-z0-9]+)+")
_APOS_RE = re.compile(r"[a-z]+(?:'[a-z]+)+")
_COMPANY_RE = re.compile(r"[a-z]+[&@][a-z]+")
_P, _HD = r"[_\-/.,]", r"[a-z]*[0-9][a-z0-9]*"
_NUM_RE = re.compile(
    rf"(?:[a-z0-9]+{_P})?{_HD}(?:{_P}[a-z0-9]+{_P}{_HD})*(?:{_P}[a-z0-9]+)?")
_HOST_RE = re.compile(r"[a-z0-9]+(?:\.[a-z0-9]+)+\.?")
_ALNUM_RE = re.compile(r"[a-z0-9]+")


def classify_token(tok: str) -> str:
    """JFlex type id for a raw (pre-StandardFilter) token, matching the
    alternation-order classification of tokenizers.STANDARD_ALTERNATION
    (so all-dotted digit runs label NUM here where JFlex says HOST —
    the documented deviation; bare alnum runs are ALPHANUM)."""
    if _EMAIL_RE.fullmatch(tok):
        return EMAIL
    if _APOS_RE.fullmatch(tok):
        return APOSTROPHE
    if _COMPANY_RE.fullmatch(tok):
        return COMPANY
    if _ALNUM_RE.fullmatch(tok):
        return ALPHANUM
    if _NUM_RE.fullmatch(tok):
        return NUM
    if ACRONYM_RE.fullmatch(tok):
        return ACRONYM
    if _HOST_RE.fullmatch(tok):
        return HOST
    return NUM


def tokenize_standard_typed(text: str) -> list[tuple[str, int, str]]:
    """(raw_token, position, type) triples — the tee's usual source."""
    if text is None:
        return []
    return [(tok, pos, classify_token(tok))
            for pos, tok in enumerate(STANDARD_TOKEN_RE.findall(text.lower()))]


def tee_sink(tokens, sink_filters: dict[str, object]):
    """TeeSinkTokenFilter (Lucene.Net.Analysis.TeeSinkTokenFilter): one
    pass over `tokens`, each sink filter's Accept() deciding membership
    independently.  Returns {sink_name: [token, ...]}; the main stream
    is `tokens` itself, unchanged.  Stateful filters (TokenRange) see
    tokens in stream order, like the reference."""
    out = {name: [] for name in sink_filters}
    for t in tokens:
        for name, pred in sink_filters.items():
            if pred(t):
                out[name].append(t)
    return out


def date_recognizer_sink(parse=None):
    """DateRecognizerSinkFilter.Accept: keep terms that parse as a
    date.  The reference delegates to DateTime.Parse(culture); here the
    engine's own date formats (queryparser/datetools) are the default
    parser, with `parse=` for custom cultures."""
    if parse is None:
        from ..queryparser.datetools import parse_date

        def parse(term):
            try:
                return parse_date(term) is not None
            except Exception:
                return False

    def accept(t) -> bool:
        return bool(parse(t[0]))
    return accept


def token_range_sink(lower: int, upper: int):
    """TokenRangeSinkFilter.Accept: tokens with stream ordinal in
    [lower, upper) — the counter increments for EVERY token seen
    (TokenRangeSinkFilter.cs:45-58)."""
    count = [0]

    def accept(t) -> bool:
        try:
            return lower <= count[0] < upper
        finally:
            count[0] += 1
    return accept


def token_type_sink(type_to_match: str):
    """TokenTypeSinkFilter.Accept: type attribute equality — use with
    tokenize_standard_typed triples."""
    def accept(t) -> bool:
        return len(t) > 2 and t[2] == type_to_match
    return accept


# ---- Miscellaneous stream combinators --------------------------------

def empty_token_stream() -> list:
    """EmptyTokenStream.cs: no tokens."""
    return []


def single_token_stream(term: str, pos: int = 0, start: int = 0,
                        end: int | None = None) -> list:
    """SingleTokenTokenStream.cs: exactly one token."""
    return [(term, pos, start, len(term) if end is None else end)]


def prefix_aware(prefix_tokens, suffix_tokens):
    """PrefixAwareTokenStream: emit the prefix stream, then the suffix
    stream with offsets shifted by the LAST prefix token's end offset
    (PrefixAndSuffixAwareTokenFilter.cs UpdateSuffixToken).  Positions
    renumber sequentially across the joined stream (each token carries
    posIncrement 1 in the reference's test usage).

    Tokens are (term, pos, start, end) 4-tuples
    (tokenize_standard_offsets shape)."""
    out = list(prefix_tokens)
    shift = out[-1][3] if out else 0
    base = (out[-1][1] + 1) if out else 0
    for i, (term, _pos, s, e) in enumerate(suffix_tokens):
        out.append((term, base + i, shift + s, shift + e))
    return out


def prefix_and_suffix_aware(prefix_tokens, input_tokens, suffix_tokens):
    """PrefixAndSuffixAwareTokenFilter: prefix + input + suffix, each
    later stream shifted past the previous one's end."""
    return prefix_aware(prefix_aware(prefix_tokens, input_tokens),
                        suffix_tokens)


def whitespace_tokens_offsets(text: str) -> list[tuple[str, int, int, int]]:
    """WhitespaceTokenizer with offsets — the tokenizer the reference's
    sink tests drive the tee with."""
    out = []
    for pos, m in enumerate(re.finditer(r"\S+", text or "")):
        out.append((m.group(0), pos, m.start(), m.end()))
    return out


__all__ = [
    "classify_token", "tokenize_standard_typed", "tee_sink",
    "date_recognizer_sink", "token_range_sink", "token_type_sink",
    "empty_token_stream", "single_token_stream", "prefix_aware",
    "prefix_and_suffix_aware", "whitespace_tokens_offsets",
    "tokenize_standard_offsets",
]
