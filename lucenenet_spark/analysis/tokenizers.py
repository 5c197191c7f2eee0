"""Tokenization — the single source of truth for analyzer semantics.

Re-creates the reference analysis chain (StandardTokenizer -> StandardFilter
-> LowerCaseFilter -> StopFilter; reference:
src/Lucene.Net/Analysis/Standard/StandardAnalyzer.cs:107-115) with
simplified-but-exactly-specified token rules so that FOUR independent
implementations agree token-for-token:

  1. pure-Python (this module)                      -- oracle / tests
  2. pandas vectorized (analysis/udfs.py)           -- Arrow UDF build path
  3. Spark JVM column expressions (analysis/exprs.py) -- codegen query path
  4. DuckDB SQL fragments (oracle/sqlgen.py)        -- driver correctness gate

Semantics (the spec):
- standard analyzer: lowercase the text, tokens = maximal runs of [a-z0-9],
  positions assigned over ALL tokens (0-based), then drop tokens longer than
  255 chars (reference max token length,
  src/Lucene.Net/Analysis/Standard/StandardAnalyzer.cs:124) and the 33-word
  English stop set (src/Lucene.Net/Analysis/StopAnalyzer.cs:134).  Stop
  removal KEEPS position holes (StopFilter with enablePositionIncrements,
  src/Lucene.Net/Analysis/StopFilter.cs:128-140) so phrase queries cannot
  match across a removed stopword.
- doc_len (the BM25 norm, analogue of .nrm byte counts,
  src/Lucene.Net/Index/NormsWriter.cs:159-186) counts tokens EMITTED by the
  chain, i.e. after stop removal.
- code analyzer (lang-keyed, the north-rule "code-aware tokenizer"):
  identifiers = maximal runs of [A-Za-z0-9_]; each identifier is split on
  snake_case and camelCase boundaries and digit runs; sub-tokens are
  lowercased and each occupies one position; no stop removal (code corpora
  should keep `if`/`in`/`for`).
"""

from __future__ import annotations

import re

# The exact 33-word English stop set of the reference
# (src/Lucene.Net/Analysis/StopAnalyzer.cs:134).
ENGLISH_STOP_WORDS: frozenset[str] = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these", "they",
        "this", "to", "was", "will", "with",
    }
)
assert len(ENGLISH_STOP_WORDS) == 33

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.cs:124

# Token = maximal run of lowercase alnum over lower()ed text.  Keep this
# regex in sync with exprs.py (JVM split pattern) and sqlgen.py.
STANDARD_TOKEN_RE = re.compile(r"[a-z0-9]+")
# The JVM/SQL split/extract patterns derived from the same class:
STANDARD_SPLIT_PATTERN = "[^a-z0-9]+"        # for Spark F.split(lower(x), ...)
STANDARD_EXTRACT_PATTERN = "[a-z0-9]+"       # for duckdb regexp_extract_all

# Code identifiers, then camel/snake/digit sub-splitting.
CODE_IDENT_RE = re.compile(r"[A-Za-z0-9_]+")
CODE_SUBTOKEN_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+")

# Languages routed to the code analyzer (PerFieldAnalyzerWrapper analogue,
# src/Lucene.Net/Analysis/PerFieldAnalyzerWrapper.cs, keyed on `lang`).
CODE_LANGS: frozenset[str] = frozenset(
    {"python", "java", "csharp", "c", "cpp", "go", "rust", "js",
     "javascript", "typescript", "scala", "kotlin", "ruby", "php"}
)


def tokenize_standard(text: str) -> list[tuple[str, int]]:
    """(term, position) pairs after the standard chain; holes preserved."""
    if text is None:
        return []
    out: list[tuple[str, int]] = []
    for pos, tok in enumerate(STANDARD_TOKEN_RE.findall(text.lower())):
        if len(tok) > MAX_TOKEN_LENGTH or tok in ENGLISH_STOP_WORDS:
            continue
        out.append((tok, pos))
    return out


def tokenize_code(text: str) -> list[tuple[str, int]]:
    """Code-aware: identifier extraction + camel/snake split, no stop set.

    Single-pass: CODE_SUBTOKEN_RE applied to the raw text yields exactly
    the per-identifier sub-tokens, because every character it can match is
    also an identifier character — `_`, whitespace and punctuation separate
    matches under both the two-pass (identifier, then sub-split) and the
    one-pass formulation, and positions increment once per sub-token
    either way. One findall per doc instead of one per identifier."""
    if text is None:
        return []
    out: list[tuple[str, int]] = []
    for pos, sub in enumerate(CODE_SUBTOKEN_RE.findall(text)):
        if len(sub) <= MAX_TOKEN_LENGTH:
            out.append((sub.lower(), pos))
    return out


_WS_RE = re.compile(r"\S+")
_LETTER_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def tokenize_whitespace(text: str) -> list[tuple[str, int]]:
    """WhitespaceTokenizer (src/Lucene.Net/Analysis/WhitespaceTokenizer.cs):
    maximal non-whitespace runs, case preserved, no filtering."""
    if text is None:
        return []
    return [(t, i) for i, t in enumerate(_WS_RE.findall(text))]


def tokenize_letter(text: str) -> list[tuple[str, int]]:
    """LetterTokenizer (CharTokenizer on IsLetter,
    src/Lucene.Net/Analysis/LetterTokenizer.cs): maximal letter runs,
    case preserved."""
    if text is None:
        return []
    return [(t, i) for i, t in enumerate(_LETTER_RE.findall(text))]


def tokenize_lowercase(text: str) -> list[tuple[str, int]]:
    """LowerCaseTokenizer = LetterTokenizer + LowerCaseFilter
    (src/Lucene.Net/Analysis/LowerCaseTokenizer.cs)."""
    return [(t.lower(), p) for t, p in tokenize_letter(text)]


def tokenize(text: str, lang: str | None = None) -> list[tuple[str, int]]:
    """Analyzer dispatch keyed on lang (PerFieldAnalyzerWrapper analogue)."""
    if lang is not None and lang.lower() in CODE_LANGS:
        return tokenize_code(text)
    return tokenize_standard(text)


def doc_length(text: str, lang: str | None = None) -> int:
    """Number of emitted tokens == BM25 doc length (norm analogue)."""
    return len(tokenize(text, lang))
