"""Analyzer as Spark JVM column expressions (whole-stage-codegen path).

The standard analysis chain expressed entirely with built-in
pyspark.sql.functions so tokenization stays inside WholeStageCodegen —
no Python in the hot path.  Token/position semantics are the spec in
analysis/tokenizers.py (tests assert the two agree token-for-token).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenizers import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    STANDARD_SPLIT_PATTERN,
)

# Stable, sorted literal array of stopwords for array_contains-style filters.
_STOPWORDS_SORTED = sorted(ENGLISH_STOP_WORDS)


def raw_tokens(text: Column) -> Column:
    """All standard tokens in order (positions = array index), stopwords kept.

    split() emits empty strings at boundaries; filter() drops them without
    disturbing relative order, so array index == token position.
    """
    toks = F.split(F.lower(text), STANDARD_SPLIT_PATTERN)
    return F.filter(toks, lambda t: t != F.lit(""))


def is_indexed_token(tok: Column) -> Column:
    """True for tokens that survive StandardFilter+Stop+length chain."""
    return (F.length(tok) <= F.lit(MAX_TOKEN_LENGTH)) & (
        ~tok.isin(_STOPWORDS_SORTED)
    )


def indexed_tokens(text: Column) -> Column:
    """Tokens after stop/length removal (positions NOT preserved)."""
    return F.filter(raw_tokens(text), is_indexed_token)


def doc_len(text: Column) -> Column:
    """BM25 doc length = emitted-token count (norm analogue)."""
    return F.size(indexed_tokens(text))
