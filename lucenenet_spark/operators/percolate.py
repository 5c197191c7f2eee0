"""Percolation: match a REGISTERED QUERY SET against a document stream.

The reference's MemoryIndex (src/contrib/Memory/MemoryIndex.cs:66-123)
inverts ONE document into RAM so stored queries can be run against it —
the classic percolator building block ("which of my K alerts/routes
does this incoming document match?").  A row-at-a-time MemoryIndex is
the wrong shape for Spark: it would mean K query evaluations of Python
per document.  Re-expressed Spark-first, the direction inverts — the K
queries are compiled ONCE (driver-side) into JVM boolean column
expressions over the document's token array (analysis/exprs.py keeps
the whole standard chain inside WholeStageCodegen), and a single narrow
scan evaluates every registered query against every document:

    percolate(docs, {"alert1": ast.Term("spark"), ...})
      -> DataFrame(doc_id, query_id)   # one row per (doc, matching query)

Zero shuffles, no Python in the row path, and the scan parallelism is
the input partitioning — at 100 TB this is a map-only pass whose cost
is one tokenization per document regardless of K (conditions share the
tokens array via a single projected column).

Match semantics follow the reference scorers (matching only — the
percolation contract; scores need corpus-level stats a single stream
batch does not define, which is also why MemoryIndex scores are
documented as relative-to-one-doc, MemoryIndex.cs:104-110):

- Term: doc's indexed tokens contain the term (TermScorer non-empty).
- Phrase (slop=0, holes allowed): some anchor position aligns every
  query offset, positions counted over the RAW token stream so removed
  stopwords leave real gaps (ExactPhraseScorer semantics).
- MultiPhrase: per-position alternative sets (MultiPhraseQuery.cs).
- Bool: every MUST, no MUST_NOT, and >= max(min_should_match, 1 if no
  MUST else 0) SHOULD clauses (BooleanScorer2 required/prohibited/
  optional contract, src/Lucene.Net/Search/BooleanScorer2.cs).
- Prefix/Wildcard/Regex/TermRange: some INDEXED token satisfies the
  term predicate (MultiTermQuery-as-filter rewrite).
- Fuzzy: some indexed token within FuzzyTermEnum's similarity bound
  (1 - dist/min(len) >= min_similarity, prefix pinned,
  src/Lucene.Net/Search/FuzzyTermEnum.cs:135-183) — here levenshtein
  runs against the DOCUMENT's own tokens, exactly MemoryIndex's
  single-doc term enumeration.
- NumericRange/FieldScore/MatchAll/ConstantScore/Filtered/DisMax/
  Boosting: native column predicates / delegation, see _compile.

Queries a percolator cannot answer without corpus stats or positions
beyond slop=0 (sloppy phrases, spans, payloads, MoreLikeThis) raise
NotImplementedError at COMPILE time — the caller finds out before any
job runs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis.exprs import is_indexed_token, standard_tokens
from ..analysis.tokenizers import ENGLISH_STOP_WORDS, MAX_TOKEN_LENGTH
from ..plans import ast
from ..plans.lowering import wildcard_to_regex

_TOK = "__perc_toks"


def _indexable(term: str) -> bool:
    """Would this query term survive the standard chain? Stopword or
    over-length query terms hit no postings in a standard-analyzer index
    (StopFilter removes them at index time), so they match nothing."""
    return len(term) <= MAX_TOKEN_LENGTH and term not in ENGLISH_STOP_WORDS


def _any_token(toks: Column, pred) -> Column:
    """EXISTS over the doc's INDEXED tokens (stopwords in the raw array
    are position holes, never match candidates)."""
    return F.exists(toks, lambda x: is_indexed_token(x) & pred(x))


def _phrase_cond(toks: Column, terms_at: list[tuple[str, ...]],
                 offsets: list[int]) -> Column:
    """Anchor-scan exact phrase: some i has an acceptable term at every
    i + offset.  element_at is 1-based; offsets are raw-stream positions
    so stopword holes demand a real gap, like ExactPhraseScorer."""
    span = max(offsets) + 1

    def at(i: Column, off: int, alts: tuple[str, ...]) -> Column:
        tok = F.element_at(toks, i + F.lit(off + 1))
        return tok.isin(*alts) if len(alts) > 1 else tok == F.lit(alts[0])

    def anchor_ok(i: Column) -> Column:
        return reduce(lambda a, b: a & b,
                      (at(i, off, alts)
                       for off, alts in zip(offsets, terms_at)))

    return (F.size(toks) >= F.lit(span)) & F.exists(
        F.sequence(F.lit(0), F.size(toks) - F.lit(span)), anchor_ok)


def _compile(q: ast.Query, toks: Column) -> Column:
    """Query AST -> JVM boolean Column over the raw token array."""
    if isinstance(q, ast.Term):
        if not _indexable(q.term):
            return F.lit(False)
        return F.array_contains(toks, q.term)
    if isinstance(q, ast.Phrase):
        if q.slop > 0:
            raise NotImplementedError(
                "percolate: sloppy phrases need the positional walk "
                "(functions/sloppy.py) — register slop=0 phrases or "
                "search a built index")
        terms = [t for t in q.terms]
        if not all(_indexable(t) for t in terms):
            return F.lit(False)
        return _phrase_cond(toks, [(t,) for t in terms],
                            list(q.resolved_offsets()))
    if isinstance(q, ast.MultiPhrase):
        alts = [tuple(t for t in a if _indexable(t)) for a in q.terms_at]
        if any(not a for a in alts):
            return F.lit(False)
        return _phrase_cond(toks, alts, list(q.resolved_offsets()))
    if isinstance(q, ast.Bool):
        must = [_compile(c, toks) for c in q.must]
        must_not = [_compile(c, toks) for c in q.must_not]
        should = [_compile(c, toks) for c in q.should]
        cond = F.lit(True)
        for c in must:
            cond = cond & c
        for c in must_not:
            cond = cond & ~c
        # BooleanScorer2: with no required clauses at least one optional
        # must match; minimumNumberShouldMatch tightens either way
        need = max(q.min_should_match, 0 if q.must else (1 if should else 0))
        if should and need > 0:
            n_match = reduce(lambda a, b: a + b,
                             (c.cast("int") for c in should))
            cond = cond & (n_match >= F.lit(need))
        return cond
    if isinstance(q, ast.DisMax):
        return reduce(lambda a, b: a | b,
                      (_compile(c, toks) for c in q.queries))
    if isinstance(q, ast.Prefix):
        return _any_token(toks, lambda x: x.startswith(q.prefix))
    if isinstance(q, ast.Wildcard):
        rx = wildcard_to_regex(q.pattern)
        return _any_token(toks, lambda x: x.rlike(rx))
    if isinstance(q, ast.Regex):
        return _any_token(toks, lambda x: x.rlike(q.pattern))
    if isinstance(q, ast.TermRange):
        if q.collation is not None:
            raise NotImplementedError(
                "percolate: collated TermRange not supported")

        def in_range(x: Column) -> Column:
            c = F.lit(True)
            if q.lower is not None:
                c = c & (x >= q.lower if q.include_lower else x > q.lower)
            if q.upper is not None:
                c = c & (x <= q.upper if q.include_upper else x < q.upper)
            return c

        return _any_token(toks, in_range)
    if isinstance(q, ast.Fuzzy):
        # FuzzyTermEnum bound: sim = 1 - dist/min(|q|,|cand|) >= min_sim
        # <=> dist <= (1-min_sim) * min(|q|,|cand|); prefix pinned
        term, pl = q.term, q.prefix_length

        def close(x: Column) -> Column:
            budget = F.floor(
                F.lit(1.0 - q.min_similarity)
                * F.least(F.lit(len(term)), F.length(x)))
            c = F.levenshtein(x, F.lit(term)) <= budget
            if pl > 0:
                c = c & x.startswith(term[:pl])
            return c

        return _any_token(toks, close)
    if isinstance(q, ast.NumericRange):
        col, c = F.col(q.column), F.lit(True)
        if q.lower is not None:
            c = c & (col >= q.lower if q.include_lower else col > q.lower)
        if q.upper is not None:
            c = c & (col <= q.upper if q.include_upper else col < q.upper)
        return c
    if isinstance(q, ast.MatchAll) or isinstance(q, ast.FieldScore):
        return F.lit(True)
    if isinstance(q, ast.ConstantScore):
        return _compile(q.query, toks)
    if isinstance(q, ast.Boosting):
        return _compile(q.match, toks)  # context only rescales, never gates
    if isinstance(q, ast.Filtered):
        return _compile(q.query, toks) & F.expr(q.predicate)
    if isinstance(q, ast.BooleanFilter):
        base = (reduce(lambda a, b: a | b,
                       (_compile(c, toks) for c in q.should))
                if q.should else F.lit(True))
        for c in q.must:
            base = base & _compile(c, toks)
        for c in q.must_not:
            base = base & ~_compile(c, toks)
        return base
    raise NotImplementedError(
        f"percolate: unsupported query node {type(q).__name__}")


def percolate(docs: DataFrame, queries: dict[str, ast.Query],
              text_col: str = "text", id_col: str = "doc_id",
              chunk_size: int = 1024) -> DataFrame:
    """One map-only pass matching every registered query against every
    document.  Returns (id_col, query_id) rows; a doc matching nothing
    emits nothing.  Works identically on a static frame and on a
    readStream micro-batch (pure narrow projection — the streaming
    percolator is `stream.transform(lambda df: percolate(df, qs))`).

    K-scaling: all K compiled conditions used to fuse into ONE Project,
    which is optimal at K <= ~10^3 but grows the Catalyst expression
    tree linearly — K ~= 10^5 alert rules would blow plan
    analysis/codegen.  Past `chunk_size` queries, the query set is
    chunked into bounded-width projections over ONE eagerly
    localCheckpoint-ed tokenization (lineage cut, so every union branch
    reads the materialized token blocks instead of re-tokenizing, and
    the blocks are GC-freed with the DataFrame — no cache leak).  Each
    Project stays <= chunk_size conditions wide; total work is still one
    tokenization + K condition evaluations per doc, now in K/chunk_size
    codegen-friendly stages.  (localCheckpoint needs a BATCH frame — on
    a readStream source past chunk_size, percolate inside foreachBatch,
    which is the NRT pattern streaming/nrt.py already uses.)"""
    compiled = [(qid, _compile(ast.rewrite(q), F.col(_TOK)))
                for qid, q in sorted(queries.items())]

    def fused(frame: DataFrame, chunk) -> DataFrame:
        arr = F.array_compact(
            F.array(*[F.when(cond, F.lit(qid)) for qid, cond in chunk]))
        return frame.select(F.col(id_col), F.explode(arr).alias("query_id"))

    toked = docs.withColumn(_TOK, standard_tokens(F.col(text_col)))
    if len(compiled) <= chunk_size:
        return fused(toked, compiled)
    toked = toked.localCheckpoint(eager=True)
    parts = [fused(toked, compiled[i:i + chunk_size])
             for i in range(0, len(compiled), chunk_size)]
    return reduce(DataFrame.unionByName, parts)
