"""Highlighter: best-fragment extraction + term markup over a hit list.

Re-creates the contrib Highlighter pipeline (reference:
src/contrib/Highlighter/Highlighter.cs:73-178 GetBestFragments,
QueryScorer.cs:40-110 token scoring, SimpleFragmenter.cs:41-55 fragment
boundaries, SimpleHTMLFormatter.cs:37-52 <B>-wrapping) Spark-first:

  * Lucene re-tokenizes the stored text with the analyzer and walks the
    token stream once, opening a new fragment every `fragmentSize` chars
    and scoring each fragment by the summed weights of query tokens in it
    (QueryScorer: weight = term boost; equal-boost terms score 1 each).
  * Here the same walk is a set of JVM array expressions over the
    analyzer's token array: fragments are fixed windows of `frag_tokens`
    tokens (the token-count analogue of SimpleFragmenter's char budget —
    char offsets are not retained by the index spec), fragment score =
    number of query-term occurrences in the window, best fragment = max
    score with the EARLIEST window winning ties (Highlighter.cs keeps the
    first-encountered fragment on equal score in its FragmentQueue).
  * Markup wraps every query-term token of the winning window in
    <b>...</b> (SimpleHTMLFormatter defaults).

Everything is whole-stage-codegen'd column algebra (split/transform/
slice/filter/array_join) — no Python in the loop, and the operator runs
over the HIT LIST (top-k rows), never the corpus: at 100 TB the cost is
O(k), exactly like the reference highlighting one results page.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis.exprs import standard_tokens

__all__ = ["best_fragments", "highlight_expr", "html_encode",
           "gradient_color", "gradient_wrap", "span_best_fragments"]


def _wrap(tok: Column, qterms: list[str], pre: str, post: str) -> Column:
    return F.when(tok.isin(qterms),
                  F.concat(F.lit(pre), tok, F.lit(post))).otherwise(tok)


def highlight_expr(text: Column, qterms: list[str],
                   frag_tokens: int | None = 16,
                   pre: str = "<b>", post: str = "</b>") -> tuple[Column, ...]:
    """(frag_idx, frag_score, snippet) columns for one text column.

    Token spec = the index analyzer (exprs.standard_tokens) with stopwords
    KEPT in the window text — the snippet shows the stored surface, while
    scoring counts only the query's (already analyzed) terms, mirroring
    QueryScorer matching on the term text of the token stream.

    frag_tokens=None is the NullFragmenter
    (contrib/Highlighter/NullFragmenter.cs): the whole field is one
    fragment — every query term in the document gets wrapped.
    """
    toks = standard_tokens(text)
    if frag_tokens is None:
        score = F.size(F.filter(toks, lambda t: t.isin(qterms)))
        snippet = F.array_join(
            F.transform(toks, lambda t: _wrap(t, qterms, pre, post)), " ")
        return F.lit(0).cast("long"), score.cast("long"), snippet
    w = frag_tokens
    nfrag = F.greatest(F.lit(1), F.ceil(F.size(toks) / F.lit(w))
                       .cast("int"))
    # struct max: (score, -idx) — highest score, then earliest fragment
    frags = F.transform(
        F.sequence(F.lit(0), nfrag - 1),
        lambda i: F.struct(
            F.size(F.filter(F.slice(toks, i * w + 1, w),
                            lambda t: t.isin(qterms))).alias("m"),
            (-i).alias("ni"),
        ),
    )
    best = F.array_max(frags)
    idx = (-best["ni"]).cast("long")
    snippet = F.array_join(
        F.transform(F.slice(toks, (-best["ni"]) * w + 1, w),
                    lambda t: _wrap(t, qterms, pre, post)),
        " ",
    )
    return idx, best["m"].cast("long"), snippet


def best_fragments(hits: DataFrame, docs: DataFrame, qterms: list[str],
                   text_col: str = "text", id_col: str = "doc_id",
                   frag_tokens: int = 16, pre: str = "<b>",
                   post: str = "</b>") -> DataFrame:
    """GetBestFragments over a hit list: join the stored text back to the
    (doc_id, score) hits and attach (frag_idx, frag_score, snippet).

    The hit list is k rows, so the join broadcasts the hits against the
    doc store scan — O(k) work regardless of corpus size.
    """
    frag_idx, frag_score, snippet = highlight_expr(
        F.col(text_col), qterms, frag_tokens, pre, post)
    joined = docs.select(id_col, text_col).join(
        F.broadcast(hits), id_col)
    return (joined
            .select(F.col(id_col).alias("doc_id"), "score",
                    frag_idx.alias("frag_idx"),
                    frag_score.alias("frag_score"),
                    snippet.alias("snippet"))
            .orderBy(F.desc("score"), "doc_id"))


# ----------------------- formatting extras (contrib/Highlighter)


def html_encode(col: Column) -> Column:
    """SimpleHTMLEncoder (contrib/Highlighter/SimpleHTMLEncoder.cs):
    entity-escape & " < > in the stored text BEFORE markup is wrapped,
    so document text can never break the highlight HTML.  (The
    reference also numeric-escapes chars >= 127; left as-is here — the
    engine's snippets are unicode-clean.)"""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "\"", "&quot;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def _parse_hex_color(c: str) -> tuple[int, int, int]:
    c = c.lstrip("#")
    return int(c[0:2], 16), int(c[2:4], 16), int(c[4:6], 16)


def gradient_color(score: Column, max_score: float,
                   min_color: str = "#FFFFFF",
                   max_color: str = "#000080") -> Column:
    """GradientFormatter's color ramp
    (contrib/Highlighter/GradientFormatter.cs:134-170): per channel,
    ``min(cmin,cmax) + int(|cmin-cmax| * min(score,maxScore)/maxScore)``
    rendered as uppercase #RRGGBB.  Pure column algebra — each hit's
    term weight maps to a color with no Python in the row path."""
    lo = _parse_hex_color(min_color)
    hi = _parse_hex_color(max_color)
    rel = F.least(F.lit(float(max_score)), score.cast("double")) \
        / F.lit(float(max_score))

    def chan(cmin: int, cmax: int) -> Column:
        if cmin == cmax:
            v = F.lit(cmin)
        else:
            v = (F.lit(min(cmin, cmax))
                 + F.floor(F.lit(float(abs(cmin - cmax))) * rel)
                 .cast("int"))
        return F.lpad(F.upper(F.hex(v)), 2, "0")

    return F.concat(F.lit("#"), chan(lo[0], hi[0]), chan(lo[1], hi[1]),
                    chan(lo[2], hi[2]))


def gradient_wrap(tok: Column, term_scores: dict[str, float],
                  max_score: float, min_color: str = "#FFFFFF",
                  max_color: str = "#000080") -> Column:
    """HighlightTerm under GradientFormatter (GradientFormatter.cs:
    104-132): zero-score tokens pass through untouched; scored terms
    wrap in a font tag whose color interpolates with the term weight."""
    score = F.lit(0.0)
    for t, s in sorted(term_scores.items()):
        score = F.when(tok == t, F.lit(float(s))).otherwise(score)
    color = gradient_color(score, max_score, min_color, max_color)
    return F.when(
        score > 0.0,
        F.concat(F.lit('<font color="'), color, F.lit('">'), tok,
                 F.lit("</font>"))).otherwise(tok)


def span_best_fragments(searcher, span_query, frag_tokens: int = 16,
                        text_col: str = "content",
                        pre: str = "<b>", post: str = "</b>") -> "DataFrame":
    """SimpleSpanFragmenter analogue
    (contrib/Highlighter/SimpleSpanFragmenter.cs:60-90: a fragment
    boundary NEVER lands inside a span match — the fragmenter waits for
    the span end before breaking).  Set-oriented: the doc's span list
    comes from Searcher.span_filter_result (one aggregation), and the
    chosen window starts AT a span start, picked to cover the most
    complete spans — so a phrase/span match is always shown whole, where
    a count-based fragmenter could cut it mid-phrase.

    Returns (doc_id, frag_start, n_spans_in, snippet); every matching
    doc yields one row.  All column algebra over the hit list — O(hits),
    no Python in the row path."""
    from pyspark.sql import functions as F

    spans = searcher.span_filter_result(span_query)
    stored = searcher.index.stored
    id_col = searcher.index.id_col
    w = int(frag_tokens)
    joined = spans.join(
        stored.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        "doc_id")
    toks = standard_tokens(F.col(text_col))
    ps = F.col("positions")
    # candidate windows anchored at each span start; score = complete
    # spans inside [start, start + w)  (struct max tie-breaks earliest)
    cands = F.transform(ps, lambda p: F.struct(
        F.size(F.filter(ps, lambda q: (q["start"] >= p["start"])
                        & (q["end"] <= p["start"] + w))).alias("m"),
        (-p["start"]).alias("ns")))
    best = F.array_max(cands)
    start = -best["ns"]
    covered = lambda i: F.exists(  # noqa: E731
        ps, lambda p: (p["start"] <= i) & (i < p["end"]))
    snippet = F.array_join(
        F.transform(
            F.sequence(start, F.least(start + w - 1, F.size(toks) - 1)),
            lambda i: F.when(
                covered(i),
                F.concat(F.lit(pre), F.element_at(toks, i + 1),
                         F.lit(post))
            ).otherwise(F.element_at(toks, i + 1))),
        " ")
    return joined.select(
        "doc_id", start.alias("frag_start"),
        best["m"].alias("n_spans_in"), snippet.alias("snippet"))


def extract_terms(q, field: str | None = None,
                  prohibited: bool = False) -> list[tuple[str, float]]:
    """QueryTermExtractor.GetTerms (contrib/Highlighter/
    QueryTermExtractor.cs:42-120): walk the query tree collecting
    (term text, boost) pairs — boolean clauses recurse (MUST_NOT only
    under prohibited=True), phrases contribute each word, span trees
    contribute their leaves; multi-term expansions (prefix/wildcard/
    fuzzy) are skipped exactly like the reference's pre-rewrite
    extractor.  ``field`` filters to one field's terms."""
    from ..plans import ast

    def keep(f: str) -> bool:
        return field is None or f == field

    def walk(node) -> list[tuple[str, float]]:
        if isinstance(node, ast.Term):
            return [(node.term, node.boost)] if keep(node.field) else []
        if isinstance(node, ast.Bool):
            out = [p for c in node.must + node.should for p in walk(c)]
            if prohibited:
                out += [p for c in node.must_not for p in walk(c)]
            return out
        if isinstance(node, (ast.Phrase,)):
            return ([(t, node.boost) for t in node.terms
                     if t is not None] if keep(node.field) else [])
        if isinstance(node, ast.MultiPhrase):
            return ([(t, node.boost) for alts in node.terms_at
                     for t in alts] if keep(node.field) else [])
        if isinstance(node, ast.DisMax):
            return [p for c in node.queries for p in walk(c)]
        if isinstance(node, ast.SPAN_NODES):
            return [(t.term, t.boost) for t in ast.span_leaves(node)
                    if keep(t.field)]
        if isinstance(node, ast.Filtered):
            return walk(node.query)
        if isinstance(node, ast.Boosting):
            return walk(node.match)
        if isinstance(node, ast.ConstantScore):
            return walk(node.query)
        return []  # multi-term expansions / function queries: skipped

    seen: dict[str, float] = {}
    for t, b in walk(q):
        seen[t] = max(seen.get(t, 0.0), float(b))
    return sorted(seen.items())


def idf_weighted_terms(searcher, q, field: str = "content",
                       prohibited: bool = False) -> dict[str, float]:
    """GetIdfWeightedTerms (QueryTermExtractor.cs:55-79): each extracted
    term's boost is multiplied by the classic idf ln(N/(df+1))+1, df
    capped at N.  One term-dictionary lookup (metadata-scale) — feeds
    gradient_wrap for weight-colored highlighting."""
    import math

    terms = extract_terms(q, field=field, prohibited=prohibited)
    if not terms:
        return {}
    n = searcher.index.n_docs
    stats = searcher.index.term_stats()
    rows = (stats.where((F.col("field") == field)
                        & F.col("term").isin([t for t, _ in terms]))
            .select("term", "df").collect())
    dfs = {r["term"]: int(r["df"]) for r in rows}
    out = {}
    for t, b in terms:
        df = min(dfs.get(t, 0), n)
        out[t] = b * (math.log(n / (df + 1.0)) + 1.0)
    return out
