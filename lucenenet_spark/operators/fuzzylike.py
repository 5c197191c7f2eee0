"""contrib Queries completions: FuzzyLikeThisQuery, SimilarityQueries,
TermsFilter.

- fuzzy_like_this_query — src/contrib/Queries/FuzzyLikeThisQuery.cs:
  "fuzzifies" free text against the index vocabulary.  AddTerms
  (:AddTerms) enumerates, per analyzed source term, the vocabulary
  variants within FuzzyTermEnum's similarity bound (sim = 1 -
  dist/min(len), prefix pinned), keeps the best MAX_VARIANTS_PER_TERM
  per term, resolves one df per source term (the EXACT term's df when
  it exists, else the integer-average of the variants' dfs), rescores
  each variant sim² × ClassicSimilarity idf (ln(N/(df+1)) + 1), keeps
  the global top max_num_terms, and Rewrite groups the survivors into
  per-source-term SHOULD blocks under one outer SHOULD bool.

  Spark shape: selection is ONE vocabulary-scale job (term_stats scan
  with the fuzzy bound as a JVM levenshtein predicate — the same tier
  as SpellChecker's suggest scan) collecting only surviving variant
  rows to the driver; queue math is driver-side on ≤ 50×|terms| rows;
  the returned ast.Bool then scores hits fully distributed.  Deviations
  (documented): queue ties are made deterministic — per-term variants
  order by (sim DESC, term ASC), the global cut by (score DESC, term
  ASC) — and hit scoring runs under the engine's active Similarity with
  the selection boost folded in (the reference wraps variants in a
  FuzzyTermQuery that disables idf since the boost already carries it;
  under BM25 the same fold applies).  The DuckDB oracle reproduces the
  entire selection pipeline in SQL, so every cut is cross-checked.

- form_similar_query — src/contrib/Queries/Similar/
  SimilarityQueries.cs:81-110: every unique analyzed word of the body
  as an optional TermQuery, first-occurrence order, optional extra stop
  set, fail-safe clause cap.

- terms_filter — src/contrib/Queries/TermsFilter.cs: docs containing
  ANY of a term set, constant-score filter semantics; on this engine
  that is exactly a BooleanFilter SHOULD union, so the helper returns
  one (sorted unique terms, matching the reference's sorted set).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import functions as F

from ..analysis.tokenizers import tokenize_standard
from ..plans import ast

MAX_VARIANTS_PER_TERM = 50  # FuzzyLikeThisQuery.cs:41

# the tokenizer never emits a NUL byte, so this term hits no postings —
# the analogue of the reference's empty BooleanQuery (matches nothing)
_NO_MATCH = ast.Term("\x00")


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _classic_idf(df: int, n: int) -> float:
    return math.log(n / (df + 1.0)) + 1.0


def fuzzy_like_this_query(index, text: str, field: str = "text",
                          min_similarity: float = 0.5,
                          prefix_length: int = 0,
                          max_num_terms: int = 25,
                          max_variants_per_term: int = MAX_VARIANTS_PER_TERM
                          ) -> ast.Query:
    src_terms: list[str] = []
    for t, _ in tokenize_standard(text):
        if t not in src_terms:
            src_terms.append(t)
    if not src_terms:
        return _NO_MATCH

    n = index.n_docs
    vocab = index.term_stats().where(F.col("field") == field)
    conds = []
    for s in src_terms:
        c = (F.levenshtein(F.col("term"), F.lit(s))
             <= F.floor(F.lit(1.0 - min_similarity)
                        * F.least(F.lit(len(s)), F.length("term"))))
        if prefix_length > 0:
            c = c & F.col("term").startswith(s[:prefix_length])
        conds.append(c)
    cand = (vocab.where(reduce(lambda a, b: a | b, conds))
            .select("term", "df").collect())

    exact_df = {r["term"]: int(r["df"]) for r in cand}
    scored: list[tuple[float, str, str]] = []  # (score, variant, src)
    for s in src_terms:
        variants = []
        for r in cand:
            t = r["term"]
            if prefix_length > 0 and not t.startswith(s[:prefix_length]):
                continue
            dist = _levenshtein(t, s)
            sim = 1.0 - dist / min(len(t), len(s))
            if sim >= min_similarity:
                variants.append((sim, t, int(r["df"])))
        if not variants:
            continue
        df = exact_df.get(s)
        if not df:  # no direct match: integer-average over ALL
            # qualifying variants (pre-cap totals, FuzzyLikeThisQuery.cs
            # AddTerms accumulates df over every enumerated variant)
            df = sum(v[2] for v in variants) // len(variants)
        variants.sort(key=lambda v: (-v[0], v[1]))
        variants = variants[:max_variants_per_term]
        idf = _classic_idf(df, n)
        for sim, t, _ in variants:
            scored.append((sim * sim * idf, t, s))

    scored.sort(key=lambda v: (-v[0], v[1]))
    scored = scored[:max_num_terms]

    groups: dict[str, list[tuple[float, str]]] = {}
    for score, t, s in scored:
        groups.setdefault(s, []).append((score, t))
    clauses: list[ast.Query] = []
    for s in src_terms:
        if s not in groups:
            continue
        terms = tuple(ast.Term(t, field=field, boost=score)
                      for score, t in groups[s])
        clauses.append(terms[0] if len(terms) == 1
                       else ast.Bool(should=terms))
    if not clauses:
        return _NO_MATCH
    return ast.rewrite(ast.Bool(should=tuple(clauses)))


def form_similar_query(body: str, field: str = "text",
                       stop: set[str] | None = None) -> ast.Query:
    """SimilarityQueries.FormSimilarQuery: unique analyzed words as
    optional clauses, clause cap as the fail-safe."""
    clauses: list[ast.Query] = []
    seen: set[str] = set()
    for w, _ in tokenize_standard(body):
        if (stop and w in stop) or w in seen:
            continue
        seen.add(w)
        clauses.append(ast.Term(w, field=field))
        if len(clauses) >= ast.MAX_CLAUSE_COUNT:
            break
    if not clauses:
        return _NO_MATCH
    return ast.rewrite(ast.Bool(should=tuple(clauses)))


def terms_filter(terms: list[str], field: str = "text") -> ast.BooleanFilter:
    """TermsFilter: OR-bitset over a term set (sorted unique, matching
    the reference's SortedSet storage)."""
    return ast.BooleanFilter(
        should=tuple(ast.Term(t, field=field) for t in sorted(set(terms))))
