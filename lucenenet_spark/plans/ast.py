"""Query AST — the logical plan layer.

Mirrors the reference Query tree (SURVEY.md §2.4-2.6): TermQuery,
BooleanQuery (MUST/SHOULD/MUST_NOT + minimumNumberShouldMatch,
src/Lucene.Net/Search/BooleanQuery.cs), PhraseQuery (exact + sloppy,
src/Lucene.Net/Search/PhraseQuery.cs), DisjunctionMaxQuery, the
MultiTermQuery family (Prefix/Wildcard/Fuzzy/TermRange,
src/Lucene.Net/Search/MultiTermQuery.cs), MatchAllDocsQuery,
ConstantScoreQuery and FilteredQuery.  Construction-time rewrites the
reference does during Query.Rewrite (1-clause boolean collapse
BooleanQuery.cs:454-471, 1-term phrase fold PhraseQuery.cs:283-291) are
applied by `rewrite()`.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

DEFAULT_FIELD = "text"
MAX_CLAUSE_COUNT = 1024  # src/Lucene.Net/Search/BooleanQuery.cs:63


class Query:
    boost: float = 1.0

    def boosted(self, factor: float) -> "Query":
        return replace(self, boost=self.boost * factor)


@dataclass(frozen=True)
class Term(Query):
    term: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase(Query):
    """terms[i] sits at query position offsets[i] (holes allowed: a removed
    stopword leaves a gap, mirroring query-side analysis)."""
    terms: tuple[str, ...]
    field: str = DEFAULT_FIELD
    slop: int = 0
    offsets: tuple[int, ...] | None = None
    boost: float = 1.0

    def resolved_offsets(self) -> tuple[int, ...]:
        return self.offsets if self.offsets is not None else tuple(range(len(self.terms)))


@dataclass(frozen=True)
class MultiPhrase(Query):
    """Phrase with term ALTERNATIVES per position
    (src/Lucene.Net/Search/MultiPhraseQuery.cs): terms_at[i] is the set of
    acceptable terms at query position offsets[i]; a doc matches where
    every position has one of its alternatives at the aligned spot.
    idf = sum over ALL alternative terms (MultiPhraseWeight ctor)."""
    terms_at: tuple[tuple[str, ...], ...]
    field: str = DEFAULT_FIELD
    offsets: tuple[int, ...] | None = None
    boost: float = 1.0

    def resolved_offsets(self) -> tuple[int, ...]:
        return (self.offsets if self.offsets is not None
                else tuple(range(len(self.terms_at))))


@dataclass(frozen=True)
class Bool(Query):
    must: tuple[Query, ...] = ()
    should: tuple[Query, ...] = ()
    must_not: tuple[Query, ...] = ()
    min_should_match: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class DisMax(Query):
    queries: tuple[Query, ...]
    tie: float = 0.0
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix(Query):
    prefix: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard(Query):
    """`*` = any run, `?` = one char (src/Lucene.Net/Search/WildcardTermEnum.cs)."""
    pattern: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy(Query):
    """similarity = 1 - edit_dist/min(len(term),len(candidate)), keep
    candidates with similarity >= min_similarity; each expanded term scored
    as a Term with boost (sim - min)/(1 - min)
    (src/Lucene.Net/Search/FuzzyTermEnum.cs:135-183, FuzzyQuery.cs:46-50)."""
    term: str
    field: str = DEFAULT_FIELD
    min_similarity: float = 0.5
    prefix_length: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class TermRange(Query):
    lower: str | None
    upper: str | None
    field: str = DEFAULT_FIELD
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAll(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScore(Query):
    """Uniform score = boost for every matching doc
    (src/Lucene.Net/Search/ConstantScoreQuery.cs)."""
    query: Query = field(default_factory=MatchAll)
    boost: float = 1.0


@dataclass(frozen=True)
class Filtered(Query):
    """query AND an unscored stored-field predicate (FilteredQuery.cs);
    predicate is a SQL boolean expression over the stored table's columns."""
    query: Query
    predicate: str
    boost: float = 1.0


@dataclass(frozen=True)
class NumericRange(Query):
    """Constant-score numeric range over a stored column. The reference
    decomposes ranges into trie terms (src/Lucene.Net/Search/
    NumericRangeQuery.cs, Util/NumericUtils.cs:369-414); on Spark the
    column already exists, so this lowers to a native BETWEEN predicate
    (Catalyst pushdown) — SURVEY §2.6."""
    column: str
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class Boosting(Query):
    """contrib BoostingQuery (src/contrib/Queries/BoostingQuery.cs):
    score docs by `match`; docs ALSO matching `context` are multiplied by
    context_boost (<1 demotes them; context itself contributes no score)."""
    match: Query
    context: Query
    context_boost: float = 0.5
    boost: float = 1.0


@dataclass(frozen=True)
class DedupByKey(Query):
    """contrib DuplicateFilter (src/contrib/Queries/DuplicateFilter.cs):
    among matching docs, keep one per stored key value (KM_USE_FIRST_
    OCCURRENCE analogue: the lowest doc_id wins)."""
    query: Query
    key_col: str
    boost: float = 1.0


def rewrite(q: Query) -> Query:
    """Reference construction-time rewrites, to fixpoint-in-one-pass."""
    if isinstance(q, Bool):
        must = tuple(rewrite(c) for c in q.must)
        should = tuple(rewrite(c) for c in q.should)
        must_not = tuple(rewrite(c) for c in q.must_not)
        # 1-clause collapse with boost folding (BooleanQuery.cs:454-471)
        if len(must) == 1 and not should and not must_not:
            return rewrite(must[0].boosted(q.boost))
        if len(should) == 1 and not must and not must_not and q.min_should_match <= 1:
            return rewrite(should[0].boosted(q.boost))
        n_clauses = len(must) + len(should) + len(must_not)
        if n_clauses > MAX_CLAUSE_COUNT:
            raise ValueError(f"TooManyClauses: {n_clauses} > {MAX_CLAUSE_COUNT}")
        return replace(q, must=must, should=should, must_not=must_not)
    if isinstance(q, Phrase) and len(q.terms) == 1 and q.offsets is None:
        # 1-term phrase -> TermQuery (PhraseQuery.cs:283-291)
        return Term(q.terms[0], q.field, q.boost)
    if isinstance(q, MultiPhrase) and all(len(a) == 1 for a in q.terms_at):
        # no alternatives anywhere -> plain PhraseQuery
        return rewrite(Phrase(tuple(a[0] for a in q.terms_at), q.field,
                              0, q.offsets, q.boost))
    if isinstance(q, DisMax):
        return replace(q, queries=tuple(rewrite(c) for c in q.queries))
    if isinstance(q, (ConstantScore, Filtered, DedupByKey)):
        return replace(q, query=rewrite(q.query))
    if isinstance(q, Boosting):
        return replace(q, match=rewrite(q.match), context=rewrite(q.context))
    return q
