"""Synonyms: contrib WordNet re-expressed for Spark.

The reference ships three pieces (src/contrib/WordNet/):
- Syns2Index (Syns2Index.cs): compiles the WordNet prolog file into a
  word -> synonyms lookup index.  Here the lookup is simply a python
  dict (driver-side, broadcast by closure) — synonym vocabularies are
  tiny next to the corpus, exactly the "small dim table" case, so no
  index build is warranted.
- SynExpand (SynExpand.cs:86-130): QUERY-time expansion — tokenize the
  user's query, emit every query word as a SHOULD TermQuery, then every
  synonym of every word as a SHOULD TermQuery at `boost`, with GLOBAL
  dedup (the `already` list): a synonym equal to any query word, or
  already injected for an earlier word, is skipped.  `expand` mirrors
  that walk exactly and returns the ast.Bool.
- SynLookup (SynLookup.cs): plain word -> synonyms listing; `lookup`.

Index-time injection (the SynonymTokenFilter pattern: synonyms stacked
at the same position, posIncrement=0) is `synonym_analyzer` — a
drop-in for the builders' `analyzer=` seam.  Injected tokens land at
the ORIGINAL token's position (phrase/span queries treat them as
alternatives at that slot) and, like the reference's DocInverter which
counts every arriving token (fieldState.length++ regardless of
position increment), they count toward dl — mirrored token-for-token
by the oracle's synonym-injection CTE (oracle/sqlgen.base_ctes
synonyms=).

Synonym map values are expected in ANALYZED form (lowercase, already
normalized) — the same contract as Syns2Index, which stores normalized
words.
"""

from __future__ import annotations

from ..plans import ast
from .tokenizers import tokenize_standard


def lookup(word: str, syn_map: dict[str, tuple[str, ...]]) -> tuple[str, ...]:
    """SynLookup analogue."""
    return tuple(syn_map.get(word, ()))


def expand(query_text: str, syn_map: dict[str, tuple[str, ...]],
           field: str = ast.DEFAULT_FIELD, boost: float = 0.9) -> ast.Query:
    """SynExpand.Expand: flat SHOULD bool of query words (query-analyzed,
    first-occurrence order) plus globally-deduped synonyms at `boost`."""
    already: list[str] = []
    for t, _ in tokenize_standard(query_text):
        if t not in already:
            already.append(t)
    clauses: list[ast.Query] = [ast.Term(w, field=field) for w in already]
    for w in list(already):
        for syn in syn_map.get(w, ()):
            if syn not in already:
                already.append(syn)
                clauses.append(ast.Term(syn, field=field, boost=boost))
    return ast.rewrite(ast.Bool(should=tuple(clauses)))


def synonym_tokens(text: str | None,
                   syn_map: dict[str, tuple[str, ...]]
                   ) -> list[tuple[str, int]]:
    """Standard chain + synonyms stacked at the source token's position."""
    toks = tokenize_standard(text)
    out = list(toks)
    for t, p in toks:
        for syn in syn_map.get(t, ()):
            out.append((syn, p))
    return out


def synonym_analyzer(syn_map: dict[str, tuple[str, ...]]):
    """analyzer= callable for the index builders (index-time injection)."""
    def analyze(text):
        return synonym_tokens(text, syn_map)
    return analyze
