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


def _is_decent(s: str) -> bool:
    """Syns2Index.IsDecent (Syns2Index.cs:190-205): letters only — no
    spaces, digits, hyphens or apostrophes."""
    return bool(s) and all(c.isalpha() for c in s)


def parse_wn_prolog(lines) -> dict[str, tuple[str, ...]]:
    """Syns2Index's wn_s.pl ingestion (Syns2Index.cs:123-179,251-283)
    as a map builder: parse the WordNet prolog synset file into the
    word -> synonyms dict that `expand`/`lookup`/`synonym_analyzer`
    consume.

    Mirrors the reference line parser literally: every line must start
    with ``s(``; the synset number is the text up to the first comma;
    the word is the text between the first pair of single quotes
    (doubled-quote escapes are handled the way the reference handles
    them — the scan stops at the first closing quote, so a word
    containing ``''`` truncates there, exactly as Substring/IndexOf do),
    lowercased; words that are not all-letters are rejected (ndecent).
    A word's synonyms are the union of the words of every synset it
    appears in, minus itself, letters-only, SORTED (the reference's
    SortedList walk); words with zero surviving synonyms are omitted
    (``if (n > 0)``, :235)."""
    word2nums: dict[str, list[str]] = {}
    num2words: dict[str, list[str]] = {}
    for line in lines:
        line = line.rstrip("\n")
        if not line:
            continue
        if not line.startswith("s("):
            raise ValueError(f"OUCH: {line}")
        body = line[2:]
        num = body[:body.index(",")]
        q1 = body.index("'")
        rest = body[q1 + 1:]
        q2 = rest.index("'")
        word = rest[:q2].lower().replace("''", "'")
        if not _is_decent(word):
            continue
        word2nums.setdefault(word, []).append(num)
        num2words.setdefault(num, []).append(word)
    out: dict[str, tuple[str, ...]] = {}
    for word, nums in word2nums.items():
        syns = {w for n in nums for w in num2words[n]}
        syns.discard(word)
        syn_list = sorted(w for w in syns if _is_decent(w))
        if syn_list:
            out[word] = tuple(syn_list)
    return out


def load_wn_prolog(path: str) -> dict[str, tuple[str, ...]]:
    """File form of parse_wn_prolog (the Syns2Index CLI contract)."""
    with open(path, encoding="utf-8", errors="replace") as fh:
        return parse_wn_prolog(fh)


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
