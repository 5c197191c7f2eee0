"""CharFilter / MappingCharFilter analogue (src/Lucene.Net/Analysis/
{CharFilter,MappingCharFilter,NormalizeCharMap}.cs): pre-tokenizer string
rewriting with greedy longest-match semantics.

The reference additionally corrects character OFFSETS through the
rewrite (CharFilter.CorrectOffset) because its positions are char
offsets; this engine's positions are token ordinals, which survive any
char-level rewrite unchanged — so no correction table is needed (a
documented simplification, not a gap).

ASCII folding (analysis/folding.py) is the 1:1 special case; this class
handles many-to-many mappings ("&" -> " and ", "ph" -> "f", ligatures).
"""

from __future__ import annotations

from .tokenizers import tokenize_standard


class MappingCharFilter:
    """Greedy longest-match rewriting, built once per analyzer
    (NormalizeCharMap's trie flattened to a first-char bucket table)."""

    def __init__(self, mappings: dict[str, str]):
        if any(not k for k in mappings):
            raise ValueError("empty mapping key")
        self._by_first: dict[str, list[tuple[str, str]]] = {}
        for k, v in mappings.items():
            self._by_first.setdefault(k[0], []).append((k, v))
        for cands in self._by_first.values():
            cands.sort(key=lambda kv: -len(kv[0]))  # longest match first

    def __call__(self, text: str | None) -> str | None:
        if text is None:
            return None
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            cands = self._by_first.get(text[i])
            if cands:
                for k, v in cands:
                    if text.startswith(k, i):
                        out.append(v)
                        i += len(k)
                        break
                else:
                    out.append(text[i])
                    i += 1
            else:
                out.append(text[i])
                i += 1
        return "".join(out)


def mapping_analyzer(mappings: dict[str, str], base=tokenize_standard):
    """Analyzer = CharFilter -> base chain (the reference wires CharFilters
    ahead of the tokenizer); plugs into build_*_index(analyzer=...) and
    QueryParser(analyzers={field: ...})."""
    f = MappingCharFilter(mappings)

    def analyze(text: str):
        return base(f(text))

    return analyze
