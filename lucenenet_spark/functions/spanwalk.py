"""NearSpansOrdered walk (src/Lucene.Net/Search/Spans/NearSpansOrdered.cs).

Operational port of the reference's ordered-span enumeration: the spans
of SpanNear(in_order=True) are NOT every position tuple satisfying the
slop bound — each match is formed by stretching the clause cursors into
order (StretchToOrder, NearSpansOrdered.cs:293-319) and then shrinking to
the shortest alignment by advancing every clause but the last in reverse
(ShrinkToAfterShortestMatch, :325-429), advancing cursors PAST the used
positions so successive matches come from successive spans.  On repeated
terms this yields fewer spans than the tuple enumeration (doc "a a b",
query a b: the walk emits only the tight (1,3) match, tuples also (0,3)).

Slop: only non-overlapping gaps count (matchStart > prevEnd contributes
matchStart - prevEnd, :408-412); ordering compares starts with end as the
tiebreak (DocSpansOrdered, :276-284), so equal-width overlapping spans
are legal at slop >= 1 exactly as the class doc's t1 t2 t1 t3 t2 t3
example shows.

The walk runs per candidate doc inside an Arrow-batched UDF; the
independent re-derivation used for cross-checking lives in
oracle/pybm25.py (ordered_spans_ref) and a fuzz test pins the two
against each other (tests/test_spanwalk.py).
"""

from __future__ import annotations

__all__ = ["ordered_spans"]


def _ordered(s1: int, e1: int, s2: int, e2: int) -> bool:
    """DocSpansOrdered (NearSpansOrdered.cs:276-284)."""
    return e1 < e2 if s1 == s2 else s1 < s2


def ordered_spans(clause_spans: list[list[tuple[int, int]]],
                  slop: int) -> list[tuple[int, int, tuple[int, ...]]]:
    """All ordered matches within one doc.

    clause_spans: per query clause, its (start, end) spans in this doc,
    sorted by (start, end) — SpanTerm leaves give width-1 spans.
    Returns [(match_start, match_end, chosen_starts)] in emission order;
    chosen_starts holds each clause's chosen span start (what
    PayloadNearQuery collects payloads from, :329-405).
    """
    n = len(clause_spans)
    if n == 0 or any(len(c) == 0 for c in clause_spans):
        return []
    if n == 1:
        return [(s, e, (s,)) for s, e in clause_spans[0]]
    idx = [0] * n
    out: list[tuple[int, int, tuple[int, ...]]] = []
    in_same_doc = True
    while in_same_doc:
        # StretchToOrder: advance each later clause until ordered after
        # its predecessor
        for i in range(1, n):
            while True:
                ps, pe = clause_spans[i - 1][idx[i - 1]]
                cs, ce = clause_spans[i][idx[i]]
                if _ordered(ps, pe, cs, ce):
                    break
                idx[i] += 1
                if idx[i] >= len(clause_spans[i]):
                    return out
        # ShrinkToAfterShortestMatch: walk clauses n-2..0 backwards,
        # advancing each PAST its used position while it stays ordered
        # before the successor's chosen span
        last_s, last_e = clause_spans[n - 1][idx[n - 1]]
        match_start, match_end = last_s, last_e
        chosen = [0] * n
        chosen[n - 1] = last_s
        match_slop = 0
        for i in range(n - 2, -1, -1):
            prev_s, prev_e = clause_spans[i][idx[i]]
            while True:
                idx[i] += 1  # advance past the used span
                if idx[i] >= len(clause_spans[i]):
                    in_same_doc = False  # doc exhausted for this clause;
                    break                # still finish the current match
                pp_s, pp_e = clause_spans[i][idx[i]]
                if not _ordered(pp_s, pp_e, last_s, last_e):
                    break
                prev_s, prev_e = pp_s, pp_e  # still before: shrink onto it
            if match_start > prev_e:
                # only non-overlapping gaps add to slop
                match_slop += match_start - prev_e
            match_start = prev_s
            chosen[i] = prev_s
            last_s, last_e = prev_s, prev_e
        if match_slop <= slop:
            out.append((match_start, match_end, tuple(chosen)))
    return out
