"""Pure-Python BM25 oracle — the independent judge for the Spark engine.

Implements the same query semantics as plans/lowering.py over plain Python
dicts, from the tokenizer spec alone (no Spark).  Used by pytest golden
tests (FIXTURES.md): expected top-k = oracle top-k, ties by ascending
doc_id (src/Lucene.Net/Search/HitQueue.cs:87-93).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from ..analysis.tokenizers import tokenize
from ..plans import ast
from ..plans.lowering import wildcard_to_regex

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 6


def _sloppy_freq_walk(plists: list[list[int]], offsets: list[int],
                      slop: int) -> float:
    """Independent re-derivation of the reference's sloppy-phrase walk
    (src/Lucene.Net/Search/SloppyPhraseScorer.cs:56-96 PhraseFreq,
    :134-218 init/repeats, :226-243 TermPositionsDiffer, :101-118 Flip;
    queue order PhraseQueue.cs:14-23).  Written heapq-style, separately
    from the engine kernel (functions/sloppy.lucene_sloppy_freq), so the
    pytest cross-check compares two implementations that share only the
    published algorithm — plists[i] = sorted raw positions for the term
    at query offset offsets[i]; freq = Σ 1/(1 + matchLength) over the
    matches the greedy walk encounters."""
    import heapq

    n = len(plists)
    if n == 0 or any(not pl for pl in plists):
        return 0.0
    if n == 1:
        return float(len(plists[0]))

    idx = [0] * n        # next unread element per stream
    cur = [0] * n        # current NORMALIZED position (raw - offset)

    def advance(i: int) -> bool:
        if idx[i] < len(plists[i]):
            cur[i] = plists[i][idx[i]] - offsets[i]
            idx[i] += 1
            return True
        return False

    for i in range(n):
        advance(i)

    # repeats: streams whose raw current positions collide (insertion
    # order of first detection, matching the reference's repeat map)
    rep: set[int] = set()
    order: list[int] = []
    for a in range(n):
        for b in range(a + 1, n):
            if cur[a] + offsets[a] == cur[b] + offsets[b]:
                for i in (a, b):
                    if i not in rep:
                        rep.add(i)
                        order.append(i)

    def differ(i: int) -> int | None:
        # the higher-offset stream of the first colliding pair, else None
        tp = cur[i] + offsets[i]
        for j in order:
            if j != i and cur[j] + offsets[j] == tp:
                return i if offsets[i] > offsets[j] else j
        return None

    for i in order:
        while True:
            j = differ(i)
            if j is None:
                break
            if not advance(j):
                return 0.0  # ran out of a term

    heap = [(cur[i], offsets[i], i) for i in range(n)]
    heapq.heapify(heap)
    end = max(cur)

    freq = 0.0
    done = False
    while not done:
        _, _, i = heapq.heappop(heap)
        start = cur[i]
        nxt = heap[0][0]
        differs = True
        p = start
        while p <= nxt or not differs:
            if p <= nxt and differs:
                start = p
            if not advance(i):
                done = True
                break
            j = differ(i) if i in rep else None
            differs = (i not in rep) or j is None
            if j is not None and j != i:
                # flip: stream j leaves the heap, stream i takes its place
                heap.remove((cur[j], offsets[j], j))
                heap.append((cur[i], offsets[i], i))
                heapq.heapify(heap)
                i = j
            p = cur[i]
        match_len = end - start
        if match_len <= slop:
            freq += 1.0 / (1.0 + match_len)
        if cur[i] > end:
            end = cur[i]
        heapq.heappush(heap, (cur[i], offsets[i], i))
    return freq


def ordered_spans_ref(clause_spans: list[list[tuple[int, int]]],
                      slop: int) -> list[tuple[int, int]]:
    """Independent re-derivation of the NearSpansOrdered enumeration
    (NearSpansOrdered.cs) for cross-checking functions/spanwalk.py —
    bisect formulation instead of the reference's stepwise cursor
    advance.  DocSpansOrdered's (start, end-tiebreak) order is exactly
    tuple order on (s, e), so "first span ordered after X" is
    bisect_right(X) and "last span ordered before X" is
    bisect_left(X) - 1."""
    import bisect
    n = len(clause_spans)
    lists = [sorted(c) for c in clause_spans]
    if n == 0 or any(not c for c in lists):
        return []
    if n == 1:
        return list(lists[0])
    cur = [0] * n
    out: list[tuple[int, int]] = []
    alive = True
    while alive:
        # stretch: each clause's first span ordered after its predecessor
        for i in range(1, n):
            j = bisect.bisect_right(lists[i], lists[i - 1][cur[i - 1]],
                                    lo=cur[i])
            if j >= len(lists[i]):
                return out
            cur[i] = j
        # shrink backwards: latest span still ordered before the
        # successor's chosen one; cursor advances past it
        nxt = lists[n - 1][cur[n - 1]]
        match_end = nxt[1]
        run_start = nxt[0]
        slop_used = 0
        for i in range(n - 2, -1, -1):
            j = bisect.bisect_left(lists[i], nxt, lo=cur[i]) - 1
            sp = lists[i][j]
            cur[i] = j + 1
            if run_start > sp[1]:
                slop_used += run_start - sp[1]
            run_start = sp[0]
            nxt = sp
        if slop_used <= slop:
            out.append((run_start, match_end))
        alive = all(cur[i] < len(lists[i]) for i in range(n - 1))
    return out


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


class OracleIndex:
    def __init__(self):
        # field -> term -> {doc_id: tf}
        self.post: dict[str, dict[str, dict[int, int]]] = defaultdict(
            lambda: defaultdict(dict)
        )
        # field -> term -> {doc_id: [positions]}
        self.pos: dict[str, dict[str, dict[int, list[int]]]] = defaultdict(
            lambda: defaultdict(dict)
        )
        self.dl: dict[str, dict[int, int]] = defaultdict(dict)  # field -> doc -> len
        self.docs: dict[int, dict] = {}
        self.n_docs = 0
        self.total_tokens = 0  # over the primary field
        self.primary_field = "text"

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.n_docs if self.n_docs else 0.0

    def add(self, doc_id: int, fields: dict[str, str], lang: str | None = None,
            keyword_fields: dict[str, str] | None = None) -> None:
        self.docs[doc_id] = {**fields, **(keyword_fields or {})}
        self.n_docs += 1
        for fname, text in fields.items():
            toks = tokenize(text, lang)
            self.dl[fname][doc_id] = len(toks)
            if fname == self.primary_field:
                self.total_tokens += len(toks)
            tf = Counter(t for t, _ in toks)
            for t, c in tf.items():
                self.post[fname][t][doc_id] = c
            for t, p in toks:
                self.pos[fname][t].setdefault(doc_id, []).append(p)
        for fname, val in (keyword_fields or {}).items():
            if val is None:
                continue
            self.post[fname][str(val)][doc_id] = 1
            self.pos[fname][str(val)][doc_id] = [0]
            self.dl[fname][doc_id] = 1

    # ---- scoring

    def idf(self, field: str, term: str) -> float:
        df = len(self.post[field].get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def tf_norm(self, tf: float, dl: int) -> float:
        return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))

    def score_map(self, q: ast.Query) -> dict[int, float]:
        q = ast.rewrite(q)
        if isinstance(q, ast.Term):
            plist = self.post[q.field].get(q.term, {})
            w = self.idf(q.field, q.term) * q.boost
            return {
                d: w * self.tf_norm(tf, self.dl[q.field][d])
                for d, tf in plist.items()
            }
        if isinstance(q, ast.Bool):
            must = [self.score_map(c) for c in q.must]
            should = [self.score_map(c) for c in q.should]
            nots = [set(self.score_map(c)) for c in q.must_not]
            cand: set[int]
            if must:
                cand = set(must[0])
                for m in must[1:]:
                    cand &= set(m)
            else:
                cand = set()
                for s in should:
                    cand |= set(s)
            msm = q.min_should_match
            if q.should and not q.must and msm < 1:
                msm = 1
            out = {}
            for d in cand:
                ns = sum(1 for s in should if d in s)
                if ns < msm:
                    continue
                if any(d in nt for nt in nots):
                    continue
                sc = sum(m[d] for m in must) + sum(s.get(d, 0.0) for s in should)
                out[d] = sc * q.boost
            return out
        if isinstance(q, ast.DisMax):
            subs = [self.score_map(c) for c in q.queries]
            out = {}
            for d in set().union(*[set(s) for s in subs]) if subs else set():
                vals = [s[d] for s in subs if d in s]
                out[d] = (max(vals) + q.tie * (sum(vals) - max(vals))) * q.boost
            return out
        if isinstance(q, ast.Phrase):
            return self._phrase_scores(q)
        if isinstance(q, ast.MatchAll):
            return {d: q.boost for d in self.docs}
        if isinstance(q, ast.ConstantScore):
            return {d: q.boost for d in self.score_map(q.query)}
        if isinstance(q, ast.Filtered):
            # SQL predicate strings are validated in the DuckDB parity tests;
            # the python oracle supports callable predicates over stored docs.
            if callable(q.predicate):
                inner = self.score_map(q.query)
                return {d: s for d, s in inner.items() if q.predicate(self.docs[d])}
            raise NotImplementedError("string Filtered predicates: SQL tests only")
        if isinstance(q, (ast.Prefix, ast.Wildcard, ast.TermRange)):
            terms = self._expand(q)
            docs = set()
            for t in terms:
                docs |= set(self.post[q.field].get(t, {}))
            return {d: q.boost for d in docs}
        if isinstance(q, ast.Fuzzy):
            return self._fuzzy_scores(q)
        if isinstance(q, ast.MultiPhrase):
            return self._multiphrase_scores(q)
        if isinstance(q, ast.NumericRange):
            out = {}
            for d, row in self.docs.items():
                v = row.get(q.column)
                if v is None:
                    continue
                if q.lower is not None and (
                        v < q.lower or (v == q.lower and not q.include_lower)):
                    continue
                if q.upper is not None and (
                        v > q.upper or (v == q.upper and not q.include_upper)):
                    continue
                out[d] = q.boost
            return out
        if isinstance(q, ast.Boosting):
            m = self.score_map(q.match)
            ctx = set(self.score_map(q.context))
            return {d: s * (q.context_boost if d in ctx else 1.0) * q.boost
                    for d, s in m.items()}
        if isinstance(q, ast.DedupByKey):
            inner = self.score_map(q.query)
            best: dict[object, int] = {}
            for d in sorted(inner):
                key = self.docs[d].get(q.key_col)
                if key not in best:
                    best[key] = d
            return {d: inner[d] * q.boost for d in best.values()}
        if isinstance(q, ast.SPAN_NODES):
            return self._span_scores(q)
        if isinstance(q, ast.Regex):
            import re as _re
            pat = _re.compile(q.pattern)
            docs = set()
            for t, post in self.post[q.field].items():
                if pat.search(t):  # rlike semantics: partial match
                    docs |= set(post)
            return {d: q.boost for d in docs}
        if isinstance(q, ast.FieldScore):
            return {d: float(row[q.column]) * q.boost
                    for d, row in self.docs.items()
                    if row.get(q.column) is not None}
        if isinstance(q, ast.CustomScore):
            # python oracle supports plain column names as value sources
            inner = self.score_map(q.query)
            out = {}
            for d, s in inner.items():
                v = s
                for col in q.value_exprs:
                    v *= float(self.docs[d][col])
                out[d] = v * q.boost
            return out
        raise NotImplementedError(type(q).__name__)

    # ---- span queries (same exactly-specified semantics as the lowering)

    def _span_list(self, q: ast.Query) -> dict[int, set[tuple[int, int]]]:
        """doc -> set of (s, e) spans."""
        if isinstance(q, ast.SpanTerm):
            return {
                d: {(p, p + 1) for p in ps}
                for d, ps in self.pos[q.field].get(q.term, {}).items()
            }
        if isinstance(q, ast.SpanOr):
            out: dict[int, set] = {}
            for c in q.clauses:
                for d, sp in self._span_list(c).items():
                    out.setdefault(d, set()).update(sp)
            return out
        if isinstance(q, ast.SpanFirst):
            return {
                d: kept for d, sp in self._span_list(q.match).items()
                if (kept := {(s, e) for s, e in sp if e <= q.end})
            }
        if isinstance(q, ast.SpanNot):
            inc, exc = self._span_list(q.include), self._span_list(q.exclude)
            out = {}
            for d, sp in inc.items():
                xs = exc.get(d, set())
                kept = {(s, e) for s, e in sp
                        if not any(s < xe and e > xs_ for xs_, xe in xs)}
                if kept:
                    out[d] = kept
            return out
        if isinstance(q, ast.SpanNear):
            import itertools
            subs = [self._span_list(c) for c in q.clauses]
            docs = set(subs[0])
            for s in subs[1:]:
                docs &= set(s)
            out = {}
            if q.in_order and getattr(q, "spec", "lucene") == "lucene":
                # reference NearSpansOrdered enumeration
                for d in docs:
                    spans = set(ordered_spans_ref(
                        [sorted(s[d]) for s in subs], q.slop))
                    if spans:
                        out[d] = spans
                return out
            for d in docs:
                spans = set()
                for tup in itertools.product(*[sorted(s[d]) for s in subs]):
                    if q.in_order:
                        if any(tup[i][0] < tup[i - 1][1]
                               for i in range(1, len(tup))):
                            continue
                    else:
                        if any(not (a[1] <= b[0] or b[1] <= a[0])
                               for a, b in itertools.combinations(tup, 2)):
                            continue
                    s0 = min(t[0] for t in tup)
                    e0 = max(t[1] for t in tup)
                    if (e0 - s0) - sum(t[1] - t[0] for t in tup) <= q.slop:
                        spans.add((s0, e0))
                if spans:
                    out[d] = spans
            return out
        raise NotImplementedError(type(q).__name__)

    def _span_scores(self, q: ast.Query) -> dict[int, float]:
        leaves = ast.span_leaves(q)
        field = leaves[0].field
        idf_sum = sum(self.idf(t.field, t.term) for t in leaves
                      if t.term in self.post[t.field])
        if idf_sum == 0.0:
            return {}
        out = {}
        for d, spans in self._span_list(q).items():
            freq = sum(1.0 / (1.0 + (e - s)) for s, e in spans)
            out[d] = q.boost * idf_sum * self.tf_norm(freq, self.dl[field][d])
        return out

    def _multiphrase_scores(self, q: ast.MultiPhrase) -> dict[int, float]:
        offsets = q.resolved_offsets()
        per_pos_terms = []
        for alts in q.terms_at:
            present = [t for t in alts if t in self.post[q.field]]
            if not present:
                return {}
            per_pos_terms.append(present)
        idf_sum = sum(self.idf(q.field, t)
                      for alts in per_pos_terms for t in alts)
        cand: set[int] | None = None
        for alts in per_pos_terms:
            docs = set()
            for t in alts:
                docs |= set(self.pos[q.field][t])
            cand = docs if cand is None else cand & docs
        out = {}
        for d in cand or set():
            shifted = []
            ok = True
            for alts, o in zip(per_pos_terms, offsets):
                ps = set()
                for t in alts:
                    ps |= {p - o for p in self.pos[q.field][t].get(d, ())}
                if not ps:
                    ok = False
                    break
                shifted.append(ps)
            if not ok:
                continue
            freq = float(len(set.intersection(*shifted)))
            if freq > 0:
                out[d] = (q.boost * idf_sum
                          * self.tf_norm(freq, self.dl[q.field][d]))
        return out

    def _expand(self, q: ast.Query) -> list[str]:
        terms = self.post[q.field].keys()
        if isinstance(q, ast.Prefix):
            return [t for t in terms if t.startswith(q.prefix)]
        if isinstance(q, ast.Wildcard):
            rx = re.compile(wildcard_to_regex(q.pattern))
            return [t for t in terms if rx.match(t)]
        if isinstance(q, ast.TermRange):
            out = []
            for t in terms:
                if q.lower is not None:
                    if t < q.lower or (t == q.lower and not q.include_lower):
                        continue
                if q.upper is not None:
                    if t > q.upper or (t == q.upper and not q.include_upper):
                        continue
                out.append(t)
            return out
        raise NotImplementedError

    def _fuzzy_scores(self, q: ast.Fuzzy) -> dict[int, float]:
        cands = []
        for t in self.post[q.field]:
            if q.prefix_length and not t.startswith(q.term[: q.prefix_length]):
                continue
            sim = 1.0 - _levenshtein(t, q.term) / min(len(t), len(q.term))
            if sim >= q.min_similarity:
                cands.append((t, sim))
        cands.sort(key=lambda x: (-x[1], x[0]))
        cands = cands[: ast.MAX_CLAUSE_COUNT]
        out: dict[int, float] = defaultdict(float)
        for t, sim in cands:
            tb = (sim - q.min_similarity) / (1.0 - q.min_similarity)
            w = self.idf(q.field, t) * q.boost * tb
            for d, tf in self.post[q.field][t].items():
                out[d] += w * self.tf_norm(tf, self.dl[q.field][d])
        return dict(out)

    def _phrase_scores(self, q: ast.Phrase) -> dict[int, float]:
        offsets = q.resolved_offsets()
        for t in q.terms:
            if t not in self.post[q.field]:
                return {}
        idf_sum = sum(self.idf(q.field, t) for t in q.terms)
        cand = set(self.pos[q.field][q.terms[0]])
        for t in q.terms[1:]:
            cand &= set(self.pos[q.field][t])
        out = {}
        for d in cand:
            shifted = [
                {p - o for p in self.pos[q.field][t][d]}
                for t, o in zip(q.terms, offsets)
            ]
            if q.slop == 0:
                inter = set.intersection(*shifted)
                freq = float(len(inter))
            elif q.slop_spec == "lucene":
                freq = _sloppy_freq_walk(
                    [sorted(self.pos[q.field][t][d]) for t in q.terms],
                    list(offsets), q.slop)
            else:
                # slop_spec="all_tuples": every tuple of shifted positions
                # with spread d = max - min <= slop contributes
                # sloppyFreq(d) = 1/(1+d) (DefaultSimilarity.cs:71) — the
                # SQL-expressible superset of the reference walk (see
                # ast.Phrase.slop_spec).
                import itertools
                freq = 0.0
                for tup in itertools.product(*shifted):
                    dd = max(tup) - min(tup)
                    if dd <= q.slop:
                        freq += 1.0 / (1.0 + dd)
            if freq > 0:
                out[d] = q.boost * idf_sum * self.tf_norm(freq, self.dl[q.field][d])
        return out

    # ---- collector

    def top_k(self, q: ast.Query, k: int = 10) -> list[tuple[int, float]]:
        scores = self.score_map(q)
        items = [(d, round(s, SCORE_DECIMALS)) for d, s in scores.items()]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]
