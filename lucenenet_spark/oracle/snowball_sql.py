"""DuckDB SQL mirrors of the round-5 Snowball breadth stemmers
(analysis/snowball_ext.py: SV/DA/NO/NL/ES/PT/IT/FR) — vocabulary-level
CTE chains ending in stemmap(term, stem), consumed by
sqlgen.base_ctes(stemmer=...).

Every among table comes from oracle/tables.py (transcribed copies —
this module imports NOTHING from the engine packages; the drift test
pins the copies equal).  The marking preludes (Dutch i/y, Italian u/i,
French u/i/y/qU) are sequential left-to-right scans in the generated
code, so they are mirrored as RECURSIVE CTEs stepping one position at a
time — a global regexp_replace would diverge on overlapping sites
(e.g. 'Vyi V').  Region positions (r1/r2/rv) are computed once per word
and carried as columns, exactly like the Python side.
"""

from __future__ import annotations

from . import tables as T


def _q(s: str) -> str:
    return s.replace("'", "''")


def _in(var: str, chars) -> str:
    lst = ",".join(f"'{_q(c)}'" for c in sorted(chars))
    return f"{var} IN ({lst})"


def _cls(chars) -> str:
    """regexp char class body for a vowel set."""
    return "".join(sorted(chars))


def _r1_sql(u: str, v: str) -> str:
    pat = f"^.*?[{v}][^{v}]"
    return (f"(CASE WHEN regexp_matches({u}, '{pat}') "
            f"THEN length(regexp_extract({u}, '{pat}')) "
            f"ELSE length({u}) END)")


def _r1_min3_sql(u: str, v: str) -> str:
    pat = f"^.*?[{v}][^{v}]"
    return (f"(CASE WHEN regexp_matches({u}, '{pat}') "
            f"THEN greatest(length(regexp_extract({u}, '{pat}')), 3) "
            f"ELSE length({u}) END)")


def _r2_sql(u: str, v: str, r1: str) -> str:
    pat = f"^.*?[{v}][^{v}]"
    tail = f"substr({u}, {r1} + 1)"
    return (f"(CASE WHEN regexp_matches({tail}, '{pat}') "
            f"THEN {r1} + length(regexp_extract({tail}, '{pat}')) "
            f"ELSE length({u}) END)")


def _rv_romance_sql(u: str, v: str) -> str:
    first = f"substr({u}, 1, 1)"
    second = f"substr({u}, 2, 1)"
    tail = f"substr({u}, 3)"
    scan_vowel = (f"(CASE WHEN regexp_matches({tail}, '[{v}]') "
                  f"THEN 2 + length(regexp_extract({tail}, '^[^{v}]*[{v}]')) "
                  f"ELSE length({u}) END)")
    scan_cons = (f"(CASE WHEN regexp_matches({tail}, '[^{v}]') "
                 f"THEN 2 + length(regexp_extract({tail}, '^[{v}]*[^{v}]')) "
                 f"ELSE length({u}) END)")
    return (f"(CASE WHEN length({u}) < 2 THEN length({u}) "
            f"WHEN {first} ~ '[{v}]' AND {second} ~ '[{v}]' "
            f"THEN {scan_cons} "
            f"WHEN {second} ~ '[{v}]' THEN least(3, length({u})) "
            f"ELSE {scan_vowel} END)")


def _rv_french_sql(u: str, v: str) -> str:
    tail = f"substr({u}, 2)"
    return (f"(CASE WHEN length({u}) >= 3 AND "
            f"substr({u}, 1, 1) ~ '[{v}]' AND "
            f"substr({u}, 2, 1) ~ '[{v}]' THEN 3 "
            f"WHEN regexp_matches({tail}, '[{v}]') "
            f"THEN 1 + length(regexp_extract({tail}, '^[^{v}]*[{v}]')) "
            f"ELSE length({u}) END)")


def _suf_case(var: str, entries, within: str | None = None) -> str:
    """Longest-suffix CASE returning the matched suffix ('' if none).
    within = region column for setlimit (pattern a) semantics — the arm
    condition includes the bound, so a too-long suffix FALLS THROUGH to
    a shorter one, exactly like find_among_b under a limit."""
    arms = []
    for suf, _code in sorted(entries, key=lambda e: -len(e[0])):
        cond = f"ends_with({var}, '{_q(suf)}')"
        if within:
            cond += f" AND length({var}) - {len(suf)} >= {within}"
        arms.append(f"WHEN {cond} THEN '{_q(suf)}'")
    return "CASE " + " ".join(arms) + " ELSE '' END"


def _code_case(var: str, entries) -> str:
    arms = [f"WHEN '{_q(suf)}' THEN {code}" for suf, code in entries]
    return f"CASE {var} " + " ".join(arms) + " ELSE 0 END"


def _chop(var: str, n: str) -> str:
    return f"substr({var}, 1, length({var}) - ({n}))"


# -------------------------------------------------------------- Swedish


def swedish_ctes() -> str:
    v = _cls(T.SV_VOWELS)
    send = _in(f"substr(w, length(w) - 1, 1)", T.SV_S_ENDING)
    main = _suf_case("w", T.SV_MAIN, within="r1")
    other = _suf_case("w", T.SV_OTHER, within="r1")
    pairs = "|".join(T.SV_PAIRS)
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (SELECT term, term AS w, {_r1_min3_sql('term', v)} AS r1 FROM xv0),
xv2 AS MATERIALIZED (  -- main_suffix within R1
  SELECT term, r1,
    CASE WHEN suf = '' THEN w
         WHEN suf <> 's' THEN {_chop('w', 'length(suf)')}
         WHEN length(w) >= 2 AND {send}
         THEN {_chop('w', '1')}
         ELSE w END AS w
  FROM (SELECT term, w, r1, {main} AS suf FROM xv1)),
xv3 AS MATERIALIZED (  -- consonant pair within R1
  SELECT term, r1,
    CASE WHEN length(w) - 2 >= r1 AND regexp_matches(w, '({pairs})$')
         THEN {_chop('w', '1')} ELSE w END AS w
  FROM xv2),
stemmap AS MATERIALIZED (  -- other_suffix within R1
  SELECT term,
    CASE WHEN suf IN ('ig', 'lig', 'els') THEN {_chop('w', 'length(suf)')}
         WHEN suf = 'löst' THEN {_chop('w', '4')} || 'lös'
         WHEN suf = 'fullt' THEN {_chop('w', '5')} || 'full'
         ELSE w END AS stem
  FROM (SELECT term, w, {other} AS suf FROM xv3))"""


# --------------------------------------------------------------- Danish


def danish_ctes() -> str:
    v = _cls(T.DA_VOWELS)
    send = _in("substr(w, length(w) - 1, 1)", T.DA_S_ENDING)
    main = _suf_case("w", T.DA_MAIN, within="r1")
    other = _suf_case("w", T.DA_OTHER, within="r1")
    pairs = "|".join(T.DA_PAIRS)
    cons = (f"CASE WHEN length({{x}}) - 2 >= r1 "
            f"AND regexp_matches({{x}}, '({pairs})$') "
            f"THEN substr({{x}}, 1, length({{x}}) - 1) ELSE {{x}} END")
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (SELECT term, term AS w, {_r1_min3_sql('term', v)} AS r1 FROM xv0),
xv2 AS MATERIALIZED (  -- main_suffix within R1
  SELECT term, r1,
    CASE WHEN suf = '' THEN w
         WHEN suf <> 's' THEN {_chop('w', 'length(suf)')}
         WHEN length(w) >= 2 AND {send}
         THEN {_chop('w', '1')}
         ELSE w END AS w
  FROM (SELECT term, w, r1, {main} AS suf FROM xv1)),
xv3 AS MATERIALIZED (  -- consonant pair within R1 (delete last letter)
  SELECT term, r1, {cons.format(x='w')} AS w FROM xv2),
xv4 AS MATERIALIZED (  -- other_suffix: igst prelude, no region gate
  SELECT term, r1,
    CASE WHEN ends_with(w, 'igst') THEN {_chop('w', '2')} ELSE w END AS w
  FROM xv3),
xv5 AS MATERIALIZED (  -- other_suffix among within R1 (+ cons retry)
  SELECT term, r1,
    CASE WHEN suf = 'løst' THEN {_chop('w', '1')}
         WHEN suf <> '' THEN {cons.format(x=_chop('w', 'length(suf)'))}
         ELSE w END AS w
  FROM (SELECT term, w, r1, {other} AS suf FROM xv4)),
stemmap AS MATERIALIZED (  -- undouble: last char in R1, equal pair
  SELECT term,
    CASE WHEN length(w) >= 2
              AND substr(w, length(w), 1) = substr(w, length(w) - 1, 1)
              AND substr(w, length(w), 1) !~ '[{v}]'
              AND length(w) - 1 >= r1
         THEN {_chop('w', '1')} ELSE w END AS stem
  FROM xv5)"""


# ------------------------------------------------------------ Norwegian


def norwegian_ctes() -> str:
    v = _cls(T.NO_VOWELS)
    send = _in("substr(w, length(w) - 1, 1)", T.NO_S_ENDING)
    main = _suf_case("w", T.NO_MAIN, within="r1")
    other = _suf_case("w", T.NO_OTHER, within="r1")
    pairs = "|".join(T.NO_PAIRS)
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (SELECT term, term AS w, {_r1_min3_sql('term', v)} AS r1 FROM xv0),
xv2 AS MATERIALIZED (  -- main_suffix within R1
  SELECT term, r1,
    CASE WHEN suf = '' THEN w
         WHEN suf IN ('erte', 'ert') THEN {_chop('w', 'length(suf)')} || 'er'
         WHEN suf <> 's' THEN {_chop('w', 'length(suf)')}
         WHEN length(w) >= 2 AND {send}
         THEN {_chop('w', '1')}
         ELSE w END AS w
  FROM (SELECT term, w, r1, {main} AS suf FROM xv1)),
xv3 AS MATERIALIZED (  -- consonant pair within R1 (delete last letter)
  SELECT term, r1,
    CASE WHEN length(w) - 2 >= r1 AND regexp_matches(w, '({pairs})$')
         THEN {_chop('w', '1')} ELSE w END AS w
  FROM xv2),
stemmap AS MATERIALIZED (  -- other_suffix within R1 (all delete)
  SELECT term,
    CASE WHEN suf <> '' THEN {_chop('w', 'length(suf)')} ELSE w END AS stem
  FROM (SELECT term, w, {other} AS suf FROM xv3))"""


# --------------------------------------------------------------- Finnish


def finnish_ctes() -> str:
    v = _cls(T.FI_VOWELS)
    vin = lambda e: f"{e} ~ '[{v}]'"  # noqa: E731
    particle = _suf_case("w", T.FI_PARTICLE, within="r1")
    poss = _suf_case("w", T.FI_POSS, within="r1")
    other = _suf_case("w", T.FI_OTHER, within="r2")
    longs = ",".join(f"'{s}'" for s in T.FI_LONG)
    longs_ie = longs + ",'ie'"
    pend = _in("substr(w, length(w) - length(suf), 1)", T.FI_PARTICLE_END)
    # case among: longest-first arms; den/seen/tten/siin carry their
    # VI/LONG callback conditions (evaluated under the R1 limit), so a
    # failed callback falls through to the shorter 'n' arm — exactly
    # find_among_b's in-trie fallback.
    case_arms = []
    for suf, _code, cb in sorted(T.FI_CASE, key=lambda e: -len(e[0])):
        n = len(suf)
        cond = (f"ends_with(w, '{suf}') "
                f"AND length(w) - {n} >= r1")
        p = f"length(w) - {n}"
        if cb == "VI":
            vr = _in(f"substr(w, {p} - 1, 1)", T.FI_V_RESTR)
            cond += (f" AND {p} - 2 >= r1 AND substr(w, {p}, 1) = 'i'"
                     f" AND {vr}")
        elif cb == "LONG":
            cond += (f" AND {p} - 2 >= r1"
                     f" AND substr(w, {p} - 1, 2) IN ({longs})")
        case_arms.append(f"WHEN {cond} THEN '{suf}'")
    case_suf = "CASE " + " ".join(case_arms) + " ELSE '' END"
    # switch-code gates per matched suffix (no fallthrough on failure)
    g16 = {1: "a", 2: "e", 3: "i", 4: "o", 5: "ä", 6: "ö"}
    gate_arms, act_arms = [], []
    for suf, code, _cb in T.FI_CASE:
        p = f"length(w) - {len(suf)}"
        if code in g16:
            gate = f"substr(w, {p}, 1) = '{g16[code]}'"
        elif code == 7:
            gate = "TRUE"
        elif code == 8:
            gate = (f"{p} >= 2 AND {vin(f'substr(w, {p}, 1)')} "
                    f"AND NOT {vin(f'substr(w, {p} - 1, 1)')}")
        elif code == 9:
            gate = f"substr(w, {p}, 1) = 'e'"
        else:
            gate = "TRUE"
        gate_arms.append(f"WHEN '{suf}' THEN ({gate})")
        if code == 7:
            act = (f"CASE WHEN {p} >= 2 AND substr(w, {p} - 1, 2) "
                   f"IN ({longs_ie}) THEN {_chop('w', len(suf) + 1)} "
                   f"ELSE {_chop('w', len(suf))} END")
        else:
            act = _chop("w", len(suf))
        act_arms.append(f"WHEN '{suf}' THEN {act}")
    case_gate = "CASE csuf " + " ".join(gate_arms) + " ELSE FALSE END"
    case_act = "CASE csuf " + " ".join(act_arms) + " ELSE w END"
    po_block = ("('mma','mpa','mmi','mpi','mmä','mpä')")
    tp = _suf_case("w", T.FI_TPLUR, within="r2")
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (
  SELECT term, term AS w, {_r1_sql('term', v)} AS r1,
         {_r2_sql('term', v, _r1_sql('term', v))} AS r2
  FROM xv0),
xv2 AS MATERIALIZED (  -- particle_etc within R1
  SELECT term, r1, r2,
    CASE WHEN suf = '' THEN w
         WHEN suf = 'sti'
         THEN CASE WHEN length(w) - 3 >= r2
                   THEN {_chop('w', '3')} ELSE w END
         WHEN length(w) - length(suf) >= 1 AND {pend}
         THEN {_chop('w', 'length(suf)')}
         ELSE w END AS w
  FROM (SELECT term, w, r1, r2, {particle} AS suf FROM xv1)),
xv3 AS MATERIALIZED (  -- possessive within R1
  SELECT term, r1, r2,
    CASE WHEN suf = '' THEN w
         WHEN suf = 'si'
         THEN CASE WHEN substr(w, length(w) - 2, 1) = 'k' THEN w
                   ELSE {_chop('w', '2')} END
         WHEN suf = 'ni'
         THEN CASE WHEN ends_with({_chop('w', '2')}, 'kse')
                   THEN {_chop('w', '3')} || 'i'
                   ELSE {_chop('w', '2')} END
         WHEN suf IN ('nsa', 'nsä', 'mme', 'nne')
         THEN {_chop('w', '3')}
         WHEN suf = 'an'
         THEN CASE WHEN regexp_matches({_chop('w', '2')}, '(lla|na|ssa|ta|lta|sta)$')
                   THEN {_chop('w', '2')} ELSE w END
         WHEN suf = 'än'
         THEN CASE WHEN regexp_matches({_chop('w', '2')}, '(llä|nä|ssä|tä|ltä|stä)$')
                   THEN {_chop('w', '2')} ELSE w END
         WHEN suf = 'en'
         THEN CASE WHEN regexp_matches({_chop('w', '2')}, '(lle|ine)$')
                   THEN {_chop('w', '2')} ELSE w END
         ELSE w END AS w
  FROM (SELECT term, w, r1, r2, {poss} AS suf FROM xv2)),
xv4 AS MATERIALIZED (  -- case ending within R1 (+ ending_removed)
  SELECT term, r1, r2,
    CASE WHEN csuf <> '' AND ok THEN {case_act} ELSE w END AS w,
    (csuf <> '' AND ok) AS er
  FROM (SELECT term, w, r1, r2, csuf, {case_gate} AS ok
        FROM (SELECT term, w, r1, r2, {case_suf} AS csuf FROM xv3))),
xv5 AS MATERIALIZED (  -- other_endings within R2 (po blocks m-forms)
  SELECT term, r1, r2, er,
    CASE WHEN suf = '' THEN w
         WHEN suf IN {po_block}
              AND ends_with({_chop('w', 'length(suf)')}, 'po') THEN w
         ELSE {_chop('w', 'length(suf)')} END AS w
  FROM (SELECT term, w, r1, r2, er, {other} AS suf FROM xv4)),
xv6 AS MATERIALIZED (  -- i_plural | t_plural part A
  SELECT term, r1, r2,
    CASE WHEN er AND regexp_matches(w, '[ij]$')
              AND length(w) - 1 >= r1
         THEN {_chop('w', '1')}
         WHEN tb THEN {_chop('w', '1')}
         ELSE w END AS w,
    tb
  FROM (SELECT term, w, r1, r2, er,
          (NOT er AND ends_with(w, 't') AND length(w) - 2 >= r1
           AND {vin("substr(w, length(w) - 1, 1)")}) AS tb
        FROM xv5)),
xv7 AS MATERIALIZED (  -- t_plural part B within R2
  SELECT term, r1, r2,
    CASE WHEN NOT tb OR suf = '' THEN w
         WHEN suf = 'mma'
              AND ends_with({_chop('w', '3')}, 'po') THEN w
         ELSE {_chop('w', 'length(suf)')} END AS w
  FROM (SELECT term, w, r1, r2, tb, {tp} AS suf FROM xv6)),
xv8 AS MATERIALIZED (  -- tidy 1: LONG within R1 -> drop last char
  SELECT term, r1, r2,
    CASE WHEN length(w) - 2 >= r1
              AND substr(w, length(w) - 1, 2) IN ({longs})
         THEN {_chop('w', '1')} ELSE w END AS w
  FROM xv7),
xv9 AS MATERIALIZED (  -- tidy 2: AEI after a consonant, within R1
  SELECT term, r1, r2,
    CASE WHEN length(w) - 2 >= r1
              AND {_in("substr(w, length(w), 1)", T.FI_AEI)}
              AND NOT {vin("substr(w, length(w) - 1, 1)")}
         THEN {_chop('w', '1')} ELSE w END AS w
  FROM xv8),
xv10 AS MATERIALIZED (  -- tidy 3+4: oj/uj drop j; jo drop o
  SELECT term, r1,
    CASE WHEN length(w2) - 2 >= r1 AND ends_with(w2, 'jo')
         THEN {_chop('w2', '1')} ELSE w2 END AS w
  FROM (SELECT term, r1,
          CASE WHEN length(w) - 2 >= r1
                    AND regexp_matches(w, '(oj|uj)$')
               THEN {_chop('w', '1')} ELSE w END AS w2
        FROM xv9)),
stemmap AS MATERIALIZED (  -- tidy 5: undouble last consonant
  SELECT term,
    CASE WHEN li >= 2 AND substr(w, li, 1) = substr(w, li - 1, 1)
         THEN substr(w, 1, li - 1) || substr(w, li + 1)
         ELSE w END AS stem
  FROM (SELECT term, w,
          length(w) - length(regexp_extract(w, '[{v}]*$')) AS li
        FROM xv10))"""


# -------------------------------------------------------------- Romanian


def romanian_ctes() -> str:
    v = _cls(T.RO_VOWELS)
    vin = lambda e: f"{e} ~ '[{v}]'"  # noqa: E731
    step0 = _suf_case("w", T.RO_STEP0)
    combo = _suf_case("w", T.RO_COMBO)
    combo_repl = ("CASE suf " + " ".join(
        f"WHEN '{_q(s)}' THEN '{T.RO_COMBO_REPL[c]}'"
        for s, c in T.RO_COMBO) + " ELSE '' END")
    std = _suf_case("w", T.RO_STD)
    verb = _suf_case("w", T.RO_VERB, within="rv")
    vsuf = _suf_case("w", T.RO_VOWEL_SUF)
    # suffix -> code maps for the gated actions
    std1 = [s for s, c in T.RO_STD if c == 1]
    std2 = [s for s, c in T.RO_STD if c == 2]
    verb2 = [s for s, c in T.RO_VERB if c == 2]
    in_list = lambda xs: ",".join(f"'{_q(s)}'" for s in xs)  # noqa: E731
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xrec AS MATERIALIZED (  -- prelude: sequential V[u/i]V marking
  WITH RECURSIVE r(term, w, i) AS (
    SELECT term, term AS w, 2 FROM xv0
    UNION ALL
    SELECT term,
      CASE WHEN {vin("substr(w, i - 1, 1)")} AND i < length(w)
                AND {vin("substr(w, i + 1, 1)")}
                AND substr(w, i, 1) = 'u'
           THEN substr(w, 1, i - 1) || 'U' || substr(w, i + 1)
           WHEN {vin("substr(w, i - 1, 1)")} AND i < length(w)
                AND {vin("substr(w, i + 1, 1)")}
                AND substr(w, i, 1) = 'i'
           THEN substr(w, 1, i - 1) || 'I' || substr(w, i + 1)
           ELSE w END,
      i + 1
    FROM r WHERE i <= length(w))
  SELECT term, w FROM r
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY i DESC) = 1),
xv1 AS MATERIALIZED (
  SELECT term, w, {_rv_romance_sql('w', v)} AS rv,
         {_r1_sql('w', v)} AS r1,
         {_r2_sql('w', v, _r1_sql('w', v))} AS r2
  FROM xrec),
xv2 AS MATERIALIZED (  -- step_0 (R1 gate, no fallthrough)
  SELECT term, rv, r1, r2,
    CASE WHEN suf = '' OR length(w) - length(suf) < r1 THEN w
         WHEN suf IN ('ul', 'ului') THEN {_chop('w', 'length(suf)')}
         WHEN suf = 'aua' THEN {_chop('w', 'length(suf)')} || 'a'
         WHEN suf IN ('ea', 'ele', 'elor')
         THEN {_chop('w', 'length(suf)')} || 'e'
         WHEN suf IN ('iua', 'iei', 'ii', 'ilor', 'iile', 'iilor')
         THEN {_chop('w', 'length(suf)')} || 'i'
         WHEN suf = 'ile'
         THEN CASE WHEN ends_with({_chop('w', '3')}, 'ab') THEN w
                   ELSE {_chop('w', '3')} || 'i' END
         WHEN suf = 'atei' THEN {_chop('w', '4')} || 'at'
         WHEN suf IN ('aţia', 'aţie')
         THEN {_chop('w', '4')} || 'aţi'
         ELSE w END AS w
  FROM (SELECT term, w, rv, r1, r2, {step0} AS suf FROM xv1)),
xcombo AS MATERIALIZED (  -- repeat combo_suffix (R1)
  WITH RECURSIVE rc(term, w, rv, r1, r2, rem, n) AS (
    SELECT term, w, rv, r1, r2, FALSE, 0 FROM xv2
    UNION ALL
    SELECT term, {_chop('w', 'length(suf)')} || ({combo_repl}),
           rv, r1, r2, TRUE, n + 1
    FROM (SELECT term, w, rv, r1, r2, n, {combo} AS suf FROM rc)
    WHERE suf <> '' AND length(w) - length(suf) >= r1 AND n < 40)
  SELECT term, w, rv, r1, r2, rem FROM rc
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY n DESC) = 1),
xv3 AS MATERIALIZED (  -- standard_suffix among (R2 gate)
  SELECT term, rv, r1, r2,
    CASE WHEN suf = '' OR length(w) - length(suf) < r2 THEN w
         WHEN suf IN ({in_list(std1)}) THEN {_chop('w', 'length(suf)')}
         WHEN suf IN ({in_list(std2)})
         THEN CASE WHEN ends_with({_chop('w', 'length(suf)')}, 'ţ')
                   THEN {_chop('w', 'length(suf) + 1')} || 't'
                   ELSE w END
         ELSE {_chop('w', 'length(suf)')} || 'ist' END AS w,
    (rem OR (suf <> '' AND length(w) - length(suf) >= r2
             AND NOT (suf IN ({in_list(std2)})
                      AND NOT ends_with({_chop('w', 'length(suf)')}, 'ţ'))))
      AS removed
  FROM (SELECT term, w, rv, r1, r2, rem, {std} AS suf FROM xcombo)),
xv4 AS MATERIALIZED (  -- verb_suffix within RV when nothing removed
  SELECT term, rv,
    CASE WHEN removed OR suf = '' THEN w
         WHEN suf IN ({in_list(verb2)}) THEN {_chop('w', 'length(suf)')}
         WHEN length(w) - length(suf) - 1 >= rv
              AND (NOT {vin("substr(w, length(w) - length(suf), 1)")}
                   OR substr(w, length(w) - length(suf), 1) = 'u')
         THEN {_chop('w', 'length(suf)')}
         ELSE w END AS w
  FROM (SELECT term, w, rv, removed, {verb} AS suf FROM xv3)),
stemmap AS MATERIALIZED (  -- vowel_suffix (RV) + postlude
  SELECT term,
    replace(replace(
      CASE WHEN suf <> '' AND length(w) - length(suf) >= rv
           THEN {_chop('w', 'length(suf)')} ELSE w END,
      'I', 'i'), 'U', 'u') AS stem
  FROM (SELECT term, w, rv, {vsuf} AS suf FROM xv4))"""


# ------------------------------------------------------------- Hungarian


def hungarian_ctes() -> str:
    v = _cls(T.HU_VOWELS)
    dbl = "|".join(T.HU_DOUBLE)
    undouble = ("substr({x}, 1, length({x}) - 2) || "
                "substr({x}, length({x}))")

    def repl_cte(src: str, dst: str, table) -> str:
        suf = _suf_case("w", [(s, 0) for s, _r in table])
        arms = " ".join(
            f"WHEN '{_q(s)}' THEN {_chop('w', len(s))} || '{r}'"
            for s, r in table)
        return f"""{dst} AS MATERIALIZED (
  SELECT term, r1,
    CASE WHEN suf = '' OR length(w) - length(suf) < r1 THEN w
         ELSE (CASE suf {arms} ELSE w END) END AS w
  FROM (SELECT term, w, r1, {suf} AS suf FROM {src}))"""

    def double_cte(src: str, dst: str, table) -> str:
        suf = _suf_case("w", table)
        chop = _chop("w", "length(suf)")
        return f"""{dst} AS MATERIALIZED (
  SELECT term, r1,
    CASE WHEN suf <> '' AND length(w) - length(suf) >= r1
              AND regexp_matches({chop}, '({dbl})$')
         THEN {undouble.format(x=chop)}
         ELSE w END AS w
  FROM (SELECT term, w, r1, {suf} AS suf FROM {src}))"""

    fc = f"(length(regexp_extract(w, '^[{v}]+')) + 1)"
    fv = f"length(regexp_extract(w, '^[^{v}]*[{v}]'))"
    digr = ",".join(f"'{d}'" for d in T.HU_DIGRAPHS if len(d) == 2)
    r1_sql = f"""(CASE WHEN substr(w, 1, 1) ~ '[{v}]' THEN
      CASE WHEN NOT regexp_matches(w, '[^{v}]') THEN length(w)
           WHEN substr(w, {fc}, 3) = 'dzs' THEN {fc} + 2
           WHEN substr(w, {fc}, 2) IN ({digr}) THEN {fc} + 1
           ELSE {fc} END
    WHEN regexp_matches(w, '[{v}]') THEN {fv}
    ELSE length(w) END)"""
    case_suf = _suf_case("w", T.HU_CASE)
    parts = [
        "xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f)",
        f"""xv1 AS MATERIALIZED (
  SELECT term, w, {r1_sql} AS r1
  FROM (SELECT term, term AS w FROM xv0))""",
        double_cte("xv1", "xv2", T.HU_INSTRUM),
        f"""xv3 AS MATERIALIZED (  -- case: delete + final-vowel fix
  SELECT term, r1,
    CASE WHEN NOT fired THEN w
         WHEN substr(w2, length(w2), 1) IN ('á', 'é')
              AND length(w2) - 1 >= r1
         THEN {_chop('w2', '1')} ||
              (CASE substr(w2, length(w2), 1)
                    WHEN 'á' THEN 'a' ELSE 'e' END)
         ELSE w2 END AS w
  FROM (SELECT term, w, r1,
          suf <> '' AND length(w) - length(suf) >= r1 AS fired,
          {_chop('w', 'length(suf)')} AS w2
        FROM (SELECT term, w, r1, {case_suf} AS suf FROM xv2)))""",
        repl_cte("xv3", "xv4", T.HU_CASE_SPECIAL),
        repl_cte("xv4", "xv5", T.HU_CASE_OTHER),
        double_cte("xv5", "xv6", T.HU_FACTIVE),
        repl_cte("xv6", "xv7", T.HU_OWNED),
        repl_cte("xv7", "xv8", T.HU_SING_OWNER),
        repl_cte("xv8", "xv9", T.HU_PLUR_OWNER),
        repl_cte("xv9", "xv10", T.HU_PLURAL),
        "stemmap AS MATERIALIZED (SELECT term, w AS stem FROM xv10)",
    ]
    return ",\n".join(parts)


# ---------------------------------------------------------------- Lovins


def _lovins_cond_sql(name: str, st: str) -> str:
    """Condition A-CC over the stem expression `st` — an independent
    SQL re-statement of analysis/lovins._cond (incl. the generated
    code's dead-branch quirks in H/O/R)."""
    n = f"length({st})"
    e = lambda suf: f"ends_with({st}, '{suf}')"  # noqa: E731
    if name == "A":
        return f"{n} >= 2"
    if name == "B":
        return f"{n} >= 3"
    if name == "C":
        return f"{n} >= 4"
    if name == "D":
        return f"{n} >= 5"
    if name == "E":
        return f"{n} >= 2 AND NOT {e('e')}"
    if name == "F":
        return f"{n} >= 3 AND NOT {e('e')}"
    if name == "G":
        return f"{n} >= 3 AND {e('f')}"
    if name == "H":
        return f"{n} >= 2 AND {e('ll')}"
    if name == "I":
        return f"{n} >= 2 AND NOT {e('o')} AND NOT {e('e')}"
    if name == "J":
        return f"{n} >= 2 AND NOT {e('a')} AND NOT {e('e')}"
    if name == "K":
        return (f"{n} >= 3 AND ({e('l')} OR {e('i')} OR ({e('e')} "
                f"AND substr({st}, {n} - 2, 1) = 'u'))")
    if name == "L":
        return (f"{n} >= 2 AND NOT {e('u')} AND NOT {e('x')} "
                f"AND NOT ({e('s')} AND NOT {e('os')})")
    if name == "M":
        return (f"{n} >= 2 AND NOT {e('a')} AND NOT {e('c')} "
                f"AND NOT {e('e')} AND NOT {e('m')}")
    if name == "N":
        return (f"{n} >= 3 AND (substr({st}, {n} - 2, 1) <> 's' "
                f"OR {n} >= 4)")
    if name == "O":
        return f"{n} >= 2 AND {e('i')}"
    if name == "P":
        return f"{n} >= 2 AND NOT {e('c')}"
    if name == "Q":
        return f"{n} >= 3 AND NOT {e('l')} AND NOT {e('n')}"
    if name == "R":
        return f"{n} >= 2 AND {e('r')}"
    if name == "S":
        return (f"{n} >= 2 AND ({e('dr')} OR ({e('t')} "
                f"AND NOT {e('tt')}))")
    if name == "T":
        return (f"{n} >= 2 AND ({e('s')} OR ({e('t')} "
                f"AND NOT {e('ot')}))")
    if name == "U":
        return (f"{n} >= 2 AND ({e('l')} OR {e('m')} OR {e('n')} "
                f"OR {e('r')})")
    if name == "V":
        return f"{n} >= 2 AND {e('c')}"
    if name == "W":
        return f"{n} >= 2 AND NOT {e('s')} AND NOT {e('u')}"
    if name == "X":
        return (f"{n} >= 2 AND ({e('l')} OR {e('i')} OR ({e('e')} "
                f"AND substr({st}, {n} - 2, 1) = 'u'))")
    if name == "Y":
        return f"{n} >= 2 AND {e('in')}"
    if name == "Z":
        return f"{n} >= 2 AND NOT {e('f')}"
    if name == "AA":
        alts = " OR ".join(e(s) for s in
                           ("d", "f", "ph", "th", "l", "er", "or",
                            "es", "t"))
        return f"{n} >= 2 AND ({alts})"
    if name == "BB":
        return f"{n} >= 3 AND NOT {e('met')} AND NOT {e('ryst')}"
    return f"{n} >= 2 AND {e('l')}"  # CC


def lovins_ctes() -> str:
    arms = []
    for suf, cond in sorted(T.LOVINS_ENDINGS, key=lambda x: -len(x[0])):
        st = _chop("w", len(suf))
        arms.append(f"WHEN ends_with(w, '{_q(suf)}') "
                    f"AND ({_lovins_cond_sql(cond, st)}) "
                    f"THEN {st}")
    endings = "CASE " + "\n    ".join(arms) + " ELSE w END"
    dbl = "|".join(T.LOVINS_DOUBLES)
    rarms = []
    for suf, rep, notpre in sorted(T.LOVINS_RESPELL,
                                   key=lambda x: -len(x[0])):
        act = f"{_chop('w', len(suf))} || '{rep}'"
        if notpre:
            gate = _in(f"substr(w, length(w) - {len(suf)}, 1)",
                       list(notpre))
            act = f"CASE WHEN {gate} THEN w ELSE {act} END"
        rarms.append(f"WHEN ends_with(w, '{suf}') THEN {act}")
    respell = "CASE " + " ".join(rarms) + " ELSE w END"
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (  -- endings: longest with in-among condition
  SELECT term, {endings} AS w
  FROM (SELECT term, term AS w FROM xv0)),
xv2 AS MATERIALIZED (  -- undouble
  SELECT term,
    CASE WHEN regexp_matches(w, '({dbl})$')
         THEN {_chop('w', '1')} ELSE w END AS w
  FROM xv1),
stemmap AS MATERIALIZED (  -- respell (gated on preceding char)
  SELECT term, {respell} AS stem FROM xv2)"""


# ---------------------------------------------------------------- Dutch


def dutch_ctes() -> str:
    v = _cls(T.NL_VOWELS)
    vin = lambda e: f"{e} ~ '[{v}]'"  # noqa: E731
    fold = "term"
    for a, b in sorted(T.NL_ACCENTS.items()):
        fold = f"replace({fold}, '{a}', '{b}')"
    vj = _cls(T.NL_VOWELS + "j")
    step1 = _suf_case("w", T.NL_STEP1)
    dsuf = _suf_case("w", T.NL_D_SUFFIX)
    undouble = ("CASE WHEN regexp_matches({x}, '(kk|dd|tt)$') "
                "THEN substr({x}, 1, length({x}) - 1) ELSE {x} END")
    # en_ending(u, p): p = position after deletion target; conditions
    # are emitted inline where used.
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (  -- accent fold + initial y -> Y
  SELECT term,
    CASE WHEN starts_with(f, 'y') THEN 'Y' || substr(f, 2) ELSE f END AS w
  FROM (SELECT term, {fold} AS f FROM xv0)),
xrec AS MATERIALIZED (  -- sequential i/y marking scan (left to right)
  WITH RECURSIVE r(term, w, i) AS (
    SELECT term, w, 2 FROM xv1
    UNION ALL
    SELECT term,
      CASE WHEN {vin("substr(w, i - 1, 1)")} AND substr(w, i, 1) = 'i'
                AND i < length(w) AND {vin("substr(w, i + 1, 1)")}
           THEN substr(w, 1, i - 1) || 'I' || substr(w, i + 1)
           WHEN {vin("substr(w, i - 1, 1)")} AND substr(w, i, 1) = 'y'
           THEN substr(w, 1, i - 1) || 'Y' || substr(w, i + 1)
           ELSE w END,
      i + 1
    FROM r WHERE i <= length(w))
  SELECT term, w FROM r
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY i DESC) = 1),
xv2 AS MATERIALIZED (
  SELECT term, w, {_r1_min3_sql('w', v)} AS r1,
         {_r2_sql('w', v, _r1_sql('w', v))} AS r2
  FROM xrec),
xv3 AS MATERIALIZED (  -- stage 1: heden/ene/en/se/s
  SELECT term, r1, r2,
    CASE WHEN suf = 'heden' AND length(w) - 5 >= r1
         THEN {_chop('w', '5')} || 'heid'
         WHEN suf IN ('en', 'ene') AND length(w) - length(suf) >= r1
              AND length(w) - length(suf) >= 1
              AND NOT {vin("substr(w, length(w) - length(suf), 1)")}
              AND substr(w, length(w) - length(suf) - 2, 3) <> 'gem'
         THEN {undouble.format(x=_chop('w', 'length(suf)'))}
         WHEN suf IN ('s', 'se') AND length(w) - length(suf) >= r1
              AND length(w) - length(suf) >= 1
              AND substr(w, length(w) - length(suf), 1) !~ '[{vj}]'
         THEN {_chop('w', 'length(suf)')}
         ELSE w END AS w
  FROM (SELECT term, w, r1, r2, {step1} AS suf FROM xv2)),
xv4 AS MATERIALIZED (  -- stage 2: e_ending (+ e_found flag)
  SELECT term, r1, r2,
    CASE WHEN efound THEN {undouble.format(x=_chop('w', '1'))}
         ELSE w END AS w, efound
  FROM (SELECT term, w, r1, r2,
          ends_with(w, 'e') AND length(w) - 1 >= r1 AND length(w) >= 2
            AND NOT {vin("substr(w, length(w) - 1, 1)")} AS efound
        FROM xv3)),
xv5 AS MATERIALIZED (  -- stage 3: heid (R2, not after c) + trailing en
  SELECT term, r1, r2, efound,
    CASE WHEN hd AND ends_with({_chop('w', '4')}, 'en')
              AND length(w) - 6 >= r1 AND length(w) - 6 >= 1
              AND NOT {vin("substr(w, length(w) - 6, 1)")}
              AND substr(w, length(w) - 8, 3) <> 'gem'
         THEN {undouble.format(x=_chop('w', '6'))}
         WHEN hd THEN {_chop('w', '4')}
         ELSE w END AS w
  FROM (SELECT term, w, r1, r2, efound,
          ends_with(w, 'heid') AND length(w) - 4 >= r2
            AND (length(w) < 5 OR substr(w, length(w) - 4, 1) <> 'c')
            AS hd
        FROM xv4)),
xv6 AS MATERIALIZED (  -- stage 4: end/ing/ig/lijk/baar/bar
  SELECT term, r1, r2,
    CASE WHEN suf IN ('end', 'ing') AND length(w) - length(suf) >= r2
         THEN CASE
           WHEN ends_with({_chop('w', 'length(suf)')}, 'ig')
                AND length(w) - length(suf) - 2 >= r2
                AND (length(w) - length(suf) < 3 OR
                     substr(w, length(w) - length(suf) - 2, 1) <> 'e')
           THEN {_chop('w', 'length(suf) + 2')}
           ELSE {undouble.format(x=_chop('w', 'length(suf)'))} END
         WHEN suf = 'ig' AND length(w) - 2 >= r2
              AND (length(w) < 3 OR substr(w, length(w) - 2, 1) <> 'e')
         THEN {_chop('w', '2')}
         WHEN suf = 'lijk' AND length(w) - 4 >= r2
         THEN CASE
           WHEN ends_with({_chop('w', '4')}, 'e')
                AND length(w) - 5 >= r1 AND length(w) - 4 >= 2
                AND NOT {vin("substr(w, length(w) - 5, 1)")}
           THEN {undouble.format(x=_chop('w', '5'))}
           ELSE {_chop('w', '4')} END
         WHEN suf = 'baar' AND length(w) - 4 >= r2
         THEN {_chop('w', '4')}
         WHEN suf = 'bar' AND length(w) - 3 >= r2 AND efound
         THEN {_chop('w', '3')}
         ELSE w END AS w
  FROM (SELECT term, w, r1, r2, efound, {dsuf} AS suf FROM xv5)),
stemmap AS MATERIALIZED (  -- stage 5: undouble vowel + postlude
  SELECT term,
    replace(replace(
      CASE WHEN length(w) >= 4
                AND substr(w, length(w), 1) !~ '[{v}I]'
                AND substr(w, length(w) - 2, 2)
                    IN ('aa', 'ee', 'oo', 'uu')
                AND NOT {vin("substr(w, length(w) - 3, 1)")}
           THEN {_chop('w', '2')} || substr(w, length(w), 1)
           ELSE w END, 'Y', 'y'), 'I', 'i') AS stem
  FROM xv6)"""


# -------------------------------------------------------------- Spanish


def spanish_ctes() -> str:
    v = _cls(T.ES_VOWELS)
    pron = _suf_case("w", [(p, 0) for p in T.ES_PRON])
    # markers matched on the pronoun-stripped tail
    mark = _suf_case("pw", T.ES_PRE_MARK)
    mcode = _code_case("msuf", T.ES_PRE_MARK)
    std = _suf_case("w", T.ES_STD)
    scode = _code_case("suf", T.ES_STD)
    a3 = _suf_case("w", T.ES_A3)
    a4 = _suf_case("w", T.ES_A4)
    a5 = _suf_case("w", T.ES_A5)
    yverb = _suf_case("w", T.ES_Y_VERB, within="rv")
    verb = _suf_case("w", T.ES_VERB, within="rv")
    vcode = _code_case("suf", T.ES_VERB)
    resid = _suf_case("w", T.ES_RESIDUAL)
    rcode = _code_case("suf", T.ES_RESIDUAL)
    post = "w"
    for a, b in sorted(T.ES_POST.items()):
        post = f"replace({post}, '{a}', '{b}')"
    chop_suf = _chop("w", "length(suf)")
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (
  SELECT term, term AS w, {_rv_romance_sql('term', v)} AS rv,
         {_r1_sql('term', v)} AS r1,
         {_r2_sql('term', v, _r1_sql('term', v))} AS r2
  FROM xv0),
xv2 AS MATERIALIZED (  -- attached pronoun
  SELECT term, rv, r1, r2,
    CASE WHEN msuf = '' OR length(pw) - length(msuf) < rv THEN w
         WHEN mcode = 1 THEN {_chop('pw', 'length(msuf)')} || 'iendo'
         WHEN mcode = 2 THEN {_chop('pw', 'length(msuf)')} || 'ando'
         WHEN mcode = 3 THEN {_chop('pw', 'length(msuf)')} || 'ar'
         WHEN mcode = 4 THEN {_chop('pw', 'length(msuf)')} || 'er'
         WHEN mcode = 5 THEN {_chop('pw', 'length(msuf)')} || 'ir'
         WHEN mcode = 6 THEN pw
         WHEN mcode = 7 AND ends_with(pw, 'yendo')
              AND ends_with({_chop('pw', '5')}, 'u') THEN pw
         ELSE w END AS w
  FROM (SELECT term, w, rv, r1, r2, pw, msuf, {mcode} AS mcode
        FROM (SELECT term, w, rv, r1, r2, pw, {mark} AS msuf
              FROM (SELECT term, w, rv, r1, r2,
                      CASE WHEN psuf <> ''
                           THEN {_chop('w', 'length(psuf)')}
                           ELSE '' END AS pw
                    FROM (SELECT term, w, rv, r1, r2, {pron} AS psuf
                          FROM xv1))))),
xv3 AS MATERIALIZED (  -- standard suffix (pattern b)
  SELECT term, rv, r1, r2,
    CASE WHEN code = 1 AND p >= r2 THEN {chop_suf}
         WHEN code = 2 AND p >= r2 THEN {chop_suf}
         WHEN code = 3 AND p >= r2 THEN {chop_suf} || 'log'
         WHEN code = 4 AND p >= r2 THEN {chop_suf} || 'u'
         WHEN code = 5 AND p >= r2 THEN {chop_suf} || 'ente'
         WHEN code = 6 AND p >= r1 THEN {chop_suf}
         WHEN code = 7 AND p >= r2 THEN {chop_suf}
         WHEN code = 8 AND p >= r2 THEN {chop_suf}
         WHEN code = 9 AND p >= r2 THEN {chop_suf}
         ELSE w END AS w,
    (CASE code WHEN 0 THEN FALSE
               WHEN 6 THEN p >= r1 ELSE p >= r2 END) AS chg,
    code
  FROM (SELECT term, w, rv, r1, r2, suf, {scode} AS code,
               length(w) - length(suf) AS p
        FROM (SELECT term, w, rv, r1, r2, {std} AS suf FROM xv2))),
xv4 AS MATERIALIZED (  -- nested among for std codes 2/6/7/8/9
  SELECT term, rv, r1, r2, chg,
    CASE WHEN NOT chg THEN w
         WHEN code = 2 AND ends_with(w, 'ic') AND length(w) - 2 >= r2
         THEN {_chop('w', '2')}
         WHEN code = 6 AND a3s <> '' AND length(w) - length(a3s) >= r2
         THEN CASE WHEN a3s = 'iv'
                        AND ends_with({_chop('w', '2')}, 'at')
                        AND length(w) - 4 >= r2
                   THEN {_chop('w', '4')}
                   ELSE {_chop('w', 'length(a3s)')} END
         WHEN code = 7 AND a4s <> '' AND length(w) - length(a4s) >= r2
         THEN {_chop('w', 'length(a4s)')}
         WHEN code = 8 AND a5s <> '' AND length(w) - length(a5s) >= r2
         THEN {_chop('w', 'length(a5s)')}
         WHEN code = 9 AND ends_with(w, 'at') AND length(w) - 2 >= r2
         THEN {_chop('w', '2')}
         ELSE w END AS w
  FROM (SELECT term, w, rv, r1, r2, chg, code,
               {a3} AS a3s, {a4} AS a4s, {a5} AS a5s FROM xv3)),
xv5 AS MATERIALIZED (  -- y_verb then verb (only when std did nothing)
  SELECT term, rv,
    CASE WHEN chg THEN w
         WHEN ysuf <> '' AND ends_with({_chop('w', 'length(ysuf)')}, 'u')
         THEN {_chop('w', 'length(ysuf)')}
         WHEN vsuf <> '' AND vc = 1
              AND ends_with({_chop('w', 'length(vsuf)')}, 'gu')
         THEN {_chop('w', 'length(vsuf) + 1')}
         WHEN vsuf <> '' THEN {_chop('w', 'length(vsuf)')}
         ELSE w END AS w
  FROM (SELECT term, w, rv, chg, ysuf, vsuf, {_code_case('vsuf', T.ES_VERB)} AS vc
        FROM (SELECT term, w, rv, chg, {yverb} AS ysuf, {verb} AS vsuf
              FROM xv4))),
stemmap AS MATERIALIZED (  -- residual + postlude
  SELECT term, {post.replace('w', 'w2')} AS stem
  FROM (SELECT term,
          CASE WHEN suf <> '' AND length(w) - length(suf) >= rv
               THEN CASE WHEN code = 2
                              AND ends_with({chop_suf}, 'u')
                              AND length(w) - length(suf) - 1 >= rv
                              AND ends_with({_chop('w', 'length(suf) + 1')}, 'g')
                         THEN {_chop('w', 'length(suf) + 1')}
                         ELSE {chop_suf} END
               ELSE w END AS w2
        FROM (SELECT term, w, rv, suf, {rcode} AS code
              FROM (SELECT term, w, rv, {resid} AS suf FROM xv5))))"""


# ----------------------------------------------------------- Portuguese


def portuguese_ctes() -> str:
    v = _cls(T.PT_VOWELS)
    std = _suf_case("w", T.PT_STD)
    scode = _code_case("suf", T.PT_STD)
    a2 = _suf_case("w", T.PT_A2)
    a3 = _suf_case("w", T.PT_A3)
    a4 = _suf_case("w", T.PT_A4)
    verb = _suf_case("w", T.PT_VERB, within="rv")
    resid = _suf_case("w", T.PT_RESIDUAL)
    form = _suf_case("w", T.PT_FORM)
    fcode = _code_case("suf", T.PT_FORM)
    chop_suf = _chop("w", "length(suf)")
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (
  SELECT term, w, {_rv_romance_sql('w', v)} AS rv,
         {_r1_sql('w', v)} AS r1,
         {_r2_sql('w', v, _r1_sql('w', v))} AS r2
  FROM (SELECT term,
          replace(replace(term, 'ã', 'a~'), 'õ', 'o~') AS w
        FROM xv0)),
xv2 AS MATERIALIZED (  -- standard suffix
  SELECT term, rv, r1, r2,
    CASE WHEN code = 1 AND p >= r2 THEN {chop_suf}
         WHEN code = 2 AND p >= r2 THEN {chop_suf} || 'log'
         WHEN code = 3 AND p >= r2 THEN {chop_suf} || 'u'
         WHEN code = 4 AND p >= r2 THEN {chop_suf} || 'ente'
         WHEN code = 5 AND p >= r1 THEN {chop_suf}
         WHEN code = 6 AND p >= r2 THEN {chop_suf}
         WHEN code = 7 AND p >= r2 THEN {chop_suf}
         WHEN code = 8 AND p >= r2 THEN {chop_suf}
         WHEN code = 9 AND p >= rv
              AND ends_with({chop_suf}, 'e') THEN {chop_suf} || 'ir'
         ELSE w END AS w,
    (CASE code WHEN 0 THEN FALSE
               WHEN 5 THEN p >= r1
               WHEN 9 THEN p >= rv AND ends_with({chop_suf}, 'e')
               ELSE p >= r2 END) AS chg,
    code
  FROM (SELECT term, w, rv, r1, r2, suf, {scode} AS code,
               length(w) - length(suf) AS p
        FROM (SELECT term, w, rv, r1, r2, {std} AS suf FROM xv1))),
xv3 AS MATERIALIZED (  -- nested among for std codes 5/6/7/8
  SELECT term, rv, r1, r2, chg,
    CASE WHEN NOT chg THEN w
         WHEN code = 5 AND a2s <> '' AND length(w) - length(a2s) >= r2
         THEN CASE WHEN a2s = 'iv'
                        AND ends_with({_chop('w', '2')}, 'at')
                        AND length(w) - 4 >= r2
                   THEN {_chop('w', '4')}
                   ELSE {_chop('w', 'length(a2s)')} END
         WHEN code = 6 AND a3s <> '' AND length(w) - length(a3s) >= r2
         THEN {_chop('w', 'length(a3s)')}
         WHEN code = 7 AND a4s <> '' AND length(w) - length(a4s) >= r2
         THEN {_chop('w', 'length(a4s)')}
         WHEN code = 8 AND ends_with(w, 'at') AND length(w) - 2 >= r2
         THEN {_chop('w', '2')}
         ELSE w END AS w
  FROM (SELECT term, w, rv, r1, r2, chg, code,
               {a2} AS a2s, {a3} AS a3s, {a4} AS a4s FROM xv2)),
xv4 AS MATERIALIZED (  -- verb (if std did nothing), then i-in-ci /
                       -- residual
  SELECT term, rv,
    CASE WHEN chg2 AND ends_with(w2, 'i') AND length(w2) - 1 >= rv
              AND ends_with({_chop('w2', '1')}, 'c')
         THEN {_chop('w2', '1')}
         WHEN chg2 THEN w2
         WHEN rsuf <> '' AND length(w2) - length(rsuf) >= rv
         THEN {_chop('w2', 'length(rsuf)')}
         ELSE w2 END AS w
  FROM (SELECT term, rv, w2, chg2, {_suf_case('w2', T.PT_RESIDUAL)} AS rsuf
        FROM (SELECT term, rv,
                CASE WHEN chg THEN w
                     WHEN vsuf <> '' THEN {_chop('w', 'length(vsuf)')}
                     ELSE w END AS w2,
                (chg OR vsuf <> '') AS chg2
              FROM (SELECT term, w, rv, chg, {verb} AS vsuf FROM xv3)))),
stemmap AS MATERIALIZED (  -- residual form + postlude
  SELECT term,
    replace(replace(w2, 'a~', 'ã'), 'o~', 'õ') AS stem
  FROM (SELECT term,
          CASE WHEN code = 2 THEN {_chop('w', '1')} || 'c'
               WHEN code = 1 AND length(w) - length(suf) >= rv
               THEN CASE
                 WHEN ends_with({chop_suf}, 'u')
                      AND ends_with({_chop('w', 'length(suf) + 1')}, 'g')
                      AND length(w) - length(suf) - 1 >= rv
                 THEN {_chop('w', 'length(suf) + 1')}
                 WHEN ends_with({chop_suf}, 'i')
                      AND ends_with({_chop('w', 'length(suf) + 1')}, 'c')
                      AND length(w) - length(suf) - 1 >= rv
                 THEN {_chop('w', 'length(suf) + 1')}
                 ELSE {chop_suf} END
               ELSE w END AS w2
        FROM (SELECT term, w, rv, suf, {fcode} AS code
              FROM (SELECT term, w, rv, {form} AS suf FROM xv4))))"""


# -------------------------------------------------------------- Italian


def italian_ctes() -> str:
    v = _cls(T.IT_VOWELS)
    aeio = _cls(T.IT_AEIO)
    fold = "term"
    for a, b in sorted(T.IT_ACCENTS.items()):
        fold = f"replace({fold}, '{a}', '{b}')"
    pron = _suf_case("w", [(p, 0) for p in T.IT_PRON])
    mark = _suf_case("pw", T.IT_PRE_MARK)
    mcode = _code_case("msuf", T.IT_PRE_MARK)
    std = _suf_case("w", T.IT_STD)
    scode = _code_case("suf", T.IT_STD)
    a4 = _suf_case("w", T.IT_A4)
    a5 = _suf_case("w", T.IT_A5)
    verb = _suf_case("w", T.IT_VERB, within="rv")
    chop_suf = _chop("w", "length(suf)")
    vin = lambda e: f"{e} ~ '[{v}]'"  # noqa: E731
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xv1 AS MATERIALIZED (  -- accent normalize + qu -> qU
  SELECT term, regexp_replace({fold}, 'qu', 'qU', 'g') AS w FROM xv0),
xrec AS MATERIALIZED (  -- sequential u/i between-vowel marking
  WITH RECURSIVE r(term, w, i) AS (
    SELECT term, w, 2 FROM xv1
    UNION ALL
    SELECT term,
      CASE WHEN i < length(w) AND {vin("substr(w, i - 1, 1)")}
                AND {vin("substr(w, i + 1, 1)")}
                AND substr(w, i, 1) = 'u'
           THEN substr(w, 1, i - 1) || 'U' || substr(w, i + 1)
           WHEN i < length(w) AND {vin("substr(w, i - 1, 1)")}
                AND {vin("substr(w, i + 1, 1)")}
                AND substr(w, i, 1) = 'i'
           THEN substr(w, 1, i - 1) || 'I' || substr(w, i + 1)
           ELSE w END,
      i + 1
    FROM r WHERE i <= length(w) - 1)
  SELECT term, w FROM r
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY i DESC) = 1),
xv2 AS MATERIALIZED (
  SELECT term, w, {_rv_romance_sql('w', v)} AS rv,
         {_r1_sql('w', v)} AS r1,
         {_r2_sql('w', v, _r1_sql('w', v))} AS r2
  FROM xrec),
xv3 AS MATERIALIZED (  -- attached pronoun
  SELECT term, rv, r1, r2,
    CASE WHEN msuf = '' OR length(pw) - length(msuf) < rv THEN w
         WHEN mcode = 1 THEN pw
         ELSE pw || 'e' END AS w
  FROM (SELECT term, w, rv, r1, r2, pw, msuf, {mcode} AS mcode
        FROM (SELECT term, w, rv, r1, r2, pw, {mark} AS msuf
              FROM (SELECT term, w, rv, r1, r2,
                      CASE WHEN psuf <> ''
                           THEN {_chop('w', 'length(psuf)')}
                           ELSE '' END AS pw
                    FROM (SELECT term, w, rv, r1, r2, {pron} AS psuf
                          FROM xv2))))),
xv4 AS MATERIALIZED (  -- standard suffix
  SELECT term, rv, r1, r2,
    CASE WHEN code = 1 AND p >= r2 THEN {chop_suf}
         WHEN code = 2 AND p >= r2 THEN {chop_suf}
         WHEN code = 3 AND p >= r2 THEN {chop_suf} || 'log'
         WHEN code = 4 AND p >= r2 THEN {chop_suf} || 'u'
         WHEN code = 5 AND p >= r2 THEN {chop_suf} || 'ente'
         WHEN code = 6 AND p >= rv THEN {chop_suf}
         WHEN code = 7 AND p >= r1 THEN {chop_suf}
         WHEN code = 8 AND p >= r2 THEN {chop_suf}
         WHEN code = 9 AND p >= r2 THEN {chop_suf}
         ELSE w END AS w,
    (CASE code WHEN 0 THEN FALSE
               WHEN 6 THEN p >= rv
               WHEN 7 THEN p >= r1 ELSE p >= r2 END) AS chg,
    code
  FROM (SELECT term, w, rv, r1, r2, suf, {scode} AS code,
               length(w) - length(suf) AS p
        FROM (SELECT term, w, rv, r1, r2, {std} AS suf FROM xv3))),
xv5 AS MATERIALIZED (  -- nested among for std codes 2/7/8/9
  SELECT term, rv, r1, r2, chg,
    CASE WHEN NOT chg THEN w
         WHEN code = 2 AND ends_with(w, 'ic') AND length(w) - 2 >= r2
         THEN {_chop('w', '2')}
         WHEN code = 7 AND a4s <> '' AND length(w) - length(a4s) >= r2
         THEN CASE WHEN a4s = 'iv'
                        AND ends_with({_chop('w', '2')}, 'at')
                        AND length(w) - 4 >= r2
                   THEN {_chop('w', '4')}
                   ELSE {_chop('w', 'length(a4s)')} END
         WHEN code = 8 AND a5s <> '' AND length(w) - length(a5s) >= r2
         THEN {_chop('w', 'length(a5s)')}
         WHEN code = 9 AND ends_with(w, 'at') AND length(w) - 2 >= r2
         THEN CASE WHEN ends_with({_chop('w', '2')}, 'ic')
                        AND length(w) - 4 >= r2
                   THEN {_chop('w', '4')}
                   ELSE {_chop('w', '2')} END
         ELSE w END AS w
  FROM (SELECT term, w, rv, r1, r2, chg, code,
               {a4} AS a4s, {a5} AS a5s FROM xv4)),
xv6 AS MATERIALIZED (  -- verb suffix (if std did nothing)
  SELECT term, rv,
    CASE WHEN chg THEN w
         WHEN vsuf <> '' THEN {_chop('w', 'length(vsuf)')}
         ELSE w END AS w
  FROM (SELECT term, w, rv, chg, {verb} AS vsuf FROM xv5)),
stemmap AS MATERIALIZED (  -- vowel_suffix + ch/gh + postlude
  SELECT term,
    replace(replace(
      CASE WHEN regexp_matches(w2, '[cg]h$') AND length(w2) - 1 >= rv
           THEN {_chop('w2', '1')} ELSE w2 END,
      'I', 'i'), 'U', 'u') AS stem
  FROM (SELECT term, rv,
          CASE WHEN va AND ends_with({_chop('w', '1')}, 'i')
                    AND length(w) - 2 >= rv
               THEN {_chop('w', '2')}
               WHEN va THEN {_chop('w', '1')}
               ELSE w END AS w2
        FROM (SELECT term, w, rv,
                substr(w, length(w), 1) ~ '[{aeio}]'
                  AND length(w) - 1 >= rv AS va
              FROM xv6)))"""


# --------------------------------------------------------------- French


def french_ctes() -> str:
    v = _cls(T.FR_VOWELS)
    vin = lambda e: f"{e} ~ '[{v}]'"  # noqa: E731
    std = _suf_case("w", T.FR_STD)
    scode = _code_case("suf", T.FR_STD)
    a1 = _suf_case("w", T.FR_A1)
    a1code = _code_case("a1s", T.FR_A1)
    a2 = _suf_case("w", T.FR_A2)
    a2code = _code_case("a2s", T.FR_A2)
    iverb = _suf_case("w", T.FR_I_VERB, within="rv")
    verb = _suf_case("w", T.FR_VERB, within="rv")
    vcode = _code_case("vsuf", T.FR_VERB)
    resid = _suf_case("w2", T.FR_RESIDUAL, within="rv")
    rcode = _code_case("rsuf", T.FR_RESIDUAL)
    chop_suf = _chop("w", "length(suf)")
    dbl = "|".join(T.FR_DOUBLES)
    keep = _cls(T.FR_KEEP_S)
    return f"""xv0 AS MATERIALIZED (SELECT DISTINCT term FROM tok_f),
xrec AS MATERIALIZED (  -- prelude walk: U/I/Y marking + qU
  WITH RECURSIVE r(term, w, i) AS (
    SELECT term, term, 1 FROM xv0
    UNION ALL
    SELECT term,
      CASE WHEN {vin("substr(w, i, 1)")} AND i < length(w)
                AND substr(w, i + 1, 1) = 'u' AND i + 2 <= length(w)
                AND {vin("substr(w, i + 2, 1)")}
           THEN substr(w, 1, i) || 'U' || substr(w, i + 2)
           WHEN {vin("substr(w, i, 1)")} AND i < length(w)
                AND substr(w, i + 1, 1) = 'i' AND i + 2 <= length(w)
                AND {vin("substr(w, i + 2, 1)")}
           THEN substr(w, 1, i) || 'I' || substr(w, i + 2)
           WHEN {vin("substr(w, i, 1)")} AND i < length(w)
                AND substr(w, i + 1, 1) = 'y'
           THEN substr(w, 1, i) || 'Y' || substr(w, i + 2)
           WHEN substr(w, i, 1) = 'y' AND i < length(w)
                AND {vin("substr(w, i + 1, 1)")}
           THEN substr(w, 1, i - 1) || 'Y' || substr(w, i + 1)
           WHEN substr(w, i, 1) = 'q' AND i < length(w)
                AND substr(w, i + 1, 1) = 'u'
           THEN substr(w, 1, i) || 'U' || substr(w, i + 2)
           ELSE w END,
      CASE WHEN {vin("substr(w, i, 1)")} AND i < length(w)
                AND ((substr(w, i + 1, 1) = 'u' AND i + 2 <= length(w)
                      AND {vin("substr(w, i + 2, 1)")})
                     OR (substr(w, i + 1, 1) = 'i'
                         AND i + 2 <= length(w)
                         AND {vin("substr(w, i + 2, 1)")})
                     OR substr(w, i + 1, 1) = 'y')
           THEN i + 2
           WHEN substr(w, i, 1) = 'y' AND i < length(w)
                AND {vin("substr(w, i + 1, 1)")}
           THEN i + 1
           WHEN substr(w, i, 1) = 'q' AND i < length(w)
                AND substr(w, i + 1, 1) = 'u'
           THEN i + 2
           ELSE i + 1 END
    FROM r WHERE i <= length(w))
  SELECT term, w FROM r
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY i DESC) = 1),
xv1 AS MATERIALIZED (
  SELECT term, w, {_rv_french_sql('w', v)} AS rv,
         {_r1_sql('w', v)} AS r1,
         {_r2_sql('w', v, _r1_sql('w', v))} AS r2
  FROM xrec),
xv2 AS MATERIALIZED (  -- standard suffix
  SELECT term, rv, r1, r2,
    CASE WHEN NOT chg THEN w
         WHEN code = 1 THEN {chop_suf}
         WHEN code = 2 THEN {chop_suf}
         WHEN code = 3 THEN {chop_suf} || 'log'
         WHEN code = 4 THEN {chop_suf} || 'u'
         WHEN code = 5 THEN {chop_suf} || 'ent'
         WHEN code = 6 THEN {chop_suf}
         WHEN code = 7 THEN {chop_suf}
         WHEN code = 8 THEN {chop_suf}
         WHEN code = 9 THEN {chop_suf} || 'eau'
         WHEN code = 10 THEN {chop_suf} || 'al'
         WHEN code = 11 AND p >= r2 THEN {chop_suf}
         WHEN code = 11 THEN {chop_suf} || 'eux'
         WHEN code = 12 THEN {chop_suf}
         WHEN code = 13 THEN {chop_suf} || 'ant'
         WHEN code = 14 THEN {chop_suf} || 'ent'
         WHEN code = 15 THEN {chop_suf}
         ELSE w END AS w,
    chg, code
  FROM (SELECT term, w, rv, r1, r2, suf, code, p,
          (CASE code WHEN 0 THEN FALSE
                WHEN 6 THEN p >= rv
                WHEN 9 THEN TRUE
                WHEN 10 THEN p >= r1
                WHEN 11 THEN p >= r1
                WHEN 12 THEN p >= r1 AND p >= 1 AND
                             substr(w, p, 1) !~ '[{v}]'
                WHEN 13 THEN p >= rv
                WHEN 14 THEN p >= rv
                WHEN 15 THEN p >= 1 AND substr(w, p, 1) ~ '[{v}]'
                             AND p - 1 >= rv
                ELSE p >= r2 END) AS chg
        FROM (SELECT term, w, rv, r1, r2, suf, {scode} AS code,
                     length(w) - length(suf) AS p
              FROM (SELECT term, w, rv, r1, r2, {std} AS suf
                    FROM xv1)))),
xv3 AS MATERIALIZED (  -- nested among for std codes 2/6/7/8
  SELECT term, rv, r1, r2, chg,
    CASE WHEN NOT chg THEN w
         WHEN code = 2 AND ends_with(w, 'ic')
         THEN CASE WHEN length(w) - 2 >= r2 THEN {_chop('w', '2')}
                   ELSE {_chop('w', '2')} || 'iqU' END
         WHEN code = 6 AND a1s <> '' THEN
           CASE WHEN a1c = 1 AND length(w) - 2 >= r2
                THEN CASE WHEN ends_with({_chop('w', '2')}, 'at')
                               AND length(w) - 4 >= r2
                          THEN {_chop('w', '4')}
                          ELSE {_chop('w', '2')} END
                WHEN a1c = 2 AND length(w) - 3 >= r2
                THEN {_chop('w', '3')}
                WHEN a1c = 2 AND length(w) - 3 >= r1
                THEN {_chop('w', '3')} || 'eux'
                WHEN a1c = 3 AND length(w) - length(a1s) >= r2
                THEN {_chop('w', 'length(a1s)')}
                WHEN a1c = 4 AND length(w) - 3 >= rv
                THEN {_chop('w', '3')} || 'i'
                ELSE w END
         WHEN code = 7 AND a2s <> '' THEN
           CASE WHEN a2c = 1
                THEN CASE WHEN length(w) - 4 >= r2
                          THEN {_chop('w', '4')}
                          ELSE {_chop('w', '4')} || 'abl' END
                WHEN a2c = 2
                THEN CASE WHEN length(w) - 2 >= r2
                          THEN {_chop('w', '2')}
                          ELSE {_chop('w', '2')} || 'iqU' END
                WHEN a2c = 3 AND length(w) - 2 >= r2
                THEN {_chop('w', '2')}
                ELSE w END
         WHEN code = 8 AND ends_with(w, 'at') AND length(w) - 2 >= r2
         THEN CASE WHEN ends_with({_chop('w', '2')}, 'ic')
                   THEN CASE WHEN length(w) - 4 >= r2
                             THEN {_chop('w', '4')}
                             ELSE {_chop('w', '4')} || 'iqU' END
                   ELSE {_chop('w', '2')} END
         ELSE w END AS w
  FROM (SELECT term, w, rv, r1, r2, chg, code,
               a1s, {a1code} AS a1c, a2s, {a2code} AS a2c
        FROM (SELECT term, w, rv, r1, r2, chg, code,
                     {a1} AS a1s, {a2} AS a2s FROM xv2))),
xv4 AS MATERIALIZED (  -- i_verb then verb (when std did nothing)
  SELECT term, rv, r1, r2,
    CASE WHEN chg THEN w
         WHEN isuf <> '' AND length(w) - length(isuf) - 1 >= rv
              AND substr(w, length(w) - length(isuf), 1) !~ '[{v}]'
         THEN {_chop('w', 'length(isuf)')}
         WHEN vok AND vc = 1 THEN {_chop('w', 'length(vsuf)')}
         WHEN vok AND vc = 2 THEN {_chop('w', 'length(vsuf)')}
         WHEN vok AND vc = 3 THEN
           CASE WHEN ends_with({_chop('w', 'length(vsuf)')}, 'e')
                     AND length(w) - length(vsuf) - 1 >= rv
                THEN {_chop('w', 'length(vsuf) + 1')}
                ELSE {_chop('w', 'length(vsuf)')} END
         ELSE w END AS w,
    (chg
     OR (isuf <> '' AND length(w) - length(isuf) - 1 >= rv
         AND substr(w, length(w) - length(isuf), 1) !~ '[{v}]')
     OR vok) AS chg
  FROM (SELECT term, w, rv, r1, r2, chg, isuf, vsuf, vc,
          (NOT chg AND NOT (isuf <> ''
               AND length(w) - length(isuf) - 1 >= rv
               AND substr(w, length(w) - length(isuf), 1) !~ '[{v}]')
           AND vsuf <> ''
           AND (vc <> 1 OR length(w) - length(vsuf) >= r2)) AS vok
        FROM (SELECT term, w, rv, r1, r2, chg,
                CASE WHEN chg THEN '' ELSE {iverb} END AS isuf,
                vsuf, {vcode} AS vc
              FROM (SELECT term, w, rv, r1, r2, chg,
                      CASE WHEN chg THEN '' ELSE {verb} END AS vsuf
                    FROM xv3)))),
xv5 AS MATERIALIZED (  -- fixup (changed) OR residual (unchanged)
  SELECT term, rv, r1, r2,
    CASE WHEN chg AND ends_with(w, 'Y') THEN {_chop('w', '1')} || 'i'
         WHEN chg AND ends_with(w, 'ç') THEN {_chop('w', '1')} || 'c'
         WHEN chg THEN w
         ELSE w END AS w,
    chg
  FROM xv4),
xv6 AS MATERIALIZED (  -- residual suffix (only when nothing changed)
  SELECT term, rv,
    CASE WHEN chg THEN w2
         WHEN rsuf <> '' AND rc = 1
              AND length(w2) - 3 >= r2
              AND length(w2) - 4 >= rv
              AND substr(w2, length(w2) - 3, 1) IN ('s', 't')
         THEN {_chop('w2', '3')}
         WHEN rsuf <> '' AND rc = 2
         THEN {_chop('w2', 'length(rsuf)')} || 'i'
         WHEN rsuf <> '' AND rc = 3 THEN {_chop('w2', '1')}
         WHEN rsuf <> '' AND rc = 4
              AND ends_with({_chop('w2', '1')}, 'gu')
         THEN {_chop('w2', '1')}
         ELSE w2 END AS w
  FROM (SELECT term, rv, r2, chg, w2, rsuf, {rcode} AS rc
        FROM (SELECT term, rv, r1, r2, chg,
                CASE WHEN NOT chg AND ends_with(w, 's')
                          AND length(w) >= 2
                          AND substr(w, length(w) - 1, 1) !~ '[{keep}]'
                     THEN {_chop('w', '1')} ELSE w END AS w2
              FROM xv5) t
        CROSS JOIN LATERAL (SELECT {resid} AS rsuf) s)),
stemmap AS MATERIALIZED (  -- un_double + un_accent + postlude
  SELECT term,
    replace(replace(replace(
      CASE WHEN regexp_matches(w2, '[éè][^{v}]+$')
           THEN regexp_replace(w2, '[éè]([^{v}]+)$', 'e\\1')
           ELSE w2 END,
      'I', 'i'), 'U', 'u'), 'Y', 'y') AS stem
  FROM (SELECT term,
          CASE WHEN regexp_matches(w, '({dbl})$')
               THEN {_chop('w', '1')} ELSE w END AS w2
        FROM xv6))"""
