"""Driver-mimicking correctness gate: every __spark_entry__.queries() entry
vs its oracle_sql() in DuckDB at sf0.01 — row count, column names, and
order-insensitive value equality (the same comparison CORRECTNESS_r{N}.json
records)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES), ids=sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    got_df = QUERIES[name](spark, SF_DIR)
    got_cols = got_df.columns
    got = [tuple(r) for r in got_df.collect()]

    want_rel = con.sql(ORACLES[name])
    want_cols = [c for c in want_rel.columns]
    want = want_rel.fetchall()

    assert sorted(got_cols) == sorted(want_cols), (
        f"{name}: columns {got_cols} != {want_cols}"
    )
    assert len(got) == len(want), f"{name}: rowcount {len(got)} != {len(want)}"
    g, w = _canon(got, got_cols), _canon(want, want_cols)
    assert g == w, f"{name}: first diff {next(((a, b) for a, b in zip(g, w) if a != b), None)}"


def test_all_queries_have_oracle_or_reason():
    # every contract entry has an exact oracle (the LSH/IVF "approximate"
    # operators are deterministic, so they do too)
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["doc_id", "score"]
