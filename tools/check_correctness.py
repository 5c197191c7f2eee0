"""Local mimic of the driver's correctness gate: run every `queries()`
entry on Spark and its `oracle_sql()` twin on DuckDB at the same sf, then
compare row count, schema (column names), and a value hash computed over
columns sorted by name and rows sorted by all columns.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from lucenenet_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')"
            )

    qs, oracles = entry.queries(), entry.oracle_sql()
    results = {}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:500]}
            n_fail += 1
            print(f"FAIL {name}: SPARK_ERROR {str(e)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = {
                "status": "ROWS_ONLY", "rows": len(srows),
                "sec": round(time.time() - t0, 2),
            }
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:500]}
            n_fail += 1
            print(f"FAIL {name}: ORACLE_ERROR {str(e)[:200]}")
            continue
        rc = len(srows) == len(orows)
        sc = sorted(scols) == sorted(ocols)
        vh = value_hash(scols, srows) == value_hash(ocols, orows) if rc and sc else False
        ok = rc and sc and vh
        results[name] = {
            "status": "PASS" if ok else "FAIL",
            "rows": len(srows), "oracle_rows": len(orows),
            "schema_match": sc, "hash_match": vh,
            "sec": round(time.time() - t0, 2),
        }
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows, {results[name]['sec']}s)")
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}, "
                  f"schema={sc} ({scols} vs {ocols}), hash={vh}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    with open("/tmp/correctness_local.json", "w") as f:
        json.dump(results, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
