"""Data-volume scaling evidence at fixed parallelism: build the index
over growing corpus sizes at local[32] and report files/sec per size.
Constant throughput across a 8x size sweep is the single-node evidence
that per-file cost does not grow with corpus size — the property that
lets the 100 TB build be sized as (bytes / per-node-throughput / nodes).

Methodology mirrors tools/scaling_bench.py: pinned cores, untimed
warmup build per size (steady-state capability), then min of `reps`
timed builds, with exact co-tenant CPU accounting per rep.

Usage: python tools/data_scaling.py            (driver: all sizes)
       python tools/data_scaling.py --run --files 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (250000, 500000, 1000000, 2000000)
CPUS = 32


def single_run(n_files: int, reps: int = 3) -> None:
    from tools.scaling_bench import _stat_busy_sec, _tree_cpu_sec

    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.session import get_spark
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    spark = get_spark(f"dscale_{n_files}", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # split size ~4k docs (~600k tokens): the invert kernel's working set
    # (six parallel int64/object arrays over the partition's tokens) then
    # stays inside L3, where its per-file cost is flat — measured 0.24
    # ms/file at 2k docs/split vs 0.90 at 32k (cache cliff past ~8k).
    # 2M files: 19.9k files/s at 15k-doc splits vs 50.8k at 4k-doc splits,
    # same box, same heap.  On a real cluster this is the input-split
    # size knob (spark.sql.files.maxPartitionBytes): split COUNT grows
    # with data, split SIZE stays cache-resident.
    parts = max(64, n_files // 4000)
    corpus = with_doc_ids(
        corpus_df(spark, n_files, partitions=parts), ("repo", "path")
    ).cache()
    corpus.count()

    warm = build_segmented_index(spark, corpus, text_col="content",
                                 lang_col="lang")
    warm.segments.unpersist()

    ncores = os.cpu_count() or 32
    times, cots = [], []
    seg = None
    for _ in range(reps):
        if seg is not None:
            seg.segments.unpersist()
        own0, b0, t0 = _tree_cpu_sec(), _stat_busy_sec(), time.time()
        seg = build_segmented_index(spark, corpus, text_col="content",
                                    lang_col="lang")
        wall = time.time() - t0
        times.append(wall)
        other = max(0.0, (_stat_busy_sec() - b0) - (_tree_cpu_sec() - own0))
        cots.append(other / (wall * ncores))
    best = min(range(reps), key=lambda i: times[i])
    print(json.dumps({
        "files": n_files,
        "partitions": parts,
        "build_sec": round(times[best], 3),
        "build_reps_sec": [round(t, 3) for t in times],
        "best_rep_cotenant_frac": round(cots[best], 4),
        "files_per_sec": round(n_files / times[best], 1),
    }))


def driver() -> None:
    from tools.scaling_bench import _wait_quiet

    out = {}
    for n in SIZES:
        load = _wait_quiet()
        r = subprocess.run(
            ["taskset", "-c", f"0-{CPUS - 1}", sys.executable,
             os.path.abspath(__file__), "--run", "--files", str(n)],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        rec = json.loads(line)
        rec["loadavg_before"] = load
        out[n] = rec
        print(f"{n}: {rec['files_per_sec']} files/sec "
              f"(build {rec['build_sec']}s, cotenant "
              f"{rec['best_rep_cotenant_frac']:.1%})", flush=True)
        time.sleep(30)

    base = out[SIZES[0]]["files_per_sec"]
    summary = {
        "cpus": CPUS,
        "sizes": {str(n): out[n]["files_per_sec"] for n in SIZES},
        "throughput_vs_smallest": {
            str(n): round(out[n]["files_per_sec"] / base, 3) for n in SIZES},
        "runs": out,
        "note": ("flat files/sec across an 8x corpus sweep = per-file "
                 "cost independent of corpus size at fixed parallelism; "
                 "with the cluster-size scaling in scaling.json this is "
                 "the 100 TB sizing evidence"),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/data_scaling.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--files", type=int, default=500000)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    if a.run:
        single_run(a.files, a.reps)
    else:
        driver()
