"""Root-cause the 2M-file throughput dip (BENCH/data_scaling.json r3:
73.1k files/s at 1M -> 54.7k at 2M) with the same A/B discipline as
tools/diag_build.py: one variable per run, pinned cores, untimed warmup,
min-of-reps, exact co-tenant accounting.

Variants (each a separate subprocess/JVM):
  invert   -- target_segments = n_partitions: the merge wave never runs;
              isolates the invert+encode stage
  full     -- the data_scaling baseline (one-shot merge to 1 segment)
  heap16   -- full build with SPARK_DRIVER_MEM=16g (corpus-cache /
              GC-pressure suspect)
  twolevel -- full build with fan_in=23 (500 -> 22 -> 1 two-wave merge;
              merge-row-growth suspect: bounds per-reducer fan-in)
  nocache  -- corpus persisted DISK_ONLY instead of MEMORY (cache-
              pressure suspect without changing the heap)

Usage: python tools/diag_dip.py                 (driver: full matrix)
       python tools/diag_dip.py --run --files N --variant full
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = 32


def single_run(n_files: int, variant: str, reps: int = 2) -> None:
    from tools.scaling_bench import _stat_busy_sec, _tree_cpu_sec

    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.session import get_spark
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    if variant == "heap16":
        os.environ["SPARK_DRIVER_MEM"] = "16g"
    spark = get_spark(f"dip_{variant}_{n_files}", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    parts = max(64, n_files // 4000)
    corpus = with_doc_ids(
        corpus_df(spark, n_files, partitions=parts), ("repo", "path"))
    if variant == "nocache":
        from pyspark import StorageLevel
        corpus = corpus.persist(StorageLevel.DISK_ONLY)
    else:
        corpus = corpus.cache()
    corpus.count()

    kw = {}
    if variant == "invert":
        kw["target_segments"] = parts
    elif variant == "twolevel":
        kw["fan_in"] = 23

    def build():
        return build_segmented_index(spark, corpus, text_col="content",
                                     lang_col="lang", **kw)

    warm = build()
    warm.segments.unpersist()

    ncores = os.cpu_count() or 32
    times, cots = [], []
    seg = None
    for _ in range(reps):
        if seg is not None:
            seg.segments.unpersist()
        own0, b0, t0 = _tree_cpu_sec(), _stat_busy_sec(), time.time()
        seg = build()
        wall = time.time() - t0
        times.append(wall)
        other = max(0.0, (_stat_busy_sec() - b0) - (_tree_cpu_sec() - own0))
        cots.append(other / (wall * ncores))
    best = min(range(reps), key=lambda i: times[i])
    print(json.dumps({
        "files": n_files, "variant": variant, "partitions": parts,
        "build_sec": round(times[best], 3),
        "build_reps_sec": [round(t, 3) for t in times],
        "best_rep_cotenant_frac": round(cots[best], 4),
        "files_per_sec": round(n_files / times[best], 1),
    }))


def driver() -> None:
    from tools.scaling_bench import _wait_quiet

    matrix = [
        (1000000, "invert"), (2000000, "invert"),
        (1000000, "full"), (2000000, "full"),
        (2000000, "heap16"), (2000000, "twolevel"), (2000000, "nocache"),
    ]
    out = []
    for n, variant in matrix:
        load = _wait_quiet()
        r = subprocess.run(
            ["taskset", "-c", f"0-{CPUS - 1}", sys.executable,
             os.path.abspath(__file__), "--run", "--files", str(n),
             "--variant", variant],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print(f"{n}/{variant} FAILED:\n{r.stdout[-2000:]}\n"
                  f"{r.stderr[-2000:]}", flush=True)
            continue
        rec = json.loads(lines[-1])
        rec["loadavg_before"] = load
        out.append(rec)
        print(f"{n} {variant}: {rec['files_per_sec']} files/s "
              f"(best {rec['build_sec']}s, reps {rec['build_reps_sec']}, "
              f"cotenant {rec['best_rep_cotenant_frac']:.1%})", flush=True)
        time.sleep(20)
    with open("BENCH/diag_dip.json", "w") as f:
        json.dump({"cpus": CPUS, "runs": out}, f, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--files", type=int, default=2000000)
    ap.add_argument("--variant", default="full")
    ap.add_argument("--reps", type=int, default=2)
    a = ap.parse_args()
    if a.run:
        single_run(a.files, a.variant, a.reps)
    else:
        driver()
