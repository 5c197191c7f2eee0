"""Diagnose the first-rep CPU blowup of the invert stage at high core
counts: event-log every job, run the invert noop three times over a cached
corpus, then report per-stage task counts / run time / failures — shows
whether the corpus cache is being recomputed, tasks are retried, or the
CPU genuinely goes to the kernel.

Usage: taskset -c 0-31 python tools/diag_invert.py --cpus 32 --files 500000
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files", type=int, default=500000)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()

    evdir = "/tmp/diag_eventlog"
    os.makedirs(evdir, exist_ok=True)
    for f in glob.glob(evdir + "/*"):
        os.remove(f)
    os.environ["SPARK_GRAFT_EVENTLOG"] = evdir

    from pyspark.sql import SparkSession
    from lucenenet_spark.session import get_spark, _local_dir

    # replicate get_spark but with event logging on
    spark = (SparkSession.builder.master(f"local[{a.cpus}]")
             .appName("diag_invert")
             .config("spark.sql.shuffle.partitions", str(max(a.cpus, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", f"{min(64, max(8, (5 * a.cpus) // 2))}g")
             .config("spark.local.dir", _local_dir())
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", evdir)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    print("jvm maxMemory GiB:", round(rt.maxMemory() / (1 << 30), 1), flush=True)

    from lucenenet_spark.index.segments import SEGMENT_SCHEMA, _invert_partition
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    t0 = time.time()
    corpus = with_doc_ids(
        corpus_df(spark, a.files, partitions=64), ("repo", "path")).cache()
    n = corpus.count()
    print(f"corpus materialize: {time.time()-t0:.1f}s rows={n}", flush=True)

    inv = corpus.select("doc_id", "content", "lang").mapInPandas(
        _invert_partition("content", "doc_id", "content", "lang", True),
        SEGMENT_SCHEMA)

    for rep in range(a.reps):
        t0 = time.time()
        inv.write.format("noop").mode("overwrite").save()
        print(f"invert rep {rep}: {time.time()-t0:.2f}s", flush=True)

    spark.stop()
    time.sleep(2)

    # parse event log: per-stage totals
    stages = {}
    for path in glob.glob(evdir + "/*"):
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    key = (si["Stage ID"], si["Stage Attempt ID"])
                    stages[key] = {
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "tasks": si["Number of Tasks"],
                        "failed": si.get("Failure Reason") is not None,
                        "submit": si.get("Submission Time"),
                        "complete": si.get("Completion Time"),
                        "run_ms": 0, "cpu_ms": 0, "task_fail": 0,
                        "input_mb": 0.0, "spill_mb": 0.0,
                    }
                elif e == "SparkListenerTaskEnd":
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    st = stages.setdefault(key, {
                        "name": "?", "tasks": 0, "failed": False,
                        "run_ms": 0, "cpu_ms": 0, "task_fail": 0,
                        "input_mb": 0.0, "spill_mb": 0.0})
                    if ev.get("Task End Reason", {}).get("Reason") != "Success":
                        st["task_fail"] += 1
                    m = ev.get("Task Metrics") or {}
                    st["run_ms"] += m.get("Executor Run Time", 0)
                    st["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                    st["input_mb"] += (m.get("Input Metrics", {})
                                       .get("Bytes Read", 0)) / 1e6
                    st["spill_mb"] += m.get("Memory Bytes Spilled", 0) / 1e6

    for key in sorted(stages):
        st = stages[key]
        wall = ((st.get("complete") or 0) - (st.get("submit") or 0)) / 1000
        print(f"stage {key}: {st['tasks']:4d} tasks  wall {wall:7.1f}s  "
              f"run {st['run_ms']/1000:8.1f}s  cpu {st['cpu_ms']/1000:8.1f}s  "
              f"fail {st['task_fail']:3d}  in {st['input_mb']:8.1f}MB  "
              f"spill {st['spill_mb']:8.1f}MB  {st['name']}", flush=True)


if __name__ == "__main__":
    main()
