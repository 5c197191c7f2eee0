"""Event-log decomposition of the FULL segmented-index build: per-stage
wall/run/cpu/tasks for two build reps — finds serial or under-parallel
stages (the 2->8 scaling question).

Usage: taskset -c 0-7 python tools/diag_build.py --cpus 8 --files 500000
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_eventlog(evdir: str) -> None:
    stages = {}
    jobs = {}
    for d in glob.glob(evdir + "/*"):
        files = glob.glob(d + "/events_*") if os.path.isdir(d) else [d]
        for path in files:
            if path.endswith(".zstd"):
                p = subprocess.run(["zstd", "-dc", path],
                                   capture_output=True, text=True)
                lines = p.stdout.splitlines()
            else:
                lines = open(path).read().splitlines()
            for line in lines:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    key = (si["Stage ID"], si["Stage Attempt ID"])
                    d2 = stages.setdefault(key, {"run": 0, "cpu": 0,
                                                 "fail": 0, "n": 0,
                                                 "in": 0, "sw": 0, "sr": 0})
                    d2["name"] = si["Stage Name"].split("\n")[0][:70]
                    d2["tasks"] = si["Number of Tasks"]
                    d2["wall"] = (si.get("Completion Time", 0)
                                  - si.get("Submission Time", 0)) / 1000
                elif e == "SparkListenerTaskEnd":
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    d2 = stages.setdefault(key, {"run": 0, "cpu": 0,
                                                 "fail": 0, "n": 0,
                                                 "in": 0, "sw": 0, "sr": 0})
                    if ev.get("Task End Reason", {}).get("Reason") != "Success":
                        d2["fail"] += 1
                    d2["n"] += 1
                    m = ev.get("Task Metrics") or {}
                    d2["run"] += m.get("Executor Run Time", 0) / 1000
                    d2["cpu"] += m.get("Executor CPU Time", 0) / 1e9
                    d2["in"] += m.get("Input Metrics", {}).get("Bytes Read", 0) / 1e6
                    d2["sw"] += (m.get("Shuffle Write Metrics", {})
                                 .get("Shuffle Bytes Written", 0)) / 1e6
                    d2["sr"] += ((m.get("Shuffle Read Metrics", {})
                                  .get("Local Bytes Read", 0))
                                 + (m.get("Shuffle Read Metrics", {})
                                    .get("Remote Bytes Read", 0))) / 1e6
    for key in sorted(stages):
        st = stages[key]
        if st["n"] == 0:
            continue
        print(f"stage {key}: tasks={st.get('tasks', '?')}"
              f" wall={st.get('wall', 0):7.1f}s run={st['run']:8.1f}s"
              f" cpu={st['cpu']:8.1f}s fail={st['fail']}"
              f" in={st['in']:7.0f}MB sw={st['sw']:7.0f}MB"
              f" sr={st['sr']:7.0f}MB  {st.get('name', '?')}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--files", type=int, default=500000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--parts", type=int, default=64)
    a = ap.parse_args()

    evdir = "/tmp/diag_build_eventlog"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import SparkSession
    from lucenenet_spark.session import _MALLOC_ENV, _local_dir

    # mirror get_spark EXACTLY (malloc env + ParallelGC + fixed heap) so
    # the decomposition profiles the engine's real runtime, then add
    # event logging on top
    for k, v in _MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    spark = (SparkSession.builder.master(f"local[{a.cpus}]")
             .appName("diag_build")
             .config("spark.sql.shuffle.partitions", str(max(a.cpus, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "8g"))
             .config("spark.driver.extraJavaOptions",
                     os.environ.get("SPARK_GRAFT_JAVA_OPTS",
                                    "-XX:+UseParallelGC"))
             .config("spark.local.dir", _local_dir())
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", evdir)
             .config("spark.eventLog.compress", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    t0 = time.time()
    corpus = with_doc_ids(
        corpus_df(spark, a.files, partitions=a.parts), ("repo", "path")).cache()
    corpus.count()
    print(f"corpus: {time.time()-t0:.1f}s", flush=True)

    seg = None
    marks = []
    for rep in range(a.reps):
        if seg is not None:
            seg.segments.unpersist()
        t0 = time.time()
        seg = build_segmented_index(spark, corpus, text_col="content",
                                    lang_col="lang")
        marks.append(round(time.time() - t0, 2))
        print(f"build rep {rep}: {marks[-1]}s", flush=True)

    spark.stop()
    time.sleep(2)
    parse_eventlog(evdir)


if __name__ == "__main__":
    main()
