"""Phase breakdown of the segmented-index build at one parallelism level:
where does wall time go beyond the invert kernel (the 8->32 scaling
question — BENCH/hw_ceiling.json's real-kernel ceiling vs the engine).

Phases measured by materializing successive pipeline prefixes with the
noop sink (no collect, no cache interference):
  invert       mapInPandas(_invert_partition) only
  merge        invert + merge_wave shuffle + byte-concat kernel
  full         build_segmented_index (adds cache materialization + stats)

Usage: taskset -c 0-31 python tools/profile_build.py --cpus 32 --files 200000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files", type=int, default=200000)
    ap.add_argument("--reps", type=int, default=2)
    a = ap.parse_args()

    from lucenenet_spark.index.segments import (
        SEGMENT_SCHEMA, _invert_partition, build_segmented_index, merge_wave)
    from lucenenet_spark.session import get_spark
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    spark = get_spark(f"profile_{a.cpus}", cpus=a.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = with_doc_ids(
        corpus_df(spark, a.files, partitions=64), ("repo", "path")).cache()
    corpus.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    inv = corpus.select("doc_id", "content", "lang").mapInPandas(
        _invert_partition("content", "doc_id", "content", "lang", True),
        SEGMENT_SCHEMA)

    out = {"cpus": a.cpus, "files": a.files}

    from tools.scaling_bench import _tree_cpu_sec

    def run(name, fn):
        ts, cs = [], []
        for _ in range(a.reps):
            c0, t0 = _tree_cpu_sec(), time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
            cs.append(round(_tree_cpu_sec() - c0, 1))
        best = min(range(a.reps), key=lambda i: ts[i])
        out[name] = {"min": ts[best], "cpu_at_min": cs[best],
                     "all": ts, "cpu_all": cs}
        print(name, out[name], flush=True)

    run("invert", lambda: noop(inv))
    run("invert_merge", lambda: noop(merge_wave(inv, fan_in=64)))

    def full():
        idx = build_segmented_index(spark, corpus, text_col="content",
                                    lang_col="lang")
        idx.segments.unpersist()

    run("full_build", full)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
