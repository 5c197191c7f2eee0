"""Sample per-process CPU while the first invert rep runs at local[N]:
identifies which processes (JVM, pyspark daemons, workers) burn the CPU
during the cold-start blowup.

Usage: taskset -c 0-31 python tools/diag_sample.py --cpus 32 --files 500000
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def proc_table():
    tick = os.sysconf("SC_CLK_TCK")
    out = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                head, rest = f.read().rsplit(")", 1)
            comm = head.split("(", 1)[1]
            v = rest.split()
            out[int(pid)] = (comm, (int(v[11]) + int(v[12])) / tick,
                             int(v[17]))  # comm, cpu_sec, num_threads
        except (OSError, IndexError, ValueError):
            continue
    return out


def cmdline(pid):
    try:
        with open(f"/proc/{pid}/cmdline") as f:
            return f.read().replace("\0", " ")[:120]
    except OSError:
        return "?"


class Sampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.stop = False
        self.samples = []

    def run(self):
        prev = proc_table()
        while not self.stop:
            time.sleep(3)
            cur = proc_table()
            delta = []
            for pid, (comm, cpu, nthr) in cur.items():
                d = cpu - (prev.get(pid, (None, 0, 0))[1])
                if d > 0.5:
                    delta.append((d, pid, comm, nthr))
            delta.sort(reverse=True)
            self.samples.append(delta[:8])
            prev = cur


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files", type=int, default=500000)
    a = ap.parse_args()

    from lucenenet_spark.index.segments import SEGMENT_SCHEMA, _invert_partition
    from lucenenet_spark.session import get_spark
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    spark = get_spark(f"diag_sample_{a.cpus}", cpus=a.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = with_doc_ids(
        corpus_df(spark, a.files, partitions=64), ("repo", "path")).cache()
    corpus.count()

    inv = corpus.select("doc_id", "content", "lang").mapInPandas(
        _invert_partition("content", "doc_id", "content", "lang", True),
        SEGMENT_SCHEMA)

    s = Sampler()
    s.start()
    t0 = time.time()
    inv.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    s.stop = True
    time.sleep(0.5)
    print(f"rep0 wall: {wall:.1f}s  samples: {len(s.samples)}", flush=True)
    names = {}
    for i, snap in enumerate(s.samples):
        print(f"--- t+{3*(i+1)}s")
        for d, pid, comm, nthr in snap:
            if pid not in names:
                names[pid] = cmdline(pid)
            print(f"  {d:7.1f} cpu-s pid={pid} thr={nthr} {comm}: {names[pid][:100]}")


if __name__ == "__main__":
    main()
