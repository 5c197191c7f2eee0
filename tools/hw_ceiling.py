"""Hardware scaling ceiling — Spark-free control experiment.

Runs the SAME pure-Python/numpy tokenizer kernel under plain
`multiprocessing` at 2/8/32 workers (no JVM, no shuffle, no Arrow) to
measure what THIS machine can physically deliver for embarrassingly
parallel CPU-bound work. This bounds any Spark job's measurable scaling
efficiency in the sandbox: a single 32-core box loses per-core throughput
as occupancy grows (shared memory bandwidth / turbo-frequency budget),
which a real multi-node cluster — the north rule's actual N vs 4N
executors — does not.

Output: one JSON line {workers: {wall_s, docs_per_s, per_core}} plus the
strong-scaling efficiency of 2->8 and 8->32 for the IDEAL (zero-overhead)
parallel workload.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_PER_WORKER = 3000


def work(n: int) -> int:
    from lucenenet_spark.analysis.tokenizers import tokenize
    txt = ("def build_index(spark, df):\n"
           "    return df.groupBy('term').agg(F.sum('tf'))\n" * 40)
    for _ in range(n):
        tokenize(txt, "python")
    return n


def main() -> None:
    res = {}
    for workers in (2, 8, 32):
        total = DOCS_PER_WORKER * workers  # weak scaling: fixed work/core
        with mp.Pool(workers) as p:
            p.map(work, [10] * workers)  # warm imports
            t0 = time.time()
            p.map(work, [DOCS_PER_WORKER] * workers)
            wall = time.time() - t0
        res[workers] = {
            "wall_s": round(wall, 3),
            "docs_per_s": round(total / wall, 1),
            "per_core_docs_per_s": round(DOCS_PER_WORKER / wall, 1),
        }
    out = {
        "kernel": "code tokenizer (pure python/numpy, no Spark)",
        "mode": "weak scaling: 3000 docs per worker",
        "workers": res,
        "ideal_strong_eff_2_to_8":
            round(res[8]["docs_per_s"] / res[2]["docs_per_s"] / 4.0, 3),
        "ideal_strong_eff_8_to_32":
            round(res[32]["docs_per_s"] / res[8]["docs_per_s"] / 4.0, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/hw_ceiling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
