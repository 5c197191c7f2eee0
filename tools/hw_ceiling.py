"""Hardware scaling ceiling — Spark-free control experiments.

Runs Spark-free kernels under plain `multiprocessing` at 2/8/32 workers
(no JVM, no shuffle, no Arrow) to measure what THIS machine can
physically deliver for embarrassingly parallel work. This bounds any
Spark job's measurable scaling efficiency in the sandbox: a single
32-core box loses per-core throughput as occupancy grows (shared memory
bandwidth / turbo-frequency budget), which a real multi-node cluster —
the north rule's actual N vs 4N executors — does not.

TWO kernels, because the ceiling is kernel-dependent:

  light  — tokenizer-only loop (tight regex, small working set): the
           optimistic ceiling (~0.79 for a 4x core jump round 1/2).
  real   — the ACTUAL _invert_partition segment kernel over the same
           deterministic corpus partitions the engine indexes: regex +
           factorize + lexsort + varint encode, allocation-heavy. Its
           ceiling is much lower (memory-bandwidth bound), and it — not
           the light kernel — is the honest denominator for the
           engine's 8->32 number (round-2 VERDICT compared against the
           light ceiling and called the gap an engine problem; the
           Spark-free control shows the kernel itself collapses the
           same way at full occupancy).

Each level is pinned to cores 0..N-1 via sched_setaffinity (mirrors the
taskset pinning in tools/scaling_bench.py) and run `reps` times taking
the best wall (co-tenant burst mitigation).

Output: BENCH/hw_ceiling.json with per-level walls + both ceilings.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Same glibc malloc tuning the engine's python workers get
# (lucenenet_spark/session.py _MALLOC_ENV): without it the
# allocation-heavy kernels burn kernel CPU in mmap/munmap TLB shootdowns
# at high worker counts and the "ceiling" under-reports the hardware.
# Must be set before the Pool forks.
for _k, _v in (("MALLOC_MMAP_THRESHOLD_", str(128 << 20)),
               ("MALLOC_TRIM_THRESHOLD_", str(256 << 20))):
    os.environ.setdefault(_k, _v)

DOCS_PER_WORKER = 3000   # light kernel, weak scaling
REAL_FILES = 100000      # real kernel, strong scaling
REAL_PARTS = 64
CACHE_DIR = "/tmp/hw_ceiling_parts"
LEVELS = (2, 8, 32)
REPS = 3


def _light_work(n: int) -> int:
    from lucenenet_spark.analysis.tokenizers import tokenize
    txt = ("def build_index(spark, df):\n"
           "    return df.groupBy('term').agg(F.sum('tf'))\n" * 40)
    for _ in range(n):
        tokenize(txt, "python")
    return n


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _pin(n: int) -> None:
    os.sched_setaffinity(0, range(n))


def _unpin() -> None:
    os.sched_setaffinity(0, range(os.cpu_count()))


def light_ceiling() -> dict:
    res = {}
    for workers in LEVELS:
        total = DOCS_PER_WORKER * workers  # weak scaling: fixed work/core
        _pin(workers)
        with mp.Pool(workers) as p:
            p.map(_light_work, [10] * workers)  # warm imports
            t0 = time.time()
            p.map(_light_work, [DOCS_PER_WORKER] * workers)
            wall = time.time() - t0
        _unpin()
        res[workers] = {
            "wall_s": round(wall, 3),
            "docs_per_s": round(total / wall, 1),
            "per_core_docs_per_s": round(DOCS_PER_WORKER / wall, 1),
        }
    return {
        "kernel": "code tokenizer only (pure python, no Spark)",
        "mode": "weak scaling: 3000 docs per worker",
        "workers": res,
        "eff_2_to_8":
            round(res[8]["docs_per_s"] / res[2]["docs_per_s"] / 4.0, 3),
        "eff_8_to_32":
            round(res[32]["docs_per_s"] / res[8]["docs_per_s"] / 4.0, 3),
    }


# ---- real kernel ----------------------------------------------------

def _gen_part(i: int) -> str:
    """Generate partition i of the deterministic corpus to its own pickle
    (workers later read only their partition — no shared big blob)."""
    import numpy as np
    import pandas as pd

    from lucenenet_spark.sources.corpus import _gen_chunk

    path = os.path.join(CACHE_DIR, f"part_{i}.pkl")
    if os.path.exists(path):
        return path
    step = (REAL_FILES + REAL_PARTS - 1) // REAL_PARTS
    lo, hi = i * step, min((i + 1) * step, REAL_FILES)
    # chunk-deterministic generator: partition i generates ONLY its slice
    rows = _gen_chunk(lo, hi - lo, 42)
    pdf = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"])
    pdf["doc_id"] = np.arange(lo, hi, dtype=np.int64)
    with open(path + ".tmp", "wb") as f:
        pickle.dump(pdf, f)
    os.replace(path + ".tmp", path)
    return path


def _real_work(i: int) -> float:
    """One partition through the REAL invert kernel; returns kernel sec
    (excludes the pickle read)."""
    import pyspark

    class _FakeCtx:
        def partitionId(self):
            return i

    pyspark.TaskContext.get = staticmethod(lambda: _FakeCtx())
    from lucenenet_spark.index.segments import _invert_partition

    with open(os.path.join(CACHE_DIR, f"part_{i}.pkl"), "rb") as f:
        pdf = pickle.load(f)
    fn = _invert_partition("content", "doc_id", "content", "lang", True)
    t0 = time.time()
    list(fn(iter([pdf])))
    return time.time() - t0


def real_ceiling() -> dict:
    os.makedirs(CACHE_DIR, exist_ok=True)
    with mp.Pool(os.cpu_count()) as p:  # untimed, full box
        p.map(_gen_part, range(REAL_PARTS))

    res = {}
    for workers in LEVELS:
        best = None
        for _ in range(REPS):
            load0 = _loadavg1()
            _pin(workers)
            t0 = time.time()
            with mp.Pool(workers) as p:
                durs = p.map(_real_work, range(REAL_PARTS))
            wall = time.time() - t0
            _unpin()
            rec = {
                "wall_s": round(wall, 2),
                "files_per_s": round(REAL_FILES / wall, 1),
                "task_sum_s": round(sum(durs), 1),
                "task_p50_s": round(sorted(durs)[len(durs) // 2], 2),
                "task_max_s": round(max(durs), 2),
                "loadavg_before": load0,
            }
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
        res[workers] = best
    return {
        "kernel": "REAL _invert_partition (regex+factorize+lexsort+varint)",
        "mode": f"strong scaling: {REAL_FILES} files / {REAL_PARTS} parts, "
                f"best of {REPS}, cores pinned",
        "workers": res,
        "eff_2_to_8": round(
            res[8]["files_per_s"] / res[2]["files_per_s"] / 4.0, 3),
        "eff_8_to_32": round(
            res[32]["files_per_s"] / res[8]["files_per_s"] / 4.0, 3),
        "cpu_inflation_2_to_8": round(
            res[8]["task_sum_s"] / res[2]["task_sum_s"], 2),
        "cpu_inflation_8_to_32": round(
            res[32]["task_sum_s"] / res[8]["task_sum_s"], 2),
    }


# ---- merge kernel ---------------------------------------------------

MERGE_CACHE = os.path.join(CACHE_DIR, "merge")


def _gen_merge_part(i: int) -> str:
    """Invert partition i and scatter its segment rows into 64 key-hashed
    merge-input buckets (bucket files written per (invert part, bucket);
    _merge_prep concatenates them afterwards)."""
    import zlib

    import pandas as pd

    import pyspark

    class _FakeCtx:
        def partitionId(self):
            return i

    pyspark.TaskContext.get = staticmethod(lambda: _FakeCtx())
    from lucenenet_spark.index.segments import _invert_partition

    done = os.path.join(MERGE_CACHE, f"scatter_{i}.done")
    if os.path.exists(done):
        return done
    with open(os.path.join(CACHE_DIR, f"part_{i}.pkl"), "rb") as f:
        pdf = pickle.load(f)
    fn = _invert_partition("content", "doc_id", "content", "lang", True)
    seg = pd.concat(list(fn(iter([pdf]))), ignore_index=True)
    seg["merge_group"] = 0
    bucket = seg["term"].map(lambda t: zlib.crc32(t.encode()) % REAL_PARTS)
    for b, grp in seg.groupby(bucket):
        grp.to_pickle(os.path.join(MERGE_CACHE, f"b{b:02d}_from{i:02d}.pkl"))
    with open(done, "w") as f:
        f.write("ok")
    return done


def _merge_prep(b: int) -> str:
    """Concatenate bucket b's scattered pieces into ONE key-sorted
    merge-input frame — byte-identical shape to what one engine shuffle
    partition hands _merge_partition."""
    import glob

    import pandas as pd

    path = os.path.join(MERGE_CACHE, f"merged_in_{b:02d}.pkl")
    if os.path.exists(path):
        return path
    pieces = sorted(glob.glob(os.path.join(MERGE_CACHE, f"b{b:02d}_from*")))
    pdf = pd.concat([pd.read_pickle(p) for p in pieces], ignore_index=True)
    pdf = pdf.sort_values(
        ["field", "term", "merge_group", "seg_id"], kind="stable",
        ignore_index=True)
    pdf.to_pickle(path + ".tmp")
    os.replace(path + ".tmp", path)
    return path


def _merge_work(b: int) -> float:
    """One merge-input bucket through the REAL _merge_partition kernel;
    returns kernel sec (excludes the pickle read)."""
    import pandas as pd

    from lucenenet_spark.index.segments import _merge_partition

    pdf = pd.read_pickle(os.path.join(MERGE_CACHE, f"merged_in_{b:02d}.pkl"))
    t0 = time.time()
    list(_merge_partition(iter([pdf])))
    return time.time() - t0


def merge_ceiling() -> dict:
    """Strong-scaling control for the OTHER half of the build: the
    byte-concat merge kernel (memcpy-dense, low compute per byte) — its
    bandwidth ceiling is what bounds the merge wave's scaling, just as
    `real` bounds the invert stage's."""
    os.makedirs(MERGE_CACHE, exist_ok=True)
    with mp.Pool(os.cpu_count()) as p:  # untimed, full box
        p.map(_gen_merge_part, range(REAL_PARTS))
        p.map(_merge_prep, range(REAL_PARTS))

    res = {}
    for workers in LEVELS:
        best = None
        for _ in range(REPS):
            load0 = _loadavg1()
            _pin(workers)
            t0 = time.time()
            with mp.Pool(workers) as p:
                durs = p.map(_merge_work, range(REAL_PARTS))
            wall = time.time() - t0
            _unpin()
            rec = {
                "wall_s": round(wall, 2),
                "files_per_s": round(REAL_FILES / wall, 1),
                "task_sum_s": round(sum(durs), 1),
                "task_p50_s": round(sorted(durs)[len(durs) // 2], 2),
                "task_max_s": round(max(durs), 2),
                "loadavg_before": load0,
            }
            if best is None or rec["wall_s"] < best["wall_s"]:
                best = rec
        res[workers] = best
    return {
        "kernel": "REAL _merge_partition (byte-concat bulk merge)",
        "mode": f"strong scaling: {REAL_FILES} files / {REAL_PARTS} "
                f"key-hashed buckets, best of {REPS}, cores pinned",
        "workers": res,
        "eff_2_to_8": round(
            res[8]["files_per_s"] / res[2]["files_per_s"] / 4.0, 3),
        "eff_8_to_32": round(
            res[32]["files_per_s"] / res[8]["files_per_s"] / 4.0, 3),
        "cpu_inflation_2_to_8": round(
            res[8]["task_sum_s"] / res[2]["task_sum_s"], 2),
        "cpu_inflation_8_to_32": round(
            res[32]["task_sum_s"] / res[8]["task_sum_s"], 2),
    }


def main() -> None:
    light = light_ceiling()
    real = real_ceiling()
    merge = merge_ceiling()
    out = {
        "light": light,
        "real": real,
        "merge": merge,
        "note": ("`real` and `merge` are the honest ceilings for the "
                 "engine's two build stages: the identical kernels with "
                 "zero framework overhead collapse the same way at rising "
                 "occupancy (shared memory bandwidth), so "
                 "engine-vs-ceiling — not the raw pair ratio — is the "
                 "meaningful number on this box.  The composite build "
                 "ceiling at a level is the stage-time-weighted harmonic "
                 "combination of the two."),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/hw_ceiling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
