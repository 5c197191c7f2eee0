"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...}

Also measures the north-rule metric: index-build throughput (files/sec)
over the synthetic source-code corpus (repo,path,commit,lang,content),
through the compressed-segment pipeline (tokenize -> partition-segment
postings blobs -> salted merge), plus BM25 top-10 query latency on the
warm index.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from lucenenet_spark.session import get_spark

    spark = get_spark(cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def timed(name, fn, reps: int = 2):
        """min-of-reps: this sandbox shares hardware with a bursty
        co-tenant (observed 0->30 one-minute loadavg swings), and a
        single-shot timing that eats a burst reports the neighbor, not
        the engine; min over two runs is the standard mitigation."""
        out, best = None, float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        return out

    # --- training-pipeline operators FIRST, on the fresh JVM -------------
    # dd_minhash_lsh is the heaviest single job of the bench (~7.7M
    # candidate pairs at sf0.1); running it before the build/query
    # sections keeps its measurement off a heap already grown by ~80
    # prior stages (measured: identical job 21s on a fresh JVM vs 44-66s
    # late in the session).  Pair/per-doc outputs are timed via count()
    # — the distributed compute, not py4j shipping ~900k pair rows to the
    # driver (no real pipeline collects dedup pairs; they go to storage).
    # untimed JVM/codegen warmup: the first job of a session otherwise
    # charges ~5s of JIT + executor spin-up to whichever operator runs it
    from pyspark.sql import functions as F
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select(F.sum(F.length("text"))).collect()

    qs = entry.queries()
    warm: dict[str, float] = {}
    for name in [
        "dd_exact", "dd_minhash_lsh", "dd_simhash",
        "ann_cosine_topk", "txt_stats",
        # round-4 batch shaping (dd_cluster is timed in the single-shot
        # section below: its label-propagation rounds run eagerly at
        # construction, so a deferred count() would miss the real work)
        "txt_pack",
    ]:
        # cold/warm split (round-4 VERDICT item 3): COLD = min over two
        # from-scratch runs with the cache cleared between them (burst
        # mitigation without intermediate reuse) and is what the headline
        # sums; WARM = a same-frame repeat that reuses the operator's own
        # persisted intermediates (e.g. minhash's signature table — the
        # steady-state shape of a production dedup pipeline), reported
        # separately and never summed.
        cold = float("inf")
        for rep in range(2):
            df = qs[name](spark, sf_dir)
            t0 = time.time()
            df.count()
            cold = min(cold, time.time() - t0)
            if rep == 0:
                t0 = time.time()
                df.count()
                warm[name] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
        timings[name] = round(cold, 3)

    # --- north-rule metric: corpus index-build throughput (files/sec) ----
    from lucenenet_spark.index.segments import build_segmented_index
    from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

    # partitions = cpus (~625 docs each at sf0.1): at this corpus size
    # per-task overhead beats straggler insurance.  At 500k+ files the
    # sweet spot moves to ~4 tasks/core (see BENCH/BASELINE.md, task
    # granularity A/B) — granularity is a per-job knob, as on a cluster.
    n_files = int(20000 * sf / 0.1)
    corpus = with_doc_ids(
        corpus_df(spark, n_files, partitions=cpus), ("repo", "path")
    ).cache()
    corpus.count()  # materialize source outside the timed window

    build_sec = float("inf")
    seg = None
    for _ in range(2):  # min-of-2, same burst rationale as timed()
        if seg is not None:
            seg.segments.unpersist()
        t0 = time.time()
        seg = build_segmented_index(spark, corpus, text_col="content",
                                    lang_col="lang")
        build_sec = min(build_sec, time.time() - t0)
    timings["index_build"] = round(build_sec, 3)
    files_per_sec = round(n_files / build_sec, 1)

    # warm BM25 queries on the segmented index
    from lucenenet_spark.plans import ast
    from lucenenet_spark.plans.lowering import Searcher

    # query latency: SINGLE-shot on a fresh plan per query (warm index,
    # cold plan — the round-1-comparable semantics; a same-frame repeat
    # would reuse shuffle outputs and time ~nothing)
    s = Searcher(seg)
    for name, q in [
        ("q_term", ast.Term("index", field="content")),
        ("q_bool_and", ast.Bool(must=(ast.Term("index", field="content"),
                                      ast.Term("merge", field="content")))),
        ("q_bool_or", ast.Bool(should=(ast.Term("spark", field="content"),
                                       ast.Term("segment", field="content"),
                                       ast.Term("query", field="content")))),
        ("q_phrase", ast.Phrase(("license", "apache"), field="content")),
    ]:
        timed(name, lambda q=q: s.search(q, 10).collect(), reps=1)

    # release the bench corpus + bench index before the contract sections:
    # leftover cached blocks otherwise crowd executor memory and skew the
    # later sections' timings (measured: dd_minhash 16s clean vs 30-57s
    # with every prior cache still pinned)
    corpus.unpersist()
    seg.segments.unpersist()

    # --- driver-contract headline queries over the testdata tables -------
    for name in [
        "ft_term", "ft_bool_and", "ft_bool_or", "ft_phrase",
        "ft_prefix", "ft_fuzzy",
        # round-2 operator families
        "ft_span_near", "ft_phrase_slop3", "ft_tfidf_or",
        # round-3 operator families (payload index built+queried inside
        # the timing — the payload chain is a build-side feature)
        "ft_payload_term", "ft_bool_filter",
        # round-3 contribs: Highlighter (hit-list fragment markup) and
        # SpellChecker (vocabulary-scan suggest)
        "ft_highlight", "spell_suggest",
        # round-4: percolator (K registered queries, one map-only scan)
        # and near-dup cluster resolution (construction runs the
        # propagation rounds, so the whole call sits inside the timing)
        "ft_percolate", "dd_cluster",
    ]:
        timed(name, lambda n=name: qs[n](spark, sf_dir).collect(), reps=1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "index-build throughput + BM25 top-10 latency + pipeline ops",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "corpus_files": n_files,
        "files_per_sec": files_per_sec,
        "cpus": cpus,
        "warm": warm,
        "agg": ("pipeline ops: COLD min-of-2 from-scratch runs (cache "
                "cleared between reps; these sum into value) with the "
                "same-frame WARM repeat reported separately under 'warm'; "
                "index_build: min-of-2; q_*/ft_* latencies: single-shot "
                "fresh plan"),
    }))


if __name__ == "__main__":
    main()
