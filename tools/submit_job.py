"""Cluster entry point: build the segmented index over a corpus table and
run a smoke query — the job shipped via

    spark-submit --py-files dist/lucenenet_spark.zip tools/submit_job.py \
        --data <corpus.parquet> --out <index_dir> [--checkpoint <ckpt_dir>] \
        [--query "spark AND merge"]

On a cluster the SparkSession comes from spark-submit's conf (master,
executors); this script only declares the job. Locally it falls back to
local[*]. The build is resumable: pass --checkpoint and a killed run
continues from the last committed merge wave.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from lucenenet_spark.index.segments import (
    build_segmented_index, content_sha_rollup)
from lucenenet_spark.plans.lowering import Searcher
from lucenenet_spark.queryparser.parser import QueryParser
from lucenenet_spark.sources.corpus import with_doc_ids


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="corpus parquet/table path")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--checkpoint", default=None,
                    help="merge-wave checkpoint dir (enables kill/resume)")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--id-cols", default="repo,path",
                    help="columns that order the deterministic doc_id")
    ap.add_argument("--query", default=None,
                    help="optional smoke query (QueryParser syntax)")
    a = ap.parse_args()

    spark = (SparkSession.builder.appName("lucenenet_spark_index_build")
             .getOrCreate())
    docs = spark.read.parquet(a.data)
    docs = with_doc_ids(docs, tuple(a.id_cols.split(",")))

    idx = build_segmented_index(
        spark, docs, text_col=a.text_col,
        lang_col=a.lang_col if a.lang_col in docs.columns else None,
        checkpoint_dir=a.checkpoint,
    )
    idx.save(a.out)
    lineage = content_sha_rollup(docs, a.text_col).collect()
    print(json.dumps({
        "n_docs": idx.n_docs,
        "avgdl": round(idx.avgdl, 3),
        "lineage_partitions": len(lineage),
    }))

    if a.query:
        q = QueryParser(default_field=a.text_col).parse(a.query)
        Searcher(idx).search(q, 10).show()
    spark.stop()


if __name__ == "__main__":
    main()
