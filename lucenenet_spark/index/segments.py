"""Segmented index — compressed postings blobs, merge waves, lineage, resume.

The write-side dataflow of the reference (IndexWriter -> DocumentsWriter ->
TermsHash -> FormatPostings -> SegmentMerger; SURVEY.md §2.3/§3.1) as Spark
stages:

  1. partition invert (mapInPandas): tokenize + local hash-invert + delta/
     VInt-encode one SEGMENT per input partition — the per-thread RAM buffer
     + flush of DocumentsWriter.cs:120-138 (partition size = flush unit).
  2. merge waves (groupBy + applyInPandas): geometric fan-in merge of
     segments, mergeFactor=10 by default (LogMergePolicy.cs:51-76). The
     groupBy key includes the wave's merge-group, so a term's postings
     shuffle only between the segments being merged — hot terms are spread
     over merge groups, which IS the salt (two-stage combine: wave k merges
     <=fan_in sub-lists per term, never all of them at once).
  3. each wave optionally checkpoints to parquet with a lineage row
     (wave, n_segments, rows, content-sha rollup) — the segments_N manifest
     analogue (IndexFileNames.cs:29-37) — and a killed build resumes from
     the last committed wave.

Query-time: `postings` exposes a lazily-decoded relational view with the
same schema as the logical path (field, term, doc_id, tf, dl, positions),
so plans/lowering.Searcher runs unchanged; the (field, term) filter is
applied BEFORE blob decode (term-dictionary seek analogue,
TermInfosReader.cs:243-308 — only matching posting lists are decompressed).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from collections.abc import Iterator
from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis.tokenizers import tokenize
from . import codec
from .builder import IndexStats

SEGMENT_SCHEMA = T.StructType([
    T.StructField("field", T.StringType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("seg_id", T.LongType(), False),
    T.StructField("df", T.IntegerType(), False),
    T.StructField("ttf", T.LongType(), False),
    T.StructField("docs_blob", T.BinaryType(), False),
    T.StructField("tfs_blob", T.BinaryType(), False),
    T.StructField("dls_blob", T.BinaryType(), False),
    T.StructField("pos_blob", T.BinaryType(), True),
    T.StructField("blocks", T.ArrayType(T.StructType([
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dl", T.IntegerType(), False),
    ])), True),
])

MERGE_FACTOR = 10  # LogMergePolicy.cs:56


def _invert_partition(field_name: str, id_col: str, text_col: str,
                      lang_col: str | None, positions: bool):
    """mapInPandas kernel: one segment per input partition."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        seg_id = TaskContext.get().partitionId()
        acc: dict[str, list] = defaultdict(lambda: [[], [], [], []])
        for pdf in batches:
            langs = pdf[lang_col] if lang_col else [None] * len(pdf)
            for doc_id, text, lg in zip(pdf[id_col], pdf[text_col], langs):
                toks = tokenize(text, lg)
                dl = len(toks)
                per_term: dict[str, list[int]] = defaultdict(list)
                for term, pos in toks:
                    per_term[term].append(pos)
                for term, plist in per_term.items():
                    a = acc[term]
                    a[0].append(int(doc_id))
                    a[1].append(len(plist))
                    a[2].append(dl)
                    a[3].extend(plist)
        rows = []
        for term in sorted(acc):
            d, t, l, p = acc[term]
            docs = np.asarray(d, np.int64)
            order = np.argsort(docs, kind="stable")
            tfs = np.asarray(t, np.int64)[order]
            dls = np.asarray(l, np.int64)[order]
            pos_flat = None
            if positions:
                starts = np.concatenate(
                    [[0], np.cumsum(np.asarray(t, np.int64))[:-1]])
                allp = np.asarray(p, np.int64)
                pos_flat = np.concatenate(
                    [allp[starts[i]:starts[i] + t[i]] for i in order]
                ) if len(order) else np.empty(0, np.int64)
            enc = codec.encode_postings(docs[order], tfs, dls, pos_flat)
            rows.append((field_name, term, seg_id, enc["df"], enc["ttf"],
                         enc["docs_blob"], enc["tfs_blob"], enc["dls_blob"],
                         enc["pos_blob"], enc["blocks"]))
        yield pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA])

    return fn


def _merge_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: merge one (field, term, group)'s segments."""
    parts = pdf.sort_values("seg_id").to_dict("records")
    m = codec.merge_postings(parts)
    return pd.DataFrame([{
        "field": keys[0], "term": keys[1], "seg_id": int(keys[2]),
        "df": m["df"], "ttf": m["ttf"],
        "docs_blob": m["docs_blob"], "tfs_blob": m["tfs_blob"],
        "dls_blob": m["dls_blob"], "pos_blob": m["pos_blob"],
        "blocks": m["blocks"],
    }])


def merge_wave(segments: DataFrame, fan_in: int = MERGE_FACTOR) -> DataFrame:
    """One geometric merge wave: segment s joins merge-group s // fan_in.

    The shuffle key (field, term, group) spreads every term's postings
    across all merge groups — the salted two-stage combine of SURVEY §4.2:
    no single reducer ever sees more than fan_in sub-lists of a hot term.
    """
    grouped = segments.withColumn(
        "merge_group", (F.col("seg_id") / fan_in).cast("long"))
    return (
        grouped.groupBy("field", "term", "merge_group")
        .applyInPandas(_merge_group, SEGMENT_SCHEMA)
    )


@dataclass
class SegmentedIndex:
    """Compressed-postings index, drop-in queryable via plans/lowering.

    Exposes the same surface as builder.InvertedIndex (postings / n_docs /
    avgdl / stored / id_col / fields / term_stats / cache)."""

    spark: SparkSession
    segments: DataFrame
    stats: IndexStats
    stored: DataFrame | None = None
    id_col: str = "doc_id"
    fields: tuple[str, ...] = ("content",)
    _postings: DataFrame | None = dc_field(default=None, repr=False)
    _term_stats: DataFrame | None = dc_field(default=None, repr=False)

    @property
    def n_docs(self) -> int:
        return self.stats.n_docs

    @property
    def avgdl(self) -> float:
        return self.stats.avgdl

    @property
    def postings(self) -> DataFrame:
        """Decoded relational view (field, term, doc_id, tf, dl, positions).

        Decode is a scalar Arrow UDF in the projection, so Catalyst pushes
        (field, term) predicates below it — only matching blobs decompress."""
        if self._postings is None:
            dec = _decode_udf()
            z = dec(F.col("docs_blob"), F.col("tfs_blob"),
                    F.col("dls_blob"), F.col("pos_blob"))
            self._postings = (
                self.segments
                .withColumn("_p", F.explode(F.arrays_zip(
                    z["docs"].alias("doc_id"), z["tfs"].alias("tf"),
                    z["dls"].alias("dl"), z["pos"].alias("positions"))))
                .select("field", "term",
                        F.col("_p.doc_id").alias("doc_id"),
                        F.col("_p.tf").alias("tf"),
                        F.col("_p.dl").alias("dl"),
                        F.col("_p.positions").alias("positions"))
            )
        return self._postings

    def term_stats(self) -> DataFrame:
        """Term dictionary straight from segment rows — no decode needed."""
        if self._term_stats is None:
            self._term_stats = (
                self.segments.groupBy("field", "term")
                .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
            )
        return self._term_stats

    def term_dfs(self, pairs: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
        """df lookup from segment-row metadata — no blob decode (the .tis
        dictionary-seek analogue, TermInfosReader.cs:243-308)."""
        fields = sorted({f for f, _ in pairs})
        terms = sorted({t for _, t in pairs})
        rows = (
            self.segments.where(
                F.col("field").isin(fields) & F.col("term").isin(terms))
            .groupBy("field", "term").agg(F.sum("df").alias("df"))
            .collect()
        )
        got = {(r["field"], r["term"]): int(r["df"]) for r in rows}
        return {p: got.get(p, 0) for p in pairs}

    def cache(self) -> "SegmentedIndex":
        self.segments = self.segments.cache()
        if self.stored is not None:
            self.stored = self.stored.cache()
        return self

    def n_segments(self) -> int:
        return self.segments.select("seg_id").distinct().count()

    # ---- persistence: segments_N manifest analogue ----

    def save(self, path: str, term_buckets: int = 32) -> None:
        (
            self.segments.repartitionByRange(term_buckets, "field", "term")
            .sortWithinPartitions("field", "term", "seg_id")
            .write.mode("overwrite").parquet(os.path.join(path, "segments"))
        )
        with open(os.path.join(path, "stats.json"), "w") as f:
            json.dump({"n_docs": self.stats.n_docs,
                       "total_tokens": self.stats.total_tokens,
                       "fields": list(self.fields),
                       "id_col": self.id_col}, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             stored: DataFrame | None = None) -> "SegmentedIndex":
        with open(os.path.join(path, "stats.json")) as f:
            meta = json.load(f)
        return cls(spark=spark,
                   segments=spark.read.parquet(os.path.join(path, "segments")),
                   stats=IndexStats(meta["n_docs"], meta["total_tokens"]),
                   stored=stored, id_col=meta["id_col"],
                   fields=tuple(meta["fields"]))


_DECODE_SCHEMA = T.StructType([
    T.StructField("docs", T.ArrayType(T.LongType())),
    T.StructField("tfs", T.ArrayType(T.IntegerType())),
    T.StructField("dls", T.ArrayType(T.IntegerType())),
    T.StructField("pos", T.ArrayType(T.ArrayType(T.IntegerType()))),
])


def _decode_udf():
    @F.pandas_udf(_DECODE_SCHEMA)
    def dec(docs_b: pd.Series, tfs_b: pd.Series, dls_b: pd.Series,
            pos_b: pd.Series) -> pd.DataFrame:
        docs_o, tfs_o, dls_o, pos_o = [], [], [], []
        for db, tb, lb, pb in zip(docs_b, tfs_b, dls_b, pos_b):
            d, t, l, p = codec.decode_postings(
                bytes(db), bytes(tb), bytes(lb), bytes(pb) if pb else b"")
            docs_o.append(d.tolist())
            tfs_o.append(t.tolist())
            dls_o.append(l.tolist())
            if p is not None:
                starts = np.concatenate([[0], np.cumsum(t)[:-1]])
                pos_o.append([p[s:s + c].tolist()
                              for s, c in zip(starts, t)])
            else:
                pos_o.append(None)
        return pd.DataFrame({"docs": docs_o, "tfs": tfs_o,
                             "dls": dls_o, "pos": pos_o})
    return dec


# --------------------------------------------------------------- build API

def build_segmented_index(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    positions: bool = True,
    field_name: str | None = None,
    fan_in: int = MERGE_FACTOR,
    target_segments: int = 1,
    checkpoint_dir: str | None = None,
) -> SegmentedIndex:
    """docs -> per-partition segments -> geometric merge waves.

    With checkpoint_dir set, every wave commits to parquet with a lineage
    row and a previously-interrupted build resumes at the last committed
    wave (two-phase-commit analogue of IndexWriter.PrepareCommit/
    StartCommit, IndexWriter.cs:3988/5527).
    """
    field_name = field_name or text_col
    cols = [id_col, text_col] + ([lang_col] if lang_col else [])

    seg = docs.select(*cols).mapInPandas(
        _invert_partition(field_name, id_col, text_col, lang_col, positions),
        SEGMENT_SCHEMA,
    )

    lineage = []
    wave = 0
    if checkpoint_dir:
        seg, wave = _commit_wave(spark, seg, checkpoint_dir, 0, lineage)

    # geometric merge: n_partitions -> ceil(n/fan_in) -> ... -> target
    n = docs.rdd.getNumPartitions()
    while n > target_segments:
        fan = fan_in
        if (n + fan - 1) // fan < target_segments:
            fan = (n + target_segments - 1) // target_segments
        seg = merge_wave(seg, fan)
        n = (n + fan - 1) // fan
        wave += 1
        if checkpoint_dir:
            seg, wave = _commit_wave(spark, seg, checkpoint_dir, wave, lineage)

    # Materialize the merged segments once — every query and the stats agg
    # below reuse them (the committed-segment-set analogue).
    seg = seg.cache()

    # global stats WITHOUT re-tokenizing: sum(ttf) over the primary field
    # == total emitted tokens (ttf is exact in every segment row).
    n_docs = docs.count()
    tt = (seg.where(F.col("field") == field_name)
          .agg(F.sum("ttf")).collect()[0][0])
    stats = IndexStats(n_docs=int(n_docs), total_tokens=int(tt or 0))

    return SegmentedIndex(spark=spark, segments=seg, stats=stats,
                          stored=docs, id_col=id_col, fields=(field_name,))


def _commit_wave(spark: SparkSession, seg: DataFrame, ckpt: str, wave: int,
                 lineage: list) -> tuple[DataFrame, int]:
    """Commit one wave: parquet write + lineage row; skip if already done."""
    wdir = os.path.join(ckpt, f"wave_{wave:03d}")
    marker = os.path.join(wdir, "_COMMITTED.json")
    if os.path.exists(marker):
        with open(marker) as f:
            lineage.append(json.load(f))
        return spark.read.parquet(os.path.join(wdir, "segments")), wave
    seg.write.mode("overwrite").parquet(os.path.join(wdir, "segments"))
    committed = spark.read.parquet(os.path.join(wdir, "segments"))
    row = committed.agg(
        F.count("*").alias("rows"),
        F.countDistinct("seg_id").alias("n_segments"),
        F.sum(F.octet_length("docs_blob") + F.octet_length("tfs_blob")
              + F.octet_length("dls_blob")
              + F.octet_length("pos_blob")).alias("postings_bytes"),
    ).collect()[0]
    info = {"wave": wave, "rows": int(row["rows"]),
            "n_segments": int(row["n_segments"]),
            "postings_bytes": int(row["postings_bytes"] or 0)}
    with open(marker, "w") as f:
        json.dump(info, f)
    lineage.append(info)
    return committed, wave


def content_sha_rollup(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-partition lineage invariant: (part_id, file_count, sha_xor) where
    sha_xor = bit_xor(xxhash64(sha256(content))) — order-independent rollup
    for the north rule's per-row content-sha256 equality check."""
    return (
        docs.withColumn("_part", F.spark_partition_id())
        .groupBy("_part")
        .agg(F.count("*").alias("file_count"),
             F.expr(f"bit_xor(xxhash64(sha2({content_col}, 256)))")
             .alias("sha_xor"))
        .withColumnRenamed("_part", "part_id")
    )
