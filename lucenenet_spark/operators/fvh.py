"""FastVectorHighlighter — highlight from stored term vectors, never
re-tokenizing the hit text.

The reference's FVH (src/contrib/Lucene.Net.Contrib.FastVectorHighlighter/
FastVectorHighlighter.cs + FieldTermStack.cs) reads each hit's term
vector (positions + offsets, Field.TermVector.WITH_POSITIONS_OFFSETS)
instead of running the analyzer again — the win on long documents where
re-analysis dominates.  Spark-first re-expression over the materialized
vector table (index/vectors.py):

  * fragment SELECTION uses the same semantics as the re-tokenizing
    Highlighter (operators/highlight.py): fixed windows of frag_tokens
    token positions, score = query-term occurrences in the window, best
    = max score with the earliest window on ties — so the two paths pick
    the identical (frag_idx, frag_score) and stay cross-checkable.
  * fragment RENDERING is where the vectors pay off: the snippet is a
    CHARACTER SLICE of the stored text between the window's first and
    last indexed-token offsets, with each query-term occurrence wrapped
    via its exact (start, end) span — original casing and punctuation
    preserved, no analyzer in the loop.

All column algebra (explode / groupBy over the hit docs' vector rows +
one aggregate() fold for the markup); O(k x doc terms) rows, never the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["best_fragments_fv"]


def best_fragments_fv(hits: DataFrame, vectors: DataFrame, docs: DataFrame,
                      qterms: list[str], text_col: str = "text",
                      id_col: str = "doc_id", frag_tokens: int = 16,
                      pre: str = "<b>", post: str = "</b>",
                      field: str | None = None) -> DataFrame:
    """(doc_id, score, frag_idx, frag_score, snippet) for each hit doc
    that has at least one query-term occurrence in its vector.

    hits: (doc_id, score) top-k rows; vectors: index/vectors.py table;
    docs: the stored table (sliced for rendering only — never analyzed).
    """
    w = frag_tokens
    tv = vectors if field is None else vectors.where(F.col("field") == field)
    tv = tv.join(F.broadcast(hits.select("doc_id")), "doc_id")
    tok = (
        tv.select(
            "doc_id", "term",
            F.explode(F.arrays_zip(
                F.col("positions").alias("pos"),
                F.col("starts").alias("s"),
                F.col("ends").alias("e"))).alias("t"))
        .select("doc_id", "term",
                F.col("t.pos").alias("pos"),
                F.col("t.s").alias("s"),
                F.col("t.e").alias("e"))
        .withColumn("frag", F.floor(F.col("pos") / w).cast("long"))
    )
    is_q = F.col("term").isin(list(qterms))
    # best fragment: most query-term occurrences, earliest window on ties
    # (the FragmentQueue rule the token-path highlighter also follows)
    best = (
        tok.where(is_q)
        .groupBy("doc_id", "frag").agg(F.count("*").alias("m"))
        .groupBy("doc_id")
        .agg(F.max(F.struct(F.col("m"),
                            (-F.col("frag")).alias("nf"))).alias("b"))
        .select("doc_id", (-F.col("b.nf")).alias("bfrag"),
                F.col("b.m").alias("frag_score"))
    )
    win = (
        tok.join(best, "doc_id").where(F.col("frag") == F.col("bfrag"))
        .groupBy("doc_id", "bfrag", "frag_score")
        .agg(F.min("s").alias("lo"), F.max("e").alias("hi"),
             F.array_sort(F.collect_list(
                 F.when(is_q, F.struct("s", "e")))).alias("ms"))
    )
    txt = F.col(text_col)
    j = (win.join(F.broadcast(hits), "doc_id")
         .join(docs.select(F.col(id_col).alias("doc_id"), text_col),
               "doc_id"))
    # one fold over the sorted match spans builds the marked-up slice:
    # plain-text gap, then <b>span</b>, cursor advances to the span end
    snippet = F.aggregate(
        F.col("ms"),
        F.struct(F.col("lo").alias("cur"), F.lit("").alias("acc")),
        lambda a, x: F.struct(
            x["e"].alias("cur"),
            F.concat(
                a["acc"],
                F.substring(txt, a["cur"] + 1, x["s"] - a["cur"]),
                F.lit(pre),
                F.substring(txt, x["s"] + 1, x["e"] - x["s"]),
                F.lit(post)).alias("acc")),
        lambda a: F.concat(
            a["acc"],
            F.substring(txt, a["cur"] + 1, F.col("hi") - a["cur"])),
    )
    return (j.select("doc_id", "score",
                     F.col("bfrag").alias("frag_idx"),
                     F.col("frag_score").cast("long").alias("frag_score"),
                     snippet.alias("snippet"))
            .orderBy(F.desc("score"), "doc_id"))
