"""Term vectors WITH_POSITIONS_OFFSETS — the forward index carrying the
full per-term token stream.

The reference writes term vectors at index time from the token stream
(src/Lucene.Net/Index/TermVectorsWriter.cs: per doc per field, each term
with freq, positions[] and (start,end) offsets[], enabled by
Field.TermVector.WITH_POSITIONS_OFFSETS, Field.cs:100).  The Spark
analogue: term vectors are a MATERIALIZED table derived once per index
generation — one vectorized analysis pass over the stored docs (the
"index time" of this structure), after which consumers (MoreLikeThis,
FastVectorHighlighter) are pure lookups that never re-tokenize.

One shuffle-free mapInPandas pass; each output row is one (doc, field,
term) with its aligned positions/starts/ends arrays.  At 100 TB the
table is partition-parallel with the doc store and written columnar, so
vector lookups for a hit list are a broadcast-join + pruned scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..analysis.tokenizers import (
    CODE_LANGS,
    tokenize_code_offsets,
    tokenize_standard_offsets,
)

VECTOR_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("field", T.StringType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("freq", T.IntegerType(), False),
    T.StructField("positions", T.ArrayType(T.IntegerType()), False),
    T.StructField("starts", T.ArrayType(T.IntegerType()), False),
    T.StructField("ends", T.ArrayType(T.IntegerType()), False),
])


def term_vectors_with_offsets(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              lang_col: str | None = None,
                              field_name: str | None = None) -> DataFrame:
    """docs -> (doc_id, field, term, freq, positions, starts, ends).

    Analyzer dispatch mirrors the index build: code-language rows (when
    lang_col is given) run the code sub-token chain, everything else the
    standard chain — so vector positions agree exactly with the postings
    the index stores for the same doc."""
    field = field_name or text_col
    cols = [id_col, text_col] + ([lang_col] if lang_col else [])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "field", "term", "freq",
                                   "positions", "starts", "ends")}
            langs = (pdf[lang_col] if lang_col else [None] * len(pdf))
            for doc_id, text, lg in zip(pdf[id_col], pdf[text_col], langs):
                if not isinstance(text, str):
                    continue
                tok = (tokenize_code_offsets(text)
                       if lg is not None
                       and str(lg).lower() in CODE_LANGS
                       else tokenize_standard_offsets(text))
                by_term: dict[str, list] = {}
                for term, pos, s, e in tok:
                    by_term.setdefault(term, []).append((pos, s, e))
                for term in sorted(by_term):
                    occ = by_term[term]
                    out["doc_id"].append(int(doc_id))
                    out["field"].append(field)
                    out["term"].append(term)
                    out["freq"].append(len(occ))
                    out["positions"].append([p for p, _, _ in occ])
                    out["starts"].append([s for _, s, _ in occ])
                    out["ends"].append([e for _, _, e in occ])
            yield pd.DataFrame(out, columns=[f.name for f in VECTOR_SCHEMA])

    return docs.select(*cols).mapInPandas(fn, VECTOR_SCHEMA)
