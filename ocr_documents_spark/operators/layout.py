"""Spark face of the XY-cut layout parser (extractors/layout.py).

``scatter_tokens`` builds the per-document token-box array with NATIVE
column arithmetic (array HOFs, zero Python) from the geometry constants;
``reading_order_udf`` runs the recursive XY-cut per document inside an
Arrow-batched pandas UDF.  The operator is per-row (token boxes live in
one array cell), so the plan is scan -> project -> Arrow stage -> project
with zero shuffle — at 100 TB it scales with the scan like the light
extraction path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..extractors import layout as L

TOKEN_BOX_FIELDS = ("x0", "y0", "x1", "y1", "word")


def scatter_tokens(words: Column, hdr: Column, n_left: Column) -> Column:
    """words (reading order) -> array<struct<x0,y0,x1,y1,word>> laid out
    as a full-width header band plus two staggered columns — the native
    twin of extractors.layout.synthesize_token_boxes.

    ``hdr`` and ``n_left`` MUST be materialized columns (see
    with_scattered_tokens), not inline expressions: Catalyst's Project
    collapse would substitute their full derivation (split + size) into
    the lambda body, which evaluates PER ELEMENT — turning an O(n) row
    into O(n^2) (measured 2.8 ms/doc vs 0.15 ms for 100-word docs).
    """

    def box(w: Column, i: Column) -> Column:
        j = i - hdr
        k = j - n_left
        x0 = (F.when(i < hdr, (i * L.HDR_PITCH).cast("double"))
              .when(j < n_left,
                    ((j % L.X_JITTER_MOD) * L.X_JITTER_PITCH).cast("double"))
              .otherwise(F.lit(float(L.RIGHT_X0))
                         + ((k % L.X_JITTER_MOD) * L.X_JITTER_PITCH)
                         .cast("double")))
        y0 = (F.when(i < hdr, F.lit(L.HDR_Y0))
              .when(j < n_left,
                    (F.lit(L.BODY_Y0) + j * L.ROW_PITCH).cast("double"))
              .otherwise((F.lit(L.BODY_Y0 + L.RIGHT_STAGGER)
                          + k * L.ROW_PITCH).cast("double")))
        x1 = x0 + F.when(i < hdr, F.lit(float(L.HDR_W))) \
                   .otherwise(F.lit(float(L.COL_W)))
        y1 = F.when(i < hdr, F.lit(L.HDR_Y1)) \
              .otherwise(y0 + F.lit(float(L.TOK_H)))
        return F.struct(x0.alias("x0"), y0.alias("y0"),
                        x1.alias("x1"), y1.alias("y1"), w.alias("word"))

    return F.transform(words, box)


def with_scattered_tokens(df: DataFrame, doc_id: str = "doc_id",
                          text: str = "text",
                          out: str = "tokens") -> DataFrame:
    """-> (doc_id, <out>=token-box array).  Materializes the shared
    per-row quantities (words, header count, left-column count) behind a
    repartition barrier so the transform lambda binds them as attributes
    — the same Project-collapse countermeasure the MinHash stage uses."""
    base = df.select(
        F.col(doc_id).alias(doc_id),
        F.split(F.col(text), " ").alias("__words"),
        (F.lit(L.HDR_BASE) + F.col(doc_id) % L.HDR_MOD).cast("int")
        .alias("__hdr"))
    base = base.withColumn(
        "__n_left",
        F.floor((F.size("__words") - F.col("__hdr") + F.lit(1))
                / F.lit(2)).cast("int"))
    # barrier: stop lambda re-inlining.  The partition count is EXPLICIT
    # (user counts are exempt from AQE coalescing): the shuffled columns
    # are tiny in bytes but the downstream scatter + XY-cut is CPU-heavy,
    # exactly the shape AQE's byte-based coalescing would serialize.
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism,
                  int(df.sparkSession.conf.get(
                      "spark.sql.shuffle.partitions", "200")))
    base = base.repartition(n_parts, doc_id)
    return base.select(
        doc_id,
        scatter_tokens(F.col("__words"), F.col("__hdr"),
                       F.col("__n_left")).alias(out))


@pandas_udf(ArrayType(StringType()))
def reading_order_udf(tokens: pd.Series) -> pd.Series:
    """array<struct<x0,y0,x1,y1,word>> (any order) -> words in reading
    order via recursive XY-cut."""
    from ocr_documents_spark.extractors.layout import reading_order_words
    out = []
    for boxes in tokens:
        if boxes is None or len(boxes) == 0:
            out.append([])
        else:
            out.append(reading_order_words(
                [(b["x0"], b["y0"], b["x1"], b["y1"], b["word"])
                 for b in boxes]))
    return pd.Series(out)
