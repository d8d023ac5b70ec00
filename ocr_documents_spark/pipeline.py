"""The Spark extraction pipeline: docs(doc_id, spans) -> results.

One job, one lineage (mirrors the reference's single live request path,
backend/main.py:94-234 — see SURVEY.md §3.1):

    read -> posexplode(spans) -> [salt repartition] -> recover-text pandas UDF
    -> groupBy(doc_id) offset-ordered reassembly (native sort_array)
    -> native quality gate on first media span -> finalize mapInPandas
       (classify + per-type extract + status + out_spans)

Scale design (SURVEY.md §4.2):
* span-level parallelism: media-heavy documents (the skew unit) fan their
  spans across tasks via the salted repartition on (doc_id, span_idx);
  AQE handles residual shuffle skew.
* exactly two shuffles: the salt spread and the doc_id regroup.  The regroup
  is a hash aggregation on doc_id whose per-group state is bounded by the
  per-doc span cap, so it partial-aggregates map-side where possible.
* everything between Arrow batches is native Catalyst (gate, reassembly),
  and both UDF stages are Arrow-vectorized; there is no per-row Python UDF
  and no driver-side collect anywhere.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, StringType,
                               StructField, StructType)

from .operators.gate import quality_passed_col
from .operators.recover import recover_span

DOCS_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]))),
])

OUT_SPAN_TYPE = StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("order", IntegerType()),
])

FIELD_TYPE = StructType([
    StructField("name", StringType()),
    StructField("value", StringType()),
    StructField("confidence", DoubleType()),
    StructField("page", IntegerType()),
    StructField("media_ref", StringType()),
])

RESULT_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("document_type", StringType()),
    StructField("classify_confidence", DoubleType()),
    StructField("overall_confidence", DoubleType()),
    StructField("status", StringType()),
    StructField("n_pages", IntegerType()),
    StructField("fields", ArrayType(FIELD_TYPE)),
    StructField("out_spans", ArrayType(OUT_SPAN_TYPE)),
])


def _finalize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Classify + extract + status per document over recovered pages.

    Imports inside the function body so the closure ships cleanly via
    --py-files; rule tables compile once per executor process at import.
    """
    from ocr_documents_spark.extractors.pipeline_pure import process_recovered

    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "document_type", "classify_confidence",
                                "overall_confidence", "status", "n_pages",
                                "fields", "out_spans")}
        for doc_id, pages_raw, quality_ok in zip(
                pdf["doc_id"], pdf["pages"], pdf["quality_ok"]):
            pages = [{"text": p["text"] if p["text"] is not None else "",
                      "confidence": float(p["confidence"]),
                      "media_ref": p["media_ref"]} for p in pages_raw]
            r = process_recovered(doc_id, pages, bool(quality_ok))
            rows["doc_id"].append(r["doc_id"])
            rows["document_type"].append(r["document_type"])
            rows["classify_confidence"].append(float(r["classify_confidence"]))
            rows["overall_confidence"].append(float(r["overall_confidence"]))
            rows["status"].append(r["status"])
            rows["n_pages"].append(r["n_pages"])
            rows["fields"].append([
                {"name": name, "value": None if d["value"] is None else str(d["value"]),
                 "confidence": float(d["confidence"]), "page": d["page"],
                 "media_ref": d["media_ref"]}
                for name, d in r["fields"].items()])
            rows["out_spans"].append([
                {"kind": k, "text": t, "media_ref": m, "order": o}
                for (k, t, m, o) in r["out_spans"]])
        yield pd.DataFrame(rows)


def recover_and_regroup(docs: DataFrame, salt: bool = True) -> DataFrame:
    """docs -> one row per doc with offset-ordered recovered pages + QC bit."""
    spans = docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span"))

    if salt:
        # spread media-heavy documents across tasks; without this, a doc
        # with 4096 media spans pins its entire recovery to one input split
        spans = spans.repartition("doc_id", "span_idx")

    rec = spans.select(
        "doc_id",
        F.col("span.offset").alias("offset"),
        F.col("span.media_ref").alias("media_ref"),
        recover_span(F.col("span.kind"), F.col("span.text"),
                     F.col("span.media_ref")).alias("rec"),
    )

    pages = rec.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("offset"),
            F.col("rec.text").alias("text"),
            F.col("media_ref"),
            F.col("rec.confidence").alias("confidence"),
            F.col("rec.w").alias("w"), F.col("rec.h").alias("h"),
            F.col("rec.blur").alias("blur"),
            F.col("rec.brightness").alias("brightness"),
            F.col("rec.contrast").alias("contrast"),
        ))).alias("pages"))
    return pages


def with_quality_gate(pages: DataFrame, skip_quality_check: bool = False) -> DataFrame:
    """Native JVM-side gate on the first media span's metrics (Q1-Q6)."""
    first_media = F.try_element_at(
        F.filter("pages", lambda p: p["media_ref"].isNotNull()), F.lit(1))
    if skip_quality_check:
        ok = F.lit(True)
    else:
        ok = F.when(first_media.isNull(), F.lit(True)).otherwise(
            quality_passed_col(first_media["w"], first_media["h"],
                               first_media["blur"], first_media["brightness"],
                               first_media["contrast"]))
    return pages.withColumn("quality_ok", ok)


def run_pipeline(docs: DataFrame, skip_quality_check: bool = False,
                 salt: bool = True) -> DataFrame:
    """Full extraction: docs(doc_id, spans) -> RESULT_SCHEMA DataFrame."""
    pages = recover_and_regroup(docs, salt=salt)
    gated = with_quality_gate(pages, skip_quality_check)
    return gated.mapInPandas(_finalize_batches, RESULT_SCHEMA)


def read_docs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(DOCS_SCHEMA).parquet(path)


def fields_long(results: DataFrame) -> DataFrame:
    """S5: EAV long-format table (mirrors backend/main_v1.py:136-144)."""
    f = F.explode("fields").alias("f")
    return results.select("doc_id", "document_type", f).select(
        "doc_id", "document_type",
        F.col("f.name").alias("field_name"),
        F.col("f.value").alias("field_value"),
        F.col("f.confidence").alias("confidence"),
        F.col("f.page").alias("page_number"),
    )
