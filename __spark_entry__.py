"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship workload: the full document-extraction pipeline
(recover -> quality gate -> classify -> extract) over the deterministic
interleaved text+media corpus (FIXTURES.md §1, seed=42 — the BASELINE.json
``input_hint`` table shape), aggregated per (document_type, status).

``queries``/``oracle_sql`` expose the operator inventory from SURVEY.md §2.7
plus the training-data pipeline ops (dedup, similarity search, text
analytics) over the driver's parquet tables — EXACTLY 50 entries, every
one with a DuckDB oracle (the driver's gate samples the 50
lexicographically-first names; q11/q14/q33 live in pytest instead, see
tests/test_registry_extras.py).  The extraction pipeline's strong
correctness gate is the pytest span-sequence-equality suite
(tests/test_pipeline_equality.py); its driver entries (q27/q28/q32/q36/
q47) are additionally value-checked against golden parquet materialized
lazily+atomically by the same pure single-node oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction pipeline at the sf0.001 smoke tier."""
    from ocr_documents_spark.fixtures.gen import docs_for_sf, generate_docs
    from ocr_documents_spark.pipeline import DOCS_SCHEMA, run_pipeline

    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in d["spans"]])
            for d in generate_docs(docs_for_sf(0.001))]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    results = run_pipeline(docs)
    return (results.groupBy("document_type", "status")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("overall_confidence"), 2).alias("avg_confidence"),
                 F.round(F.avg(F.size("fields")), 2).alias("avg_fields"))
            .orderBy("document_type", "status"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_documents_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocr_documents_spark.queries import ORACLE_SQL, ensure_golden
    ensure_golden()  # golden-parquet oracles materialize lazily+atomically
    return dict(ORACLE_SQL)
