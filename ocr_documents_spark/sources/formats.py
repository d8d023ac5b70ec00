"""Alternate document-source formats.

The lake's native interchange is parquet (read_docs in pipeline.py), but
upstream producers commonly hand over JSON-lines — one document object
per line with the nested spans array intact.  Reading uses the explicit
DOCS_SCHEMA (never schema inference: on a 100 TB drop, inference means a
full extra pass and a schema that drifts with the sample), so malformed
lines become null-field rows that ingest validation quarantines rather
than killing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import DOCS_SCHEMA


def read_docs_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines docs source, schema pinned to the lake contract."""
    return spark.read.schema(DOCS_SCHEMA).json(path)


def write_docs_json(docs: DataFrame, path: str) -> None:
    """Producer-side twin (tests + hand-offs to JSON-only consumers)."""
    docs.write.mode("overwrite").json(path)
