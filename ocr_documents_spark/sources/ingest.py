"""S1 ingest validation: split the incoming docs scan into valid rows and
a reject sink with reasons.

The reference gates uploads on an extension whitelist and returns HTTP 400
with a reason (backend/main.py:110-121); at lake scale the same contract
is a DataFrame split — valid rows flow to the pipeline, rejects land in a
quarantine table with a machine-readable reason instead of killing the job.
All checks are native column predicates (zero Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_KINDS = ("text", "media", "html")


def _reject_reason() -> F.Column:
    spans = F.col("spans")
    bad_kind = F.exists(spans, lambda s: ~s["kind"].isin(*VALID_KINDS))
    media_no_ref = F.exists(
        spans, lambda s: (s["kind"] == "media") & s["media_ref"].isNull())
    null_offset = F.exists(spans, lambda s: s["offset"].isNull())
    dup_offset = (F.size(F.array_distinct(
        F.transform(spans, lambda s: s["offset"]))) != F.size(spans))
    return (
        F.when(F.col("doc_id").isNull() | (F.col("doc_id") == ""), "null_doc_id")
        .when(spans.isNull() | (F.size(spans) == 0), "empty_spans")
        .when(bad_kind, "unknown_span_kind")
        .when(media_no_ref, "media_span_without_ref")
        .when(null_offset, "null_offset")
        .when(dup_offset, "duplicate_offsets")
    )


def split_valid(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (valid docs, rejects with a ``reject_reason`` column)."""
    tagged = docs.withColumn("reject_reason", _reject_reason())
    valid = tagged.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    rejects = tagged.filter(F.col("reject_reason").isNotNull())
    return valid, rejects
