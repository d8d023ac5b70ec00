"""Corpus snapshot diff: what changed between two versions of a table.

Lake maintenance over a 10^12-document corpus needs to answer "what did
the new crawl/ingest actually change" without comparing text payloads
across a shuffle: re-crawled pages arrive with the same doc_id and
maybe-identical bytes, dropped pages disappear, new pages appear.  The
diff drives incremental work everywhere else in this engine — only
``added`` + ``changed`` docs need re-extraction, re-scoring, and
re-indexing (the dedup band index, the IVF-PQ codes), and ``removed``
ids cascade into index deletes (jobs/lake.delete semantics).

Engine shape: each side is reduced scan-side to (doc_id,
content fingerprint) — the house 15-hex md5 — so the full-outer join
that classifies every id shuffles two fixed-width columns, never text.
Presence is tracked explicitly (a literal marker per side), so an id
present with NULL text is distinct from an absent id: NULL-text rows
compare null-safely and a text that becomes NULL classifies as changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fingerprint15


def snapshot_diff(old: DataFrame, new: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """-> (doc_id, status in {added, removed, changed, unchanged},
    old_fp, new_fp) for EVERY id on either side."""
    o = old.select(id_col,
                   fingerprint15(F.col(text_col)).alias("old_fp"),
                   F.lit(True).alias("__in_old"))
    n = new.select(id_col,
                   fingerprint15(F.col(text_col)).alias("new_fp"),
                   F.lit(True).alias("__in_new"))
    return (o.join(n, id_col, "full_outer")
            .withColumn(
                "status",
                F.when(~F.coalesce("__in_old", F.lit(False)), "added")
                .when(~F.coalesce("__in_new", F.lit(False)), "removed")
                .when(F.col("old_fp").eqNullSafe(F.col("new_fp")),
                      "unchanged")
                .otherwise("changed"))
            .select(id_col, "status", "old_fp", "new_fp"))


def snapshot_diff_report(diff: DataFrame) -> DataFrame:
    """-> (status, n_docs), the four-way census."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))


def duckdb_snapshot_diff_sql() -> str:
    """Exact twin over views ``old_docs(doc_id, text)`` and
    ``new_docs(doc_id, text)`` -> (doc_id, status, old_fp, new_fp)."""
    return """
        WITH o AS (
            SELECT doc_id, substr(md5(text), 1, 15) AS old_fp,
                   TRUE AS in_old
            FROM old_docs
        ), n AS (
            SELECT doc_id, substr(md5(text), 1, 15) AS new_fp,
                   TRUE AS in_new
            FROM new_docs
        )
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN NOT coalesce(in_old, FALSE) THEN 'added'
                    WHEN NOT coalesce(in_new, FALSE) THEN 'removed'
                    WHEN old_fp IS NOT DISTINCT FROM new_fp
                        THEN 'unchanged'
                    ELSE 'changed' END AS status,
               old_fp, new_fp
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """
