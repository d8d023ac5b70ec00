"""Lake protocol: doc_id-bucketed writes, checkpoints, metrics sidecar.

Implements the north-rule job-control contract (SURVEY.md §4.2):

* results land partitioned by ``bucket = pmod(xxhash64(doc_id), n_buckets)``
  — the parquet stand-in for an Iceberg table written ``bucket(N, doc_id)``;
* a run claims a set of buckets, processes them in ONE Spark job, writes
  results + EAV fields with **dynamic partition overwrite** (only the
  claimed buckets are replaced — the parquet equivalent of
  ``MERGE INTO lake.results ON doc_id``, and exactly as idempotent: a
  re-driven bucket rewrites to the same bytes);
* per-bucket lineage rows (doc/span/status counts) append to a sidecar
  ``metrics`` table;
* a ``checkpoints`` table appends one row per completed bucket **after**
  the results commit, so a crash between the two replays the bucket —
  never loses it.  ``pending = claimed − checkpointed`` is the resume set.

On a cluster with an Iceberg catalog the same protocol maps 1:1:
``CREATE TABLE … PARTITIONED BY (bucket(N, doc_id))``, ``MERGE INTO`` for
results, plain appends for metrics/checkpoints.  This sandbox has no
Iceberg runtime jar, so the protocol rides parquet; the SQL the Iceberg
path would issue is in ``iceberg_merge_sql`` for parity review.

Reference lineage: the v1 status ladder pending → processing → completed
(backend/main_v1.py:117-157) is exactly this checkpoint table, with the
bucket range as the unit of work instead of one upload.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass
from typing import List, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RESULTS = "results"
FIELDS_LONG = "fields_long"
METRICS = "metrics"
CHECKPOINTS = "checkpoints"
REJECTS = "rejects"

# streaming surface: its OWN tables, partitioned (ingest_batch, bucket), so
# at-least-once micro-batch replays overwrite their own partitions instead
# of appending duplicates, and batch/stream writers never mix directory
# layouts under one table path.  A periodic compaction job folds
# results_stream into results via the same bucketed dynamic overwrite.
STREAM_RESULTS = "results_stream"
STREAM_FIELDS = "fields_long_stream"
STREAM_REJECTS = "rejects_stream"
STREAM_METRICS = "metrics_stream"


@dataclass
class Lake:
    root: str
    n_buckets: int

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def bucket_col(self, doc_id_col: str = "doc_id") -> F.Column:
        return F.pmod(F.xxhash64(doc_id_col), F.lit(self.n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, lake: Lake) -> List[int]:
    """Buckets already checkpointed (any prior run).

    'No checkpoint table yet' is detected with an explicit existence check,
    not a broad except: a transient read failure (corrupt footer, perms, FS
    hiccup) must PROPAGATE — treating it as 'nothing completed' would
    re-drive every bucket and, worse, the same pattern in compact_stream
    could drop rows.
    """
    path = lake.path(CHECKPOINTS)
    if not _path_exists(spark, path):
        return []
    rows = spark.read.parquet(path).select("bucket").distinct().collect()
    return sorted(r["bucket"] for r in rows)


def pending_buckets(spark: SparkSession, lake: Lake,
                    claimed: Sequence[int]) -> List[int]:
    done = set(completed_buckets(spark, lake))
    return [b for b in claimed if b not in done]


def write_bucketed(df: DataFrame, lake: Lake, table: str) -> None:
    """Replace exactly the bucket partitions present in ``df``.

    Dynamic partition overwrite = idempotent re-drive: rerunning a failed
    bucket rewrites its partition in place, never duplicates.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (df.write.partitionBy("bucket").mode("overwrite")
           .parquet(lake.path(table)))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def append(df: DataFrame, lake: Lake, table: str) -> None:
    df.write.mode("append").parquet(lake.path(table))


def bucket_metrics(results_with_bucket: DataFrame, run_id: str,
                   wall_s: float) -> DataFrame:
    """Per-bucket lineage rows for the sidecar metrics table.

    One row per (run, bucket): how many docs/spans, the status census, and
    field volume — enough to audit a range without scanning results.
    """
    s = F.col("status")
    return (results_with_bucket.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_pages").alias("n_spans"),
        F.sum(F.when(s == "completed", 1).otherwise(0)).alias("n_completed"),
        F.sum(F.when(s == "partial", 1).otherwise(0)).alias("n_partial"),
        F.sum(F.when(s == "rejected_quality", 1).otherwise(0)).alias("n_rejected_quality"),
        F.sum(F.when(s == "rejected_classification", 1).otherwise(0)).alias("n_rejected_classification"),
        F.sum(F.size("fields")).alias("n_fields"),
        F.avg("overall_confidence").alias("avg_confidence"),
        # HLL++ sketch: cheap dedup audit per range without a distinct shuffle
        F.approx_count_distinct("doc_id").alias("approx_distinct_doc_ids"))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("run_wall_s", F.lit(float(wall_s)))
        .withColumn("committed_at", F.lit(time.time())))


def checkpoint_rows(spark: SparkSession, run_id: str,
                    buckets: Sequence[int]) -> DataFrame:
    return spark.createDataFrame(
        [(run_id, int(b), time.time()) for b in buckets],
        "run_id string, bucket int, committed_at double")


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def apply_field_corrections(spark: SparkSession, lake: Lake,
                            corrections: DataFrame) -> int:
    """S9 manual field update (backend/main_v1.py:349-370) as a MERGE.

    ``corrections(doc_id, field_name, new_value)`` updates matching rows of
    fields_long.  Parquet stand-in for ``MERGE INTO lake.fields_long USING
    corrections ON (doc_id, field_name) WHEN MATCHED THEN UPDATE``: only the
    buckets containing corrected documents are rewritten (dynamic partition
    overwrite), everything else is untouched — same touched-partition cost
    profile as Iceberg's copy-on-write MERGE.

    MERGE semantics (like SQL MERGE, where duplicate source keys are an
    error): corrections are deduplicated per (doc_id, field_name) —
    ``max(new_value)`` keeps the deterministic non-null winner — so a
    duplicated source row can never fan out extra fields_long rows, and an
    explicit NULL ``new_value`` CLEARS the field (match flag, not
    coalesce).
    """
    corr = (corrections
            .groupBy("doc_id", "field_name")
            .agg(F.max("new_value").alias("__new"))
            .withColumn("bucket", lake.bucket_col())
            .withColumn("__matched", F.lit(True)))
    buckets = [r["bucket"] for r in corr.select("bucket").distinct().collect()]
    if not buckets:
        return 0
    fl = spark.read.parquet(lake.path(FIELDS_LONG))
    updated = (fl.filter(F.col("bucket").isin(buckets))
               .join(F.broadcast(corr.select("doc_id", "field_name",
                                             "__new", "__matched")),
                     ["doc_id", "field_name"], "left")
               .withColumn("field_value",
                           F.when(F.col("__matched").isNotNull(),
                                  F.col("__new"))
                           .otherwise(F.col("field_value")))
               .drop("__new", "__matched"))
    write_bucketed(updated, lake, FIELDS_LONG)
    return len(buckets)


def doc_bucket(spark: SparkSession, lake: Lake, doc_id: str) -> int:
    """The bucket a doc_id hashes to, computed WITHOUT scanning any table
    (one-row local relation through the same xxhash64 expression)."""
    return spark.createDataFrame([(doc_id,)], "doc_id string").select(
        lake.bucket_col().alias("b")).first()["b"]


def _delete_partition_dir(spark: SparkSession, path: str) -> None:
    """Drop a partition directory via the Hadoop FileSystem API (works on
    any FS the cluster mounts, not just local disk)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop FileSystem existence probe — the deliberate alternative to a
    bare ``except Exception`` around a read: only a genuinely-absent table
    is 'not there'; every other failure mode stays fatal."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def delete_document(spark: SparkSession, lake: Lake, doc_id: str) -> None:
    """S8 delete + cascade (backend/main_v1.py:328-346): row-level delete
    via rewrite of the single bucket holding the doc (Iceberg path:
    ``DELETE FROM lake.results WHERE doc_id = …``).

    The bucket is COMPUTED from the doc_id (pmod(xxhash64(doc_id), n)) so
    the scan partition-prunes to that one directory instead of reading the
    full table to discover where the doc lives.
    """
    b = doc_bucket(spark, lake, doc_id)
    for table in (RESULTS, FIELDS_LONG):
        df = spark.read.parquet(lake.path(table)).filter(F.col("bucket") == b)
        kept = df.filter(F.col("doc_id") != doc_id)
        if kept.isEmpty():
            # dynamic overwrite only replaces partitions PRESENT in the new
            # data; an emptied bucket must be dropped explicitly
            _delete_partition_dir(spark, f"{lake.path(table)}/bucket={b}")
        else:
            write_bucketed(kept, lake, table)


def compact_stream(spark: SparkSession, lake: Lake) -> dict:
    """Fold the streaming surface into the main lake tables.

    For every doc in results_stream, its LATEST micro-batch row wins; main
    rows for those docs are replaced, everything else is untouched — the
    parquet stand-in for ``MERGE INTO lake.results USING results_stream ON
    doc_id`` followed by truncating the staging table.  Only buckets that
    streamed data are rewritten (dynamic overwrite).  Idempotent: a crash
    after the main write but before the stream clear re-merges the same
    rows (the anti-join prevents duplicates).
    """
    # explicit existence check, NOT a broad except: a transient read error
    # here must propagate — if it were swallowed as 'nothing staged' the
    # caller would believe compaction succeeded with zero docs
    if not _path_exists(spark, lake.path(STREAM_RESULTS)):
        return {"docs": 0, "buckets": 0}
    stream = spark.read.parquet(lake.path(STREAM_RESULTS))
    latest_batch = (stream.groupBy("doc_id")
                    .agg(F.max("ingest_batch").alias("ingest_batch")))

    n_docs = latest_batch.count()
    buckets = [r["bucket"]
               for r in stream.select("bucket").distinct().collect()]

    for table, stream_table in ((RESULTS, STREAM_RESULTS),
                                (FIELDS_LONG, STREAM_FIELDS)):
        sdf = (spark.read.parquet(lake.path(stream_table))
               .join(latest_batch, ["doc_id", "ingest_batch"])
               .drop("ingest_batch"))
        # pure-streaming lake (no main table yet) is the ONLY case where the
        # stream becomes the whole partition content; a failed read of an
        # EXISTING main table must abort — merging without it would
        # dynamically overwrite the touched buckets with only streamed docs,
        # silently dropping every other main-table row in them
        if _path_exists(spark, lake.path(table)):
            main = (spark.read.parquet(lake.path(table))
                    .filter(F.col("bucket").isin(buckets)))
            merged = (main.join(latest_batch.select("doc_id"),
                                "doc_id", "left_anti")
                      .unionByName(sdf))
        else:
            merged = sdf
        write_bucketed(merged, lake, table)

    for stream_table in (STREAM_RESULTS, STREAM_FIELDS):
        _delete_partition_dir(spark, lake.path(stream_table))
    return {"docs": n_docs, "buckets": len(buckets)}


def export_results_csv(results: DataFrame, path: str) -> None:
    """S10 CSV export (frontend ResultsTable.tsx:51-74): doc summary,
    single headered file."""
    (results.select(
        "doc_id", "document_type", "status",
        F.round("overall_confidence", 2).alias("confidence"),
        F.size("fields").alias("n_fields"), "n_pages")
     .coalesce(1).write.option("header", True).mode("overwrite").csv(path))


def iceberg_merge_sql(catalog_table: str = "lake.results") -> str:
    """The MERGE the Iceberg path issues instead of dynamic overwrite."""
    return f"""
MERGE INTO {catalog_table} t
USING batch_results s
ON t.doc_id = s.doc_id
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
""".strip()
