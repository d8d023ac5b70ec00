"""Continuous corpus curation: the jobs/curate.py stages as an
idempotent streaming pipeline with CROSS-BATCH dedup state in the lake.

The interesting design problem is near-dup state: a 10^12-doc corpus
cannot keep its dedup signatures in Spark's state store (state is
bounded by watermark eviction — corpus membership never expires).  The
answer is the dedup module's persisted band index: each micro-batch

1. scrubs PII and applies the Gopher/C4 quality gate (stateless,
   per-row);
2. drops exact duplicates WITHIN the batch (md5 fingerprint) and
   within-batch near-dup non-canonicals (``candidate_pairs`` over the
   batch only);
3. probes the LAKE's band-index table with ``incremental_candidates``
   — only the batch is hashed, the corpus is never re-read — and drops
   any batch doc colliding with an already-accepted document (the
   conservative streaming policy: a band hit is a drop, no exact
   verify, because the index stores bands, not shingles; documented
   trade vs the batch job's verified Jaccard);
4. decontaminates against the static eval set (broadcast);
5. appends the survivors to ``curated_stream`` AND their bands to the
   index table, both partitioned by (ingest_batch, …) with dynamic
   partition overwrite — an at-least-once replay of a batch rewrites
   its own partitions byte-identically, so the pipeline is idempotent
   end to end (replay-tested);
6. lands a per-batch funnel-metrics row the status CLI can census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CURATED = "curated_stream"
BAND_INDEX = "band_index_stream"
CURATION_METRICS = "curation_metrics_stream"


def curation_committer(lake, bench: DataFrame | None = None,
                       n_hashes: int | None = None,
                       bands: int | None = None):
    """foreachBatch callback factory (exposed for direct replay tests,
    like sessionize.stream_committer)."""
    from ..jobs import lake as L
    from ..operators import dedup as D
    from ..operators.decontaminate import decontaminate
    from ..operators.pii import scrub_corpus
    from ..operators.quality_filters import quality_filter_report

    n_hashes = n_hashes or D.N_HASHES
    bands = bands or D.BANDS

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode",
                             "static")
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            bid = F.lit(int(batch_id))
            funnel = {"input": batch_df.count()}

            cur = (scrub_corpus(batch_df, "text", "__clean")
                   .drop("text").withColumnRenamed("__clean", "text"))
            keep = (quality_filter_report(cur)
                    .filter(F.col("keep")).select("doc_id"))
            cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
            funnel["after_quality"] = cur.count()

            # exact dups within the batch: deterministic min-doc_id winner
            fp = cur.withColumn("__fp", F.md5("text"))
            canon = fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
            cur = (fp.join(canon, ["__fp", "doc_id"], "left_semi")
                   .drop("__fp"))
            # near-dups within the batch: min-id canonical per candidate
            # pair (batch-local, so plain candidate_pairs is cheap)
            pairs = D.candidate_pairs(
                D.minhash_signatures(cur, n_hashes, bands), bands)
            losers = pairs.select(
                F.greatest("a_doc_id", "b_doc_id").alias("doc_id")).distinct()
            cur = cur.join(losers, "doc_id", "left_anti").localCheckpoint()
            funnel["after_batch_dedup"] = cur.count()

            # cross-batch: probe the lake's accumulated band index
            if L._path_exists(sess, lake.path(BAND_INDEX)):
                index = (sess.read.parquet(lake.path(BAND_INDEX))
                         # a replayed batch must not collide with its own
                         # previously-written bands
                         .filter(F.col("ingest_batch") != int(batch_id)))
                hits = (D.incremental_candidates(cur, index, n_hashes,
                                                 bands)
                        .select(F.col("new_doc_id").alias("doc_id"))
                        .distinct())
                cur = cur.join(hits, "doc_id", "left_anti")
            cur = cur.localCheckpoint()
            funnel["after_index_dedup"] = cur.count()

            if bench is not None:
                cur = decontaminate(cur, bench).localCheckpoint()
                funnel["after_decontaminate"] = cur.count()

            out = (cur.withColumn("bucket", lake.bucket_col())
                   .withColumn("ingest_batch", bid))
            (out.write.partitionBy("ingest_batch", "bucket")
             .mode("overwrite").parquet(lake.path(CURATED)))
            new_bands = (D.band_index(
                D.minhash_signatures(cur, n_hashes, bands), bands)
                .withColumn("ingest_batch", bid))
            (new_bands.write.partitionBy("ingest_batch")
             .mode("overwrite").parquet(lake.path(BAND_INDEX)))
            metrics = sess.createDataFrame(
                [tuple([int(batch_id)] + [int(funnel[k]) for k in
                                          sorted(funnel)])],
                ["ingest_batch"] + sorted(funnel))
            (metrics.write.partitionBy("ingest_batch")
             .mode("overwrite").parquet(lake.path(CURATION_METRICS)))
        finally:
            sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return commit_batch


def curate_stream(spark, docs_path: str, lake_root: str, n_buckets: int,
                  checkpoint_dir: str, schema: str =
                  "doc_id long, text string, source string",
                  bench: DataFrame | None = None):
    """Continuous curation over a docs directory (parquet file source);
    wire ``.start()`` on the returned writer."""
    from ..jobs import lake as L
    lake = L.Lake(lake_root, n_buckets)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 8).parquet(docs_path))
    return (stream.writeStream
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(curation_committer(lake, bench)))
