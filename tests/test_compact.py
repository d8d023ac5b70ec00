"""Small-file compaction (jobs/compact.py): plan selection, content
preservation byte-for-byte, untouched-partition isolation, rerun no-op,
unpartitioned tables, and the z-order rewrite variant."""

import glob
import os

import pytest

import pyspark.sql.functions as F

from ocr_documents_spark.jobs import compact as C
from ocr_documents_spark.operators import zorder as Z

PARQ = "/root/testdata/sf0.001/events.parquet"


def _data_files(d):
    return [f for f in glob.glob(os.path.join(d, "*.parquet"))
            if not os.path.basename(f).startswith((".", "_"))]


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A bucket-partitioned table where buckets 0/1 are shattered into
    16 tiny files each and bucket 2 is already one file."""
    path = str(tmp_path / "lake")
    ev = (spark.read.parquet(PARQ)
          .withColumn("bucket", F.pmod("event_id", F.lit(3)).cast("int")))
    (ev.filter("bucket < 2").repartition(16)
       .write.partitionBy("bucket").parquet(path))
    (ev.filter("bucket = 2").coalesce(1)
       .write.partitionBy("bucket").mode("append").parquet(path))
    return path, ev


def test_plan_targets_only_fragmented_partitions(spark, fragmented):
    path, _ = fragmented
    plans = C.plan_compaction(spark, path, target_bytes=1 << 30)
    assert [p.relpath for p in plans] == ["bucket=0", "bucket=1"]
    assert all(p.n_files == 16 and p.n_out == 1 for p in plans)


def test_compact_preserves_content_and_isolates_partitions(spark, fragmented):
    path, ev = fragmented
    before = sorted(map(tuple, spark.read.parquet(path)
                        .drop("bucket").collect()))
    b2_files = set(_data_files(os.path.join(path, "bucket=2")))
    rep = C.compact_table(spark, path, target_bytes=1 << 30)
    assert rep == {"partitions": 2, "files_before": 32, "files_after": 2}
    assert len(_data_files(os.path.join(path, "bucket=0"))) == 1
    assert len(_data_files(os.path.join(path, "bucket=1"))) == 1
    # bucket=2 untouched: the very same files
    assert set(_data_files(os.path.join(path, "bucket=2"))) == b2_files
    after = sorted(map(tuple, spark.read.parquet(path)
                       .drop("bucket").collect()))
    assert after == before
    # partition column still derived from the directory layout
    assert (spark.read.parquet(path).groupBy("bucket").count().count()) == 3
    # rerun is a no-op: nothing qualifies any more
    assert C.plan_compaction(spark, path, target_bytes=1 << 30) == []
    rep2 = C.compact_table(spark, path, target_bytes=1 << 30)
    assert rep2["partitions"] == 0


def test_target_bytes_splits_into_multiple_files(spark, fragmented):
    path, _ = fragmented
    nbytes = dict((r, b) for r, _, b in
                  C.partition_file_stats(spark, path))["bucket=0"]
    target = max(nbytes // 3, 1)
    plans = {p.relpath: p for p in
             C.plan_compaction(spark, path, target_bytes=target)}
    # 16 tiny files still qualify only if mean < target/2; with target ~
    # bytes/3 the mean (bytes/16) is well under, and n_out is 3-4
    assert 2 <= plans["bucket=0"].n_out <= 4
    C.compact_table(spark, path, target_bytes=target)
    assert len(_data_files(os.path.join(path, "bucket=0"))) \
        == plans["bucket=0"].n_out


def test_unpartitioned_table(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.read.parquet(PARQ).repartition(12).write.parquet(path)
    before = sorted(r["event_id"] for r in
                    spark.read.parquet(path).collect())
    rep = C.compact_table(spark, path, target_bytes=1 << 30)
    assert rep == {"partitions": 1, "files_before": 12, "files_after": 1}
    assert len(_data_files(path)) == 1
    assert sorted(r["event_id"] for r in
                  spark.read.parquet(path).collect()) == before


def test_compact_with_zorder_clusters_files(spark, tmp_path):
    # 24 shattered files, then compact to 4 files z-ordered on
    # (event_id, user_id): a narrow user_id box must prune some files,
    # which the random-shatter layout cannot do
    path = str(tmp_path / "zlake")
    spark.read.parquet(PARQ).repartition(24).write.parquet(path)
    stats0 = Z.file_minmax_stats(spark, path, ["event_id", "user_id"])
    lo = spark.read.parquet(PARQ).agg(F.min("user_id")).first()[0]
    box = {"user_id": (lo, lo + 5)}
    assert Z.prunable_fraction(stats0, box) == 0.0  # shattered: no pruning
    before = sorted(r["event_id"] for r in
                    spark.read.parquet(path).collect())
    nbytes = C.partition_file_stats(spark, path)[0][2]
    rep = C.compact_table(spark, path,
                          target_bytes=max(nbytes // 4, 1),
                          zorder_cols=["event_id", "user_id"])
    assert rep["files_after"] < rep["files_before"]
    assert "z" not in spark.read.parquet(path).columns
    assert sorted(r["event_id"] for r in
                  spark.read.parquet(path).collect()) == before
    stats1 = Z.file_minmax_stats(spark, path, ["event_id", "user_id"])
    assert Z.prunable_fraction(stats1, box) > 0.0
