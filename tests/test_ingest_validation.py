"""S1 ingest validation: malformed rows route to the reject sink with a
reason; the job never crashes on them and valid docs are unaffected."""

import os

from ocr_documents_spark.fixtures.gen import write_docs_parquet
from ocr_documents_spark.jobs import extract as job
from ocr_documents_spark.jobs import lake as L
from ocr_documents_spark.pipeline import DOCS_SCHEMA
from ocr_documents_spark.sources.ingest import split_valid

BAD_ROWS = [
    ("", [("text", "x", None, 0)]),                       # null_doc_id
    ("bad-empty", []),                                    # empty_spans
    ("bad-kind", [("hologram", "x", None, 0)]),           # unknown_span_kind
    ("bad-media", [("media", None, None, 0)]),            # media_span_without_ref
    ("bad-offset", [("text", "x", None, None)]),          # null_offset
    ("bad-dup", [("text", "a", None, 0), ("text", "b", None, 0)]),  # duplicate_offsets
]
GOOD_ROW = ("good-1", [("text", "PASSPORT\nP<INDX<<Y", None, 0)])


def test_split_valid_reasons(spark):
    docs = spark.createDataFrame(BAD_ROWS + [GOOD_ROW], DOCS_SCHEMA)
    valid, rejects = split_valid(docs)
    assert [r["doc_id"] for r in valid.collect()] == ["good-1"]
    reasons = {r["doc_id"]: r["reject_reason"] for r in rejects.collect()}
    assert reasons == {
        "": "null_doc_id",
        "bad-empty": "empty_spans",
        "bad-kind": "unknown_span_kind",
        "bad-media": "media_span_without_ref",
        "bad-offset": "null_offset",
        "bad-dup": "duplicate_offsets",
    }


def test_job_quarantines_rejects(spark, tmp_path):
    corpus = str(tmp_path / "docs")
    write_docs_parquet(corpus, 20, docs_per_file=10)
    # append a part file with malformed rows
    bad = spark.createDataFrame(BAD_ROWS, DOCS_SCHEMA)
    bad.coalesce(1).write.mode("append").parquet(corpus)

    lake_root = str(tmp_path / "lake")
    report = job.run(spark, corpus, lake_root, 4, claimed=[0, 1, 2, 3])
    assert report["n_docs"] == 20  # only valid docs extracted

    rejects = spark.read.parquet(os.path.join(lake_root, L.REJECTS))
    assert rejects.count() == len(BAD_ROWS)
    assert set(rejects.columns) >= {"doc_id", "reject_reason", "bucket"}

    metrics = spark.read.parquet(os.path.join(lake_root, L.METRICS))
    row = metrics.orderBy("bucket").first()
    assert row["approx_distinct_doc_ids"] > 0
