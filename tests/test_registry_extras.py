"""Coverage for operators moved OUT of the 50-entry driver registry.

The driver's hard gate samples the 50 lexicographically-first queries()
entries, so the registry is exactly 50 oracle-checked entries; the three
r2 entries that no longer fit keep full validation here:

* q11_first_order_per_customer — window-dedup on orders (same operator
  class as the registered q05); checked against its DuckDB oracle.
* q14_lsh_candidate_pairs — the candidate stage of the dedup pipeline (a
  projection of registered q16); checked against its DuckDB oracle.
* q33_approx_distinct — HLL++ sketch estimates are engine-specific by
  construction, so the check is an error-bound assertion vs the exact
  count, not a hash match.

Also validates the q32 golden-parquet oracle end-to-end (Spark UDF
aggregation vs the pure-decode golden DuckDB reads) so a fixture or
decode change can never silently diverge before the driver runs.
"""

import duckdb
import pandas as pd

from ocr_documents_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _duck(sf_dir=SF_DIR):
    con = duckdb.connect()
    for t in ("orders", "documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_q11_first_order_per_customer_vs_oracle(spark):
    got = _normalize(
        Q.q11_first_order_per_customer(spark, SF_DIR).toPandas())
    want = _normalize(
        _duck().execute(Q.ORACLE_SQL["q11_first_order_per_customer"])
        .fetchdf())
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_q14_lsh_candidate_pairs_vs_oracle(spark):
    got = _normalize(Q.q14_lsh_candidate_pairs(spark, SF_DIR).toPandas())
    want = _normalize(
        _duck().execute(Q.ORACLE_SQL["q14_lsh_candidate_pairs"]).fetchdf())
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_q33_approx_distinct_bounds(spark):
    rows = Q.q33_approx_distinct(spark, SF_DIR).collect()
    assert rows, "event table empty?"
    for r in rows:
        exact = r["exact_users"]
        # HLL++ at default rsd=0.05: allow a generous 15% band
        assert abs(r["approx_users"] - exact) <= max(2, 0.15 * exact), r
        assert r["n_events"] >= exact


def test_q32_media_features_vs_golden_oracle(spark):
    Q.ensure_golden()
    got = _normalize(Q.q32_media_features(spark, SF_DIR).toPandas())
    want = _normalize(
        _duck().execute(Q.ORACLE_SQL["q32_media_features"]).fetchdf())
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_registry_is_exactly_50_and_fully_oracled():
    assert len(Q.QUERIES) == 50
    missing = [k for k in Q.QUERIES if k not in Q.ORACLE_SQL]
    assert missing == [], f"registry entries without an oracle: {missing}"


def test_q48_materialized_doc_terms_identical(spark, tmp_path):
    """The production materialize-to-lake path (doc-term tf table written
    once, six branches read it back) must produce byte-identical
    classifications to the suite-scale re-derivation default."""
    base = _normalize(Q.q48_tfidf_classifier(spark, SF_DIR).toPandas())
    mat = _normalize(
        Q.q48_tfidf_classifier(spark, SF_DIR,
                               materialize_dir=str(tmp_path)).toPandas())
    pd.testing.assert_frame_equal(base, mat)
    import os
    assert os.path.isdir(str(tmp_path / "q48_doc_terms.parquet"))


def test_q54_cohort_retention_vs_oracle(spark):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{SF_DIR}/events.parquet'")
    got = _normalize(Q.q54_cohort_retention(spark, SF_DIR).toPandas())
    want = _normalize(
        con.execute(Q.ORACLE_SQL["q54_cohort_retention"]).fetchdf())
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
