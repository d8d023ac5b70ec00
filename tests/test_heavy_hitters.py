"""Misra-Gries heavy hitters (operators/heavy_hitters.py): exact-census
parity on the zero-deficit domain, certain bracket + guaranteed-presence
properties under engineered skew, batched-compression behavior, and the
bounded-exchange plan shape."""

import random

import duckdb
import pytest

import pyspark.sql.functions as F

from ocr_documents_spark.operators import heavy_hitters as HH

PARQ = "/root/testdata/sf0.001/events.parquet"


def _skewed_rows():
    # 30% one hot key, 4% x 5 warm keys, 10 000 unique tail keys; fixed
    # shuffle so partition contents are deterministic run-over-run
    rows = (["hot"] * 6000
            + [f"warm{i}" for i in range(5) for _ in range(800)]
            + [f"tail{j}" for j in range(10000)])
    random.Random(42).shuffle(rows)
    return rows


@pytest.fixture(scope="module")
def skewed(spark):
    return spark.createDataFrame(
        [(v,) for v in _skewed_rows()], "k string").repartition(8)


def test_exact_domain_matches_duckdb_census(spark):
    # k >= distinct keys in every partition -> deficit 0 -> the sketch
    # IS the exact census, value-for-value against the DuckDB twin
    df = spark.read.parquet(PARQ)
    got = {r["user_id"]: (r["est_count"], r["ub_count"])
           for r in HH.heavy_hitters(df, "user_id", k=100_000).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{PARQ}'")
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        HH.duckdb_exact_census_sql("events", "user_id")).fetchall()}
    assert got == want


def test_bracket_and_guaranteed_presence_under_skew(spark, skewed):
    n, k = 20000, 64
    got = {r["k"]: (r["est_count"], r["ub_count"])
           for r in HH.heavy_hitters(skewed, "k", k=k).collect()}
    exact = {r["k"]: r["n"] for r in
             skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    # one shared deficit D <= n/(k+1), same bracket width on every row
    widths = {ub - est for est, ub in got.values()}
    assert len(widths) == 1
    (D,) = widths
    assert 0 <= D <= n // (k + 1)
    # certain bracket: est <= true <= est + D
    for key, (est, ub) in got.items():
        assert est <= exact[key] <= ub
    # any key with true count > D is guaranteed present
    for key, true in exact.items():
        if true > D:
            assert key in got
    assert "hot" in got and all(f"warm{i}" in got for i in range(5))


def test_small_arrow_batches_force_compressions(spark, skewed):
    # tiny batches -> many merge+compress rounds per partition; the
    # bracket guarantee must survive batching (D > 0 exercises the
    # compression path for real)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        got = {r["k"]: (r["est_count"], r["ub_count"])
               for r in HH.heavy_hitters(skewed, "k", k=16).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    exact = {r["k"]: r["n"] for r in
             skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    (D,) = {ub - est for est, ub in got.values()}
    assert 0 < D <= 20000 // 17
    for key, (est, ub) in got.items():
        assert est <= exact[key] <= ub
    assert "hot" in got  # 6000 > any admissible D


def test_approx_hot_keys_superset_and_no_wild_false_positives(spark, skewed):
    rep = {r["k"]: (r["frac_lo"], r["frac_hi"]) for r in
           HH.approx_hot_keys(skewed, "k", threshold_frac=0.03,
                              safety=4).collect()}
    # every truly-hot key reported ...
    assert set(rep) >= {"hot", "warm0", "warm1", "warm2", "warm3", "warm4"}
    # ... and every reported key's TRUE share >= threshold*(1 - 1/safety)
    exact = {r["k"]: r["n"] for r in
             skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    for key, (lo, hi) in rep.items():
        assert exact[key] / 20000 >= 0.03 * (1 - 1 / 4)
        assert lo <= exact[key] / 20000 <= hi
    # on this corpus the bound is tight enough to be exact
    assert set(rep) == {"hot", "warm0", "warm1", "warm2", "warm3", "warm4"}


def test_summary_stage_shape(spark):
    from ocr_documents_spark.functions.fanout import cpu_parts
    # a WELL-SPLIT input (>= cluster parallelism, the lake-scale case):
    # the conditional fan_out must no-op, leaving the corpus-scale
    # stage scan -> project -> mapInPandas with NO exchange before the
    # sketch shrinks the data.  (An under-split input instead gains ONE
    # key-hashed repartition — pinned in tests/test_fanout.py.)
    df = spark.read.parquet(PARQ)
    df = df.repartition(cpu_parts(df), "user_id").localCheckpoint()
    summaries = HH.mg_partition_summaries(df, "user_id", k=8)
    plan = summaries._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # and its output is bounded by (k+1) rows per partition
    n_parts = df.rdd.getNumPartitions()
    assert summaries.count() <= (8 + 1) * max(n_parts, 1)
    # tally rows: key NULL, one per non-empty partition, est = the
    # partition's exact non-NULL row count (sums to the corpus total)
    drows = summaries.filter(F.col("user_id").isNull()).collect()
    assert len(drows) <= max(n_parts, 1)
    assert sum(r["est"] for r in drows) == df.filter(
        F.col("user_id").isNotNull()).count()
    # the full readout (incl. totals) is ONE corpus pass: exactly one
    # python sketch stage in the whole heavy_hitters plan
    hh_plan = (HH.heavy_hitters(df, "user_id", k=8)
               ._jdf.queryExecution().executedPlan().toString())
    assert hh_plan.count("FlatMapGroupsInPandas") == 0
    assert hh_plan.lower().count("mapinpandas") == 1


def test_k_validation(spark, skewed):
    with pytest.raises(ValueError):
        HH.mg_partition_summaries(skewed, "k", k=0)
    with pytest.raises(ValueError):
        HH.approx_hot_keys(skewed, "k", threshold_frac=1.5)
