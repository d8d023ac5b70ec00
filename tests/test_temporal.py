"""As-of join operator (operators/temporal.py).

Semantics under test: inclusive <= matching, left-join NULLs before the
first right row, per-key isolation, deterministic max-tiebreak on
right-side timestamp ties, and the one-shuffle plan shape.  A hypothesis
sweep checks the union+window implementation against a brute-force
per-row reference.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_documents_spark.operators.temporal import asof_join


def _left_df(spark, rows):
    return spark.createDataFrame(rows, "id int, k int, t int")


def _right_df(spark, rows):
    return spark.createDataFrame(rows, "k int, t int, v int")


@pytest.fixture(scope="module")
def basic(spark):
    left = _left_df(spark, [(1, 10, 5), (2, 10, 20), (3, 10, 2),
                            (4, 99, 50)])
    right = _right_df(spark, [(10, 5, 100), (10, 15, 200), (77, 1, 900)])
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t",
                    value_cols=["v"])
    return {r["id"]: r["v"] for r in out.collect()}


def test_inclusive_match_at_equal_ts(basic):
    assert basic[1] == 100          # right t=5 matches left t=5 (<=)


def test_latest_row_wins(basic):
    assert basic[2] == 200          # t=20 sees both, takes t=15


def test_null_before_first_right_row(basic):
    assert basic[3] is None         # t=2 precedes every right row


def test_keys_do_not_leak(basic):
    assert basic[4] is None         # key 99 never matches key 10/77


def test_right_ties_take_max_tiebreak(spark):
    left = _left_df(spark, [(1, 7, 10)])
    right = _right_df(spark, [(7, 10, 3), (7, 10, 9), (7, 10, 6)])
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t",
                    value_cols=["v"]).collect()
    assert out[0]["v"] == 9


def test_single_shuffle_plan(spark):
    from ocr_documents_spark.plans.inspect import exchange_count
    left = _left_df(spark, [(1, 1, 1)])
    right = _right_df(spark, [(1, 1, 1)])
    df = asof_join(left, right, on="k", left_ts="t", right_ts="t",
                   value_cols=["v"])
    assert exchange_count(df) == 1      # the window's key partitioning


def _brute_force(left_rows, right_rows):
    exp = {}
    for lid, lk, lt in left_rows:
        cands = [(rt, rv) for rk, rt, rv in right_rows
                 if rk == lk and rt <= lt]
        exp[lid] = max(cands)[1] if cands else None
    return exp


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_matches_brute_force(spark, data):
    keys = st.integers(min_value=0, max_value=3)
    ts = st.integers(min_value=0, max_value=30)
    left = [(i, data.draw(keys), data.draw(ts)) for i in range(12)]
    # distinct (k, t) on the right so the brute-force tie rule is moot
    right_kt = data.draw(st.sets(st.tuples(keys, ts), max_size=10))
    right = [(k, t, 1000 + 31 * k + t) for k, t in right_kt]
    out = asof_join(_left_df(spark, left), _right_df(spark, right),
                    on="k", left_ts="t", right_ts="t", value_cols=["v"])
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == _brute_force(left, right)


@settings(max_examples=15, deadline=None)
@given(st.data(), st.sampled_from([1, 2, 7, 100]))
def test_bucketed_asof_equals_simple(spark, data, width):
    from ocr_documents_spark.operators.temporal import asof_join_bucketed
    keys = st.integers(min_value=0, max_value=2)
    ts = st.integers(min_value=0, max_value=40)
    left = [(i, data.draw(keys), data.draw(ts)) for i in range(10)]
    right_kt = data.draw(st.sets(st.tuples(keys, ts), max_size=12))
    right = [(k, t, 1000 + 41 * k + t) for k, t in right_kt]
    ldf, rdf = _left_df(spark, left), _right_df(spark, right)
    simple = asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                       value_cols=["v"])
    bucketed = asof_join_bucketed(ldf, rdf, on="k", left_ts="t",
                                  right_ts="t", value_cols=["v"],
                                  bucket_width=width)
    assert ({r["id"]: r["v"] for r in bucketed.collect()}
            == {r["id"]: r["v"] for r in simple.collect()})


def test_bucketed_asof_hot_key_spreads_partitions(spark):
    from ocr_documents_spark.operators.temporal import asof_join_bucketed
    # one key, timestamps spanning many buckets: the final window must
    # partition on (key, bucket), not key alone
    left = _left_df(spark, [(i, 1, i * 10) for i in range(40)])
    right = _right_df(spark, [(1, t, t) for t in range(0, 400, 25)])
    out = asof_join_bucketed(left, right, on="k", left_ts="t",
                             right_ts="t", value_cols=["v"],
                             bucket_width=50)
    got = {r["id"]: r["v"] for r in out.collect()}
    exp = _brute_force([(i, 1, i * 10) for i in range(40)],
                       [(1, t, t) for t in range(0, 400, 25)])
    assert got == exp
    # the big row-level Window must partition on (key, bucket): its spec
    # line names __b (the seed stage's tiny window partitions on key
    # alone, over bucket-granular rows — that one is allowed)
    plan = out._jdf.queryExecution().executedPlan().toString()
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any("__b" in ln for ln in window_lines)


def test_range_join_matches_cross_filter(spark):
    from ocr_documents_spark.operators.temporal import range_join
    points = spark.createDataFrame(
        [(i, d) for i, d in enumerate([0, 5, 31, 32, 33, 64, 99, 100])],
        "pid int, x int")
    ivals = spark.createDataFrame(
        [(1, 0, 0), (2, 30, 34), (3, 32, 95), (4, 96, 99), (5, 101, 200)],
        "iid int, lo int, hi int")
    got = sorted((r["pid"], r["iid"]) for r in range_join(
        points, ivals, "x", "lo", "hi", bin_width=32).collect())
    exp = sorted((p, i) for p, x in [(r["pid"], r["x"])
                                     for r in points.collect()]
                 for i, lo, hi in [(r["iid"], r["lo"], r["hi"])
                                   for r in ivals.collect()]
                 if lo <= x <= hi)
    assert got == exp
    assert (0, 1) in got and (6, 4) in got      # bin-edge + zero-length


@settings(max_examples=15, deadline=None)
@given(st.data(), st.sampled_from([1, 3, 32, 1000]))
def test_range_join_random_matches_cross_filter(spark, data, width):
    from ocr_documents_spark.operators.temporal import range_join
    coords = st.integers(min_value=-50, max_value=120)
    pts = [(i, data.draw(coords)) for i in range(8)]
    ivs = []
    for i in range(data.draw(st.integers(min_value=0, max_value=6))):
        a, b = sorted((data.draw(coords), data.draw(coords)))
        ivs.append((i, a, b))
    points = spark.createDataFrame(pts, "pid int, x int")
    ivals = spark.createDataFrame(ivs or [(0, 1, 0)],
                                  "iid int, lo int, hi int")
    got = sorted((r["pid"], r["iid"]) for r in range_join(
        points, ivals, "x", "lo", "hi", bin_width=width).collect())
    exp = sorted((p, i) for p, x in pts for i, lo, hi in
                 (ivs or [(0, 1, 0)]) if lo <= x <= hi)
    assert got == exp


def test_range_join_plan_is_equi_not_nested_loop(spark):
    from ocr_documents_spark.operators.temporal import range_join
    from ocr_documents_spark.plans.inspect import has_cartesian, plan_of
    points = spark.createDataFrame([(1, 10)], "pid int, x int")
    ivals = spark.createDataFrame([(1, 0, 20)], "iid int, lo int, hi int")
    df = range_join(points, ivals, "x", "lo", "hi", bin_width=8)
    plan = plan_of(df)
    assert not has_cartesian(df)
    assert "NestedLoop" not in plan             # equi-join on the bin


def test_date_typed_timestamps(spark):
    left = spark.createDataFrame(
        [(1, 5, dt.date(1995, 6, 15))], "id int, k int, d date")
    right = spark.createDataFrame(
        [(5, dt.date(1995, 6, 15), 11), (5, dt.date(1995, 6, 16), 22)],
        "k int, d date, v int")
    out = asof_join(left, right, on="k", left_ts="d", right_ts="d",
                    value_cols=["v"]).collect()
    assert out[0]["v"] == 11
