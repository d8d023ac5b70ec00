"""Salted skew join (operators/skew.py): row-identical to the plain
join under engineered skew, deterministic across reruns, salt really in
the join key."""

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators.skew import hot_keys, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail; dim has extra keys too
    rows = [(i, "hot" if i % 10 else f"k{i}", float(i)) for i in range(2000)]
    large = spark.createDataFrame(rows, "row_id long, key string, v double")
    dim = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("k20", 3), ("absent", 4)],
        "key string, dim_v int")
    return large, dim


@pytest.mark.parametrize("how", ["inner", "left"])
def test_row_identical_to_plain_join(skewed, how):
    large, dim = skewed
    plain = sorted(tuple(r) for r in large.join(dim, "key", how).collect())
    salted = sorted(tuple(r) for r in
                    salted_join(large, dim, "key", salt=8, how=how).collect())
    assert salted == plain


def test_deterministic_rerun(skewed):
    large, dim = skewed
    a = sorted(tuple(r) for r in salted_join(large, dim, "key").collect())
    b = sorted(tuple(r) for r in salted_join(large, dim, "key").collect())
    assert a == b


def test_salt_is_in_the_join_key(skewed):
    large, dim = skewed
    plan = salted_join(large, dim, "key", salt=8) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan
    # the equi-join condition must carry the salt column, not just 'key'
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert join_lines and any("__salt" in l for l in join_lines)


def test_rejects_unsupported_how(skewed):
    large, dim = skewed
    with pytest.raises(ValueError):
        salted_join(large, dim, "key", how="right")


def test_hot_keys_detects_engineered_skew(skewed):
    large, _ = skewed
    hot = {r["key"]: (r["n_rows"], r["frac"])
           for r in hot_keys(large, "key", threshold_frac=0.05).collect()}
    assert set(hot) == {"hot"}
    assert hot["hot"][0] == 1800 and hot["hot"][1] == 0.9
