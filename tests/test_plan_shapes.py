"""Physical-plan assertions: the plans we'd want at 100 TB, not just the
first ones that pass (predicate pushdown reaching the parquet scan, column
pruning, broadcast joins for small dims, shuffle counts, codegen spans).
"""

import pytest


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from ocr_documents_spark.queries import QUERIES
    plan = plan_of(QUERIES["q02_filter_pushdown"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    # at least one concrete predicate pushed, not an empty list
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_discount" in pushed or "l_quantity" in pushed, pushed


def test_column_pruning(spark, sf_dir):
    """q03 touches 3 of orders' 6 columns; the scan must not read more."""
    from ocr_documents_spark.queries import QUERIES
    plan = plan_of(QUERIES["q03_top_orders"](spark, sf_dir))
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_orderpriority" not in read_schema
    assert "o_orderdate" not in read_schema


def test_small_dim_join_broadcasts(spark, sf_dir):
    """nation (25 rows) and customer side of q06 must broadcast, not
    shuffle-hash: at 100 TB the orders side never moves for these dims."""
    from ocr_documents_spark.queries import QUERIES
    plan = plan_of(QUERIES["q06_revenue_by_nation"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    top-k then driver merge), never a global sort."""
    from ocr_documents_spark.queries import QUERIES
    plan = plan_of(QUERIES["q03_top_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_agg_has_partial_stage(spark, sf_dir):
    """hash aggregation must be partial (map-side) + final, visible as two
    HashAggregate nodes around the exchange."""
    from ocr_documents_spark.queries import QUERIES
    plan = plan_of(QUERIES["q01_pricing_summary"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan  # partial_sum / partial_avg / partial_count


def test_pipeline_default_plan_is_single_scan_no_shuffle(spark):
    from ocr_documents_spark.fixtures.gen import generate_docs
    from ocr_documents_spark.pipeline import DOCS_SCHEMA, run_pipeline
    docs = spark.createDataFrame(
        [(d["doc_id"],
          [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
         for d in generate_docs(30)], DOCS_SCHEMA)
    plan = plan_of(run_pipeline(docs))
    assert "Exchange" not in plan  # cost model: cheap decode -> zero shuffles


def test_pipeline_forced_salt_has_exactly_two_shuffles(spark):
    from ocr_documents_spark.fixtures.gen import generate_docs
    from ocr_documents_spark.pipeline import DOCS_SCHEMA, run_pipeline
    docs = spark.createDataFrame(
        [(d["doc_id"],
          [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
         for d in generate_docs(30)], DOCS_SCHEMA)
    plan = plan_of(run_pipeline(docs, heavy_threshold=16))
    # salt fan-out + doc_id regroup, nothing else
    assert plan.count("Exchange") == 2


def test_wholestage_codegen_covers_native_ops(spark, sf_dir):
    """Codegen spans appear in the FINAL adaptive plan (post-execution)."""
    from ocr_documents_spark.queries import QUERIES
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    # codegen spans print as "*(n) Operator" in the executed-plan string;
    # both the partial and final agg stages must be inside one
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan
    assert "*(1) Filter" in plan  # the pushed residual filter is codegen'd too