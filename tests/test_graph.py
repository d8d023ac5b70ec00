"""Host-graph PageRank (operators/graph.py): exact integer-micro-unit
parity with the unrolled DuckDB twin, authority ordering on a hand
graph, duplicate/NULL-edge hygiene, and the broadcast join-back."""

import random

import duckdb
import pandas as pd
import pytest

import pyspark.sql.functions as F

from ocr_documents_spark.operators import graph as G


def _fuzz_edges():
    # deterministic scale-free-ish graph: a hub ring plus random tail
    # edges, duplicates injected on purpose (must collapse), one NULL
    # src and one NULL dst (must be filtered)
    rnd = random.Random(7)
    hosts = [f"host{i}" for i in range(120)]
    edges = [(h, "host0") for h in hosts[1:40]]          # hub inlinks
    edges += [(f"host{i}", f"host{(i + 1) % 120}") for i in range(120)]
    while len(edges) < 700:
        edges.append((rnd.choice(hosts), rnd.choice(hosts)))
    edges += edges[:25]                                   # duplicates
    edges += [(None, "host1"), ("host2", None)]
    return edges


def _duck_ranks(edges, iters):
    con = duckdb.connect()
    con.register("edges_df", pd.DataFrame(edges, columns=["src", "dst"]))
    sql = G.duckdb_pagerank_sql("SELECT src, dst FROM edges_df",
                                iters=iters)
    return {r[0]: r[1] for r in con.execute(sql).fetchall()}


@pytest.mark.parametrize("iters", [0, 3, 10])
def test_exact_parity_with_duckdb_twin(spark, iters):
    edges = _fuzz_edges()
    df = spark.createDataFrame(edges, "src string, dst string") \
        .repartition(8)
    got = {r["node"]: r["rank_micro"]
           for r in G.pagerank(df, iters=iters).collect()}
    want = _duck_ranks(edges, iters)
    assert got == want
    # mass sanity: dangling leak only ever REMOVES mass, teleport share
    # is every node's floor
    n = len(want)
    base = ((100 - G.DAMPING_PCT) * (G.SCALE // n)) // 100
    assert sum(got.values()) <= G.SCALE
    assert all(v >= base for v in got.values())


def test_authority_ordering_and_dangling(spark):
    # star: three sources all link to "sink"; sink has no out-edges
    # (dangling). sink must outrank every source, sources tie exactly.
    edges = [("a", "sink"), ("b", "sink"), ("c", "sink")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank_micro"] for r in G.pagerank(df).collect()}
    assert set(got) == {"a", "b", "c", "sink"}
    assert got["a"] == got["b"] == got["c"]
    assert got["sink"] > got["a"]
    # dangling-leak semantics pinned against a CLOSED control graph
    # (sink->a closes the cycle): floor-division rounding alone cannot
    # satisfy this — the dangling variant must retain strictly less
    # total mass than the same graph with the sink's out-edge added
    closed = spark.createDataFrame(edges + [("sink", "a")],
                                   "src string, dst string")
    got_closed = {r["node"]: r["rank_micro"]
                  for r in G.pagerank(closed).collect()}
    assert sum(got.values()) < sum(got_closed.values())
    assert sum(got_closed.values()) <= G.SCALE


def test_duplicate_edges_collapse(spark):
    # A->B stated five times must rank exactly like A->B stated once
    once = spark.createDataFrame([("a", "b"), ("b", "a")],
                                 "src string, dst string")
    many = spark.createDataFrame([("a", "b")] * 5 + [("b", "a")],
                                 "src string, dst string")
    r1 = {r["node"]: r["rank_micro"]
          for r in G.pagerank(once, iters=4).collect()}
    r2 = {r["node"]: r["rank_micro"]
          for r in G.pagerank(many, iters=4).collect()}
    assert r1 == r2


def test_join_host_rank_broadcasts_and_defaults(spark):
    edges = [("a.com", "b.com"), ("b.com", "a.com")]
    ranks = G.pagerank(
        spark.createDataFrame(edges, "src string, dst string"), iters=2)
    docs = spark.createDataFrame(
        [(1, "a.com"), (2, "nowhere.net")], "doc_id int, site string")
    got = {r["doc_id"]: r["rank_micro"]
           for r in G.join_host_rank(docs, ranks).collect()}
    assert got[1] > 0 and got[2] == 0
    plan = G.join_host_rank(docs, ranks)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_empty_edges_raise(spark):
    df = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty edge set"):
        G.pagerank(df)


def test_float_host_ids_refused(spark):
    # DOUBLE host ids stringify differently per engine (1.0E7 vs
    # 10000000.0) — the operator must refuse, not silently diverge
    df = spark.createDataFrame([(1.0, 2.0)], "src double, dst double")
    with pytest.raises(TypeError, match="floating-point"):
        G.pagerank(df)
    # integer ids are fine (both engines render them identically)
    ok = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
    got = {r["node"] for r in G.pagerank(ok, iters=1).collect()}
    assert got == {"1", "2"}


def test_join_host_rank_refuses_conflicting_column(spark):
    ranks = G.pagerank(
        spark.createDataFrame([("a.com", "b.com"), ("b.com", "a.com")],
                              "src string, dst string"), iters=1)
    docs = spark.createDataFrame(
        [(1, "a.com", 7)], "doc_id int, site string, rank_micro long")
    with pytest.raises(ValueError, match="already has a rank_micro"):
        G.join_host_rank(docs, ranks)
