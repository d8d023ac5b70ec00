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
    # dangling sink leaks: total mass strictly below the initial SCALE
    assert sum(got.values()) < G.SCALE


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
