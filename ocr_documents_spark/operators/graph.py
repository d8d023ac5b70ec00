"""Host-graph PageRank: link-authority scores for domain-level corpus
weighting (Brin & Page 1998, "The Anatomy of a Large-Scale Hypertextual
Web Search Engine").

Why it lives in a curation engine: web-scale training corpora weight or
gate documents by their HOST's standing in the link graph — Common
Crawl publishes exactly this kind of host-level centrality ranking, and
RefinedWeb-style host hygiene (operators/urls.py caps mega-hosts) pairs
naturally with an authority score that PROMOTES well-linked hosts.  The
host graph is ~10^8 nodes at web scale — tiny next to the corpus — so
the iterative rank job is cheap relative to any text stage, and the
scores broadcast-join back onto documents.

Exactness (the house style): ranks are BIGINT MICRO-UNITS on a 10^12
scale and every step is integer arithmetic — ``DIV`` on Spark, ``//``
on DuckDB, identical floor semantics on the non-negative domain — so
the unrolled DuckDB twin matches value-for-value, never "within eps".
With damping d=85/100 over mass ``SCALE``:

    base        = (15 * (SCALE // n)) // 100          (teleport share)
    contrib(e)  = rank(src) // out_deg(src)           (per out-edge)
    rank'(node) = base + (85 * inflow(node)) // 100   (inflow = sum)

Total in-flight mass is <= SCALE = 10^12, so 85 * inflow < 2^63: no
overflow anywhere.  Dangling nodes (no out-edges) leak their damped
mass each round — the standard simplification (the alternative
redistributes it uniformly); ranks stay well-defined and both engines
leak identically.  Multi-edges collapse first (``distinct``): one link
from A to B counts once, as in host-graph practice.

Scale shape: the edge table and out-degrees materialize ONCE
(localCheckpoint — also keeps lineage flat across rounds, the
connected-components discipline); each round is one (ranks join edges
on src) shuffle + one groupBy(dst) partial aggregation.  On a real
cluster both tables would be bucketed by src so the per-round join is
co-located; the rank table is node-sized, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12       # one unit of rank mass, in micro-ish units
DAMPING_PCT = 85     # d = 0.85, the canonical damping factor
ITERS = 10


def pagerank(edges: DataFrame, iters: int = ITERS,
             damping_pct: int = DAMPING_PCT,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """edges(src, dst) -> (node, rank_micro BIGINT) for every node that
    appears as a source or destination.  ``rank_micro`` is the exact
    integer iterate on the 10^12 mass scale (divide by ``SCALE`` for
    the conventional [0, 1] score); fixed ``iters`` rounds, no
    convergence test — the twin unrolls the same count.
    """
    # host ids must be string/integer typed: a DOUBLE renders differently
    # per engine (Spark "1.0E7" vs DuckDB "10000000.0"), splitting one
    # node into two keys cross-engine — refuse rather than diverge
    types = dict(edges.dtypes)
    for c in (src_col, dst_col):
        if types.get(c) in ("float", "double"):
            raise TypeError(
                f"pagerank: column {c!r} is {types[c]} — floating-point "
                "host ids stringify differently across engines; cast to "
                "string or integer first")
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         .localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge set (no valid src/dst "
                         "pairs) — nothing to rank")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # edges carry their source's out-degree once, not once per round
    e_deg = e.join(out_deg, "src").localCheckpoint()

    init = SCALE // n
    base = ((100 - damping_pct) * init) // 100
    ranks = nodes.withColumn("rank_micro", F.lit(init).cast("long"))
    for _ in range(iters):
        inflow = (e_deg
                  .join(ranks.select(F.col("node").alias("src"),
                                     "rank_micro"), "src")
                  .select(F.col("dst").alias("node"),
                          F.expr("rank_micro DIV out_deg").alias("c"))
                  .groupBy("node").agg(F.sum("c").alias("inflow")))
        ranks = (nodes.join(inflow, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({damping_pct} * "
                                   f"coalesce(inflow, 0L)) DIV 100"))
                         .cast("long").alias("rank_micro"))
                 .localCheckpoint())
    return ranks


def join_host_rank(docs: DataFrame, ranks: DataFrame,
                   host_col: str = "site") -> DataFrame:
    """Documents pick up their host's authority (broadcast join — the
    rank table is node-sized): appends ``rank_micro`` (0 for hosts
    outside the graph).  Refuses a docs frame that already carries a
    ``rank_micro`` column — silently overwriting it would mask a caller
    bug (double-join, stale scores)."""
    if "rank_micro" in docs.columns:
        raise ValueError(
            "join_host_rank: docs already has a rank_micro column — "
            "drop or rename it before re-joining host ranks")
    r = ranks.select(F.col("node").alias(host_col), "rank_micro")
    return (docs.join(F.broadcast(r), host_col, "left")
            .withColumn("rank_micro",
                        F.coalesce("rank_micro", F.lit(0).cast("long"))))


# ---------------------------------------------------------------------------
# DuckDB oracle (same integer arithmetic, unrolled rounds)
# ---------------------------------------------------------------------------

def duckdb_pagerank_sql(edges_sql: str, iters: int = ITERS,
                        damping_pct: int = DAMPING_PCT) -> str:
    """Exact SQL twin of :func:`pagerank`.  ``edges_sql`` must select
    (src, dst); output is (node, rank_micro)."""
    init = f"({SCALE} // (SELECT count(*) FROM nodes))"
    base = f"(({100 - damping_pct} * {init}) // 100)"
    parts = [f"""e AS (
            SELECT DISTINCT CAST(src AS VARCHAR) AS src,
                            CAST(dst AS VARCHAR) AS dst
            FROM ({edges_sql})
            WHERE src IS NOT NULL AND dst IS NOT NULL
        ),
        nodes AS (
            SELECT src AS node FROM e
            UNION
            SELECT dst AS node FROM e
        ),
        deg AS (
            SELECT src, count(*) AS out_deg FROM e GROUP BY src
        ),
        r0 AS (
            SELECT node, {init} AS rank_micro FROM nodes
        )"""]
    for i in range(iters):
        parts.append(f"""i{i} AS (
            SELECT e.dst AS node,
                   sum(r.rank_micro // d.out_deg) AS inflow
            FROM e JOIN deg d USING (src)
                   JOIN r{i} r ON r.node = e.src
            GROUP BY e.dst
        ),
        r{i + 1} AS (
            SELECT n.node,
                   {base} + ({damping_pct} * coalesce(i.inflow, 0)) // 100
                       AS rank_micro
            FROM nodes n LEFT JOIN i{i} i USING (node)
        )""")
    body = ",\n        ".join(parts)
    return f"""
        WITH {body}
        SELECT node, CAST(rank_micro AS BIGINT) AS rank_micro
        FROM r{iters}
    """
