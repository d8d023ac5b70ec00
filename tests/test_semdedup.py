"""Semantic dedup (operators/semdedup.py): engineered near-duplicate
vectors must group cross-cluster-consistently with the exact DuckDB twin
(unrolled k-means + within-cell cosine pairs + transitive closure)."""

import duckdb

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import semdedup as SM
from ocr_documents_spark.queries import (NEARDUP_N, NEARDUP_OFFSET,
                                         NEARDUP_SCALE, NEARDUP_SHIFT)

SF_DIR = "/root/testdata/sf0.001"
PARQ = f"{SF_DIR}/embeddings.parquet"

# the q24 engineered-union recipe: vec_id < N re-emitted at +OFFSET with
# embedding' = SCALE*x + SHIFT (cos ~0.9997 to its source) — the raw
# corpus has no cos >= 0.95 pair, so a dedup test must manufacture them
ENG_SQL = f"""
    SELECT vec_id, embedding FROM '{PARQ}'
    UNION ALL
    SELECT vec_id + {NEARDUP_OFFSET},
           list_transform(embedding,
                          v -> v * {NEARDUP_SCALE} + {NEARDUP_SHIFT})
    FROM '{PARQ}' WHERE vec_id < {NEARDUP_N}
"""


@pytest.fixture(scope="module")
def emb(spark):
    base = spark.read.parquet(PARQ).select("vec_id", "embedding")
    eng = (base.filter(F.col("vec_id") < NEARDUP_N)
           .select((F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"),
                   F.transform(
                       "embedding",
                       lambda v: v * NEARDUP_SCALE + NEARDUP_SHIFT)
                   .alias("embedding")))
    return base.unionByName(eng)


def test_engineered_pairs_group_and_match_oracle(emb):
    tel = {}
    got = {r["vec_id"]: (r["group_id"], r["group_size"], r["is_canonical"])
           for r in SM.semantic_dedup_groups(
               emb, cc_telemetry=tel).collect()}
    assert tel["converged"] is True
    # SemDeDup is within-cluster by construction: a near-dup pair whose
    # members straddle a hard-assignment cell boundary is missed (the
    # paper's known recall trade) — so copies either group under their
    # source or stay singletons, never anything else, and most group
    grouped = 0
    for i in range(NEARDUP_N):
        g = got[i + NEARDUP_OFFSET]
        assert g[0] in (i, i + NEARDUP_OFFSET)
        if g[0] == i:
            grouped += 1
            assert g[2] is False
            assert got[i] == (i, 2, True)
    assert grouped >= NEARDUP_N * 2 // 3, f"only {grouped} pairs grouped"
    # untouched corpus vectors are singletons
    singles = [v for k, v in got.items()
               if NEARDUP_N <= k < NEARDUP_OFFSET]
    assert singles and all(s[1] == 1 and s[2] for s in singles)

    con = duckdb.connect()
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        SM.duckdb_semantic_dedup_sql(ENG_SQL)).fetchall()}
    assert got == want


def test_pairs_join_on_cell_never_allpairs(emb):
    """Plan shape: the candidate join's only key is the cluster cell —
    no cartesian over the corpus.  (The broadcast nested-loop against the
    k-row codebook is the intended cell-assignment pattern and is allowed;
    asserted on the pair stage because dedup's connected components
    localCheckpoints, truncating the downstream lineage.)"""
    plan = SM.semantic_pair_candidates(emb) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan
    for line in plan.splitlines():
        if "CartesianProduct" in line:
            raise AssertionError(f"cartesian over the corpus: {line}")


def test_two_level_matches_exact_twin(emb):
    """The corpus-growth-safe path: two-level training + fine-cell
    pairs must equal the unrolled DuckDB twin VALUE-FOR-VALUE (groups,
    sizes, canonicals), and the engineered near-dup pairs must still
    group under the finer cells (hard-assignment boundary misses are
    the paper's known trade — floor at half the pairs)."""
    tel = {}
    got = {r["vec_id"]: (r["group_id"], r["group_size"], r["is_canonical"])
           for r in SM.semantic_dedup_groups_two_level(
               emb, sub_k=4, cc_telemetry=tel).collect()}
    assert tel["converged"] is True
    con = duckdb.connect()
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        SM.duckdb_semantic_dedup_two_level_sql(ENG_SQL, sub_k=4)).fetchall()}
    assert got == want
    grouped = 0
    for i in range(NEARDUP_N):
        g = got[i + NEARDUP_OFFSET]
        assert g[0] in (i, i + NEARDUP_OFFSET)
        grouped += g[0] == i
    assert grouped >= NEARDUP_N // 2, f"only {grouped} pairs grouped"


def test_two_level_bounds_cell_occupancy(spark):
    """The r3 scale defect: at fixed k the within-cell pair count grows
    O(n²/k).  On the 10× corpus, the scale-derived two-level fine cells
    must cut candidate-pair work by an order of magnitude vs the flat
    k=8 assignment, and the largest fine cell must be far below the
    largest flat cell."""
    from ocr_documents_spark.operators import ivf as IVF
    emb10 = (spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
             .select("vec_id", "embedding"))
    n = emb10.count()
    # a tight target occupancy so the small corpus still yields a real
    # split (sub_k ~ n / (15 * 8)); ideal pair-count cut is sub_k×
    sub_k = IVF.sub_k_for(n, avg_cell_size=15)
    assert sub_k >= 4
    cent, sub_cent = IVF.train_two_level(emb10, sub_k)
    fine = (IVF.assign_two_level(emb10, cent, sub_cent)
            .groupBy("cell", "sub").count().collect())
    flat = (IVF._nearest_cell(IVF._as_double(emb10),
                              IVF.train_centroids(emb10))
            .groupBy("cell").count().collect())
    pairs = lambda rows: sum(r["count"] * (r["count"] - 1) // 2  # noqa: E731
                             for r in rows)
    assert sum(r["count"] for r in fine) == n     # nobody dropped
    # demand at least half the ideal sub_k× pair-count reduction
    assert pairs(fine) * sub_k <= pairs(flat) * 2, \
        (sub_k, pairs(fine), pairs(flat))
    assert max(r["count"] for r in fine) < max(r["count"] for r in flat)


def test_two_level_plan_never_broadcasts_fine_codebook(emb):
    """Scale shape: the refinement join is keyed on the coarse cell —
    the k1×k2 fine codebook is never a broadcast side of a nested-loop
    (only the k1-row coarse codebook rides a broadcast), and no stage
    is a cartesian over the corpus."""
    from ocr_documents_spark.operators import ivf as IVF
    cent, sub_cent = IVF.train_two_level(emb, sub_k=4)
    plan = IVF.assign_two_level(emb, cent, sub_cent) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln or "BroadcastHashJoin" in ln:
            assert "scvec" not in ln, ln


def test_injected_codebook_reused_not_retrained(emb):
    """The production train-once path: a codebook trained up front and
    passed in must yield the identical grouping to the self-trained
    default (the injected DataFrame short-circuits Lloyd's)."""
    from ocr_documents_spark.operators.ivf import train_centroids
    cb = train_centroids(emb)
    default = sorted(tuple(r) for r in SM.semantic_dedup_groups(emb).collect())
    injected = sorted(tuple(r) for r in
                      SM.semantic_dedup_groups(emb, centroids=cb).collect())
    assert injected == default


def test_injected_two_level_codebooks_reused_not_retrained(emb):
    """codebooks= on the two-level path (the steady-state serving
    split bench.py times as semdedup_assign): a (cent, sub_cent) pair
    trained up front must yield the identical grouping to the
    self-trained call with the same sub_k."""
    from ocr_documents_spark.operators.ivf import train_two_level
    cbs = train_two_level(emb, sub_k=4)
    default = sorted(tuple(r) for r in SM.semantic_dedup_groups_two_level(
        emb, sub_k=4).collect())
    injected = sorted(tuple(r) for r in SM.semantic_dedup_groups_two_level(
        emb, codebooks=cbs).collect())
    assert injected == default


def test_hash_seeded_path_works_on_foreign_id_space(spark):
    """Production corpora need not contain the fixture seed ids: on a
    corpus whose every vec_id is shifted by 10^9 (so INIT_IDS match
    nothing and absolute-id seeding would silently empty the codebook),
    the seed_by_hash path must still group the engineered near-dups and
    match the exact DuckDB twin value-for-value."""
    SHIFT = 10 ** 9
    base = (spark.read.parquet(PARQ).select("vec_id", "embedding")
            .withColumn("vec_id", F.col("vec_id") + SHIFT))
    eng = (base.filter(F.col("vec_id") < SHIFT + NEARDUP_N)
           .select((F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"),
                   F.transform(
                       "embedding",
                       lambda v: v * NEARDUP_SCALE + NEARDUP_SHIFT)
                   .alias("embedding")))
    emb = base.unionByName(eng)
    n = 500 + NEARDUP_N
    k_coarse = max(1, min(8, -(-n // SM.AVG_CELL_SIZE)))
    from ocr_documents_spark.operators.ivf import sub_k_for
    sub_k = sub_k_for(n, k_coarse, SM.AVG_CELL_SIZE)
    got = {r["vec_id"]: (r["group_id"], r["group_size"], r["is_canonical"])
           for r in SM.semantic_dedup_groups_two_level(
               emb, seed_by_hash=True).collect()}
    shifted_sql = f"""
        SELECT vec_id + {SHIFT} AS vec_id, embedding FROM '{PARQ}'
        UNION ALL
        SELECT vec_id + {SHIFT + NEARDUP_OFFSET},
               list_transform(embedding,
                              v -> v * {NEARDUP_SCALE} + {NEARDUP_SHIFT})
        FROM '{PARQ}' WHERE vec_id < {NEARDUP_N}
    """
    con = duckdb.connect()
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        SM.duckdb_semantic_dedup_two_level_sql(
            shifted_sql, sub_k=sub_k, seed_by_hash=True,
            k=k_coarse)).fetchall()}
    assert got == want
    grouped = sum(
        1 for i in range(NEARDUP_N)
        if got[SHIFT + i + NEARDUP_OFFSET][0] == SHIFT + i)
    assert grouped >= NEARDUP_N // 2, f"only {grouped} pairs grouped"
