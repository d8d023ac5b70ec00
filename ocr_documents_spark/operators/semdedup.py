"""Semantic deduplication over an embedding corpus (SemDeDup, Abbas et
al. 2023: cluster embeddings, then drop within-cluster pairs whose
cosine exceeds a threshold).

Composition of operators this engine already trains and tests:

1. the IVF coarse quantizer (operators/ivf.py) clusters the corpus —
   Lloyd's on the deterministic md5 hash-sample, broadcast codebook,
   cell assignment = the shuffle key of everything downstream;
2. candidate pairs come from a SELF-JOIN ON THE CELL — never all-pairs:
   the k/corpus ratio bounds each cell, and k is chosen so a cell fits
   a task (the paper uses corpus_size/avg_cluster_size clusters for the
   same reason).  Cosine is computed only inside cells;
3. pairs >= threshold feed the dedup module's connected components
   (min-label propagation, type-independent fixpoint, telemetry), and
   every vector gets (group_id, group_size, is_canonical) — the same
   keep/drop contract as text near-dup dedup_groups.

Note the semantic difference from MinHash dedup: two texts with zero
lexical overlap but near-identical embeddings (translations,
paraphrases, re-renders) group HERE and nowhere else.

The DuckDB oracle unrolls the identical k-means iterations (ivf's
builders), joins on the assigned cell, and resolves groups with a
recursive transitive closure — exact value parity, tested with
engineered near-duplicate vectors (the raw corpus' max off-diagonal
cosine ~0.5 keeps real pairs out at the default threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .dedup import connected_components
from .ivf import (AVG_CELL_SIZE, ITERS, K_CELLS, SUB_ITERS,
                  TRAIN_SAMPLE_MOD, _as_double, _duck_assign,
                  _duck_recompute, _nearest_cell, assign_two_level,
                  duckdb_two_level_assign_ctes, sub_k_for, train_centroids,
                  train_two_level, INIT_IDS)

COS_THRESHOLD = 0.95


def semantic_pair_candidates(emb: DataFrame,
                             threshold: float = COS_THRESHOLD,
                             iters: int = ITERS,
                             sample_mod: int = TRAIN_SAMPLE_MOD,
                             centroids: DataFrame | None = None
                             ) -> DataFrame:
    """-> (a_doc_id, b_doc_id) semantic-dup pairs: cosine >= threshold
    computed WITHIN each trained cluster cell only (the self-join's sole
    key is the cell — never all-pairs).  ``centroids`` reuses an
    already-trained codebook (e.g. the one the ANN index trained) instead
    of running Lloyd's again."""
    from ..functions.fanout import fan_out
    e = fan_out(_as_double(emb), "vec_id")
    cent = (centroids if centroids is not None
            else train_centroids(emb, iters=iters, sample_mod=sample_mod))
    return _pairs_within(_nearest_cell(e, cent), ["cell"], threshold)


def _pairs_within(assigned: DataFrame, keys: list[str],
                  threshold: float) -> DataFrame:
    """Self-join on the cell key(s): -> (a_doc_id, b_doc_id) with
    rounded cosine >= threshold.  Shared by the flat (keys=[cell]) and
    two-level (keys=[cell, sub]) paths.

    Two measured optimizations that cannot move a value:

    * each vector's norm is computed ONCE before pairing and the pair
      cosine is dot/(na*nb) — the identical expressions (same fold
      order, same product), evaluated n times instead of once per pair,
      so ~2/3 of the per-pair flops disappear;
    * the pair join BROADCASTS one side and streams the other at scan
      parallelism: the flat path's join key is k<=8 distinct cells, so
      a shuffled join serializes the O(n^2/k) cosine work onto k reduce
      tasks — the exact regime the flat operator is documented for
      (small corpus / the two-level variant owns corpus growth), which
      is also what keeps the broadcast side inside the budget.
    """
    from ..functions.vectors import norm
    # checkpoint: the assignment DAG (training included) would otherwise
    # re-execute once per self-join side
    sized = (assigned
             .withColumn("__n", norm(F.col("embedding")))
             .localCheckpoint())
    a = sized.select(*keys, F.col("vec_id").alias("a_doc_id"),
                     F.col("embedding").alias("av"),
                     F.col("__n").alias("na"))
    b = sized.select(*keys, F.col("vec_id").alias("b_doc_id"),
                     F.col("embedding").alias("bv"),
                     F.col("__n").alias("nb"))
    from ..functions.vectors import dot
    return (a.join(F.broadcast(b), keys)
            .filter(F.col("a_doc_id") < F.col("b_doc_id"))
            .withColumn("cos",
                        F.round(dot(F.col("av"), F.col("bv"))
                                / (F.col("na") * F.col("nb")), 4) + 0.0)
            .filter(F.col("cos") >= threshold)
            .select("a_doc_id", "b_doc_id"))


def _groups_from_pairs(emb: DataFrame, pairs: DataFrame,
                       cc_telemetry: dict | None = None) -> DataFrame:
    """Connected components over the pair edges -> the keep/drop
    contract (vec_id, group_id, group_size, is_canonical)."""
    comp = connected_components(pairs, telemetry=cc_telemetry)
    labeled = (emb.select("vec_id")
               .join(comp.withColumnRenamed("doc_id", "vec_id"),
                     "vec_id", "left")
               .withColumn("group_id", F.coalesce("component", "vec_id"))
               .drop("component"))
    w = Window.partitionBy("group_id")
    return (labeled
            .withColumn("group_size", F.count(F.lit(1)).over(w))
            .withColumn("is_canonical", F.col("vec_id") == F.col("group_id"))
            .select("vec_id", "group_id", "group_size", "is_canonical"))


def semantic_dedup_groups(emb: DataFrame,
                          threshold: float = COS_THRESHOLD,
                          iters: int = ITERS,
                          sample_mod: int = TRAIN_SAMPLE_MOD,
                          cc_telemetry: dict | None = None,
                          centroids: DataFrame | None = None) -> DataFrame:
    """-> (vec_id, group_id, group_size, is_canonical) over ALL vectors.

    group_id = min vec_id of the connected semantic-dup component;
    singletons are their own group.  Cosines are rounded to 4 decimals
    before the threshold so both engines make identical keep decisions.
    """
    pairs = semantic_pair_candidates(emb, threshold, iters, sample_mod,
                                     centroids=centroids)
    return _groups_from_pairs(emb, pairs, cc_telemetry)


def semantic_dedup_groups_two_level(emb: DataFrame,
                                    sub_k: int | None = None,
                                    threshold: float = COS_THRESHOLD,
                                    iters: int = ITERS,
                                    sub_iters: int = SUB_ITERS,
                                    sample_mod: int = TRAIN_SAMPLE_MOD,
                                    avg_cell_size: int = AVG_CELL_SIZE,
                                    seed_by_hash: bool = False,
                                    cc_telemetry: dict | None = None,
                                    codebooks: (tuple[DataFrame, DataFrame]
                                                | None) = None) -> DataFrame:
    """The corpus-growth-safe SemDeDup: same contract as
    :func:`semantic_dedup_groups`, but candidate pairs come from a
    self-join on the TWO-LEVEL fine cell (coarse route + keyed per-cell
    refinement, operators/ivf.py), and when ``sub_k`` is not given it
    is derived from the corpus size so expected cell occupancy stays
    ~``avg_cell_size`` as the corpus grows (the SemDeDup paper's
    n/avg_cluster_size rule).  Within-cell pair work is then O(n ·
    avg_cell_size) corpus-wide instead of the fixed-k O(n²/k).
    Pass ``seed_by_hash=True`` for corpora whose id space does not
    contain the fixture INIT_IDS (e.g. arbitrary production ids) —
    seeds are then the k smallest md5(vec_id) vectors, so the codebook
    can never silently shrink to fewer cells.  ``codebooks=(cent,
    sub_cent)`` reuses a trained pair (the encode-daily/retrain-on-
    drift serving split — assignment + pairing + components are the
    recurring cost, Lloyd's is not)."""
    if codebooks is not None:
        cent, sub_cent = codebooks
    else:
        # coarse k follows occupancy too on the hash-seeded path: a tiny
        # corpus must not get one cell per document (k ~= n makes every
        # near-dup pair straddle a boundary and the dedup no-ops)
        k_coarse = K_CELLS
        if sub_k is None or seed_by_hash:
            n = emb.count()
            if seed_by_hash:
                k_coarse = max(1, min(K_CELLS,
                                      -(-n // avg_cell_size)))  # ceil div
            if sub_k is None:
                sub_k = sub_k_for(n, k_coarse, avg_cell_size)
        cent, sub_cent = train_two_level(emb, sub_k, iters=iters,
                                         sub_iters=sub_iters,
                                         sample_mod=sample_mod,
                                         seed_by_hash=seed_by_hash,
                                         k=k_coarse)
    assigned = assign_two_level(emb, cent, sub_cent)
    pairs = _pairs_within(assigned, ["cell", "sub"], threshold)
    return _groups_from_pairs(emb, pairs, cc_telemetry)


_CC_TAIL = """pairs AS (
            SELECT a.vec_id AS s, b.vec_id AS d
            FROM assigned a JOIN assigned b ON {join_cond}
             AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.embedding, b.embedding)
                        / (sqrt(list_dot_product(a.embedding, a.embedding))
                           * sqrt(list_dot_product(b.embedding, b.embedding))),
                        4) + 0.0 >= {threshold}
        ),
        und AS (
            SELECT s, d FROM pairs UNION SELECT d, s FROM pairs
        ),
        reach AS (
            SELECT s, d FROM und
            UNION
            SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s
        ),
        comp AS (
            SELECT s AS vec_id, least(s, min(d)) AS group_id
            FROM reach GROUP BY s
        ),
        labeled AS (
            SELECT ee.vec_id, coalesce(c.group_id, ee.vec_id) AS group_id
            FROM (SELECT vec_id FROM e) ee
            LEFT JOIN comp c USING (vec_id)
        )"""

_GROUPS_SELECT = """
        SELECT vec_id, group_id,
               count(*) OVER (PARTITION BY group_id) AS group_size,
               (vec_id = group_id) AS is_canonical
        FROM labeled
    """


def duckdb_semantic_dedup_two_level_sql(input_sql: str, sub_k: int,
                                        threshold: float = COS_THRESHOLD,
                                        iters: int = ITERS,
                                        sub_iters: int = SUB_ITERS,
                                        sample_mod: int = TRAIN_SAMPLE_MOD,
                                        seed_by_hash: bool = False,
                                        k: int = K_CELLS) -> str:
    """Exact SQL twin of :func:`semantic_dedup_groups_two_level` (with
    an explicit ``sub_k``): the full two-level training + assignment
    unrolled via ivf's builders, pairs joined on the fine (cell, sub)
    key, groups via recursive transitive closure."""
    parts = [f"""e AS (
            SELECT vec_id,
                   list_transform(embedding, v -> CAST(v AS DOUBLE))
                       AS embedding
            FROM ({input_sql})
        )"""]
    parts.extend(duckdb_two_level_assign_ctes(
        sub_k, iters=iters, sub_iters=sub_iters, sample_mod=sample_mod,
        seed_by_hash=seed_by_hash, k=k))
    parts.append(_CC_TAIL.format(
        join_cond="a.cell = b.cell AND a.sub = b.sub",
        threshold=threshold))
    body = ",\n        ".join(parts)
    return f"WITH RECURSIVE {body}{_GROUPS_SELECT}"


def duckdb_semantic_dedup_sql(input_sql: str,
                              threshold: float = COS_THRESHOLD,
                              iters: int = ITERS,
                              sample_mod: int = TRAIN_SAMPLE_MOD,
                              init_ids: list[int] = None) -> str:
    """Exact SQL twin.  ``input_sql`` must select (vec_id, embedding) —
    the corpus, possibly augmented with engineered near-dups in tests."""
    init_ids = INIT_IDS if init_ids is None else init_ids
    seed_values = ", ".join(f"({v}, {i})" for i, v in enumerate(init_ids))
    train_src = ("e" if sample_mod <= 1 else f"""(
            SELECT vec_id, embedding FROM e
            WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT
                  % {sample_mod} = 0)""")
    parts = [f"""e AS (
            SELECT vec_id,
                   list_transform(embedding, v -> CAST(v AS DOUBLE))
                       AS embedding
            FROM ({input_sql})
        ),
        c0 AS (
            SELECT m.cell, e.embedding AS cvec
            FROM e JOIN (VALUES {seed_values}) m(vid, cell)
              ON e.vec_id = m.vid
        )"""]
    for i in range(iters):
        parts.append(_duck_assign(train_src, f"c{i}", f"a{i}"))
        parts.append(_duck_recompute(f"a{i}", f"c{i + 1}"))
    parts.append(_duck_assign("e", f"c{iters}", "assigned"))
    parts.append(f"""pairs AS (
            SELECT a.vec_id AS s, b.vec_id AS d
            FROM assigned a JOIN assigned b ON a.cell = b.cell
             AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.embedding, b.embedding)
                        / (sqrt(list_dot_product(a.embedding, a.embedding))
                           * sqrt(list_dot_product(b.embedding, b.embedding))),
                        4) + 0.0 >= {threshold}
        ),
        und AS (
            SELECT s, d FROM pairs UNION SELECT d, s FROM pairs
        ),
        reach AS (
            SELECT s, d FROM und
            UNION
            SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s
        ),
        comp AS (
            SELECT s AS vec_id, least(s, min(d)) AS group_id
            FROM reach GROUP BY s
        ),
        labeled AS (
            SELECT ee.vec_id, coalesce(c.group_id, ee.vec_id) AS group_id
            FROM (SELECT vec_id FROM e) ee
            LEFT JOIN comp c USING (vec_id)
        )""")
    body = ",\n        ".join(parts)
    return f"""
        WITH RECURSIVE {body}
        SELECT vec_id, group_id,
               count(*) OVER (PARTITION BY group_id) AS group_size,
               (vec_id = group_id) AS is_canonical
        FROM labeled
    """
