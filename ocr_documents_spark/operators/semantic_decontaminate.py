"""Semantic (embedding-space) benchmark decontamination.

n-gram decontamination (operators/decontaminate.py, GPT-3 appendix C /
PaLM-style) catches VERBATIM eval overlap; a paraphrased, translated,
re-rendered or OCR-re-run eval item shares no k-word window with its
source yet still leaks the answer.  The embedding-space complement
(the published pipelines' "semantic contamination" pass — same cosine
rule SemDeDup applies within the corpus, pointed at the eval suite)
drops a training document when its embedding cosine vs ANY evaluation
embedding reaches ``threshold`` (rounded to 4 decimals on both engines
before the comparison, the house cross-engine rule).

Relational shape — the eval side is ALWAYS the small one:

* ``mode="broadcast"`` (default): eval suites are thousands of rows —
  broadcast the eval vectors and score the corpus in a
  BroadcastNestedLoopJoin at scan speed (the q21 brute-force-kNN plan);
  the corpus never shuffles, so the operator is a map stage at 100 TB.
* ``mode="cells"``: a consolidated eval REGISTRY too big to broadcast —
  route both sides through the trained IVF coarse quantizer
  (operators/ivf.py): the corpus takes its single nearest cell (one
  broadcast of the k-row codebook), the eval side replicates to its
  top-``nprobe`` nearest cells (the IVF probe pattern), and the scoring
  join is keyed on the cell, so pair work is
  O(|corpus| · |eval| · nprobe / k) instead of O(|corpus| · |eval|).
  At ``nprobe=k`` (full probe) the drop set equals brute force EXACTLY
  (tested); at ``nprobe<k`` misses are bounded the same way every IVF
  probe bounds them — a near-threshold pair whose members route to
  un-probed cells is skipped, the known IVF recall trade.

Both modes have exact DuckDB twins
(tests/test_semantic_decontaminate.py); there is no reference analogue
(the reference has no embedding surface — this extends the
decontamination family the training-data brief asks for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .ivf import (ITERS, K_CELLS, NPROBE, TRAIN_SAMPLE_MOD, _D2,
                  _as_double, _dist2, _duck_assign, _duck_recompute,
                  _nearest_cell, train_centroids, INIT_IDS)

COS_THRESHOLD = 0.95


def _eval_vectors(eval_emb: DataFrame, eval_id_col: str,
                  emb_col: str) -> DataFrame:
    return _as_double(
        eval_emb.select(F.col(eval_id_col).alias("vec_id"),
                        F.col(emb_col).alias("embedding"))) \
        .select(F.col("vec_id").alias("eval_id"),
                F.col("embedding").alias("ev"))


def _rounded_cos(a, b):
    return F.round(cosine(a, b), 4) + F.lit(0.0)


def _scored_hits(e, ev, threshold):
    """corpus e × broadcast eval ev -> (vec_id, cos) rows >= threshold.

    The corpus fans out (a one-split scan would serialize |corpus| x
    |eval| cosines onto one core) and both sides carry their norm
    computed ONCE — the pair expression is dot/(na*nb), the identical
    fold and product ``cosine`` evaluates, so values cannot move while
    ~2/3 of the per-pair flops disappear."""
    from ..functions.fanout import fan_out
    from ..functions.vectors import dot, norm
    e = (fan_out(e, "vec_id")
         .withColumn("__n", norm(F.col("embedding"))))
    ev = ev.withColumn("__ne", norm(F.col("ev")))
    cos = (F.round(dot(F.col("embedding"), F.col("ev"))
                   / (F.col("__n") * F.col("__ne")), 4) + F.lit(0.0))
    return (e.crossJoin(F.broadcast(ev))
            .withColumn("cos", cos)
            .filter(F.col("cos") >= threshold))


def semantic_hit_ids(corpus_emb: DataFrame, eval_emb: DataFrame,
                     threshold: float = COS_THRESHOLD,
                     id_col: str = "vec_id",
                     emb_col: str = "embedding",
                     eval_id_col: str = "vec_id") -> DataFrame:
    """-> (id_col) of CONTAMINATED corpus rows (duplicates possible —
    one row per (doc, eval) hit), broadcast shape.  The cheapest drop
    key: an anti-join consumer needs neither the per-doc aggregate
    :func:`semantic_contamination_report` pays nor DISTINCT — use the
    report only when the audit columns are actually read."""
    e = _as_double(corpus_emb.select(F.col(id_col).alias("vec_id"),
                                     F.col(emb_col).alias("embedding")))
    ev = _eval_vectors(eval_emb, eval_id_col, emb_col)
    return (_scored_hits(e, ev, threshold)
            .select(F.col("vec_id").alias(id_col)))


def semantic_contamination_report(corpus_emb: DataFrame,
                                  eval_emb: DataFrame,
                                  threshold: float = COS_THRESHOLD,
                                  id_col: str = "vec_id",
                                  emb_col: str = "embedding",
                                  eval_id_col: str = "vec_id"
                                  ) -> DataFrame:
    """-> (vec_id, n_eval_hits, max_cos) for CONTAMINATED corpus rows
    only — the audit artifact (which eval items a doc leaks, how
    closely).  Broadcast shape: the corpus never shuffles until the
    per-doc aggregate, whose input is hits only (contaminated docs are
    a small corpus fraction by hygiene assumption)."""
    e = _as_double(corpus_emb.select(F.col(id_col).alias("vec_id"),
                                     F.col(emb_col).alias("embedding")))
    ev = _eval_vectors(eval_emb, eval_id_col, emb_col)
    return (_scored_hits(e, ev, threshold)
            .groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("n_eval_hits"),
                 (F.max("cos") + F.lit(0.0)).alias("max_cos"))
            .select(F.col("vec_id").alias(id_col),
                    "n_eval_hits", "max_cos"))


def semantic_decontaminate(corpus: DataFrame, eval_emb: DataFrame,
                           threshold: float = COS_THRESHOLD,
                           mode: str = "broadcast",
                           nprobe: int = NPROBE,
                           iters: int = ITERS,
                           sample_mod: int = TRAIN_SAMPLE_MOD,
                           centroids: DataFrame | None = None,
                           seed_by_hash: bool = False,
                           k: int = K_CELLS,
                           init_ids: list[int] | None = None,
                           id_col: str = "vec_id",
                           emb_col: str = "embedding",
                           eval_id_col: str = "vec_id") -> DataFrame:
    """The clean corpus: every input column, minus rows whose embedding
    cosine vs any eval embedding >= ``threshold``.

    ``centroids`` (cells mode) reuses an already-trained codebook —
    e.g. the one the ANN index or SemDeDup trained — instead of running
    Lloyd's again; ``seed_by_hash=True`` (cells mode, self-training)
    derives the Lloyd's seeds from the data — REQUIRED for corpora whose
    id space does not contain the fixture ``init_ids``, where absolute-id
    seeding would silently shrink (or empty) the codebook and the
    operator would silently under-drop; the contaminated-id anti-join is
    left to the planner/AQE in both modes (the hit set is corpus-derived
    and unbounded, the same reasoning as decontaminate())."""
    if mode == "broadcast":
        return corpus.join(
            semantic_hit_ids(corpus, eval_emb, threshold, id_col,
                             emb_col, eval_id_col),
            id_col, "left_anti")
    e = _as_double(corpus.select(F.col(id_col).alias("vec_id"),
                                 F.col(emb_col).alias("embedding")))
    ev = _eval_vectors(eval_emb, eval_id_col, emb_col)
    if mode == "cells":
        cent = (centroids if centroids is not None
                else train_centroids(
                    e, init_ids=init_ids, iters=iters,
                    sample_mod=sample_mod,
                    seed_by_hash=seed_by_hash, k=k))
        assigned = _nearest_cell(e, cent)
        wq = Window.partitionBy("eval_id").orderBy(F.asc("d2"),
                                                   F.asc("cell"))
        probes = (ev.crossJoin(F.broadcast(cent))
                  .withColumn("d2", _dist2(F.col("ev"), F.col("cvec")))
                  .withColumn("r", F.row_number().over(wq))
                  .filter(F.col("r") <= nprobe)
                  .select("eval_id", "ev", "cell"))
        scored = assigned.join(probes, "cell")
    else:
        raise ValueError(f"unknown semantic_decontaminate mode: {mode!r}")
    contaminated = (scored
                    .withColumn("cos", _rounded_cos(F.col("embedding"),
                                                    F.col("ev")))
                    .filter(F.col("cos") >= threshold)
                    .select(F.col("vec_id").alias(id_col)))
    return corpus.join(contaminated, id_col, "left_anti")


# ---------------------------------------------------------------------------
# DuckDB oracles (same math, string SQL)
# ---------------------------------------------------------------------------

_DUCK_COS = ("round(list_dot_product({a}, {b}) "
             "/ (sqrt(list_dot_product({a}, {a})) "
             "* sqrt(list_dot_product({b}, {b}))), 4) + 0.0")


def duckdb_semantic_kept_sql(corpus_sql: str, eval_sql: str,
                             threshold: float = COS_THRESHOLD) -> str:
    """Brute-force twin of :func:`semantic_decontaminate`
    (mode="broadcast"): the KEPT vec_ids.  ``corpus_sql`` / ``eval_sql``
    select (vec_id, embedding) each."""
    cos = _DUCK_COS.format(a="e.embedding", b="v.embedding")
    return f"""
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS embedding
            FROM ({corpus_sql})
        ), v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS embedding
            FROM ({eval_sql})
        )
        SELECT e.vec_id FROM e
        WHERE NOT EXISTS (
            SELECT 1 FROM v WHERE {cos} >= {threshold})
    """


def duckdb_semantic_report_sql(corpus_sql: str, eval_sql: str,
                               threshold: float = COS_THRESHOLD) -> str:
    """Twin of :func:`semantic_contamination_report`:
    (vec_id, n_eval_hits, max_cos) for contaminated rows only."""
    cos = _DUCK_COS.format(a="e.embedding", b="v.embedding")
    return f"""
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS embedding
            FROM ({corpus_sql})
        ), v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS embedding
            FROM ({eval_sql})
        ), hits AS (
            SELECT e.vec_id, {cos} AS cos
            FROM e CROSS JOIN v
            WHERE {cos} >= {threshold}
        )
        SELECT vec_id, count(*) AS n_eval_hits,
               max(cos) + 0.0 AS max_cos
        FROM hits GROUP BY vec_id
    """


def duckdb_semantic_kept_cells_sql(corpus_sql: str, eval_sql: str,
                                   threshold: float = COS_THRESHOLD,
                                   nprobe: int = NPROBE,
                                   iters: int = ITERS,
                                   sample_mod: int = TRAIN_SAMPLE_MOD,
                                   init_ids: list[int] = None,
                                   seed_by_hash: bool = False,
                                   k: int = K_CELLS) -> str:
    """Exact twin of mode="cells": the identical Lloyd's unroll
    (ivf's builders, incl. the ``seed_by_hash`` data-derived seeding),
    corpus assigned to its nearest cell, eval replicated to its
    top-``nprobe`` cells, scoring joined on the cell."""
    init_ids = INIT_IDS if init_ids is None else init_ids
    seed_values = ", ".join(f"({v}, {i})" for i, v in enumerate(init_ids))
    train_src = ("e" if sample_mod <= 1 else f"""(
            SELECT vec_id, embedding FROM e
            WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT
                  % {sample_mod} = 0)""")
    if seed_by_hash:
        c0 = f"""c0 AS (
            SELECT rn - 1 AS cell, embedding AS cvec FROM (
                SELECT embedding,
                       row_number() OVER (
                           ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC,
                                    vec_id ASC) AS rn
                FROM e)
            WHERE rn <= {k}
        )"""
    else:
        c0 = f"""c0 AS (
            SELECT m.cell, e.embedding AS cvec
            FROM e JOIN (VALUES {seed_values}) m(vid, cell)
              ON e.vec_id = m.vid
        )"""
    parts = [f"""e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS embedding
            FROM ({corpus_sql})
        ), v AS (
            SELECT vec_id AS eval_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS ev
            FROM ({eval_sql})
        ),
        {c0}"""]
    for i in range(iters):
        parts.append(_duck_assign(train_src, f"c{i}", f"a{i}"))
        parts.append(_duck_recompute(f"a{i}", f"c{i + 1}"))
    cf = f"c{iters}"
    parts.append(_duck_assign("e", cf, "assigned"))
    d2q = _D2.format(v="q.ev", c="c.cvec")
    cos = _DUCK_COS.format(a="a.embedding", b="p.ev")
    parts.append(f"""probes AS (
            SELECT eval_id, ev, cell FROM (
                SELECT q.eval_id, q.ev, c.cell,
                       row_number() OVER (PARTITION BY q.eval_id
                                          ORDER BY {d2q} ASC, c.cell ASC)
                           AS r
                FROM v q CROSS JOIN {cf} c)
            WHERE r <= {nprobe}
        ),
        hits AS (
            SELECT a.vec_id
            FROM assigned a JOIN probes p ON a.cell = p.cell
            WHERE {cos} >= {threshold}
        )""")
    body = ",\n        ".join(parts)
    return f"""
        WITH {body}
        SELECT vec_id FROM e
        WHERE vec_id NOT IN (SELECT vec_id FROM hits)
    """
