"""Product quantization (PQ): compressed-domain ANN scoring.

The second half of the classic IVF-PQ recipe (Jégou et al., TPAMI 2011
— operators/ivf.py implements the coarse-quantizer half): split each
vector into ``m`` subvectors, k-means a tiny codebook per subspace, and
store each vector as ``m`` small codes.  At 64 dims with 4 subspaces of
16 codes, a stored vector is 4 bytes instead of 256 — the 64×
compression that lets a 10^12-vector index live in executor memory.

Queries score candidates WITHOUT decompressing (asymmetric distance
computation, ADC): per query, a distance table to every sub-centroid
(m×k rows — broadcast-sized), and a candidate's approximate distance is
the sum of m table lookups keyed by its codes.  The deployment pattern
is shortlist-then-rerank: ADC ranks a shortlist cheaply, exact cosine
re-ranks the shortlist only (:func:`pq_rerank_topk`) — the corpus-wide
work touches codes, never raw vectors.

Engine shape:

* training runs ONE grouped Lloyd's over all m subspaces at once (as
  DataFrames on the deterministic md5 hash-sample, rounded centroids);
* encode = m broadcast nearest-centroid assignments, one row per vector
  with its m codes (the compressed index table);
* ADC = unpivot codes to (vec_id, sub, code), broadcast-join the
  per-query distance tables on (sub, code), sum per (query, vec) —
  joins and aggregations only, no per-row Python;
* every ordering input is rounded on both engines; the DuckDB twin
  unrolls the same training and scores the same tables.

Recall readout (the honest numbers, tests/test_pq.py): this synthetic
corpus has NEAR-RANDOM similarity structure (max off-diagonal cosine
~0.5 — the same property that forces ivf's nprobe=5/8), which is the
worst case for any fixed-rate compressor: measured rerank recall@3 vs
exact is 0.87 at sf0.001 with shortlist=100, degrading with corpus size
at fixed shortlist (0.73 @ sf0.01, 0.40-0.67 @ sf0.1 even at a 10%
shortlist) because quantization error is commensurate with the
inter-point distances themselves.  When actual neighbor structure
exists — the engineered cos~0.9997 pairs — PQ finds every true
neighbor at rank 1 with a tiny shortlist (tested), which is the regime
a real embedding corpus lives in.  Production pairs this with the ivf
coarse quantizer (IVF-PQ) so the shortlist is per-cell, not global.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .ivf import TRAIN_SAMPLE_MOD, _as_double, _dist2

M_SUBS = 4          # subspaces (64-dim corpus -> 16 dims each)
K_CODES = 16        # centroids per subspace (4-bit codes)
PQ_ITERS = 2
# deterministic, SF-independent seed vector ids per subspace codebook
# (stride-31 keeps them inside every tier's id range)
PQ_INIT_IDS = [5 + 31 * i for i in range(K_CODES)]
SHORTLIST = 100     # ADC shortlist size the exact rerank touches


def _sub_emb(emb: DataFrame, s: int, width: int) -> DataFrame:
    """(vec_id, embedding[s*width : (s+1)*width]) — 1-based slice."""
    return emb.select(
        "vec_id", F.slice("embedding", s * width + 1, width)
        .alias("embedding"))


def _stacked_subs(e: DataFrame, m: int, width: int) -> DataFrame:
    """ONE projection -> (vec_id, sub, embedding): every subspace slice
    of every vector, m rows per vector from a single scan (the per-
    subspace loop this replaces ran m full training pipelines)."""
    return e.select(
        "vec_id",
        F.posexplode(F.array(*[
            F.slice("embedding", s * width + 1, width)
            for s in range(m)])).alias("sub", "embedding"))


def _nearest_code(stacked: DataFrame, cb: DataFrame,
                  keep: list[str]) -> DataFrame:
    """stacked(..., sub, embedding) × cb(sub, code, cvec) -> ``keep``
    columns + code of the nearest sub-centroid.  The per-subspace
    codebook is pre-aggregated to one row per sub and the argmin is an
    in-row ``array_min`` over struct(d2, code) — struct ordering IS the
    previous row_number window's (d2 ASC, code ASC) tie-break with the
    same rounded ``_dist2``, so assignments are value-identical while
    the k× row blowup and the per-(vec_id, sub) window shuffle
    disappear (the operators/ivf.py rewrite, applied per subspace)."""
    sub_rows = cb.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("code", "cvec")))
        .alias("__cbs"))
    best = F.array_min(F.transform(
        F.col("__cbs"),
        lambda c: F.struct(
            _dist2(F.col("embedding"), c["cvec"]).alias("d2"),
            c["code"].alias("code"))))
    return (stacked.join(F.broadcast(sub_rows), "sub")
            .select(*keep, best["code"].alias("code")))


def train_pq_codebooks(emb: DataFrame, m: int = M_SUBS,
                       iters: int = PQ_ITERS,
                       sample_mod: int = TRAIN_SAMPLE_MOD,
                       dim: int | None = None) -> DataFrame:
    """-> (sub, code, cvec): m independent sub-codebooks, trained as
    ONE grouped Lloyd's pipeline over the stacked (vec_id, sub,
    sub-vector) table — assignment folds the per-subspace codebook
    in-row (:func:`_nearest_code`), recompute groups by (sub, code);
    iteration count and every rounding rule match the ivf trainer
    exactly, so the per-subspace DuckDB twin is unchanged.  Pass
    ``dim`` when known (callers of the DuckDB twin already know it) to
    skip the one-row inference job."""
    from .ivf import _train_sample_filter
    from ..functions.fanout import fan_out
    e = _as_double(emb)
    width = _dim(emb, dim) // m
    stacked = _stacked_subs(e, m, width)
    seed_map = emb.sparkSession.createDataFrame(
        [(int(v), i) for i, v in enumerate(PQ_INIT_IDS)],
        "vec_id long, code int")
    cent = (stacked.join(F.broadcast(seed_map), "vec_id")
            .select("sub", "code", F.col("embedding").alias("cvec")))
    train = fan_out(
        stacked.filter(_train_sample_filter(sample_mod))
        if sample_mod > 1 else stacked, "vec_id").localCheckpoint()
    for _ in range(iters):
        assigned = _nearest_code(train, cent,
                                 keep=["sub", "embedding"]) \
            .select("sub", "code", "embedding")
        cent = (assigned
                .select("sub", "code",
                        F.posexplode("embedding").alias("dim", "x"))
                .groupBy("sub", "code", "dim")
                .agg((F.round(F.avg("x"), 4) + F.lit(0.0)).alias("m"))
                .groupBy("sub", "code")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                     .alias("s"))
                .select("sub", "code",
                        F.transform("s", lambda t: t["m"]).alias("cvec"))
                ).localCheckpoint()
    return cent


def _dim(emb: DataFrame, dim: int | None = None) -> int:
    """Embedding width: the explicit parameter when the caller knows it
    (no Spark job), else inferred from ONE row — each public entry
    point resolves this once and threads it through its internal calls
    (the r3 ADVICE flagged one ivfpq_topk call triggering several
    redundant corpus actions)."""
    if dim is not None:
        return dim
    row = emb.select("embedding").first()
    if row is None or row["embedding"] is None:
        raise ValueError(
            "cannot infer the embedding dimension from an empty "
            "embeddings DataFrame — pass dim= explicitly")
    return len(row["embedding"])


def encode_pq(emb: DataFrame, codebooks: DataFrame,
              m: int = M_SUBS, dim: int | None = None) -> DataFrame:
    """-> (vec_id, sub, code): the compressed index in long form (the
    storage layout a lake table would use, partitioned however the
    coarse quantizer dictates).  Nearest sub-centroid by rounded squared
    L2 with code tie-break — same rule as the ivf assignment."""
    from ..functions.fanout import fan_out
    e = fan_out(_as_double(emb), "vec_id")
    width = _dim(emb, dim) // m
    stacked = _stacked_subs(e, m, width)
    return _nearest_code(stacked, codebooks, keep=["vec_id", "sub"])


def pq_adc_scores(emb: DataFrame, query_filter, candidate_filter,
                  m: int = M_SUBS, iters: int = PQ_ITERS,
                  sample_mod: int = TRAIN_SAMPLE_MOD,
                  codebooks: DataFrame | None = None,
                  dim: int | None = None) -> DataFrame:
    """-> (query_id, vec_id, adc_d2): compressed-domain distances of
    every candidate to every query — sum over subspaces of the rounded
    (query-subvector, assigned-code-centroid) squared L2."""
    dim = _dim(emb, dim)
    cb = (codebooks if codebooks is not None
          else train_pq_codebooks(emb, m, iters, sample_mod, dim=dim))
    codes = encode_pq(emb.filter(candidate_filter), cb, m, dim=dim)
    e = _as_double(emb)
    width = dim // m
    q_subs = reduce(lambda a, b: a.unionByName(b), [
        _sub_emb(e.filter(query_filter), s, width)
        .select(F.col("vec_id").alias("query_id"),
                F.lit(s).alias("sub"), F.col("embedding").alias("qv"))
        for s in range(m)])
    # the per-query distance TABLE: m*k rows per query, broadcast-sized
    dtab = (q_subs.join(F.broadcast(cb), "sub")
            .select("query_id", "sub", "code",
                    _dist2(F.col("qv"), F.col("cvec")).alias("d2")))
    # dtab is queries x m x k rows — broadcast so the codes table
    # streams at scan parallelism instead of shuffling on 64 keys
    return (codes.join(F.broadcast(dtab), ["sub", "code"])
            .groupBy("query_id", "vec_id")
            .agg((F.round(F.sum("d2"), 4) + 0.0).alias("adc_d2")))


def pq_rerank_topk(emb: DataFrame, query_filter, candidate_filter,
                   k: int = 3, shortlist: int = SHORTLIST,
                   m: int = M_SUBS, iters: int = PQ_ITERS,
                   sample_mod: int = TRAIN_SAMPLE_MOD,
                   dim: int | None = None) -> DataFrame:
    """The deployment path: ADC shortlist per query (compressed-domain,
    corpus-wide), exact cosine re-rank of the shortlist only ->
    (query_id, neighbor_id, cos, rank).  Raw vectors are touched for
    shortlist*queries rows, not the corpus."""
    adc = pq_adc_scores(emb, query_filter, candidate_filter,
                        m, iters, sample_mod, dim=_dim(emb, dim))
    w_sl = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"),
                                                  F.asc("vec_id"))
    short = (adc.withColumn("r", F.row_number().over(w_sl))
             .filter(F.col("r") <= shortlist)
             .select("query_id", "vec_id"))
    e = _as_double(emb)
    qv = e.filter(query_filter).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    cv = e.filter(candidate_filter).select(
        F.col("vec_id"), F.col("embedding").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("vec_id"))
    # the shortlist (queries x shortlist rows) broadcasts; the raw-vector
    # table is then streamed, never shuffled by vec_id
    short = F.broadcast(short)
    qv = F.broadcast(qv)
    return (short.join(qv, "query_id").join(cv, "vec_id")
            .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4)
                        + 0.0)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "cos", "rank"))


# ---------------------------------------------------------------------------
# DuckDB oracle (same math: per-subspace Lloyd's unrolled, ADC, rerank)
# ---------------------------------------------------------------------------

def duckdb_pq_rerank_sql(dim: int, query_pred: str = "vec_id < 5",
                         cand_pred: str = "vec_id >= 5",
                         k: int = 3, shortlist: int = SHORTLIST,
                         m: int = M_SUBS, iters: int = PQ_ITERS,
                         sample_mod: int = TRAIN_SAMPLE_MOD) -> str:
    """Exact twin over an ``embeddings(vec_id, embedding)`` view ->
    (query_id, neighbor_id, cos, rank)."""
    from .ivf import _duck_assign, _duck_recompute
    width = dim // m
    seed_values = ", ".join(
        f"({v}, {i})" for i, v in enumerate(PQ_INIT_IDS))
    parts = [f"""e AS (
            SELECT vec_id,
                   list_transform(embedding, v -> CAST(v AS DOUBLE))
                       AS embedding
            FROM embeddings
        )"""]
    enc_unions, dtab_unions = [], []
    for s in range(m):
        lo, hi = s * width + 1, (s + 1) * width
        parts.append(f"""es{s} AS (
            SELECT vec_id, embedding[{lo}:{hi}] AS embedding FROM e
        ),
        c{s}_0 AS (
            SELECT mm.cell, x.embedding AS cvec
            FROM es{s} x JOIN (VALUES {seed_values}) mm(vid, cell)
              ON x.vec_id = mm.vid
        )""")
        train_src = (f"es{s}" if sample_mod <= 1 else f"""(
            SELECT vec_id, embedding FROM es{s}
            WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT
                  % {sample_mod} = 0)""")
        for i in range(iters):
            parts.append(_duck_assign(train_src, f"c{s}_{i}", f"a{s}_{i}"))
            parts.append(_duck_recompute(f"a{s}_{i}", f"c{s}_{i + 1}"))
        parts.append(_duck_assign(
            f"(SELECT vec_id, embedding FROM es{s} WHERE {cand_pred})",
            f"c{s}_{iters}", f"enc{s}"))
        enc_unions.append(
            f"SELECT vec_id, {s} AS sub, cell AS code FROM enc{s}")
        from .ivf import _D2
        d2 = _D2.format(v="q.embedding", c="c.cvec")
        dtab_unions.append(f"""
            SELECT q.vec_id AS query_id, {s} AS sub, c.cell AS code,
                   {d2} AS d2
            FROM (SELECT vec_id, embedding FROM es{s}
                  WHERE {query_pred}) q
            CROSS JOIN c{s}_{iters} c""")
    parts.append("codes AS (" + " UNION ALL ".join(enc_unions) + ")")
    parts.append("dtab AS (" + " UNION ALL ".join(dtab_unions) + ")")
    parts.append(f"""adc AS (
            SELECT d.query_id, c.vec_id,
                   round(sum(d.d2), 4) + 0.0 AS adc_d2
            FROM codes c JOIN dtab d USING (sub, code)
            GROUP BY 1, 2
        ),
        short AS (
            SELECT query_id, vec_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_d2 ASC, vec_id ASC) AS r
                FROM adc) WHERE r <= {shortlist}
        ),
        rer AS (
            SELECT s.query_id, s.vec_id AS neighbor_id,
                   round(list_dot_product(q.embedding, x.embedding)
                         / (sqrt(list_dot_product(q.embedding, q.embedding))
                            * sqrt(list_dot_product(x.embedding,
                                                    x.embedding))), 4)
                       + 0.0 AS cos
            FROM short s
            JOIN e q ON q.vec_id = s.query_id
            JOIN e x ON x.vec_id = s.vec_id
        )""")
    body = ",\n        ".join(parts)
    return f"""
        WITH {body}
        SELECT query_id, neighbor_id, cos, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM rer)
        WHERE rank <= {k}
    """


@dataclass
class IvfPqIndex:
    """The built IVF-PQ index: two trained codebooks plus the encoded
    corpus.  ``codes`` is the lake-shaped storage table — one row per
    (vector, subspace) with the coarse cell as the partition key —
    and ``vectors`` is the raw-embedding store the exact rerank joins
    against (in production: the embeddings lake table itself, never a
    copy)."""
    coarse: DataFrame     # (cell, cvec) — broadcast-sized
    codebooks: DataFrame  # (sub, code, cvec) — broadcast-sized
    codes: DataFrame      # (vec_id, cell, sub, code)
    vectors: DataFrame    # (vec_id, embedding) raw candidates
    dim: int
    m: int
    # the build-time candidate predicate, re-applied by
    # update_ivfpq_index so a diff over the RAW corpus snapshots cannot
    # pollute a filtered index with non-candidate vectors
    candidate_filter: object | None = None


def build_ivfpq_index(emb: DataFrame, candidate_filter=None,
                      m: int = M_SUBS, iters: int = PQ_ITERS,
                      sample_mod: int = TRAIN_SAMPLE_MOD,
                      dim: int | None = None,
                      checkpoint: bool = True) -> IvfPqIndex:
    """Train both quantizers and encode the corpus ONCE — the
    build-time half of IVF-PQ.  ``checkpoint`` materializes the codes
    table so every subsequent query reads it instead of replaying
    training (a persisted deployment uses :func:`save_ivfpq_index`)."""
    from concurrent.futures import ThreadPoolExecutor

    from .ivf import _nearest_cell, train_centroids as train_coarse
    from ..functions.fanout import fan_out
    dim = _dim(emb, dim)
    e = _as_double(emb)
    # the two quantizer trainings are INDEPENDENT job chains (each runs
    # its own Lloyd's actions via localCheckpoint) — submit them from a
    # small thread pool so the second back-fills executors the first's
    # stage tails leave idle (guide §2.6); wall ~= max, not sum
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_coarse = pool.submit(train_coarse, emb, sample_mod=sample_mod)
        f_cb = pool.submit(train_pq_codebooks, emb, m, iters, sample_mod,
                           dim)
        coarse, cb = f_coarse.result(), f_cb.result()
    cands = (e.filter(candidate_filter)
             if candidate_filter is not None else e)
    # ONE encode pass: coarse cell assignment rides the same rows into
    # the per-subspace code fold, so the former codes-join-cells shuffle
    # on vec_id is gone (values identical — same folds, same inputs)
    width = dim // m
    with_cell = _nearest_cell(fan_out(cands, "vec_id"), coarse)
    stacked = with_cell.select(
        "vec_id", "cell",
        F.posexplode(F.array(*[
            F.slice("embedding", s * width + 1, width)
            for s in range(m)])).alias("sub", "embedding"))
    codes = _nearest_code(stacked, cb, keep=["vec_id", "cell", "sub"]) \
        .select("vec_id", "cell", "sub", "code")
    if checkpoint:
        codes = codes.localCheckpoint()
    return IvfPqIndex(coarse, cb, codes, cands, dim, m, candidate_filter)


def embedding_payload(emb: DataFrame) -> DataFrame:
    """(vec_id, payload) for ``snapshot_diff(id_col='vec_id',
    text_col='payload')`` — the array's string rendering is a
    deterministic content fingerprint input."""
    return emb.select("vec_id",
                      F.col("embedding").cast("string").alias("payload"))


def update_ivfpq_index(index: IvfPqIndex, diff: DataFrame,
                       new_emb: DataFrame) -> IvfPqIndex:
    """Maintain a built index under a corpus snapshot diff
    (operators/snapshot_diff with ``id_col='vec_id'``): removed +
    changed ids vacate their code and raw-vector rows; added + changed
    embeddings are assigned and encoded with the EXISTING quantizers —
    so update cost is O(diff), never O(corpus), and (tested) the codes
    equal a full re-encode of the new corpus under the same codebooks.

    Codebooks are deliberately NOT retrained here: that is the standard
    IVF-PQ deployment split (encode daily, retrain on drift) — when the
    corpus distribution moves, rebuild with ``build_ivfpq_index`` and
    atomically swap the saved index.

    The diff may be computed over the RAW corpus snapshots: the index's
    build-time ``candidate_filter`` is re-applied to the fresh side, so
    added/changed vectors outside the candidate set never enter the
    codes or vectors tables (they can still VACATE rows — a candidate
    whose new version fails the filter is correctly removed).
    """
    from .ivf import _nearest_cell
    stale = (diff.filter(F.col("status").isin("removed", "changed"))
             .select("vec_id"))
    todo = (diff.filter(F.col("status").isin("added", "changed"))
            .select("vec_id"))
    new_c = (new_emb if index.candidate_filter is None
             else new_emb.filter(index.candidate_filter))
    fresh = _as_double(new_c.join(todo, "vec_id", "left_semi"))
    fresh_cells = _nearest_cell(fresh, index.coarse).select("vec_id", "cell")
    fresh_codes = (encode_pq(fresh, index.codebooks, index.m,
                             dim=index.dim)
                   .join(fresh_cells, "vec_id")
                   .select("vec_id", "cell", "sub", "code"))
    codes = (index.codes.join(stale, "vec_id", "left_anti")
             .unionByName(fresh_codes))
    vectors = (index.vectors.join(stale, "vec_id", "left_anti")
               .unionByName(fresh.select(*index.vectors.columns)))
    return IvfPqIndex(index.coarse, index.codebooks, codes, vectors,
                      index.dim, index.m, index.candidate_filter)


def save_ivfpq_index(index: IvfPqIndex, path: str) -> None:
    """Persist the index tables; ``codes`` is partitioned by the coarse
    cell so a probe scans only nprobe/k_cells of the 4-byte-per-vector
    table (partition pruning on the probe join).  Raw vectors are NOT
    copied — they stay in the embeddings lake table and are passed back
    at :func:`load_ivfpq_index` time."""
    index.coarse.write.mode("overwrite").parquet(f"{path}/coarse")
    index.codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
    (index.codes.write.mode("overwrite").partitionBy("cell")
     .parquet(f"{path}/codes"))


def load_ivfpq_index(spark, path: str, vectors: DataFrame,
                     dim: int, m: int = M_SUBS) -> IvfPqIndex:
    """Reopen a saved index over the lake's raw-vector table."""
    return IvfPqIndex(
        coarse=spark.read.parquet(f"{path}/coarse"),
        codebooks=spark.read.parquet(f"{path}/codebooks"),
        codes=spark.read.parquet(f"{path}/codes"),
        vectors=_as_double(vectors), dim=dim, m=m)


def ivfpq_query(index: IvfPqIndex, queries: DataFrame, k: int = 3,
                nprobe: int | None = None,
                shortlist: int = SHORTLIST) -> DataFrame:
    """The query-time half: route each query to its ``nprobe`` nearest
    coarse cells, ADC-score only those cells' codes, exact-rerank the
    shortlist -> (query_id, neighbor_id, cos, rank).  Touches the codes
    table for nprobe/k_cells of its rows and raw vectors for
    ``shortlist`` rows per query — training never reruns."""
    from .ivf import NPROBE
    nprobe = NPROBE if nprobe is None else nprobe
    qe = _as_double(queries)
    q = qe.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qfull"))
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (q.crossJoin(F.broadcast(index.coarse))
              .withColumn("d2", _dist2(F.col("qfull"), F.col("cvec")))
              .withColumn("r", F.row_number().over(wq))
              .filter(F.col("r") <= nprobe)
              .select("query_id", "cell"))

    # ADC over probed cells only
    width = index.dim // index.m
    q_subs = reduce(lambda a, b: a.unionByName(b), [
        _sub_emb(qe, s, width)
        .select(F.col("vec_id").alias("query_id"),
                F.lit(s).alias("sub"), F.col("embedding").alias("qv"))
        for s in range(index.m)])
    dtab = (q_subs.join(F.broadcast(index.codebooks), "sub")
            .select("query_id", "sub", "code",
                    _dist2(F.col("qv"), F.col("cvec")).alias("d2")))
    # probe table and per-query distance table are query-sized —
    # broadcast both so the codes table streams at scan parallelism
    probed_codes = index.codes.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id", "sub", "code")
    adc = (probed_codes.join(F.broadcast(dtab),
                             ["query_id", "sub", "code"])
           .groupBy("query_id", "vec_id")
           .agg((F.round(F.sum("d2"), 4) + 0.0).alias("adc_d2")))

    w_sl = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"),
                                                  F.asc("vec_id"))
    short = (adc.withColumn("r", F.row_number().over(w_sl))
             .filter(F.col("r") <= shortlist)
             .select("query_id", "vec_id"))
    cv = index.vectors.select("vec_id", F.col("embedding").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("vec_id"))
    # shortlist broadcasts; raw vectors stream, never shuffled by vec_id
    short = F.broadcast(short)
    return (short.join(F.broadcast(q), "query_id").join(cv, "vec_id")
            .withColumn("cos",
                        F.round(cosine(F.col("qfull"), F.col("cv")), 4)
                        + 0.0)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "cos", "rank"))


def ivfpq_topk(emb: DataFrame, query_filter, candidate_filter,
               k: int = 3, nprobe: int | None = None,
               shortlist: int = SHORTLIST,
               m: int = M_SUBS, iters: int = PQ_ITERS,
               sample_mod: int = TRAIN_SAMPLE_MOD,
               dim: int | None = None) -> DataFrame:
    """IVF-PQ end-to-end (build + query in one call) — the one-shot
    convenience over :func:`build_ivfpq_index` / :func:`ivfpq_query`.

    Cost shape at 10^12 vectors: the stored index is (cell, m codes)
    per vector — cell is the partition key, codes are 4 bytes — so a
    query reads nprobe/k_cells of a 4-byte-per-vector table and touches
    raw vectors only for ``shortlist`` rows.  Composes the two trained
    quantizers this module family already oracle-checks; the composed
    semantics are property-tested (tests/test_pq.py) rather than
    SQL-twinned — both constituent pipelines carry exact oracles.
    """
    index = build_ivfpq_index(emb, candidate_filter, m, iters,
                              sample_mod, dim=dim, checkpoint=False)
    return ivfpq_query(index, _as_double(emb).filter(query_filter),
                       k, nprobe, shortlist)
