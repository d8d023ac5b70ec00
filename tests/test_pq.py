"""Product quantization (operators/pq.py): exact DuckDB parity for the
full train→encode→ADC→rerank pipeline, recall floor of the
shortlist-rerank deployment path, and compression accounting."""

import duckdb

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import pq as PQ

SF_DIR = "/root/testdata/sf0.001"
PARQ = f"{SF_DIR}/embeddings.parquet"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(PARQ).select("vec_id", "embedding")


def test_rerank_matches_duckdb_oracle(emb):
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in PQ.pq_rerank_topk(emb, F.col("vec_id") < 5,
                                   F.col("vec_id") >= 5).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT vec_id, embedding "
                f"FROM '{PARQ}'")
    want = sorted(tuple(r) for r in con.execute(
        PQ.duckdb_pq_rerank_sql(DIM)).fetchall())
    assert got == want and len(got) == 15


def test_explicit_dim_matches_inferred_and_empty_input_raises(emb, spark):
    """dim= threads through the whole stack without the one-row
    inference job, producing identical results; an empty corpus raises
    a descriptive error instead of TypeError on a None subscript."""
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in PQ.pq_rerank_topk(emb, F.col("vec_id") < 5,
                                   F.col("vec_id") >= 5, dim=DIM).collect())
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in PQ.pq_rerank_topk(emb, F.col("vec_id") < 5,
                                   F.col("vec_id") >= 5).collect())
    assert got == want
    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        PQ.train_pq_codebooks(empty)


def test_rerank_recall_floor(emb, spark):
    """The shortlist-rerank path must hold recall@3 >= 0.8 vs the exact
    baseline while scoring the corpus only in the compressed domain."""
    from ocr_documents_spark.queries import QUERIES
    bf = {(r["query_id"], r["neighbor_id"])
          for r in QUERIES["q21_knn_bruteforce"](spark, SF_DIR).collect()}
    pq = {(r["query_id"], r["neighbor_id"])
          for r in PQ.pq_rerank_topk(emb, F.col("vec_id") < 5,
                                     F.col("vec_id") >= 5).collect()}
    assert len(bf & pq) / len(bf) >= 0.8


def test_codes_are_4bit_and_cover_corpus(emb):
    cb = PQ.train_pq_codebooks(emb)
    codes = PQ.encode_pq(emb.filter(F.col("vec_id") >= 5), cb)
    n_cands = emb.filter(F.col("vec_id") >= 5).count()
    assert codes.count() == n_cands * PQ.M_SUBS  # one code per subspace
    rng = codes.agg(F.min("code"), F.max("code")).first()
    assert 0 <= rng[0] and rng[1] < PQ.K_CODES   # 4-bit code space
    # compression: m small ints per vector vs dim floats
    assert PQ.M_SUBS * 1 < DIM * 4               # 4 bytes vs 256


def test_adc_never_touches_raw_candidate_vectors(emb):
    """Plan shape: the ADC aggregation consumes (sub, code) pairs joined
    to the broadcast distance table — the candidate EMBEDDING column
    must be gone before the per-(query, vec) aggregate (only codes
    shuffle corpus-wide)."""
    cb = PQ.train_pq_codebooks(emb)
    adc = PQ.pq_adc_scores(emb, F.col("vec_id") < 5,
                           F.col("vec_id") >= 5, codebooks=cb)
    agg_plan = adc._jdf.queryExecution().optimizedPlan().toString()
    # the final aggregate's grouping/output carries no embedding column
    first_agg = next(l for l in agg_plan.splitlines() if "Aggregate" in l)
    assert "embedding" not in first_agg and "qv" not in first_agg


def test_strong_neighbors_found_at_rank1_with_tiny_shortlist(spark, emb):
    """The regime a real corpus lives in: engineered cos~0.9997 pairs
    (the q24 recipe) must surface at rank 1 through PQ with a SMALL
    shortlist — quantization error is tiny next to a true near-dup's
    margin, so the compressed domain cannot lose it."""
    from ocr_documents_spark.queries import (NEARDUP_N, NEARDUP_OFFSET,
                                             NEARDUP_SCALE, NEARDUP_SHIFT)
    eng = (emb.filter(F.col("vec_id") < NEARDUP_N)
           .select((F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"),
                   F.transform("embedding",
                               lambda v: v * NEARDUP_SCALE + NEARDUP_SHIFT)
                   .alias("embedding")))
    uni = emb.unionByName(eng)
    top = {r["query_id"]: r["neighbor_id"]
           for r in PQ.pq_rerank_topk(
               uni,
               query_filter=F.col("vec_id") >= NEARDUP_OFFSET,
               candidate_filter=F.col("vec_id") < NEARDUP_OFFSET,
               k=1, shortlist=10).collect()}
    assert top == {i + NEARDUP_OFFSET: i for i in range(NEARDUP_N)}


def test_ivfpq_composition(spark, emb):
    """IVF-PQ end to end: the composed index must (a) return exactly k
    ranked rows per query with valid candidates, (b) find every
    engineered strong neighbor at rank 1 (the structure-exists regime),
    and (c) agree with plain PQ rerank when probing ALL cells (nprobe =
    k_cells makes the coarse stage a no-op filter)."""
    from ocr_documents_spark.operators.ivf import K_CELLS
    from ocr_documents_spark.queries import (NEARDUP_N, NEARDUP_OFFSET,
                                             NEARDUP_SCALE, NEARDUP_SHIFT)
    eng = (emb.filter(F.col("vec_id") < NEARDUP_N)
           .select((F.col("vec_id") + NEARDUP_OFFSET).alias("vec_id"),
                   F.transform("embedding",
                               lambda v: v * NEARDUP_SCALE + NEARDUP_SHIFT)
                   .alias("embedding")))
    uni = emb.unionByName(eng)
    qf = F.col("vec_id") >= NEARDUP_OFFSET
    cf = F.col("vec_id") < NEARDUP_OFFSET

    # (c) full probe == plain PQ rerank, row for row
    full = sorted(tuple(r) for r in PQ.ivfpq_topk(
        uni, qf, cf, nprobe=K_CELLS, shortlist=10).collect())
    plain = sorted(tuple(r) for r in PQ.pq_rerank_topk(
        uni, qf, cf, shortlist=10).collect())
    assert full == plain

    # (a)+(b) partial probe still finds every strong neighbor at rank 1
    got = PQ.ivfpq_topk(uni, qf, cf, nprobe=5, shortlist=10).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    found = sum(1 for i in range(NEARDUP_N)
                if top1.get(i + NEARDUP_OFFSET) == i)
    # a strong pair can only be missed if query and source straddle a
    # cell boundary AND the probe skips the source's cell — rare at
    # nprobe=5 of 8
    assert found >= NEARDUP_N - 2, top1


def test_update_ivfpq_index_equals_reencode(spark, emb):
    """Diff-driven index maintenance: applying a corpus snapshot diff to
    a built index must equal re-encoding the NEW candidate set from
    scratch under the SAME quantizers, and only the diff docs need to be
    supplied — the unchanged corpus is provably not re-hashed.  The
    perturbation keeps the array element type float so unchanged rows
    fingerprint identically on both snapshots."""
    from ocr_documents_spark.operators.ivf import _as_double, _nearest_cell
    from ocr_documents_spark.operators.snapshot_diff import snapshot_diff

    cf = F.col("vec_id") >= 5
    index = PQ.build_ivfpq_index(emb, cf, dim=DIM)

    new = (emb.filter(F.col("vec_id") % 13 != 0)
           .withColumn("embedding",
                       F.when(F.col("vec_id") % 7 == 0,
                              F.transform(
                                  "embedding",
                                  lambda v: (v * 1.5).cast("float")))
                       .otherwise(F.col("embedding"))))
    fresh_rows = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    new = new.unionByName(fresh_rows)

    old_c, new_c = emb.filter(cf), new.filter(cf)
    diff = snapshot_diff(PQ.embedding_payload(old_c),
                         PQ.embedding_payload(new_c),
                         id_col="vec_id", text_col="payload")
    by_status = {r["status"]: r["n"] for r in
                 diff.groupBy("status").agg(F.count("*").alias("n"))
                 .collect()}
    assert by_status.get("added", 0) == 3
    assert by_status.get("removed", 0) > 0
    assert by_status.get("changed", 0) > 0
    assert by_status.get("unchanged", 0) > 0   # the O(diff) claim is real

    updated = PQ.update_ivfpq_index(index, diff, new_c)

    # ground truth: full re-encode of the new candidates, same quantizers
    cells = (_nearest_cell(_as_double(new_c), index.coarse)
             .select("vec_id", "cell"))
    want = sorted(
        tuple(r) for r in
        PQ.encode_pq(new_c, index.codebooks, index.m, dim=DIM)
        .join(cells, "vec_id").select("vec_id", "cell", "sub", "code")
        .collect())
    key = lambda df: sorted(  # noqa: E731
        tuple(r) for r in
        df.select("vec_id", "cell", "sub", "code").collect())
    assert key(updated.codes) == want
    assert sorted(r["vec_id"] for r in
                  updated.vectors.select("vec_id").collect()) \
        == sorted(r["vec_id"] for r in new_c.select("vec_id").collect())

    # supplying ONLY the diff docs gives the same index
    todo_only = new_c.join(
        diff.filter(F.col("status").isin("added", "changed"))
        .select("vec_id"), "vec_id", "left_semi")
    assert key(PQ.update_ivfpq_index(index, diff, todo_only).codes) == want

    # a diff over the RAW snapshots (including non-candidate ids that
    # changed) must produce the same index: the stored candidate_filter
    # re-applies, so query-side vectors never pollute the codes table
    # (r4 review finding)
    raw_diff = snapshot_diff(PQ.embedding_payload(emb),
                             PQ.embedding_payload(new),
                             id_col="vec_id", text_col="payload")
    updated_raw = PQ.update_ivfpq_index(index, raw_diff, new)
    assert key(updated_raw.codes) == want
    assert updated_raw.vectors.filter(~cf).count() == 0

    # the maintained index answers queries (k ranked rows per query)
    got = PQ.ivfpq_query(updated, emb.filter(F.col("vec_id") < 5),
                         shortlist=10).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per_q.values())


def test_index_build_query_split_and_persistence(spark, emb, tmp_path):
    """The production deployment: build_ivfpq_index once, query many
    times — results must equal the one-shot ivfpq_topk exactly; a
    save/load roundtrip through the lake layout (codes partitioned by
    coarse cell, raw vectors NOT copied) must answer identically; and
    the loaded-index query plan must read the persisted codes parquet
    rather than replaying training."""
    qf, cf = F.col("vec_id") < 5, F.col("vec_id") >= 5
    oneshot = sorted(tuple(r) for r in PQ.ivfpq_topk(
        emb, qf, cf, shortlist=10).collect())

    index = PQ.build_ivfpq_index(emb, cf, dim=DIM)
    queries = emb.filter(qf)
    built = sorted(tuple(r) for r in PQ.ivfpq_query(
        index, queries, shortlist=10).collect())
    assert built == oneshot

    path = str(tmp_path / "ivfpq")
    PQ.save_ivfpq_index(index, path)
    loaded = PQ.load_ivfpq_index(spark, path, emb.filter(cf), dim=DIM)
    reloaded_df = PQ.ivfpq_query(loaded, queries, shortlist=10)
    assert sorted(tuple(r) for r in reloaded_df.collect()) == oneshot

    plan = reloaded_df._jdf.queryExecution().executedPlan().toString()
    # the persisted codes table is a parquet scan (its column signature:
    # vec_id + sub + code + partition column cell) — paths are elided in
    # the plan string, so match the scan by shape
    assert any("FileScan parquet" in ln and "sub#" in ln and "code#" in ln
               and "cell#" in ln for ln in plan.splitlines())
    # training's per-dim recompute (posexplode) must be absent: the
    # loaded index never re-trains
    assert "posexplode" not in plan.lower()
