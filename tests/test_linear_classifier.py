"""In-engine trained linear quality classifier
(operators/linear_classifier.py): the ENTIRE integer-GD training
trajectory is bit-identical to the unrolled DuckDB twin (weights and
scores), the learned filter separates an engineered wiki-vs-spam
corpus on held-out docs, loss strictly decreases over iterations, the
hash-sample trains on exactly the sampled subset, and the Arrow scoring
path answers identically to the relational one with a zero-Exchange
plan."""

import random

import duckdb
import pandas as pd
import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import linear_classifier as LC

FILLER = [f"word{i}" for i in range(30)]
WIKI = ["citation", "reference", "encyclopedia", "bibliography"]
SPAM = ["casino", "winner", "jackpot", "clickbait"]
N_TRAIN, N_HELD = 300, 100


def _corpus():
    rng = random.Random(7)
    rows = []
    for i in range(N_TRAIN + N_HELD):
        label = i % 2
        markers = rng.sample(WIKI if label else SPAM, 3)
        words = rng.choices(FILLER, k=12) + markers
        rng.shuffle(words)
        rows.append((i, " ".join(words), label))
    # bias-only edge cases, scored but never trained on
    rows.append((N_TRAIN + N_HELD, None, 0))
    rows.append((N_TRAIN + N_HELD + 1, "", 1))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(_corpus(),
                               "doc_id long, text string, label int")
    return (df.filter(F.col("doc_id") < N_TRAIN).localCheckpoint(),
            df.filter(F.col("doc_id") >= N_TRAIN).localCheckpoint())


@pytest.fixture(scope="module")
def duck():
    rows = _corpus()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    con = duckdb.connect()
    con.register("train_docs", pdf[pdf.doc_id < N_TRAIN])
    con.register("held_docs", pdf[pdf.doc_id >= N_TRAIN])
    return con


def test_trained_weights_bit_identical_to_duckdb(corpus, duck):
    train, _ = corpus
    w = LC.train_linear_classifier(train)
    got = sorted((r["bucket"], r["w"]) for r in w.collect())
    want = sorted(tuple(r) for r in duck.execute(
        LC.duckdb_train_sql("train_docs", n_train=N_TRAIN)).fetchall())
    assert got == want
    assert any(wt != 0 for _, wt in got)      # it actually learned


def test_scores_bit_identical_across_engines_and_paths(corpus, duck):
    train, held = corpus
    w = LC.train_linear_classifier(train).localCheckpoint()
    join_scores = {r["doc_id"]: r["quality_p"] for r in
                   LC.score_docs(held, w).collect()}
    want = dict(duck.execute(LC.duckdb_score_sql(
        "train_docs", "held_docs", n_train=N_TRAIN)).fetchall())
    assert join_scores == want
    arrow_scores = {r["doc_id"]: r["quality_p"] for r in
                    LC.score_docs(held, w, mode="arrow").collect()}
    assert arrow_scores == want
    # bias-only docs (NULL / empty text) score identically everywhere
    assert N_TRAIN + N_HELD in join_scores
    assert join_scores[N_TRAIN + N_HELD] \
        == join_scores[N_TRAIN + N_HELD + 1]


def test_heldout_separation_and_loss_decreases(corpus):
    train, held = corpus
    w = LC.train_linear_classifier(train).localCheckpoint()
    scored = LC.score_docs(held.filter(F.col("doc_id")
                                       < N_TRAIN + N_HELD), w)
    right = scored.filter(
        ((F.col("quality_p") > 500_000) & (F.col("label") == 1))
        | ((F.col("quality_p") <= 500_000) & (F.col("label") == 0))
    ).count()
    assert right / N_HELD >= 0.95

    def loss(iters):
        wi = LC.train_linear_classifier(train, iters=iters)
        rows = LC.score_docs(train, wi).collect()
        return sum(abs(r["quality_p"] - r["label"] * LC.MICRO)
                   for r in rows)
    l1, l4, l8 = loss(1), loss(4), loss(8)
    assert l8 < l4 < l1

    # the curation stage keeps exactly the high scorers
    kept = LC.quality_filter(held, w).select("doc_id").collect()
    high = {r["doc_id"] for r in scored
            .filter(F.col("quality_p") > 500_000).collect()}
    assert {r["doc_id"] for r in kept} == high


def test_hash_sample_trains_on_exactly_the_subset(corpus, spark):
    train, _ = corpus
    sampled = LC.train_linear_classifier(train, sample_mod=2)
    subset = train.filter(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                           1, 8), 16, 10).cast("long") % 2 == 0)
    explicit = LC.train_linear_classifier(subset, sample_mod=1)
    assert sorted(map(tuple, sampled.collect())) \
        == sorted(map(tuple, explicit.collect()))


def test_arrow_scoring_plan_is_shuffle_free(corpus):
    train, held = corpus
    w = LC.train_linear_classifier(train, iters=1)
    plan = LC.score_docs(held, w, mode="arrow") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_training_is_partitioning_and_order_invariant(corpus):
    """The exactness design pays off operationally: integer gradient
    sums are order-independent, so the trained weights are IDENTICAL
    under any partitioning or row order — a float implementation would
    drift in the last ulp and break rerun reproducibility."""
    train, _ = corpus
    w0 = sorted(map(tuple,
                    LC.train_linear_classifier(train, iters=3).collect()))
    w1 = sorted(map(tuple, LC.train_linear_classifier(
        train.repartition(29), iters=3).collect()))
    w2 = sorted(map(tuple, LC.train_linear_classifier(
        train.orderBy(F.desc("doc_id")), iters=3).collect()))
    assert w0 == w1 == w2
