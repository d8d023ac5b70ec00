"""In-engine trained linear quality classifier (the fastText-style
web-quality filter: CCNet/GPT-3/LLaMA-era pipelines train a tiny linear
model on "wiki-like" seed positives vs random crawl negatives and keep
the corpus slice that scores high — Joulin et al. EACL'17 for the model
family, Wenzek et al. LREC'20 / Brown et al. NeurIPS'20 §A for the
filtering recipe).

The reference app classifies documents with hand rules + TF-IDF
(extractors/classify.py, queries.py q48); THIS operator closes the gap
for corpus curation at 100 TB: the filter itself is trained INSIDE the
engine, on hashed bag-of-words features, with batch gradient descent
expressed as joins + aggregations — no MLlib, no driver-side matrices,
nothing corpus-sized ever leaves the executors.

Exactness is the design center (the house oracle discipline).  Training
runs in INTEGER MICRO-UNITS end to end, so every aggregate is an exact
integer sum — order-independent, hence bit-identical between Spark and
DuckDB, hence the whole training trajectory (not just the final model)
is value-checked against the unrolled SQL twin:

* features: presence of hashed word buckets (md5 8-hex → bucket, the
  feature-hashing trick — collisions are part of the model), plus a
  bias bucket -1; computed JVM-side with array HOFs, deduped per doc
  BEFORE the explode (array_distinct — no distinct shuffle);
* link: the piecewise-linear sigmoid p = clamp(1/2 + z/4, 0, 1) — in
  micro-units p = clamp(500000 + floor(z/4.0), 0, 1e6); floor on an
  exact double is engine-identical (integer DIV is NOT: Spark
  truncates, DuckDB floors — documented trap);
* update: w -= floor(lr·grad/n) with lr a POWER OF TWO, so lr·grad is
  an exact double product and the single division is correctly rounded
  — deterministic everywhere;
* every per-iteration table: grad joins the previous weights (both
  bucket-count-bounded, broadcast), new weights localCheckpoint — the
  standard iterative-trainer lineage cut (ivf.py pattern).

Per-iteration cost: one scan of the (sampled) feature table — join the
broadcast ≤d-row weight table, two integer aggregations.  Production
trains on the md5 hash-sample (``sample_mod``, ivf.py convention) and
scores the full corpus once: scoring is the same join + sum, or the
zero-shuffle Arrow path (:func:`score_docs` ``mode="arrow"``) with the
weight vector broadcast as a numpy array, bloom.py-style.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import ws_words_col

D_BUCKETS = 4096      # hashed feature space (power of 2 by convention)
ITERS = 8
LR = 1.0              # MUST stay a power of two (exact double product)
MICRO = 1_000_000
BIAS = -1             # the bias feature's bucket id


def bucket_of(word: Column, d: int = D_BUCKETS) -> Column:
    """word -> feature bucket in [0, d): first 8 md5 hex digits mod d
    (32-bit base — collisions are the feature-hashing trick, identical
    on both engines)."""
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10) \
        .cast("long") % d


def featurize(docs: DataFrame, d: int = D_BUCKETS,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """-> (doc_id, bucket) PRESENCE rows: per-doc distinct word buckets
    plus the bias bucket.  Dedup happens JVM-side (array_distinct) so
    the explode emits exactly the per-doc feature count — no distinct
    shuffle, no corpus-width exchange before aggregation."""
    from ..functions.fanout import fan_out
    buckets = F.array_distinct(F.transform(
        ws_words_col(F.coalesce(F.col(text_col), F.lit(""))),
        lambda w: bucket_of(w, d)))
    # the split + per-word md5 bucketing run map-side before any
    # exchange — fan out a one-split scan (no-op on a well-split lake)
    return (fan_out(docs, id_col)
            .select(id_col,
                    F.explode(F.concat(
                        F.array(F.lit(BIAS).cast("long")), buckets))
                    .alias("bucket")))


def _scores(feats: DataFrame, weights: DataFrame,
            id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, p) in micro-units for every doc in feats."""
    z = (feats.join(F.broadcast(weights), "bucket", "left")
         .groupBy(id_col)
         .agg(F.sum(F.coalesce("w", F.lit(0))).alias("z")))
    p = F.least(F.greatest(F.lit(500_000)
                           + F.floor(F.col("z") / 4.0).cast("long"),
                           F.lit(0)), F.lit(MICRO))
    return z.select(id_col, p.alias("p"))


def train_linear_classifier(docs: DataFrame, label_col: str = "label",
                            d: int = D_BUCKETS, iters: int = ITERS,
                            lr: float = LR, sample_mod: int = 1,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """-> (bucket, w) integer micro-unit weights.  ``label_col`` must be
    0/1 on ``docs``.  ``sample_mod`` > 1 trains on the deterministic md5
    hash-sample of docs (ivf.py convention) — the full corpus is only
    touched by the one scoring pass the caller runs afterwards."""
    if lr <= 0 or (lr != 2 ** round(np.log2(lr))):
        raise ValueError(f"lr must be a power of two for exact "
                         f"cross-engine arithmetic, got {lr}")
    from .dedup import md5_u32
    train = docs
    if sample_mod > 1:
        train = docs.filter(md5_u32(F.col(id_col)) % sample_mod == 0)
    train = train.select(id_col, text_col,
                         (F.col(label_col) * MICRO).cast("long")
                         .alias("y"))
    n = train.count()          # one control-plane action, threaded through
    if n == 0:
        raise ValueError("no training docs after sampling")
    feats = featurize(train, d, id_col, text_col).localCheckpoint()
    labels = train.select(id_col, "y").localCheckpoint()

    spark = docs.sparkSession
    weights = spark.createDataFrame([], "bucket long, w long")
    for _ in range(iters):
        err = (_scores(feats, weights, id_col)
               .join(labels, id_col)
               .select(id_col, (F.col("p") - F.col("y")).alias("err")))
        grad = (feats.join(err, id_col)
                .groupBy("bucket")
                .agg(F.sum("err").alias("g")))
        weights = (grad.join(weights, "bucket", "left")
                   .select("bucket",
                           (F.coalesce("w", F.lit(0))
                            - F.floor(F.lit(lr) * F.col("g") / F.lit(n))
                            .cast("long")).alias("w"))
                   ).localCheckpoint()
    return weights


def score_docs(docs: DataFrame, weights: DataFrame, d: int = D_BUCKETS,
               id_col: str = "doc_id", text_col: str = "text",
               mode: str = "join") -> DataFrame:
    """Append ``quality_p`` (micro-units, 0..1e6) to every row.

    ``mode="join"`` — the relational path (broadcast weights, one
    doc_id-keyed aggregation), value-twinned in SQL.
    ``mode="arrow"`` — zero shuffle: the dense weight vector broadcasts
    as a numpy array and a vectorized Arrow UDF sums w[buckets] per row
    (exact integer sums — verdicts identical to the join path, tested).
    """
    if mode == "join":
        p = _scores(featurize(docs, d, id_col, text_col), weights,
                    id_col)
        return docs.join(p.withColumnRenamed("p", "quality_p"), id_col)

    dense = np.zeros(d + 1, dtype=np.int64)   # slot d holds the bias
    for r in weights.collect():
        dense[d if r["bucket"] == BIAS else r["bucket"]] = r["w"]
    bc = docs.sparkSession.sparkContext.broadcast(dense)

    @F.pandas_udf("long")
    def scorer(bucket_lists: pd.Series) -> pd.Series:
        w = bc.value
        bias = w[len(w) - 1]
        n = len(bucket_lists)
        lens = np.fromiter((len(b) for b in bucket_lists), dtype=np.int64,
                           count=n)
        z = np.full(n, bias, dtype=np.int64)
        if lens.sum():
            flat = np.concatenate(
                [np.asarray(b, dtype=np.int64) for b in bucket_lists])
            # bincount sums in float64 — exact here (|w| < 2^23 micro,
            # row sums < 2^53) — then back to the integer domain
            z += np.bincount(np.repeat(np.arange(n), lens),
                             weights=w[flat].astype(np.float64),
                             minlength=n).astype(np.int64)
        p = np.clip(500_000 + np.floor(z / 4.0).astype(np.int64),
                    0, MICRO)
        return pd.Series(p)

    buckets = F.array_distinct(F.transform(
        ws_words_col(F.coalesce(F.col(text_col), F.lit(""))),
        lambda w: bucket_of(w, d)))
    return (docs.withColumn("__b", buckets)
            .withColumn("quality_p", scorer(F.col("__b")))
            .drop("__b"))


def quality_filter(docs: DataFrame, weights: DataFrame,
                   threshold_micro: int = 500_000,
                   d: int = D_BUCKETS, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """The curation stage: keep docs scoring above the threshold."""
    return (score_docs(docs, weights, d, id_col, text_col)
            .filter(F.col("quality_p") > threshold_micro))


# ---------------------------------------------------------------------------
# DuckDB oracle: the full training trajectory unrolled, then scoring
# ---------------------------------------------------------------------------

def _duck_feats(source: str, d: int, id_col: str, text_col: str) -> str:
    return f"""(
        SELECT {id_col} AS doc_id, {BIAS}::BIGINT AS bucket FROM {source}
        UNION
        SELECT DISTINCT {id_col} AS doc_id,
               ('0x' || substr(md5(word), 1, 8))::BIGINT % {d} AS bucket
        FROM (SELECT {id_col},
                     unnest(list_filter(
                         regexp_split_to_array({text_col}, '\\s+'),
                         x -> x <> '')) AS word
              FROM {source})
    )"""


def duckdb_train_ctes(source: str = "documents",
                      label_expr: str = "label",
                      d: int = D_BUCKETS, iters: int = ITERS,
                      lr: float = LR, n_train: int | None = None,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """CTE chain ending in ``w{iters}(bucket, w)`` — the exact training
    twin.  ``n_train`` must be the training-doc count (the same number
    Spark threads through); pass it from ``len`` of the same source."""
    assert n_train is not None and n_train > 0
    parts = [f"feats AS (SELECT * FROM "
             f"{_duck_feats(source, d, id_col, text_col)})",
             f"lab AS (SELECT {id_col} AS doc_id, "
             f"CAST({label_expr} * {MICRO} AS BIGINT) AS y "
             f"FROM {source})",
             "w0(bucket, w) AS (SELECT CAST(NULL AS BIGINT), "
             "CAST(NULL AS BIGINT) WHERE FALSE)"]
    for i in range(iters):
        parts.append(f"""z{i} AS (
            SELECT f.doc_id, sum(coalesce(w.w, 0)) AS z
            FROM feats f LEFT JOIN w{i} w USING (bucket)
            GROUP BY 1
        ),
        e{i} AS (
            SELECT z.doc_id,
                   least(greatest(500000 + CAST(floor(z.z / 4.0)
                                               AS BIGINT), 0),
                         {MICRO}) - l.y AS err
            FROM z{i} z JOIN lab l USING (doc_id)
        ),
        g{i} AS (
            SELECT f.bucket, sum(e.err) AS g
            FROM feats f JOIN e{i} e USING (doc_id)
            GROUP BY 1
        ),
        w{i + 1} AS (
            SELECT g.bucket,
                   coalesce(w.w, 0)
                   - CAST(floor({lr} * g.g / {n_train}) AS BIGINT) AS w
            FROM g{i} g LEFT JOIN w{i} w USING (bucket)
        )""")
    return ",\n        ".join(parts)


def duckdb_train_sql(source: str = "documents",
                     label_expr: str = "label",
                     d: int = D_BUCKETS, iters: int = ITERS,
                     lr: float = LR, n_train: int | None = None,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """-> (bucket, w) after ``iters`` updates."""
    ctes = duckdb_train_ctes(source, label_expr, d, iters, lr, n_train,
                             id_col, text_col)
    return f"WITH {ctes} SELECT bucket, w FROM w{iters}"


def duckdb_score_sql(train_source: str, score_source: str,
                     label_expr: str = "label",
                     d: int = D_BUCKETS, iters: int = ITERS,
                     lr: float = LR, n_train: int | None = None,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Train on ``train_source``, score ``score_source`` ->
    (doc_id, quality_p)."""
    ctes = duckdb_train_ctes(train_source, label_expr, d, iters, lr,
                             n_train, id_col, text_col)
    return f"""
        WITH {ctes},
        sfeats AS (SELECT * FROM
            {_duck_feats(score_source, d, id_col, text_col)}),
        sz AS (
            SELECT f.doc_id, sum(coalesce(w.w, 0)) AS z
            FROM sfeats f LEFT JOIN w{iters} w USING (bucket)
            GROUP BY 1
        )
        SELECT doc_id,
               least(greatest(500000 + CAST(floor(z / 4.0) AS BIGINT),
                              0), {MICRO}) AS quality_p
        FROM sz
    """
