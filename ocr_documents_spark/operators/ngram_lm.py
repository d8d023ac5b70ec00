"""N-gram language-model scoring: perplexity quality tiers + DSIR.

Two published curation recipes share one primitive — a Laplace-smoothed
word n-gram LM counted over a (sampled) reference slice of the corpus:

* CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): score
  every document by its average per-gram log-probability under the LM
  and split the corpus into head / middle / tail quality tiers at
  corpus quantiles.  (CCNet uses a KenLM 5-gram; the relational
  equivalent here is the same scoring rule over add-one-smoothed
  counts, which is what the sandbox can train deterministically.)
* DSIR — Data Selection via Importance Resampling (Xie et al.,
  NeurIPS 2023): importance weight = sum of log-ratios of each gram's
  probability under a TARGET-domain LM vs the RAW-corpus LM, then
  Gumbel-top-k selection (top-k of weight + Gumbel noise == sampling
  without replacement with probability proportional to exp(weight)).

Engine shape (the house rules):

* gram fingerprints (first 15 md5 hex digits) are the ONLY join /
  shuffle keys — a raw k-word gram string never rides an exchange;
* every log term is quantized to INTEGER MICRO-NATS
  (``round(ln(x) * 1e6)`` as bigint) before summation, so per-document
  sums are exact integers — independent of partitioning and addition
  order, and bit-identical across engines.  ``round(avg(..))`` on raw
  doubles is NOT cross-engine safe (CLAUDE.md); integer sums are.
* LM normalization constants (total count, vocab size) live in a
  one-row DataFrame crossJoin-broadcast into the scoring plan — never
  a driver-side ``.collect()`` in the data path;
* the Gumbel key is a pure function of the document id (md5-uniform),
  so selection is deterministic, replayable, and salt-rotatable like
  operators/mixing.py.

Reference corpus scale: at 10^12 documents the counts table is the
corpus vocabulary (bounded by the gram space, not the corpus — Heaps'
law keeps distinct grams far below total grams); scoring is one
fp-keyed shuffle of (doc, gram_fp) against it, the same join shape the
decontamination path already carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import fingerprint15 as _fp, ngrams_over, ws_words_col
from .mixing import U_SCALE
from .rank import with_global_rank

N_GRAM = 2          # bigram default (CCNet uses 5-grams on chars; word
                    # bigrams keep the demo corpus's vocab dense enough)
MICRO = 1_000_000   # log-space quantization: integer micro-nats
HEAD_FRAC = 0.10    # CCNet-style tier cuts: top 10% = head,
TAIL_FRAC = 0.30    # bottom 30% = tail, the rest = middle


def _micro_ln(x: Column) -> Column:
    """round(ln(x) * 1e6) as bigint — the exact-summable log term."""
    return F.round(F.log(x) * MICRO).cast("long")


def _doc_gram_fps(docs: DataFrame, n: int, id_col: str,
                  text_col: str) -> DataFrame:
    """-> (id_col, gram_fp), one row PER OCCURRENCE (LM counts need
    multiplicity, unlike decontamination's distinct grams)."""
    from ..functions.fanout import fan_out
    # the split + gram build + per-gram md5 run map-side, before any
    # exchange — fan out a one-split scan (no-op on a well-split lake)
    return (fan_out(docs, id_col)
            .select(id_col, ws_words_col(text_col).alias("ws"))
            .select(id_col,
                    F.explode_outer(ngrams_over(F.col("ws"), n))
                    .alias("gram"))
            .select(id_col, _fp(F.col("gram")).alias("gram_fp")))


def _train_filter(id_col: str, sample_mod: int) -> Column:
    """The ivf-style deterministic md5 doc sample for LM training."""
    return (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                   16, 10).cast("long") % sample_mod == 0)


def train_lm_counts(docs: DataFrame, n: int = N_GRAM,
                    sample_mod: int = 1, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """-> (gram_fp, cnt): the LM's smoothing-ready occurrence counts,
    trained on the deterministic 1/``sample_mod`` md5 document sample.
    Persist/checkpoint the result when scoring repeatedly."""
    src = (docs.filter(_train_filter(id_col, sample_mod))
           if sample_mod > 1 else docs)
    return (_doc_gram_fps(src, n, id_col, text_col)
            .filter(F.col("gram_fp").isNotNull())
            .groupBy("gram_fp").agg(F.count(F.lit(1)).alias("cnt")))


def _lm_stats(counts: DataFrame) -> DataFrame:
    """One-row (denom_micro): ln(T + V) in micro-nats — the smoothed
    denominator ln(total_count + vocab_size) every gram term shares."""
    return counts.agg(
        _micro_ln(F.sum("cnt") + F.count(F.lit(1))).alias("denom_micro"))


def perplexity_scores(docs: DataFrame, counts: DataFrame,
                      n: int = N_GRAM, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_grams, avg_logp): mean per-gram log-probability
    under the add-one-smoothed LM (higher = more fluent; perplexity =
    exp(-avg_logp)).  Documents with fewer than ``n`` words score NULL.

    Per-gram logp = ln(cnt+1) - ln(T+V); both terms are integer
    micro-nats, summed exactly, divided once at the end.  The final
    4-decimal rounding is the q32-style integer half-up
    (floor((2a+b)/2b)) — ``round()`` on a double differs between
    engines exactly at half boundaries."""
    # the counts DAG (its own explode + census) is consumed twice below
    # (gram join + _lm_stats) — materialize once
    counts = counts.localCheckpoint()
    grams = _doc_gram_fps(docs, n, id_col, text_col)
    per_doc = (grams
               .join(counts, "gram_fp", "left")
               .groupBy(id_col)
               .agg(F.count("gram_fp").alias("n_grams"),
                    F.sum(F.when(F.col("gram_fp").isNull(), None)
                          .otherwise(_micro_ln(
                              F.coalesce(F.col("cnt"), F.lit(0)) + 1)))
                    .alias("num_micro")))
    # avg in micro-nats = a / (n * 100) at 4-decimal scale
    a = (F.col("num_micro")
         - F.col("n_grams") * F.col("denom_micro"))
    b = F.col("n_grams") * 100
    return (per_doc.crossJoin(F.broadcast(_lm_stats(counts)))
            .withColumn(
                "avg_logp",
                F.when(F.col("n_grams") > 0,
                       F.floor((2 * a + b).cast("double") / (2 * b))
                       / 10000 + 0.0))
            .select(id_col, "n_grams", "avg_logp"))


def _score_i(col: Column) -> Column:
    """avg_logp back to its exact integer 1e-4 grid (it was produced as
    r/1e4, and round(x*1e4) of that double recovers r exactly — never a
    half boundary, x sits within an ulp of the integer)."""
    return F.round(col * 10000).cast("long")


def tier_thresholds(scored: DataFrame, head_frac: float = HEAD_FRAC,
                    tail_frac: float = TAIL_FRAC,
                    id_col: str = "doc_id") -> DataFrame:
    """One-row (head_cut_s100, tail_cut_s100, head_cut, tail_cut):
    corpus quantiles of avg_logp (the CCNet recipe computes these on a
    sample; pass a sampled ``scored`` for that).

    The interpolated percentile is computed ENTIRELY in integer space —
    scores on their exact 1e-4 grid, percent as integer hundredths,
    cut = a*(100-rem) + b*rem at 1e-6 scale — because rounding an
    interpolated double with round(.., 4) is exactly the cross-engine
    half-boundary pattern CLAUDE.md forbids (a midpoint of two adjacent
    1e-4 grid values lands exactly on .00005).  The same linear-
    interpolation definition as the standard percentile, in exact
    arithmetic; the double columns are display-only, comparisons run on
    the integers.  Ranks come from the range-partitioned global rank —
    no single-partition sort."""
    p_head = int(round((1.0 - head_frac) * 100))
    p_tail = int(round(tail_frac * 100))
    s = (scored.filter(F.col("avg_logp").isNotNull())
         .select(_score_i(F.col("avg_logp")).alias("score_i"),
                 F.col(id_col)))
    ranked = with_global_rank(s, [F.asc("score_i"), F.asc(id_col)], "rk")
    n1 = ranked.agg(F.count(F.lit(1)).alias("n"))
    j = ranked.crossJoin(F.broadcast(n1))

    def pieces(p: int, tag: str):
        pos = (F.col("n") - 1) * p          # integer hundredths
        lo = F.floor(pos / 100) + 1         # 1-based lower rank
        return [
            F.max(F.when(F.col("rk") == lo, F.col("score_i")))
            .alias(f"{tag}_a"),
            F.max(F.when(F.col("rk") == lo + 1, F.col("score_i")))
            .alias(f"{tag}_b"),
            F.max(F.pmod(pos, 100)).alias(f"{tag}_rem"),
        ]

    agg = j.agg(*pieces(p_head, "h"), *pieces(p_tail, "t"))

    def cut(tag: str) -> Column:
        a, b = F.col(f"{tag}_a"), F.col(f"{tag}_b")
        rem = F.col(f"{tag}_rem")
        return a * (100 - rem) + F.coalesce(b, a) * rem

    return agg.select(
        cut("h").alias("head_cut_s100"), cut("t").alias("tail_cut_s100"),
        (cut("h").cast("double") / 1000000).alias("head_cut"),
        (cut("t").cast("double") / 1000000).alias("tail_cut"))


def quality_tiers(scored: DataFrame, thresholds: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, avg_logp, tier in {head, middle, tail}): head =
    avg_logp >= head_cut, tail = avg_logp <= tail_cut (unscorable docs
    are tail — the conservative CCNet disposition), else middle.  The
    comparisons run in exact integer space (score*100 vs cut_s100)."""
    si = _score_i(F.col("avg_logp")) * 100
    return (scored.crossJoin(F.broadcast(thresholds))
            .withColumn("tier",
                        F.when(F.col("avg_logp").isNull(), "tail")
                        .when(si >= F.col("head_cut_s100"), "head")
                        .when(si <= F.col("tail_cut_s100"), "tail")
                        .otherwise("middle"))
            .select(id_col, "avg_logp", "tier"))


def dsir_weights(docs: DataFrame, target_counts: DataFrame,
                 raw_counts: DataFrame, n: int = N_GRAM,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_grams, weight_micro): the DSIR importance weight
    sum_g [ln p_target(g) - ln p_raw(g)] in EXACT integer micro-nats
    (bigint — safe to order by, hash, and compare across engines).
    Documents with no grams get NULL (nothing to featurize)."""
    # each counts DAG is consumed twice (gram join + _lm_stats) —
    # materialize once
    target_counts = target_counts.localCheckpoint()
    raw_counts = raw_counts.localCheckpoint()
    grams = _doc_gram_fps(docs, n, id_col, text_col)
    t = target_counts.select("gram_fp", F.col("cnt").alias("t_cnt"))
    r = raw_counts.select("gram_fp", F.col("cnt").alias("r_cnt"))
    per_doc = (grams
               .join(t, "gram_fp", "left").join(r, "gram_fp", "left")
               .groupBy(id_col)
               .agg(F.count("gram_fp").alias("n_grams"),
                    F.sum(F.when(F.col("gram_fp").isNull(), None)
                          .otherwise(
                              _micro_ln(F.coalesce("t_cnt", F.lit(0)) + 1)
                              - _micro_ln(
                                  F.coalesce("r_cnt", F.lit(0)) + 1)))
                    .alias("ratio_micro")))
    consts = (_lm_stats(target_counts)
              .select(F.col("denom_micro").alias("t_denom"))
              .crossJoin(_lm_stats(raw_counts)
                         .select(F.col("denom_micro").alias("r_denom"))))
    return (per_doc.crossJoin(F.broadcast(consts))
            .withColumn("weight_micro",
                        F.col("ratio_micro") + F.col("n_grams")
                        * (F.col("r_denom") - F.col("t_denom")))
            .select(id_col, "n_grams", "weight_micro"))


def _gumbel_micro(id_col: Column, salt: str) -> Column:
    """Deterministic Gumbel noise in micro-nats from the md5-uniform of
    the id: g = -ln(-ln(u)), u in (0,1) open (the +0.5 offset keeps u
    strictly inside, so neither ln can hit 0 or -inf)."""
    key = F.concat(F.lit(salt), id_col.cast("string"))
    u = ((F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
          + 0.5) / F.lit(U_SCALE))
    return F.round(-F.log(-F.log(u)) * MICRO).cast("long")


def dsir_select(docs: DataFrame, target_counts: DataFrame,
                raw_counts: DataFrame, k: int, n: int = N_GRAM,
                id_col: str = "doc_id", text_col: str = "text",
                salt: str = "") -> DataFrame:
    """-> (doc_id, weight_micro, rank): the k documents DSIR selects —
    Gumbel-top-k over key = weight + Gumbel(id), which draws k docs
    without replacement with probability proportional to exp(weight).
    Deterministic in (corpus, salt); rank via the range-partitioned
    global rank (no single-partition sort)."""
    keyed = (dsir_weights(docs, target_counts, raw_counts, n,
                          id_col, text_col)
             .filter(F.col("weight_micro").isNotNull())
             .withColumn("sel_key",
                         F.col("weight_micro")
                         + _gumbel_micro(F.col(id_col), salt)))
    ranked = with_global_rank(
        keyed, [F.desc("sel_key"), F.asc(id_col)], "rank")
    return (ranked.filter(F.col("rank") <= k)
            .select(id_col, "weight_micro", "rank"))


# ---------------------------------------------------------------------------
# DuckDB oracle builders (same tokenization, same integer micro-nats)
# ---------------------------------------------------------------------------

def _duck_gram_fps(src: str, id_col: str, n: int, out: str) -> str:
    """CTE: (id, gram_fp) per occurrence — the lead-window gram builder
    (trailing incomplete grams are NULL-concats and drop out), md5
    fingerprint applied scan-side."""
    leads = " || ' ' || ".join(
        ["word"] + [f"lead(word, {j}) OVER w" for j in range(1, n)])
    return f"""{out}_t AS (
            SELECT {id_col},
                   unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> '')) AS word,
                   generate_subscripts(
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> ''), 1) AS pos
            FROM {src}
        ), {out} AS (
            SELECT {id_col}, substr(md5(g), 1, 15) AS gram_fp FROM (
                SELECT {id_col}, {leads} AS g
                FROM {out}_t
                WINDOW w AS (PARTITION BY {id_col} ORDER BY pos))
            WHERE g IS NOT NULL
        )"""


def _duck_counts(grams_cte: str, out: str) -> str:
    return f"""{out} AS (
            SELECT gram_fp, count(*) AS cnt
            FROM {grams_cte} GROUP BY gram_fp
        ), {out}_stats AS (
            SELECT CAST(round(ln(sum(cnt) + count(*)) * {MICRO}) AS BIGINT)
                       AS denom_micro
            FROM {out}
        )"""


def _duck_train_src(src: str, id_col: str, sample_mod: int) -> str:
    if sample_mod <= 1:
        return src
    return f"""(
        SELECT * FROM {src}
        WHERE ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::UBIGINT
              % {sample_mod} = 0)"""


def duckdb_perplexity_sql(n: int = N_GRAM, sample_mod: int = 1) -> str:
    """Exact twin over a ``documents(doc_id, text)`` view ->
    (doc_id, n_grams, avg_logp)."""
    return f"""
        WITH {_duck_gram_fps(_duck_train_src('documents', 'doc_id',
                                             sample_mod),
                             'doc_id', n, 'tg')},
        {_duck_counts('tg', 'lm')},
        {_duck_gram_fps('documents', 'doc_id', n, 'dg')},
        per_doc AS (
            SELECT d.doc_id, count(*) AS n_grams,
                   sum(CAST(round(ln(coalesce(c.cnt, 0) + 1) * {MICRO})
                            AS BIGINT)) AS num_micro
            FROM dg d LEFT JOIN lm c USING (gram_fp)
            GROUP BY d.doc_id
        )
        SELECT doc_id,
               coalesce(p.n_grams, 0) AS n_grams,
               CASE WHEN p.n_grams > 0 THEN
                   floor((2 * (p.num_micro - p.n_grams * s.denom_micro)
                          + p.n_grams * 100)::DOUBLE
                         / (2 * p.n_grams * 100)) / 10000 + 0.0
               END AS avg_logp
        FROM documents
        LEFT JOIN per_doc p USING (doc_id)
        CROSS JOIN lm_stats s
    """


def duckdb_quality_tiers_sql(n: int = N_GRAM, sample_mod: int = 1,
                             head_frac: float = HEAD_FRAC,
                             tail_frac: float = TAIL_FRAC) -> str:
    """Exact twin -> (doc_id, avg_logp, tier): the same integer
    order-statistic interpolation (scores on the 1e-4 grid, cut at
    1e-6 scale) — no double ever feeds a round or a comparison."""
    p_head = int(round((1.0 - head_frac) * 100))
    p_tail = int(round(tail_frac * 100))
    return f"""
        WITH scored AS ({duckdb_perplexity_sql(n, sample_mod)}),
        r AS (
            SELECT CAST(round(avg_logp * 10000) AS BIGINT) AS score_i,
                   row_number() OVER (
                       ORDER BY CAST(round(avg_logp * 10000) AS BIGINT)
                           ASC, doc_id ASC) AS rk,
                   count(*) OVER () AS n
            FROM scored WHERE avg_logp IS NOT NULL
        ),
        pieces AS (
            SELECT
              max(CASE WHEN rk = ((n-1)*{p_head})//100 + 1
                       THEN score_i END) AS h_a,
              max(CASE WHEN rk = ((n-1)*{p_head})//100 + 2
                       THEN score_i END) AS h_b,
              max(((n-1)*{p_head}) % 100) AS h_rem,
              max(CASE WHEN rk = ((n-1)*{p_tail})//100 + 1
                       THEN score_i END) AS t_a,
              max(CASE WHEN rk = ((n-1)*{p_tail})//100 + 2
                       THEN score_i END) AS t_b,
              max(((n-1)*{p_tail}) % 100) AS t_rem
            FROM r
        ),
        cuts AS (
            SELECT h_a*(100-h_rem) + coalesce(h_b, h_a)*h_rem
                       AS head_cut_s100,
                   t_a*(100-t_rem) + coalesce(t_b, t_a)*t_rem
                       AS tail_cut_s100
            FROM pieces
        )
        SELECT doc_id, avg_logp,
               CASE WHEN avg_logp IS NULL THEN 'tail'
                    WHEN CAST(round(avg_logp * 10000) AS BIGINT)*100
                         >= head_cut_s100 THEN 'head'
                    WHEN CAST(round(avg_logp * 10000) AS BIGINT)*100
                         <= tail_cut_s100 THEN 'tail'
                    ELSE 'middle' END AS tier
        FROM scored CROSS JOIN cuts
    """


def _duck_weights(n: int, target_src: str, raw_sample_mod: int) -> str:
    """CTE chain ending in ``weights(doc_id, n_grams, weight_micro)``
    over ``documents`` (raw) and ``{target_src}`` (target slice)."""
    return f"""{_duck_gram_fps(target_src, 'doc_id', n, 'ttg')},
        {_duck_counts('ttg', 'tlm')},
        {_duck_gram_fps(_duck_train_src('documents', 'doc_id',
                                        raw_sample_mod),
                        'doc_id', n, 'rtg')},
        {_duck_counts('rtg', 'rlm')},
        {_duck_gram_fps('documents', 'doc_id', n, 'dg')},
        per_doc AS (
            SELECT d.doc_id, count(*) AS n_grams,
                   sum(CAST(round(ln(coalesce(t.cnt, 0) + 1) * {MICRO})
                            AS BIGINT)
                       - CAST(round(ln(coalesce(r.cnt, 0) + 1) * {MICRO})
                              AS BIGINT)) AS ratio_micro
            FROM dg d
            LEFT JOIN tlm t USING (gram_fp)
            LEFT JOIN rlm r USING (gram_fp)
            GROUP BY d.doc_id
        ),
        weights AS (
            SELECT p.doc_id, p.n_grams,
                   p.ratio_micro
                   + p.n_grams * (r.denom_micro - t.denom_micro)
                       AS weight_micro
            FROM per_doc p
            CROSS JOIN tlm_stats t CROSS JOIN rlm_stats r
        )"""


def duckdb_dsir_select_sql(k: int, n: int = N_GRAM,
                           target_src: str = "target",
                           raw_sample_mod: int = 1,
                           salt: str = "") -> str:
    """Exact twin -> (doc_id, weight_micro, rank): Gumbel-top-k with
    the same md5-uniform noise."""
    u = (f"(('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)),"
         f" 1, 8))::UBIGINT::DOUBLE + 0.5) / {U_SCALE}")
    return f"""
        WITH {_duck_weights(n, target_src, raw_sample_mod)}
        SELECT doc_id, weight_micro, rank FROM (
            SELECT doc_id, weight_micro,
                   row_number() OVER (
                       ORDER BY weight_micro
                           + CAST(round(-ln(-ln({u})) * {MICRO}) AS BIGINT)
                           DESC, doc_id ASC) AS rank
            FROM weights WHERE weight_micro IS NOT NULL)
        WHERE rank <= {k}
    """
