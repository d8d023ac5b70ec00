"""Domain mixing: deterministic weighted down-sampling per source domain.

Training-data recipes specify per-domain keep rates ("webpages 0.4, books
1.0, code 0.7" — the Pile/Llama-style mixture).  ``sampleBy`` would do it
non-reproducibly; here the keep decision is a pure function of the
document id: ``u(doc) = first-8-md5-hex-digits / 2^32`` is uniform on
[0, 1) and engine-independent, so the SAME documents survive on any
engine, any partitioning, any rerun — and a re-drive of one bucket
reproduces its exact sample (the resumability contract the lake layer
needs).  A ``salt`` rotates the sample between epochs without touching
the weights.

Pure per-row projection + one broadcast-sized map literal: zero shuffle,
scan speed at 100 TB.  Exact DuckDB twin in tests/test_mixing.py.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

U_SCALE = float(1 << 32)


def uniform_hash(id_col: Column, salt: str = "") -> Column:
    """Deterministic u ~ U[0,1) from the stringified id (+ salt)."""
    from .dedup import md5_u32
    return md5_u32(id_col, salt).cast("double") / F.lit(U_SCALE)


def domain_weighted_sample(docs: DataFrame, weights: dict[str, float],
                           domain_col: str = "source",
                           id_col: str = "doc_id",
                           default_weight: float = 0.0,
                           salt: str = "") -> DataFrame:
    """Keep each doc with probability ``weights[domain]`` (deterministic
    in the doc id).  Domains absent from ``weights`` fall back to
    ``default_weight`` (0.0 = drop unknown domains — the conservative
    recipe default)."""
    wmap = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(float(v))) for k, v in sorted(weights.items())))
    w = F.coalesce(wmap[F.col(domain_col)], F.lit(float(default_weight)))
    return docs.filter(uniform_hash(F.col(id_col), salt) < w)


def mixing_report(docs: DataFrame, weights: dict[str, float],
                  domain_col: str = "source", id_col: str = "doc_id",
                  default_weight: float = 0.0,
                  salt: str = "") -> DataFrame:
    """-> (domain, n_docs, n_kept, target_weight, achieved_rate): the
    audit row per domain — achieved rate converges on the target as the
    domain grows (exact Bernoulli, not quota)."""
    wmap = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(float(v))) for k, v in sorted(weights.items())))
    w = F.coalesce(wmap[F.col(domain_col)], F.lit(float(default_weight)))
    kept = (uniform_hash(F.col(id_col), salt) < w).cast("long")
    return (docs
            .select(F.col(domain_col).alias("domain"), w.alias("tw"),
                    kept.alias("kept"))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("kept").alias("n_kept"),
                 F.first("tw").alias("target_weight"),
                 F.round(F.sum("kept") / F.count(F.lit(1)), 6)
                 .alias("achieved_rate")))


def duckdb_sample_sql(weights: dict[str, float],
                      default_weight: float = 0.0, salt: str = "") -> str:
    """Exact twin over documents(doc_id, source, ...) -> kept doc_ids."""
    cases = " ".join(f"WHEN '{k}' THEN {float(v)!r}"
                     for k, v in sorted(weights.items()))
    return f"""
        SELECT doc_id FROM documents
        WHERE ('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)),
                              1, 8))::UBIGINT / {U_SCALE!r}
              < (CASE source {cases} ELSE {float(default_weight)!r} END)
    """


# ---------------------------------------------------------------------------
# Token-budget sampling: mixtures are specified in TOKENS, not keep rates
# ---------------------------------------------------------------------------
#
# Real mixture recipes say "300B tokens of web, 30B of code" — a token
# BUDGET per domain, not a Bernoulli rate (rates under/overshoot when
# doc lengths differ by domain).  Semantics: order each domain's docs by
# the deterministic (u, id) key and keep the PREFIX whose preceding
# cumulative token count is < budget (so the doc that crosses the budget
# line is kept, and the kept set is a pure function of ids — rerun- and
# partitioning-invariant, salt-rotatable like the Bernoulli sampler).
#
# The scalable shape: a per-domain cumsum window would put a 10^11-doc
# web domain in ONE partition (the Window.orderBy scale-killer CLAUDE.md
# bans).  Instead u's top B_BITS bits form an integer histogram bucket:
# one (domain, bucket) token census (≤ domains×2^B_BITS rows — control-
# plane sized), a cumsum over THAT, and only the single budget-crossing
# bucket per domain (expected 1/2^B_BITS of the domain) pays a doc-level
# window.  Same trick as rank.with_global_rank, applied per group.

B_BITS = 10                     # 1024 histogram buckets per domain


def _u_int(id_col: Column, salt: str = "") -> Column:
    """The integer sampling key u in [0, 2^32) — same hash as
    :func:`uniform_hash` (the shared dedup.md5_u32 primitive), kept
    integral so bucket math is exact."""
    from .dedup import md5_u32
    return md5_u32(id_col, salt)


def _budget_map(budgets: dict[str, int], default_budget: int) -> Column:
    wmap = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(int(v))) for k, v in sorted(budgets.items())))
    return F.coalesce(wmap[F.col("__dom")], F.lit(int(default_budget)))


def token_budget_sample(docs: DataFrame, budgets: dict[str, int],
                        domain_col: str = "source",
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        token_col: str | None = None,
                        default_budget: int = 0,
                        salt: str = "") -> DataFrame:
    """Keep, per domain, the deterministic (u, id)-ordered prefix of
    docs whose preceding cumulative token count is < the domain's
    budget.  Tokens = whitespace words of ``text_col`` unless a
    precomputed ``token_col`` is given.  Domains without a budget —
    including a NULL domain — fall back to ``default_budget``
    (0 = drop).  Ids must be non-null (the ordering key is md5 of the
    id, the contract every id-keyed operator here shares).  Returns
    the input columns.
    """
    from pyspark.sql import Window
    from .dedup import ws_words_col

    tok = (F.col(token_col) if token_col is not None
           else F.size(ws_words_col(
               F.coalesce(F.col(text_col), F.lit(""))))).cast("long")
    from ..functions.fanout import fan_out
    base = (fan_out(docs, id_col)
            .withColumn("__dom", F.col(domain_col))
            .withColumn("__u", _u_int(F.col(id_col), salt))
            .withColumn("__tok", tok)
            .withColumn("__bkt", F.shiftright("__u", 32 - B_BITS)))

    census = (base.groupBy("__dom", "__bkt")
              .agg(F.sum("__tok").alias("__bsum")))
    w_cum = (Window.partitionBy("__dom").orderBy("__bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    decisions = (census
                 .withColumn("__before",
                             F.coalesce(F.sum("__bsum").over(w_cum),
                                        F.lit(0)))
                 .withColumn("__budget",
                             _budget_map(budgets, default_budget))
                 .withColumn(
                     "__st",
                     F.when(F.col("__before") >= F.col("__budget"),
                            F.lit("drop"))
                     # STRICT <: a bucket ending exactly on the budget
                     # line routes through the partial window, so a
                     # zero-token doc sitting at before == budget is
                     # dropped — matching the oracle's strict prefix
                     # rule (the trailing-zero-token boundary case)
                     .when(F.col("__before") + F.col("__bsum")
                           < F.col("__budget"), F.lit("keep"))
                     .otherwise(F.lit("partial")))
                 .select(F.col("__dom").alias("__ddom"),
                         F.col("__bkt").alias("__dbkt"),
                         "__st", "__before", "__budget"))

    # null-safe on the domain: NULL-source docs form their own group
    # and take default_budget, exactly like the oracle's CASE ELSE
    # branch and domain_weighted_sample's coalesce (a plain equi-join
    # would silently drop them)
    tagged = (base.join(
        F.broadcast(decisions),
        F.col("__dom").eqNullSafe(F.col("__ddom"))
        & (F.col("__bkt") == F.col("__dbkt")))
        .drop("__ddom", "__dbkt"))
    kept_full = tagged.filter(F.col("__st") == "keep")
    # only the crossing bucket's docs enter a window — 1/2^B_BITS of a
    # domain in expectation, and its sort key is (u, id) within ONE
    # bucket of ONE domain
    w_doc = (Window.partitionBy("__dom").orderBy("__u", id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
    kept_part = (tagged.filter(F.col("__st") == "partial")
                 .withColumn("__dbefore",
                             F.coalesce(F.sum("__tok").over(w_doc),
                                        F.lit(0)))
                 .filter(F.col("__before") + F.col("__dbefore")
                         < F.col("__budget"))
                 .drop("__dbefore"))
    return (kept_full.unionByName(kept_part)
            .select(*docs.columns))


def token_budget_report(docs: DataFrame, budgets: dict[str, int],
                        domain_col: str = "source",
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        token_col: str | None = None,
                        default_budget: int = 0,
                        salt: str = "") -> DataFrame:
    """-> (domain, budget, total_tokens, kept_docs, kept_tokens): the
    audit — kept_tokens < budget + the crossing doc's length, exactly
    the prefix contract."""
    from .dedup import ws_words_col
    tok = (F.col(token_col) if token_col is not None
           else F.size(ws_words_col(
               F.coalesce(F.col(text_col), F.lit(""))))).cast("long")
    kept = (token_budget_sample(docs, budgets, domain_col, id_col,
                                text_col, token_col, default_budget,
                                salt)
            .withColumn("__tok", tok)
            .groupBy(F.col(domain_col).alias("domain"))
            .agg(F.count(F.lit(1)).alias("kept_docs"),
                 F.sum("__tok").alias("kept_tokens")))
    total = (docs.withColumn("__tok", tok)
             .withColumn("__dom", F.col(domain_col))
             .groupBy(F.col("__dom").alias("domain"))
             .agg(F.sum("__tok").alias("total_tokens")))
    bmap = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(int(v))) for k, v in sorted(budgets.items())))
    return (total.join(kept, "domain", "left")
            .select("domain",
                    F.coalesce(bmap[F.col("domain")],
                               F.lit(int(default_budget)))
                    .alias("budget"),
                    "total_tokens",
                    F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
                    F.coalesce("kept_tokens", F.lit(0))
                    .alias("kept_tokens")))


def duckdb_token_budget_sql(budgets: dict[str, int],
                            default_budget: int = 0,
                            salt: str = "") -> str:
    """Exact twin over documents(doc_id, source, text) -> kept doc_ids.
    The oracle affords the direct per-domain cumsum window the engine
    side deliberately avoids — same (u, id) order, same prefix rule."""
    cases = " ".join(f"WHEN '{k}' THEN {int(v)}"
                     for k, v in sorted(budgets.items()))
    return f"""
        WITH t AS (
            SELECT doc_id, source,
                   ('0x' || substr(md5('{salt}'
                        || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS u,
                   CAST(len(list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '')) AS BIGINT) AS tok
            FROM documents
        ), c AS (
            SELECT doc_id, source,
                   coalesce(sum(tok) OVER (PARTITION BY source
                       ORDER BY u, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS before_tok
            FROM t
        )
        SELECT doc_id FROM c
        WHERE before_tok < (CASE source {cases}
                            ELSE {int(default_budget)} END)
    """
