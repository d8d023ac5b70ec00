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
    key = F.concat(F.lit(salt), id_col.cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
            / F.lit(U_SCALE))


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
