"""Z-order (Morton-curve) clustering for lake data layout.

At 100 TB the dominant read cost is scan bytes, and the lever is file /
row-group pruning on parquet min/max statistics.  A table sorted on ONE
column prunes perfectly on that column and not at all on any other; a
table whose files each cover a compact segment of a Morton curve over
SEVERAL columns prunes well on *every* interleaved column, so selective
filters on any of them skip most files.  This is the same layout
optimization Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY`` — built
here from first principles as pure codegen expressions (no UDF, no
window):

1. normalize each clustering column to an integer bucket in
   ``[0, 2**bits)`` with exact integer min/max arithmetic (one tiny agg
   job computes the min/max literals; at corpus scale that is a
   column-stats read, not a data scan),
2. interleave the bucket bits into one Morton key with an unrolled
   ``shiftleft``/``bitwiseOR`` expression (``bits * n_cols`` terms, all
   inside whole-stage codegen),
3. ``repartitionByRange`` on the key + ``sortWithinPartitions`` so each
   output file covers one compact curve segment.

The identical unrolled arithmetic runs in DuckDB for the oracle (``>>``
``<<`` ``|`` ``&`` behave the same on BIGINT in both engines), so the
Morton key itself is exactly cross-engine checkable, and the layout win
is asserted as a measured fact: the fraction of files a box predicate
can skip, from real per-file min/max, z-ordered vs single-column-sorted.

Reference context: the reference app stores results as flat uploads
(``backend/main_v1.py:43-120`` keeps everything in per-doc JSON);
layout optimization has no analogue there — this is part of the
100 TB-scale surface the brief asks for beyond the reference.
"""
from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BITS = 8  # 256 buckets/dim; 2 dims -> 16-bit key, plenty for file counts


def _bucket_expr(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column with known [lo, hi] to [0, 2**bits).

    Exact integer arithmetic (no doubles): ``(v - lo) * 2**bits`` stays
    within int64 for any realistic range (range * 2**bits < 2**63).
    Values are clamped so stale min/max literals (e.g. computed from
    column stats that lag a few appends) degrade locality, never
    correctness.
    """
    span = max(hi - lo + 1, 1)
    raw = ((col - F.lit(lo)) * F.lit(1 << bits)) / F.lit(span)
    b = F.floor(raw).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), b))


def _interleave_expr(buckets: Sequence[Column], bits: int) -> Column:
    """Morton-interleave: bit j of column i lands at position j*m + i."""
    m = len(buckets)
    terms = [
        F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)), j * m + i)
        for j in range(bits)
        for i, b in enumerate(buckets)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), terms).alias("z")


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = DEFAULT_BITS,
               ranges: dict[str, tuple[int, int]] | None = None) -> DataFrame:
    """Add a Morton key column ``z`` over integer columns ``cols``.

    ``ranges`` maps col -> (min, max); when omitted they are computed
    with one aggregate job (at lake scale, pass them from table-level
    column stats instead — the clamp in ``_bucket_expr`` makes slightly
    stale bounds safe).
    """
    if ranges is None:
        row = df.agg(*[f(c).alias(f"{n}_{c}")
                       for c in cols
                       for n, f in (("lo", F.min), ("hi", F.max))]).first()
        ranges = {c: (int(row[f"lo_{c}"]), int(row[f"hi_{c}"])) for c in cols}
    buckets = [_bucket_expr(F.col(c).cast("long"), *ranges[c], bits)
               for c in cols]
    return df.withColumn("z", _interleave_expr(buckets, bits))


def cluster_by_zorder(df: DataFrame, cols: Sequence[str], n_files: int,
                      bits: int = DEFAULT_BITS,
                      ranges: dict[str, tuple[int, int]] | None = None
                      ) -> DataFrame:
    """Lay ``df`` out as ``n_files`` partitions of compact Z-curve segments.

    One range shuffle on the 16-bit key (range partitioning samples the
    key, so skewed dimension values still balance by row count), then a
    partition-local sort — the write-side cost of every later scan's
    pruning win.  Write the result with ``.write.parquet`` (one file per
    partition).
    """
    keyed = zorder_key(df, cols, bits, ranges)
    return (keyed.repartitionByRange(n_files, F.col("z"))
            .sortWithinPartitions("z"))


def duckdb_zorder_sql(table: str, cols: Sequence[str],
                      bits: int = DEFAULT_BITS) -> str:
    """Exact DuckDB twin of ``zorder_key`` (same unrolled arithmetic)."""
    m = len(cols)
    lo = {c: f"(SELECT min({c}) FROM {table})" for c in cols}
    hi = {c: f"(SELECT max({c}) FROM {table})" for c in cols}
    bkt = {}
    for c in cols:
        span = f"greatest({hi[c]} - {lo[c]} + 1, 1)"
        raw = f"CAST(floor((({c} - {lo[c]}) * {1 << bits}) / {span}) AS BIGINT)"
        bkt[c] = f"greatest(0, least({(1 << bits) - 1}, {raw}))"
    terms = " | ".join(
        f"((({bkt[c]} >> {j}) & 1) << {j * m + i})"
        for j in range(bits)
        for i, c in enumerate(cols))
    return f"SELECT *, ({terms}) AS z FROM {table}"


def file_minmax_stats(spark: SparkSession, path: str,
                      cols: Sequence[str]) -> DataFrame:
    """Per-file min/max for ``cols`` — the statistics a reader prunes on.

    Parquet footers hold these natively; reading them back through
    ``input_file_name()`` keeps the check engine-agnostic and exercises
    the same values a real scan's ``PushedFilters`` would consult.
    """
    aggs = [f(c).alias(f"{n}_{c}") for c in cols
            for n, f in (("lo", F.min), ("hi", F.max))]
    return (spark.read.parquet(path)
            .withColumn("file", F.input_file_name())
            .groupBy("file").agg(*aggs))


def prunable_fraction(stats: DataFrame,
                      box: dict[str, tuple[int, int]]) -> float:
    """Fraction of files a conjunctive box predicate can skip entirely.

    A file survives only if every predicate interval overlaps the file's
    [min, max]; everything else is pruned before a byte is read.
    """
    survive = reduce(
        lambda acc, c: acc & (F.col(f"lo_{c}") <= F.lit(box[c][1]))
        & (F.col(f"hi_{c}") >= F.lit(box[c][0])),
        box, F.lit(True))
    row = stats.agg(
        F.count("*").alias("n"),
        F.sum(survive.cast("int")).alias("kept")).first()
    return 1.0 - row["kept"] / row["n"] if row["n"] else 0.0
