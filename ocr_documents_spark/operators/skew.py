"""Skew-resistant equi-join: salt the hot side, replicate the other.

When one join key carries a disproportionate share of rows (the north
rule's named failure mode — one customer with 10^8 events, one template
shared by half the corpus), a plain shuffle join pins that key's entire
payload on a single reducer.  AQE's skew-join split handles many cases
at runtime; this operator is the EXPLICIT form for when the skew is
known and the small side is too big to broadcast outright but fine to
replicate ``salt`` times:

* the large/skewed side gets a DETERMINISTIC salt in [0, salt) derived
  from xxhash64 of its whole row (not random — identical replays/
  re-drives produce identical partitioning, and no rand() breaks AQE
  re-optimization or task retry idempotence);
* the small side is replicated once per salt value via a native
  sequence explode;
* the join key becomes (key, salt) — the hot key now spreads across
  ``salt`` reducers.

Row-identical to the plain join by construction (property-tested, plus
a plan test that the join key really carries the salt).  Use
``F.broadcast`` instead when the small side fits in memory; use this
when it does not.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key_cols: Sequence[str] | str,
             threshold_frac: float = 0.01) -> DataFrame:
    """-> (key_cols..., n_rows, frac) for keys carrying more than
    ``threshold_frac`` of the table — the detection half of the skew
    story (feed the result into a salting decision, or log it from the
    metrics sidecar).  One partial-aggregatable groupBy + a broadcast
    1-row total; the output is by construction at most
    1/threshold_frac rows, i.e. collectable."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    # threshold on the RAW ratio; round only the reported column — a key
    # at frac 0.0100004 must not round down to 0.01 and dodge detection
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("n_rows") / F.col("__total") > threshold_frac)
            .withColumn("frac", F.round(F.col("n_rows") / F.col("__total"),
                                        6))
            .drop("__total"))


def salted_join(large: DataFrame, small: DataFrame,
                on: Sequence[str] | str, salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join ``large`` ⋈ ``small`` on ``on`` with the large side
    salted ``salt`` ways and the small side replicated to match.

    ``how`` supports the joins where replication is sound for the small
    side: ``inner`` and ``left`` (left = the large side; every large row
    keeps exactly one salt, so no duplicates arise).  Output columns =
    large's columns + small's non-key columns, like a plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    lg = large.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*large.columns), F.lit(salt)).cast("int"))
    sm = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return (lg.join(sm, on + ["__salt"], how)
            .drop("__salt"))
