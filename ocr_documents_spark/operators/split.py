"""Leakage-safe train/validation splitting.

Splitting a corpus doc-by-doc leaks: two near-duplicate documents land
on opposite sides of the cut and the validation loss silently measures
memorization (the classic contamination mode eval suites guard
against, happening inside one's own corpus).  The unit of assignment
must be the DEDUP GROUP — every member of a near-dup group goes to the
same side.

``leakage_safe_split`` takes the corpus and a group assignment (the
output contract shared by ``operators/dedup.dedup_groups`` and both
SemDeDup paths: ``(doc_id|vec_id, group_id, ...)``) and routes each
GROUP by the md5-uniform of its group id — deterministic on any
engine/partitioning (the operators/mixing.py discipline), salt-
rotatable for re-splits.  Documents absent from the group table (never
candidates of any near-dup pair) are singleton groups of themselves —
routed by their own id, which IS their group id under the dedup
contract, so the two cases are one rule.

Scale shape: one broadcast-free equi-join of the corpus against the
group table on doc_id, then a per-row projection — no shuffle beyond
the join, no window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mixing import uniform_hash

VAL_FRAC = 0.01


def leakage_safe_split(docs: DataFrame, groups: DataFrame | None = None,
                       val_frac: float = VAL_FRAC,
                       id_col: str = "doc_id",
                       salt: str = "") -> DataFrame:
    """-> docs + (group_id, split in {train, val}): whole dedup groups
    routed to one side by md5-uniform(group_id); ``groups`` is any
    (doc_id-compatible id, group_id) table — pass None to treat every
    document as its own group (plain deterministic split)."""
    if groups is not None:
        g = (groups.select(F.col(groups.columns[0]).alias(id_col),
                           "group_id"))
        joined = (docs.join(g, id_col, "left")
                  .withColumn("group_id",
                              F.coalesce("group_id", F.col(id_col))))
    else:
        joined = docs.withColumn("group_id", F.col(id_col))
    u = uniform_hash(F.col("group_id"), salt)
    return joined.withColumn(
        "split", F.when(u < val_frac, "val").otherwise("train"))


def split_report(split_df: DataFrame) -> DataFrame:
    """-> (split, n_docs, n_groups): the audit row per side."""
    return (split_df.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count_distinct("group_id").alias("n_groups")))


def duckdb_leakage_safe_split_sql(val_frac: float = VAL_FRAC,
                                  salt: str = "",
                                  groups_src: str | None = "groups"
                                  ) -> str:
    """Exact twin over ``documents(doc_id, text)`` (+ optional
    ``groups(doc_id, group_id)``) -> (doc_id, group_id, split)."""
    if groups_src is not None:
        base = f"""
            SELECT d.doc_id,
                   coalesce(g.group_id, d.doc_id) AS group_id
            FROM documents d LEFT JOIN {groups_src} g USING (doc_id)"""
    else:
        base = "SELECT doc_id, doc_id AS group_id FROM documents"
    return f"""
        SELECT doc_id, group_id,
               CASE WHEN ('0x' || substr(md5('{salt}'
                              || CAST(group_id AS VARCHAR)), 1, 8))
                        ::UBIGINT::DOUBLE / 4294967296.0 < {val_frac}
                    THEN 'val' ELSE 'train' END AS split
        FROM ({base})
    """
