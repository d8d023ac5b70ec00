"""Phrase-blocklist content filter (the C4 "bad words" rule).

C4 drops any page containing a phrase from a blocklist (Raffel et al.
2020, §2.2 — the "List of Dirty, Naughty, Obscene..." list); RefinedWeb
and Dolma keep variants of the same rule.  The subtlety is boundary
matching without engine-specific word-boundary syntax (``\\b`` is
banned by the house rules; boundary semantics differ subtly between
Java regex and RE2 anyway):

* both the text and every phrase are normalized identically — lowercase,
  every non-alphanumeric run collapsed to ONE space — so "Bad-Word!"
  and "bad word" agree;
* the normalized text is padded with one space on each side and the
  phrases become one alternation wrapped in literal spaces:
  ``[ ](p1|p2|...)[ ]``.  A literal-space boundary on a space-collapsed
  string IS word-boundary matching, in any regex engine, with no
  metacharacters beyond the alternation itself (normalized phrases are
  ``[a-z0-9 ]`` only, so no escaping hazards);
* the whole check is ONE codegen ``rlike`` per row — scan speed, no
  UDF, no shuffle, no join.  The phrase list rides the plan as a
  literal; for a blocklist too large for that (>~10^4 phrases) the
  token-join formulation in ``operators/decontaminate.py`` is the
  drop-in alternative — same normalization, eval-grams replaced by the
  blocklist.

For the boolean drop decision, match consumption is irrelevant (any hit
flags the row); ``blocklist_report`` counts per-phrase document
frequency with one aggregate pass of independent ``contains`` tests on
the padded text — boundary-exact and overlap-proof because each phrase
is tested independently.

Reference context: the reference has junk-value filters for mined
key-value pairs (``backend/ocr_service.py:1167-1204``, e.g. dropping
values that are all punctuation) but no corpus content policy; this is
curation surface from the C4 paper.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NORM_RE = "[^a-z0-9]+"


def _normalize_phrase(p: str) -> str:
    import re
    norm = re.sub(NORM_RE, " ", p.lower()).strip()
    if not norm:
        raise ValueError(f"phrase normalizes to empty: {p!r}")
    return norm


def _padded(text_col: str) -> Column:
    return F.concat(F.lit(" "),
                    F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                            NORM_RE, " ")),
                    F.lit(" "))


def blocklist_pattern(phrases: Sequence[str]) -> str:
    """`` (p1|p2|...) `` over normalized phrases — identical semantics
    in Java regex and RE2 (no classes, no anchors, no escapes)."""
    norm = sorted({_normalize_phrase(p) for p in phrases})
    return " (" + "|".join(norm) + ") "


def flag_blocklisted(docs: DataFrame, phrases: Sequence[str],
                     text_col: str = "text") -> DataFrame:
    """Adds ``blocked`` (boolean; NULL text -> false): ONE rlike per
    row, whole-stage codegen, nothing else."""
    pat = blocklist_pattern(phrases)
    return docs.withColumn(
        "blocked",
        F.coalesce(_padded(text_col).rlike(pat), F.lit(False)))


def drop_blocklisted(docs: DataFrame, phrases: Sequence[str],
                     text_col: str = "text") -> DataFrame:
    """The C4 rule: survivors only, original columns."""
    return (flag_blocklisted(docs, phrases, text_col)
            .filter(~F.col("blocked")).drop("blocked"))


def blocklist_report(docs: DataFrame, phrases: Sequence[str],
                     text_col: str = "text") -> DataFrame:
    """-> (phrase, n_docs) document frequency per blocklist phrase, one
    aggregate pass (an independent boundary-padded ``contains`` per
    phrase — overlap-proof, order-independent)."""
    norm = sorted({_normalize_phrase(p) for p in phrases})
    padded = _padded(text_col)
    aggs = [F.sum(F.coalesce(
        padded.contains(f" {p} "), F.lit(False)).cast("long"))
        .alias(f"c{i}") for i, p in enumerate(norm)]
    row = docs.agg(*aggs)
    stacked = F.explode(F.map_from_arrays(
        F.array(*[F.lit(p) for p in norm]),
        F.array(*[F.col(f"c{i}") for i in range(len(norm))])))
    return (row.select(stacked.alias("phrase", "n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("phrase")))


def duckdb_blocklist_sql(table: str, phrases: Sequence[str],
                         text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Exact twin of ``flag_blocklisted`` (same normalization, same
    boundary-padded alternation, RE2 side)."""
    pat = blocklist_pattern(phrases)
    padded = (f"' ' || trim(regexp_replace(lower({text_col}), "
              f"'{NORM_RE}', ' ', 'g')) || ' '")
    return f"""
        SELECT {id_col},
               coalesce(regexp_matches({padded}, '{pat}'), FALSE)
                   AS blocked
        FROM {table}
    """
