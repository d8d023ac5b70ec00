"""Corpus-wide repeated-line removal (web boilerplate scrubbing).

RefinedWeb (Penedo et al., 2023, §line-wise corrections) and Dolma
(Soldaini et al., 2024) both strip LINES that recur across many
documents — navigation chrome, cookie banners, footer legalese — the
boilerplate that survives document-level dedup because each page is
otherwise unique.  Distinct from ExactSubstr (operators/substring_dedup):
that keeps one canonical copy of a duplicated passage; a line passing
the document-frequency threshold here is boilerplate BY DEFINITION and
is removed everywhere, no survivor.

Semantics:

* lines split on ``\\n``; the match key is the TRIMMED line, the
  rebuilt text keeps the original spelling of survivors;
* only lines with >= ``min_chars`` non-whitespace-trimmed characters
  are eligible (blank separators and one-word lines stay — removing
  every blank line would fuse paragraphs corpus-wide);
* a line is boilerplate when it occurs in >= ``min_docs`` DISTINCT
  documents (within-document repeats count once toward the threshold
  but are all removed once the line qualifies).

Engine shape: the line string is reduced to its 15-hex md5 fingerprint
scan-side; the document-frequency census groups by the fingerprint, and
qualifying fingerprints join back against the exploded lines — no
exchange ever carries a raw line (CLAUDE.md house rule).  The rebuild
is a per-document sorted collect (bounded by document size), the same
shape the ExactSubstr rebuild already proved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fingerprint15

MIN_DOCS = 5     # document-frequency threshold for boilerplate
MIN_CHARS = 5    # shortest trimmed line eligible for removal


def _line_table(docs: DataFrame, id_col: str, text_col: str,
                min_chars: int = MIN_CHARS) -> DataFrame:
    """-> (id, pos, line, key_fp): one row per line, fingerprint of the
    trimmed line computed scan-side (NULL for ineligible lines so they
    can never join the boilerplate set)."""
    from ..functions.fanout import fan_out
    return (fan_out(docs, id_col)
            .select(id_col,
                    F.posexplode_outer(
                        F.split(F.coalesce(text_col, F.lit("")), "\n"))
                    .alias("pos", "line"))
            .withColumn("key_fp",
                        F.when(F.length(F.trim(F.col("line")))
                               >= min_chars,
                               fingerprint15(F.trim(F.col("line"))))))


def common_line_fps(docs: DataFrame, min_docs: int = MIN_DOCS,
                    id_col: str = "doc_id", text_col: str = "text",
                    min_chars: int = MIN_CHARS) -> DataFrame:
    """-> (key_fp): fingerprints of lines in >= min_docs distinct docs."""
    return (_line_table(docs, id_col, text_col, min_chars)
            .filter(F.col("key_fp").isNotNull())
            .select(id_col, "key_fp").distinct()
            .groupBy("key_fp")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .select("key_fp"))


def line_census(docs: DataFrame, min_docs: int = MIN_DOCS,
                id_col: str = "doc_id", text_col: str = "text",
                min_chars: int = MIN_CHARS) -> DataFrame:
    """The audit view -> (sample_line, n_docs, n_occurrences) for every
    boilerplate line, worst first.  The line string here is an
    AGGREGATED VALUE (min over occurrences), never a shuffle key."""
    lines = (_line_table(docs, id_col, text_col, min_chars)
             .filter(F.col("key_fp").isNotNull()))
    return (lines.groupBy("key_fp")
            .agg(F.min(F.trim(F.col("line"))).alias("sample_line"),
                 F.count_distinct(F.col(id_col)).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_docs") >= min_docs)
            .select("sample_line", "n_docs", "n_occurrences"))


def remove_common_lines(docs: DataFrame, min_docs: int = MIN_DOCS,
                        id_col: str = "doc_id", text_col: str = "text",
                        min_chars: int = MIN_CHARS) -> DataFrame:
    """The deliverable -> (doc_id, clean_text, n_lines, n_dropped):
    every occurrence of every boilerplate line removed, remaining lines
    rejoined in order.  A fully-boilerplate document survives with
    empty clean_text (downstream length filters decide its fate)."""
    lines = _line_table(docs, id_col, text_col, min_chars)
    common = common_line_fps(docs, min_docs, id_col, text_col, min_chars)
    marked = (lines
              .join(common.withColumn("is_common", F.lit(True)),
                    "key_fp", "left")
              .withColumn("drop",
                          F.coalesce(F.col("is_common"), F.lit(False))))
    return (marked.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.col("drop").cast("long")).alias("n_dropped"),
                 F.concat_ws(
                     "\n",
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(~F.col("drop"),
                                    F.struct("pos", "line")))),
                         lambda t: t["line"])).alias("clean_text"))
            .select(id_col, "clean_text", "n_lines", "n_dropped"))


def duckdb_remove_common_lines_sql(min_docs: int = MIN_DOCS,
                                   min_chars: int = MIN_CHARS) -> str:
    """Exact twin over a ``documents(doc_id, text)`` view ->
    (doc_id, clean_text, n_lines, n_dropped)."""
    return f"""
        WITH lines AS (
            SELECT doc_id,
                   generate_subscripts(
                       string_split(coalesce(text, ''), chr(10)), 1) AS pos,
                   unnest(string_split(coalesce(text, ''), chr(10)))
                       AS line
            FROM documents
        ), keyed AS (
            SELECT doc_id, pos, line,
                   CASE WHEN length(trim(line)) >= {min_chars}
                        THEN substr(md5(trim(line)), 1, 15) END AS key_fp
            FROM lines
        ), common AS (
            SELECT key_fp FROM (
                SELECT key_fp, count(DISTINCT doc_id) AS n_docs
                FROM keyed WHERE key_fp IS NOT NULL GROUP BY key_fp)
            WHERE n_docs >= {min_docs}
        ), marked AS (
            SELECT k.doc_id, k.pos, k.line,
                   (c.key_fp IS NOT NULL) AS drop
            FROM keyed k LEFT JOIN common c USING (key_fp)
        )
        SELECT doc_id,
               coalesce(string_agg(CASE WHEN NOT drop THEN line END,
                                   chr(10) ORDER BY pos), '')
                   AS clean_text,
               count(*) AS n_lines,
               sum(CASE WHEN drop THEN 1 ELSE 0 END) AS n_dropped
        FROM marked GROUP BY doc_id
    """
