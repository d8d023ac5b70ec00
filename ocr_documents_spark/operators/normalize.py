"""Unicode normalization + control-character scrub (corpus cleaning).

Web-scale text arrives in mixed normal forms: the same visible string
as precomposed codepoints (``é`` = U+00E9) in one crawl and decomposed
(``e`` + U+0301) in another.  Everything downstream that hashes text —
exact dedup (q12), MinHash shingles, substring-dedup grams, eval-set
decontamination — treats those as DIFFERENT documents, silently
weakening every dedup/decontamination guarantee.  Pinning the corpus to
NFC at ingest is the standard fix (C4/mC4 and CCNet normalize before
hashing), and control characters (OCR artifacts, broken encoders) are
scrubbed for the same reason.

Scale shape:

* control-char scrub is native ``regexp_replace`` — scan-speed codegen,
  lookaround-free (RE2-safe for the oracle), NULL-preserving;
* NFC is the one step Spark has no built-in for: an Arrow-batched
  pandas UDF over ``unicodedata.normalize`` — zero shuffle, pure
  per-row, so it rides whatever scan parallelism exists (same argument
  as the extraction light path);
* ``normalize_report`` counts affected docs per category with one
  aggregate (audit: how much of the corpus was non-NFC?).

Cross-engine oracle: DuckDB ships ``nfc_normalize``, so unlike most
UDF-backed steps this one has a VALUE-level twin
(``duckdb_normalize_sql``) — byte parity is asserted over adversarial
fixtures and hypothesis-random unicode, not just properties.

Reference context: the reference strips/uppercases per-extractor
(``backend/ocr_service.py:138`` ``clean_text``) but has no corpus-level
encoding hygiene; this is curation surface the brief asks for.
"""
from __future__ import annotations

import unicodedata
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C0 controls minus \t\n\r, plus DEL.  No lookaround; identical class
# semantics in Java regex and RE2.
CONTROL_CHAR_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def strip_control_chars(col: Column | str) -> Column:
    """Native codegen scrub of C0 controls (keeps \\t \\n \\r)."""
    return F.regexp_replace(col, CONTROL_CHAR_RE, "")


def nfc_normalize_docs(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """NFC-normalize ``text_col`` in place — every other column rides
    through untouched (so the pass composes into any pipeline stage).
    Arrow-batched, zero shuffle; NULL stays NULL."""
    schema = docs.schema

    def nfc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            batch[text_col] = [
                None if t is None else unicodedata.normalize("NFC", t)
                for t in batch[text_col]]
            yield batch

    return docs.mapInPandas(nfc, schema)


def normalize_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub control chars (native), then pin to NFC (Arrow UDF).  Fans
    out a one-split input scan first — both steps are per-row CPU."""
    from ..functions.fanout import fan_out
    scrubbed = fan_out(docs).withColumn(text_col,
                                        strip_control_chars(text_col))
    return nfc_normalize_docs(scrubbed, text_col)


def normalize_report(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """One-row audit: docs total / with control chars / non-NFC /
    changed at all."""
    norm = (normalize_docs(docs.select(id_col, text_col), text_col)
            .withColumnRenamed(text_col, "__norm"))
    joined = docs.select(id_col, text_col).join(norm, id_col)
    ctl = F.col(text_col).rlike(CONTROL_CHAR_RE)
    return joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ctl.cast("int")).alias("n_with_control_chars"),
        F.sum((~ctl & (F.col(text_col) != F.col("__norm")))
              .cast("int")).alias("n_non_nfc_only"),
        F.sum((F.col(text_col) != F.col("__norm")).cast("int"))
        .alias("n_changed"))


def duckdb_normalize_sql(table: str, text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Exact value-level twin: same control class, DuckDB's native NFC."""
    return f"""
        SELECT {id_col},
               nfc_normalize(regexp_replace(
                   {text_col}, '{CONTROL_CHAR_RE}', '', 'g')) AS {text_col}
        FROM {table}
    """
