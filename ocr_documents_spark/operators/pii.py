"""PII scrubbing for training corpora: detect and mask emails, phone
numbers, IP addresses, and long digit runs (card/account shapes).

The C4/RefinedWeb-style regex pass, engine-native: every rule is one
``regexp_replace`` (JVM, whole-stage codegen — per-row, zero shuffle,
scan speed at 100 TB), applied in a FIXED order so earlier masks can
never create later matches.  Patterns deliberately avoid constructs that
mean different things across regex engines (no lookaround, no \\b —
word edges are spelled out) so the DuckDB oracle applies byte-identical
rules; parity is tested on adversarial fixtures in tests/test_pii.py.

The census (:func:`pii_census`) counts matches per category BEFORE
redaction — the audit metric a curation run reports per shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: emails first (their local part can look like a digit
# run), then IPs (dotted digits would otherwise be eaten by the digit
# rule), then phones, then bare long digit runs.
PII_RULES: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip",
     r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
     "<IP>"),
    ("phone",
     r"\+?[0-9]{1,3}[- ]?\(?[0-9]{2,4}\)?[- ][0-9]{3}[- ]?[0-9]{3,4}",
     "<PHONE>"),
    ("digits",
     r"[0-9]{9,}",
     "<NUM>"),
]


def redact_pii(text: Column) -> Column:
    """text -> masked text, all rules in order."""
    out = text
    for _, pattern, token in PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_corpus(docs: DataFrame, text_col: str = "text",
                 out_col: str = "clean_text") -> DataFrame:
    """Append ``out_col`` = the redacted text.  Pure per-row projection —
    but the regexp chain is the curation job's most expensive one, so a
    one-split input scan fans out first (no-op on a well-split lake)."""
    from ..functions.fanout import fan_out
    return fan_out(docs).withColumn(out_col, redact_pii(F.col(text_col)))


def pii_census(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_email, n_ip, n_phone, n_digits, has_pii): per-doc
    match counts BEFORE masking — the audit row.  Counts apply the same
    sequential-masking discipline as redaction (each category counts on
    text already masked by the previous categories), so
    sum(counts) == number of substitutions redact_pii performs.  NULL
    text counts as zero everywhere (not NULL): a boolean filter on
    ``has_pii`` must partition the corpus into exactly two buckets."""
    cols, cur = [], F.coalesce(F.col(text_col), F.lit(""))
    for name, pattern, token in PII_RULES:
        cols.append(F.size(F.regexp_extract_all(cur, F.lit(pattern), 0))
                    .alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pattern, token)
    out = docs.select(id_col, *cols)
    total = None
    for name, _, _ in PII_RULES:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def duckdb_scrub_sql() -> str:
    """Exact twin over documents(doc_id, text) -> (doc_id, clean_text)."""
    expr = "text"
    for _, pattern, token in PII_RULES:
        esc = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{esc}', '{token}', 'g')"
    return f"SELECT doc_id, {expr} AS clean_text FROM documents"
