"""Sequence packing: turn a document corpus into the fixed-length
training-sequence MANIFEST a GPT-style data loader consumes.

Pretraining's standard "pack and chop": concatenate every document's
tokens in a deterministic order into one global stream, then cut the
stream every ``seq_len`` tokens.  A document therefore contributes one
or more SLICES, each belonging to exactly one training sequence, with
no padding anywhere except the final partial sequence.

The scale-critical insight: the packer never materializes tokens.  Each
document only needs its global starting offset — an exclusive running
sum of token counts over the corpus order — and that is
operators/rank.with_global_cumsum (range partitions accumulate locally,
broadcast partition offsets; no single-partition anything).  From
(offset, n_tokens) the slice rows per doc follow from pure arithmetic:
the doc touches sequences floor(offset/L) .. floor((offset+n-1)/L), a
sequence-explode over that tiny range (a doc spanning s sequences emits
s rows, so the output is ~corpus_tokens/seq_len + n_docs rows total).

Output manifest columns:
  seq_id        training sequence index (0-based)
  doc_id        source document
  doc_start     first token of the slice, doc-relative
  seq_start     where the slice lands inside the sequence
  n_tok         slice length

Invariants (tested, plus an exact DuckDB twin):
  * every sequence except the last is exactly seq_len tokens;
  * slices within a sequence tile it without gaps or overlap;
  * every document's slices cover [0, n_tokens) in order.

Ordering is the engine's deterministic md5 convention (so the pack is
reproducible on any engine/partitioning and a re-drive rebuilds the
same manifest); pass order_cols to pack in curriculum or length order
instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import ws_words_col
from .rank import with_global_cumsum


def pack_sequences(docs: DataFrame, seq_len: int,
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   order_cols: Sequence[Column] | None = None) -> DataFrame:
    """-> the packing manifest (see module docstring).  Token = the
    curation family's shared whitespace word (ws_words_col) so manifest
    offsets agree with any whitespace tokenizer and with the sibling
    operators — a space-only split would fuse newline-adjacent words
    and shift every slice boundary after a multi-line document."""
    if order_cols is None:
        order_cols = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    from ..functions.fanout import fan_out
    toks = (fan_out(docs, id_col)
            .select(id_col,
                    F.size(ws_words_col(text_col)).alias("n_tokens"))
            .filter(F.col("n_tokens") > 0))
    offs = with_global_cumsum(toks, order_cols, "n_tokens",
                              out_col="offset")
    first = F.floor(F.col("offset") / seq_len).cast("long")
    last = F.floor((F.col("offset") + F.col("n_tokens") - 1)
                   / seq_len).cast("long")
    slices = (offs
              .select(id_col, "offset", "n_tokens",
                      F.explode(F.sequence(first, last)).alias("seq_id")))
    slice_start = F.greatest(F.col("seq_id") * seq_len, F.col("offset"))
    slice_end = F.least((F.col("seq_id") + 1) * seq_len,
                        F.col("offset") + F.col("n_tokens"))
    return (slices.select(
        "seq_id", id_col,
        (slice_start - F.col("offset")).cast("long").alias("doc_start"),
        (slice_start - F.col("seq_id") * seq_len).cast("long")
        .alias("seq_start"),
        (slice_end - slice_start).cast("long").alias("n_tok")))


def duckdb_pack_sql(seq_len: int) -> str:
    """Exact twin over documents(doc_id, text): the same manifest via a
    window cumulative sum (fine at oracle scale) in md5 order."""
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '')) AS n_tokens
            FROM documents
        ), nz AS (
            SELECT * FROM toks WHERE n_tokens > 0
        ), offs AS (
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS "offset"
            FROM nz
        ), slices AS (
            SELECT doc_id, "offset", n_tokens,
                   unnest(range("offset" // {seq_len},
                                ("offset" + n_tokens - 1) // {seq_len} + 1))
                       AS seq_id
            FROM offs
        )
        SELECT seq_id, doc_id,
               greatest(seq_id * {seq_len}, "offset") - "offset"
                   AS doc_start,
               greatest(seq_id * {seq_len}, "offset") - seq_id * {seq_len}
                   AS seq_start,
               least((seq_id + 1) * {seq_len}, "offset" + n_tokens)
                   - greatest(seq_id * {seq_len}, "offset") AS n_tok
        FROM slices
    """
