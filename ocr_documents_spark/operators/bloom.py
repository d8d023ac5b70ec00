"""Distributed Bloom filter: set membership at ingest without touching
the corpus (Bloom, CACM 1970; sizing math per Broder & Mitzenmacher,
Internet Mathematics 2004).

Why this operator exists at 100 TB: the incremental-ingest flow asks
"has this content fingerprint / URL / doc_id been seen before?" for
every document of every new crawl batch.  The exact answer is a join
against a 10^12-row history table — a corpus-scale probe per batch.  A
Bloom filter of the history is m/8 bytes total (≈1.2 GB at m = 10^10
bits, which holds 10^9 keys at ~0.8% false-positive rate with k = 7),
small enough to broadcast, and answers "definitely new" with ZERO false
negatives for the overwhelming majority of a fresh batch; only the
"maybe seen" sliver pays the exact check (the persisted LSH band index
probe, or a history anti-join on the few flagged ids).

Engine shape — every stage is native codegen except the optional
bitmap-lookup UDF, and nothing corpus-sized ever shuffles:

* build: each key maps to k bit positions — ONE md5 base hash (the
  house 15-hex prefix → x < 2^60) then k Mersenne-split mulmod
  permutations from the dedup module's shared seeded family — packed
  into 32-bit words, and ONE ``bit_or`` aggregate per word index builds
  the filter.  Partial aggregation ORs map-side, so the exchange
  carries at most m/32 fixed-width rows PER TASK regardless of corpus
  size (plan-asserted).
* probe, Arrow path (:func:`with_bloom_maybe`): positions are computed
  JVM-side as an array column; a vectorized pandas UDF holding the
  broadcast numpy bitmap checks k bits per row — zero shuffle, zero
  per-row Python, every other column rides through untouched.
* probe, relational path (:func:`bloom_probe`): for filters too big to
  hold driver-side, keys explode to k (word_idx, mask) probes and
  left-join the word table (broadcast when it fits); a key is
  maybe-present iff all k bits are set.  Cost is O(batch), never
  O(history).

The filter is DETERMINISTIC given (m_bits, k, the seeded constants), so
Spark and DuckDB build bit-identical word tables and return identical
verdicts — parity is value-level on both (tests/test_bloom.py), which
is the strongest oracle an approximate structure can carry: the
approximation itself is reproduced exactly, and the no-false-negative
guarantee is tested separately as a semantic property.

Permutation indices start at :data:`BLOOM_J0` so the bloom family is
disjoint from the MinHash signature family even when both hash the same
fingerprint column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import (HASH_A, HASH_B, HASH_P, _MASK30, _MASK31, _base_hash,
                    _perm_hash)

M_BITS = 1 << 20          # test-tier default: 128 KiB of filter
K_HASHES = 7              # optimal k ≈ (m/n)·ln2 at ~10 bits/key
BLOOM_J0 = 64             # HASH_A/B indices [J0, J0+k): minhash-disjoint


def _check(m_bits: int, k: int) -> None:
    if m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
    if not 0 < k <= len(HASH_A) - BLOOM_J0:
        raise ValueError(f"k must be in 1..{len(HASH_A) - BLOOM_J0}")


def bit_positions(base: Column, m_bits: int = M_BITS,
                  k: int = K_HASHES) -> Column:
    """base-hash column (x < 2^60) -> array<long> of the key's k bit
    positions in [0, m_bits)."""
    return F.array(*[_perm_hash(BLOOM_J0 + j)(base) % m_bits
                     for j in range(k)])


def bloom_build(df: DataFrame, key_col: str = "key",
                m_bits: int = M_BITS, k: int = K_HASHES) -> DataFrame:
    """-> (word_idx, word): the filter as ≤ m_bits/32 packed rows.
    NULL keys are not members and are skipped."""
    _check(m_bits, k)
    pos = (df.filter(F.col(key_col).isNotNull())
           .select(_base_hash()(F.col(key_col)).alias("x"))
           .select(F.explode(bit_positions(F.col("x"), m_bits, k))
                   .alias("pos")))
    return (pos
            .select(F.expr("pos DIV 32").alias("word_idx"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pos % 32 AS INT))").alias("mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("word")))


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two filters built with the same (m_bits, k) — Bloom filters
    are mergeable, so per-batch filters built independently (one per
    ingest day, one per corpus shard) fold into the history filter
    without rebuilding: union + one more bit_or."""
    return (a.unionByName(b).groupBy("word_idx")
            .agg(F.bit_or("word").alias("word")))


def bloom_probe(df: DataFrame, words: DataFrame, key_col: str = "key",
                m_bits: int = M_BITS, k: int = K_HASHES,
                broadcast: bool = True) -> DataFrame:
    """Relational probe -> (key_col, maybe_present) per DISTINCT key.

    The path for filters too large to collect driver-side: k probe rows
    per key left-join the word table (broadcast when it fits — at
    m = 10^10 bits the table is 3·10^8 rows ≈ 5 GB and the join falls
    back to a shuffle on word_idx, still O(batch·k), never O(history)).
    A missing word row is an unset bit, so absence proves non-membership
    exactly like a zero word does."""
    _check(m_bits, k)
    w = F.broadcast(words) if broadcast else words
    probes = (df.filter(F.col(key_col).isNotNull())
              .select(key_col).distinct()
              .select(key_col,
                      _base_hash()(F.col(key_col)).alias("x"))
              .select(key_col,
                      F.explode(bit_positions(F.col("x"), m_bits, k))
                      .alias("pos"))
              .select(key_col,
                      F.expr("pos DIV 32").alias("word_idx"),
                      F.expr("shiftleft(CAST(1 AS BIGINT), "
                             "CAST(pos % 32 AS INT))").alias("mask")))
    return (probes.join(w, "word_idx", "left")
            .withColumn("hit",
                        (F.coalesce(F.col("word"), F.lit(0))
                         .bitwiseAND(F.col("mask")) != 0).cast("int"))
            .groupBy(key_col)
            .agg((F.sum("hit") == k).alias("maybe_present")))


def bloom_words_to_bitmap(words: DataFrame, m_bits: int = M_BITS):
    """Collect the word table into a dense numpy uint32 bitmap (driver
    memory: m_bits/8 bytes — 1.2 GB at m = 10^10; beyond that use
    :func:`bloom_probe`)."""
    bitmap = np.zeros(m_bits // 32, dtype=np.uint32)
    for r in words.collect():
        bitmap[r["word_idx"]] = np.uint32(r["word"] & 0xFFFFFFFF)
    return bitmap


def with_bloom_maybe(df: DataFrame, bitmap, key_col: str = "key",
                     m_bits: int = M_BITS, k: int = K_HASHES,
                     out_col: str = "maybe_present") -> DataFrame:
    """The zero-shuffle probe: append ``out_col`` (boolean; NULL keys
    probe false) to every row.  Positions are computed JVM-side; the
    Arrow-batched UDF only indexes the broadcast bitmap — numpy work,
    no hashing in Python.  Verdicts are IDENTICAL to
    :func:`bloom_probe` and the DuckDB twin (tested)."""
    _check(m_bits, k)
    if len(bitmap) != m_bits // 32:
        raise ValueError(f"bitmap has {len(bitmap)} words, "
                         f"expected {m_bits // 32}")
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.ascontiguousarray(bitmap, dtype=np.uint32))

    @F.pandas_udf("boolean")
    def probe(pos_lists: pd.Series) -> pd.Series:
        bm = bc.value
        out = np.zeros(len(pos_lists), dtype=bool)
        mask = pos_lists.notna().to_numpy()
        if mask.any():
            pos = np.array(
                [p for p, ok in zip(pos_lists, mask) if ok],
                dtype=np.int64)
            hits = (bm[pos >> 5] >> (pos & 31).astype(np.uint32)) & 1
            out[mask] = hits.all(axis=1)
        return pd.Series(out)

    base = _base_hash()(F.col(key_col))
    return (df.withColumn("__bloom_pos",
                          F.when(F.col(key_col).isNotNull(),
                                 bit_positions(base, m_bits, k)))
            .withColumn(out_col, probe(F.col("__bloom_pos")))
            .drop("__bloom_pos"))


# ---------------------------------------------------------------------------
# DuckDB oracle (same md5 base, same mulmod constants, same bit packing)
# ---------------------------------------------------------------------------

def _duck_pos(j: int, m_bits: int) -> str:
    """Bit position j of base ``x`` — the Mersenne-split mulmod spelled
    in SQL, identical to _perm_hash(BLOOM_J0 + j)."""
    a, b = HASH_A[BLOOM_J0 + j], HASH_B[BLOOM_J0 + j]
    t1 = f"((x >> 30) * {a})"
    hi = f"(({t1} >> 31) + (({t1} & {_MASK31}) << 30))"
    return f"((({hi} + (x & {_MASK30}) * {a} + {b}) % {HASH_P}) % {m_bits})"


def _duck_probes(source: str, key_expr: str, m_bits: int, k: int) -> str:
    pos_list = ", ".join(_duck_pos(j, m_bits) for j in range(k))
    return f"""(
        SELECT key, unnest([{pos_list}]) AS pos
        FROM (SELECT {key_expr} AS key,
                     ('0x' || substr(md5({key_expr}), 1, 15))::BIGINT AS x
              FROM {source} WHERE {key_expr} IS NOT NULL)
    )"""


def duckdb_bloom_words_sql(source: str = "keys", key_expr: str = "key",
                           m_bits: int = M_BITS,
                           k: int = K_HASHES) -> str:
    """Exact build twin -> (word_idx, word)."""
    return f"""
        SELECT pos // 32 AS word_idx,
               bit_or(1::BIGINT << (pos % 32)::INTEGER) AS word
        FROM {_duck_probes(source, key_expr, m_bits, k)}
        GROUP BY 1
    """


def duckdb_bloom_probe_sql(build_source: str, probe_source: str,
                           key_expr: str = "key",
                           m_bits: int = M_BITS,
                           k: int = K_HASHES) -> str:
    """Exact probe twin -> (key, maybe_present) per distinct key."""
    return f"""
        WITH words AS ({duckdb_bloom_words_sql(build_source, key_expr,
                                               m_bits, k)}),
        probes AS (
            SELECT DISTINCT key, pos
            FROM {_duck_probes(probe_source, key_expr, m_bits, k)}
        )
        SELECT p.key,
               bool_and(coalesce(w.word, 0)
                        & (1::BIGINT << (p.pos % 32)::INTEGER) <> 0)
                   AS maybe_present
        FROM probes p
        LEFT JOIN words w ON w.word_idx = p.pos // 32
        GROUP BY p.key
    """
