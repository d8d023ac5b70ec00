"""Exact duplicate-substring removal (Lee et al., ACL 2022:
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr variant, re-expressed relationally).

Document-level near-dup (operators/dedup.py) keeps one copy of
near-identical DOCUMENTS; this operator removes duplicated PASSAGES that
hide inside otherwise-distinct documents (boilerplate paragraphs, quoted
licenses, templated intros).  Semantics:

* every window of ``k`` consecutive words that occurs more than once in
  the corpus is "duplicated";
* the FIRST occurrence in (doc_id, position) order is canonical and
  stays; every other occurrence's token span [pos, pos+k) is removed;
* overlapping removed spans within a document merge into islands, and
  the document is rebuilt from its surviving tokens in order.

The reference paper builds a corpus-wide suffix array; at Spark scale
the same answer falls out of pure relational ops sharded by the gram:

1. tokenize with positions (posexplode — the only row expansion);
2. k-gram per start position via array HOFs (zero shuffle, the dedup
   module's ngram builder);
3. gram occurrence census: one groupBy over the gram FINGERPRINT
   (first 15 md5 hex digits — the house-style cross-engine hash)
   carrying count + the min (doc_id, pos) struct — this is the
   suffix-array replacement, a partial-aggregatable shuffle on a
   FIXED-WIDTH key.  The raw k-word gram string (k=20 in production ≈
   100–150 bytes per token position ≈ 20× the corpus bytes) is hashed
   scan-side and never shuffled; at 100 TB the census/join payload is
   15 bytes per position instead.  Collision budget: 60-bit
   fingerprints over ~10^13 token positions collide on ~4×10^7 pairs
   (birthday n²/2^61), each falsely marking one k-gram span — a
   ~4×10^-6 fraction of corpus token mass, the standard trade every
   hash-based ExactSubstr sharding makes (Lee et al. hash suffixes
   too).  Long grams also make hot keys rare by construction;
4. non-canonical occurrences -> per-doc interval merge (gaps-and-
   islands window over the doc's few duplicate spans, not its tokens);
5. islands explode to drop-positions (exactly the duplicated token
   mass), tokens anti-join them, and concat_ws(array_sort(...))
   rebuilds the text per row.

Every step has an exact DuckDB twin (tests/test_substring_dedup.py)
including the rebuilt text, so the operator's output is value-checked,
not just shape-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import fingerprint15, ngrams_over, ws_words_col

# whitespace-wide tokens (shared ws_words_col): a duplicated passage
# must match whether a line break or a space separates its words in
# each copy; the rebuilt text therefore normalizes whitespace to
# single spaces.

K_WORDS = 20  # production default; Lee et al. use 50 BPE tokens


def _token_table(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (docs
            .select(id_col, ws_words_col(text_col).alias("ws"))
            .select(id_col, F.posexplode("ws").alias("pos", "word")))


def duplicate_spans(docs: DataFrame, k: int = K_WORDS,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """-> (doc_id, pos) of every NON-CANONICAL duplicated k-gram start.

    The census groupBy carries ``min(struct(doc_id, pos))`` so canonical
    selection is a by-product of the same aggregate that counts — no
    second pass, no window over the corpus.  The gram is reduced to its
    15-hex md5 fingerprint BEFORE the shuffle (see module docstring for
    the payload math and collision budget); the raw string exists only
    scan-side, inside the project the fingerprint collapses into.
    """
    from ..functions.fanout import cpu_parts
    grams = (docs
             .select(id_col, ws_words_col(text_col).alias("ws"))
             .filter(F.size("ws") >= k)
             # materialization barrier: stop Project-collapse re-inlining
             # the split per gram element.  EXPLICIT count: a keyed
             # repartition with no count is AQE-coalescible back to one
             # partition, serializing the CPU-heavy gram+md5 stage
             .repartition(cpu_parts(docs), id_col)
             .select(id_col,
                     F.posexplode(ngrams_over(F.col("ws"), k))
                     .alias("pos", "gram"))
             .select(id_col, "pos",
                     fingerprint15(F.col("gram")).alias("gram_fp")))
    census = (grams.groupBy("gram_fp")
              .agg(F.count(F.lit(1)).alias("occ"),
                   F.min(F.struct(F.col(id_col), F.col("pos")))
                   .alias("first")))
    return (grams
            .join(census.filter(F.col("occ") > 1), "gram_fp")
            .filter(F.struct(F.col(id_col), F.col("pos"))
                    != F.col("first"))
            .select(id_col, "pos"))


def remove_duplicate_spans(docs: DataFrame, k: int = K_WORDS,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """The deliverable: -> (doc_id, clean_text, n_tokens, n_dropped).

    Interval merge BEFORE the position explode: a duplicated run of
    length L holds L-k+1 overlapping gram starts, but after the
    gaps-and-islands merge the explode emits exactly the run's L
    positions — the duplicated token mass, not k times it.  The island
    window partitions by doc over the doc's duplicate spans only
    (corpus tokens never enter a window).
    """
    spans = duplicate_spans(docs, k, id_col, text_col) \
        .withColumn("end", F.col("pos") + k)
    w_prev = (Window.partitionBy(id_col).orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy(id_col).orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, 0))
    islands = (spans
               .withColumn("prev_max_end", F.max("end").over(w_prev))
               .withColumn("new_island",
                           (F.col("prev_max_end").isNull()
                            | (F.col("pos") > F.col("prev_max_end")))
                           .cast("int"))
               .withColumn("island", F.sum("new_island").over(w_run))
               .groupBy(id_col, "island")
               .agg(F.min("pos").alias("start"), F.max("end").alias("end")))
    drop_pos = islands.select(
        id_col, F.explode(F.sequence(F.col("start"), F.col("end") - 1))
        .alias("pos"))

    toks = _token_table(docs, id_col, text_col)
    kept = toks.join(drop_pos, [id_col, "pos"], "left_anti")
    n_drop = (drop_pos.groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_dropped")))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.concat_ws(
                        " ",
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "word"))),
                            lambda t: t["word"]))
                    .alias("clean_text"),
                    F.count(F.lit(1)).alias("n_tokens")))
    return (docs.select(id_col)
            .join(rebuilt, id_col, "left")
            .join(n_drop, id_col, "left")
            .select(id_col,
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_dropped", F.lit(0)).alias("n_dropped")))


# ---------------------------------------------------------------------------
# DuckDB oracle (same math, string SQL)
# ---------------------------------------------------------------------------

def duckdb_remove_duplicate_spans_sql(k: int = K_WORDS) -> str:
    """Exact SQL twin over a ``documents(doc_id, text)`` view, ending in
    (doc_id, clean_text, n_tokens, n_dropped)."""
    leads = " || ' ' || ".join(
        ["word"] + [f"lead(word, {j}) OVER w" for j in range(1, k)])
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   generate_subscripts(
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> ''), 1) - 1 AS pos,
                   unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> '')) AS word
            FROM documents
        ), grams AS (
            SELECT doc_id, pos, {leads} AS gram
            FROM toks
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ), gv AS (
            SELECT doc_id, pos, substr(md5(gram), 1, 15) AS gram_fp
            FROM grams WHERE gram IS NOT NULL
              AND pos + {k} <= (SELECT count(*) FROM toks t
                                WHERE t.doc_id = grams.doc_id)
        ), census AS (
            SELECT gram_fp, count(*) AS occ,
                   min(ROW(doc_id, pos)) AS first
            FROM gv GROUP BY gram_fp
        ), dups AS (
            SELECT g.doc_id, g.pos, g.pos + {k} AS e
            FROM gv g JOIN census c USING (gram_fp)
            WHERE c.occ > 1 AND ROW(g.doc_id, g.pos) <> c.first
        ), isl AS (
            SELECT doc_id, pos, e,
                   CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) IS NULL
                         OR pos > max(e) OVER (PARTITION BY doc_id
                            ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS ni
            FROM dups
        ), isl2 AS (
            SELECT doc_id, pos, e,
                   sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS island
            FROM isl
        ), merged AS (
            SELECT doc_id, island, min(pos) AS s, max(e) AS e
            FROM isl2 GROUP BY 1, 2
        ), drop_pos AS (
            SELECT doc_id, unnest(range(s, e)) AS pos FROM merged
        ), kept AS (
            SELECT t.doc_id, t.pos, t.word
            FROM toks t LEFT JOIN drop_pos d
              ON t.doc_id = d.doc_id AND t.pos = d.pos
            WHERE d.pos IS NULL
        ), rebuilt AS (
            SELECT doc_id,
                   string_agg(word, ' ' ORDER BY pos) AS clean_text,
                   count(*) AS n_tokens
            FROM kept GROUP BY doc_id
        ), dropped AS (
            SELECT doc_id, count(*) AS n_dropped FROM drop_pos
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(r.clean_text, '') AS clean_text,
               coalesce(r.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(p.n_dropped, 0)::BIGINT AS n_dropped
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN rebuilt r USING (doc_id)
        LEFT JOIN dropped p USING (doc_id)
    """
