"""Benchmark decontamination: flag / strip training documents that
overlap an evaluation set.

Standard pre-training hygiene (GPT-3 appendix C; PaLM; Llama): a
training document is CONTAMINATED if it shares any ``k``-word window
with any benchmark document.  Relational shape:

* the benchmark side is usually tiny (eval suites are thousands of
  rows, not billions) — its distinct k-grams build once and BROADCAST;
* the corpus side streams through a per-row HOF gram builder (the dedup
  module's zero-shuffle ngrams) and a broadcast LEFT SEMI join marks
  hits — the corpus never shuffles at all, so the operator runs at scan
  speed at 100 TB;
* when the eval suite is NOT broadcast-sized (a consolidated eval
  registry of thousands of benchmarks), ``mode="shuffle"`` switches to
  a hash-partitioned join on the 15-hex md5 gram FINGERPRINT (the same
  primitive substring_dedup's census shuffles): both sides shuffle
  fixed-width 15-byte keys instead of k-word strings, and the planner /
  AQE picks the join strategy unforced.  ``mode="auto"`` counts the
  eval grams (an action on the SMALL side only) and picks;
* :func:`contamination_report` keeps per-doc evidence (which grams hit,
  how many) for audit; :func:`decontaminate` returns the clean corpus
  (drop mode — the conservative default used by the published
  pipelines).

Exact DuckDB twin in tests/test_decontaminate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fingerprint15 as _fp, ngrams_over, ws_words_col

K_WORDS = 8  # published pipelines use 8-13 word windows
# mode="auto" broadcasts the eval grams below this count (~15 bytes/fp
# hashed + string payload; 3M grams is comfortably under the default
# 8GB broadcast-table ceiling) and shuffles fingerprints above it
BROADCAST_GRAM_LIMIT = 3_000_000


def _doc_grams(docs: DataFrame, k: int, id_col: str,
               text_col: str) -> DataFrame:
    return (docs
            .select(id_col, ws_words_col(text_col).alias("ws"))
            .filter(F.size("ws") >= k)
            .select(id_col,
                    F.explode(F.array_distinct(
                        ngrams_over(F.col("ws"), k))).alias("gram")))


def benchmark_grams(bench: DataFrame, k: int = K_WORDS,
                    text_col: str = "text") -> DataFrame:
    """-> one-column (gram) table of the eval set's distinct k-grams.
    Small by construction; persist/broadcast it."""
    return (bench
            .select(ws_words_col(text_col).alias("ws"))
            .filter(F.size("ws") >= k)
            .select(F.explode(ngrams_over(F.col("ws"), k)).alias("gram"))
            .distinct())


def benchmark_gram_fps(bench: DataFrame, k: int = K_WORDS,
                       text_col: str = "text") -> DataFrame:
    """-> one-column (gram_fp) distinct fingerprints of the eval set's
    k-grams — the eval-registry-scale twin of :func:`benchmark_grams`:
    per-row dedup (array_distinct) runs scan-side, the global distinct
    shuffles 15-byte fingerprints only, never the raw gram string."""
    return (bench
            .select(ws_words_col(text_col).alias("ws"))
            .filter(F.size("ws") >= k)
            .select(F.explode(F.array_distinct(
                ngrams_over(F.col("ws"), k))).alias("gram"))
            .select(_fp("gram").alias("gram_fp"))
            .distinct())


def contamination_report(docs: DataFrame, bench: DataFrame,
                         k: int = K_WORDS, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_hit_grams, sample_hits[<=3]) for CONTAMINATED docs
    only.  The audit artifact: which documents to quarantine and why."""
    hits = (_doc_grams(docs, k, id_col, text_col)
            .join(F.broadcast(benchmark_grams(bench, k, text_col)), "gram"))
    return (hits.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hit_grams"),
                 F.slice(F.array_sort(F.collect_list("gram")), 1, 3)
                 .alias("sample_hits")))


def decontaminate(docs: DataFrame, bench: DataFrame, k: int = K_WORDS,
                  id_col: str = "doc_id", text_col: str = "text",
                  mode: str = "broadcast",
                  broadcast_gram_limit: int = BROADCAST_GRAM_LIMIT
                  ) -> DataFrame:
    """The clean corpus: every input column, minus documents sharing any
    k-gram with the benchmark.

    ``mode="broadcast"`` (default): the EVAL grams carry a broadcast
    hint (small by construction) and the corpus side never shuffles.
    ``mode="shuffle"``: eval-registry scale — both sides reduce their
    grams to the 15-hex md5 fingerprint scan-side and join on the
    fixed-width key with NO forced strategy (AQE picks; the shuffled
    payload is 15 bytes per gram, not the k-word string).  The drop set
    is identical either way — the fingerprint only re-keys the join
    (collision budget as in substring_dedup: ~n²/2^61 false pairs,
    each dropping one extra doc — conservative in drop-mode hygiene).
    ``mode="auto"``: count the eval grams (an action on the small side
    only) and pick.  In every mode the contaminated-id set is
    corpus-derived and unbounded — one common boilerplate 8-gram in an
    eval doc can mark a large corpus fraction — so its anti-join is
    left to the planner/AQE, which broadcasts when it measures small
    and shuffles when it does not."""
    if mode == "auto":
        # the count action touches fingerprints only (15 bytes/row)
        mode = ("broadcast"
                if benchmark_gram_fps(bench, k, text_col).count()
                <= broadcast_gram_limit else "shuffle")
    dg = _doc_grams(docs, k, id_col, text_col)
    if mode == "broadcast":
        hits = dg.join(F.broadcast(benchmark_grams(bench, k, text_col)),
                       "gram")
    elif mode == "shuffle":
        hits = (dg.select(id_col, _fp("gram").alias("gram_fp"))
                .join(benchmark_gram_fps(bench, k, text_col), "gram_fp"))
    else:
        raise ValueError(f"unknown decontaminate mode: {mode!r}")
    contaminated = hits.select(id_col).distinct()
    return docs.join(contaminated, id_col, "left_anti")


def duckdb_contamination_sql(k: int = K_WORDS) -> str:
    """Exact twin over views documents(doc_id, text) and
    bench(bench_id, text) -> (doc_id, n_hit_grams, sample_hits)."""
    def gram_cte(src: str, idc: str, name: str, keep_id: bool) -> str:
        leads = " || ' ' || ".join(
            ["word"] + [f"lead(word, {j}) OVER w" for j in range(1, k)])
        out_id = f"{idc}, " if keep_id else ""
        return f"""{name}_t AS (
            SELECT {idc},
                   unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> '')) AS word,
                   generate_subscripts(
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> ''), 1) AS pos
            FROM {src}
        ), {name} AS (
            SELECT DISTINCT {out_id}g AS gram FROM (
                SELECT {idc}, {leads} AS g
                FROM {name}_t
                WINDOW w AS (PARTITION BY {idc} ORDER BY pos))
            WHERE g IS NOT NULL
        )"""
    return f"""
        WITH {gram_cte('documents', 'doc_id', 'dg', True)},
        {gram_cte('bench', 'bench_id', 'bg', False)},
        hits AS (
            SELECT d.doc_id, d.gram FROM dg d JOIN bg b USING (gram)
        )
        SELECT doc_id, count(*) AS n_hit_grams,
               (list_sort(list(gram)))[1:3] AS sample_hits
        FROM hits GROUP BY doc_id
    """
