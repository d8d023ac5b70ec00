"""Benchmark decontamination: flag / strip training documents that
overlap an evaluation set.

Standard pre-training hygiene (GPT-3 appendix C; PaLM; Llama): a
training document is CONTAMINATED if it shares any ``k``-word window
with any benchmark document.  Relational shape:

* the benchmark side is tiny (eval suites are thousands of rows, not
  billions) — its distinct k-grams build once and BROADCAST;
* the corpus side streams through a per-row HOF gram builder (the dedup
  module's zero-shuffle ngrams) and a broadcast LEFT SEMI join marks
  hits — the corpus never shuffles at all, so the operator runs at scan
  speed at 100 TB;
* :func:`contamination_report` keeps per-doc evidence (which grams hit,
  how many) for audit; :func:`decontaminate` returns the clean corpus
  (drop mode — the conservative default used by the published
  pipelines).

Exact DuckDB twin in tests/test_decontaminate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ngrams_over, ws_words_col

K_WORDS = 8  # published pipelines use 8-13 word windows


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
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """The clean corpus: every input column, minus documents sharing any
    k-gram with the benchmark.  Only the EVAL grams carry a broadcast
    hint (small by construction); the contaminated-id set is
    corpus-derived and unbounded — one common boilerplate 8-gram in an
    eval doc can mark a large corpus fraction — so its anti-join is left
    to the planner/AQE, which broadcasts when it measures small and
    shuffles when it does not."""
    contaminated = (_doc_grams(docs, k, id_col, text_col)
                    .join(F.broadcast(benchmark_grams(bench, k, text_col)),
                          "gram")
                    .select(id_col).distinct())
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
