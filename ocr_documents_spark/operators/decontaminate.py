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
    from ..functions.fanout import fan_out
    # the split + k-gram build + per-row distinct run map-side before
    # any exchange — fan out a one-split scan (no-op on a real lake)
    return (fan_out(docs, id_col)
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


def contamination_fractions(docs: DataFrame, bench: DataFrame,
                            k: int = K_WORDS, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_grams, n_hit, overlap_ppm) for every doc WITH
    grams (docs shorter than k words have no gram surface and are never
    contaminated).  overlap_ppm is integer half-up — the house
    cross-engine rounding — but threshold decisions in
    :func:`decontaminate` never divide at all (pure integer cross-
    multiplication), so the ppm column is audit-only."""
    dg = _doc_grams(docs, k, id_col, text_col)
    totals = dg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (dg.join(F.broadcast(benchmark_grams(bench, k, text_col)),
                    "gram")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hit")))
    return (totals.join(hits, id_col, "left")
            .select(id_col, "n_grams",
                    F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
                    F.floor((F.coalesce("n_hit", F.lit(0)) * 2_000_000
                             + F.col("n_grams"))
                            / (2 * F.col("n_grams"))).cast("long")
                    .alias("overlap_ppm")))


def decontaminate(docs: DataFrame, bench: DataFrame, k: int = K_WORDS,
                  id_col: str = "doc_id", text_col: str = "text",
                  mode: str = "broadcast",
                  broadcast_gram_limit: int = BROADCAST_GRAM_LIMIT,
                  max_overlap_ppm: int | None = None) -> DataFrame:
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
    only) and pick.

    ``max_overlap_ppm`` switches from the any-hit rule (GPT-3 appendix
    C, the conservative default) to the overlap-FRACTION rule
    (PaLM-style): a doc is dropped only when hit_grams/doc_grams
    exceeds the threshold.  The comparison is pure integer
    cross-multiplication (n_hit · 10⁶ > ppm · n_grams) — no division,
    no rounding, engine-identical by construction.

    In every mode the contaminated-id set is
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
    if max_overlap_ppm is None:
        contaminated = hits.select(id_col).distinct()
    else:
        totals = dg.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("__n"))
        contaminated = (hits.groupBy(id_col)
                        .agg(F.count(F.lit(1)).alias("__h"))
                        .join(totals, id_col)
                        .filter(F.col("__h") * 1_000_000
                                > F.lit(int(max_overlap_ppm))
                                * F.col("__n"))
                        .select(id_col))
    return docs.join(contaminated, id_col, "left_anti")


def duckdb_fraction_kept_sql(k: int = K_WORDS,
                             max_overlap_ppm: int = 700_000) -> str:
    """Exact twin of :func:`decontaminate` with ``max_overlap_ppm`` over
    views documents(doc_id, text) / bench(bench_id, text) -> the KEPT
    doc_ids (same integer cross-multiplication, no division)."""
    leads = " || ' ' || ".join(
        ["word"] + [f"lead(word, {j}) OVER w" for j in range(1, k)])
    return f"""
        WITH dt AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> '')) AS word,
                   generate_subscripts(
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> ''), 1) AS pos
            FROM documents
        ), dg AS (
            SELECT DISTINCT doc_id, g AS gram FROM (
                SELECT doc_id, {leads} AS g FROM dt
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
            WHERE g IS NOT NULL
        ), bt AS (
            SELECT bench_id,
                   unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> '')) AS word,
                   generate_subscripts(
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> ''), 1) AS pos
            FROM bench
        ), bg AS (
            SELECT DISTINCT g AS gram FROM (
                SELECT bench_id, {leads} AS g FROM bt
                WINDOW w AS (PARTITION BY bench_id ORDER BY pos))
            WHERE g IS NOT NULL
        ), tot AS (
            SELECT doc_id, count(*) AS n FROM dg GROUP BY 1
        ), hit AS (
            SELECT d.doc_id, count(*) AS h
            FROM dg d JOIN bg USING (gram) GROUP BY 1
        )
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (
            SELECT t.doc_id FROM tot t JOIN hit h USING (doc_id)
            WHERE h.h * 1000000 > {int(max_overlap_ppm)} * t.n)
    """


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
