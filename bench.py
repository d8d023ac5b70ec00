"""Benchmark harness (driver-run, one JSON line on stdout).

Measures the flagship extraction pipeline (docs/sec over the deterministic
interleaved corpus at the tier's size) plus headline operator queries at
``$SPARK_GRAFT_SF_DIR`` on ``local[$SPARK_GRAFT_CPUS]``.

The corpus parquet is generated once per SF into .bench_cache/ (seed=42,
fully deterministic) so the measured path is a real parquet scan ->
pipeline -> noop sink, with no driver-side collect.

Scaling evidence (local[8] vs local[32], BASELINE.json criterion) lives in
tools/scaling_bench.py and is reported in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "q01_pricing_summary", "q06_revenue_by_nation", "q08_word_counts",
    "q13_minhash_signatures", "q15_simhash", "q17_text_quality",
    "q21_knn_bruteforce", "q25_sessionization", "q34_ann_ivf",
    "q35_dedup_groups", "q40_main_content", "q41_layout_reading_order",
    "q42_asof_join", "q43_range_join", "q44_bm25_topk",
    "q45_bpe_pretokenize", "q46_stratified_sample", "q47_frame_samples",
    "q48_tfidf_classifier", "q53_rollup_maintenance",
]


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


# the pipeline bench corpus is BENCH_CORPUS_MULT × the tier's test corpus:
# at 32 cores a 3000-doc run is fixed-overhead-bound; 10× amortizes it so
# docs/sec reflects steady-state per-core throughput (generation is cached)
BENCH_CORPUS_MULT = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "10"))


def corpus_path(sf: float, n_docs: int) -> str:
    from ocr_documents_spark.fixtures.gen import write_docs_parquet
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"docs_sf{sf}_n{n_docs}")
    if not os.path.isdir(path):
        write_docs_parquet(path, n_docs)
    return path


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_from_dir(sf_dir)

    from ocr_documents_spark.fixtures.gen import docs_for_sf
    from ocr_documents_spark.pipeline import read_docs, run_pipeline
    from ocr_documents_spark.queries import QUERIES
    from ocr_documents_spark.session import get_spark

    spark = get_spark("ocr-documents-bench")
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = docs_for_sf(sf) * BENCH_CORPUS_MULT
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # warm up once: JVM, parquet codepath, Python UDF workers (fork +
    # pandas/pyarrow/extractor imports per core), shuffle machinery, and
    # codegen for every stage shape the pipeline uses — a long-running
    # cluster pays all of this once per executor, not per job
    from ocr_documents_spark.fixtures.gen import generate_docs
    from ocr_documents_spark.pipeline import DOCS_SCHEMA
    warm_rows = [(d["doc_id"],
                  [(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in d["spans"]])
                 for d in generate_docs(cpus * 4)]
    warm_docs = spark.createDataFrame(warm_rows, DOCS_SCHEMA).repartition(cpus)
    materialize(run_pipeline(warm_docs, heavy_threshold=4))

    # the corpus dir is a few MB standing in for a many-thousand-file lake:
    # shrink split sizes for this scan only so it fans out like the real one
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 << 10))
    docs = read_docs(spark, corpus_path(sf, n_docs))
    docs.count()

    def best_of(df_factory, runs: int = 2) -> float:
        # best-of-2: the first run pays one-time whole-stage-codegen JIT
        # compilation for the stage shapes, which a long-lived cluster pays
        # once per query shape, not per submission
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(df_factory())
            best = min(best, time.perf_counter() - t0)
        return best

    timings: dict[str, float] = {}

    extract_sec = best_of(lambda: run_pipeline(docs))
    timings["extract_pipeline"] = round(extract_sec, 3)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 << 20))

    for name in HEADLINE_QUERIES:
        timings[name] = round(
            best_of(lambda: QUERIES[name](spark, sf_dir)), 3)

    # IVF quality readout: recall@3 of the trained-quantizer ANN (q34,
    # nprobe cells probed) against the exact brute-force baseline (q21)
    from ocr_documents_spark.operators.ivf import K_CELLS, NPROBE
    bf = {(r["query_id"], r["neighbor_id"])
          for r in QUERIES["q21_knn_bruteforce"](spark, sf_dir).collect()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in QUERIES["q34_ann_ivf"](spark, sf_dir).collect()}
    recall = round(len(bf & ivf) / len(bf), 4) if bf else None

    # round-3 curation operators, timed OUTSIDE the stable 21-query suite
    # (so round-over-round suite wall / docs_per_sec stay comparable);
    # each runs over the tier's documents/embeddings tables
    from pyspark.sql import functions as F  # noqa: N812
    from ocr_documents_spark.operators.decontaminate import decontaminate
    from ocr_documents_spark.operators.mixing import domain_weighted_sample
    from ocr_documents_spark.operators.packing import pack_sequences
    from ocr_documents_spark.operators.quality_filters import \
        quality_filter_report
    from ocr_documents_spark.operators.line_dedup import \
        remove_common_lines
    from ocr_documents_spark.operators.ngram_lm import (
        dsir_select, perplexity_scores, quality_tiers, tier_thresholds,
        train_lm_counts)
    from ocr_documents_spark.operators.pq import (build_ivfpq_index,
                                                  ivfpq_query, ivfpq_topk)
    from ocr_documents_spark.operators.ivf import (sub_k_for,
                                                   train_two_level)
    from ocr_documents_spark.operators.semdedup import (
        semantic_dedup_groups, semantic_dedup_groups_two_level)
    from ocr_documents_spark.operators.substring_dedup import \
        remove_duplicate_spans
    from ocr_documents_spark.operators.zorder import cluster_by_zorder
    from ocr_documents_spark.operators.heavy_hitters import heavy_hitters
    from ocr_documents_spark.operators.normalize import normalize_docs
    from ocr_documents_spark.operators.bpe import (encode_docs,
                                                   learn_bpe_merges,
                                                   word_census)
    from ocr_documents_spark.operators.bloom import (bloom_build,
                                                     bloom_probe,
                                                     bloom_words_to_bitmap,
                                                     with_bloom_maybe)
    from ocr_documents_spark.operators.dedup import fingerprint15
    from ocr_documents_spark.operators.linear_classifier import (
        score_docs, train_linear_classifier)
    from ocr_documents_spark.operators.mixing import token_budget_sample
    from ocr_documents_spark.operators.semantic_decontaminate import (
        semantic_decontaminate)
    from ocr_documents_spark.operators.urls import cap_per_host
    from ocr_documents_spark.operators.graph import pagerank

    tbl = lambda name: spark.read.parquet(f"{sf_dir}/{name}.parquet")  # noqa: E731
    bench_docs = tbl("documents").select("doc_id", "text")
    eval_set = (tbl("documents").filter(F.col("doc_id") % 97 == 0)
                .select((F.col("doc_id") + 10**9).alias("bench_id"), "text"))
    emb_tbl = tbl("embeddings").select("vec_id", "embedding")
    extra_factories = {
        "substring_dedup": lambda: remove_duplicate_spans(bench_docs, k=8),
        "quality_report": lambda: quality_filter_report(tbl("documents")),
        "semdedup": lambda: semantic_dedup_groups(emb_tbl),
        "semdedup_two_level": lambda: semantic_dedup_groups_two_level(
            emb_tbl),
        # steady-state semantic dedup: codebooks trained once outside
        # the timer (encode-daily/retrain-on-drift, like ivfpq_query);
        # the recurring cost is assignment + within-cell pairing + CC
        "semdedup_assign": (lambda cbs=train_two_level(
            emb_tbl, sub_k_for(emb_tbl.count())):
            semantic_dedup_groups_two_level(emb_tbl, codebooks=cbs)),
        "ivfpq_topk": lambda: ivfpq_topk(
            emb_tbl, F.col("vec_id") < 5, F.col("vec_id") >= 5),
        # steady-state production ANN: index built once outside the
        # timer, queries probe the materialized codes table
        "ivfpq_query": (lambda index=build_ivfpq_index(
            emb_tbl, F.col("vec_id") >= 5):
            ivfpq_query(index, emb_tbl.filter(F.col("vec_id") < 5))),
        "decontaminate": lambda: decontaminate(bench_docs, eval_set, k=8),
        # the embedding-space complement: eval items are perturbed
        # copies (paraphrase stand-ins) of every 97th corpus vector
        "semantic_decontaminate": lambda: semantic_decontaminate(
            emb_tbl,
            emb_tbl.filter(F.col("vec_id") % 97 == 0).select(
                "vec_id",
                F.transform("embedding", lambda v: v * 0.99 + 0.003)
                .alias("embedding"))),
        "domain_mixing": lambda: domain_weighted_sample(
            tbl("documents"), {f"src{i}": 0.05 * i for i in range(20)}),
        "pack_sequences": lambda: pack_sequences(bench_docs, 2048),
        "line_dedup": lambda: remove_common_lines(bench_docs),
        # tokenizer learned once outside the timer (one-shot, census-
        # bounded); the steady-state cost is encoding the corpus with it
        "bpe_encode": (lambda merges=learn_bpe_merges(
            word_census(bench_docs, top_words=5000), 200):
            encode_docs(bench_docs, merges)),
        "normalize_nfc": lambda: normalize_docs(bench_docs),
        "heavy_hitters": lambda: heavy_hitters(
            tbl("events").select("user_id"), "user_id", k=256),
        "zorder_layout": lambda: cluster_by_zorder(
            tbl("events").select("event_id", "user_id"),
            ["event_id", "user_id"], n_files=32),
        "perplexity_tiers": lambda: (lambda scored: quality_tiers(
            scored, tier_thresholds(scored)))(perplexity_scores(
                bench_docs, train_lm_counts(bench_docs, sample_mod=4))),
        # membership pre-filter: the history filter BUILD is the
        # corpus-scale one-time cost; the steady-state PROBE runs with
        # the bitmap already collected (like ivfpq_query vs ivfpq_topk)
        "bloom_build": lambda: bloom_build(
            bench_docs.select(fingerprint15(F.col("text")).alias("key")),
            "key"),
        "bloom_probe": (lambda bitmap=bloom_words_to_bitmap(bloom_build(
            bench_docs.select(fingerprint15(F.col("text")).alias("key")),
            "key")): with_bloom_maybe(
                bench_docs.select(
                    "doc_id", fingerprint15(F.col("text")).alias("key")),
                bitmap, "key")),
        # the beyond-driver-memory design point: at m = 10^10 bits the
        # word table cannot be a bitmap and the probe is a relational
        # join.  Exercised here at m = 2^26 with broadcast=False so the
        # measured plan IS the shuffle-join fallback (word table built
        # once outside the timer, the steady-state split all index
        # structures get)
        "bloom_probe_relational": (lambda words=bloom_build(
            bench_docs.select(fingerprint15(F.col("text")).alias("key")),
            "key", m_bits=1 << 26).localCheckpoint():
            bloom_probe(
                bench_docs.select(fingerprint15(F.col("text")).alias("key")),
                words, "key", m_bits=1 << 26, broadcast=False)),
        # trained-filter deployment split: TRAIN on a labeled seed
        # (one-time), SCORE the corpus (steady state, relational path)
        "classifier_train": lambda: train_linear_classifier(
            bench_docs.withColumn(
                "label", (F.col("doc_id") % 2).cast("int")), iters=4),
        "classifier_score": (lambda w=train_linear_classifier(
            bench_docs.withColumn(
                "label", (F.col("doc_id") % 2).cast("int")),
            iters=4).localCheckpoint():
            score_docs(bench_docs, w)),
        "token_budget_mix": lambda: token_budget_sample(
            tbl("documents").select("doc_id", "text", "source"),
            {f"src{i}": 2000 * (i + 1) for i in range(20)}),
        "url_host_cap": lambda: cap_per_host(
            tbl("documents").select(
                "doc_id",
                F.concat(F.lit("https://"), F.col("source"),
                         F.lit(".example.com/doc/"), F.col("doc_id"),
                         F.lit("?v=1&utm_source=bench")).alias("url")),
            cap=100),
        # synthetic host graph at the tier's document count: ~1k hosts,
        # one out-link per doc (a web host graph is node-small relative
        # to the corpus; the rank job's cost is the iteration loop)
        "host_pagerank": lambda: pagerank(
            tbl("documents").select(
                F.concat(F.lit("h"), F.col("doc_id") % 997).alias("src"),
                F.concat(F.lit("h"),
                         (F.col("doc_id") * 31 + 7) % 997).alias("dst"))),
        "dsir_select": lambda: dsir_select(
            bench_docs,
            train_lm_counts(tbl("documents")
                            .filter(F.col("source") == "src3")
                            .select("doc_id", "text")),
            train_lm_counts(bench_docs, sample_mod=4), k=100),
    }
    extras = {name: round(best_of(fn), 3)
              for name, fn in extra_factories.items()}

    # the composed end-to-end curation job (scrub -> quality -> dedup ->
    # decontaminate -> pack) — regressions in the funnel as a whole, not
    # just its stages; run_curation executes its own actions, so one
    # timed pass (it localCheckpoints between stages internally)
    from ocr_documents_spark.jobs.curate import run_curation
    t0 = time.perf_counter()
    curate_funnel = run_curation(
        spark, tbl("documents").select("doc_id", "text", "source"),
        bench=eval_set)
    extras["curate_e2e"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "extraction+operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / extract_sec, 1),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "ivf_recall_at_3": recall,
        "ivf_config": {"k_cells": K_CELLS, "nprobe": NPROBE},
        "extra_ops_sec": extras,
        "curate_funnel": curate_funnel,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
