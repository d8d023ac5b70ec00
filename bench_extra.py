"""Subset benchmark harness for the optimization round (guide §1.4).

`bench.py` is FROZEN for driver measurement; this file exists so
individual queries/extra ops can be timed in isolation with the same
methodology (noop sink, best-of-N) without paying the full-suite wall
time per iteration.  Results quoted in OPTIMIZATION_r06.md cite this
harness.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        q40_main_content q43_range_join [--runs 2]

Extra ops (the bench.py extra_factories shapes) are addressed as
x:<name>, e.g. x:semdedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def extra_factories(spark, sf_dir):
    """The same shapes bench.py times as extra_ops_sec (kept in sync by
    hand; bench.py itself is frozen)."""
    from pyspark.sql import functions as F  # noqa: N812
    from ocr_documents_spark.operators.decontaminate import decontaminate
    from ocr_documents_spark.operators.mixing import (domain_weighted_sample,
                                                      token_budget_sample)
    from ocr_documents_spark.operators.packing import pack_sequences
    from ocr_documents_spark.operators.quality_filters import \
        quality_filter_report
    from ocr_documents_spark.operators.line_dedup import remove_common_lines
    from ocr_documents_spark.operators.ngram_lm import (
        dsir_select, perplexity_scores, quality_tiers, tier_thresholds,
        train_lm_counts)
    from ocr_documents_spark.operators.pq import (build_ivfpq_index,
                                                  ivfpq_query, ivfpq_topk)
    from ocr_documents_spark.operators.ivf import sub_k_for, train_two_level
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
    from ocr_documents_spark.operators.bloom import (bloom_build, bloom_probe,
                                                     bloom_words_to_bitmap,
                                                     with_bloom_maybe)
    from ocr_documents_spark.operators.dedup import fingerprint15
    from ocr_documents_spark.operators.linear_classifier import (
        score_docs, train_linear_classifier)
    from ocr_documents_spark.operators.semantic_decontaminate import \
        semantic_decontaminate
    from ocr_documents_spark.operators.urls import cap_per_host
    from ocr_documents_spark.operators.graph import pagerank

    tbl = lambda name: spark.read.parquet(f"{sf_dir}/{name}.parquet")  # noqa: E731
    bench_docs = tbl("documents").select("doc_id", "text")
    eval_set = (tbl("documents").filter(F.col("doc_id") % 97 == 0)
                .select((F.col("doc_id") + 10**9).alias("bench_id"), "text"))
    emb_tbl = tbl("embeddings").select("vec_id", "embedding")
    return {
        "substring_dedup": lambda: remove_duplicate_spans(bench_docs, k=8),
        "quality_report": lambda: quality_filter_report(tbl("documents")),
        "semdedup": lambda: semantic_dedup_groups(emb_tbl),
        "semdedup_two_level": lambda: semantic_dedup_groups_two_level(
            emb_tbl),
        "semdedup_assign": (lambda cbs=train_two_level(
            emb_tbl, sub_k_for(emb_tbl.count())):
            semantic_dedup_groups_two_level(emb_tbl, codebooks=cbs)),
        "ivfpq_topk": lambda: ivfpq_topk(
            emb_tbl, F.col("vec_id") < 5, F.col("vec_id") >= 5),
        "ivfpq_query": (lambda index=build_ivfpq_index(
            emb_tbl, F.col("vec_id") >= 5):
            ivfpq_query(index, emb_tbl.filter(F.col("vec_id") < 5))),
        "decontaminate": lambda: decontaminate(bench_docs, eval_set, k=8),
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
        "bloom_build": lambda: bloom_build(
            bench_docs.select(fingerprint15(F.col("text")).alias("key")),
            "key"),
        "bloom_probe": (lambda bitmap=bloom_words_to_bitmap(bloom_build(
            bench_docs.select(fingerprint15(F.col("text")).alias("key")),
            "key")): with_bloom_maybe(
                bench_docs.select(
                    "doc_id", fingerprint15(F.col("text")).alias("key")),
                bitmap, "key")),
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


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ocr_documents_spark.queries import QUERIES
    from ocr_documents_spark.session import get_spark

    spark = get_spark("bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    extras = None
    timings = {}
    for name in args:
        if name.startswith("x:"):
            if extras is None:
                extras = extra_factories(spark, sf_dir)
            fn = extras[name[2:]]
        else:
            fn = lambda n=name: QUERIES[n](spark, sf_dir)
        best, samples = float("inf"), []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            materialize(fn())
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        timings[name] = {"best": round(best, 3), "samples": samples}
        print(json.dumps({name: timings[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
