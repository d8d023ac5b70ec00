"""End-to-end training-data curation job: the corpus-to-training-set
pipeline, composed from the operator modules this engine ships.

    spark-submit --py-files engine.zip ocr_documents_spark/jobs/curate.py \
        --input /lake/documents --out /lake/curated \
        --bench /lake/eval_set --seq-len 2048

Stage order (each stage's input is the previous stage's survivors, and
each emits one row in the funnel metrics):

0. **normalize** (optional, ``normalize=True``) — control-char scrub +
   NFC pinning (operators/normalize): encoding hygiene BEFORE anything
   hashes text, so byte-variant duplicates of the same visible string
   cannot dodge exact/near dedup or decontamination;
1. **scrub** — PII masking (operators/pii): per-row regexp chain, the
   text every later stage sees is already masked;
1b. **line_dedup** (optional, ``strip_boilerplate=True``) — corpus-wide
   repeated-line removal (operators/line_dedup): boilerplate lines
   occurring in many documents are stripped before quality scoring
   sees them;
1c. **blocklist** (optional, ``blocklist_phrases=[...]``) — the C4
   bad-words rule (operators/blocklist): any document containing a
   blocklisted phrase (boundary-exact, punctuation/case-insensitive)
   is dropped before quality scoring;
2. **quality** — Gopher/C4 rule report (operators/quality_filters),
   keep only docs passing every rule;
2b. **lm_tail** (optional, ``drop_lm_tail=True``) — CCNet-style
   perplexity bucketing (operators/ngram_lm): score survivors under a
   corpus-sample n-gram LM and drop the tail quantile;
2c. **model_quality** (optional, ``quality_model=weights``) — the
   in-engine trained linear classifier (operators/linear_classifier,
   fastText-style wiki-vs-crawl filter): survivors below the score
   threshold are dropped.  The weights table is trained once (its own
   job or a prior batch) and reused across runs;
3. **dedup** — MinHash/LSH near-dup groups (operators/dedup), keep
   canonical docs only;
3b. **semdedup** (optional, pass ``emb``) — semantic near-dup removal
   over document embeddings (operators/semdedup, the two-level
   corpus-growth-safe path): non-canonical members of cosine groups
   are dropped; documents without an embedding row are untouched;
4. **decontaminate** — drop docs sharing any k-gram with the eval set
   (operators/decontaminate; skipped when no eval set is given);
4b. **semantic_decontaminate** (optional, pass ``bench_emb`` with
   ``emb``) — embedding-space eval-leak removal
   (operators/semantic_decontaminate): docs whose embedding cosine vs
   any eval embedding reaches the threshold are dropped — the
   paraphrased/translated leaks the k-gram pass cannot see; docs
   without an embedding row pass through untouched;
5. **mix** — deterministic per-domain sampling (operators/mixing):
   Bernoulli keep-rates (``weights=``) or exact per-domain TOKEN
   budgets (``token_budgets=`` — the "300B web, 30B code" recipe
   form); skipped when neither is given;
6. **pack** — the fixed-length training-sequence manifest
   (operators/packing).

Scale shape: stages 1, 4 and 5 are scan-speed projections/broadcast
probes; stage 2 is doc_id-keyed partial aggregation; stage 3 is the
banded dedup pipeline (never all-pairs); stage 6 is the
range-partitioned offset computation.  Between stages only (doc_id,
clean_text[, source]) flows, and the funnel counts ride the stage
actions the job needs anyway.  Every stage's operator carries its own
DuckDB value oracle in its module tests; the composition test
(tests/test_curate.py) checks the funnel's invariants end to end.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_documents_spark.operators.blocklist import drop_blocklisted
from ocr_documents_spark.operators.decontaminate import decontaminate
from ocr_documents_spark.operators.dedup import dedup_groups
from ocr_documents_spark.operators.line_dedup import remove_common_lines
from ocr_documents_spark.operators.linear_classifier import quality_filter
from ocr_documents_spark.operators.mixing import (domain_weighted_sample,
                                                  token_budget_sample)
from ocr_documents_spark.operators.packing import pack_sequences
from ocr_documents_spark.operators.ngram_lm import (perplexity_scores,
                                                    quality_tiers,
                                                    tier_thresholds,
                                                    train_lm_counts)
from ocr_documents_spark.operators.normalize import normalize_docs
from ocr_documents_spark.operators.pii import scrub_corpus
from ocr_documents_spark.operators.semantic_decontaminate import \
    semantic_hit_ids
from ocr_documents_spark.operators.semdedup import \
    semantic_dedup_groups_two_level
from ocr_documents_spark.operators.quality_filters import \
    quality_filter_report


def run_curation(spark: SparkSession, docs: DataFrame,
                 bench: DataFrame | None = None,
                 weights: dict[str, float] | None = None,
                 emb: DataFrame | None = None,
                 bench_emb: DataFrame | None = None,
                 seq_len: int = 2048,
                 dedup_threshold: float = 0.7,
                 normalize: bool = False,
                 blocklist_phrases: list[str] | None = None,
                 strip_boilerplate: bool = False,
                 drop_lm_tail: bool = False,
                 lm_sample_mod: int = 4,
                 quality_model: DataFrame | None = None,
                 quality_threshold: int = 500_000,
                 token_budgets: dict[str, int] | None = None,
                 out_dir: str | None = None) -> dict:
    """docs(doc_id, text[, source]) -> funnel metrics dict; when
    ``out_dir`` is set, writes ``corpus`` (the surviving cleaned docs)
    and ``manifest`` (the packed-sequence table) under it."""
    if weights is not None and token_budgets is not None:
        raise ValueError(
            "pass either weights= (Bernoulli keep-rates) or "
            "token_budgets= (exact token prefixes), not both — the mix "
            "stage runs exactly one sampler")
    if bench_emb is not None and emb is None:
        # argument errors surface BEFORE stages 0-4 burn cluster hours
        raise ValueError(
            "bench_emb= (eval embeddings) requires emb= (corpus "
            "embeddings keyed by vec_id == doc_id)")
    metrics: dict[str, int] = {"input": docs.count()}

    # 0. optional encoding hygiene: control-char scrub + NFC pinning,
    # BEFORE any stage hashes text (dedup/decontamination correctness)
    if normalize:
        docs = normalize_docs(docs)

    # 1. scrub — downstream stages consume the masked text
    cur = (scrub_corpus(docs, "text", "clean_text")
           .drop("text").withColumnRenamed("clean_text", "text"))

    # 1b. optional corpus-wide boilerplate-line strip: text is
    # REWRITTEN (docs survive), so the count tracked is lines dropped.
    # Checkpoint the scrub output first — the line table, the census
    # and the text join-back would otherwise each re-run the PII
    # regexp chain (the job's most expensive projection) over the corpus
    if strip_boilerplate:
        cur = cur.localCheckpoint()
        stripped = remove_common_lines(cur).localCheckpoint()
        metrics["boilerplate_lines_dropped"] = int(
            stripped.agg(F.sum("n_dropped")).first()[0] or 0)
        cur = (cur.drop("text")
               .join(stripped.select("doc_id",
                                     F.col("clean_text").alias("text")),
                     "doc_id"))

    # 1c. optional C4 bad-words rule: one codegen rlike, before quality
    if blocklist_phrases:
        cur = drop_blocklisted(cur, blocklist_phrases)
        metrics["after_blocklist"] = cur.count()

    # 2. quality keep/drop
    keep_ids = (quality_filter_report(cur)
                .filter(F.col("keep")).select("doc_id"))
    cur = cur.join(keep_ids, "doc_id", "left_semi").localCheckpoint()
    metrics["after_quality"] = cur.count()

    # 2b. optional CCNet-style LM-perplexity tail drop: train on the
    # deterministic 1/lm_sample_mod doc sample of the survivors, score
    # everyone, cut the bottom quantile (tail tier)
    if drop_lm_tail:
        counts = train_lm_counts(cur, sample_mod=lm_sample_mod)
        scored = perplexity_scores(cur, counts)
        keep = (quality_tiers(scored, tier_thresholds(scored))
                .filter(F.col("tier") != "tail").select("doc_id"))
        cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
        metrics["after_lm_tail"] = cur.count()

    # 2c. optional trained-model quality filter (linear classifier
    # weights trained in-engine, scored relationally here so the run
    # stays UDF-free; the score column is stage-internal)
    if quality_model is not None:
        cur = (quality_filter(cur, quality_model,
                              threshold_micro=quality_threshold)
               .drop("quality_p").localCheckpoint())
        metrics["after_model_quality"] = cur.count()

    # 3. near-dup dedup: canonical survivors only
    canon = (dedup_groups(cur.select("doc_id", "text"),
                          threshold=dedup_threshold)
             .filter(F.col("is_canonical")).select("doc_id"))
    cur = cur.join(canon, "doc_id", "left_semi").localCheckpoint()
    metrics["after_dedup"] = cur.count()

    # 3b. optional semantic dedup over embeddings (two-level quantizer
    # path): restrict to the lexical survivors first so dropped docs
    # never claim canonical slots, then anti-join the non-canonicals —
    # docs WITHOUT an embedding row pass through untouched
    if emb is not None:
        alive = (emb.join(cur.select(F.col("doc_id").alias("vec_id")),
                          "vec_id", "left_semi"))
        # seed_by_hash: production doc ids need not contain the fixture
        # seed ids — absolute-id seeds would silently shrink the
        # codebook (or empty it) and the stage would no-op
        losers = (semantic_dedup_groups_two_level(alive,
                                                  seed_by_hash=True)
                  .filter(~F.col("is_canonical"))
                  .select(F.col("vec_id").alias("doc_id")))
        cur = cur.join(losers, "doc_id", "left_anti").localCheckpoint()
        metrics["after_semdedup"] = cur.count()

    # 4. eval-set decontamination
    if bench is not None:
        cur = decontaminate(cur, bench).localCheckpoint()
        metrics["after_decontaminate"] = cur.count()

    # 4b. optional semantic decontamination: embedding-space eval
    # leaks (paraphrased/translated eval items the k-gram pass cannot
    # see).  The eval embeddings broadcast; the corpus side never
    # shuffles in the scoring join; docs without an embedding row pass
    # through untouched
    if bench_emb is not None:
        alive = emb.join(cur.select(F.col("doc_id").alias("vec_id")),
                         "vec_id", "left_semi")
        # hit ids only — the report's per-doc aggregate (n_eval_hits,
        # max_cos) would be paid and immediately discarded here
        leaked = (semantic_hit_ids(alive, bench_emb)
                  .select(F.col("vec_id").alias("doc_id")))
        cur = cur.join(leaked, "doc_id", "left_anti").localCheckpoint()
        metrics["after_semantic_decontaminate"] = cur.count()

    # 5. domain mixing — Bernoulli rates or exact token budgets
    if weights is not None:
        cur = domain_weighted_sample(cur, weights).localCheckpoint()
        metrics["after_mixing"] = cur.count()
    elif token_budgets is not None:
        cur = token_budget_sample(cur, token_budgets).localCheckpoint()
        metrics["after_mixing"] = cur.count()

    # 6. pack
    manifest = pack_sequences(cur.select("doc_id", "text"), seq_len)
    agg = manifest.agg(
        F.count(F.lit(1)).alias("slices"),
        (F.max("seq_id") + 1).alias("sequences"),
        F.sum("n_tok").alias("tokens")).first()
    metrics["manifest_slices"] = agg["slices"] or 0
    metrics["train_sequences"] = int(agg["sequences"] or 0)
    metrics["train_tokens"] = int(agg["tokens"] or 0)

    if out_dir is not None:
        cur.write.mode("overwrite").parquet(f"{out_dir}/corpus")
        manifest.write.mode("overwrite").parquet(f"{out_dir}/manifest")
    return metrics


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--bench", default=None,
                   help="parquet of (bench_id, text) eval rows")
    p.add_argument("--emb", default=None,
                   help="parquet of (vec_id, embedding) for semantic "
                        "dedup (vec_id == doc_id)")
    p.add_argument("--bench-emb", default=None,
                   help="parquet of (vec_id, embedding) eval-set "
                        "embeddings for semantic decontamination "
                        "(requires --emb)")
    p.add_argument("--weights", default=None,
                   help='JSON {"domain": rate, ...} for the mixing stage')
    p.add_argument("--token-budgets", default=None,
                   help='JSON {"domain": n_tokens, ...} — exact '
                        'token-budget mixing instead of rates')
    p.add_argument("--quality-model", default=None,
                   help="parquet of (bucket, w) linear-classifier "
                        "weights for the model-quality stage")
    p.add_argument("--quality-threshold", type=int, default=500_000)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--drop-lm-tail", action="store_true",
                   help="CCNet-style LM-perplexity tail-quantile drop")
    p.add_argument("--strip-boilerplate", action="store_true",
                   help="corpus-wide repeated-line removal before quality")
    p.add_argument("--normalize", action="store_true",
                   help="control-char scrub + NFC pinning before scrub")
    p.add_argument("--blocklist", default=None,
                   help="text file of blocklist phrases, one per line")
    args = p.parse_args(argv)

    from ocr_documents_spark.session import get_spark
    spark = get_spark("curate")
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.bench) if args.bench else None
    weights = json.loads(args.weights) if args.weights else None
    emb = spark.read.parquet(args.emb) if args.emb else None
    metrics = run_curation(spark, docs, bench, weights, emb=emb,
                           bench_emb=(spark.read.parquet(args.bench_emb)
                                      if args.bench_emb else None),
                           seq_len=args.seq_len,
                           normalize=args.normalize,
                           blocklist_phrases=(
                               [ln.strip() for ln in open(args.blocklist)
                                if ln.strip()] if args.blocklist else None),
                           strip_boilerplate=args.strip_boilerplate,
                           drop_lm_tail=args.drop_lm_tail,
                           quality_model=(
                               spark.read.parquet(args.quality_model)
                               if args.quality_model else None),
                           quality_threshold=args.quality_threshold,
                           token_budgets=(
                               {k: int(v) for k, v in
                                json.loads(args.token_budgets).items()}
                               if args.token_budgets else None),
                           out_dir=args.out)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
