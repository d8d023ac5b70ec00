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

Resumability (``checkpoint_dir=``): each completed stage writes its
survivor table to ``{checkpoint_dir}/stage_{name}`` and then a commit
marker (``meta_{name}``: config fingerprint + the cumulative funnel
metrics).  The marker is written strictly AFTER the stage parquet and
its funnel count succeed, so a driver/executor crash mid-stage leaves
no marker and the stage simply re-runs (mode=overwrite) on the next
attempt — the same write-then-checkpoint ladder jobs/lake.py uses for
extraction buckets.  A re-run with the same ``checkpoint_dir`` resumes
from the longest committed PREFIX of stages: earlier stages are never
re-executed (their parquet is the input), the restored funnel metrics
are exact, and a config change (any knob that alters a stage's output)
flips the fingerprint and invalidates every marker.  Resume assumes
the same input datasets — the fingerprint guards configuration, not
corpus bytes (standard for checkpointed batch jobs; a changed corpus
needs a fresh checkpoint_dir or ``resume=False``).  The terminal pack
stage is recomputed on resume: it is a manifest over the final
survivors, cheap relative to any corpus stage.
"""

from __future__ import annotations

import argparse
import hashlib
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


class _StageCheckpointer:
    """Lake-backed stage checkpoints for :func:`run_curation`.

    Commit protocol (crash-safe without atomic renames): the stage
    parquet is written first, the funnel count runs against the
    READ-BACK parquet (so the recorded metric describes the committed
    bytes), and only then does the one-row ``meta_{name}`` marker land.
    A marker therefore proves both the data and its metric; anything
    without a marker is re-run and overwritten.  Markers embed the
    config fingerprint so a knob change invalidates every prior stage
    instead of silently resuming into a different pipeline.
    """

    def __init__(self, spark: SparkSession, root: str, config_fp: str,
                 resume: bool = True):
        self.spark = spark
        self.root = root.rstrip("/")
        self.fp = config_fp
        self.resume = resume

    def _data(self, name: str) -> str:
        return f"{self.root}/stage_{name}"

    def _meta(self, name: str) -> str:
        return f"{self.root}/meta_{name}"

    def completed_metrics(self, name: str) -> dict | None:
        """Cumulative funnel metrics of a committed stage, or None.
        Existence is probed explicitly (lake house rule: only a
        genuinely-absent marker is 'not there'; a corrupt one is fatal)."""
        from .lake import _path_exists
        if not self.resume or not _path_exists(self.spark,
                                               self._meta(name)):
            return None
        rows = self.spark.read.text(self._meta(name)).collect()
        meta = json.loads("".join(r["value"] for r in rows))
        return meta["metrics"] if meta.get("config_fp") == self.fp else None

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._data(name))

    def write_and_read(self, name: str, df: DataFrame) -> DataFrame:
        df.write.mode("overwrite").parquet(self._data(name))
        return self.read(name)

    def commit(self, name: str, metrics: dict) -> None:
        payload = json.dumps({"config_fp": self.fp, "metrics": metrics})
        (self.spark.createDataFrame([(payload,)], "value string")
         .coalesce(1).write.mode("overwrite").text(self._meta(name)))


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
                 out_dir: str | None = None,
                 checkpoint_dir: str | None = None,
                 resume: bool = True,
                 audit_dir: str | None = None) -> dict:
    """docs(doc_id, text[, source]) -> funnel metrics dict; when
    ``out_dir`` is set, writes ``corpus`` (the surviving cleaned docs)
    and ``manifest`` (the packed-sequence table) under it.  With
    ``checkpoint_dir`` every completed stage persists its survivors +
    funnel metrics and a re-run resumes after the last committed stage
    (module docstring: Resumability); ``resume=False`` keeps writing
    checkpoints but ignores existing ones (forced full re-run).

    ``audit_dir`` writes the per-document drop trail: every DROPPING
    stage persists the doc_ids it removed under
    ``{audit_dir}/stage={name}`` (one extra anti-join per stage, paid
    only when asked), so "which stage dropped this document" is a
    partition-pruned point lookup instead of a funnel re-run — the
    counts answer how many, the audit answers WHICH.  A stage that
    dropped nothing may be absent from the table (no data files).
    Rewriting stages (normalize/scrub/line_strip) never drop docs and
    are not audited.  Each run overwrites its stages' partitions; use a
    fresh audit_dir when changing the stage CONFIGURATION, since a
    stage removed from the pipeline leaves its old partition behind."""
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
    metrics: dict[str, int] = {}

    # Stage table: (name, fn(cur, materialized) -> cur, barrier,
    # count_key).  ``barrier`` replicates the pre-existing
    # localCheckpoint placement when no checkpoint_dir is given (cheap
    # projection stages deliberately stay lazy); with checkpoint_dir the
    # parquet write-and-read-back IS the barrier for every stage.
    # ``materialized`` tells a stage whether its input already sits
    # behind a barrier (the boilerplate strip otherwise re-runs the PII
    # regexp chain once per consumer).
    stages: list = []

    def add(name, fn, barrier=True, count_key=None):
        stages.append((name, fn, barrier, count_key))

    # 0. optional encoding hygiene: control-char scrub + NFC pinning,
    # BEFORE any stage hashes text (dedup/decontamination correctness)
    if normalize:
        add("normalize", lambda cur, _m: normalize_docs(cur),
            barrier=False)

    # 1. scrub — downstream stages consume the masked text
    add("scrub",
        lambda cur, _m: (scrub_corpus(cur, "text", "clean_text")
                         .drop("text")
                         .withColumnRenamed("clean_text", "text")),
        barrier=False)

    # 1b. optional corpus-wide boilerplate-line strip: text is
    # REWRITTEN (docs survive), so the count tracked is lines dropped.
    # Checkpoint the scrub output first — the line table, the census
    # and the text join-back would otherwise each re-run the PII
    # regexp chain (the job's most expensive projection) over the corpus
    def _strip_stage(cur, materialized):
        if not materialized:
            cur = cur.localCheckpoint()
        stripped = remove_common_lines(cur).localCheckpoint()
        metrics["boilerplate_lines_dropped"] = int(
            stripped.agg(F.sum("n_dropped")).first()[0] or 0)
        return (cur.drop("text")
                .join(stripped.select("doc_id",
                                      F.col("clean_text").alias("text")),
                      "doc_id"))
    if strip_boilerplate:
        add("line_strip", _strip_stage, barrier=False)

    # 1c. optional C4 bad-words rule: one codegen rlike, before quality
    if blocklist_phrases:
        add("blocklist",
            lambda cur, _m: drop_blocklisted(cur, blocklist_phrases),
            barrier=False, count_key="after_blocklist")

    # 2. quality keep/drop
    def _quality_stage(cur, materialized):
        # materialize an unbarriered input first: the three report
        # branches AND the semi-join's left side otherwise each re-run
        # the upstream scrub regexp chain (measured 16.3s -> ~4s at
        # sf1.0: exchange reuse does NOT cover differently-projected
        # copies of the scrub subtree)
        if not materialized:
            cur = cur.localCheckpoint()
        keep_ids = (quality_filter_report(cur)
                    .filter(F.col("keep")).select("doc_id"))
        return cur.join(keep_ids, "doc_id", "left_semi")
    add("quality", _quality_stage, count_key="after_quality")

    # 2b. optional CCNet-style LM-perplexity tail drop: train on the
    # deterministic 1/lm_sample_mod doc sample of the survivors, score
    # everyone, cut the bottom quantile (tail tier)
    def _lm_tail_stage(cur, _m):
        counts = train_lm_counts(cur, sample_mod=lm_sample_mod)
        scored = perplexity_scores(cur, counts)
        keep = (quality_tiers(scored, tier_thresholds(scored))
                .filter(F.col("tier") != "tail").select("doc_id"))
        return cur.join(keep, "doc_id", "left_semi")
    if drop_lm_tail:
        add("lm_tail", _lm_tail_stage, count_key="after_lm_tail")

    # 2c. optional trained-model quality filter (linear classifier
    # weights trained in-engine, scored relationally here so the run
    # stays UDF-free; the score column is stage-internal)
    if quality_model is not None:
        add("model_quality",
            lambda cur, _m: (quality_filter(
                cur, quality_model,
                threshold_micro=quality_threshold).drop("quality_p")),
            count_key="after_model_quality")

    # 3. near-dup dedup: canonical survivors only
    def _dedup_stage(cur, _m):
        canon = (dedup_groups(cur.select("doc_id", "text"),
                              threshold=dedup_threshold)
                 .filter(F.col("is_canonical")).select("doc_id"))
        return cur.join(canon, "doc_id", "left_semi")
    add("dedup", _dedup_stage, count_key="after_dedup")

    # 3b. optional semantic dedup over embeddings (two-level quantizer
    # path): restrict to the lexical survivors first so dropped docs
    # never claim canonical slots, then anti-join the non-canonicals —
    # docs WITHOUT an embedding row pass through untouched
    def _semdedup_stage(cur, _m):
        alive = (emb.join(cur.select(F.col("doc_id").alias("vec_id")),
                          "vec_id", "left_semi"))
        # seed_by_hash: production doc ids need not contain the fixture
        # seed ids — absolute-id seeds would silently shrink the
        # codebook (or empty it) and the stage would no-op
        losers = (semantic_dedup_groups_two_level(alive,
                                                  seed_by_hash=True)
                  .filter(~F.col("is_canonical"))
                  .select(F.col("vec_id").alias("doc_id")))
        return cur.join(losers, "doc_id", "left_anti")
    if emb is not None:
        add("semdedup", _semdedup_stage, count_key="after_semdedup")

    # 4. eval-set decontamination
    if bench is not None:
        add("decontaminate",
            lambda cur, _m: decontaminate(cur, bench),
            count_key="after_decontaminate")

    # 4b. optional semantic decontamination: embedding-space eval
    # leaks (paraphrased/translated eval items the k-gram pass cannot
    # see).  The eval embeddings broadcast; the corpus side never
    # shuffles in the scoring join; docs without an embedding row pass
    # through untouched
    def _sem_decon_stage(cur, _m):
        alive = emb.join(cur.select(F.col("doc_id").alias("vec_id")),
                         "vec_id", "left_semi")
        # hit ids only — the report's per-doc aggregate (n_eval_hits,
        # max_cos) would be paid and immediately discarded here
        leaked = (semantic_hit_ids(alive, bench_emb)
                  .select(F.col("vec_id").alias("doc_id")))
        return cur.join(leaked, "doc_id", "left_anti")
    if bench_emb is not None:
        add("semantic_decontaminate", _sem_decon_stage,
            count_key="after_semantic_decontaminate")

    # 5. domain mixing — Bernoulli rates or exact token budgets
    if weights is not None:
        add("mix",
            lambda cur, _m: domain_weighted_sample(cur, weights),
            count_key="after_mixing")
    elif token_budgets is not None:
        add("mix",
            lambda cur, _m: token_budget_sample(cur, token_budgets),
            count_key="after_mixing")

    # --- runner: resume from the longest committed stage prefix -------
    ck = None
    resume_idx = -1
    if checkpoint_dir is not None:
        config_fp = hashlib.md5(json.dumps({
            "stages": [s[0] for s in stages],
            "dedup_threshold": dedup_threshold,
            "seq_len": seq_len,
            "normalize": normalize,
            "blocklist_phrases": blocklist_phrases,
            "strip_boilerplate": strip_boilerplate,
            "drop_lm_tail": drop_lm_tail,
            "lm_sample_mod": lm_sample_mod,
            "quality_threshold": quality_threshold,
            "weights": weights,
            "token_budgets": token_budgets,
            "has_bench": bench is not None,
            "has_emb": emb is not None,
            "has_bench_emb": bench_emb is not None,
            "has_quality_model": quality_model is not None,
        }, sort_keys=True).encode()).hexdigest()
        ck = _StageCheckpointer(spark, checkpoint_dir, config_fp, resume)
        for i, (name, _fn, _b, _c) in enumerate(stages):
            saved = ck.completed_metrics(name)
            if saved is None:
                break           # only a consecutive prefix is usable
            resume_idx, metrics = i, dict(saved)

    if resume_idx >= 0:
        cur = ck.read(stages[resume_idx][0])
        materialized = True
    else:
        metrics["input"] = docs.count()
        cur = docs
        materialized = False

    for i, (name, fn, barrier, count_key) in enumerate(stages):
        if i <= resume_idx:
            continue
        prev = cur
        cur = fn(cur, materialized)
        if ck is not None:
            cur = ck.write_and_read(name, cur)
            materialized = True
        elif barrier:
            cur = cur.localCheckpoint()
            materialized = True
        else:
            materialized = False
        if count_key is not None:
            metrics[count_key] = cur.count()
            if audit_dir is not None:
                # drop trail: stages with a funnel count are exactly the
                # stages that can remove documents
                (prev.select("doc_id")
                 .join(cur.select("doc_id"), "doc_id", "left_anti")
                 .write.mode("overwrite")
                 .parquet(f"{audit_dir}/stage={name}"))
        if ck is not None:
            ck.commit(name, metrics)

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
    p.add_argument("--checkpoint-dir", default=None,
                   help="stage-checkpoint root: completed stages persist "
                        "here and a re-run resumes after the last "
                        "committed stage")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing stage checkpoints (forced full "
                        "re-run; fresh checkpoints are still written)")
    p.add_argument("--audit-dir", default=None,
                   help="per-document drop trail: each dropping stage "
                        "writes its removed doc_ids under "
                        "{audit_dir}/stage={name}")
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
                           out_dir=args.out,
                           checkpoint_dir=args.checkpoint_dir,
                           resume=not args.no_resume,
                           audit_dir=args.audit_dir)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
