"""End-to-end curation job (jobs/curate.py): every stage exercised by an
engineered corpus — PII masked not dropped, junk dropped by quality,
near-dups reduced to canonicals, eval overlap decontaminated, domain
weights applied, manifest consistent with the surviving corpus."""

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.jobs.curate import run_curation

LINES = [
    "morning fog settled across the quiet harbor basin before dawn.",
    "seven engineers reviewed an updated compaction design yesterday.",
    "fresh bread needs patience and a lively sourdough starter.",
    "the observatory logged seventeen meteor events last night.",
    "crimson foxes darted over a frozen ridge at first light.",
    "careful benchmarks separate real wins from measurement noise.",
    "her garden produced tomatoes beyond every reasonable forecast.",
    "distant thunder rolled while children finished their game.",
]
LINES_B = [
    "ancient maps exaggerated coastlines their authors never sailed.",
    "a patient violinist tuned each string against the cold hall.",
    "migrating cranes traced silver arcs above the flooded fields.",
    "the archivist labeled every negative with a steady pencil.",
    "volcanic soil rewards the vineyards planted along its slopes.",
    "night trains carry apples north before the first hard frost.",
    "an honest ledger shortens every quarrel about the harvest.",
    "telescopes on the plateau drink starlight through thin air.",
]
LINES_C = [
    "river pilots memorize sandbars the charts refuse to admit.",
    "two apprentices argued politely about the kiln temperature.",
    "the lighthouse keeper mended nets between the long watches.",
    "meltwater braided new channels through the gravel terrace.",
    "a careful beekeeper reads the wind before opening a hive.",
    "old printing presses demand patience and exact paper weight.",
    "the survey crew triangulated the ridge before the storm.",
    "market mornings begin with the smell of diesel and bread.",
]
GOOD = "\n".join(LINES)
EVAL_SNIPPET = "name the seven wonders of the ancient world"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, GOOD, "web"),
        (1, GOOD.replace("fog", "mist"), "web"),            # near-dup of 0
        (2, "\n".join(LINES_B), "web"),                     # distinct good
        (3, "\n".join(["identical spam line repeated now."] * 12), "web"),
        (4, "\n".join(LINES_C[:4])
            + "\nwrite to spy@leak.io for the appendix today.\n"
            + "\n".join(LINES_C[4:]), "books"),             # PII carrier
        (5, LINES_B[0] + "\n" + EVAL_SNIPPET + " quiz answer sheet here.\n"
            + "\n".join(LINES_C[1:5]) + "\n"
            + "the footnotes credit three separate expeditions entirely.",
         "books"),                                          # contaminated
        (6, "\n".join(l.replace("the", "that") for l in LINES_B[2:])
            + "\nsix spare sentences keep this domain document afloat.",
         "dropme"),                                         # weighted out
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, EVAL_SNIPPET)], "bench_id long, text string")


@pytest.fixture(scope="module")
def result(spark, corpus, bench, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    metrics = run_curation(
        spark, corpus, bench=bench,
        weights={"web": 1.0, "books": 1.0},   # 'dropme' -> default 0
        seq_len=16, out_dir=out)
    return metrics, out


def test_funnel_counts(result):
    metrics, _ = result
    assert metrics["input"] == 7
    assert metrics["after_quality"] == 6          # spam doc 3 gone
    assert metrics["after_dedup"] == 5            # one of {0,1} gone
    assert metrics["after_decontaminate"] == 4    # doc 5 gone
    assert metrics["after_mixing"] == 3           # doc 6 (dropme) gone
    order = ["input", "after_quality", "after_dedup",
             "after_decontaminate", "after_mixing"]
    vals = [metrics[k] for k in order]
    assert vals == sorted(vals, reverse=True)


def test_pii_masked_not_dropped(spark, result):
    _, out = result
    kept = spark.read.parquet(f"{out}/corpus")
    row = kept.filter(F.col("doc_id") == 4).collect()
    assert row, "the PII doc must survive (masked), not be dropped"
    assert "<EMAIL>" in row[0]["text"] and "spy@leak.io" not in row[0]["text"]


def test_dedup_kept_canonical(spark, result):
    _, out = result
    ids = {r["doc_id"] for r in
           spark.read.parquet(f"{out}/corpus").select("doc_id").collect()}
    assert 0 in ids and 1 not in ids      # min doc_id is the canonical


def test_manifest_consistent_with_corpus(spark, result):
    metrics, out = result
    kept = spark.read.parquet(f"{out}/corpus")
    total_tokens = kept.select(
        F.sum(F.size(F.filter(F.split("text", r"\s+"),
                              lambda w: w != "")))).first()[0]
    assert metrics["train_tokens"] == total_tokens
    manifest = spark.read.parquet(f"{out}/manifest")
    assert metrics["manifest_slices"] == manifest.count()
    assert metrics["train_sequences"] == \
        manifest.agg(F.max("seq_id")).first()[0] + 1


def test_lm_tail_stage_drops_tail_quantile(spark):
    """drop_lm_tail inserts the CCNet-style perplexity cut between the
    quality gate and dedup: the funnel gains after_lm_tail ~ 70% of the
    quality survivors (tail_frac = 0.30, modulo ties at the cut and
    unscorable docs), and every later stage consumes the reduced set."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "source"))
    m = run_curation(spark, docs, drop_lm_tail=True)
    assert "after_lm_tail" in m
    q, t = m["after_quality"], m["after_lm_tail"]
    assert t < q
    assert abs(t - 0.7 * q) <= 0.05 * q, (q, t)
    assert m["after_dedup"] <= t


def test_strip_boilerplate_stage_rewrites_not_drops(spark):
    """strip_boilerplate=True removes corpus-wide repeated lines while
    keeping the documents themselves: the funnel reports the dropped
    line count, the doc count through the stage is unchanged, and a
    boilerplate-only footer no longer reaches the packed corpus."""
    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "source")
            .withColumn("text", F.concat(
                F.col("text"),
                F.lit("\nsubscribe to the example newsletter today"))))
    m = run_curation(spark, base, strip_boilerplate=True)
    assert m["boilerplate_lines_dropped"] >= 500
    m_plain = run_curation(
        spark, base.withColumn(
            "text", F.regexp_replace(
                "text", "\nsubscribe to the example newsletter today", "")))
    # stripping the footer corpus-side must agree with never having it
    assert m["after_quality"] == m_plain["after_quality"]
    assert m["train_tokens"] == m_plain["train_tokens"]


def test_semantic_dedup_stage_drops_embedding_twin(spark, corpus, bench):
    """Passing emb engages the semantic stage: of two surviving docs
    with near-identical embeddings the non-canonical one is dropped,
    docs without an embedding row pass through, and the funnel gains
    after_semdedup."""
    import random
    rng = random.Random(5)
    def vec(i):
        v = [0.0] * 8
        v[i % 8] = 1.0
        return [x + rng.uniform(0, 0.01) for x in v]
    v0 = vec(0)
    emb_rows = [(0, v0), (2, [x * 1.001 + 0.0005 for x in v0])] + [
        (i, vec(i)) for i in (1, 3, 5, 6)]   # doc 4 has NO embedding
    emb = spark.createDataFrame(emb_rows,
                                "vec_id long, embedding array<double>")
    m = run_curation(spark, corpus, bench,
                     {"web": 1.0, "books": 1.0, "dropme": 0.0}, emb=emb)
    m_plain = run_curation(spark, corpus, bench,
                           {"web": 1.0, "books": 1.0, "dropme": 0.0})
    assert m["after_semdedup"] == m["after_dedup"] - 1
    # doc 2 (the non-canonical twin of doc 0) is the one dropped;
    # everything else, including embedding-less doc 4, flows through
    assert m["train_sequences"] <= m_plain["train_sequences"]
    assert m["after_decontaminate"] == m_plain["after_decontaminate"] - 1


def test_semantic_decontaminate_stage(spark, corpus, bench):
    """bench_emb engages the embedding-space eval-leak stage: the doc
    whose embedding sits at cos ~1 to an eval embedding is dropped even
    though it shares no k-gram with any eval text; orthogonal
    embeddings keep the semdedup stage a no-op; embedding-less docs
    pass through; bench_emb without emb is rejected."""
    def unit(i):
        v = [0.0] * 8
        v[i] = 1.0
        return v
    emb = spark.createDataFrame(
        [(0, unit(0)), (2, unit(2)), (5, unit(5)), (6, unit(6))],
        "vec_id long, embedding array<double>")
    bench_emb = spark.createDataFrame(
        [(900, [x * 0.99 + 0.003 for x in unit(2)])],
        "vec_id long, embedding array<double>")
    m = run_curation(spark, corpus, bench,
                     {"web": 1.0, "books": 1.0}, emb=emb,
                     bench_emb=bench_emb)
    assert m["after_semdedup"] == m["after_dedup"]         # 3b no-op
    # doc 2 leaks semantically (cos ~0.99996 to the eval vector) while
    # sharing zero 8-grams with the eval TEXT — only 4b catches it
    assert m["after_semantic_decontaminate"] == \
        m["after_decontaminate"] - 1
    assert m["after_mixing"] == m["after_semantic_decontaminate"] - 1
    with pytest.raises(ValueError, match="requires emb="):
        run_curation(spark, corpus, bench_emb=bench_emb)


def test_normalize_stage_restores_dedup(spark):
    """Byte-variant duplicates (NFC vs NFD of the same visible text)
    dodge MinHash dedup — every accented shingle hashes differently.
    The optional normalize stage pins encoding first, turning the pair
    into an exact duplicate that dedup collapses."""
    import unicodedata
    acc = "\n".join(l.replace("e", "é") for l in LINES)
    nfc_doc = unicodedata.normalize("NFC", acc)
    nfd_doc = unicodedata.normalize("NFD", acc)
    assert nfc_doc != nfd_doc and len(nfd_doc) > len(nfc_doc)
    docs = spark.createDataFrame(
        [(0, nfc_doc, "web"), (1, nfd_doc, "web"),
         (2, "\n".join(LINES_B), "web")],
        "doc_id long, text string, source string")
    base = run_curation(spark, docs)
    norm = run_curation(spark, docs, normalize=True)
    assert base["after_quality"] == norm["after_quality"] == 3
    assert base["after_dedup"] == 3     # variants dodge dedup
    assert norm["after_dedup"] == 2     # NFC unifies, one canonical


def test_blocklist_stage(spark):
    """The optional C4 bad-words stage drops exactly the documents
    containing a blocklisted phrase (boundary-exact), before quality."""
    docs = spark.createDataFrame(
        [(0, GOOD, "web"),
         (1, "\n".join(LINES_B) + "\nforbidden phrase closes this one.",
          "web"),
         (2, "\n".join(LINES_C) + "\nunforbidden phrases are fine here.",
          "web")],
        "doc_id long, text string, source string")
    m = run_curation(spark, docs,
                     blocklist_phrases=["Forbidden-Phrase"])
    assert m["input"] == 3
    assert m["after_blocklist"] == 2     # doc 1 gone; doc 2's superstring safe
    assert m["after_quality"] == 2


def test_model_quality_stage(spark):
    """The optional trained-classifier stage drops exactly the docs the
    model scores at/below threshold — weights trained in-engine on a
    wiki-vs-spam seed, applied inside the funnel."""
    from ocr_documents_spark.operators.linear_classifier import \
        train_linear_classifier

    wiki_markers = " citation reference encyclopedia"
    spam_markers = " casino jackpot clickbait"
    seed = spark.createDataFrame(
        [(1000 + i,
          ("\n".join(LINES_B) + wiki_markers) if i % 2
          else ("\n".join(LINES_C) + spam_markers),
          i % 2)
         for i in range(40)],
        "doc_id long, text string, label int")
    weights = train_linear_classifier(seed).localCheckpoint()

    docs = spark.createDataFrame(
        [(0, GOOD + wiki_markers, "web"),
         (1, "\n".join(LINES_B) + wiki_markers, "web"),
         (2, "\n".join(LINES_C) + spam_markers, "web")],
        "doc_id long, text string, source string")
    m = run_curation(spark, docs, quality_model=weights)
    assert m["after_quality"] == 3          # heuristics pass everything
    assert m["after_model_quality"] == 2    # the spam-marked doc is gone
    assert m["after_dedup"] == 2


def test_token_budget_mixing_stage(spark):
    """token_budgets= replaces rate mixing with an exact per-domain
    token prefix; the funnel reports the post-mix count."""
    docs = spark.createDataFrame(
        [(i, "\n".join(LINES_B if i % 2 else LINES_C)
          + f"\nunique closing sentence number {i} anchors this doc.",
          "web") for i in range(6)]
        + [(10, "\n".join(LINES), "books")],
        "doc_id long, text string, source string")
    full = run_curation(spark, docs)
    assert "after_mixing" not in full
    n_web_tokens = 60      # < one surviving web doc's token mass
    m = run_curation(spark, docs,
                     token_budgets={"web": n_web_tokens, "books": 10**9})
    assert m["after_mixing"] < m["after_dedup"]
    assert m["after_mixing"] == 1 + 1      # one-doc web prefix + books


@pytest.fixture()
def poisoned(spark):
    """A corpus that CANNOT reproduce the module fixture's funnel: any
    stage that re-reads its docs input instead of a checkpoint produces
    input=1 and empty downstream counts — the re-execution detector."""
    return spark.createDataFrame(
        [(999, "tiny", "web")], "doc_id long, text string, source string")


CK_ARGS = dict(weights={"web": 1.0, "books": 1.0}, seq_len=16)


def test_checkpoint_resume_skips_every_completed_stage(
        spark, corpus, bench, poisoned, tmp_path_factory):
    """A checkpointed run reports the same funnel as a plain run; a
    re-run against the same checkpoint_dir resumes from the committed
    stages and never re-executes them — proven by handing the resume a
    poisoned docs input that would change every count if any pre-pack
    stage ran."""
    ckdir = str(tmp_path_factory.mktemp("curate_ck"))
    m_plain = run_curation(spark, corpus, bench=bench, **CK_ARGS)
    m1 = run_curation(spark, corpus, bench=bench,
                      checkpoint_dir=ckdir, **CK_ARGS)
    assert m1 == m_plain
    m2 = run_curation(spark, poisoned, bench=bench,
                      checkpoint_dir=ckdir, **CK_ARGS)
    assert m2 == m1


def test_checkpoint_partial_resume_recomputes_only_the_tail(
        spark, corpus, bench, poisoned, tmp_path_factory):
    """Only a consecutive committed PREFIX resumes: with the dedup-
    onward commit markers gone (the crash-mid-stage shape), the re-run
    restores scrub+quality from their checkpoints (poisoned docs are
    never touched) and recomputes dedup/decontaminate/mix from the
    quality survivors, landing on the original funnel."""
    import shutil

    ckdir = str(tmp_path_factory.mktemp("curate_ck_partial"))
    m1 = run_curation(spark, corpus, bench=bench,
                      checkpoint_dir=ckdir, **CK_ARGS)
    for name in ("dedup", "decontaminate", "mix"):
        shutil.rmtree(f"{ckdir}/meta_{name}")
    m3 = run_curation(spark, poisoned, bench=bench,
                      checkpoint_dir=ckdir, **CK_ARGS)
    assert m3 == m1


def test_checkpoint_config_change_invalidates(
        spark, corpus, bench, poisoned, tmp_path_factory):
    """Any knob that alters a stage's output flips the config
    fingerprint: the resume is refused wholesale and the run recomputes
    from its actual docs input (here: the poisoned one-doc corpus), so
    a changed pipeline can never silently serve another config's
    checkpoints.  resume=False forces the same full re-run even with
    matching config."""
    ck_cfg = str(tmp_path_factory.mktemp("curate_ck_cfg"))
    m1 = run_curation(spark, corpus, bench=bench,
                      checkpoint_dir=ck_cfg, **CK_ARGS)
    assert m1["input"] == 7
    m_cfg = run_curation(spark, poisoned, bench=bench,
                         checkpoint_dir=ck_cfg, dedup_threshold=0.5,
                         **CK_ARGS)
    assert m_cfg["input"] == 1
    # resume=False against checkpoints whose fingerprint DOES match —
    # the flag alone must force the full re-run (fresh dir so the
    # config-change run above can't be what invalidated them)
    ck_force = str(tmp_path_factory.mktemp("curate_ck_force"))
    assert run_curation(spark, corpus, bench=bench,
                        checkpoint_dir=ck_force, **CK_ARGS)["input"] == 7
    m_force = run_curation(spark, poisoned, bench=bench,
                           checkpoint_dir=ck_force, resume=False,
                           **CK_ARGS)
    assert m_force["input"] == 1


def test_drop_audit_records_which_stage_dropped_each_doc(
        spark, corpus, bench, tmp_path_factory):
    """audit_dir= writes the per-document drop trail: the engineered
    corpus has a fully known disposition (doc 3 fails quality, doc 1 is
    the non-canonical near-dup, doc 5 is contaminated, doc 6's domain
    is weighted out), every dropped doc appears under exactly its
    dropping stage, and survivors appear nowhere."""
    audit = str(tmp_path_factory.mktemp("curate_audit"))
    m = run_curation(spark, corpus, bench=bench, audit_dir=audit,
                     **CK_ARGS)
    trail = {(r["stage"], r["doc_id"])
             for r in spark.read.parquet(audit).collect()}
    assert trail == {("quality", 3), ("dedup", 1),
                     ("decontaminate", 5), ("mix", 6)}
    # audit is observational: the funnel is unchanged by recording it
    assert m == run_curation(spark, corpus, bench=bench, **CK_ARGS)


def test_conflicting_samplers_rejected(spark):
    docs = spark.createDataFrame([(0, GOOD, "web")],
                                 "doc_id long, text string, source string")
    import pytest as _pt
    with _pt.raises(ValueError, match="not both"):
        run_curation(spark, docs, weights={"web": 1.0},
                     token_budgets={"web": 100})


def test_funnel_golden_sf01(spark):
    """r4 verdict #5: freeze the sf0.1 funnel so a silent behavior change
    in ANY stage (quality gate constants, dedup banding, decontamination
    n-gram width, packing arithmetic) shows up as a value diff here, not
    as an unexplained throughput blip in the bench.  The bench-default
    config: no weights, eval set = every 97th doc re-idented."""
    sf_dir = "/root/testdata/sf0.1"
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "source"))
    eval_set = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter(F.col("doc_id") % 97 == 0)
                .select((F.col("doc_id") + 10**9).alias("bench_id"),
                        "text"))
    got = run_curation(spark, docs, bench=eval_set)
    assert got == {
        "input": 5000,
        "after_quality": 2738,
        "after_dedup": 2605,
        "after_decontaminate": 2577,
        "manifest_slices": 2668,
        "train_sequences": 94,
        "train_tokens": 191688,
    }
