"""Streaming curation (streaming/curation.py): per-batch funnel, lake
band-index as the cross-batch dedup state, replay idempotence."""

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.jobs.lake import Lake
from ocr_documents_spark.streaming import curation as C

GOOD_A = "\n".join([
    "morning fog settled across the quiet harbor basin before dawn.",
    "seven engineers reviewed an updated compaction design yesterday.",
    "fresh bread needs patience and a lively sourdough starter.",
    "the observatory logged seventeen meteor events last night.",
    "crimson foxes darted over a frozen ridge at first light.",
    "careful benchmarks separate real wins from measurement noise.",
    "her garden produced tomatoes beyond every reasonable forecast.",
    "distant thunder rolled while children finished their game.",
])
GOOD_D = "\n".join([
    "ancient maps exaggerated coastlines their authors never sailed.",
    "a patient violinist tuned each string against the cold hall.",
    "migrating cranes traced silver arcs above the flooded fields.",
    "the archivist labeled every negative with a steady pencil.",
    "volcanic soil rewards the vineyards planted along its slopes.",
    "night trains carry apples north before the first hard frost.",
    "an honest ledger shortens every quarrel about the harvest.",
    "telescopes on the plateau drink starlight through thin air.",
])
GOOD_F = "\n".join([
    "river pilots memorize sandbars the charts refuse to admit.",
    "two apprentices argued politely about the kiln temperature.",
    "the lighthouse keeper mended nets between the long watches.",
    "meltwater braided new channels through the gravel terrace.",
    "a careful beekeeper reads the wind before opening a hive.",
    "old printing presses demand patience and exact paper weight.",
    "the survey crew triangulated the ridge before the storm.",
    "market mornings begin with the smell of diesel and bread.",
])
GOOD_G = "\n".join([
    "glassblowers judge the furnace by its orange whisper alone.",
    "a retired tug captain narrates storms to patient tourists.",
    "terraced orchards hold the hillside together after rains.",
    "the midnight bakery sells out before the ferries arrive.",
    "surveyors chalk quiet marks on the cobbles each spring.",
    "a borrowed accordion started the whole festival tradition.",
    "cold cellars keep the cider sharp until late summer.",
    "the island clinic schedules around the single daily boat.",
])
EVAL_SNIPPET = "name the seven wonders of the ancient world"


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("curation_lake"))
    lake = Lake(root, n_buckets=8)
    bench = spark.createDataFrame(
        [(100, EVAL_SNIPPET)], "bench_id long, text string")
    commit = C.curation_committer(lake, bench=bench)

    batch0 = spark.createDataFrame(
        [(1, GOOD_A, "web"),
         (2, GOOD_A.replace("fog", "mist"), "web"),      # near-dup of 1
         (3, "tiny junk doc.", "web"),                   # quality drop
         (4, GOOD_D, "web")],
        "doc_id long, text string, source string")
    commit(batch0, 0)

    batch1 = spark.createDataFrame(
        [(11, GOOD_A, "web"),                            # dup of indexed 1
         (12, GOOD_F, "books"),                          # genuinely new
         (13, GOOD_G.split("\n")[0] + "\n" + EVAL_SNIPPET
          + " appears inside this otherwise decent document.\n"
          + "\n".join(GOOD_G.split("\n")[1:]), "books")],  # contaminated
        "doc_id long, text string, source string")
    commit(batch1, 1)
    return spark, lake, commit, batch1


def _kept(spark, lake):
    return {r["doc_id"]: r["ingest_batch"]
            for r in spark.read.parquet(lake.path(C.CURATED))
            .select("doc_id", "ingest_batch").collect()}


def test_funnels_and_cross_batch_dedup(setup):
    spark, lake, _, _ = setup
    kept = _kept(spark, lake)
    assert set(kept) == {1, 4, 12}
    assert kept[12] == 1
    m = {r["ingest_batch"]: r.asDict() for r in
         spark.read.parquet(lake.path(C.CURATION_METRICS)).collect()}
    assert m[0]["input"] == 4 and m[0]["after_quality"] == 3
    assert m[0]["after_batch_dedup"] == 2       # near-dup 2 dropped
    assert m[0]["after_index_dedup"] == 2       # empty index, no-op
    assert m[0]["batch_band_hits"] == 1         # the (1,2) collision
    assert m[0]["batch_est_drops"] == 1         # ... confirmed by the gate
    assert m[1]["input"] == 3
    assert m[1]["after_index_dedup"] == m[1]["after_batch_dedup"] - 1
    assert m[1]["index_band_hits"] >= 1         # 11 collided with stored 1
    assert m[1]["index_est_drops"] == 1         # ... and the gate confirmed
    assert m[1]["after_decontaminate"] == 1     # doc 13 dropped


def test_band_index_accumulates_per_batch(setup):
    spark, lake, _, _ = setup
    idx = spark.read.parquet(lake.path(C.BAND_INDEX))
    per_batch = {r["ingest_batch"]: r["n"] for r in
                 idx.groupBy("ingest_batch")
                 .agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert per_batch[0] == 2 and per_batch[1] == 1


def test_sig_index_accumulates_with_band_index(setup):
    """The signature table is the band index's verification sibling:
    one row per ACCEPTED doc per batch, carrying the packed minhash
    array the next batch's estimate gate reads."""
    spark, lake, _, _ = setup
    sigs = spark.read.parquet(lake.path(C.SIG_INDEX))
    rows = {(r["ingest_batch"], r["doc_id"]): r["sig"] for r in sigs.collect()}
    assert set(rows) == {(0, 1), (0, 4), (1, 12)}
    assert all(len(v) == 16 for v in rows.values())


def test_band_collision_without_similarity_is_not_dropped(spark, tmp_path):
    """The r3 ADVICE scenario: two DISTINCT documents that share an LSH
    band (engineered via a high-collision 16-bands-of-1 config) must BOTH
    survive — the estimated-Jaccard gate vetoes the band hit.  Also
    proves the cross-batch path: the same dissimilar doc arriving in a
    later batch collides with stored state and is still kept."""
    from ocr_documents_spark.jobs.lake import Lake
    from ocr_documents_spark.operators import dedup as D
    lake = Lake(str(tmp_path / "lake"), n_buckets=4)
    bands = 16  # rows-per-band = 1: band collisions are near-certain, drops
    commit = C.curation_committer(lake, bands=bands)   # still be gated

    base = GOOD_A.split("\n")
    other = GOOD_D.split("\n")
    # ~50% line overlap: near-certain band collisions at rows=1, true
    # Jaccard far below the 0.7 gate
    half_a = "\n".join(base[:4] + other[:4])
    half_b = "\n".join(base[:4] + other[4:])
    d0 = spark.createDataFrame([(1, half_a, "web"), (2, half_b, "web")],
                               "doc_id long, text string, source string")
    # precondition: the pair actually collides on some band
    sig = D.minhash_signatures(d0.select("doc_id", "text"), 16, bands)
    hit_pairs = D.candidate_pairs(sig, bands).count()
    est = (D.candidate_pairs(sig, bands)
           .join(sig.select(F.col("doc_id").alias("a_doc_id"),
                            D.signature_col(16).alias("a_sig")), "a_doc_id")
           .join(sig.select(F.col("doc_id").alias("b_doc_id"),
                            D.signature_col(16).alias("b_sig")), "b_doc_id")
           .select(D.estimated_jaccard(F.col("a_sig"), F.col("b_sig"))
                   .alias("est")).collect())
    assert hit_pairs >= 1 and all(r["est"] < 0.7 for r in est), \
        "fixture must engineer a band collision below the gate"

    commit(d0, 0)
    kept = {r["doc_id"] for r in
            spark.read.parquet(lake.path(C.CURATED)).collect()}
    assert kept == {1, 2}                      # nobody falsely dropped
    m0 = spark.read.parquet(lake.path(C.CURATION_METRICS)) \
        .filter(F.col("ingest_batch") == 0).first()
    assert m0["batch_band_hits"] >= 1 and m0["batch_est_drops"] == 0

    # cross-batch: a third ~50%-overlap doc probes the stored index
    half_c = "\n".join(base[4:] + other[:4])
    d1 = spark.createDataFrame([(3, half_c, "web")],
                               "doc_id long, text string, source string")
    commit(d1, 1)
    kept = {r["doc_id"] for r in
            spark.read.parquet(lake.path(C.CURATED)).collect()}
    assert 3 in kept
    m1 = spark.read.parquet(lake.path(C.CURATION_METRICS)) \
        .filter(F.col("ingest_batch") == 1).first()
    assert m1["index_est_drops"] == 0


def test_metrics_schema_static_without_bench(spark, tmp_path):
    """ADVICE r3: runs with and without an eval set must write the SAME
    metrics schema — optional stages are NULL, never absent columns."""
    from ocr_documents_spark.jobs.lake import Lake
    lake = Lake(str(tmp_path / "lake2"), n_buckets=4)
    commit = C.curation_committer(lake)        # no bench
    d = spark.createDataFrame([(1, GOOD_F, "web")],
                              "doc_id long, text string, source string")
    commit(d, 0)
    m = spark.read.parquet(lake.path(C.CURATION_METRICS))
    assert set(m.columns) == {"ingest_batch"} | set(C.METRICS_COLUMNS)
    row = m.first()
    assert row["after_decontaminate"] is None
    assert row["after_index_dedup"] == 1


def test_replay_is_idempotent(setup):
    spark, lake, commit, batch1 = setup
    before = _kept(spark, lake)
    commit(batch1, 1)                           # at-least-once replay
    after = _kept(spark, lake)
    assert after == before                      # same rows, no dupes
    # and doc 12 survived the replay: its own batch-1 bands in the index
    # were excluded from the probe, so it did not collide with itself
    assert 12 in after


def test_partial_index_state_degrades_instead_of_crashing(spark, tmp_path):
    """A crash between the two sequential index writes leaves a band
    index without its sibling sig index; the replayed batch must treat
    the lake as having no verifiable state (index_band_hits = 0), not
    crash-loop on the missing parquet path, and must then rewrite both
    tables."""
    import shutil
    root = str(tmp_path / "lake")
    lake = Lake(root, n_buckets=4)
    commit = C.curation_committer(lake)
    b0 = spark.createDataFrame([(1, GOOD_A, "web"), (2, GOOD_D, "web")],
                               "doc_id long, text string, source string")
    commit(b0, 0)
    shutil.rmtree(lake.path(C.SIG_INDEX))      # the simulated half-write
    b1 = spark.createDataFrame([(11, GOOD_A, "web")],
                               "doc_id long, text string, source string")
    commit(b1, 1)                              # must not raise
    metrics = spark.read.parquet(lake.path(C.CURATION_METRICS))
    row = metrics.filter(F.col("ingest_batch") == 1).first()
    assert row["index_band_hits"] == 0
    assert row["after_index_dedup"] == row["after_batch_dedup"]
    # both index tables exist again after the successful commit
    import os
    assert os.path.isdir(lake.path(C.SIG_INDEX))


def test_probe_counts_only_batch_survivors(spark, tmp_path):
    """index_band_hits counts collisions of batch-dedup SURVIVORS only:
    a doc already dropped within the batch cannot be dropped again, so
    its collisions must not inflate the hits metric (the documented
    hits - drops = avoided-false-drops invariant)."""
    root = str(tmp_path / "lake")
    lake = Lake(root, n_buckets=4)
    commit = C.curation_committer(lake)
    b0 = spark.createDataFrame([(1, GOOD_A, "web")],
                               "doc_id long, text string, source string")
    commit(b0, 0)
    # batch 1: two copies of the indexed doc — the within-batch gate
    # drops doc 12, so only doc 11 can collide with stored state
    b1 = spark.createDataFrame(
        [(11, GOOD_A, "web"), (12, GOOD_A, "web")],
        "doc_id long, text string, source string")
    commit(b1, 1)
    row = (spark.read.parquet(lake.path(C.CURATION_METRICS))
           .filter(F.col("ingest_batch") == 1).first())
    assert row["after_batch_dedup"] == 1       # 12 dropped in-batch
    assert row["index_band_hits"] == 1         # only survivor 11 counted
    assert row["after_index_dedup"] == 0       # 11 dropped vs the index


def test_hot_bucket_star_guard_in_batch_dedup(spark, tmp_path):
    """r5: the batch-internal candidate join inherits candidate_pairs'
    BUCKET_CAP star guard.  A micro-batch with more DISTINCT mutually-
    near-dup texts than the cap in one band bucket must (a) run through
    the star path without losing the drops — identical kept set as an
    uncapped committer on the same batch — and (b) keep exact dups
    collapsing BEFORE banding (the guard's documented precondition),
    which since r5 uses the whitespace-normalized exact_fingerprint, so
    a whitespace variant can never repopulate a hot bucket."""
    variants = [GOOD_A] + [
        GOOD_A.replace("fog", w)
        for w in ("mist", "haze", "smoke", "steam", "vapor")]
    rows = [(i + 1, t, "web") for i, t in enumerate(variants)]
    rows.append((7, GOOD_A.replace("fog ", "fog  ") + " ", "web"))  # ws var
    rows.append((9, GOOD_F, "books"))                               # unrelated
    batch = spark.createDataFrame(
        rows, "doc_id long, text string, source string")

    kept = {}
    for name, cap in (("capped", 2), ("uncapped", None)):
        lake = Lake(str(tmp_path / name), n_buckets=4)
        C.curation_committer(lake, bucket_cap=cap)(batch, 0)
        kept[name] = set(_kept(spark, lake))
        m = (spark.read.parquet(lake.path(C.CURATION_METRICS)).first())
        # the whitespace variant collapsed at the exact stage: the est
        # gate saw at most the 6 distinct variants
        assert m["input"] == 8
        assert m["after_batch_dedup"] == len(kept[name])
    # star guard loses none of the drops on this cluster (every member
    # is near-dup to the min-id anchor), and the unrelated doc survives
    assert kept["capped"] == kept["uncapped"]
    assert 9 in kept["capped"] and 1 in kept["capped"]
    assert len(kept["capped"]) == 2
