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
    assert m[1]["input"] == 3
    assert m[1]["after_index_dedup"] == m[1]["after_batch_dedup"] - 1
    assert m[1]["after_decontaminate"] == 1     # doc 13 dropped


def test_band_index_accumulates_per_batch(setup):
    spark, lake, _, _ = setup
    idx = spark.read.parquet(lake.path(C.BAND_INDEX))
    per_batch = {r["ingest_batch"]: r["n"] for r in
                 idx.groupBy("ingest_batch")
                 .agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert per_batch[0] == 2 and per_batch[1] == 1


def test_replay_is_idempotent(setup):
    spark, lake, commit, batch1 = setup
    before = _kept(spark, lake)
    commit(batch1, 1)                           # at-least-once replay
    after = _kept(spark, lake)
    assert after == before                      # same rows, no dupes
    # and doc 12 survived the replay: its own batch-1 bands in the index
    # were excluded from the probe, so it did not collide with itself
    assert 12 in after
