"""Benchmark decontamination (operators/decontaminate.py): engineered
train/eval overlap vs the exact DuckDB twin, drop-mode semantics, and
the zero-corpus-shuffle broadcast plan."""

import duckdb
import pandas as pd
import pytest

from ocr_documents_spark.operators import decontaminate as DC

K = 4

EVAL_SNIPPET = "what is the capital of france"          # 6 words
TRAIN = [
    (0, f"quiz answers leaked online {EVAL_SNIPPET} paris obviously"),
    (1, "a perfectly clean training document about cooking pasta"),
    (2, f"another leak here {EVAL_SNIPPET} see above"),
    (3, "capital of france cuisine is famous"),   # only a 3-word overlap
]
BENCH = [
    (100, EVAL_SNIPPET),
    (101, "name the largest ocean on earth"),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "bench_id long, text string")
    return docs, bench


def test_report_vs_oracle(frames):
    docs, bench = frames
    got = {r["doc_id"]: (r["n_hit_grams"], tuple(r["sample_hits"]))
           for r in DC.contamination_report(docs, bench, K).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(TRAIN, columns=["doc_id", "text"]))
    con.register("bench", pd.DataFrame(BENCH, columns=["bench_id", "text"]))
    want = {r[0]: (r[1], tuple(r[2])) for r in con.execute(
        DC.duckdb_contamination_sql(K)).fetchall()}
    assert got == want
    assert set(got) == {0, 2}            # doc 3's 3-word overlap is < k
    assert got[0][0] == 3                # 6-word snippet -> three 4-grams


def test_decontaminate_drops_only_contaminated(frames):
    docs, bench = frames
    kept = sorted(r["doc_id"]
                  for r in DC.decontaminate(docs, bench, K).collect())
    assert kept == [1, 3]


def test_gram_join_is_broadcast(frames):
    """Scale shape: the corpus-side GRAM join (the full-corpus probe)
    must broadcast the eval grams — the corpus is never shuffled on the
    gram key.  The contaminated-ID anti-join deliberately carries NO
    hint (that set is corpus-derived and unbounded — one common eval
    8-gram could mark a huge corpus fraction, and a forced broadcast
    would OOM the driver); its static plan may show a sort-merge join
    that AQE downgrades to broadcast when the measured set is small."""
    docs, bench = frames
    plan = DC.decontaminate(docs, bench, K) \
        ._jdf.queryExecution().executedPlan().toString()
    bhj = [l for l in plan.splitlines() if "BroadcastHashJoin" in l]
    assert any("gram" in l for l in bhj), plan
    # and no join SHUFFLES the corpus on the gram key
    for l in plan.splitlines():
        if "SortMergeJoin" in l or "ShuffledHashJoin" in l:
            assert "gram" not in l, l


def test_shuffle_mode_identical_drop_set(spark, frames):
    """Eval-registry scale fallback: the fingerprinted non-broadcast
    path must produce exactly the broadcast path's drop set — on the
    engineered corpus AND the driver's documents table (where the eval
    set is a corpus subset, so contamination is guaranteed)."""
    docs, bench = frames
    kept = sorted(r["doc_id"] for r in
                  DC.decontaminate(docs, bench, K, mode="shuffle").collect())
    assert kept == [1, 3]
    sf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    ev = (sf.filter(sf.doc_id % 37 == 0)
          .select((sf.doc_id + 10**9).alias("bench_id"), "text"))
    a = {r["doc_id"] for r in DC.decontaminate(sf, ev, 8).collect()}
    b = {r["doc_id"] for r in
         DC.decontaminate(sf, ev, 8, mode="shuffle").collect()}
    n = sf.count()
    assert a == b and len(a) < n   # drops happened and sets agree


def test_shuffle_mode_joins_on_fingerprint(frames):
    """The shuffle path's gram join must key on the fixed-width 15-hex
    fingerprint, never the raw k-word gram string, and carry no forced
    broadcast of the eval side."""
    docs, bench = frames
    plan = DC.decontaminate(docs, bench, K, mode="shuffle") \
        ._jdf.queryExecution().executedPlan().toString()
    ex = [ln for ln in plan.splitlines() if "hashpartitioning(" in ln]
    assert any("gram_fp#" in ln for ln in ex), plan
    for ln in ex:
        assert "gram#" not in ln.split("hashpartitioning(", 1)[1], ln


def test_auto_mode_picks_by_eval_size(frames):
    docs, bench = frames
    small = DC.decontaminate(docs, bench, K, mode="auto")
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert any("BroadcastHashJoin" in ln and "gram" in ln
               for ln in plan.splitlines()), plan
    big = DC.decontaminate(docs, bench, K, mode="auto",
                           broadcast_gram_limit=1)
    plan_b = big._jdf.queryExecution().executedPlan().toString()
    assert any("gram_fp#" in ln for ln in plan_b.splitlines()), plan_b
    assert (sorted(r["doc_id"] for r in big.collect()) == [1, 3])


def test_overlap_across_line_break_detected(spark):
    """Regression: the eval snippet split by a newline inside the
    training doc must still hit — tokenization is whitespace-wide, so a
    line boundary cannot hide contamination."""
    docs = spark.createDataFrame(
        [(0, "intro line before the leak\nwhat is\nthe capital of "
             "france today\nclosing line after")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(1, "what is the capital of france")],
        "bench_id long, text string")
    rep = DC.contamination_report(docs, bench, k=6).collect()
    assert rep and rep[0]["doc_id"] == 0 and rep[0]["n_hit_grams"] >= 1


def test_fraction_mode_vs_oracle(frames):
    """PaLM-style overlap-fraction rule: doc 0 (3 hit grams of 6) stays
    at a 70% threshold and falls at 40%; the kept sets match the exact
    integer-cross-multiplication twin at several thresholds, and
    shuffle mode agrees with broadcast mode."""
    docs, bench = frames
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(TRAIN, columns=["doc_id", "text"]))
    con.register("bench", pd.DataFrame(BENCH, columns=["bench_id", "text"]))
    for ppm in (10_000, 400_000, 500_000, 700_000, 1_000_000):
        kept = sorted(r["doc_id"] for r in DC.decontaminate(
            docs, bench, K, max_overlap_ppm=ppm).collect())
        want = sorted(r[0] for r in con.execute(
            DC.duckdb_fraction_kept_sql(K, ppm)).fetchall())
        assert kept == want, ppm
        shuf = sorted(r["doc_id"] for r in DC.decontaminate(
            docs, bench, K, mode="shuffle",
            max_overlap_ppm=ppm).collect())
        assert shuf == kept, ppm

    fr = {r["doc_id"]: (r["n_grams"], r["n_hit"], r["overlap_ppm"])
          for r in DC.contamination_fractions(docs, bench, K).collect()}
    # doc 0: 12 words -> 9 distinct 4-grams, 3 hit -> 1/3 (ppm half-up)
    assert fr[0] == (9, 3, 333_333)
    assert fr[2] == (8, 3, 375_000)
    assert fr[1][1] == 0 and fr[3][1] == 0
    # the exact 1/3 boundary: strict integer > flips between
    # 333333 (3e6 > 2999997 -> dropped) and 333334 (kept)
    assert 0 not in {r["doc_id"] for r in DC.decontaminate(
        docs, bench, K, max_overlap_ppm=333_333).collect()}
    assert 0 in {r["doc_id"] for r in DC.decontaminate(
        docs, bench, K, max_overlap_ppm=333_334).collect()}
    # threshold 1e6 can only drop fully-contained docs: nothing here
    assert sorted(r["doc_id"] for r in DC.decontaminate(
        docs, bench, K, max_overlap_ppm=1_000_000).collect()) \
        == [0, 1, 2, 3]
