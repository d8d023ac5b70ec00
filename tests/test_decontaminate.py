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
