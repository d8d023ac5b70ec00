"""Domain mixing (operators/mixing.py): exact DuckDB parity on the
driver corpus, determinism across reruns/salts, rate convergence."""

import duckdb
import pytest

from ocr_documents_spark.operators import mixing as MX

SF_DIR = "/root/testdata/sf0.001"
WEIGHTS = {"web": 0.4, "books": 1.0, "wiki": 0.7}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _domains(docs):
    return {r["source"] for r in docs.select("source").distinct().collect()}


def test_sample_matches_duckdb_oracle(docs):
    doms = sorted(_domains(docs))
    weights = {d: w for d, w in
               zip(doms, (0.3, 0.65, 1.0, 0.5, 0.0, 0.8))}
    got = sorted(r["doc_id"] for r in
                 MX.domain_weighted_sample(docs, weights).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = sorted(r[0] for r in
                  con.execute(MX.duckdb_sample_sql(weights)).fetchall())
    assert got == want
    assert 0 < len(got) < docs.count()


def test_deterministic_and_salt_rotates(docs):
    weights = {d: 0.5 for d in _domains(docs)}
    a = {r["doc_id"] for r in
         MX.domain_weighted_sample(docs, weights).collect()}
    b = {r["doc_id"] for r in
         MX.domain_weighted_sample(docs, weights).collect()}
    assert a == b                                   # rerun-identical
    c = {r["doc_id"] for r in
         MX.domain_weighted_sample(docs, weights, salt="epoch2").collect()}
    assert c != a                                   # salt rotates
    # same expected size either way (both ~50% of corpus)
    n = docs.count()
    assert abs(len(c) - len(a)) < 0.2 * n


def test_report_rates_and_defaults(docs):
    doms = sorted(_domains(docs))
    weights = {doms[0]: 1.0, doms[1]: 0.0}
    rep = {r["domain"]: r.asDict()
           for r in MX.mixing_report(docs, weights).collect()}
    assert rep[doms[0]]["n_kept"] == rep[doms[0]]["n_docs"]
    assert rep[doms[1]]["n_kept"] == 0
    for d in doms[2:]:                    # default weight 0 drops unknowns
        assert rep[d]["n_kept"] == 0 and rep[d]["target_weight"] == 0.0
    rep2 = {r["domain"]: r.asDict()
            for r in MX.mixing_report(docs, weights,
                                      default_weight=0.5).collect()}
    # Bernoulli(0.5) aggregate across all defaulted domains: tight at
    # hundreds of docs (per-domain bands on 25 docs would be flaky)
    kept = sum(rep2[d]["n_kept"] for d in doms[2:])
    total = sum(rep2[d]["n_docs"] for d in doms[2:])
    assert total > 0 and 0.4 < kept / total < 0.6


# ---------------------------------------------------------------------------
# Token-budget sampling
# ---------------------------------------------------------------------------

def _budgets(docs, frac):
    """Per-domain budgets at ~frac of each domain's token mass."""
    from ocr_documents_spark.operators.dedup import ws_words_col
    import pyspark.sql.functions as F
    tot = {r["source"]: r["t"] for r in
           docs.withColumn("__t", F.size(ws_words_col(F.col("text"))))
           .groupBy("source").agg(F.sum("__t").alias("t")).collect()}
    return {d: int(t * frac) for d, t in tot.items()}


def test_token_budget_matches_duckdb_oracle(docs):
    budgets = _budgets(docs, 0.3)
    got = sorted(r["doc_id"] for r in
                 MX.token_budget_sample(docs, budgets).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = sorted(r[0] for r in con.execute(
        MX.duckdb_token_budget_sql(budgets)).fetchall())
    assert got == want
    assert 0 < len(got) < docs.count()
    # unbudgeted domains drop by default; full-budget domains keep all
    some = sorted(budgets)[0]
    only = {k: v for k, v in budgets.items() if k != some}
    dropped = MX.token_budget_sample(docs, only)
    assert dropped.filter(f"source = '{some}'").count() == 0


def test_token_budget_prefix_contract_and_determinism(docs):
    """kept_tokens lands in [budget - max_doc, budget + max_doc): the
    crossing doc is kept, nothing after it; and the kept set is a pure
    function of ids — partitioning cannot change it."""
    import pyspark.sql.functions as F
    budgets = _budgets(docs, 0.25)
    rep = {r["domain"]: r for r in
           MX.token_budget_report(docs, budgets).collect()}
    from ocr_documents_spark.operators.dedup import ws_words_col
    max_doc = docs.select(
        F.max(F.size(ws_words_col(F.col("text")))).alias("m")
    ).first()["m"]
    for d, r in rep.items():
        assert budgets[d] <= r["kept_tokens"] < budgets[d] + max_doc
        assert r["kept_tokens"] <= r["total_tokens"]

    a = sorted(r["doc_id"] for r in
               MX.token_budget_sample(docs, budgets).collect())
    b = sorted(r["doc_id"] for r in
               MX.token_budget_sample(docs.repartition(17),
                                      budgets).collect())
    assert a == b
    # salt rotation changes the kept set but not its budget contract
    c = sorted(r["doc_id"] for r in
               MX.token_budget_sample(docs, budgets, salt="e2").collect())
    assert c != a and len(c) > 0


def test_token_budget_plan_has_no_whole_domain_window(docs):
    """The doc-level window must consume ONLY the crossing bucket's
    rows: the plan's Window node sits above a __st = partial filter,
    never over the full scan (the census window runs over the tiny
    (domain, bucket) table)."""
    budgets = _budgets(docs, 0.3)
    plan = MX.token_budget_sample(docs, budgets) \
        ._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    # the doc-level window (ordered by __u) exists exactly once, and a
    # Filter sits between it and its scan — the window consumes only the
    # crossing bucket's rows, never the raw relation (Catalyst folds the
    # __st = 'partial' comparison into the underlying bucket-threshold
    # predicates, so we assert the Filter's presence structurally)
    win_idx = [i for i, l in enumerate(lines) if "Window" in l
               and "__u" in l]
    assert len(win_idx) == 1, plan
    i = win_idx[0]
    rel = next(j for j in range(i, len(lines))
               if "Relation" in lines[j] or "LogicalRDD" in lines[j])
    assert any("Filter" in l for l in lines[i:rel]), plan
    # and the census window (bucket cumsum) orders by __bkt, not __u —
    # i.e. no second corpus-ordered window anywhere
    assert sum("Window" in l and "__bkt" in l and "orderBy" not in l
               for l in lines) <= 2


def test_token_budget_null_domain_takes_default(spark):
    """NULL-source docs are their own group under default_budget (the
    oracle's CASE ELSE branch) — a plain equi-join would silently drop
    them (r4 review finding)."""
    rows = [(i, "one two three four five", None if i < 4 else "web")
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string")
    kept = sorted(r["doc_id"] for r in
                  MX.token_budget_sample(df, {"web": 10**9},
                                         default_budget=7).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                "source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(r[0] for r in con.execute(MX.duckdb_token_budget_sql(
        {"web": 10**9}, default_budget=7)).fetchall())
    assert kept == want
    # the 7-token default keeps exactly the first 5-token NULL doc's
    # prefix (1 full doc + the crossing doc) plus all web docs
    assert sum(1 for i in kept if i < 4) == 2
    assert sum(1 for i in kept if i >= 4) == 4


def test_token_budget_zero_token_doc_at_exact_boundary(spark, monkeypatch):
    """A zero-token doc whose preceding cumulative equals the budget
    must be DROPPED (strict prefix <) even when its whole bucket ends
    exactly on the budget line — B_BITS=0 forces one bucket per domain
    so the keep/partial classification is what decides (r4 review:
    the old <= keep rule kept it, diverging from the oracle)."""
    import hashlib
    monkeypatch.setattr(MX, "B_BITS", 0)
    u = lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    ids = sorted(range(100, 120), key=lambda i: (u(i), i))
    word_ids, empty_id = ids[:3], ids[-1]    # empty doc sorts LAST
    rows = [(i, "token", "d") for i in word_ids] + \
           [(empty_id, "", "d")]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string")
    kept = sorted(r["doc_id"] for r in
                  MX.token_budget_sample(df, {"d": 3}).collect())
    assert kept == sorted(word_ids)          # boundary doc dropped
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                "source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(r[0] for r in con.execute(
        MX.duckdb_token_budget_sql({"d": 3})).fetchall())
    assert kept == want
