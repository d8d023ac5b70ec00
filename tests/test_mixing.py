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
