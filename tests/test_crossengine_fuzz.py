"""Randomized cross-engine parity: the new text operators (line dedup,
n-gram LM scoring) against their DuckDB twins on adversarial random
corpora — whitespace runs, tabs, carriage returns, blank lines, repeated
fragments — where tokenization drift between engines classically hides.

Deterministic seeds; each case registers the SAME generated corpus in
both engines and demands value-for-value equality."""

import random

import duckdb

import pytest

from ocr_documents_spark.operators import line_dedup as LD
from ocr_documents_spark.operators import ngram_lm as LM

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "NODE", "x1", "y2", "payload",
         "2024-01-05", "v2.1", "(paren)", "a,b", "tab\tsep"]
SEPS = [" ", "  ", " \t ", "\t"]
REPEATED = ["shared boilerplate line with enough characters",
            "another recurring footer fragment entirely"]


def _random_corpus(seed: int, n_docs: int = 40):
    rng = random.Random(seed)
    rows = []
    for d in range(n_docs):
        lines = []
        for _ in range(rng.randrange(1, 8)):
            if rng.random() < 0.3:
                lines.append(rng.choice(REPEATED))
            elif rng.random() < 0.1:
                lines.append(rng.choice(["", " ", "\t", "   "]))
            else:
                k = rng.randrange(1, 9)
                lines.append(rng.choice(SEPS).join(
                    rng.choice(WORDS) for _ in range(k)))
        text = "\n".join(lines)
        if rng.random() < 0.1:
            text += "\r"          # stray CR survives the \n split
        rows.append((d, text))
    return rows


@pytest.mark.parametrize("seed", [11, 47, 2026])
def test_line_dedup_parity_on_random_corpora(spark, seed):
    rows = _random_corpus(seed)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_dropped"])
           for r in LD.remove_common_lines(df, min_docs=3).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        LD.duckdb_remove_common_lines_sql(min_docs=3)).fetchall()}
    assert got == want


@pytest.mark.parametrize("seed", [13, 99])
def test_perplexity_parity_on_random_corpora(spark, seed):
    rows = _random_corpus(seed)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = LM.train_lm_counts(df, sample_mod=2)
    got = {r["doc_id"]: (r["n_grams"], r["avg_logp"])
           for r in LM.perplexity_scores(df, counts).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        LM.duckdb_perplexity_sql(sample_mod=2)).fetchall()}
    assert got == want


@pytest.mark.parametrize("seed", [5, 301])
def test_bloom_parity_on_random_keys(spark, seed):
    """Random unicode-ish keys, random (m, k): word table and verdicts
    bit-identical across engines."""
    from ocr_documents_spark.operators import bloom as B
    rng = random.Random(seed)
    m = 32 * rng.randrange(8, 200)
    k = rng.randrange(1, 11)
    keys = list({f"{rng.choice(WORDS)}:{rng.randrange(10**6)}"
                 for _ in range(300)})
    probe = keys[:100] + [f"fresh-{i}-{seed}" for i in range(100)]
    kdf = spark.createDataFrame([(x,) for x in keys], "key string")
    pdf = spark.createDataFrame([(x,) for x in probe], "key string")
    words = B.bloom_build(kdf, "key", m, k)
    con = duckdb.connect()
    con.execute("CREATE TABLE keys (key VARCHAR)")
    con.executemany("INSERT INTO keys VALUES (?)", [(x,) for x in keys])
    con.execute("CREATE TABLE probe (key VARCHAR)")
    con.executemany("INSERT INTO probe VALUES (?)", [(x,) for x in probe])
    assert sorted(map(tuple, words.collect())) \
        == sorted(tuple(r) for r in con.execute(
            B.duckdb_bloom_words_sql("keys", "key", m, k)).fetchall())
    got = {r["key"]: r["maybe_present"] for r in
           B.bloom_probe(pdf, words, "key", m, k).collect()}
    want = dict(con.execute(B.duckdb_bloom_probe_sql(
        "keys", "probe", "key", m, k)).fetchall())
    assert got == want
    assert all(got[x] for x in keys[:100])    # never a false negative


@pytest.mark.parametrize("seed", [21, 404])
def test_url_canonical_parity_on_random_urls(spark, seed):
    """Random URL soup — mixed-case hosts, random ports, shuffled
    tracking/content params, fragments, junk rows — canonical parity."""
    from ocr_documents_spark.operators import urls as U
    rng = random.Random(seed)
    rows = []
    for i in range(300):
        if rng.random() < 0.1:
            rows.append((i, rng.choice(
                ["nonsense", "", "//nohost", "http:/", None])))
            continue
        scheme = rng.choice(["http", "HTTP", "https", "HTTPS", "ftp"])
        host = rng.choice(["Example.COM", "www.Site.org", "a.b.co.uk",
                           "xn--bcher-kva.ch"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/A/b", "/x%20y/"])
        params = rng.sample(
            ["a=1", "z=2", "utm_source=t", "utm_x=9", "gclid=g",
             "ref=r", "q=hello", "empty=", "=bare"],
            rng.randrange(0, 5))
        rng.shuffle(params)
        frag = rng.choice(["", "#top", "#a?b=c"])
        q = ("?" + "&".join(params)) if params else ""
        rows.append((i, f"{scheme}://{host}{port}{path}{q}{frag}"))
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = sorted((r["doc_id"], r["canonical_url"], r["host"], r["site"])
                 for r in U.with_canonical_urls(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE urls (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        f"SELECT doc_id, {U.duckdb_canonical_parts_sql()} FROM urls"
    ).fetchall())
    assert got == want


@pytest.mark.parametrize("seed", [33, 777])
def test_linear_classifier_parity_on_random_corpora(spark, seed):
    """Random whitespace-adversarial corpora with random 0/1 labels:
    the trained weight table must stay bit-identical to the unrolled
    SQL twin even with NO learnable signal."""
    from ocr_documents_spark.operators import linear_classifier as LC
    rng = random.Random(seed)
    rows = [(d, t, rng.randrange(2)) for d, t in _random_corpus(seed, 60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = LC.train_linear_classifier(df, iters=3, d=512)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, "
                "label INTEGER)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(LC.duckdb_train_sql(
        "docs", n_train=len(rows), iters=3, d=512)).fetchall())
    assert sorted(map(tuple, w.collect())) == want


@pytest.mark.parametrize("seed", [8, 650])
def test_token_budget_parity_on_random_corpora(spark, seed):
    """Random domains + random budgets (including 0, tiny, and
    over-total): the kept set matches the oracle's per-domain prefix."""
    from ocr_documents_spark.operators import mixing as MX
    rng = random.Random(seed)
    rows = [(d, t, f"dom{rng.randrange(4)}")
            for d, t in _random_corpus(seed, 80)]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string")
    budgets = {"dom0": 0, "dom1": rng.randrange(1, 40),
               "dom2": rng.randrange(40, 200), "dom3": 10**9}
    got = sorted(r["doc_id"] for r in
                 MX.token_budget_sample(df, budgets).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                "source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(r[0] for r in con.execute(
        MX.duckdb_token_budget_sql(budgets)).fetchall())
    assert got == want
    assert any(s == "dom3" for i, _, s in rows
               if i in set(got))            # unbounded domain keeps all


@pytest.mark.parametrize("seed", [3, 58, 901])
def test_pagerank_parity_on_random_graphs(spark, seed):
    """Random graphs stressing every structural hazard of the integer
    micro-unit twin: dangling sinks (mass leak), self-loops, multi-edges
    (must collapse), disconnected components, hubs, and isolated pairs —
    exact value parity at several iteration depths plus the mass
    invariants."""
    from ocr_documents_spark.operators import graph as G
    rng = random.Random(seed)
    n = rng.randrange(30, 90)
    nodes = [f"n{i}" for i in range(n)]
    edges = []
    # hub: many in-links to node 0
    edges += [(rng.choice(nodes), "n0") for _ in range(n // 2)]
    # random edges incl. self-loops
    edges += [(rng.choice(nodes), rng.choice(nodes))
              for _ in range(3 * n)]
    # a disconnected 2-cycle island
    edges += [("island_a", "island_b"), ("island_b", "island_a")]
    # dangling sink: in-links only
    edges += [(rng.choice(nodes), "sink_only") for _ in range(5)]
    # duplicates on purpose
    edges += edges[: n // 3]
    df = spark.createDataFrame(edges, "src string, dst string")
    iters = rng.choice([1, 4, 7])
    got = {r["node"]: r["rank_micro"]
           for r in G.pagerank(df, iters=iters).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edges)
    want = dict(con.execute(G.duckdb_pagerank_sql(
        "SELECT src, dst FROM edges", iters=iters)).fetchall())
    assert got == want
    # invariants: total mass never exceeds SCALE; teleport floor holds
    base = ((100 - G.DAMPING_PCT) * (G.SCALE // len(want))) // 100
    assert sum(got.values()) <= G.SCALE
    assert all(v >= base for v in got.values())


@pytest.mark.parametrize("seed", [17, 404, 7321])
def test_pack_sequences_parity_on_random_corpora(spark, seed):
    """Sequence packing against its DuckDB manifest twin on adversarial
    corpora the driver tables never contain: NULL / empty /
    whitespace-only texts (must vanish from the manifest on BOTH
    engines), one-token docs, giant docs spanning many sequences, and
    tab/newline/multi-space runs where whitespace tokenization drifts —
    at a random seq_len.  Value parity plus the gap-free tiling
    invariant re-checked on the fuzz corpus."""
    from ocr_documents_spark.operators import packing as PK
    rng = random.Random(seed)
    L = rng.randrange(8, 65)
    rows, did = [], 0
    for _ in range(rng.randrange(25, 45)):
        roll = rng.random()
        if roll < 0.12:
            text = rng.choice([None, "", " ", " \t ", "\n\n", "  \r\n "])
        elif roll < 0.22:
            text = rng.choice(WORDS)                     # single token
        elif roll < 0.32:                                # giant doc
            k = rng.randrange(3 * L, 6 * L)
            text = rng.choice(SEPS).join(rng.choice(WORDS)
                                         for _ in range(k))
        else:
            k = rng.randrange(1, 2 * L)
            sep = rng.choice(SEPS + ["\n", " \n "])
            text = sep.join(rng.choice(WORDS) for _ in range(k))
        rows.append((did, text))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    manifest = PK.pack_sequences(df, L).collect()
    got = sorted((r["seq_id"], r["doc_id"], r["doc_start"],
                  r["seq_start"], r["n_tok"]) for r in manifest)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in
                  con.execute(PK.duckdb_pack_sql(L)).fetchall())
    assert got == want and len(got) > 0
    seqs = {}
    for sid, _, _, start, n in got:
        seqs.setdefault(sid, []).append((start, n))
    last = max(seqs)
    assert set(seqs) == set(range(last + 1))
    for sid, sl in seqs.items():
        sl.sort()
        pos = 0
        for start, n in sl:
            assert start == pos and n > 0
            pos += n
        assert pos == L or (sid == last and 0 < pos <= L)


@pytest.mark.parametrize("seed", [29, 653, 8101])
def test_quality_filters_parity_on_random_corpora(spark, seed):
    """The three twin-backed quality metrics (line repetition, top
    n-gram char fraction, C4 line clean) on adversarial random corpora:
    repeated lines, tab-joined words INSIDE lines (where a space-only
    oracle split miscounts words and flips the C4 keep decision —
    the builder uses the shared \\s+ tokenizer exactly like the
    operator), blank/whitespace lines, missing terminal punctuation,
    dominant repeated grams."""
    from ocr_documents_spark.operators import quality_filters as QF
    rng = random.Random(seed)
    rows = []
    for d in range(rng.randrange(25, 40)):
        lines = []
        for _ in range(rng.randrange(1, 9)):
            roll = rng.random()
            if roll < 0.25:
                lines.append(rng.choice(REPEATED) + ".")
            elif roll < 0.35:
                lines.append(rng.choice(["", " ", "\t", "   "]))
            elif roll < 0.5:          # tab-joined words, random ending
                k = rng.randrange(1, 7)
                lines.append("\t".join(rng.choice(WORDS[:10])
                                       for _ in range(k))
                             + rng.choice([".", "!", "?", "", " "]))
            elif roll < 0.6:          # dominant repeated gram
                gram = f"{rng.choice(WORDS[:6])} {rng.choice(WORDS[:6])}"
                lines.append(((gram + " ") * rng.randrange(3, 9)).strip()
                             + ".")
            else:
                k = rng.randrange(1, 10)
                lines.append(" ".join(rng.choice(WORDS[:12])
                                      for _ in range(k))
                             + rng.choice([".", "", "'", '"']))
        rows.append((d, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)

    got = {r["doc_id"]: (r["n_lines"], r["dup_line_frac"],
                         r["dup_line_char_frac"])
           for r in QF.line_repetition_metrics(df).collect()}
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        QF.duckdb_line_repetition_sql()).fetchall()}
    assert got == want

    for n in (2, 3):            # the builder parametrizes gram width
        got = {r["doc_id"]: (r["top_ngram"], r["top_ngram_char_frac"])
               for r in QF.top_ngram_char_fraction(df, n).collect()}
        want = {r[0]: (r[1], r[2]) for r in con.execute(
            QF.duckdb_top_ngram_sql(n)).fetchall()}
        assert got == want, n

    got = {r["doc_id"]: (r["clean_text"], r["n_kept_lines"],
                         r["n_dropped_lines"])
           for r in QF.c4_line_filter(df).collect()}
    want = {r[0]: (r[1] or "", r[2], r[3]) for r in con.execute(
        QF.duckdb_c4_line_filter_sql()).fetchall()}
    assert got == want


@pytest.mark.parametrize("seed", [31, 777, 6203])
def test_decontaminate_parity_on_random_corpora(spark, seed):
    """Benchmark decontamination on random corpora + eval sets mixing
    verbatim corpus chunks (guaranteed k-gram hits), one-word
    perturbations (hit-adjacent misses), and fresh text: the
    contamination report, the any-hit drop set (broadcast AND shuffle
    modes — proven identical on arbitrary data, not just the engineered
    frames), and the overlap-fraction rule at a random ppm must all
    match the DuckDB twins value-for-value."""
    from ocr_documents_spark.operators import decontaminate as DC
    rng = random.Random(seed)
    k = rng.choice([3, 4, 5])
    docs = []
    for d in range(rng.randrange(20, 35)):
        n = rng.randrange(1, 30)
        docs.append((d, " ".join(rng.choice(WORDS[:14])
                                 for _ in range(n))))
    bench, bid = [], 10**6
    for _ in range(rng.randrange(4, 9)):
        roll = rng.random()
        src = rng.choice(docs)[1].split(" ")
        if roll < 0.4 and len(src) >= k:
            i = rng.randrange(0, len(src) - k + 1)
            j = i + rng.randrange(k, min(len(src) - i, 2 * k) + 1)
            bench.append((bid, " ".join(src[i:j])))
        elif roll < 0.7 and len(src) > k:
            chunk = list(src[:k + 2])
            chunk[rng.randrange(len(chunk))] = "PERTURBED"
            bench.append((bid, " ".join(chunk)))
        else:
            bench.append((bid, " ".join(
                rng.choice(["fresh1", "fresh2", "fresh3"])
                for _ in range(rng.randrange(1, 10)))))
        bid += 1
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "bench_id long, text string")
    import pandas as pd
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs,
                                           columns=["doc_id", "text"]))
    con.register("bench", pd.DataFrame(bench,
                                       columns=["bench_id", "text"]))

    got_rep = {r["doc_id"]: (r["n_hit_grams"], tuple(r["sample_hits"]))
               for r in DC.contamination_report(ddf, bdf, k).collect()}
    want_rep = {r[0]: (r[1], tuple(r[2])) for r in con.execute(
        DC.duckdb_contamination_sql(k)).fetchall()}
    assert got_rep == want_rep

    kept_bc = sorted(r["doc_id"] for r in
                     DC.decontaminate(ddf, bdf, k).collect())
    kept_sh = sorted(r["doc_id"] for r in
                     DC.decontaminate(ddf, bdf, k,
                                      mode="shuffle").collect())
    want_kept = sorted(d for d, _ in docs if d not in want_rep)
    assert kept_bc == want_kept
    assert kept_sh == want_kept

    ppm = rng.choice([1, 250_000, 700_000, 999_999])
    got_ppm = sorted(r["doc_id"] for r in DC.decontaminate(
        ddf, bdf, k, max_overlap_ppm=ppm).collect())
    want_ppm = sorted(r[0] for r in con.execute(
        DC.duckdb_fraction_kept_sql(k, ppm)).fetchall())
    assert got_ppm == want_ppm


@pytest.mark.parametrize("seed", [41, 512, 9007])
def test_zorder_key_parity_on_random_tables(spark, seed):
    """Morton keys on random integer tables — negative values, constant
    columns (span clamp), 2 and 3 dims, random bit widths — must equal
    the DuckDB twin's unrolled arithmetic exactly for every row."""
    from ocr_documents_spark.operators import zorder as Z
    import pandas as pd
    rng = random.Random(seed)
    n_cols = rng.choice([2, 3])
    bits = rng.choice([4, 6, 8])
    cols = [f"c{i}" for i in range(n_cols)]
    n = rng.randrange(60, 140)
    data = {"rid": list(range(n))}
    for i, c in enumerate(cols):
        if i == n_cols - 1 and rng.random() < 0.4:
            v = rng.randrange(-50, 50)
            data[c] = [v] * n                       # constant column
        else:
            lo = rng.randrange(-10**6, 0)
            hi = rng.randrange(1, 10**6)
            data[c] = [rng.randrange(lo, hi) for _ in range(n)]
    pdf = pd.DataFrame(data)
    df = spark.createDataFrame(pdf)
    got = {r["rid"]: r["z"]
           for r in Z.zorder_key(df, cols, bits=bits).collect()}
    con = duckdb.connect()
    con.register("t", pdf)
    want = {r[0]: r[-1] for r in con.execute(
        Z.duckdb_zorder_sql("t", cols, bits=bits)).fetchall()}
    assert got == want and len(got) == n


@pytest.mark.parametrize("seed", [59, 610, 4242])
def test_domain_sample_parity_on_random_weights(spark, seed):
    """Deterministic Bernoulli mixing on random weight tables — weights
    at 0.0 and 1.0, unknown domains riding the default, NULL domains,
    sparse large doc_ids, a random salt — kept-id parity vs the twin."""
    from ocr_documents_spark.operators import mixing as MX
    rng = random.Random(seed)
    domains = [f"d{i}" for i in range(6)]
    weights = {d: rng.choice([0.0, 0.15, 0.5, 0.85, 1.0])
               for d in rng.sample(domains, 4)}   # two domains unknown
    default_w = rng.choice([0.0, 0.3])
    salt = rng.choice(["", "r5", "epoch2"])
    rows = []
    for _ in range(rng.randrange(80, 150)):
        did = rng.randrange(0, 10**12)
        src = rng.choice(domains + [None])
        rows.append((did, src))
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(r["doc_id"] for r in MX.domain_weighted_sample(
        df, weights, default_weight=default_w, salt=salt).collect())
    import pandas as pd
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(rows, columns=["doc_id", "source"]))
    want = sorted(r[0] for r in con.execute(MX.duckdb_sample_sql(
        weights, default_weight=default_w, salt=salt)).fetchall())
    assert got == want
    if any(v == 1.0 for v in weights.values()):
        full = {d for d, v in weights.items() if v == 1.0}
        keep = set(got)
        assert all(i in keep for i, s in rows if s in full)


@pytest.mark.parametrize("seed", [67, 1201])
def test_semantic_dedup_parity_on_random_vectors(spark, seed):
    """Flat SemDeDup on random float32-EXACT vectors (multiples of 1/64,
    so the Spark float32 column and the DuckDB double view hold
    identical values and every downstream double operation agrees
    bit-for-bit) with planted exact copies and one-coordinate
    perturbations: full (vec_id, group_id, group_size, is_canonical)
    parity vs the unrolled k-means + closure twin, plus the planted
    pairs must actually group."""
    from ocr_documents_spark.operators import semdedup as SM
    rng = random.Random(seed)
    dim, n_base = 8, 440            # covers every INIT_IDS seed id
    grid = [i / 64.0 for i in range(-128, 129)]
    rows = []
    for v in range(n_base):
        vec = [rng.choice(grid) for _ in range(dim)]
        vec[0] = rng.choice([g for g in grid if abs(g) >= 0.5])  # no 0-vec
        rows.append((v, vec))
    planted = []
    for _ in range(25):
        src_id, src_vec = rng.choice(rows[:n_base])
        nid = 10_000 + len(planted)
        if rng.random() < 0.5:
            nv = list(src_vec)                       # exact copy, cos=1
        else:
            nv = list(src_vec)
            j = rng.randrange(1, dim)
            nv[j] = nv[j] + rng.choice([-1, 1]) / 64.0
        planted.append((nid, src_id))
        rows.append((nid, nv))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["group_id"], r["group_size"], r["is_canonical"])
           for r in SM.semantic_dedup_groups(df).collect()}
    import pandas as pd
    con = duckdb.connect()
    con.register("emb_fuzz", pd.DataFrame(
        [(i, list(map(float, v))) for i, v in rows],
        columns=["vec_id", "embedding"]))
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        SM.duckdb_semantic_dedup_sql(
            "SELECT vec_id, embedding FROM emb_fuzz")).fetchall()}
    assert got == want
    # planted near-dups group under their source unless they straddled a
    # cell boundary (the paper's recall trade) — most must group
    grouped = sum(1 for nid, src in planted
                  if got[nid][0] == got[src][0])
    assert grouped >= len(planted) * 2 // 3, grouped


@pytest.mark.parametrize("seed", [73, 3301])
def test_semantic_decontaminate_parity_on_random_vectors(spark, seed):
    """Embedding-space decontamination on the same float32-exact 1/64
    grid: eval sets mixing exact corpus copies, one-coordinate
    perturbations, and fresh vectors — kept-id parity (broadcast twin),
    report parity (hit counts + max cosine), and broadcast ≡ cells-mode
    (seed_by_hash, arbitrary id space) on random data."""
    from ocr_documents_spark.operators import (semantic_decontaminate
                                               as SD)
    rng = random.Random(seed)
    dim = 8
    grid = [i / 64.0 for i in range(-128, 129)]

    def rand_vec():
        v = [rng.choice(grid) for _ in range(dim)]
        v[0] = rng.choice([g for g in grid if abs(g) >= 0.5])
        return v

    corpus = [(100_000 + i, rand_vec()) for i in range(150)]
    evals = []
    for j in range(rng.randrange(5, 12)):
        roll = rng.random()
        src = rng.choice(corpus)[1]
        if roll < 0.4:
            ev = list(src)                          # exact leak
        elif roll < 0.7:
            ev = list(src)
            ev[rng.randrange(1, dim)] += rng.choice([-1, 1]) / 64.0
        else:
            ev = rand_vec()                         # fresh
        evals.append((500_000 + j, ev))
    cdf = spark.createDataFrame(corpus,
                                "vec_id long, embedding array<float>")
    edf = spark.createDataFrame(evals,
                                "vec_id long, embedding array<float>")
    import pandas as pd
    con = duckdb.connect()
    con.register("cf", pd.DataFrame(
        [(i, list(map(float, v))) for i, v in corpus],
        columns=["vec_id", "embedding"]))
    con.register("ef", pd.DataFrame(
        [(i, list(map(float, v))) for i, v in evals],
        columns=["vec_id", "embedding"]))
    c_sql = "SELECT vec_id, embedding FROM cf"
    e_sql = "SELECT vec_id, embedding FROM ef"

    kept_bc = sorted(r["vec_id"] for r in
                     SD.semantic_decontaminate(cdf, edf).collect())
    want_kept = sorted(r[0] for r in con.execute(
        SD.duckdb_semantic_kept_sql(c_sql, e_sql)).fetchall())
    assert kept_bc == want_kept
    assert len(kept_bc) < len(corpus)      # the planted leaks dropped

    got_rep = {r["vec_id"]: (r["n_eval_hits"], r["max_cos"]) for r in
               SD.semantic_contamination_report(cdf, edf).collect()}
    want_rep = {r[0]: (r[1], r[2]) for r in con.execute(
        SD.duckdb_semantic_report_sql(c_sql, e_sql)).fetchall()}
    assert got_rep == want_rep

    kept_cells = sorted(r["vec_id"] for r in SD.semantic_decontaminate(
        cdf, edf, mode="cells", nprobe=8,
        seed_by_hash=True).collect())      # nprobe=k: full probe ≡ brute
    assert kept_cells == want_kept


@pytest.mark.parametrize("seed", [83, 5501, 12007])
def test_pii_scrub_parity_on_random_corpora(spark, seed):
    """PII redaction byte-parity on random text mixing generated
    emails/IPs/phones/digit-runs with near-miss shapes (short digit
    runs, dotted non-IPs, @-signs without domains) at random positions
    and separators — where Java-regex vs RE2 semantics classically
    drift.  The census must stay consistent with the redaction
    (sum of counts == substitutions performed)."""
    from ocr_documents_spark.operators import pii as P
    import pandas as pd
    rng = random.Random(seed)

    def pii_token():
        roll = rng.random()
        if roll < 0.25:
            return (f"{rng.choice(['a.b', 'x_1', 'no-reply'])}"
                    f"@{rng.choice(['ex.com', 'm.co.uk', 'a-b.org'])}")
        if roll < 0.45:
            return ".".join(str(rng.randrange(0, 999)) for _ in range(4))
        if roll < 0.65:
            return (f"+{rng.randrange(1, 99)} "
                    f"({rng.randrange(10, 9999)}) "
                    f"{rng.randrange(100, 999)}-{rng.randrange(100, 9999)}")
        if roll < 0.8:
            return str(rng.randrange(10**9, 10**14))    # long digit run
        return rng.choice([          # near-misses that must NOT redact
            str(rng.randrange(10, 10**8)), "a@b", "1.2.3",
            "word@", "@domain.com"[1:], "1-2-3"])

    rows = []
    for d in range(rng.randrange(30, 50)):
        parts = []
        for _ in range(rng.randrange(1, 12)):
            if rng.random() < 0.45:
                parts.append(pii_token())
            else:
                parts.append(rng.choice(WORDS[:12]))
        rows.append((d, rng.choice([" ", "  ", "\n", ", "]).join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"]
           for r in P.scrub_corpus(df).select("doc_id",
                                              "clean_text").collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows,
                                           columns=["doc_id", "text"]))
    want = dict(con.execute(P.duckdb_scrub_sql()).fetchall())
    assert got == want
    census = {r["doc_id"]: r for r in P.pii_census(df).collect()}
    for d, text in rows:
        subs = sum(got[d].count(tok) for _, _, tok in P.PII_RULES)
        c = census[d]
        assert (c["n_email"] + c["n_ip"] + c["n_phone"]
                + c["n_digits"]) == subs, d


@pytest.mark.parametrize("seed", [97, 2213, 15101])
def test_blocklist_parity_on_random_corpora(spark, seed):
    """Phrase blocklist on random corpora where phrases appear exact,
    punctuation-mangled (Bad-Word!), case-rotated, embedded inside
    longer words (must NOT match — boundary semantics), and split
    across newlines/tabs (MUST match — whitespace normalizes): flag
    parity vs the twin plus report counts re-derived from the flags."""
    from ocr_documents_spark.operators import blocklist as B
    import pandas as pd
    rng = random.Random(seed)
    phrases = ["bad word", "Spam-Phrase", "junk"]
    norm = ["bad word", "junk", "spam phrase"]

    def mention():
        roll = rng.random()
        if roll < 0.2:
            return rng.choice(["bad word", "junk", "spam phrase"])
        if roll < 0.4:
            return rng.choice(["Bad-Word!", "JUNK.", "spam_phrase",
                               "bad\tword", "spam\nphrase"])
        if roll < 0.6:                      # embedded: must NOT flag
            return rng.choice(["junkyard", "badword", "nonjunk",
                               "spamphrase", "wordbad"])
        return " ".join(rng.choice(WORDS[:10])
                        for _ in range(rng.randrange(1, 6)))

    rows = [(d, rng.choice([" ", ", ", "\n"]).join(
                mention() for _ in range(rng.randrange(1, 8))))
            for d in range(rng.randrange(30, 50))]
    if rng.random() < 0.5:
        rows.append((len(rows), None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["blocked"]
           for r in B.flag_blocklisted(df, phrases).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows,
                                           columns=["doc_id", "text"]))
    want = dict(con.execute(
        B.duckdb_blocklist_sql("documents", phrases)).fetchall())
    assert got == want
    assert any(got.values()) and not all(got.values())
    rep = {r["phrase"]: r["n_docs"]
           for r in B.blocklist_report(df, phrases).collect()}
    assert set(rep) == set(norm)
    assert sum(rep.values()) >= sum(got.values())   # multi-phrase docs


@pytest.mark.parametrize("seed", [101, 7717])
def test_pq_rerank_parity_on_random_vectors(spark, seed):
    """The full PQ train→encode→ADC-shortlist→exact-rerank pipeline on
    float32-exact random 64-dim vectors (1/64 grid, ids covering every
    PQ_INIT_IDS seed): (query_id, neighbor_id, cos, rank) parity vs the
    unrolled DuckDB twin — sub-codebook training, 4-bit encoding, and
    asymmetric-distance shortlist selection all agree on arbitrary
    data, not just the fixture corpus."""
    from ocr_documents_spark.operators import pq as PQ
    import pandas as pd
    import pyspark.sql.functions as F
    rng = random.Random(seed)
    dim, n = 64, 480
    grid = [i / 64.0 for i in range(-64, 65)]
    rows = []
    for v in range(n):
        vec = [rng.choice(grid) for _ in range(dim)]
        vec[0] = rng.choice([g for g in grid if abs(g) >= 0.5])
        rows.append((v, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in PQ.pq_rerank_topk(df, F.col("vec_id") < 5,
                                   F.col("vec_id") >= 5).collect())
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        [(i, list(map(float, v))) for i, v in rows],
        columns=["vec_id", "embedding"]))
    want = sorted(tuple(r) for r in con.execute(
        PQ.duckdb_pq_rerank_sql(dim)).fetchall())
    assert got == want and len(got) == 15


@pytest.mark.parametrize("seed", [109, 9901])
def test_ivf_full_probe_parity_on_random_vectors(spark, seed):
    """Trained-IVF at full probe width on float32-exact random vectors
    must equal the exact brute-force top-k computed in DuckDB (same
    4-decimal cosine rounding, same (cos desc, neighbor_id asc) tie
    rule) — the recall/scan-fraction dial degenerates to exact on
    arbitrary data, independent of what k-means learned."""
    from ocr_documents_spark.operators.ivf import K_CELLS, ivf_topk
    import pandas as pd
    import pyspark.sql.functions as F
    rng = random.Random(seed)
    dim, n = 16, 450                 # ids cover every INIT_IDS seed
    grid = [i / 64.0 for i in range(-64, 65)]
    rows = []
    for v in range(n):
        vec = [rng.choice(grid) for _ in range(dim)]
        vec[0] = rng.choice([g for g in grid if abs(g) >= 0.5])
        rows.append((v, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted((r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
                 for r in ivf_topk(df, F.col("vec_id") < 5,
                                   F.col("vec_id") >= 5,
                                   nprobe=K_CELLS).collect())
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        [(i, list(map(float, v))) for i, v in rows],
        columns=["vec_id", "embedding"]))
    want = sorted(tuple(r) for r in con.execute("""
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, v -> CAST(v AS DOUBLE))
                       AS embedding
            FROM embeddings
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_dot_product(q.embedding, c.embedding)
                         / (sqrt(list_dot_product(q.embedding,
                                                  q.embedding))
                            * sqrt(list_dot_product(c.embedding,
                                                    c.embedding))), 4)
                       + 0.0 AS cos
            FROM e q CROSS JOIN e c
            WHERE q.vec_id < 5 AND c.vec_id >= 5
        )
        SELECT query_id, neighbor_id, cos, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored)
        WHERE rank <= 3""").fetchall())
    assert got == want and len(got) == 15
