"""Corpus quality / repetition filters for LLM training-data curation.

The standard pre-training heuristics, Spark-native:

* C4 (Raffel et al., JMLR 2020): the line-level clean — keep only lines
  that end in terminal punctuation and carry enough words
  (:func:`c4_line_filter` rebuilds each document from its surviving
  lines, order preserved).
* Gopher rules (Rae et al., 2021, table A1): word-count bounds, mean
  word length bounds, symbol-to-word ratio, bullet/ellipsis line
  fractions, fraction of words with an alphabetic character.
* Repetition metrics (Gopher table A1 lower block): duplicate-line
  fraction (by line count and by character mass) and the top n-gram
  character fraction — the strongest cheap signals for
  machine-generated / templated junk.

Everything is a per-document computation: line metrics ride one
explode + two-level aggregate keyed by doc_id (partial-aggregatable,
no window), n-gram metrics ride array HOFs + one explode-groupBy per
doc.  No UDFs — the whole report is whole-stage codegen, and every
metric has an exact DuckDB twin (tests/test_quality_filters.py) so the
thresholds mean the same thing on any engine.

At 100 TB: the report is a map-side-heavy aggregation sharded by
doc_id (the table's natural key — no skew), emitting one metrics row
per document; the filter itself is then a pushdown-friendly conjunction
of column predicates.  Thresholds are parameters, defaults per the
papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Gopher table A1 defaults
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MAX_DUP_LINE_FRAC = 0.3
MAX_DUP_LINE_CHAR_FRAC = 0.2
MAX_TOP_2GRAM_CHAR_FRAC = 0.2


def _words(col: str = "text"):
    from .dedup import ws_words_col
    return ws_words_col(col)


def line_repetition_metrics(docs: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            line_sep: str = "\n") -> DataFrame:
    """-> (doc_id, n_lines, dup_line_frac, dup_line_char_frac).

    A line is "duplicate" when its exact text occurred earlier in the
    SAME document (Gopher counts every occurrence after the first).
    Two-level aggregate: (doc, line) occurrence counts, then per-doc
    ratios — both partial-aggregatable, no window, no sort.
    """
    lines = (docs
             .select(id_col, F.explode(F.split(text_col, line_sep))
                     .alias("line"))
             .filter(F.trim("line") != ""))
    per_line = (lines.groupBy(id_col, "line")
                .agg(F.count(F.lit(1)).alias("occ"),
                     F.length("line").alias("len")))
    return (per_line.groupBy(id_col)
            .agg(F.sum("occ").alias("n_lines"),
                 F.round(F.sum(F.col("occ") - 1) / F.sum("occ"), 6)
                 .alias("dup_line_frac"),
                 F.round(F.sum((F.col("occ") - 1) * F.col("len"))
                         / F.sum(F.col("occ") * F.col("len")), 6)
                 .alias("dup_line_char_frac")))


def top_ngram_char_fraction(docs: DataFrame, n: int = 2,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """-> (doc_id, top_ngram, top_ngram_char_frac): characters claimed by
    the single most frequent word n-gram (count * chars-in-gram) over
    total non-space characters.  Gram construction is the dedup module's
    zero-shuffle HOF pattern; the per-doc argmax is a max_by aggregate,
    not a window."""
    from .dedup import ngrams_over
    w = docs.select(id_col, _words(text_col).alias("ws"))
    grams = (w.filter(F.size("ws") >= n)
             .select(id_col,
                     F.aggregate("ws", F.lit(0),
                                 lambda a, x: a + F.length(x))
                     .alias("total_chars"),
                     F.explode(ngrams_over(F.col("ws"), n)).alias("gram")))
    per_gram = (grams.groupBy(id_col, "total_chars", "gram")
                .agg(F.count(F.lit(1)).alias("occ")))
    # chars claimed by a gram = occurrences * chars in the gram's words
    # (spaces excluded on both sides of the ratio); deterministic tiebreak
    # on the gram text keeps the argmax engine-independent
    claimed = per_gram.withColumn(
        "claimed",
        F.col("occ") * (F.length("gram")
                        - F.lit(n - 1)))  # n-1 joining spaces
    # min_by over (-claimed, gram): most-claimed gram wins, ties break to
    # the lexicographically smallest gram — engine-independent argmax
    return (claimed.groupBy(id_col)
            .agg(F.min_by(
                    F.struct(F.col("gram").alias("top_ngram"),
                             F.round(F.col("claimed") / F.col("total_chars"),
                                     6).alias("top_ngram_char_frac")),
                    F.struct((-F.col("claimed")).alias("nc"), F.col("gram")))
                 .alias("top"))
            .select(id_col, "top.top_ngram", "top.top_ngram_char_frac"))


def gopher_quality_metrics(docs: DataFrame,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """-> one row per doc with the Gopher table-A1 style text metrics
    (word census, mean word length, symbol ratio, bullet/ellipsis line
    fractions, alpha-word fraction).  Pure per-row HOF arithmetic —
    zero shuffle."""
    ws = _words(text_col)
    lines = F.filter(F.split(text_col, "\n"), lambda l: F.trim(l) != "")
    n_words = F.size(ws)
    n_lines = F.size(lines)
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[a-zA-Z]")))
    symbols = F.size(F.split(text_col, "[#@]")) - 1 \
        + F.size(F.split(text_col, "\\.\\.\\.")) - 1
    bullet_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike("^([-*•])")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike("\\.\\.\\.$")))
    # try_divide, not '/': under Spark 4's default ANSI mode a plain
    # division by zero THROWS — an empty/whitespace-only document must
    # instead yield NULL metrics and ride the documented fail-closed
    # path in quality_filter_report, never abort the job
    mean_wl = F.try_divide(
        F.aggregate(ws, F.lit(0), lambda a, x: a + F.length(x)), n_words)
    return docs.select(
        id_col,
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(F.try_divide(symbols, n_words), 6)
        .alias("symbol_word_ratio"),
        F.round(F.try_divide(bullet_lines, n_lines), 6)
        .alias("bullet_line_frac"),
        F.round(F.try_divide(ellipsis_lines, n_lines), 6)
        .alias("ellipsis_line_frac"),
        F.round(F.try_divide(alpha_words, n_words), 6)
        .alias("alpha_word_frac"))


C4_MIN_WORDS_PER_LINE = 3
C4_TERMINAL_RE = "[.!?\"']$"


def c4_line_filter(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words_per_line: int = C4_MIN_WORDS_PER_LINE
                   ) -> DataFrame:
    """C4's line-level clean -> (doc_id, clean_text, n_kept_lines,
    n_dropped_lines).  A line survives if it ends with terminal
    punctuation and has >= ``min_words_per_line`` words; the document is
    rebuilt from surviving lines in original order.  posexplode carries
    the order through the aggregation (array_sort over (pos, line)
    structs — per-row, no window), so the operator is one explode + one
    partial-aggregatable groupBy."""
    lines = docs.select(
        id_col,
        F.posexplode(F.split(text_col, "\n")).alias("pos", "line"))
    scored = lines.withColumn(
        "keep_line",
        F.trim("line").rlike(C4_TERMINAL_RE)
        & (F.size(_words("line")) >= min_words_per_line))
    kept = F.array_sort(F.collect_list(
        F.when(F.col("keep_line"), F.struct("pos", "line"))))
    return (scored.groupBy(id_col)
            .agg(F.concat_ws(
                    "\n", F.transform(kept, lambda t: t["line"]))
                 .alias("clean_text"),
                 F.sum(F.col("keep_line").cast("int"))
                 .alias("n_kept_lines"),
                 F.sum((~F.col("keep_line")).cast("int"))
                 .alias("n_dropped_lines")))


def quality_filter_report(docs: DataFrame,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """The curation deliverable: per-document metrics + one boolean per
    rule + the overall keep decision.  Broadcast-free: three metric
    branches co-keyed on doc_id join back (same shuffle key throughout,
    AQE plans them as one exchange-reusing pipeline)."""
    # all three branches do regex/HOF-heavy per-row work BEFORE their
    # first exchange — fan out a one-split scan (no-op on a well-split
    # lake), and share the fanned-out subtree across the branches
    from ..functions.fanout import fan_out
    docs = fan_out(docs, id_col)
    g = gopher_quality_metrics(docs, id_col, text_col)
    rep = line_repetition_metrics(docs, id_col, text_col)
    top2 = top_ngram_char_fraction(docs, 2, id_col, text_col)
    m = (g.join(rep, id_col, "left").join(top2, id_col, "left"))
    rules = {
        # metric rules: a NULL metric (empty doc) cannot be assessed ->
        # fail closed; repetition rules: NULL means "no lines / too few
        # words to form a gram" -> vacuously pass
        "ok_word_count": F.coalesce(
            F.col("n_words").between(MIN_WORDS, MAX_WORDS), F.lit(False)),
        "ok_mean_word_len": F.coalesce(
            F.col("mean_word_len").between(MIN_MEAN_WORD_LEN,
                                           MAX_MEAN_WORD_LEN), F.lit(False)),
        "ok_symbol_ratio": F.coalesce(
            F.col("symbol_word_ratio") <= MAX_SYMBOL_WORD_RATIO,
            F.lit(False)),
        "ok_bullet_lines": F.coalesce(
            F.col("bullet_line_frac") <= MAX_BULLET_LINE_FRAC, F.lit(False)),
        "ok_ellipsis_lines": F.coalesce(
            F.col("ellipsis_line_frac") <= MAX_ELLIPSIS_LINE_FRAC,
            F.lit(False)),
        "ok_alpha_words": F.coalesce(
            F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC, F.lit(False)),
        "ok_dup_lines": F.coalesce(
            F.col("dup_line_frac") <= MAX_DUP_LINE_FRAC, F.lit(True)),
        "ok_dup_line_chars": F.coalesce(
            F.col("dup_line_char_frac") <= MAX_DUP_LINE_CHAR_FRAC,
            F.lit(True)),
        "ok_top_2gram": F.coalesce(
            F.col("top_ngram_char_frac") <= MAX_TOP_2GRAM_CHAR_FRAC,
            F.lit(True)),
    }
    out = m
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


# --- DuckDB twins (house style: the exact oracle lives next to the
# operator so every test and fuzz pass shares one definition) ---------

def duckdb_line_repetition_sql(table: str = "docs") -> str:
    """Exact twin of :func:`line_repetition_metrics` over
    ``table(doc_id, text)``."""
    return f"""
        WITH lines AS (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS line
            FROM {table}),
        nz AS (SELECT doc_id, line FROM lines WHERE trim(line) <> ''),
        per AS (SELECT doc_id, line, count(*) AS occ,
                       length(line) AS len
                FROM nz GROUP BY 1, 2)
        SELECT doc_id, sum(occ)::BIGINT AS n_lines,
               round(sum(occ - 1) * 1.0 / sum(occ), 6) AS dup_line_frac,
               round(sum((occ - 1) * len) * 1.0 / sum(occ * len), 6)
                   AS dup_line_char_frac
        FROM per GROUP BY doc_id"""


def duckdb_top_ngram_sql(n: int = 2, table: str = "docs") -> str:
    """Exact twin of :func:`top_ngram_char_fraction`: same ws-regex word
    split, same claimed-chars arithmetic (occ * (gram chars minus the
    n-1 joining spaces)), same lexicographic tiebreak."""
    gram_expr = " || ' ' || ".join(f"ws[i + {j + 1}]" for j in range(n))
    return rf"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\s+'),
                               x -> x <> '') AS ws
            FROM {table}),
        t AS (SELECT doc_id, ws,
                     list_sum(list_transform(ws, x -> length(x)))
                         AS total_chars
              FROM w WHERE len(ws) >= {n}),
        g AS (SELECT doc_id, total_chars,
                     unnest(list_transform(range(len(ws) - {n - 1}),
                            i -> {gram_expr})) AS gram
              FROM t),
        per AS (SELECT doc_id, total_chars, gram, count(*) AS occ
                FROM g GROUP BY 1, 2, 3),
        c AS (SELECT doc_id, gram,
                     round(occ * (length(gram) - {n - 1}) * 1.0
                           / total_chars, 6) AS frac,
                     row_number() OVER (
                         PARTITION BY doc_id
                         ORDER BY occ * (length(gram) - {n - 1}) DESC,
                                  gram ASC) AS rk
              FROM per)
        SELECT doc_id, gram AS top_ngram, frac AS top_ngram_char_frac
        FROM c WHERE rk = 1"""


def duckdb_c4_line_filter_sql(min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
                              table: str = "docs") -> str:
    """Exact twin of :func:`c4_line_filter`.  Words inside a line split
    on the SHARED ws tokenizer (regex \\s+), exactly like the operator —
    a space-only split would count a tab-joined pair as one word and
    flip the keep decision for that line."""
    return rf"""
        WITH lines AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, chr(10)), 1)
                       AS pos,
                   unnest(string_split(text, chr(10))) AS line
            FROM {table}),
        scored AS (
            SELECT *, regexp_matches(trim(line), '[.!?"'']$')
                      AND len(list_filter(
                              regexp_split_to_array(line, '\s+'),
                              x -> x <> '')) >= {min_words_per_line}
                          AS keep
            FROM lines)
        SELECT doc_id,
               coalesce(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE keep), '') AS clean_text,
               sum(keep::INT)::BIGINT AS n_kept_lines,
               sum((NOT keep)::INT)::BIGINT AS n_dropped_lines
        FROM scored GROUP BY doc_id"""
