"""URL canonicalization + per-host document caps (the RefinedWeb §3.1
"URL filtering / deduplication" and per-domain balancing stage; C4 and
Dolma apply the same host-level hygiene).

Why this matters at 100 TB: crawl corpora are dominated by a handful of
mega-hosts, and the SAME page arrives under dozens of URL spellings
(tracking parameters, fragments, default ports, case-variant hosts).
Canonicalizing before any URL-keyed dedup/join collapses spelling
variants at scan speed, and a deterministic per-host cap stops a single
domain from owning the training mix.

Engine shape:

* :func:`with_canonical_urls` is PURE CODEGEN — regexp parses (RE2-safe
  patterns, no lookaround/backrefs), array HOFs filter + sort query
  parameters, string concat rebuilds.  Zero shuffle, zero Python; every
  other column rides through.
* canonical form: scheme + host lowercased, userinfo and fragment
  dropped, default ports (http:80 / https:443) dropped, empty path
  normalized to "/", tracking parameters (utm_*, click ids, etc.)
  removed, surviving parameters SORTED for a stable key.  Percent-
  encoding normalization is documented out of scope (byte-level work
  with negligible collision yield on real crawls).
* ``site`` strips one leading "www." from the host — the grouping key
  for caps and reports (a public-suffix registered-domain cut needs the
  PSL table; the hook is :func:`site_col`, swap the expression there).
* :func:`cap_per_host` keeps at most ``cap`` docs per site with
  DETERMINISTIC selection — ordered by (md5 of the id, id), the house
  cross-engine sampling rule — via rank.grouped_top_k, the salted
  bounded-state primitive: no per-host sort, and the mega-host IS the
  skew case the salt was built for.  One shuffle on the site key.

Every function has an exact DuckDB twin (tests/test_urls.py): the
canonical string byte-for-byte, and the capped survivor set row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# drop a parameter when its name starts with one of these...
TRACKING_PREFIXES = ("utm_",)
# ...or equals one of these (click/campaign ids with no content effect)
TRACKING_EXACT = ("gclid", "fbclid", "msclkid", "dclid", "igshid",
                  "mc_cid", "mc_eid", "ref", "ref_src", "spm")

# ^scheme://authority path ?query #fragment — anchored, RE2-safe
_URL_RE = (r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
           r"(\?[^#]*)?(#.*)?$")
_HOST_RE = r"^(?:[^@]*@)?([^:]*)(?::([0-9]+))?$"   # userinfo? host :port?

DEFAULT_PORTS = {"http": "80", "https": "443"}


def _extract(col: Column, pattern: str, idx: int) -> Column:
    return F.regexp_extract(col, pattern, idx)


def _is_tracking(name: Column) -> Column:
    cond = F.lit(False)
    for p in TRACKING_PREFIXES:
        cond = cond | name.startswith(p)
    return cond | name.isin(*TRACKING_EXACT)


def _clean_query(raw: Column) -> Column:
    """'?a=1&utm_x=2' -> 'a=1' (filtered, sorted; '' when nothing
    survives)."""
    params = F.filter(
        F.split(F.substring(raw, 2, 1 << 20), "&"),
        lambda p: (p != "") & ~_is_tracking(
            F.element_at(F.split(p, "="), 1)))
    return F.concat_ws("&", F.array_sort(params))


def with_canonical_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canonical_url`` (NULL for unparseable), ``host``
    (lowercase, userinfo/port stripped), ``site`` (host minus one
    leading www.)."""
    u = F.trim(F.col(url_col))
    scheme = F.lower(_extract(u, _URL_RE, 1))
    authority = _extract(u, _URL_RE, 2)
    path = _extract(u, _URL_RE, 3)
    rawq = _extract(u, _URL_RE, 4)
    host = F.lower(_extract(authority, _HOST_RE, 1))
    port = _extract(authority, _HOST_RE, 2)

    keep_port = F.when(
        (port != "") & ~F.concat(scheme, F.lit(":"), port).isin(
            *[f"{s}:{p}" for s, p in DEFAULT_PORTS.items()]),
        F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    norm_path = F.when(path == "", F.lit("/")).otherwise(path)
    q = _clean_query(rawq)
    canon = F.concat(scheme, F.lit("://"), host, keep_port, norm_path,
                     F.when(q != "", F.concat(F.lit("?"), q))
                     .otherwise(F.lit("")))
    valid = (scheme != "") & (host != "")
    return (df
            .withColumn("canonical_url", F.when(valid, canon))
            .withColumn("host", F.when(valid, host))
            .withColumn("site", F.when(valid, site_col(host))))


def site_col(host: Column) -> Column:
    """Grouping key: host minus one leading 'www.'.  Swap in a
    public-suffix registered-domain cut here when the PSL table is
    available — every consumer (caps, reports) picks it up."""
    return F.regexp_replace(host, r"^www\.", "")


def host_report(df: DataFrame, url_col: str = "url") -> DataFrame:
    """-> (site, n_docs, share) — the census that decides cap targets.
    share is exact micro-rounded (x1e6, half-up) per the house rule."""
    sites = with_canonical_urls(df, url_col).filter(
        F.col("site").isNotNull())
    total = sites.count()
    return (sites.groupBy("site")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .withColumn(
                "share_ppm",
                F.floor((F.col("n_docs") * 2_000_000 + total)
                        / (2 * total)).cast("long")))


def cap_per_host(df: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id", cap: int = 1000,
                 salt_buckets: int = 8) -> DataFrame:
    """Keep at most ``cap`` docs per site, selected deterministically by
    (md5(id), id) — engine-independent, reproducible, and unbiased by
    ingest order.  Unparseable-URL rows pass through uncapped (they have
    no site; route them to a quarantine filter if the pipeline wants
    them gone).  Returns the input columns + canonical_url/host/site."""
    from .rank import grouped_top_k
    from ..functions.fanout import fan_out
    # the URL regex canonicalization runs map-side — fan out a
    # one-split scan (no-op on a well-split lake)
    withc = with_canonical_urls(fan_out(df, id_col), url_col)
    sited = withc.filter(F.col("site").isNotNull())
    sel = (sited.select(
        "site",
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15)
        .alias("__sel"),
        F.col(id_col)))
    keep = grouped_top_k(sel, ["site"], ["__sel", id_col], cap,
                         salt_buckets=salt_buckets) \
        .select(id_col)
    return (sited.join(keep, id_col, "left_semi")
            .unionByName(withc.filter(F.col("site").isNull())))


# ---------------------------------------------------------------------------
# DuckDB oracle (same regexes, same list ops, same selection rule)
# ---------------------------------------------------------------------------

def duckdb_canonical_parts_sql(url_expr: str = "url") -> str:
    """SELECT-list fragment producing canonical_url, host, site for
    ``{url_expr}`` — compose into any query.  Byte-identical to the
    Spark columns."""
    u = f"trim({url_expr})"
    scheme = f"lower(regexp_extract({u}, '{_URL_RE}', 1))"
    auth = f"regexp_extract({u}, '{_URL_RE}', 2)"
    path = f"regexp_extract({u}, '{_URL_RE}', 3)"
    rawq = f"regexp_extract({u}, '{_URL_RE}', 4)"
    host = f"lower(regexp_extract({auth}, '{_HOST_RE}', 1))"
    port = f"regexp_extract({auth}, '{_HOST_RE}', 2)"
    not_tracking = " AND ".join(
        [f"NOT starts_with(string_split(p, '=')[1], '{pre}')"
         for pre in TRACKING_PREFIXES]
        + ["string_split(p, '=')[1] NOT IN ("
           + ", ".join(f"'{e}'" for e in TRACKING_EXACT) + ")"])
    q = (f"array_to_string(list_sort(list_filter("
         f"string_split(substr({rawq}, 2), '&'), "
         f"p -> p <> '' AND {not_tracking})), '&')")
    defaults = " OR ".join(
        f"({scheme} || ':' || {port}) = '{s}:{p}'"
        for s, p in DEFAULT_PORTS.items())
    keep_port = (f"CASE WHEN {port} <> '' AND NOT ({defaults}) "
                 f"THEN ':' || {port} ELSE '' END")
    norm_path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    canon = (f"{scheme} || '://' || {host} || {keep_port} || {norm_path}"
             f" || CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END")
    valid = f"({scheme} <> '' AND {host} <> '')"
    site = f"regexp_replace({host}, '^www\\.', '')"
    return (f"CASE WHEN {valid} THEN {canon} END AS canonical_url, "
            f"CASE WHEN {valid} THEN {host} END AS host, "
            f"CASE WHEN {valid} THEN {site} END AS site")


def duckdb_cap_per_host_sql(cap: int, source: str = "urls",
                            url_expr: str = "url",
                            id_col: str = "doc_id") -> str:
    """Exact survivor-set twin of :func:`cap_per_host` ->
    ({id_col}, site) — NULL-site rows pass through."""
    return f"""
        WITH c AS (
            SELECT {id_col}, {duckdb_canonical_parts_sql(url_expr)}
            FROM {source}
        ), ranked AS (
            SELECT {id_col}, site,
                   row_number() OVER (
                       PARTITION BY site
                       ORDER BY substr(md5({id_col}::VARCHAR), 1, 15),
                                {id_col}) AS rn
            FROM c WHERE site IS NOT NULL
        )
        SELECT {id_col}, site FROM ranked WHERE rn <= {cap}
        UNION ALL
        SELECT {id_col}, site FROM c WHERE site IS NULL
    """
