"""URL hygiene operators for web-crawl corpora.

In Common-Crawl-style pipelines URL canonicalization runs BEFORE
content dedup (the same page arrives as http/https, with and without
tracking params, fragments, default ports, trailing slashes — exact
content-hash dedup then does the rest), and per-registered-domain caps
bound any one site's share of the corpus (C4/Gopher-era practice).

All transforms are pure string/array expressions (regexp + split +
filter + join) with byte-identical DuckDB twins — one scan-projection,
no shuffle, whole-stage-codegen friendly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import psl

# scheme://host[:port] prefix (before any path/query/fragment)
_PRE_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def canonicalize_url(url: Column) -> Column:
    """Canonical URL form:

    1. fragment dropped;
    2. scheme+host lowercased (path/query case preserved — paths are
       case-sensitive on most servers);
    3. default ports ``:80``/``:443`` stripped;
    4. ``utm_*`` tracking params removed via split→filter→rejoin on
       the query string (exact, order-preserving — no iterated-regex
       incompleteness on consecutive params);
    5. a single trailing slash stripped from non-root paths;
    6. an emptied query string drops its ``?``.

    Column-only expression; chain it ahead of content-hash dedup.
    """
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment
    pre = F.regexp_extract(u, _PRE_RE, 0)
    rest = F.substring(u, F.length(pre) + 1, F.lit(1 << 30))
    pre = F.lower(pre)  # 2. scheme+host case
    # 3. default ports — only the port that matches the SCHEME is
    # default (http://h:443 and https://h:80 point at real non-default
    # ports and must survive canonicalization distinct)
    pre = F.regexp_replace(pre, r"^(http://[^:/]*):80$", "$1")
    pre = F.regexp_replace(pre, r"^(https://[^:/]*):443$", "$1")
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    # 4. utm_* params out, others kept in order
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.startswith("utm_"),
    )
    newq = F.array_join(kept, "&")
    # 5. trailing slash on non-root path
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    return F.concat(
        pre,
        path,
        F.when(F.length(newq) > 0, F.concat(F.lit("?"), newq)).otherwise(F.lit("")),
    )


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (same step order, same
    patterns, same split→filter→rejoin param handling)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    pre = f"regexp_extract({u}, '{_PRE_RE}', 0)"
    rest = f"substring({u}, length({pre}) + 1)"
    cpre = (
        f"regexp_replace(regexp_replace(lower({pre}),"
        f" '^(http://[^:/]*):80$', '\\1'), '^(https://[^:/]*):443$', '\\1')"
    )
    path = f"regexp_replace({rest}, '\\?.*$', '')"
    query = (
        f"CASE WHEN contains({rest}, '?')"
        f" THEN regexp_replace({rest}, '^[^?]*\\?', '') ELSE '' END"
    )
    kept = (
        f"list_filter(string_split({query}, '&'),"
        f" _p -> len(_p) > 0 AND NOT starts_with(_p, 'utm_'))"
    )
    newq = f"array_to_string({kept}, '&')"
    cpath = (
        f"CASE WHEN length({path}) > 1 AND ends_with({path}, '/')"
        f" THEN substring({path}, 1, length({path}) - 1) ELSE {path} END"
    )
    return (
        f"({cpre} || {cpath} ||"
        f" CASE WHEN length({newq}) > 0 THEN '?' || {newq} ELSE '' END)"
    )


def registered_domain(url: Column) -> Column:
    """Last two dot-labels of the host — the ZERO-DATA approximation of
    the per-site cap key. Wrong on multi-label public suffixes (it
    lumps every ``*.co.uk`` site into one ``co.uk`` bucket); use
    :func:`registered_domain_psl` — the production key — unless the
    corpus is known to be generic-TLD only."""
    host = F.regexp_extract(url, r"://([^:/?#]+)", 1)
    return F.lower(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def registered_domain_sql(expr: str) -> str:
    host = f"regexp_extract({expr}, '://([^:/?#]+)', 1)"
    return f"lower(regexp_extract({host}, '([^.]+\\.[^.]+)$', 1))"


def registered_domain_psl(url: Column) -> Column:
    """Registrable domain of a URL per the Public Suffix List
    (vendored snapshot; see ``functions/psl.py``): ``example.co.uk``
    stays ``example.co.uk``, wildcard/exception rules honored, NULL
    when the host IS a public suffix. The production ``cap_per_domain``
    key — still a pure zero-shuffle column expression (the rule arrays
    constant-fold)."""
    return psl.registered_domain_psl(psl.host_of(url))


def registered_domain_psl_sql(expr: str) -> str:
    """DuckDB twin of :func:`registered_domain_psl` (same vendored
    snapshot)."""
    return psl.registered_domain_psl_sql(psl.host_of_sql(expr))


def cap_per_domain(
    df: DataFrame, domain_col: str, order_cols: list[Column], cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per domain (deterministic: lowest by
    ``order_cols`` first) — one keyed window, the standard bound on any
    single site's corpus share."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(*order_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
