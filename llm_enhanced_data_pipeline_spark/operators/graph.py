"""Web-graph operators: link extraction, host-level graph build, and
integer-exact PageRank for crawl prioritization.

Production crawl pipelines rank HOSTS before they rank pages: the
frontier fetches high-centrality hosts first and budgets low-value
ones (Common Crawl publishes exactly such a host-level ranking,
computed from the inter-host link graph; PageRank is the classic
recipe — Page, Brin, Motwani, Winograd 1999, "The PageRank Citation
Ranking"). This module supplies the three stages declaratively:

1. :func:`extract_links` — anchor tags out of raw HTML with RFC 3986
   reference resolution (absolute / protocol-relative / root-relative
   / relative forms; mailto:/javascript:/tel:/fragment-only skipped),
   pure ``regexp_extract_all`` + explode — one scan, no shuffle.
2. :func:`host_graph` — links collapsed to a weighted host→host edge
   list (self-loops dropped), one hash aggregation.
3. :func:`pagerank_int` — fixed-iteration power method in EXACT
   integer arithmetic: ranks live in bigint micro-units (``scale`` =
   1e9), damping is a rational 85/100, every division is a floor
   division and every sum is an order-independent bigint sum. The
   same recipe is emitted as an unrolled DuckDB CTE chain by
   :func:`pagerank_sql`, so the oracle comparison is bit-exact — no
   cross-engine float-summation-order hazard at any scale.

Scale posture: each PageRank iteration is one equi-join of the rank
frame against the edge list plus two hash aggregations — the classic
Spark formulation. The node-count and dangling-mass folds are 1-row
frames broadcast back via crossJoin (the package's documented
driver-fold-free pattern for scalar constants). Rank frames persist
per iteration through the shared cache ledger (at cluster scale you
would localCheckpoint instead to also truncate lineage; same hook).

The graph lane is beyond-reference scale surplus: the reference
pipeline ingests papers from APIs (scrapers/*.py) and never sees a
link graph; this is what its corpus-building stage needs once the
source is a crawl rather than an API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import persist_tracked

#: one anchor tag: href value in group 1, inner text in group 2.
#: RE2-safe (no lookaround) so Spark (Java regex) and DuckDB (RE2)
#: match identically; single- or double-quoted href, no-quote skipped.
ANCHOR_RE = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'

#: scheme-relative prefix of a base URL, e.g. ``https`` / ``http``
_SCHEME_RE = r"^(https?):"
#: origin of a base URL: scheme://host[:port], no path
_ORIGIN_RE = r"^(https?://[^/?#]+)"
#: base directory: everything up to (and including) the LAST slash of
#: the path, query/fragment excluded. Greedy [^?#]* backtracks to the
#: final '/', identically in Java regex and RE2.
_DIR_RE = r"^(https?://[^?#]*/)"
#: href schemes/forms that are never fetchable corpus links
_SKIP_RE = r"(?i)^(mailto:|javascript:|tel:|data:|#|$)"


def resolve_href(base: Column, href: Column) -> Column:
    """RFC 3986 reference resolution, the four forms a crawler meets:

    - absolute (``https?://…``) — taken as-is;
    - protocol-relative (``//host/…``) — base's scheme prepended;
    - root-relative (``/path``) — base's origin prepended;
    - relative (``img/x``) — resolved against the base *directory*
      (dot-segment normalization deliberately out of scope — both
      engines agree, and canonicalize_url downstream handles case /
      ports / params).

    mailto:/javascript:/tel:/data:/fragment-only/empty hrefs resolve
    to NULL (callers drop them). Pure CASE over regexps — codegen
    stays whole-stage."""
    dir_ = F.regexp_extract(base, _DIR_RE, 1)
    base_dir = F.when(dir_ == "", F.concat(base, F.lit("/"))).otherwise(dir_)
    return (
        F.when(href.rlike(_SKIP_RE), F.lit(None).cast("string"))
        .when(href.rlike(r"(?i)^https?://"), href)
        .when(
            href.startswith("//"),
            F.concat(F.regexp_extract(base, _SCHEME_RE, 1), F.lit(":"), href),
        )
        .when(
            href.startswith("/"),
            F.concat(F.regexp_extract(base, _ORIGIN_RE, 1), href),
        )
        .otherwise(F.concat(base_dir, href))
    )


def resolve_href_sql(base: str, href: str) -> str:
    """DuckDB twin of :func:`resolve_href` (same CASE, same regexps)."""
    dir_ = f"regexp_extract({base}, '{_DIR_RE}', 1)"
    base_dir = f"(CASE WHEN {dir_} = '' THEN {base} || '/' ELSE {dir_} END)"
    return f"""(CASE
      WHEN regexp_matches({href}, '{_SKIP_RE}') THEN NULL
      WHEN regexp_matches({href}, '(?i)^https?://') THEN {href}
      WHEN {href} LIKE '//%' THEN regexp_extract({base}, '{_SCHEME_RE}', 1) || ':' || {href}
      WHEN {href} LIKE '/%' THEN regexp_extract({base}, '{_ORIGIN_RE}', 1) || {href}
      ELSE {base_dir} || {href}
    END)"""


def extract_links(
    df: DataFrame, id_col: str, html_col: str, base_col: str
) -> DataFrame:
    """All fetchable links out of an HTML column: one row per anchor
    tag with a resolvable href — ``(id_col, href, anchor_text, url)``
    where ``url`` is the resolved absolute form. Unresolvable hrefs
    (mailto:/javascript:/fragment-only) are dropped.

    One scan: ``regexp_extract_all`` collects the anchor tags, explode
    fans them out, two more regexp_extracts split href/text — no
    Python, no shuffle."""
    tags = df.select(
        F.col(id_col),
        F.col(base_col).alias("_base"),
        F.explode(
            # the Python API, not F.expr: a SQL string literal would eat
            # the pattern's backslashes (\s) under default parser settings
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 0)
        ).alias("_tag"),
    )
    href = F.regexp_extract("_tag", ANCHOR_RE, 1)
    return (
        tags.select(
            F.col(id_col),
            href.alias("href"),
            F.regexp_extract("_tag", ANCHOR_RE, 2).alias("anchor_text"),
            resolve_href(F.col("_base"), href).alias("url"),
        )
        .filter(F.col("url").isNotNull())
    )


def url_host(url: Column) -> Column:
    """Lower-cased host of an absolute URL (port kept — callers wanting
    registered domains compose :func:`web.registered_domain_psl`)."""
    return F.lower(F.regexp_extract(url, r"://([^/?#]+)", 1))


def url_host_sql(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '://([^/?#]+)', 1))"


def host_graph(links: DataFrame, src_url: str, dst_url: str) -> DataFrame:
    """Weighted host→host edge list from page-level links: hosts
    extracted and lowercased, self-loops dropped, one hash aggregation
    to ``(src, dst, weight)``. The output is |hosts|²-bounded — at
    100 TB the page-level input shrinks ~1e4× into it, so everything
    downstream (PageRank) runs on the small frame."""
    s = url_host(F.col(src_url))
    t = url_host(F.col(dst_url))
    return (
        links.select(s.alias("src"), t.alias("dst"))
        .filter((F.col("src") != F.col("dst")) & (F.col("src") != ""))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )


# --- integer-exact PageRank -------------------------------------------------

#: rank unit: ranks sum to ~RANK_SCALE (minus deterministic floor loss)
RANK_SCALE = 1_000_000_000
#: damping factor as an exact rational (d = 85/100)
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank_int(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = RANK_SCALE,
    d_num: int = DAMP_NUM,
    d_den: int = DAMP_DEN,
) -> DataFrame:
    """Fixed-iteration PageRank over a weighted edge list, in exact
    bigint arithmetic → ``(node, rank_u)``.

    Recipe per iteration (all floor divisions, all bigint sums, so the
    result is identical in any engine and independent of partitioning
    or summation order — the property the oracle gate relies on):

    - ``share = rank_u div out_weight`` per linking node;
    - ``inflow(dst) = Σ weight·share`` over in-edges;
    - ``dangling = Σ rank_u`` over nodes with no out-edges;
    - ``rank' = (d_den−d_num)·scale div (d_den·N)
      + d_num·(inflow + dangling div N) div d_den``.

    N and the dangling mass are 1-row aggregates broadcast back via
    crossJoin (never a driver collect); each iteration's rank frame is
    persisted through the shared ledger because the next iteration
    reads it twice (dangling fold + share join). At 1000-executor
    scale the edge list is the |hosts|²-bounded host graph — per
    iteration one shuffle on ``src`` and one on ``dst``."""
    src_nodes = edges.select(F.col("src").alias("node"))
    nodes = persist_tracked(
        src_nodes.union(edges.select(F.col("dst").alias("node"))).distinct()
    )
    n_1row = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    outw = persist_tracked(
        edges.groupBy("src").agg(F.sum("weight").cast("bigint").alias("_outw"))
    )
    ranks = nodes.crossJoin(F.broadcast(n_1row)).select(
        "node", F.expr(f"cast({scale} div _n as bigint)").alias("rank_u")
    )
    base_u = (d_den - d_num) * scale
    for _ in range(n_iter):
        ranks = persist_tracked(ranks)
        joined = ranks.join(outw, ranks["node"] == outw["src"], "left")
        dang_1row = joined.filter(F.col("src").isNull()).agg(
            F.coalesce(F.sum("rank_u"), F.lit(0)).cast("bigint").alias("_dang")
        )
        inflow = (
            joined.filter(F.col("src").isNotNull())
            .select("node", F.expr("rank_u div _outw").alias("_share"))
            .join(edges, F.col("node") == edges["src"])
            .groupBy("dst")
            .agg(
                F.sum(F.col("weight") * F.col("_share"))
                .cast("bigint")
                .alias("_inflow")
            )
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_1row))
            .crossJoin(F.broadcast(dang_1row))
            .join(inflow, F.col("node") == inflow["dst"], "left")
            .select(
                "node",
                F.expr(
                    f"cast({base_u} div ({d_den} * _n) + {d_num} * "
                    f"(coalesce(_inflow, 0) + _dang div _n) div {d_den} "
                    "as bigint)"
                ).alias("rank_u"),
            )
        )
    return ranks


def pagerank_sql(
    edges_cte: str = "edges",
    n_iter: int = 5,
    scale: int = RANK_SCALE,
    d_num: int = DAMP_NUM,
    d_den: int = DAMP_DEN,
) -> str:
    """DuckDB twin of :func:`pagerank_int`: the same fixed-point
    recipe unrolled as a CTE chain (``pr_nodes``, ``pr_nn``,
    ``pr_outw``, then ``pr_r0…pr_r{n}``). Returns CTE definitions to
    splice after an ``edges_cte`` providing (src, dst, weight); the
    final ranks live in ``pr_r{n_iter}(node, rank_u)``.

    DuckDB sums integers into HUGEINT, hence the ``::BIGINT`` casts at
    every aggregate — after them each arithmetic step is the same
    bigint floor-division sequence Spark runs."""
    base_u = (d_den - d_num) * scale
    parts = [
        f"pr_nodes AS (SELECT src AS node FROM {edges_cte} "
        f"UNION SELECT dst FROM {edges_cte})",
        "pr_nn AS (SELECT count(*)::BIGINT AS n FROM pr_nodes)",
        f"pr_outw AS (SELECT src, sum(weight)::BIGINT AS outw "
        f"FROM {edges_cte} GROUP BY src)",
        f"pr_r0 AS (SELECT node, ({scale} // n)::BIGINT AS rank_u "
        "FROM pr_nodes CROSS JOIN pr_nn)",
    ]
    for i in range(n_iter):
        parts.append(
            f"pr_d{i} AS (SELECT coalesce(sum(r.rank_u), 0)::BIGINT AS dang "
            f"FROM pr_r{i} r LEFT JOIN pr_outw o ON r.node = o.src "
            "WHERE o.src IS NULL)"
        )
        parts.append(
            f"pr_c{i} AS (SELECT e.dst AS node, "
            "sum(e.weight * (r.rank_u // o.outw))::BIGINT AS inflow "
            f"FROM pr_r{i} r JOIN pr_outw o ON r.node = o.src "
            f"JOIN {edges_cte} e ON e.src = r.node GROUP BY e.dst)"
        )
        parts.append(
            f"pr_r{i + 1} AS (SELECT n0.node, "
            f"({base_u} // ({d_den} * nn.n) + {d_num} * "
            f"(coalesce(c.inflow, 0) + d.dang // nn.n) // {d_den})::BIGINT "
            "AS rank_u "
            f"FROM pr_nodes n0 CROSS JOIN pr_nn nn CROSS JOIN pr_d{i} d "
            f"LEFT JOIN pr_c{i} c ON n0.node = c.node)"
        )
    return ",\n".join(parts)
