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
Spark formulation, ONE Spark job per iteration. The node count is
driver-folded once; the per-iteration dangling mass is a broadcast
1-row frame riding the iteration's own job (the rank frame carries
each node's static out-weight, so the dangling sum is a zero-shuffle
filter+agg). Rank frames checkpoint per iteration through the shared
cache ledger.

The graph lane is beyond-reference scale surplus: the reference
pipeline ingests papers from APIs (scrapers/*.py) and never sees a
link graph; this is what its corpus-building stage needs once the
source is a crawl rather than an API.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32, stable_hash32_sql
from .dedup import (
    _LIVE_CKPT_IDS,
    _release_ckpt_blocks,
    _truncate_lineage,
    persist_tracked,
)

#: one anchor tag: href value in group 1, inner text in group 2.
#: RE2-safe (no lookaround) so Spark (Java regex) and DuckDB (RE2)
#: match identically. DOUBLE-quoted href only — single-quoted and
#: unquoted hrefs (rare in served HTML; invalid per the WHATWG
#: serialization) are skipped, identically in both engines.
ANCHOR_RE = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'

#: scheme-relative prefix of a base URL, e.g. ``https`` / ``http``
_SCHEME_RE = r"^(https?):"
#: origin of a base URL: scheme://host[:port], no path
_ORIGIN_RE = r"^(https?://[^/?#]+)"
#: base directory: everything up to (and including) the LAST slash of
#: the path, query/fragment excluded. Greedy [^?#]* backtracks to the
#: final '/', identically in Java regex and RE2.
_DIR_RE = r"^(https?://[^?#]*/)"
#: href forms that are never fetchable corpus links: ANY non-http(s)
#: scheme (mailto:, javascript:, tel:, data:, ftp:, ws:, about:,
#: blob:, android-app:, … — RFC 3986 scheme = ALPHA *(ALPHA / DIGIT /
#: "+" / "-" / ".") followed by ":"), fragment-only, or empty. The
#: absolute-http(s) branch is checked FIRST, so this never eats a real
#: link. Before r12 only a fixed scheme list was skipped and e.g.
#: ``ftp://x`` fell through to the relative branch, concatenating onto
#: the base directory as a bogus same-host URL (parity-safe but a
#: spurious edge in the link graph).
_SKIP_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*:|#|$)"


def resolve_href(base: Column, href: Column) -> Column:
    """RFC 3986 reference resolution, the four forms a crawler meets:

    - absolute (``https?://…``) — taken as-is;
    - protocol-relative (``//host/…``) — base's scheme prepended;
    - root-relative (``/path``) — base's origin prepended;
    - relative (``img/x``) — resolved against the base *directory*
      (dot-segment normalization deliberately out of scope — both
      engines agree, and canonicalize_url downstream handles case /
      ports / params).

    Any non-http(s)-scheme href (mailto:/javascript:/tel:/ftp:/ws:/…),
    fragment-only, or empty href resolves to NULL (callers drop them).
    Assumes an absolute http(s) ``base`` (the extract_links contract —
    page URLs in a crawl store are absolute); a relative base degrades
    deterministically (empty scheme/origin extracts), identically in
    both engines. Pure CASE over regexps — codegen stays
    whole-stage."""
    dir_ = F.regexp_extract(base, _DIR_RE, 1)
    base_dir = F.when(dir_ == "", F.concat(base, F.lit("/"))).otherwise(dir_)
    return (
        F.when(href.rlike(r"(?i)^https?://"), href)
        .when(href.rlike(_SKIP_RE), F.lit(None).cast("string"))
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
      WHEN regexp_matches({href}, '(?i)^https?://') THEN {href}
      WHEN regexp_matches({href}, '{_SKIP_RE}') THEN NULL
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
    Python, no shuffle. Anchors whose inner text contains nested
    markup (``<a ...><b>t</b></a>``) don't match the flat ``[^<]*``
    text group and are skipped whole — acceptable for link-graph
    building (the href-bearing flat anchors dominate); a full HTML
    parser lane would go through the main-content extractor's block
    machinery instead."""
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
    extracted and lowercased, self-loops and rows where EITHER side's
    host extraction failed (empty string) dropped, one hash aggregation
    to ``(src, dst, weight)``. The output is |hosts|²-bounded — at
    100 TB the page-level input shrinks ~1e4× into it, so everything
    downstream (PageRank) runs on the small frame. The filter logic is
    defined once and mirrored verbatim by :func:`host_graph_sql`, so a
    malformed URL can never diverge the two engines or admit an
    empty-string host node into the graph."""
    s = url_host(F.col(src_url))
    t = url_host(F.col(dst_url))
    return (
        links.select(s.alias("src"), t.alias("dst"))
        .filter(
            (F.col("src") != F.col("dst"))
            & (F.col("src") != "")
            & (F.col("dst") != "")
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )


def host_graph_sql(
    links_cte: str = "lk",
    src_url: str = "src_url",
    dst_url: str = "dst_url",
) -> str:
    """DuckDB twin of :func:`host_graph` — same host extraction, same
    self-loop and empty-host filters, same aggregation. Oracle preludes
    splice this as their ``edges`` CTE body so the filter logic lives
    in exactly one place per engine pair."""
    s = url_host_sql(src_url)
    t = url_host_sql(dst_url)
    return (
        f"SELECT {s} AS src, {t} AS dst, count(*)::BIGINT AS weight "
        f"FROM {links_cte} "
        f"WHERE {s} <> {t} AND {s} <> '' AND {t} <> '' "
        "GROUP BY 1, 2"
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
    teleport: str | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a weighted edge list, in exact
    bigint arithmetic → ``(node, rank_u)``.

    ``init_ranks`` (a prior ``(node, rank_u)`` frame) WARM-STARTS the
    power iteration — the recrawl pattern: production recomputes host
    ranks on an edge DELTA, not from scratch, and because the damped
    iteration is a contraction (factor d = 85/100 per round) a warm
    start from last crawl's ranks needs only enough rounds to absorb
    the delta, not to mix from uniform. Nodes absent from the prior
    frame (newly discovered hosts) start at the cold-start value
    (uniform share, or 0 under ``teleport`` — restart mass re-seeds
    them). The fixed point is init-independent, so warm and cold
    converge to the same ranks; only the iteration budget changes.

    ``teleport`` switches to PERSONALIZED PageRank (random walk with
    restart): the teleport vector concentrates on that node — restarts
    and dangling mass return to the seed instead of spreading
    uniformly, so ranks measure proximity to the seed (related-host
    discovery; Common Crawl's seed-expansion shape). All-integer like
    the uniform form: the seed's per-iteration restart term is one
    inlined literal, everyone else gets only damped inflow.

    Recipe per iteration (all floor divisions, all bigint sums, so the
    result is identical in any engine and independent of partitioning
    or summation order — the property the oracle gate relies on):

    - ``share = rank_u div out_weight`` per linking node;
    - ``inflow(dst) = Σ weight·share`` over in-edges;
    - ``dangling = Σ rank_u`` over nodes with no out-edges;
    - ``rank' = (d_den−d_num)·scale div (d_den·N)
      + d_num·(inflow + dangling div N) div d_den``.

    N (the node count) is a 1-row scalar driver-folded once and
    inlined as a plan literal. The per-iteration dangling mass rides
    INSIDE each iteration's own job as a broadcast 1-row aggregate
    (the package's documented 1-row-stat-frame crossJoin shape):
    because the rank frame carries its node's static ``_outw``
    (out-weight, null for dangling nodes — joined ONCE before the
    loop, not re-joined per round), the dangling sum is a zero-shuffle
    filter+agg over the checkpointed frame, and broadcasting it into
    the update plan makes each iteration exactly ONE Spark job: share
    projection → equi-join with edges → keyed agg → left join back to
    the static node frame → checkpoint. Re-measured r14 (guide §2.4,
    fewer jobs/shuffles per iteration): the r11-era per-iteration
    driver fold + ranks⋈outw re-join ran the 23-host sf0.1 fixture in
    3.38s; carrying ``_outw`` and in-lining the dangling mass as the
    broadcast 1-row frame runs it in 2.25s, bit-identical ranks. (The
    r11 measurement that favored the fold predates the ``_outw``
    carry: back then the fold shared the ranks⋈outw join with the
    update plan, so the broadcast variant paid that join twice.)
    Each iteration's rank frame is CHECKPOINTED eagerly through the
    package's `_truncate_lineage` (localCheckpoint, or reliable
    checkpoints under the ``reliable_checkpoints`` context manager —
    the connected-components posture): without truncation the logical
    plan doubles per iteration and Catalyst analysis/codegen dominates
    wall time long before the data does. Superseded iterations' blocks
    are freed immediately; the final frame's blocks are parked on the
    shared ledger for ``release_caches``. This runs the materializing
    jobs at plan-construction time, like the other eager operators. At
    1000-executor scale the edge list is the |hosts|²-bounded host
    graph — per iteration one shuffle on ``src`` and one on ``dst``.

    Overflow bound (ANSI mode fails loud rather than wrapping): the
    per-node inflow sum Σ weight·share is ≤ scale · Σ_in weight, so
    edge weights times ``scale`` (1e9 default) must stay under 2^63 —
    fine up to ~10^9 total in-weight per host; beyond that pass a
    smaller ``scale``."""
    sc = edges.sparkSession.sparkContext
    src_nodes = edges.select(F.col("src").alias("node"))
    nodes = src_nodes.union(edges.select(F.col("dst").alias("node"))).distinct()
    # coalesce(sum, 0): the dangling test below is `_outw IS NULL`,
    # which must mean "no outw ROW" (the DuckDB twin tests o.src IS
    # NULL — row membership). Without the coalesce, a caller-supplied
    # src whose weights are ALL NULL aggregates to a NULL sum and is
    # silently counted dangling in Spark but not in the oracle. With
    # it, such a node keeps _outw = 0 and the share division fails
    # loud under ANSI (all-NULL edge weights are a caller error, like
    # the overflow bound above) instead of diverging quietly. Internal
    # callers derive weight from count(*) — never NULL — so this is
    # behavior-neutral for every registered query.
    outw = edges.groupBy("src").agg(
        F.coalesce(F.sum("weight"), F.lit(0)).cast("bigint").alias("_outw")
    )
    # The node frame carries its STATIC out-weight (null = dangling)
    # so no iteration ever re-joins ranks against outw: the share is a
    # projection and the dangling mass a zero-shuffle filter+agg.
    nodes_w = persist_tracked(
        nodes.join(outw, nodes["node"] == outw["src"], "left").select(
            "node", "_outw"
        )
    )
    n = nodes_w.count()  # driver fold: |V|, inlined as a literal below
    if n == 0:
        # empty graph: the DuckDB twin's pr_nodes CTE is empty and the
        # final SELECT returns no rows — match that instead of raising
        # an opaque ZeroDivisionError at the scale // n fold below.
        # Checkpointed like the n_iter=0 degenerate: the documented
        # contract is that the RETURNED frame never references its
        # inputs' lineage (streaming/recrawl overwrites the warm-start
        # parquet in place), and an un-truncated projection over the
        # persisted nodes_w would reach the edges input if its cached
        # blocks were ever evicted.
        empty, ids0 = _truncate_lineage(
            nodes_w.select("node", F.lit(0).cast("bigint").alias("rank_u"))
        )
        _LIVE_CKPT_IDS.append((sc, ids0))
        return empty
    init = (
        F.when(F.col("node") == teleport, F.lit(scale)).otherwise(F.lit(0))
        if teleport is not None
        else F.lit(scale // n)
    )
    if init_ranks is not None:
        default = F.lit(0) if teleport is not None else F.lit(scale // n)
        prev = init_ranks.select(
            F.col("node").alias("_pn"), F.col("rank_u").alias("_prev")
        )
        r0 = nodes_w.join(prev, nodes_w["node"] == F.col("_pn"), "left").select(
            "node",
            "_outw",
            F.coalesce(F.col("_prev"), default).cast("bigint").alias("rank_u"),
        )
    else:
        r0 = nodes_w.select(
            "node", "_outw", init.cast("bigint").alias("rank_u")
        )
    # r0 is NOT checkpointed: it is a (join-free in the cold case)
    # projection over the persisted node frame, and iteration 1's
    # checkpoint truncates it along with its own round. The n_iter=0
    # degenerate still checkpoints, preserving the documented contract
    # that the RETURNED frame never references its inputs' lineage
    # (streaming/recrawl overwrites the warm-start parquet in place).
    if n_iter <= 0:
        ranks, ids0 = _truncate_lineage(r0)
        _LIVE_CKPT_IDS.append((sc, ids0))
        return ranks.select("node", "rank_u")
    ranks = r0
    live_ids: frozenset = frozenset()
    base_u = (d_den - d_num) * scale
    for _ in range(n_iter):
        # dangling mass as a broadcast 1-row frame computed off the
        # SAME checkpointed rank frame the update reads — it rides the
        # iteration's single job instead of a separate driver fold.
        # rank_u >= 0 throughout (init and update are sums of
        # non-negative integer terms), so SQL div == Python // here.
        dang_row = ranks.filter(F.col("_outw").isNull()).agg(
            F.coalesce(F.sum("rank_u"), F.lit(0)).alias("_dang")
        )
        inflow = (
            ranks.filter(F.col("_outw").isNotNull())
            .select("node", F.expr("rank_u div _outw").alias("_share"))
            .join(edges, F.col("node") == edges["src"])
            .groupBy("dst")
            .agg(
                F.sum(F.col("weight") * F.col("_share"))
                .cast("bigint")
                .alias("_inflow")
            )
        )
        if teleport is None:
            new_rank = F.expr(
                f"cast({base_u // (d_den * n)} + {d_num} * "
                f"(coalesce(_inflow, 0) + _dang div {n}) div {d_den} "
                "as bigint)"
            )
        else:
            # restart + dangling mass both return to the seed. The
            # seed comparison goes through the Column API (bound
            # literal), never interpolated SQL text — url_host can
            # emit a single quote from a crafted URL (https://evil'x/)
            # which would break or inject an inlined expression.
            seed_add = F.lit(base_u // d_den) + F.expr(
                f"({d_num} * _dang) div {d_den}"
            )
            new_rank = (
                F.expr(f"{d_num} * coalesce(_inflow, 0) div {d_den}")
                + F.when(F.col("node") == F.lit(teleport), seed_add)
                .otherwise(F.lit(0))
            ).cast("bigint")
        ranks, new_ids = _truncate_lineage(
            nodes_w.join(inflow, F.col("node") == inflow["dst"], "left")
            .crossJoin(F.broadcast(dang_row))
            .select("node", "_outw", new_rank.alias("rank_u"))
        )
        _release_ckpt_blocks(sc, live_ids)
        live_ids = new_ids
    _LIVE_CKPT_IDS.append((sc, live_ids))
    return ranks.select("node", "rank_u")


def pagerank_sql(
    edges_cte: str = "edges",
    n_iter: int = 5,
    scale: int = RANK_SCALE,
    d_num: int = DAMP_NUM,
    d_den: int = DAMP_DEN,
    teleport: str | None = None,
    prefix: str = "pr_",
    init_cte: str | None = None,
) -> str:
    """DuckDB twin of :func:`pagerank_int` (incl. the ``teleport``
    personalized and ``init_cte`` warm-start forms): the same
    fixed-point recipe unrolled as a CTE chain (``{prefix}nodes``,
    ``{prefix}nn``, ``{prefix}outw``, then ``{prefix}r0…r{n}``).
    Returns CTE definitions to splice after an ``edges_cte`` providing
    (src, dst, weight); the final ranks live in
    ``{prefix}r{n_iter}(node, rank_u)``. ``prefix`` keeps two
    instantiations (e.g. prior crawl + warm-started recrawl) collision
    free in one query; ``init_cte`` names a (node, rank_u) CTE whose
    ranks seed round 0, absent nodes defaulting like the Spark side.

    DuckDB sums integers into HUGEINT, hence the ``::BIGINT`` casts at
    every aggregate — after them each arithmetic step is the same
    bigint floor-division sequence Spark runs. Every CTE is emitted
    ``AS MATERIALIZED``: DuckDB 1.0 inlines multi-referenced CTEs by
    default, and each round references the previous one 3x — without
    materialization a warm-start chain composed on top of a prior
    chain re-evaluates the base 3^(i+j) times (observed: the recrawl
    oracle ran >120s at sf0.01; materialized it is instant)."""
    base_u = (d_den - d_num) * scale
    p = prefix
    # SQL-escape the seed literal (hosts can contain a single quote
    # via crafted URLs); the Spark side compares via a bound Column
    tp = teleport.replace("'", "''") if teleport is not None else None
    init = (
        f"(CASE WHEN node = '{tp}' THEN {scale} ELSE 0 END)"
        if teleport is not None
        else f"({scale} // n)"
    )
    parts = [
        f"{p}nodes AS MATERIALIZED (SELECT src AS node FROM {edges_cte} "
        f"UNION SELECT dst FROM {edges_cte})",
        f"{p}nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM {p}nodes)",
        f"{p}outw AS MATERIALIZED (SELECT src, sum(weight)::BIGINT AS outw "
        f"FROM {edges_cte} GROUP BY src)",
    ]
    if init_cte is not None:
        default = "0" if teleport is not None else f"({scale} // n)"
        parts.append(
            f"{p}r0 AS MATERIALIZED (SELECT n0.node, "
            f"coalesce(pv.rank_u, {default})::BIGINT AS rank_u "
            f"FROM {p}nodes n0 CROSS JOIN {p}nn "
            f"LEFT JOIN {init_cte} pv ON n0.node = pv.node)"
        )
    else:
        parts.append(
            f"{p}r0 AS MATERIALIZED (SELECT node, {init}::BIGINT AS rank_u "
            f"FROM {p}nodes CROSS JOIN {p}nn)"
        )
    for i in range(n_iter):
        parts.append(
            f"{p}d{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank_u), 0)::BIGINT AS dang "
            f"FROM {p}r{i} r LEFT JOIN {p}outw o ON r.node = o.src "
            "WHERE o.src IS NULL)"
        )
        parts.append(
            f"{p}c{i} AS MATERIALIZED (SELECT e.dst AS node, "
            "sum(e.weight * (r.rank_u // o.outw))::BIGINT AS inflow "
            f"FROM {p}r{i} r JOIN {p}outw o ON r.node = o.src "
            f"JOIN {edges_cte} e ON e.src = r.node GROUP BY e.dst)"
        )
        if teleport is None:
            new_rank = (
                f"({base_u} // ({d_den} * nn.n) + {d_num} * "
                f"(coalesce(c.inflow, 0) + d.dang // nn.n) // {d_den})"
            )
        else:
            new_rank = (
                f"({d_num} * coalesce(c.inflow, 0) // {d_den} + "
                f"(CASE WHEN n0.node = '{tp}' THEN "
                f"{base_u} // {d_den} + {d_num} * d.dang // {d_den} "
                "ELSE 0 END))"
            )
        parts.append(
            f"{p}r{i + 1} AS MATERIALIZED (SELECT n0.node, "
            f"{new_rank}::BIGINT AS rank_u "
            f"FROM {p}nodes n0 CROSS JOIN {p}nn nn CROSS JOIN {p}d{i} d "
            f"LEFT JOIN {p}c{i} c ON n0.node = c.node)"
        )
    return ",\n".join(parts)


# --- label-propagation communities -------------------------------------------


def lpa_communities(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Link communities by synchronous label propagation (Raghavan et
    al. 2007, the near-linear community baseline; crawl pipelines use
    host communities for per-farm corpus caps and link-spam analysis)
    → ``(node, community)``.

    Deterministic recipe (every step exact, mirrored by
    :func:`lpa_communities_sql`): edges are symmetrized (community
    structure is undirected) and weight-summed; labels start as the
    node's own name; per round each node takes the label with the
    largest incoming weight sum among its neighbours' current labels —
    ties broken by SMALLEST label — and isolated-in-round nodes keep
    theirs. Synchronous updates + total tie-break make the result
    partition-count and engine independent (asynchronous LPA is
    famously order-dependent; this variant trades a little convergence
    speed for reproducibility). Per round: one equi-join + one keyed
    aggregation + one keyed row_number window; label frames are
    checkpointed per round like :func:`pagerank_int`."""
    from pyspark.sql import Window

    sc = edges.sparkSession.sparkContext
    sym = persist_tracked(
        edges.select("src", "dst", "weight")
        .union(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "weight",
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").cast("bigint").alias("weight"))
    )
    nodes = persist_tracked(
        sym.select(F.col("src").alias("node")).distinct()
    )
    labels, live_ids = _truncate_lineage(
        nodes.select("node", F.col("node").alias("community"))
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("_score").desc(), F.col("community")
    )
    for _ in range(n_iter):
        winners = (
            labels.join(sym, labels["node"] == sym["src"])
            .groupBy("dst", "community")
            .agg(F.sum("weight").cast("bigint").alias("_score"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("dst").alias("_n"), F.col("community").alias("_c"))
        )
        labels, new_ids = _truncate_lineage(
            labels.join(winners, labels["node"] == F.col("_n"), "left").select(
                "node",
                F.coalesce(F.col("_c"), F.col("community")).alias("community"),
            )
        )
        _release_ckpt_blocks(sc, live_ids)
        live_ids = new_ids
    _LIVE_CKPT_IDS.append((sc, live_ids))
    return labels


def lpa_communities_sql(edges_cte: str = "edges", n_iter: int = 3) -> str:
    """DuckDB twin of :func:`lpa_communities`, unrolled as a CTE chain;
    final labels in ``lpa_l{n_iter}(node, community)``."""
    parts = [
        f"lpa_sym AS (SELECT src, dst, sum(weight)::BIGINT AS weight FROM ("
        f"SELECT src, dst, weight FROM {edges_cte} "
        f"UNION ALL SELECT dst AS src, src AS dst, weight FROM {edges_cte}"
        ") GROUP BY src, dst)",
        "lpa_nodes AS (SELECT DISTINCT src AS node FROM lpa_sym)",
        "lpa_l0 AS (SELECT node, node AS community FROM lpa_nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"lpa_w{i} AS (SELECT dst, community FROM ("
            "SELECT e.dst, l.community, "
            "row_number() OVER (PARTITION BY e.dst "
            "ORDER BY sum(e.weight) DESC, l.community) AS _rn "
            f"FROM lpa_l{i} l JOIN lpa_sym e ON l.node = e.src "
            "GROUP BY e.dst, l.community) WHERE _rn = 1)"
        )
        parts.append(
            f"lpa_l{i + 1} AS (SELECT l.node, "
            "coalesce(w.community, l.community) AS community "
            f"FROM lpa_l{i} l LEFT JOIN lpa_w{i} w ON l.node = w.dst)"
        )
    return ",\n".join(parts)


# --- HyperBall harmonic centrality ------------------------------------------
#
# Harmonic centrality hc(v) = Σ_{u≠v} 1/d(u,v) is the host-quality
# metric Common Crawl actually publishes for its crawl (the
# spam-resistant alternative to PageRank — Boldi & Vigna, "Axioms for
# Centrality", 2014). Exact all-pairs distances are O(V²) — infeasible
# on a billion-host graph — so production computes it with HyperBall
# (Boldi & Vigna, "In-Core Computation of Geometric Centralities with
# HyperBall", 2013): one HyperLogLog counter per node estimating the
# ball |B_t(v)| = #{u : d(u,v) ≤ t}; per radius step each node's
# counter unions its in-neighbors' counters (register-wise max), and
# hc(v) ≈ Σ_t (|B_t| − |B_{t−1}|)/t.
#
# Everything below is EXACT INTEGER arithmetic on both engines:
# registers come from the md5-based stable_hash32, the raw HLL
# estimator is computed in fixed point (milli-units, floor divisions),
# and the small-range linear-counting branch uses a precomputed
# 64-entry lookup ladder (the one place a logarithm appears — resolved
# to integer literals at import, so Spark and DuckDB read the same
# numbers). The oracle twin unrolls the same steps as a CTE chain.

#: HLL registers per counter (m = 2^6); std error 1.04/√64 ≈ 13%,
#: and at small ball sizes the linear-counting branch is far tighter
HLL_M = 64
#: alpha_64 from the HyperLogLog paper, as the exact rational 709/1000
_HLL_ALPHA_MILLI = 709
#: alpha·m²·1000 — the raw-estimator numerator in milli-units
_HLL_NUM_MILLI = _HLL_ALPHA_MILLI * HLL_M * HLL_M
#: rho window: stable_hash32 div 64 leaves 26 bits; rho ∈ [1, 27]
_HLL_RHO_MAX = 27
#: fixed-point exponent for Σ 2^(P−reg): P−reg ∈ [1, 28] (reg 0 = 2^28)
_HLL_P = _HLL_RHO_MAX + 1
#: linear-counting threshold: raw estimate ≤ 2.5·m (in milli-units)
_HLL_LC_THRESHOLD_MILLI = 2500 * HLL_M
#: linear counting m·ln(m/V) for V = 1..m zero registers, in
#: milli-units, floor(x·1000 + 0.5) — integer literals shared verbatim
#: by the Spark expression and the DuckDB twin
LC_TABLE_MILLI = [
    math.floor(HLL_M * math.log(HLL_M / v) * 1000 + 0.5)
    for v in range(1, HLL_M + 1)
]


def _lc_case(v_expr: str) -> str:
    """CASE ladder mapping a zero-register count to linear-counting
    milli-estimates — plain comparisons + integer literals, so the one
    string is valid (and identical) in Spark SQL and DuckDB."""
    whens = " ".join(
        f"WHEN {v} THEN {lc}" for v, lc in enumerate(LC_TABLE_MILLI, start=1)
    )
    return f"(CASE {v_expr} {whens} ELSE 0 END)"


def _rho_case(w_expr: str) -> str:
    """rho = 1 + leading zeros of the 26-bit window ``w_expr`` —
    ``length(bin(w))`` is the bit length in BOTH engines (neither pads),
    so rho = 27 − bitlength, with the all-zero window capped at 27."""
    return (
        f"(CASE WHEN {w_expr} = 0 THEN {_HLL_RHO_MAX} "
        f"ELSE {_HLL_RHO_MAX} - length(bin({w_expr})) END)"
    )


def _hll_estimate_milli(s_expr: str, v_expr: str, idiv: str = "//") -> str:
    """Ball-size estimate in milli-units from the register-sum fixed
    point ``s_expr`` (Σ 2^(P−reg) incl. 2^P per zero register) and the
    zero-register count ``v_expr``: raw estimator alpha·m²·2^P // S,
    switched to linear counting in the small range — the standard HLL
    recipe with every step in bigint. Shared Spark/DuckDB text except
    the floor-division token (``idiv``: Spark spells it ``div``,
    DuckDB ``//``; operands are non-negative, so the two agree)."""
    raw = f"({_HLL_NUM_MILLI * (1 << _HLL_P)} {idiv} ({s_expr}))"
    return (
        f"(CASE WHEN {raw} <= {_HLL_LC_THRESHOLD_MILLI} AND {v_expr} > 0 "
        f"THEN {_lc_case(v_expr)} ELSE {raw} END)"
    )


def hyperball_init(nodes: DataFrame, node_col: str = "node") -> DataFrame:
    """Initial HyperBall counters, long format: one (node, j, reg) row
    per node — its own hash's register. Absent (node, j) pairs mean
    register 0 throughout; estimates account for them via the
    zero-register count, so counters stay sparse."""
    h = stable_hash32(F.col(node_col))
    return nodes.select(
        F.col(node_col).alias("node"),
        (h % HLL_M).cast("bigint").alias("j"),
        F.expr(
            _rho_case(f"({stable_hash32_py_expr(node_col)}) div {HLL_M}")
        ).cast("bigint").alias("reg"),
    )


def stable_hash32_py_expr(col_name: str) -> str:
    """Spark-SQL text of stable_hash32(col) (seed 0) — needed where a
    shared CASE string must embed the hash inline."""
    return (
        f"cast(conv(substring(md5(cast(concat('0:', {col_name}) as binary)), "
        "1, 8), 16, 10) as bigint)"
    )


def hyperball_harmonic(edges: DataFrame, n_iter: int = 4) -> DataFrame:
    """Harmonic centrality (and reachable-set size) per node via
    HyperBall over a (src, dst, weight) edge list →
    ``(node, hc_milli, reach_milli)``.

    Per radius step: counters flow along edges (dst unions every
    in-neighbor src's registers — one equi-join + one (node, j) max
    aggregation, both keyed, both linear in |edges|·m); per step the
    ball estimate is one keyed aggregation. hc_milli sums the
    per-radius increments (clamped at 0 — the floor-division recipe is
    monotone, the clamp guards the LC→raw estimator switch) divided by
    the radius, in integer milli-units. Register and estimate frames
    are CHECKPOINTED per radius (`_truncate_lineage` — see
    :func:`pagerank_int` for the rationale and the reliable-checkpoint
    upgrade path); superseded rounds' blocks are freed immediately,
    the final/estimate blocks parked for ``release_caches``. At crawl
    scale counters are m=64 rows per host — the HyperBall paper's
    in-core trick maps to one shuffle per radius here."""
    sc = edges.sparkSession.sparkContext
    nodes = persist_tracked(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    e = edges.select("src", "dst")

    def estimate(regs: DataFrame, out_name: str) -> DataFrame:
        per_node = regs.groupBy("node").agg(
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_P} - reg)"))
            .cast("bigint")
            .alias("_s_filled"),
            F.count(F.lit(1)).cast("bigint").alias("_filled"),
        )
        s = f"(_s_filled + ({HLL_M} - _filled) * {1 << _HLL_P})"
        v = f"({HLL_M} - _filled)"
        return per_node.select(
            "node",
            F.expr(_hll_estimate_milli(s, v, idiv="div"))
            .cast("bigint")
            .alias(out_name),
        )

    regs, regs_ids = _truncate_lineage(hyperball_init(nodes))
    est0, est0_ids = _truncate_lineage(estimate(regs, "e0"))
    _LIVE_CKPT_IDS.append((sc, est0_ids))
    ests = [est0]
    for t in range(1, n_iter + 1):
        contrib = regs.join(e, regs["node"] == e["src"]).select(
            F.col("dst").alias("node"), "j", "reg"
        )
        new_regs, new_ids = _truncate_lineage(
            regs.unionByName(contrib).groupBy("node", "j").agg(
                F.max("reg").alias("reg")
            )
        )
        _release_ckpt_blocks(sc, regs_ids)
        regs, regs_ids = new_regs, new_ids
        est_t, est_ids = _truncate_lineage(estimate(regs, f"e{t}"))
        _LIVE_CKPT_IDS.append((sc, est_ids))
        ests.append(est_t)
    _LIVE_CKPT_IDS.append((sc, regs_ids))
    out = nodes
    for i, est in enumerate(ests):
        out = out.join(est, "node", "left")
        out = out.withColumn(f"e{i}", F.coalesce(F.col(f"e{i}"), F.lit(0)))
    hc = None
    for t in range(1, n_iter + 1):
        inc = F.expr(f"greatest(e{t} - e{t - 1}, 0) div {t}")
        hc = inc if hc is None else hc + inc
    return out.select(
        "node",
        hc.cast("bigint").alias("hc_milli"),
        F.col(f"e{n_iter}").cast("bigint").alias("reach_milli"),
    )


def hyperball_harmonic_sql(edges_cte: str = "edges", n_iter: int = 4) -> str:
    """DuckDB twin of :func:`hyperball_harmonic`: the same counters,
    register flow, fixed-point estimator, and harmonic sum unrolled as
    a CTE chain. Final result in ``hb_out(node, hc_milli,
    reach_milli)``."""
    h = "CAST(('0x' || substring(md5('0:' || node), 1, 8)) AS UBIGINT)::BIGINT"
    parts = [
        f"hb_nodes AS (SELECT src AS node FROM {edges_cte} "
        f"UNION SELECT dst FROM {edges_cte})",
        f"hb_r0 AS (SELECT node, ({h}) % {HLL_M} AS j, "
        f"{_rho_case(f'({h}) // {HLL_M}')}::BIGINT AS reg FROM hb_nodes)",
    ]
    s = f"(_s_filled + ({HLL_M} - _filled) * {1 << _HLL_P})"
    v = f"({HLL_M} - _filled)"

    def est_cte(i: int) -> str:
        return (
            f"hb_e{i} AS (SELECT node, "
            f"{_hll_estimate_milli(s, v)}::BIGINT AS e FROM ("
            f"SELECT node, sum(1::BIGINT << ({_HLL_P} - reg))::BIGINT "
            "AS _s_filled, count(*)::BIGINT AS _filled "
            f"FROM hb_r{i} GROUP BY node))"
        )

    parts.append(est_cte(0))
    for t in range(1, n_iter + 1):
        parts.append(
            f"hb_r{t} AS (SELECT node, j, max(reg)::BIGINT AS reg FROM ("
            f"SELECT node, j, reg FROM hb_r{t - 1} "
            "UNION ALL "
            f"SELECT e.dst AS node, r.j, r.reg FROM hb_r{t - 1} r "
            f"JOIN {edges_cte} e ON r.node = e.src) GROUP BY node, j)"
        )
        parts.append(est_cte(t))
    inc = " + ".join(
        f"(greatest(coalesce(e{t}.e, 0) - coalesce(e{t - 1}.e, 0), 0) // {t})"
        for t in range(1, n_iter + 1)
    )
    joins = " ".join(
        f"LEFT JOIN hb_e{i} e{i} ON n0.node = e{i}.node"
        for i in range(n_iter + 1)
    )
    parts.append(
        f"hb_out AS (SELECT n0.node, ({inc})::BIGINT AS hc_milli, "
        f"coalesce(e{n_iter}.e, 0)::BIGINT AS reach_milli "
        f"FROM hb_nodes n0 {joins})"
    )
    return ",\n".join(parts)
