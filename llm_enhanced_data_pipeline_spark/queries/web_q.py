"""Web-corpus hygiene queries: URL canonicalization / per-domain caps
(operators/web.py) and the C4-style token-blocklist filter.

The synthetic documents table carries no URL column, so the URL
queries synthesize deterministic messy URLs from (source, doc_id) —
five variants per page identity (case-shifted host, default port,
utm params, fragment, trailing slash, http-vs-https) — in BOTH engines
identically, the same in-query-synthesis pattern the compliance and C4
gates use. The interesting part (and what the oracle checks) is the
canonicalization algebra, not the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import rounding
from ..operators import cleaning, graph, text_analysis, web
from ..operators.cleaning import tokens_sql
from ..tables import load_table
from .graph_q import _DANGLING_FROM, _synth_links_sql
from .graph_q import _H as _GRAPH_H
from .registry import register

_TOKS = tokens_sql("text")

# C4's bad-word filter drops any document containing a blocklisted
# token (public C4 methodology; the published list is profanity — here
# a neutral stand-in over the synthetic vocabulary, configurable).
BLOCKLIST = ("dup", "slow")


def _messy_url() -> F.Column:
    """Deterministic messy URL per doc: variant m = doc_id % 5 over
    page identity doc_id div 5. Variants 0/1/2 canonicalize to the
    same URL; 3 keeps its id param; 4 is http (a distinct canonical)."""
    page = F.expr("cast(doc_id div 5 as string)")
    m = F.expr("doc_id % 5")
    lo = F.concat(F.lit("https://www."), F.col("source"), F.lit(".com/p/"), page)
    return (
        F.when(m == 0, lo)
        .when(
            m == 1,
            F.concat(
                F.lit("HTTPS://WWW."),
                F.upper("source"),
                F.lit(".COM:443/p/"),
                page,
                F.lit("/"),
            ),
        )
        .when(m == 2, F.concat(lo, F.lit("?utm_source=feed&utm_medium=rss")))
        .when(
            m == 3,
            F.concat(lo, F.lit("?id="), page, F.lit("&utm_campaign=x#frag")),
        )
        .otherwise(
            F.concat(
                F.lit("http://www."), F.col("source"), F.lit(".com:80/p/"),
                page, F.lit("#top"),
            )
        )
    )


_MESSY_URL_SQL = """
CASE doc_id % 5
  WHEN 0 THEN 'https://www.' || source || '.com/p/' || (doc_id // 5)
  WHEN 1 THEN 'HTTPS://WWW.' || upper(source) || '.COM:443/p/' || (doc_id // 5) || '/'
  WHEN 2 THEN 'https://www.' || source || '.com/p/' || (doc_id // 5) || '?utm_source=feed&utm_medium=rss'
  WHEN 3 THEN 'https://www.' || source || '.com/p/' || (doc_id // 5) || '?id=' || (doc_id // 5) || '&utm_campaign=x#frag'
  ELSE 'http://www.' || source || '.com:80/p/' || (doc_id // 5) || '#top'
END
"""


@register(
    "url_canonical_report",
    doc="URL canonicalization ahead of content dedup (Common-Crawl "
    "practice): messy variants (case, default ports, utm params, "
    "fragments, trailing slashes) collapse to canonical form; per "
    "registered domain, raw-vs-canonical distinct counts and the "
    "collapse rate. Pure string algebra — one scan, two hash aggs.",
    oracle=f"""
WITH u AS (
  SELECT doc_id, ({_MESSY_URL_SQL}) AS url FROM documents
),
c AS (
  SELECT doc_id, url, {web.canonicalize_url_sql("url")} AS curl FROM u
)
SELECT {web.registered_domain_psl_sql("curl")} AS domain,
       count(*)::BIGINT AS n_urls,
       count(DISTINCT url)::BIGINT AS n_raw_distinct,
       count(DISTINCT curl)::BIGINT AS n_canonical,
       ((1000 * (count(DISTINCT url) - count(DISTINCT curl)))
        // count(DISTINCT url))::BIGINT AS collapse_permille
FROM c GROUP BY 1
""",
)
def url_canonical_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    c = docs.select(
        "doc_id",
        _messy_url().alias("url"),
    ).withColumn("curl", web.canonicalize_url(F.col("url")))
    agg = c.groupBy(web.registered_domain_psl(F.col("curl")).alias("domain")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.countDistinct("url").cast("bigint").alias("n_raw_distinct"),
        F.countDistinct("curl").cast("bigint").alias("n_canonical"),
    )
    return agg.select(
        "domain",
        "n_urls",
        "n_raw_distinct",
        "n_canonical",
        F.expr(
            "cast(1000 * (n_raw_distinct - n_canonical)"
            " div n_raw_distinct as bigint)"
        ).alias("collapse_permille"),
    )


@register(
    "domain_cap_sample",
    doc="Per-registered-domain document cap (bound any one site's "
    "corpus share, C4/Gopher-era practice): keep the first 20 docs per "
    "domain by doc_id, report kept/total per domain. One keyed window "
    "+ one agg.",
    oracle=f"""
WITH u AS (
  SELECT doc_id, ({_MESSY_URL_SQL}) AS url FROM documents
),
d AS (
  SELECT doc_id,
         {web.registered_domain_psl_sql(web.canonicalize_url_sql("url"))} AS domain
  FROM u
),
rk AS (
  SELECT domain, doc_id,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS _rk
  FROM d
)
SELECT domain,
       count(*)::BIGINT AS n_total,
       sum(CASE WHEN _rk <= 20 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       ((1000 * sum(CASE WHEN _rk <= 20 THEN 1 ELSE 0 END)) // count(*))::BIGINT
         AS kept_permille
FROM rk GROUP BY domain
""",
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # canonicalize staged as an attribute — see corpus_build_v5's note
    d = docs.select(
        "doc_id", web.canonicalize_url(_messy_url()).alias("curl")
    ).select(
        "doc_id",
        web.registered_domain_psl(F.col("curl")).alias("domain"),
    )
    # ONE rank window + ONE aggregation (the oracle's own shape) — the
    # earlier totals-join-kepts form equi-joined on the DERIVED domain
    # column, and Catalyst pushed the join's isnotnull(domain) below
    # both projections, inlining the full PSL+canonicalize expression
    # into a Filter on each side (measured: a 744 KB plan with the
    # domain expr expanded ~134x). Never join on an expensive derived
    # key when a window + conditional aggregate gives the same frame.
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy("doc_id")
    rk = d.withColumn("_rk", F.row_number().over(w))
    return rk.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("_rk") <= 20, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.expr(
            "cast(1000 * sum(CASE WHEN _rk <= 20 THEN 1 ELSE 0 END)"
            " div count(*) as bigint)"
        ).alias("kept_permille"),
    )


@register(
    "blocklist_filter_report",
    doc="C4-style token-blocklist filter: drop any document containing "
    "a blocklisted token; per-source blocked counts and rate. One "
    "arrays_overlap projection + one keyed agg — no explode, no "
    "shuffle before the agg.",
    oracle=f"""
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN list_has_any({_TOKS}, ['dup', 'slow']) THEN 1 ELSE 0 END)::BIGINT
         AS n_blocked,
       ((1000 * sum(CASE WHEN list_has_any({_TOKS}, ['dup', 'slow']) THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS blocked_permille
FROM documents GROUP BY source
""",
)
def blocklist_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    blocked = F.arrays_overlap(
        cleaning.tokens(F.col("text")),
        F.array(*[F.lit(w) for w in BLOCKLIST]),
    )
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(blocked, 1).otherwise(0)).cast("bigint").alias("n_blocked"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_blocked",
        F.expr("cast(1000 * n_blocked div n_docs as bigint)").alias(
            "blocked_permille"
        ),
    )


@register(
    "corpus_build_v5",
    bench=True,  # the PSL-keyed production build: times the vendored
    # public-suffix when-chain (claimed zero-shuffle projection) inside
    # a real composite lineage — r7 verdict asked for the PSL path to
    # carry a bench slot with spread
    doc="Composite web-corpus build: canonical-URL dedup (recrawl "
    "variants collapse, keep lowest doc_id) -> token-blocklist gate -> "
    "exact content dedup (first surviving occurrence) -> quality-score "
    "floor (>= 0.3) -> per-registered-domain cap (20). Per-language "
    "funnel report. ONE pass in the corpus_build_v3 flag-column style: "
    "every stage is a boolean column, the dedup/cap windows rank "
    "prior-stage survivors first, one aggregation at the end — three "
    "keyed shuffles total at any scale.",
    oracle=f"""
WITH u AS (
  SELECT doc_id, lang, text, ({_MESSY_URL_SQL}) AS url FROM documents
),
c AS (
  SELECT doc_id, lang, text,
         {web.canonicalize_url_sql("url")} AS curl,
         {web.registered_domain_psl_sql(web.canonicalize_url_sql("url"))} AS domain,
         NOT list_has_any({_TOKS}, ['dup', 'slow']) AS b_ok,
         {rounding.stable_round_sql(text_analysis.text_quality_score_sql(_TOKS), 4)} AS q
  FROM u
),
f1 AS (
  SELECT *, (row_number() OVER (PARTITION BY curl ORDER BY doc_id) = 1) AS s1
  FROM c
),
f2 AS (SELECT *, (s1 AND b_ok) AS s2 FROM f1),
f3 AS (
  SELECT *, (s2 AND row_number() OVER (
               PARTITION BY md5(lower(trim(text)))
               ORDER BY s2 DESC, doc_id) = 1) AS s3
  FROM f2
),
f4 AS (SELECT *, (s3 AND q >= 0.3) AS s4 FROM f3),
f5 AS (
  SELECT *, (s4 AND row_number() OVER (
               PARTITION BY domain ORDER BY s4 DESC, doc_id) <= 20) AS s5
  FROM f4
)
SELECT lang,
       count(*)::BIGINT AS n_raw,
       sum(CASE WHEN s1 THEN 1 ELSE 0 END)::BIGINT AS n_after_url,
       sum(CASE WHEN s2 THEN 1 ELSE 0 END)::BIGINT AS n_after_blocklist,
       sum(CASE WHEN s3 THEN 1 ELSE 0 END)::BIGINT AS n_after_exact,
       sum(CASE WHEN s4 THEN 1 ELSE 0 END)::BIGINT AS n_after_quality,
       sum(CASE WHEN s5 THEN 1 ELSE 0 END)::BIGINT AS n_final,
       sum(CASE WHEN s5 THEN len({_TOKS}) ELSE 0 END)::BIGINT AS tokens_final
FROM f5 GROUP BY lang
""",
)
def corpus_build_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.rounding import stable_round
    from ..operators import dedup, text_analysis

    docs = load_table(spark, "documents", sf_dir)
    # Stage curl as an ATTRIBUTE before deriving the domain: passing the
    # canonicalize_url Column straight into registered_domain_psl would
    # inline its ~10-step regexp chain into every one of the PSL
    # lookup's span extracts (~15 copies per row — measured as a 360 KB
    # physical plan and a 9x slot slowdown before this split). Catalyst
    # keeps the two projections separate because curl is non-cheap and
    # multiply-referenced (CollapseProject's duplication guard).
    staged = docs.select(
        "doc_id", "lang", "text",
        web.canonicalize_url(_messy_url()).alias("curl"),
    )
    c = staged.select(
        "doc_id",
        "lang",
        "text",
        "curl",
        web.registered_domain_psl(F.col("curl")).alias("domain"),
        (
            ~F.arrays_overlap(
                cleaning.tokens(F.col("text")),
                F.array(*[F.lit(w) for w in BLOCKLIST]),
            )
        ).alias("b_ok"),
        stable_round(
            text_analysis.text_quality_score(F.col("text")), 4
        ).alias("q"),
        F.size(cleaning.tokens(F.col("text"))).cast("bigint").alias("n_toks"),
        dedup.content_hash(F.col("text")).alias("_fp"),
    )
    w_url = Window.partitionBy("curl").orderBy("doc_id")
    f = c.withColumn("s1", F.row_number().over(w_url) == 1)
    f = f.withColumn("s2", F.col("s1") & F.col("b_ok"))
    w_fp = Window.partitionBy("_fp").orderBy(F.col("s2").desc(), F.col("doc_id"))
    f = f.withColumn("s3", F.col("s2") & (F.row_number().over(w_fp) == 1))
    f = f.withColumn("s4", F.col("s3") & (F.col("q") >= 0.3))
    w_dom = Window.partitionBy("domain").orderBy(F.col("s4").desc(), F.col("doc_id"))
    f = f.withColumn("s5", F.col("s4") & (F.row_number().over(w_dom) <= 20))
    return f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.sum(F.col("s1").cast("int")).cast("bigint").alias("n_after_url"),
        F.sum(F.col("s2").cast("int")).cast("bigint").alias("n_after_blocklist"),
        F.sum(F.col("s3").cast("int")).cast("bigint").alias("n_after_exact"),
        F.sum(F.col("s4").cast("int")).cast("bigint").alias("n_after_quality"),
        F.sum(F.col("s5").cast("int")).cast("bigint").alias("n_final"),
        F.sum(F.when(F.col("s5"), F.col("n_toks")).otherwise(0))
        .cast("bigint")
        .alias("tokens_final"),
    )


_MESSY_HTML_SQL = """
CASE doc_id % 4
  WHEN 0 THEN '<html><head><style>p {color: red}</style></head><body><p>' || text || '</p><!-- note --></body></html>'
  WHEN 1 THEN '<div class="a">' || text || '</div><script type="text/javascript">var x = 1 < 2;</script>'
  WHEN 2 THEN '<span>' || replace(text, ' ',
    CASE doc_id % 12 WHEN 2 THEN '&nbsp;' WHEN 6 THEN '&#160;' ELSE '&#x00A0;' END
  ) || '</span>'
  ELSE '<p>' || replace(text, ' ', ' </p><p> ') || '</p>'
END
"""


def _messy_html() -> F.Column:
    t = F.col("text")
    m = F.expr("doc_id % 4")
    return (
        F.when(
            m == 0,
            F.concat(
                F.lit("<html><head><style>p {color: red}</style></head><body><p>"),
                t,
                F.lit("</p><!-- note --></body></html>"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('<div class="a">'),
                t,
                F.lit('</div><script type="text/javascript">var x = 1 < 2;</script>'),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("<span>"),
                F.expr(
                    "replace(text, ' ', CASE doc_id % 12 WHEN 2 THEN '&nbsp;'"
                    " WHEN 6 THEN '&#160;' ELSE '&#x00A0;' END)"
                ),
                F.lit("</span>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<p>"),
                F.expr("replace(text, ' ', ' </p><p> ')"),
                F.lit("</p>"),
            )
        )
    )


@register(
    "html_strip_report",
    doc="HTML text extraction (the web-corpus stage before any "
    "quality/dedup work): markup synthesized deterministically around "
    "the documents (style/script bodies, comments, tags between "
    "tokens, named/decimal/hex nbsp separators), stripped by the fixed regexp chain — "
    "and the report PROVES recovery: n_recovered counts docs whose "
    "stripped text equals the whitespace-normalized original. One "
    "projection + one keyed agg.",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source, text, ({_MESSY_HTML_SQL}) AS html FROM documents
),
s AS (
  SELECT doc_id, source, text, html,
         {cleaning.html_strip_sql("html")} AS stripped
  FROM h
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN stripped = trim(regexp_replace(text, '\\s+', ' ', 'g'))
                THEN 1 ELSE 0 END)::BIGINT AS n_recovered,
       ((1000 * (sum(length(html)) - sum(length(text))))
        // greatest(sum(length(text)), 1))::BIGINT AS markup_overhead_permille
FROM s GROUP BY source
""",
)
def html_strip_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    s = docs.select(
        "source",
        "text",
        _messy_html().alias("html"),
    ).withColumn("stripped", cleaning.html_strip(F.col("html")))
    agg = s.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(
                F.col("stripped") == cleaning.normalize_whitespace(F.col("text")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_recovered"),
        F.sum(F.length("html")).alias("_hl"),
        F.sum(F.length("text")).alias("_tl"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_recovered",
        F.expr(
            "cast(1000 * (_hl - _tl) div greatest(_tl, 1) as bigint)"
        ).alias("markup_overhead_permille"),
    )


_BOILERPLATE_PAGE_SQL = """
'<html><head><style>p {color: red}</style></head><body>'
|| '<header><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact us</a></header>'
|| '<nav><ul><li><a href="/c">Category NAVTOK' || (doc_id % 5) || ' pages</a></li>'
|| '<li><a href="/arch">Archive of older posts</a></li></ul></nav>'
|| '<article><p>' || text || '</p></article>'
|| '<aside><a href="/r1">Promoted story one</a> <a href="/r2">Promoted story two</a></aside>'
|| '<footer>(c) 2026 corp</footer>'
|| '<script>track(1 < 2);</script></body></html>'
"""


def _boilerplate_page() -> F.Column:
    return F.concat(
        F.lit("<html><head><style>p {color: red}</style></head><body>"),
        F.lit('<header><a href="/">Home</a> <a href="/about">About</a>'
              ' <a href="/contact">Contact us</a></header>'),
        F.lit('<nav><ul><li><a href="/c">Category NAVTOK'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(' pages</a></li>'
              '<li><a href="/arch">Archive of older posts</a></li></ul></nav>'),
        F.lit("<article><p>"),
        F.col("text"),
        F.lit("</p></article>"),
        F.lit('<aside><a href="/r1">Promoted story one</a>'
              ' <a href="/r2">Promoted story two</a></aside>'),
        F.lit("<footer>(c) 2026 corp</footer>"),
        F.lit("<script>track(1 < 2);</script></body></html>"),
    )


@register(
    "html_main_content",
    doc="Main-content extraction (boilerplate removal — the quality "
    "lever a crawl corpus applies right after politeness): every doc "
    "is wrapped in a full boilerplate page (header/nav/aside links, "
    "short footer, script), and the jusText-style block heuristic "
    "(block-tag split, per-block min text length + max link density, "
    "integer permille math) must recover exactly the article text "
    "while dropping every nav/footer block: n_recovered counts exact "
    "recoveries, n_nav_leaked counts pages where any nav/aside token "
    "survived (expected 0), boilerplate_drop_permille measures how "
    "much of the flat-stripped page the extractor removed.",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source, text, ({_BOILERPLATE_PAGE_SQL.strip()}) AS html FROM documents
),
s AS (
  SELECT doc_id, source, text,
         {web.extract_main_content_sql("html")} AS main,
         {cleaning.html_strip_sql("html")} AS flat
  FROM h
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN main = trim(regexp_replace(text, '\\s+', ' ', 'g'))
                THEN 1 ELSE 0 END)::BIGINT AS n_recovered,
       sum(CASE WHEN contains(main, 'NAVTOK') OR contains(main, 'Promoted')
                OR contains(main, 'Archive of older') THEN 1 ELSE 0 END
          )::BIGINT AS n_nav_leaked,
       ((1000 * (sum(length(flat)) - sum(length(main))))
        // greatest(sum(length(flat)), 1))::BIGINT AS boilerplate_drop_permille
FROM s GROUP BY source
""",
)
def html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    s = docs.select("source", "text", _boilerplate_page().alias("html")).withColumn(
        "main", web.extract_main_content(F.col("html"))
    ).withColumn("flat", cleaning.html_strip(F.col("html")))
    agg = s.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(
                F.col("main") == cleaning.normalize_whitespace(F.col("text")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_recovered"),
        F.sum(
            F.when(
                F.col("main").contains("NAVTOK")
                | F.col("main").contains("Promoted")
                | F.col("main").contains("Archive of older"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_nav_leaked"),
        F.sum(F.length("flat")).alias("_fl"),
        F.sum(F.length("main")).alias("_ml"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_recovered",
        "n_nav_leaked",
        F.expr(
            "cast(1000 * (_fl - _ml) div greatest(_fl, 1) as bigint)"
        ).alias("boilerplate_drop_permille"),
    )


@register(
    "corpus_health_dashboard",
    doc="One-scan per-source health panel: doc count, mean heuristic "
    "quality, blocklist hit rate, PII hit rate (any of the six regex "
    "families on raw text), distinct languages, and mean doc length — "
    "every signal a projection over the same row, so the whole "
    "dashboard is ONE scan + ONE keyed aggregation at any corpus "
    "size.",
    oracle=f"""
SELECT source,
       count(*)::BIGINT AS n_docs,
       {rounding.stable_round_sql(
           "avg(" + text_analysis.text_quality_score_sql(_TOKS) + ")", 4)} AS mean_quality,
       ((1000 * sum(CASE WHEN list_has_any({_TOKS}, ['dup', 'slow']) THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS blocked_permille,
       ((1000 * sum(CASE WHEN
            len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}')) > 0
         OR len(regexp_extract_all(text, '\\+?[0-9][0-9 ()-]{{7,}}[0-9]')) > 0
         OR len(regexp_extract_all(text, '[a-zA-Z]+://[^/\\s:@]+:[^/\\s:@]+@')) > 0
         OR len(regexp_extract_all(text, '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) > 0
         OR len(regexp_extract_all(text, '\\b[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}\\b')) > 0
         OR len(regexp_extract_all(text, '\\b(?:[0-9]{{4}}[ -]?){{3}}[0-9]{{4}}\\b')) > 0
         THEN 1 ELSE 0 END)) // count(*))::BIGINT AS pii_permille,
       count(DISTINCT lang)::BIGINT AS n_langs,
       round(avg(n_chars), 2) AS mean_chars
FROM documents GROUP BY source
""",
)
def corpus_health_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import compliance

    docs = load_table(spark, "documents", sf_dir)
    toks = cleaning.tokens(F.col("text"))
    blocked = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in BLOCKLIST]))
    counts = compliance.pii_counts(F.col("text"))
    any_pii = None
    for c in counts.values():
        cond = c > 0
        any_pii = cond if any_pii is None else (any_pii | cond)
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        rounding.stable_round(
            F.avg(text_analysis.text_quality_score(F.col("text"))), 4
        ).alias("mean_quality"),
        F.sum(F.when(blocked, 1).otherwise(0)).alias("_blk"),
        F.sum(F.when(any_pii, 1).otherwise(0)).alias("_pii"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.round(F.avg("n_chars"), 2).alias("mean_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "mean_quality",
        F.expr("cast(1000 * _blk div n_docs as bigint)").alias("blocked_permille"),
        F.expr("cast(1000 * _pii div n_docs as bigint)").alias("pii_permille"),
        "n_langs",
        "mean_chars",
    )


# ccTLD-mixed host fixture: every PSL rule kind is represented (normal
# 2-label, default '*', private-section, wildcard, exception, and the
# host-IS-a-public-suffix NULL case), so this gate diverges from the
# 2-label key ON PURPOSE — it is the proof the PSL path fixes the
# *.co.uk over-capping.
_CCTLD_URL_SQL = """
'https://' || (CASE doc_id % 8
  WHEN 0 THEN source || '.com'
  WHEN 1 THEN source || '.co.uk'
  WHEN 2 THEN 'www.' || source || '.org.uk'
  WHEN 3 THEN source || '.github.io'
  WHEN 4 THEN 'sub.' || source || '.kawasaki.jp'
  WHEN 5 THEN 'city.kawasaki.jp'
  WHEN 6 THEN source || '.ck'
  ELSE 'www.ck'
END) || '/p/' || (doc_id // 8)
"""


def _cctld_url() -> F.Column:
    m = F.expr("doc_id % 8")
    src = F.col("source")
    host = (
        F.when(m == 0, F.concat(src, F.lit(".com")))
        .when(m == 1, F.concat(src, F.lit(".co.uk")))
        .when(m == 2, F.concat(F.lit("www."), src, F.lit(".org.uk")))
        .when(m == 3, F.concat(src, F.lit(".github.io")))
        .when(m == 4, F.concat(F.lit("sub."), src, F.lit(".kawasaki.jp")))
        .when(m == 5, F.lit("city.kawasaki.jp"))
        .when(m == 6, F.concat(src, F.lit(".ck")))
        .otherwise(F.lit("www.ck"))
    )
    return F.concat(
        F.lit("https://"), host, F.lit("/p/"), F.expr("cast(doc_id div 8 as string)")
    )


@register(
    "domain_cap_psl",
    doc="Per-registered-domain cap keyed by the PSL lookup "
    "(functions/psl.py vendored snapshot) over a ccTLD-mixed host "
    "fixture: *.co.uk sites stay separate buckets (the 2-label key "
    "merges them — shown in the two_label_key contrast column), "
    "wildcard children (source.ck) resolve to NULL and are exempt "
    "from the cap, exceptions (www.ck, city.kawasaki.jp) are "
    "registrable. Keep 5 docs per domain by doc_id. One keyed window "
    "+ one agg; the PSL chain is a constant-folded projection.",
    oracle=f"""
WITH u AS (
  SELECT doc_id, source, ({_CCTLD_URL_SQL}) AS url FROM documents
),
d AS (
  SELECT doc_id, source, url,
         {web.registered_domain_psl_sql("url")} AS domain,
         {web.registered_domain_sql("url")} AS two_label
  FROM u
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS _rk
  FROM d
)
SELECT domain,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT url)::BIGINT AS n_urls,
       max(two_label) AS two_label_key,
       sum(CASE WHEN domain IS NULL OR _rk <= 5 THEN 1 ELSE 0 END)::BIGINT
         AS n_kept
FROM rk GROUP BY domain
""",
)
def domain_cap_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    # url staged as an attribute — see corpus_build_v5's note
    d = docs.select(
        "doc_id", "source", _cctld_url().alias("url")
    ).select(
        "doc_id",
        "source",
        "url",
        web.registered_domain_psl(F.col("url")).alias("domain"),
        web.registered_domain(F.col("url")).alias("two_label"),
    )
    w = Window.partitionBy("domain").orderBy("doc_id")
    rk = d.withColumn("_rk", F.row_number().over(w))
    return rk.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("url").cast("bigint").alias("n_urls"),
        F.max("two_label").alias("two_label_key"),
        F.sum(
            F.when(F.col("domain").isNull() | (F.col("_rk") <= 5), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_kept"),
    )


# --- crawl-to-corpus capstone: the WARC ingestion lane feeding the ---
# hygiene operators. A crawl dump (Common Crawl layout: gzip member
# per record, HTTP envelopes inside response records) flows through
# read_warc_records(parse_http=True) -> status/content-type gates ->
# html_strip -> token-count quality floor -> content fingerprint — the
# full "crawl file in, training text out" chain in ONE lazy lineage.
# The oracle rebuilds the page markup from the same formula, applies
# the identical html_strip regex chain, and re-derives every output
# column without seeing a container byte.
@register(
    "corpus_build_v6",
    bench=True,  # the ingestion lane's bench slot (r9 verdict item 3):
    # gzip-member inflate + 1->N expansion + HTTP split are Python
    # per-record work and were invisible to BENCH before r10
    doc="Crawl-to-corpus build: per-doc 2-record WARC (a 200 text/html "
    "page wrapping the document's text in real markup incl. a script "
    "block, plus a 404 page that the status gate must drop), parsed "
    "by the pure-stdlib WARC reader with HTTP-envelope split, then "
    "html_strip -> tokens -> quality floor (>= 3 tokens) -> md5 "
    "fingerprint. End-to-end: container walk, envelope split, markup "
    "removal, and hygiene gates all verified in one hash-compared "
    "lineage.",
    oracle=f"""
WITH stripped AS (
  SELECT doc_id,
         {cleaning.html_strip_sql(
             "'<html><body><h1>Doc</h1><p>' || text || "
             "'</p><script>track();</script></body></html>'"
         )} AS clean
  FROM documents WHERE doc_id % 9 = 8
)
SELECT doc_id,
       len({tokens_sql("clean")})::BIGINT AS n_toks,
       md5(clean) AS fp
FROM stripped
WHERE len({tokens_sql("clean")}) >= 3
""",
)
def corpus_build_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions import hashing
    from ..sources import warc

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 9 == 8
    ).select("doc_id", "text")

    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                page = (
                    "<html><body><h1>Doc</h1><p>" + (text or "")
                    + "</p><script>track();</script></body></html>"
                )
                ok_env = (
                    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
                )
                gone_env = (
                    "HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n"
                    "<html><body><p>gone away entirely</p></body></html>"
                )
                recs = [
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://ex.com/{d}"},
                     "content": ok_env.encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://ex.com/{d}/old"},
                     "content": gone_env.encode()},
                ]
                ids.append(d)
                payloads.append(warc.write_warc(recs, gzip_members=True))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    payloads = docs.mapInPandas(synth, synth_schema)
    recs = warc.read_warc_records(payloads, "doc_id", "payload", parse_http=True)
    return (
        recs.filter(
            (F.col("http_status") == 200)
            & (F.col("http_content_type") == "text/html")
        )
        .withColumn("clean", cleaning.html_strip(F.col("body_text")))
        .withColumn("n_toks", F.size(cleaning.tokens(F.col("clean"))).cast("bigint"))
        .filter(F.col("n_toks") >= 3)
        .select("doc_id", "n_toks", hashing.md5_hex(F.col("clean")).alias("fp"))
    )


# --- robots.txt / crawl politeness gates (operators/web.py) ----------
@register(
    "robots_rules_parse",
    doc="Robots Exclusion Protocol (RFC 9309) parse: per-doc robots.txt "
    "text synthesized from closed-form formulas — two groups ('*' and "
    "trainbot), comments, a blank-line group break, an empty Disallow "
    "that must be dropped, a Crawl-delay the grammar must skip — "
    "expanded 1->N into (user_agent, allow, pattern) rule rows; the "
    "oracle rebuilds every row independently in SQL.",
    oracle="""
SELECT doc_id, j::INT AS rule_idx,
       CASE WHEN j < 2 THEN '*' ELSE 'trainbot' END AS user_agent,
       (j IN (1, 3)) AS allow,
       CASE j WHEN 0 THEN '/private' || (doc_id % 5) || '/'
              WHEN 1 THEN '/private' || (doc_id % 5) || '/pub'
              WHEN 2 THEN '/tmp' || (doc_id % 3) || '*'
              ELSE '/data' || (doc_id % 7) || '$' END AS pattern
FROM documents CROSS JOIN (VALUES (0),(1),(2),(3)) t(j)
WHERE doc_id % 11 = 3
""",
)
def robots_rules_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 11 == 3
    ).select("doc_id")
    d = F.col("doc_id")
    text = F.concat(
        F.lit("# corpus politeness\nUser-agent: *\nDisallow: /private"),
        (d % 5).cast("string"),
        F.lit("/\nAllow: /private"),
        (d % 5).cast("string"),
        F.lit("/pub\nCrawl-delay: 5\n\nUser-agent: trainbot\nDisallow: /tmp"),
        (d % 3).cast("string"),
        F.lit("*\nDisallow:\nAllow: /data"),
        (d % 7).cast("string"),
        F.lit("$\n"),
    )
    return web.read_robots_rules(
        docs.withColumn("robots_txt", text), "doc_id", "robots_txt"
    )


@register(
    "robots_url_admission",
    doc="RFC 9309 URL admission at corpus scale: per-domain rule "
    "frames joined domain-equi against candidate URLs, LIKE-translated "
    "pattern match ('*' wildcard, '$' anchor, metachars escaped), "
    "longest-matching-pattern precedence with allow winning ties, "
    "default-allow for unmatched URLs — all declarative (window over "
    "the URL id, no Python in the match path). The oracle states the "
    "expected verdict and matched pattern for each engineered URL "
    "shape: prefix deny, longer-allow override, '$'-anchored exact "
    "deny, and the no-rule default.",
    oracle="""
SELECT (doc_id * 10 + u)::BIGINT AS url_id,
       'd' || doc_id || '.com' AS domain,
       CASE u WHEN 0 THEN '/a/x'
              WHEN 1 THEN '/a/b' || (doc_id % 3) || '/page'
              WHEN 2 THEN '/c' || (doc_id % 2)
              ELSE '/free' END AS path,
       (u IN (1, 3)) AS allowed,
       CASE u WHEN 0 THEN '/a'
              WHEN 1 THEN '/a/b' || (doc_id % 3)
              WHEN 2 THEN '/c' || (doc_id % 2) || '$' END AS matched_pattern
FROM documents CROSS JOIN (VALUES (0),(1),(2),(3)) t(u)
WHERE doc_id % 11 = 5
""",
)
def robots_url_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 11 == 5
    ).select("doc_id")
    d = F.col("doc_id")
    domain = F.concat(F.lit("d"), d.cast("string"), F.lit(".com"))
    rules = docs.select(
        domain.alias("domain"),
        F.explode(
            F.array(
                F.struct(F.lit("/a").alias("pattern"), F.lit(False).alias("allow")),
                F.struct(
                    F.concat(F.lit("/a/b"), (d % 3).cast("string")).alias("pattern"),
                    F.lit(True).alias("allow"),
                ),
                F.struct(
                    F.concat(F.lit("/c"), (d % 2).cast("string"), F.lit("$")).alias(
                        "pattern"
                    ),
                    F.lit(False).alias("allow"),
                ),
            )
        ).alias("r"),
    ).select("domain", F.col("r.pattern"), F.col("r.allow"))
    urls = docs.select(
        d.alias("doc_id"),
        domain.alias("domain"),
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("u"), F.lit("/a/x").alias("path")),
                F.struct(
                    F.lit(1).alias("u"),
                    F.concat(F.lit("/a/b"), (d % 3).cast("string"), F.lit("/page")).alias("path"),
                ),
                F.struct(
                    F.lit(2).alias("u"),
                    F.concat(F.lit("/c"), (d % 2).cast("string")).alias("path"),
                ),
                F.struct(F.lit(3).alias("u"), F.lit("/free").alias("path")),
            )
        ).alias("q"),
    ).select(
        (F.col("doc_id") * 10 + F.col("q.u")).cast("bigint").alias("url_id"),
        "domain",
        F.col("q.path"),
    )
    return web.robots_admission(urls, rules)


# --- v7: the POLITE crawl-to-corpus build — robots admission runs ----
# ahead of ingestion-side content gates, the order a real crawl
# pipeline needs (fetch verdicts must not depend on page bytes).
@register(
    "corpus_build_v7",
    bench=True,  # the crawl-frontier lane's bench slot (r10 verdict
    # item 4): politeness-gated ingestion was sweep-green but
    # invisible to BENCH — this times the WARC walk + robots grammar
    # + group-scoped admission + content gates as one lineage
    doc="Robots-aware crawl-to-corpus build (v6 + RFC 9309 politeness, "
    "one lineage): per-doc 3-record WARC for domain d{doc}.com — a "
    "/keep page wrapping the document text in real markup, a "
    "/private{doc%5} page (the '/pub' mirror for even docs, a denied "
    "'/x' variant for odd), and a 404 /keep/old page — plus a per-"
    "domain robots.txt with TWO user-agent groups ('*' disallows "
    "/keep entirely; trainbot disallows /private{doc%5} but allows "
    "the longer /pub override). The pipeline parses the containers "
    "(pure-stdlib WARC walk + HTTP envelope split, persisted once "
    "for the two consumers), parses the robots grammar, applies RFC "
    "9309 GROUP SELECTION for user_agent='trainbot' (merging the "
    "groups would deny every /keep page — the r9 ADVICE defect this "
    "composite pins), joins the declarative longest-match admission "
    "verdicts back, then runs v6's status/content-type/html-strip/"
    "token-floor gates. The oracle re-derives every surviving row "
    "(kept paths, token counts, md5 fingerprints) in closed form.",
    oracle=f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 = 2),
u AS (
  SELECT doc_id, (doc_id * 10)::BIGINT AS url_id, '/keep' AS path,
         {cleaning.html_strip_sql(
             "'<html><body><h1>Doc</h1><p>' || text || "
             "'</p><script>track();</script></body></html>'"
         )} AS clean
  FROM base
  UNION ALL
  SELECT doc_id, (doc_id * 10 + 1)::BIGINT,
         '/private' || (doc_id % 5) || '/pub',
         'mirror copy number ' || doc_id || ' here'
  FROM base WHERE doc_id % 2 = 0
)
SELECT doc_id, url_id, path,
       len({tokens_sql("clean")})::BIGINT AS n_toks,
       md5(clean) AS fp
FROM u WHERE len({tokens_sql("clean")}) >= 3
""",
)
def corpus_build_v7(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions import hashing
    from ..operators import dedup
    from ..sources import warc

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 11 == 2
    ).select("doc_id", "text")

    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                host = f"d{d}.com"
                page = (
                    "<html><body><h1>Doc</h1><p>" + (text or "")
                    + "</p><script>track();</script></body></html>"
                )
                mirror = (
                    f"<html><body><p>mirror copy number {d} here"
                    "</p></body></html>"
                )
                priv = f"/private{d % 5}" + ("/pub" if d % 2 == 0 else "/x")
                ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                recs = [
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/keep"},
                     "content": (ok + page).encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}{priv}"},
                     "content": (ok + mirror).encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/keep/old"},
                     "content": ("HTTP/1.1 404 NF\r\nContent-Type: text/html"
                                 "\r\n\r\n<p>gone</p>").encode()},
                ]
                ids.append(d)
                payloads.append(warc.write_warc(recs, gzip_members=True))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    payloads = docs.mapInPandas(synth, synth_schema)
    recs = warc.read_warc_records(payloads, "doc_id", "payload", parse_http=True)
    # tracked persist: the parsed-record frame feeds BOTH the admission
    # join and the content gates — parse each container once, not per
    # consumer (the production posture for any 1->N ingestion fan-out)
    pages = dedup.persist_tracked(
        recs.select(
            (F.col("doc_id") * 10 + F.col("rec_idx")).cast("bigint").alias(
                "url_id"
            ),
            "doc_id",
            F.regexp_extract("target_uri", r"^[a-z]+://([^/]+)", 1).alias(
                "domain"
            ),
            F.regexp_extract("target_uri", r"^[a-z]+://[^/]+(/.*)$", 1).alias(
                "path"
            ),
            "http_status",
            "http_content_type",
            "body_text",
        )
    )
    d = F.col("doc_id")
    robots_txt = docs.select(
        "doc_id",
        F.concat(
            F.lit("# politeness\nUser-agent: *\nDisallow: /keep\n\n"
                  "User-agent: trainbot\nDisallow: /private"),
            (d % 5).cast("string"),
            F.lit("\nAllow: /private"),
            (d % 5).cast("string"),
            F.lit("/pub\nCrawl-delay: 2\n"),
        ).alias("robots_txt"),
    )
    rules = web.read_robots_rules(
        robots_txt, "doc_id", "robots_txt"
    ).withColumn(
        "domain", F.concat(F.lit("d"), d.cast("string"), F.lit(".com"))
    )
    verdicts = web.robots_admission(
        pages.select("url_id", "domain", "path"),
        rules.select("domain", "user_agent", "pattern", "allow"),
        user_agent="trainbot",
    )
    return (
        pages.join(verdicts.filter(F.col("allowed")).select("url_id"), "url_id")
        .filter(
            (F.col("http_status") == 200)
            & (F.col("http_content_type") == "text/html")
        )
        .withColumn("clean", cleaning.html_strip(F.col("body_text")))
        .withColumn(
            "n_toks", F.size(cleaning.tokens(F.col("clean"))).cast("bigint")
        )
        .filter(F.col("n_toks") >= 3)
        .select(
            "doc_id", "url_id", "path", "n_toks",
            hashing.md5_hex(F.col("clean")).alias("fp"),
        )
    )


# --- v8: main-content extraction in the crawl-to-corpus build --------
# The page gate that makes cross-site dedup work: the same article
# syndicated under two different site layouts (different nav/footer
# boilerplate) must produce the SAME content fingerprint. A flat
# html_strip keeps the boilerplate text, so the two copies hash apart
# and the duplicate survives; extract_main_content drops the link-
# dense blocks and the copies collide.
@register(
    "corpus_build_v8",
    doc="Crawl-to-corpus build with jusText-style main-content "
    "extraction (one lineage): per-doc 3-record WARC — the article "
    "under site layout A (header/nav/footer link boilerplate), the "
    "SAME article syndicated under layout B (different nav labels, "
    "aside instead of footer), and an all-boilerplate ad page. "
    "Container walk + HTTP split (persisted once), status/content-"
    "type gates, extract_main_content (block split, min text length, "
    "max link density — integer permille), token floor, md5 "
    "fingerprint over the MAIN text, then exact content dedup (keep "
    "lowest url_id per fingerprint) with the per-fingerprint page "
    "count carried out. The two layouts must collide (n_dup_pages = "
    "2) and the ad page must extract to empty and fall to the token "
    "floor; the oracle re-derives the survivor rows in closed form — "
    "main content == the normalized document text, untouched by "
    "either layout\'s boilerplate.",
    oracle=f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 = 3),
n AS (
  SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS main
  FROM base
)
SELECT doc_id, (doc_id * 10)::BIGINT AS url_id, '/art' AS path,
       len({tokens_sql("main")})::BIGINT AS n_toks,
       md5(main) AS fp,
       2::BIGINT AS n_dup_pages
FROM n
""",
)
def corpus_build_v8(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql import Window

    from ..functions import hashing
    from ..operators import dedup
    from ..sources import warc

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 11 == 3
    ).select("doc_id", "text")

    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches):
        ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                host = f"d{d}.com"
                art = (
                    '<html><body><header><a href="/">Home</a> '
                    '<a href="/about">About this site</a></header>'
                    '<nav><ul><li><a href="/c1">First category listing</a>'
                    '</li><li><a href="/c2">Second category listing</a>'
                    "</li></ul></nav><article><p>" + (text or "")
                    + '</p></article><footer><a href="/p">Privacy policy'
                    ' page</a> | <a href="/t">Terms of service page</a>'
                    "</footer><script>track();</script></body></html>"
                )
                syndicated = (
                    '<html><body><nav><a href="/x1">Totally different'
                    ' navigation</a> <a href="/x2">Another menu item'
                    ' entirely</a></nav><article><p>' + (text or "")
                    + '</p></article><aside><a href="/r">Recommended'
                    " for you stories</a></aside></body></html>"
                )
                ad = (
                    '<html><body><nav><a href="/b1">Sponsored link one'
                    ' here</a> <a href="/b2">Sponsored link two here</a>'
                    "</nav></body></html>"
                )
                recs = [
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/art"},
                     "content": (ok + art).encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/synd"},
                     "content": (ok + syndicated).encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/ad"},
                     "content": (ok + ad).encode()},
                ]
                ids.append(d)
                payloads.append(warc.write_warc(recs, gzip_members=True))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    payloads = docs.mapInPandas(synth, synth_schema)
    recs = warc.read_warc_records(payloads, "doc_id", "payload", parse_http=True)
    pages = dedup.persist_tracked(
        recs.select(
            (F.col("doc_id") * 10 + F.col("rec_idx")).cast("bigint").alias(
                "url_id"
            ),
            "doc_id",
            F.regexp_extract("target_uri", r"^[a-z]+://[^/]+(/.*)$", 1).alias(
                "path"
            ),
            "http_status",
            "http_content_type",
            "body_text",
        )
    )
    gated = (
        pages.filter(
            (F.col("http_status") == 200)
            & (F.col("http_content_type") == "text/html")
        )
        .withColumn("main", web.extract_main_content(F.col("body_text")))
        .withColumn(
            "n_toks", F.size(cleaning.tokens(F.col("main"))).cast("bigint")
        )
        .filter(F.col("n_toks") >= 3)
        .select(
            "doc_id", "url_id", "path", "n_toks",
            hashing.md5_hex(F.col("main")).alias("fp"),
        )
    )
    w_fp = Window.partitionBy("fp")
    return (
        gated.withColumn(
            "n_dup_pages", F.count(F.lit(1)).over(w_fp).cast("bigint")
        )
        .withColumn(
            "_rk", F.row_number().over(w_fp.orderBy("url_id"))
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


# --- v9: the full-pipeline capstone, ONE lineage ---------------------
# Every lane the engine grew separately — WARC ingest, main-content
# extraction, hygiene gates, link-graph admission, text dedup, media
# (decode-invariant) dedup, per-host budget — run as a single plan,
# the shape a real 100 TB crawl build takes. The link graph is NOT a
# side fixture here: edges are extracted from the synthesized pages'
# actual HTML anchors, PageRank runs on them, and centrality gates
# which hosts' pages enter the corpus.
@register(
    "corpus_build_v9",
    bench=True,  # the capstone bench slot (r11 verdict item 2)
    doc="Full crawl-to-corpus build in one lineage: per-doc 6-record "
    "WARC on host h{doc%23}.example — the article under layout A "
    "(whose NAV carries the 23-host affine graph links: 3s+1, 7s+2, "
    "plus 5s+p for every third page; dangling hosts 21/22 emit "
    "none), the SAME article syndicated under layout B, an all-"
    "boilerplate ad page, a 404, and TWO PPM encodings of the same "
    "image (pixels a closed-form function of doc_id%37; encoding B "
    "adds a header comment + padded whitespace). Pipeline: WARC walk "
    "+ HTTP split (persisted once for three consumers) -> hygiene "
    "(status/content-type) -> links extracted from the REAL page "
    "HTML (boilerplate self-links wash out as self-loops) -> host "
    "graph -> 5 exact integer PageRank iterations -> admission "
    "(rank >= uniform share) -> per lane: main-content extraction + "
    "token floor + exact text dedup (layouts A/B collide; lowest "
    "url_id wins; admitted-page count carried), and REAL parse_ppm "
    "decode + canonical-pixel fingerprint dedup (the two encodings "
    "AND every doc sharing doc_id%37 collide — dedup is decode-"
    "invariant, not byte-exact) -> per-host page budget (15, text "
    "rows) -> union. The oracle re-derives everything in closed "
    "form: the same affine edge list through host_graph_sql, the "
    "same unrolled PageRank CTEs, main == normalized doc text, "
    "pixels from doc_id arithmetic.",
    oracle=f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 = 5),
lk AS ({_synth_links_sql(" AND doc_id % 11 = 5")}),
edges AS ({graph.host_graph_sql("lk", "src_url", "dst_url")}),
{graph.pagerank_sql("edges", n_iter=5)},
adm AS MATERIALIZED (
  SELECT node AS host, rank_u FROM pr_r5
  WHERE rank_u >= {graph.RANK_SCALE // _GRAPH_H}
),
n AS (
  SELECT doc_id, 'h' || (doc_id % {_GRAPH_H}) || '.example' AS host,
         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS main
  FROM base
),
tdocs AS (
  SELECT n.doc_id, n.host, n.main, a.rank_u
  FROM n JOIN adm a ON n.host = a.host
  WHERE len({tokens_sql("main")}) >= 3
),
tgrp AS (
  SELECT doc_id, host, main, rank_u,
         (2 * count(*) OVER (PARTITION BY md5(main)))::BIGINT AS n_dup_pages,
         row_number() OVER (PARTITION BY md5(main) ORDER BY doc_id) AS _rk
  FROM tdocs
),
tbudget AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY doc_id) AS _hb
  FROM tgrp WHERE _rk = 1
),
txt AS (
  SELECT 'text' AS kind, doc_id, (doc_id * 10)::BIGINT AS url_id, host,
         '/art' AS path, len({tokens_sql("main")})::BIGINT AS n_toks,
         md5(main) AS fp, n_dup_pages, rank_u
  FROM tbudget WHERE _hb <= 15
),
idocs AS (
  SELECT n.doc_id, n.host, a.rank_u,
         md5('2x2:' || (32 + ((doc_id % 37) * 1) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 2) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 3) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 4) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 5) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 6) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 7) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 8) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 9) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 10) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 11) % 95)::VARCHAR || '-' || (32 + ((doc_id % 37) * 12) % 95)::VARCHAR) AS fp
  FROM n JOIN adm a ON n.host = a.host
),
igrp AS (
  SELECT doc_id, host, rank_u, fp,
         (2 * count(*) OVER (PARTITION BY fp))::BIGINT AS n_dup_pages,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS _rk
  FROM idocs
),
img AS (
  SELECT 'image' AS kind, doc_id, (doc_id * 10 + 4)::BIGINT AS url_id,
         host, '/img' AS path, 0::BIGINT AS n_toks, fp, n_dup_pages, rank_u
  FROM igrp WHERE _rk = 1
)
SELECT * FROM txt UNION ALL SELECT * FROM img
""",
)
def corpus_build_v9(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from ..functions import hashing
    from ..operators import dedup, graph, multimodal
    from ..sources import warc

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 11 == 5
    ).select("doc_id", "text")

    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches):
        ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        ok_img = (
            "HTTP/1.1 200 OK\r\nContent-Type: image/x-portable-pixmap"
            "\r\n\r\n"
        ).encode()
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                s = d % _GRAPH_H
                host = f"h{s}.example"
                # the affine graph links live in layout A's nav — a
                # link-dense block, so main-content extraction drops
                # them while extract_links still sees them
                graph_links = ""
                if s < _DANGLING_FROM:
                    dsts = [(s * 3 + 1) % _GRAPH_H, (s * 7 + 2) % _GRAPH_H]
                    if d % 3 == 0:
                        dsts.append((s * 5 + d // _GRAPH_H) % _GRAPH_H)
                    graph_links = " ".join(
                        f'<a href="https://h{t}.example/p/x">Category '
                        f"listing {i}</a>"
                        for i, t in enumerate(dsts)
                    )
                art = (
                    '<html><body><header><a href="/">Home</a> '
                    '<a href="/about">About this site</a></header>'
                    "<nav>" + graph_links
                    + '<ul><li><a href="/c1">First category listing</a>'
                    '</li><li><a href="/c2">Second category listing</a>'
                    "</li></ul></nav><article><p>" + (text or "")
                    + '</p></article><footer><a href="/p">Privacy policy'
                    ' page</a> | <a href="/t">Terms of service page</a>'
                    "</footer><script>track();</script></body></html>"
                )
                syndicated = (
                    '<html><body><nav><a href="/x1">Totally different'
                    ' navigation</a> <a href="/x2">Another menu item'
                    ' entirely</a></nav><article><p>' + (text or "")
                    + '</p></article><aside><a href="/r">Recommended'
                    " for you stories</a></aside></body></html>"
                )
                ad = (
                    '<html><body><nav><a href="/b1">Sponsored link one'
                    ' here</a> <a href="/b2">Sponsored link two here</a>'
                    "</nav></body></html>"
                )
                # one 2x2 RGB image, pixels a closed-form fn of the
                # doc, bytes kept in the ASCII range so the WARC
                # reader's utf-8 body decode roundtrips losslessly
                k = d % 37
                raster = bytes(32 + (k * j) % 95 for j in range(1, 13))
                enc_a = b"P6\n2 2\n255\n" + raster
                enc_b = b"P6\n# syndicated encoder\n 2  2\n255\n" + raster
                recs = [
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/art"},
                     "content": (ok + art).encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/synd"},
                     "content": (ok + syndicated).encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/ad"},
                     "content": (ok + ad).encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/old"},
                     "content": ("HTTP/1.1 404 NF\r\nContent-Type: "
                                 "text/html\r\n\r\n<p>gone</p>").encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/img"},
                     "content": ok_img + enc_a},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://{host}/img2"},
                     "content": ok_img + enc_b},
                ]
                ids.append(d)
                payloads.append(warc.write_warc(recs, gzip_members=True))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    payloads = docs.mapInPandas(synth, synth_schema)
    recs = warc.read_warc_records(payloads, "doc_id", "payload", parse_http=True)
    # tracked persist: the parsed-record frame feeds THREE consumers
    # (link extraction, the text lane, the image lane) — parse each
    # container once
    pages = dedup.persist_tracked(
        recs.select(
            (F.col("doc_id") * 10 + F.col("rec_idx")).cast("bigint").alias(
                "url_id"
            ),
            "doc_id",
            F.regexp_extract("target_uri", r"^[a-z]+://([^/]+)", 1).alias(
                "host"
            ),
            F.regexp_extract("target_uri", r"^[a-z]+://[^/]+(/.*)$", 1).alias(
                "path"
            ),
            "http_status",
            "http_content_type",
            "body_text",
        )
    )
    html = pages.filter(
        (F.col("http_status") == 200)
        & (F.col("http_content_type") == "text/html")
    )
    # link graph from the ACTUAL page HTML: boilerplate links are
    # same-host (self-loops, dropped by host_graph); only layout A's
    # cross-host nav anchors survive into the edge list
    links = graph.extract_links(
        html.withColumn(
            "base", F.concat(F.lit("http://"), F.col("host"), F.col("path"))
        ),
        "base",  # id_col: carry the page URL through as the src side
        "body_text",
        "base",
    )
    edges = dedup.persist_tracked(graph.host_graph(links, "base", "url"))
    ranks = graph.pagerank_int(edges, n_iter=5)
    # Explicit broadcast (guide §3.1): ranks is a checkpointed RDD with
    # no size statistics, so the un-hinted planner broadcast the OTHER
    # side of each admission join — the per-page lanes, i.e. the corpus
    # — which is backwards at any scale. The admission frame is
    # hosts-bounded (the same class the engine already broadcasts for
    # LM vocab tables and IVF centroids); hint it explicitly.
    adm = F.broadcast(
        ranks.filter(
            F.col("rank_u") >= graph.RANK_SCALE // _GRAPH_H
        ).select(F.col("node").alias("_ah"), "rank_u")
    )

    # text lane: main content -> token floor -> admission -> exact
    # dedup (A/B layouts collide; lowest url_id wins; admitted-page
    # count carried) -> per-host budget
    tdocs = (
        html.filter(F.col("path").isin("/art", "/synd"))
        .withColumn("main", web.extract_main_content(F.col("body_text")))
        .withColumn(
            "n_toks", F.size(cleaning.tokens(F.col("main"))).cast("bigint")
        )
        .filter(F.col("n_toks") >= 3)
        .join(adm, F.col("host") == F.col("_ah"))
        .withColumn("fp", hashing.md5_hex(F.col("main")))
    )
    w_fp = Window.partitionBy("fp")
    w_host = Window.partitionBy("host").orderBy("url_id")
    txt = (
        tdocs.withColumn(
            "n_dup_pages", F.count(F.lit(1)).over(w_fp).cast("bigint")
        )
        .withColumn("_rk", F.row_number().over(w_fp.orderBy("url_id")))
        .filter(F.col("_rk") == 1)
        .withColumn("_hb", F.row_number().over(w_host))
        .filter(F.col("_hb") <= 15)
        .select(
            F.lit("text").alias("kind"), "doc_id", "url_id", "host",
            "path", "n_toks", "fp", "n_dup_pages", "rank_u",
        )
    )

    # image lane: REAL PPM decode (Arrow batches) -> canonical pixel
    # fingerprint (decode-invariant: both encodings and every doc
    # sharing doc_id%37 collide) -> admission -> dedup
    decode_schema = T.StructType(
        [
            T.StructField("url_id", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("host", T.StringType()),
            T.StructField("canon", T.StringType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            uids, dids, hosts, canons = [], [], [], []
            for uid, did, hst, body in zip(
                pdf["url_id"], pdf["doc_id"], pdf["host"], pdf["body_text"]
            ):
                try:
                    w, h, _c, arr = multimodal.parse_ppm(
                        body.encode("utf-8") if body is not None else None
                    )
                except ValueError:
                    continue  # corrupt-crawl posture: drop the record
                uids.append(int(uid))
                dids.append(int(did))
                hosts.append(hst)
                canons.append(
                    f"{w}x{h}:"
                    + "-".join(str(int(v)) for v in arr.reshape(-1))
                )
            yield pd.DataFrame(
                {"url_id": uids, "doc_id": dids, "host": hosts,
                 "canon": canons}
            )

    idocs = (
        pages.filter(
            (F.col("http_status") == 200)
            & (F.col("http_content_type") == "image/x-portable-pixmap")
        )
        .select("url_id", "doc_id", "host", "body_text")
        .mapInPandas(decode, decode_schema)
        .join(adm, F.col("host") == F.col("_ah"))
        .withColumn("fp", hashing.md5_hex(F.col("canon")))
    )
    w_ifp = Window.partitionBy("fp")
    img = (
        idocs.withColumn(
            "n_dup_pages", F.count(F.lit(1)).over(w_ifp).cast("bigint")
        )
        .withColumn("_rk", F.row_number().over(w_ifp.orderBy("url_id")))
        .filter(F.col("_rk") == 1)
        .select(
            F.lit("image").alias("kind"), "doc_id", "url_id", "host",
            F.lit("/img").alias("path"), F.lit(0).cast("bigint").alias(
                "n_toks"
            ), "fp", "n_dup_pages", "rank_u",
        )
    )
    return txt.unionByName(img)


# --- crawl frontier: sitemap harvest + politeness scheduling ---------
@register(
    "sitemap_url_extraction",
    doc="Declarative sitemap-protocol URL harvest (the crawl-frontier "
    "feed robots.txt Sitemap: lines point at): per-doc XML with a "
    "urlset (one loc carrying an XML entity that must unescape, one "
    "with a lastmod) plus a sitemapindex entry, extracted with ZERO "
    "Python — regexp_extract_all block split + posexplode + per-block "
    "regexp_extract — and compared against the closed-form expected "
    "rows.",
    oracle="""
SELECT doc_id,
       CASE WHEN e < 2 THEN 'url' ELSE 'sitemap' END AS kind,
       (CASE WHEN e < 2 THEN e ELSE 0 END)::INT AS entry_idx,
       CASE e WHEN 0 THEN 'https://s' || (doc_id % 7) || '.com/p?a=1&b=' || (doc_id % 9)
              WHEN 1 THEN 'https://s' || (doc_id % 7) || '.com/q/' || doc_id
              ELSE 'https://s' || (doc_id % 7) || '.com/sitemap' || (doc_id % 3) || '.xml'
       END AS loc,
       CASE WHEN e = 1 THEN '2024-0' || ((doc_id % 9) + 1) || '-01' END AS lastmod
FROM documents CROSS JOIN (VALUES (0),(1),(2)) t(e)
WHERE doc_id % 11 = 4
""",
)
def sitemap_url_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 11 == 4
    ).select("doc_id")
    d = F.col("doc_id")
    host = F.concat(F.lit("https://s"), (d % 7).cast("string"), F.lit(".com"))
    xml = F.concat(
        F.lit('<?xml version="1.0"?>\n<urlset>\n  <url>\n    <loc> '),
        host, F.lit("/p?a=1&amp;b="), (d % 9).cast("string"),
        F.lit(" </loc>\n  </url>\n  <url>\n    <loc>"),
        host, F.lit("/q/"), d.cast("string"),
        F.lit("</loc>\n    <lastmod>2024-0"),
        ((d % 9) + 1).cast("string"),
        F.lit("-01</lastmod>\n  </url>\n</urlset>\n<sitemapindex>\n"
              "  <sitemap><loc>"),
        host, F.lit("/sitemap"), (d % 3).cast("string"),
        F.lit(".xml</loc></sitemap>\n</sitemapindex>"),
    )
    return web.sitemap_urls(
        docs.withColumn("xml", xml), "doc_id", "xml"
    )


@register(
    "crawl_fetch_schedule",
    doc="Per-domain politeness scheduling: Crawl-delay parsed out of "
    "robots.txt (group-scoped like Allow/Disallow; odd docs carry a "
    "trainbot delay of (doc%4)+1s, even docs none), UA group selected "
    "for trainbot, then every domain's URLs are assigned fetch "
    "offsets (k-1)*delay by one keyed window (default 1s where the "
    "file sets no delay) — the declarative frontier scheduler that "
    "keeps a billion-URL crawl under each site's requested rate.",
    oracle="""
SELECT (doc_id * 10 + u)::BIGINT AS url_id,
       'd' || doc_id || '.com' AS domain,
       (u * CASE WHEN doc_id % 2 = 1 THEN (doc_id % 4) + 1 ELSE 1 END)::DOUBLE
         AS fetch_offset_s
FROM documents CROSS JOIN (VALUES (0),(1),(2)) t(u)
WHERE doc_id % 11 = 6
""",
)
def crawl_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 11 == 6
    ).select("doc_id")
    d = F.col("doc_id")
    domain = F.concat(F.lit("d"), d.cast("string"), F.lit(".com"))
    robots_txt = F.when(
        d % 2 == 1,
        F.concat(
            F.lit("User-agent: trainbot\nCrawl-delay: "),
            ((d % 4) + 1).cast("string"),
            F.lit("\nDisallow: /x\n"),
        ),
    ).otherwise(F.lit("User-agent: trainbot\nDisallow: /x\n"))
    meta = docs.withColumn("robots_txt", robots_txt)
    domain_of = F.concat(
        F.lit("d"), F.col("doc_id").cast("string"), F.lit(".com")
    )
    # strict RFC 9309 scoping: the group is chosen over the full
    # rules ∪ delays universe, so the even docs' delay-less trainbot
    # group falls back to the scheduler default rather than to any
    # '*' delay (r10 ADVICE)
    delays = web.select_ua_delays(
        web.read_robots_rules(meta, "doc_id", "robots_txt").withColumn(
            "domain", domain_of
        ),
        web.read_robots_delays(meta, "doc_id", "robots_txt").withColumn(
            "domain", domain_of
        ),
        "trainbot",
    )
    urls = docs.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("u"),
        domain.alias("domain"),
        d.alias("doc_id"),
    ).select(
        (F.col("doc_id") * 10 + F.col("u")).cast("bigint").alias("url_id"),
        "domain",
    )
    return web.schedule_fetches(urls, delays).select(
        "url_id", "domain", "fetch_offset_s"
    )


@register(
    "crawl_frontier_build",
    doc="Frontier capstone, one lineage: per-domain sitemap XML "
    "harvested declaratively (one loc case-shifted + fragmented, one "
    "robots-denied /private path, one with utm params + trailing "
    "slash that must collapse under canonicalization), URL "
    "canonicalize -> domain/path split -> RFC 9309 admission with "
    "trainbot group selection (the '*' group disallows /keep — "
    "merging would empty the frontier) -> per-domain Crawl-delay "
    "fetch schedule ((k-1)*delay over the admitted URLs). The oracle "
    "states the full expected frontier (ids, canonical paths, "
    "offsets) in closed form.",
    oracle="""
SELECT (doc_id * 10 + e)::BIGINT AS url_id,
       'd' || doc_id || '.com' AS domain,
       CASE e WHEN 0 THEN '/keep/' || doc_id ELSE '/keep/dup' END AS path,
       (CASE e WHEN 0 THEN 0 ELSE (doc_id % 3) + 1 END)::DOUBLE
         AS fetch_offset_s
FROM documents CROSS JOIN (VALUES (0),(2)) t(e)
WHERE doc_id % 9 = 2
""",
)
def crawl_frontier_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 9 == 2
    ).select("doc_id")
    d = F.col("doc_id")
    ds = d.cast("string")
    xml = F.concat(
        F.lit("<urlset><url><loc>http://D"), ds, F.lit(".COM/keep/"), ds,
        F.lit("#sec</loc></url><url><loc>http://d"), ds,
        F.lit(".com/private"), (d % 5).cast("string"),
        F.lit("/a</loc></url><url><loc>http://d"), ds,
        F.lit(".com/keep/dup/?utm_source=feed</loc></url></urlset>"),
    )
    urls = web.sitemap_urls(
        docs.withColumn("xml", xml), "doc_id", "xml"
    ).filter(F.col("kind") == "url").select(
        (F.col("doc_id") * 10 + F.col("entry_idx")).cast("bigint").alias(
            "url_id"
        ),
        web.canonicalize_url(F.col("loc")).alias("curl"),
    ).select(
        "url_id",
        F.regexp_extract("curl", r"://([^/?#]+)", 1).alias("domain"),
        F.regexp_extract("curl", r"://[^/?#]+(/[^?#]*)", 1).alias("path"),
    )
    robots_txt = F.concat(
        F.lit("User-agent: *\nDisallow: /keep\n\n"
              "User-agent: trainbot\nDisallow: /private"),
        (d % 5).cast("string"),
        F.lit("\nCrawl-delay: "),
        ((d % 3) + 1).cast("string"),
        F.lit("\n"),
    )
    meta = docs.withColumn("robots_txt", robots_txt)
    domain_of = F.concat(
        F.lit("d"), F.col("doc_id").cast("string"), F.lit(".com")
    )
    rules = web.read_robots_rules(meta, "doc_id", "robots_txt").withColumn(
        "domain", domain_of
    )
    delays = web.select_ua_delays(
        rules,
        web.read_robots_delays(meta, "doc_id", "robots_txt").withColumn(
            "domain", domain_of
        ),
        "trainbot",
    )
    admitted = web.robots_admission(
        urls, rules.select("domain", "user_agent", "pattern", "allow"),
        user_agent="trainbot",
    ).filter(F.col("allowed")).select("url_id")
    frontier = urls.join(admitted, "url_id")
    return web.schedule_fetches(frontier, delays).select(
        "url_id", "domain", "path", "fetch_offset_s"
    )


@register(
    "streaming_warc_ingest",
    doc="Streaming twin of corpus_build_v6 with a FULL hash-compared "
    "oracle (the composition is deterministic, so unlike the model-"
    "backed streaming gates it needs no rows-only weakening): binary "
    "WARC payload files drain through foreachBatch (availableNow, 2 "
    "files per micro-batch so the run really crosses micro-batch "
    "boundaries) — per batch: container walk + HTTP envelope split, "
    "status/content-type gates, html-strip, token floor, then an "
    "exactly-once append keyed on md5(doc ':' clean_text) so "
    "re-delivered files re-skip. The store's final content must equal "
    "the one-shot batch build row for row.",
    oracle=f"""
WITH stripped AS (
  SELECT doc_id,
         {cleaning.html_strip_sql(
             "'<html><body><h1>Doc</h1><p>' || text || "
             "'</p><script>track();</script></body></html>'"
         )} AS clean
  FROM documents WHERE doc_id % 9 = 6
)
SELECT doc_id,
       len({tokens_sql("clean")})::BIGINT AS n_toks,
       md5(clean) AS fp
FROM stripped
WHERE len({tokens_sql("clean")}) >= 3
""",
)
def streaming_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import types as T

    from ..sources import warc
    from ..streaming.ingest import warc_corpus_store, warc_corpus_stream

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 9 == 6
    ).select("doc_id", "text")

    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                page = (
                    "<html><body><h1>Doc</h1><p>" + (text or "")
                    + "</p><script>track();</script></body></html>"
                )
                ok_env = (
                    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
                )
                gone_env = (
                    "HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n"
                    "<html><body><p>gone away entirely</p></body></html>"
                )
                recs = [
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://ex.com/{d}"},
                     "content": ok_env.encode()},
                    {"headers": {"WARC-Type": "response",
                                 "WARC-Target-URI": f"http://ex.com/{d}/old"},
                     "content": gone_env.encode()},
                ]
                ids.append(d)
                payloads.append(warc.write_warc(recs, gzip_members=True))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    payloads = docs.mapInPandas(synth, synth_schema)
    # per-invocation scratch (input parquet, store, stream checkpoint):
    # materialize the result OUT of it, then remove — see
    # streaming_embed_on_ingest for the leak rationale
    base = tempfile.mkdtemp(prefix="warc_ingest_")
    try:
        payloads.coalesce(4).write.mode("overwrite").parquet(f"{base}/in")
        store = warc_corpus_store(spark, f"{base}/store")
        warc_corpus_stream(
            spark,
            f"{base}/in",
            store,
            stream_checkpoint_dir=f"{base}/ckpt",
            max_files_per_trigger=2,
        )
        out = store.load().select("doc_id", "n_toks", "fp")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming recrawl gate: the full production cadence through the REAL
# plumbing — WARC-encoded pages drain through the availableNow stream
# into the keyed link-fact store (streaming/recrawl.py), crawl 1 is
# ranked cold, crawl 2's delta re-ranks WARM from the persisted prior —
# while the oracle re-derives the same two PageRank chains closed-form
# (the link structure is pure doc_id arithmetic, so DuckDB never needs
# to parse a WARC byte). Every step downstream of the stream is the
# exact integer recipe, so the gate hash-compares bit-for-bit.

_RC_LINKS_SQL = """
  SELECT 'h' || (doc_id % 7) || '.test' AS src,
         'h' || ((doc_id * 3 + 1) % 7) || '.test' AS dst
  FROM {pages}
  UNION ALL
  SELECT 'h' || (doc_id % 7) || '.test',
         'h' || ((doc_id * 5 + 2) % 7) || '.test'
  FROM {pages} WHERE doc_id % 2 = 0
"""


def _rc_edges_sql(pages: str) -> str:
    links = _RC_LINKS_SQL.format(pages=pages)
    return (
        f"SELECT src, dst, count(*)::BIGINT AS weight FROM ({links}) "
        f"WHERE src <> dst GROUP BY 1, 2"
    )


@register(
    "streaming_recrawl_warm_ranks",
    doc="Streaming recrawl cadence end-to-end: crawl-1 WARC archives "
    "drain through link extraction into the md5-keyed link-fact store "
    "(exactly-once), rank cold (3 iterations); crawl-2 archives drain "
    "through the SAME stream checkpoint and the delta re-ranks WARM "
    "from the persisted prior fixed point (pagerank_int init_ranks). "
    "The synthetic link structure is closed-form in doc_id (page on "
    "host h(d%7) links h((3d+1)%7), even docs also h((5d+2)%7); "
    "d%7==3 yields a dropped self-loop), so the oracle re-derives the "
    "edge lists arithmetically and runs the identical cold-then-warm "
    "integer chains via init_cte — no WARC parsing in DuckDB, "
    "bit-for-bit ranks out of a Structured Streaming composition.",
    oracle=f"""
WITH rc1 AS (SELECT doc_id FROM documents WHERE doc_id % 3 < 2),
rc_all AS (SELECT doc_id FROM documents),
rc_e1 AS ({_rc_edges_sql("rc1")}),
rc_ea AS ({_rc_edges_sql("rc_all")}),
{graph.pagerank_sql("rc_e1", n_iter=3, prefix="pa_")},
{graph.pagerank_sql("rc_ea", n_iter=3, prefix="pb_", init_cte="pa_r3")}
SELECT node, rank_u FROM pb_r3
""",
)
def streaming_recrawl_warm_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import types as T

    from ..sources import warc
    from ..streaming import recrawl as rc

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                hrefs = [f"http://h{(d * 3 + 1) % 7}.test/x{d}"]
                if d % 2 == 0:
                    hrefs.append(f"http://h{(d * 5 + 2) % 7}.test/y{d}")
                body = "".join(f'<a href="{h}">t</a>' for h in hrefs)
                env = (
                    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    "<html><body>" + body + "</body></html>"
                )
                recs = [
                    {
                        "headers": {
                            "WARC-Type": "response",
                            "WARC-Target-URI": f"http://h{d % 7}.test/p{d}",
                        },
                        "content": env.encode(),
                    }
                ]
                ids.append(d)
                payloads.append(warc.write_warc(recs, gzip_members=True))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    base = tempfile.mkdtemp(prefix="recrawl_gate_")
    try:
        store = rc.link_store(spark, f"{base}/store")
        rank_path = f"{base}/ranks"

        def drain(crawl_df, name, crawl_id):
            crawl_df.mapInPandas(synth, synth_schema).coalesce(2).write.mode(
                "overwrite"
            ).parquet(f"{base}/in/{name}")
            rc.recrawl_stream(
                spark,
                f"{base}/in/*",
                store,
                stream_checkpoint_dir=f"{base}/ckpt",
                max_files_per_trigger=4,
                crawl_id=crawl_id,
            )

        # crawl 2 drains under a HIGHER generation: its pages are
        # disjoint from crawl 1's, so the latest-generation read is
        # the union both engines expect — while the versioned path
        # (per-page max-window + sentinels) is what actually runs
        drain(docs.filter(F.col("doc_id") % 3 < 2), "c1", 0)
        rc.rerank_warm(spark, store, rank_path, n_iter=3)  # cold prior
        drain(docs.filter(F.col("doc_id") % 3 == 2), "c2", 1)  # delta only
        final = rc.rerank_warm(spark, store, rank_path, n_iter=3)  # warm
        return final.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
