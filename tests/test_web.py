"""URL hygiene operators (operators/web.py): canonicalization algebra
edge cases, registered-domain extraction, per-domain caps."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import web


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([Row(i=i, u=u) for i, u in enumerate(urls)])
    rows = df.select("i", web.canonicalize_url(F.col("u")).alias("c")).collect()
    return [r.c for r in sorted(rows, key=lambda r: r.i)]


def test_canonicalize_url_edge_cases(spark):
    got = _canon(
        spark,
        [
            # case + default port + trailing slash + fragment collapse
            "HTTPS://WWW.Site.COM:443/Path/Sub/#frag",
            # utm params removed, real params kept in order
            "https://site.com/p?utm_source=x&id=7&utm_medium=y&q=2",
            # utm-only query drops the '?' entirely
            "https://site.com/p?utm_campaign=only",
            # :80 stripped on http, path case preserved
            "http://Site.com:80/CaseSensitive",
            # root path slash preserved (only non-root slashes strip)
            "https://site.com/",
            # no-op: already canonical
            "https://site.com/p?id=1",
            # non-default port kept
            "https://site.com:8443/p/",
        ],
    )
    assert got == [
        "https://www.site.com/Path/Sub",
        "https://site.com/p?id=7&q=2",
        "https://site.com/p",
        "http://site.com/CaseSensitive",
        "https://site.com/",
        "https://site.com/p?id=1",
        "https://site.com:8443/p",
    ]


def test_canonicalize_collapses_messy_variants_for_dedup(spark):
    variants = [
        "https://www.site.com/p/9",
        "HTTPS://WWW.SITE.COM:443/p/9/",
        "https://www.site.com/p/9?utm_source=feed&utm_medium=rss",
        "https://www.site.com/p/9#section-2",
    ]
    assert len(set(_canon(spark, variants))) == 1
    # but scheme and real params are identity-bearing
    differ = ["http://www.site.com/p/9", "https://www.site.com/p/9?id=1"]
    assert len(set(_canon(spark, variants + differ))) == 3


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [
            Row(i=0, u="https://a.b.site.co/x"),
            Row(i=1, u="http://SITE.COM:8080/y?z=1"),
            Row(i=2, u="https://localhost/x"),  # single label -> no match
        ]
    )
    rows = {r.i: r.d for r in df.select(
        "i", web.registered_domain(F.col("u")).alias("d")
    ).collect()}
    assert rows[0] == "site.co"
    assert rows[1] == "site.com"
    assert rows[2] == ""


def test_cap_per_domain_keeps_first_k_deterministically(spark):
    rows = [Row(domain="a.com", doc_id=i) for i in range(30)] + [
        Row(domain="b.com", doc_id=i) for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    kept = web.cap_per_domain(df, "domain", [F.col("doc_id")], cap=20)
    got = {
        d: sorted(r.doc_id for r in rs)
        for d, rs in [
            (d, [r for r in kept.collect() if r.domain == d])
            for d in ("a.com", "b.com")
        ]
    }
    assert got["a.com"] == list(range(20))  # first 20 by doc_id, exactly
    assert got["b.com"] == list(range(5))  # under-cap domains untouched


def test_canonicalize_url_differential_and_idempotent(spark):
    """Differential test against an independent Python reference over a
    seeded zoo of structured-random URLs, plus the idempotence
    invariant canon(canon(u)) == canon(u) — the property that makes
    canonical URLs safe as dedup keys (a second pass must not keep
    rewriting)."""
    import random
    import re

    def ref_canon(u: str) -> str:
        u = re.sub(r"#.*$", "", u)
        m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", u)
        pre = m.group(0) if m else ""
        rest = u[len(pre):]
        pre = pre.lower()
        pre = re.sub(r"^(http://[^:/]*):80$", r"\1", pre)
        pre = re.sub(r"^(https://[^:/]*):443$", r"\1", pre)
        path = re.sub(r"\?.*$", "", rest)
        query = re.sub(r"^[^?]*\?", "", rest) if "?" in rest else ""
        kept = [p for p in query.split("&") if p and not p.startswith("utm_")]
        if len(path) > 1 and path.endswith("/"):
            path = path[:-1]
        return pre + path + ("?" + "&".join(kept) if kept else "")

    rng = random.Random(42)
    schemes = ["http", "https", "HTTP", "HtTpS", "ftp"]
    hosts = ["Site.com", "WWW.EXAMPLE.ORG", "a.b.co", "x-y.z.net", "localhost"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/P/Q", "/p/q/", "/One//Two", "/tr_ailing/"]
    params = ["", "utm_source=a", "id=7", "utm_medium=b&q=2", "q=1&utm_c=3&z=9",
              "utm_a=1&utm_b=2&utm_c=3"]
    frags = ["", "#f", "#Sec-2"]
    urls = [
        f"{rng.choice(schemes)}://{rng.choice(hosts)}{rng.choice(ports)}"
        f"{rng.choice(paths)}"
        + (lambda q: f"?{q}" if q else "")(rng.choice(params))
        + rng.choice(frags)
        for _ in range(300)
    ]
    got = _canon(spark, urls)
    want = [ref_canon(u) for u in urls]
    assert got == want
    # idempotence: canonicalizing the canonical form is a no-op
    again = _canon(spark, got)
    assert again == got
    # structural invariants of the canonical form (default ports are
    # scheme-aware: only http's :80 / https's :443 are stripped)
    for c in got:
        assert "#" not in c
        assert not re.search(r"^http://[^:/]*:80(?:/|\?|$)", c)
        assert not re.search(r"^https://[^:/]*:443(?:/|\?|$)", c)
        assert "utm_" not in c


def test_html_strip_edge_cases(spark):
    """html_strip semantics: script/style/comment BODIES vanish, tags
    become spaces, entities decode exactly one level (&amp;lt; -> &lt;,
    never <), and the report query's recovery invariant holds on the
    real table (every synthesized wrapper strips back to the
    normalized original)."""
    from llm_enhanced_data_pipeline_spark.operators import cleaning
    from llm_enhanced_data_pipeline_spark.queries.web_q import html_strip_report

    cases = [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        ("<script>var x = 1 < 2;</script>text", "text"),
        ("<style>p { color: red }</style>body", "body"),
        ("a<!-- hidden -->b", "a b"),
        ("x&nbsp;y &amp; z", "x y & z"),
        ("&amp;lt;tag&amp;gt;", "&lt;tag&gt;"),  # one decode level only
        ("<DIV CLASS='X'>caps</DIV>", "caps"),
        ("no markup at all", "no markup at all"),
        ("<p>multi\n  line\ttext</p>", "multi line text"),
    ]
    df = spark.createDataFrame([Row(i=i, h=h) for i, (h, _) in enumerate(cases)])
    got = {
        r.i: r.s
        for r in df.select("i", cleaning.html_strip(F.col("h")).alias("s")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)

    # recovery invariant on the real table at smoke scale
    rep = html_strip_report(spark, "/root/testdata/sf0.001").collect()
    assert all(r.n_recovered == r.n_docs for r in rep), rep


# --- PSL registered-domain: the three implementations must agree ------

PSL_CASES = [
    # (host, expected registered domain)
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    ("com", None),                          # bare TLD = public suffix
    ("example.co.uk", "example.co.uk"),     # 2-label rule
    ("www.example.co.uk", "example.co.uk"),
    ("co.uk", None),                        # the suffix itself
    ("uk", None),
    ("alpha.org.uk", "alpha.org.uk"),
    ("school.k12.ca.us", "school.k12.ca.us"),  # 3-label rule
    ("www.school.k12.ca.us", "school.k12.ca.us"),
    ("k12.ca.us", None),
    ("sub.ny.us", "sub.ny.us"),             # 2-label state rule
    ("foo.bar.ck", "foo.bar.ck"),           # *.ck wildcard
    ("bar.ck", None),                       # direct child of wildcard
    ("www.ck", "www.ck"),                   # !www.ck exception
    ("sub.www.ck", "www.ck"),
    ("ck", None),
    ("city.kawasaki.jp", "city.kawasaki.jp"),   # !city.kawasaki.jp
    ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
    ("foo.kawasaki.jp", None),              # *.kawasaki.jp wildcard
    ("x.foo.kawasaki.jp", "x.foo.kawasaki.jp"),
    ("shop.co.jp", "shop.co.jp"),           # plain jp SLD
    ("user.github.io", "user.github.io"),   # private-section suffix
    ("github.io", None),
    ("mysite.blogspot.com", "mysite.blogspot.com"),
    ("data.s3.amazonaws.com", "data.s3.amazonaws.com"),
    ("", None),
]


def test_registered_domain_psl_three_way_agreement(spark):
    """Spark column, DuckDB twin, and the independent pure-Python PSL
    walk must agree on every rule kind: normal (2- and 3-label),
    wildcard, exception, private-section, default-'*', and the
    host-IS-a-public-suffix NULL cases."""
    import duckdb

    from llm_enhanced_data_pipeline_spark.functions import psl

    for host, want in PSL_CASES:
        assert psl.registered_domain_psl_py(host) == want, host

    df = spark.createDataFrame(
        [Row(i=i, h=h) for i, (h, _) in enumerate(PSL_CASES)]
    )
    got = {
        r.i: r.rd
        for r in df.select(
            "i", psl.registered_domain_psl(F.col("h")).alias("rd")
        ).collect()
    }
    for i, (host, want) in enumerate(PSL_CASES):
        assert got[i] == want, f"spark: {host}"

    con = duckdb.connect()
    for host, want in PSL_CASES:
        # the web-level twin composes host_of_sql + the PSL chain
        sql_rd = web.registered_domain_psl_sql(f"'https://{host}/'")
        got_sql = con.execute(f"SELECT {sql_rd}").fetchone()[0]
        assert got_sql == want, f"duckdb: {host}"


def test_registered_domain_psl_url_wrappers_and_cap(spark):
    """The URL-level wrappers parse ports/userinfo away, and
    cap_per_domain keyed on the PSL domain no longer over-caps
    disjoint *.co.uk sites (the 2-label key merges them into one
    bucket; the PSL key keeps them apart)."""
    urls = [
        ("https://alpha.co.uk:443/x", "alpha.co.uk"),
        ("http://user:pw@beta.co.uk:8080/y", "beta.co.uk"),
        ("https://WWW.Gamma.CO.UK/z#f", "gamma.co.uk"),
    ]
    df = spark.createDataFrame([Row(i=i, u=u) for i, (u, _) in enumerate(urls)])
    got = {
        r.i: r.rd
        for r in df.select(
            "i", web.registered_domain_psl(F.col("u")).alias("rd")
        ).collect()
    }
    for i, (_, want) in enumerate(urls):
        assert got[i] == want

    # 6 docs on 3 distinct UK sites, cap=2: the PSL key keeps all 6
    # (2 per site); the 2-label key collapses them into one 'co.uk'
    # bucket and over-caps to 2 total
    rows = [
        Row(doc_id=i, url=f"https://site{i % 3}.co.uk/p/{i}") for i in range(6)
    ]
    d = spark.createDataFrame(rows)
    by_psl = d.withColumn("dom", web.registered_domain_psl(F.col("url")))
    by_2lb = d.withColumn("dom", web.registered_domain(F.col("url")))
    kept_psl = web.cap_per_domain(by_psl, "dom", [F.col("doc_id")], cap=2).count()
    kept_2lb = web.cap_per_domain(by_2lb, "dom", [F.col("doc_id")], cap=2).count()
    assert kept_psl == 6
    assert kept_2lb == 2


def test_default_port_strip_is_scheme_aware(spark):
    """ADVICE r6: http://h:443 and https://h:80 are NON-default ports
    and must survive canonicalization distinct; only the scheme's own
    default port strips. Spark and DuckDB twins agree."""
    import duckdb

    cases = [
        ("http://site.com:80/x", "http://site.com/x"),
        ("https://site.com:443/x", "https://site.com/x"),
        ("http://site.com:443/x", "http://site.com:443/x"),
        ("https://site.com:80/x", "https://site.com:80/x"),
        ("http://site.com:8080/x", "http://site.com:8080/x"),
    ]
    got = _canon(spark, [u for u, _ in cases])
    for (u, want), g in zip(cases, got):
        assert g == want, u
    con = duckdb.connect()
    for u, want in cases:
        sql = web.canonicalize_url_sql(f"'{u}'")
        assert con.execute(f"SELECT {sql}").fetchone()[0] == want, u


def test_html_strip_numeric_entities(spark):
    """Numeric (decimal and hex, any case, leading zeros) entity forms
    decode like their named twins and never survive into dedup keys;
    double-encoded numerics decode exactly one level. Spark and DuckDB
    twins agree."""
    import duckdb

    from llm_enhanced_data_pipeline_spark.operators import cleaning

    cases = [
        ("it&#39;s &#x27;quoted&#X27;", "it's 'quoted'"),
        ("a&#160;b&#x00A0;c&#xa0;d", "a b c d"),
        ("&#60;tag&#62; &#x3C;T&#x3E;", "<tag> <T>"),
        ("&#34;q&#x22; &quot;n&quot; &apos;a&apos;", '"q" "n" \'a\''),
        ("x &#38; y &#x26; z", "x & y & z"),
        ("&amp;#39; stays once-decoded", "&#39; stays once-decoded"),
        ("&#038; &#0039;", "& '"),
    ]
    df = spark.createDataFrame([Row(i=i, h=h) for i, (h, _) in enumerate(cases)])
    got = {
        r.i: r.s
        for r in df.select(
            "i", cleaning.html_strip(F.col("h")).alias("s")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
    con = duckdb.connect()
    for h, want in cases:
        sql = cleaning.html_strip_sql("'" + h.replace("'", "''") + "'")
        assert con.execute(f"SELECT {sql}").fetchone()[0] == want, h


def test_psl_max_labels_derived_from_passed_rules(spark):
    """Swapping in deeper rules (the full PSL has 4-5-label rules) must
    deepen the match automatically — max_labels is derived from the
    rule tuples, so a deep rule can never be silently truncated to the
    snapshot's depth and mis-bucket its hosts."""
    import duckdb

    from llm_enhanced_data_pipeline_spark.functions import psl

    # a 4-label private-section style rule + a 3-label wildcard parent
    normal = psl.PSL_NORMAL + ("s3.eu-west-1.compute.example",)
    wildcard = psl.PSL_WILDCARD + ("ap.south.example",)
    exception = psl.PSL_EXCEPTION + ("ok.ap.south.example",)
    assert psl.rules_max_labels(normal, wildcard, exception) == 4
    assert (
        psl.rules_max_labels(psl.PSL_NORMAL, psl.PSL_WILDCARD, psl.PSL_EXCEPTION)
        == psl.MAX_MATCH_LABELS
    )

    cases = [
        # 4-label normal rule: suffix itself -> registrable = +1 label
        ("bucket.s3.eu-west-1.compute.example", "bucket.s3.eu-west-1.compute.example"),
        ("x.bucket.s3.eu-west-1.compute.example", "bucket.s3.eu-west-1.compute.example"),
        ("s3.eu-west-1.compute.example", None),  # IS a public suffix
        # wildcard under a 3-label parent
        ("site.zone.ap.south.example", "site.zone.ap.south.example"),
        ("deep.site.zone.ap.south.example", "site.zone.ap.south.example"),
        # exception overrides the wildcard
        ("ok.ap.south.example", "ok.ap.south.example"),
        ("a.ok.ap.south.example", "ok.ap.south.example"),
        # snapshot rules still behave
        ("www.example.co.uk", "example.co.uk"),
    ]
    for host, want in cases:
        assert (
            psl.registered_domain_psl_py(host, normal, wildcard, exception) == want
        ), host

    df = spark.createDataFrame(
        [Row(i=i, h=h) for i, (h, _) in enumerate(cases)]
    )
    got = {
        r.i: r.rd
        for r in df.select(
            "i",
            psl.registered_domain_psl(
                F.col("h"), normal, wildcard, exception
            ).alias("rd"),
        ).collect()
    }
    con = duckdb.connect()
    for i, (host, want) in enumerate(cases):
        assert got[i] == want, (host, got[i], want)
        sql = psl.registered_domain_psl_sql(f"'{host}'", normal, wildcard, exception)
        assert con.execute(f"SELECT {sql}").fetchone()[0] == want, host


def test_parse_robots_grammar():
    """RFC 9309 grammar: comments, blank-line breaks, consecutive UA
    lines sharing a group, a UA line after rules starting a NEW group,
    empty Disallow dropped, unknown fields skipped without ending the
    group's rules, rules before any group ignored, sitemaps global."""
    text = (
        "Disallow: /before-any-group\n"   # ignored per RFC
        "# politeness\n"
        "User-agent: *\n"
        "Disallow: /private/   # trailing comment\n"
        "Crawl-delay: 5\n"                 # unknown field: skipped
        "Allow: /private/ok\n"             # still the '*' group
        "\n"
        "User-agent: TrainBot\n"           # case-insensitive UA
        "User-agent: evalbot\n"            # consecutive UAs share rules
        "Disallow: /tmp*\n"
        "Disallow:\n"                      # empty: no restriction
        "Allow: /tmp/keep$\n"
        "Sitemap: http://ex.com/s.xml\n"
    )
    rules, sitemaps = web.parse_robots(text)
    assert rules == [
        ("*", False, "/private/"),
        ("*", True, "/private/ok"),
        ("trainbot", False, "/tmp*"),
        ("evalbot", False, "/tmp*"),
        ("trainbot", True, "/tmp/keep$"),
        ("evalbot", True, "/tmp/keep$"),
    ]
    assert sitemaps == ["http://ex.com/s.xml"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        web.parse_robots(None)


def test_robots_admission_precedence(spark):
    """RFC 9309 precedence on the declarative matcher: longest pattern
    wins, allow wins ties, '$' anchors exactly, '*' wildcards, LIKE
    metachars in patterns are literal, unmatched domains/paths default
    to allowed."""
    rules = spark.createDataFrame(
        [
            Row(domain="a.com", pattern="/private/", allow=False),
            Row(domain="a.com", pattern="/private/ok", allow=True),
            Row(domain="a.com", pattern="/tmp*", allow=False),
            Row(domain="a.com", pattern="/tmp/keep$", allow=True),
            Row(domain="a.com", pattern="/x_y%z\\w", allow=False),
            Row(domain="a.com", pattern="/t", allow=True),   # tie length
            Row(domain="a.com", pattern="/t", allow=False),  # -> allow wins
            Row(domain="b.com", pattern="/", allow=False),
        ]
    )
    urls = spark.createDataFrame(
        [
            Row(url_id=1, domain="a.com", path="/public/page"),
            Row(url_id=2, domain="a.com", path="/private/secret"),
            Row(url_id=3, domain="a.com", path="/private/okay"),
            Row(url_id=4, domain="a.com", path="/tmp/file"),
            Row(url_id=5, domain="a.com", path="/tmp/keep"),
            Row(url_id=6, domain="a.com", path="/tmp/keepX"),
            Row(url_id=7, domain="a.com", path="/x_y%z\\w-more"),
            Row(url_id=8, domain="a.com", path="/t-tie"),
            Row(url_id=9, domain="b.com", path="/anything"),
            Row(url_id=10, domain="c.com", path="/no-rules"),
        ]
    )
    out = {
        r.url_id: (r.allowed, r.matched_pattern)
        for r in web.robots_admission(urls, rules).collect()
    }
    assert out == {
        1: (True, None),
        2: (False, "/private/"),
        3: (True, "/private/ok"),
        4: (False, "/tmp*"),
        5: (True, "/tmp/keep$"),
        6: (False, "/tmp*"),
        7: (False, "/x_y%z\\w"),
        8: (True, "/t"),
        9: (False, "/"),
        10: (True, None),
    }
    # one row per URL regardless of how many rules matched
    assert web.robots_admission(urls, rules).count() == 10


def test_robots_ua_group_selection(spark):
    """RFC 9309 §2.2.1: groups are SELECTED, never merged — the most
    specific group whose token prefixes the crawler's product token
    wins, else '*', else no rules (default allow). A naive compose of
    read_robots_rules output into robots_admission would merge every
    UA group; the user_agent parameter applies the selection rule."""
    rules = spark.createDataFrame(
        [
            # a.com: trainbot group DISALLOWS /data; the '*' group has a
            # LONGER Allow for the same subtree — merging the groups
            # would flip /data/secret to allowed (longest-match), the
            # RFC selection keeps only the trainbot group
            Row(domain="a.com", user_agent="trainbot", pattern="/data",
                allow=False),
            Row(domain="a.com", user_agent="*", pattern="/data/secret",
                allow=True),
            # b.com: only '*' — selected when no specific group matches
            Row(domain="b.com", user_agent="*", pattern="/private",
                allow=False),
            # c.com: only a FOREIGN bot group — no group for us: allow
            Row(domain="c.com", user_agent="otherbot", pattern="/",
                allow=False),
            # d.com: longer token beats shorter ("train" vs "trainbot")
            Row(domain="d.com", user_agent="train", pattern="/",
                allow=False),
            Row(domain="d.com", user_agent="trainbot", pattern="/",
                allow=True),
        ]
    )
    urls = spark.createDataFrame(
        [
            Row(url_id=1, domain="a.com", path="/data/secret"),
            Row(url_id=2, domain="a.com", path="/other"),
            Row(url_id=3, domain="b.com", path="/private/x"),
            Row(url_id=4, domain="b.com", path="/public"),
            Row(url_id=5, domain="c.com", path="/anything"),
            Row(url_id=6, domain="d.com", path="/page"),
        ]
    )
    out = {
        r.url_id: r.allowed
        for r in web.robots_admission(
            urls, rules, user_agent="trainbot"
        ).collect()
    }
    assert out == {1: False, 2: True, 3: False, 4: True, 5: True, 6: True}
    # the merge defect this guards against: composing ALL groups flips
    # url 1 to allowed via the foreign group's longer pattern
    merged = {
        r.url_id: r.allowed
        for r in web.robots_admission(urls, rules.drop("user_agent")).collect()
    }
    assert merged[1] is True
    # group selection happens per-domain on the rules side alone
    sel = web.select_ua_group(rules, "TrainBot")  # case-insensitive
    got = {(r.domain, r.user_agent) for r in sel.collect()}
    assert got == {
        ("a.com", "trainbot"),
        ("b.com", "*"),
        ("d.com", "trainbot"),
    }


def test_parse_robots_full_crawl_delay_and_grammar():
    """Crawl-delay is group-scoped exactly like Allow/Disallow: shared
    by consecutive UA lines, ignored before any group, non-numeric
    dropped; the legacy parse_robots view is unchanged."""
    txt = (
        "Crawl-delay: 9\n"            # before any group: ignored
        "User-agent: a\nUser-agent: b\nCrawl-delay: 2.5\n"
        "Disallow: /x\n"
        "User-agent: c\nCrawl-delay: soon\n"   # non-numeric: dropped
        "Crawl-delay: 4\n"
        "Sitemap: http://e.com/s.xml\n"
    )
    parsed = web.parse_robots_full(txt)
    assert parsed["delays"] == [("a", 2.5), ("b", 2.5), ("c", 4.0)]
    assert parsed["sitemaps"] == ["http://e.com/s.xml"]
    rules, sitemaps = web.parse_robots(txt)  # back-compat view
    assert rules == [("a", False, "/x"), ("b", False, "/x")]
    assert sitemaps == ["http://e.com/s.xml"]


def test_sitemap_urls_entities_kinds_and_quarantine(spark):
    """Declarative sitemap harvest: urlset + sitemapindex blocks,
    XML entities unescaped (&amp; last), whitespace-trimmed locs,
    lastmod nullable, locless entries dropped, non-XML rows yield
    nothing (regexp finds no blocks)."""
    xml = (
        "<urlset><url><loc> http://a.com/?x=1&amp;y=2&amp;lt; </loc>"
        "<lastmod>2023-01-02</lastmod></url>"
        "<url><loc>http://a.com/plain</loc></url>"
        "<url><lastmod>2023-09-09</lastmod></url></urlset>"  # no loc
        "<sitemapindex><sitemap><loc>http://a.com/s1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    rows = [Row(doc_id=1, xml=xml), Row(doc_id=2, xml="not xml at all")]
    out = {
        (r.doc_id, r.kind, r.entry_idx): (r.loc, r.lastmod)
        for r in web.sitemap_urls(
            spark.createDataFrame(rows), "doc_id", "xml"
        ).collect()
    }
    # &amp; unescapes LAST: '&amp;lt;' is '&lt;' as text, not '<'
    assert out[(1, "url", 0)] == ("http://a.com/?x=1&y=2&lt;", "2023-01-02")
    assert out[(1, "url", 1)] == ("http://a.com/plain", None)
    assert (1, "url", 2) not in out  # locless entry dropped
    assert out[(1, "sitemap", 0)] == ("http://a.com/s1.xml", None)
    assert not any(k[0] == 2 for k in out)


def test_schedule_fetches_per_domain_offsets(spark):
    urls = spark.createDataFrame(
        [Row(url_id=i, domain="a.com") for i in range(4)]
        + [Row(url_id=10, domain="b.com"), Row(url_id=11, domain="b.com")]
    )
    delays = spark.createDataFrame([Row(domain="a.com", crawl_delay=2.5)])
    out = {
        r.url_id: r.fetch_offset_s
        for r in web.schedule_fetches(urls, delays).collect()
    }
    # a.com: k-th URL at (k-1)*2.5; b.com: no delay row -> default 1.0
    assert out == {0: 0.0, 1: 2.5, 2: 5.0, 3: 7.5, 10: 0.0, 11: 1.0}


def test_schedule_fetches_tolerates_multirow_delays(spark):
    """r10 ADVICE: an unselected / multi-UA delays frame must not
    multiply URL rows through the join — schedule_fetches reduces to
    one row per domain itself (max: the politest delay wins)."""
    urls = spark.createDataFrame(
        [Row(url_id=1, domain="a.com"), Row(url_id=2, domain="a.com")]
    )
    delays = spark.createDataFrame(
        [
            Row(domain="a.com", crawl_delay=1.0),
            Row(domain="a.com", crawl_delay=3.0),
        ]
    )
    rows = web.schedule_fetches(urls, delays).collect()
    assert len(rows) == 2  # no row multiplication
    assert {r.url_id: r.fetch_offset_s for r in rows} == {1: 0.0, 2: 3.0}


def test_select_ua_delays_strict_group_scoping(spark):
    """r10 ADVICE: a crawler whose own UA group exists (in rules) but
    carries no Crawl-delay must fall back to the scheduler DEFAULT,
    not inherit the '*' group's delay — selection happens over the
    full rules ∪ delays group universe. A domain where the bot group
    does carry a delay keeps it; a domain with only '*' groups uses
    the '*' delay; delay-only groups (no rules) still participate."""
    rules = spark.createDataFrame(
        [
            # a.com: trainbot group exists (rule only), '*' has a delay
            Row(domain="a.com", user_agent="trainbot", pattern="/x", allow=False),
            Row(domain="a.com", user_agent="*", pattern="/y", allow=False),
            # b.com: only '*'
            Row(domain="b.com", user_agent="*", pattern="/z", allow=False),
            # c.com: trainbot with a delay below
            Row(domain="c.com", user_agent="trainbot", pattern="/w", allow=False),
        ]
    )
    delays = spark.createDataFrame(
        [
            Row(domain="a.com", user_agent="*", crawl_delay=9.0),
            Row(domain="b.com", user_agent="*", crawl_delay=2.0),
            Row(domain="c.com", user_agent="trainbot", crawl_delay=4.0),
            # d.com: delay-only trainbot group (no rules rows at all)
            Row(domain="d.com", user_agent="trainbot", crawl_delay=7.0),
        ]
    )
    got = {
        (r.domain, r.user_agent): r.crawl_delay
        for r in web.select_ua_delays(rules, delays, "TrainBot").collect()
    }
    # a.com's trainbot group wins selection but has no delay -> NO row
    assert got == {
        ("b.com", "*"): 2.0,
        ("c.com", "trainbot"): 4.0,
        ("d.com", "trainbot"): 7.0,
    }


def test_extract_main_content_boilerplate_removal(spark):
    """jusText-style block heuristic against a HAND-WRITTEN expected
    string (not the SQL twin): header/nav/aside/footer link blocks and
    the short no-link copyright line drop; both article paragraphs
    survive — including the one carrying a single inline link, which
    must not sink its block; script/style bodies never count as text."""
    page = (
        "<html><head><style>body{color:red}</style></head><body>"
        "<header><a href='/'>Home</a> <a href='/a'>About</a></header>"
        "<nav><ul><li><a href='/s1'>Section one here</a></li>"
        "<li><a href='/s2'>Section two here</a></li></ul></nav>"
        "<article><p>This is the real article body with enough prose"
        " to clear the floor easily.</p>"
        "<p>Second paragraph keeps going with more substantive text and"
        " a single inline <a href='/ref'>reference</a> that must not"
        " sink the block.</p></article>"
        "<aside><a href='/r1'>one related link</a>"
        " <a href='/r2'>another related link</a></aside>"
        "<footer>(c) 2026 corp</footer>"
        "<script>track('long enough script body to pass the floor');"
        "</script></body></html>"
    )
    df = spark.createDataFrame([Row(id=1, html=page)])
    got = df.select(
        web.extract_main_content(F.col("html")).alias("m")
    ).collect()[0]["m"]
    assert got == (
        "This is the real article body with enough prose to clear the"
        " floor easily. Second paragraph keeps going with more"
        " substantive text and a single inline reference that must not"
        " sink the block."
    )
    # a page that is ALL boilerplate extracts to empty
    nav_only = "<nav><a href='/x'>One long navigation label here</a></nav>"
    empty = spark.createDataFrame([Row(id=1, html=nav_only)])
    assert (
        empty.select(web.extract_main_content(F.col("html")).alias("m"))
        .collect()[0]["m"]
        == ""
    )


def test_corpus_build_v9_capstone_is_nonvacuous(spark, sf_dir):
    # the oracle hash-compare passes vacuously when both engines agree
    # on an empty/degenerate result — pin that every stage of the
    # capstone actually BITES at sf0.01: both lanes emit rows, the
    # centrality gate excludes hosts, text dedup collapses the A/B
    # layouts, and media dedup merges across docs (not just across the
    # two encodings of one doc)
    from collections import Counter

    from llm_enhanced_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["corpus_build_v9"].fn(spark, sf_dir).collect()
    txt = [r for r in rows if r["kind"] == "text"]
    img = [r for r in rows if r["kind"] == "image"]
    assert txt and img
    # admission really gates: some hosts fall below the uniform share
    assert 0 < len({r["host"] for r in rows}) < 23
    # every surviving article absorbed its syndicated layout-B copy
    assert all(r["n_dup_pages"] >= 2 for r in txt)
    assert all(r["path"] == "/art" for r in txt)  # lowest url_id won
    # decode-invariant media dedup merged ACROSS docs somewhere
    # (2 encodings x >=2 docs sharing the pixel key)
    assert max(r["n_dup_pages"] for r in img) >= 4
    assert all(r["path"] == "/img" for r in img)  # encoding A won
    # the per-host budget is never exceeded (it binds at sf0.1, where
    # the sweep's oracle re-checks it; ~2 pages/host here)
    per_host = Counter(r["host"] for r in txt)
    assert max(per_host.values()) <= 15
    # ranks are attached and positive
    assert all(r["rank_u"] > 0 for r in rows)
