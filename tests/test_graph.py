"""Web-graph lane: link extraction / resolution semantics, host-graph
build, and the integer-exact PageRank recipe pinned against
hand-computed fixed points (the oracle gate then re-checks the full
lineage against DuckDB at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import graph

SCALE = graph.RANK_SCALE


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight bigint")


def _ranks(df) -> dict:
    return {r["node"]: r["rank_u"] for r in df.collect()}


def test_two_node_cycle_is_a_fixed_point(spark):
    # A<->B: uniform is the exact fixed point and the integer recipe
    # must sit on it from iteration 0 (no drift, no floor loss).
    e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
    for n_iter in (1, 5):
        r = _ranks(graph.pagerank_int(e, n_iter=n_iter))
        assert r == {"a": SCALE // 2, "b": SCALE // 2}


def test_dangling_mass_redistributes_hand_computed(spark):
    # A->B, B dangles. Hand-run of the documented recipe:
    # iter1: dang=5e8, r(A)=75e6+85*(5e8//2)//100, r(B)=75e6+85*(5e8+25e7)//100
    e = _edges(spark, [("a", "b", 1)])
    r1 = _ranks(graph.pagerank_int(e, n_iter=1))
    assert r1 == {"a": 287_500_000, "b": 712_500_000}
    r2 = _ranks(graph.pagerank_int(e, n_iter=2))
    assert r2 == {"a": 377_812_500, "b": 622_187_500}
    # exact integer conservation: this graph loses nothing to floors
    assert sum(r2.values()) == SCALE


def test_rank_mass_is_conserved_up_to_floor_loss(spark):
    # Weighted asymmetric graph with a dangling node: every floor can
    # lose at most 1 unit per node per division site, so total mass
    # stays within a tight deterministic bound of SCALE.
    e = _edges(
        spark,
        [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "d", 1)],
    )
    r = _ranks(graph.pagerank_int(e, n_iter=5))
    assert set(r) == {"a", "b", "c", "d"}
    loss = SCALE - sum(r.values())
    assert 0 <= loss < 5 * 4 * 4  # iters x nodes x division sites
    # d dangles and only receives from c: it must not starve
    assert r["d"] > 0
    # b receives the 3x-weighted edge; c receives from two nodes
    assert r["c"] > r["a"]


def test_resolve_href_forms(spark):
    base = "https://h1.example/p/42"
    cases = [
        ("https://x.example/a", "https://x.example/a"),
        ("HTTP://X.example/a", "HTTP://X.example/a"),  # case-kept; canon downstream
        ("//cdn.example/l.js", "https://cdn.example/l.js"),
        ("/root/3", "https://h1.example/root/3"),
        ("rel/0", "https://h1.example/p/rel/0"),
        ("mailto:a@b", None),
        ("javascript:void(0)", None),
        ("tel:+1555", None),
        ("ftp://files.example/x", None),     # any non-http scheme skips
        ("ws://sock.example/y", None),
        ("about:blank", None),
        ("blob:https://x.example/u", None),
        ("android-app://com.x/p", None),
        ("1:2", "https://h1.example/p/1:2"),  # digit-first: not a scheme
        ("#frag", None),
        ("", None),
    ]
    df = spark.createDataFrame(
        [(b, h) for (h, _) in cases for b in [base]], "base string, href string"
    )
    out = df.select(
        "href", graph.resolve_href(F.col("base"), F.col("href")).alias("u")
    ).collect()
    got = {r["href"]: r["u"] for r in out}
    for href, want in cases:
        assert got[href] == want, href


def test_resolve_href_pathless_base_gets_a_slash(spark):
    df = spark.createDataFrame(
        [("https://h.example", "img/x.png")], "base string, href string"
    )
    [row] = df.select(
        graph.resolve_href(F.col("base"), F.col("href")).alias("u")
    ).collect()
    assert row["u"] == "https://h.example/img/x.png"


def test_extract_links_order_and_attrs(spark):
    html = (
        '<p>t</p><a href="https://a.example/1">one</a>'
        '<a class="c" href="/two" rel="nofollow">two words</a>'
        '<a href="#skip">skipped</a>'
    )
    df = spark.createDataFrame(
        [(1, html, "https://base.example/dir/page")],
        "id bigint, html string, base string",
    )
    rows = (
        graph.extract_links(df, "id", "html", "base")
        .orderBy("url")
        .collect()
    )
    assert [(r["url"], r["anchor_text"]) for r in rows] == [
        ("https://a.example/1", "one"),
        ("https://base.example/two", "two words"),
    ]


def test_host_graph_drops_self_loops_and_weights(spark):
    links = spark.createDataFrame(
        [
            ("https://A.example/p", "https://b.example/q"),
            ("https://a.example/r", "https://B.example/s"),
            ("https://a.example/x", "https://a.example/y"),  # self loop
        ],
        "src_url string, dst_url string",
    )
    rows = graph.host_graph(links, "src_url", "dst_url").collect()
    assert [(r["src"], r["dst"], r["weight"]) for r in rows] == [
        ("a.example", "b.example", 2)
    ]


def test_host_graph_drops_empty_hosts_both_sides_and_sql_twin_agrees(spark):
    # a URL whose host extraction fails (no scheme) must not admit an
    # empty-string node on EITHER side, and the DuckDB twin must apply
    # the identical filter (r11 ADVICE item 1: the filters are defined
    # once in host_graph / host_graph_sql)
    import duckdb

    rows = [
        ("https://a.example/p", "https://b.example/q"),
        ("not-a-url", "https://b.example/q"),        # empty src host
        ("https://a.example/p", "garbage"),          # empty dst host
        ("bad", "worse"),                            # both empty
    ]
    links = spark.createDataFrame(rows, "src_url string, dst_url string")
    got = [
        (r["src"], r["dst"], r["weight"])
        for r in graph.host_graph(links, "src_url", "dst_url").collect()
    ]
    assert got == [("a.example", "b.example", 1)]
    con = duckdb.connect()
    con.execute("CREATE TABLE lk (src_url VARCHAR, dst_url VARCHAR)")
    con.executemany("INSERT INTO lk VALUES (?, ?)", rows)
    assert con.execute(graph.host_graph_sql("lk")).fetchall() == [
        ("a.example", "b.example", 1)
    ]


def test_pagerank_empty_edges_returns_empty_like_the_oracle(spark):
    # n = 0 must not raise ZeroDivisionError; the DuckDB twin's CTE
    # chain returns no rows on an empty edge list, so Spark matches
    e = _edges(spark, [])
    out = graph.pagerank_int(e, n_iter=3)
    assert out.columns == ["node", "rank_u"]
    assert out.count() == 0


def test_pagerank_zero_iterations_returns_truncated_init(spark):
    """n_iter=0 returns the initial ranks, still behind a checkpoint —
    the contract streaming/recrawl's in-place warm-start parquet
    overwrite relies on (the returned frame must not reference its
    inputs' lineage). Since r14 only the per-iteration frames
    checkpoint implicitly, so the degenerate needs its own guard."""
    e = _edges(spark, [("a", "b", 1), ("b", "a", 1), ("a", "c", 2)])
    out = graph.pagerank_int(e, n_iter=0)
    r = {row["node"]: row["rank_u"] for row in out.collect()}
    assert r == {"a": 333333333, "b": 333333333, "c": 333333333}
    # lineage is truncated: the physical plan reads a checkpointed RDD
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan


def test_pagerank_teleport_seed_with_quote_is_injection_safe(spark):
    # url_host can emit a quote from a crafted URL (https://evil'x/);
    # the seed must be compared as a bound value, not spliced SQL text
    import duckdb

    rows = [("evil'x", "b", 1), ("b", "evil'x", 1)]
    r = _ranks(graph.pagerank_int(_edges(spark, rows), n_iter=4,
                                  teleport="evil'x"))
    # the seed restart landed (both carry mass; on a 2-cycle the exact
    # ordering oscillates by iteration parity — irrelevant here)
    assert r["evil'x"] > 0 and r["b"] > 0
    values = ", ".join(f"('{s}', '{t}', {w})".replace("evil'x", "evil''x")
                       for s, t, w in rows)
    sql = (
        f"WITH edges(src, dst, weight) AS (VALUES {values}),\n"
        + graph.pagerank_sql("edges", n_iter=4, teleport="evil'x")
        + "\nSELECT node, rank_u FROM pr_r4"
    )
    duck = {n: u for n, u in duckdb.sql(sql).fetchall()}
    assert duck == r


def test_corpus_graph_admission_is_nonempty_and_capped(spark, sf_dir):
    # the oracle hash-compare passes vacuously when BOTH engines agree
    # on an empty result (observed while building: a host-suffix
    # mismatch in the admission join emptied both sides identically) —
    # pin non-emptiness and the per-community cap here
    from collections import Counter

    from llm_enhanced_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["corpus_graph_admission"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    by_comm = Counter(r["community"] for r in rows)
    assert max(by_comm.values()) <= 30
    assert len(by_comm) >= 2
    # admission really gates: not every host survives the rank filter
    assert len({r["host"] for r in rows}) < 23


def test_lpa_disjoint_triangles_find_two_communities(spark):
    # two disjoint triangles with equal weights converge to their
    # lexicographic-min member's label by round 2 (hand-run: l1 via
    # min-tie-break, l2 by majority) and stay there
    e = _edges(
        spark,
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1),
         ("x", "y", 1), ("y", "z", 1), ("z", "x", 1)],
    )
    out = {r["node"]: r["community"]
           for r in graph.lpa_communities(e, n_iter=3).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_lpa_is_edge_order_free(spark):
    rows = [("a", "b", 2), ("b", "c", 1), ("c", "d", 3), ("d", "a", 1)]
    r1 = graph.lpa_communities(_edges(spark, rows), n_iter=2).collect()
    r2 = graph.lpa_communities(
        _edges(spark, list(reversed(rows))), n_iter=2
    ).collect()
    to_d = lambda rs: {r["node"]: r["community"] for r in rs}
    assert to_d(r1) == to_d(r2)


def test_lpa_sql_matches_spark(spark):
    import duckdb

    rows = [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "d", 2),
            ("d", "e", 5)]
    spark_r = {
        r["node"]: r["community"]
        for r in graph.lpa_communities(_edges(spark, rows), n_iter=3).collect()
    }
    values = ", ".join(f"('{s}', '{t}', {w})" for s, t, w in rows)
    sql = (
        f"WITH edges(src, dst, weight) AS (VALUES {values}),\n"
        + graph.lpa_communities_sql("edges", n_iter=3)
        + "\nSELECT node, community FROM lpa_l3"
    )
    duck_r = dict(duckdb.sql(sql).fetchall())
    assert spark_r == duck_r


def test_hyperball_harmonic_tracks_exact_centrality(spark):
    # path a->b->d->e: true hc = [0, 1, 1.5, 1.833...]; the HyperBall
    # estimate (m=64, linear-counting range) must land within 15% and
    # preserve the ordering. hc(a) is exactly 0 — nothing reaches a.
    # Node names chosen register-disjoint (md5 j = 39/21/40/8) — 'c'
    # shares register 39 with 'a', which is legitimate HLL collision
    # behavior but would make a 4-node accuracy bound meaningless.
    e = _edges(spark, [("a", "b", 1), ("b", "d", 1), ("d", "e", 1)])
    out = {
        r["node"]: (r["hc_milli"], r["reach_milli"])
        for r in graph.hyperball_harmonic(e, n_iter=4).collect()
    }
    assert out["a"][0] == 0
    truth = {"b": 1000, "d": 1500, "e": 1833}
    for node, want in truth.items():
        got = out[node][0]
        assert abs(got - want) / want < 0.15, (node, got, want)
    assert out["a"][0] < out["b"][0] < out["d"][0] < out["e"][0]
    # reach estimates grow along the path too: e's ball is the largest
    assert out["e"][1] > out["a"][1]


def test_hyperball_counters_are_insertion_order_free(spark):
    # same graph, edge list reversed: registers are max-merged, so the
    # result must be identical (the property that makes the recipe
    # shuffle-safe at scale)
    rows = [("a", "b", 1), ("b", "c", 1), ("a", "c", 2)]
    r1 = graph.hyperball_harmonic(_edges(spark, rows), n_iter=3).collect()
    r2 = graph.hyperball_harmonic(
        _edges(spark, list(reversed(rows))), n_iter=3
    ).collect()
    as_dict = lambda rs: {r["node"]: (r["hc_milli"], r["reach_milli"]) for r in rs}
    assert as_dict(r1) == as_dict(r2)


def test_hyperball_sql_matches_spark(spark):
    import duckdb

    rows = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("a", "d", 2)]
    spark_r = {
        r["node"]: (r["hc_milli"], r["reach_milli"])
        for r in graph.hyperball_harmonic(_edges(spark, rows), n_iter=3).collect()
    }
    values = ", ".join(f"('{s}', '{t}', {w})" for s, t, w in rows)
    sql = (
        f"WITH edges(src, dst, weight) AS (VALUES {values}),\n"
        + graph.hyperball_harmonic_sql("edges", n_iter=3)
        + "\nSELECT node, hc_milli, reach_milli FROM hb_out"
    )
    duck_r = {n: (h, e) for n, h, e in duckdb.sql(sql).fetchall()}
    assert spark_r == duck_r


def test_resolve_href_engine_parity_fuzz(spark):
    # the Spark expression and its DuckDB twin must agree on arbitrary
    # href junk: one seeded batch of generated cases through BOTH
    # engines, plus the invariant that every non-NULL result is
    # absolute. Quotes excluded (the extractor's regex already cannot
    # produce them inside href).
    import random

    import duckdb

    rng = random.Random(11)
    frag = "abcdefghij:/#?.%-_~@!$&()*+,;=^|[]{}\\ "
    bases = [
        "https://h1.example/p/42",
        "http://x.example",
        "https://a.b.example:8443/d/e/f?q=1#z",
    ]
    cases = []
    for _ in range(400):
        href = "".join(rng.choice(frag) for _ in range(rng.randint(0, 25)))
        if rng.random() < 0.3:
            href = rng.choice(
                ["https://", "http://", "//", "/", "mailto:", "#", ""]
            ) + href
        cases.append((rng.choice(bases), href))
    indexed = [(i, b, h) for i, (b, h) in enumerate(cases)]
    df = spark.createDataFrame(indexed, "i long, base string, href string")
    spark_out = [
        r["u"]
        for r in df.orderBy("i")
        .select(graph.resolve_href(F.col("base"), F.col("href")).alias("u"))
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE c (i BIGINT, base VARCHAR, href VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?, ?)", indexed)
    duck_out = [
        r[0]
        for r in con.execute(
            f"SELECT {graph.resolve_href_sql('base', 'href')} "
            "FROM c ORDER BY i"
        ).fetchall()
    ]
    assert spark_out == duck_out
    for u in spark_out:
        assert u is None or u.lower().startswith(("http://", "https://"))


def test_personalized_pagerank_concentrates_near_seed(spark):
    # a->b with seed a: fixed point is pi_a = 0.15 + 0.7225*pi_a ->
    # 0.5405 vs pi_b 0.4595. The restart<->dangling loop contracts by
    # 0.7225 every TWO rounds (a 2-step recursion), so 20 rounds leave
    # ~0.018 residual — inside the 0.025 tolerance. An upstream-only
    # node (e->a) is unreachable FROM the seed and must score exactly
    # 0; its own mass still flows to a. (At 5 rounds a directed chain
    # is still mid-wave — observed b > a while building this — which
    # is the exact recipe converging, not an error.)
    e = _edges(spark, [("a", "b", 1), ("e", "a", 1)])
    r = _ranks(graph.pagerank_int(e, n_iter=20, teleport="a"))
    assert r["e"] == 0
    assert r["a"] > r["b"] > 0
    assert abs(r["a"] - 540_500_000) < 25_000_000
    # uniform form gives every node restart mass — e included —
    # teleport genuinely changes the fixed point
    u = _ranks(graph.pagerank_int(e, n_iter=4))
    assert u["e"] > 0


def test_personalized_pagerank_sql_matches_spark(spark):
    import duckdb

    rows = [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("b", "d", 3)]
    spark_r = _ranks(
        graph.pagerank_int(_edges(spark, rows), n_iter=4, teleport="a")
    )
    values = ", ".join(f"('{s}', '{t}', {w})" for s, t, w in rows)
    sql = (
        f"WITH edges(src, dst, weight) AS (VALUES {values}),\n"
        + graph.pagerank_sql("edges", n_iter=4, teleport="a")
        + "\nSELECT node, rank_u FROM pr_r4"
    )
    duck_r = dict(duckdb.sql(sql).fetchall())
    assert spark_r == duck_r


def test_pagerank_sql_matches_spark_on_a_weighted_graph(spark):
    # engine-parity pin independent of the sf fixtures: the unrolled
    # DuckDB CTE chain and the Spark loop must agree bit-for-bit
    import duckdb

    rows = [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "c", 1)]
    spark_r = _ranks(graph.pagerank_int(_edges(spark, rows), n_iter=4))
    values = ", ".join(f"('{s}', '{t}', {w})" for s, t, w in rows)
    sql = (
        f"WITH edges(src, dst, weight) AS (VALUES {values}),\n"
        + graph.pagerank_sql("edges", n_iter=4)
        + "\nSELECT node, rank_u FROM pr_r4"
    )
    duck_r = dict(duckdb.sql(sql).fetchall())
    assert spark_r == duck_r


def test_warm_start_converges_to_the_cold_fixed_point(spark):
    # the recrawl contract: the damped iteration contracts by 0.85 per
    # round, so ANY init (prior ranks, junk, partial coverage) reaches
    # the same fixed point — warm-start only changes the budget needed.
    # 30 rounds leave <= 0.85^30 ~ 0.8% of the initial disagreement.
    rows = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "d", 1),
            ("d", "a", 1)]
    e = _edges(spark, rows)
    cold = _ranks(graph.pagerank_int(e, n_iter=30))
    junk = spark.createDataFrame(
        [("a", 900_000_000), ("c", 50_000_000)],  # b/d absent -> default
        "node string, rank_u bigint",
    )
    warm = _ranks(graph.pagerank_int(e, n_iter=30, init_ranks=junk))
    assert set(warm) == set(cold)
    for node in cold:
        assert abs(warm[node] - cold[node]) < 10_000_000, node  # <1% of scale


def test_warm_start_absorbs_an_edge_delta_in_few_rounds(spark):
    # prior ranks from the old graph + 3 warm rounds on the new graph
    # must land closer to the new fixed point than 3 cold rounds do —
    # the whole point of warm-starting a recrawl
    old = _edges(spark, [("a", "b", 1), ("b", "a", 1), ("b", "c", 1)])
    new_rows = [("a", "b", 1), ("b", "a", 1), ("b", "c", 1), ("c", "a", 2)]
    new = _edges(spark, new_rows)
    prior = graph.pagerank_int(old, n_iter=12)
    target = _ranks(graph.pagerank_int(new, n_iter=40))
    warm3 = _ranks(graph.pagerank_int(new, n_iter=3, init_ranks=prior))
    cold3 = _ranks(graph.pagerank_int(new, n_iter=3))
    err_warm = sum(abs(warm3[n] - target[n]) for n in target)
    err_cold = sum(abs(cold3[n] - target[n]) for n in target)
    assert err_warm < err_cold
