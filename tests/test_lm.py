"""Unit pins for operators/lm.py — the exact-integer log2 ladder and
the empty-reference-model guard (r12 ADVICE items)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import lm

#: sample points spanning the full positive int64 domain, including
#: the >= 2^55 region where the old ``n * 256`` pre-multiply wrapped
#: in Spark (ANSI off) while DuckDB raised — the r12 engine-divergence
#: advice item.
SAMPLES = [
    1, 2, 3, 255, 256, 257, 1023, 65537,
    (1 << 40) + 12345,
    (1 << 54) - 1, 1 << 55, (1 << 55) + 99,
    (1 << 62) + 7, (1 << 63) - 1,
]


def _expected_milli(n: int) -> int:
    """The ladder's defined value: (bitlen-1)*1000 + table[top 8
    mantissa bits] — recomputed independently in plain Python."""
    bl = n.bit_length()
    k = (n >> (bl - 9)) if bl >= 9 else (n << (9 - bl))
    return (bl - 1) * 1000 + lm.LOG2_TABLE_MILLI[k - 256]


def test_log2_milli_spark_full_int64_domain(spark):
    df = spark.createDataFrame([(n,) for n in SAMPLES], "n bigint")
    got = {
        r["n"]: r["m"]
        for r in df.select("n", lm.log2_milli(F.col("n")).alias("m")).collect()
    }
    for n in SAMPLES:
        assert got[n] == _expected_milli(n), n
        # and the ladder is a genuine log2 within its 8-bit quantization
        assert abs(got[n] / 1000.0 - math.log2(n)) < 0.006, n


def test_log2_milli_sql_twin_matches_everywhere():
    con = duckdb.connect()
    for n in SAMPLES:
        (got,) = con.sql(
            f"SELECT {lm.log2_milli_sql(str(n))}"
        ).fetchone()
        assert got == _expected_milli(n), n


def test_empty_reference_model_fails_loud_spark(spark):
    docs = spark.createDataFrame(
        [("d1", ["a", "b"])], "doc_id string, toks array<string>"
    )
    empty_model = spark.createDataFrame([], "tok string, c bigint")
    out = lm.cross_entropy_milli(docs, "doc_id", "toks", empty_model)
    with pytest.raises(Exception, match="reference model is empty"):
        out.collect()


def test_empty_reference_model_fails_loud_duckdb():
    con = duckdb.connect()
    sql = (
        "WITH lm_model AS (SELECT 'x' AS tok, 1::BIGINT AS c WHERE false),\n"
        + lm.cross_entropy_sql(
            "string_split(txt, ' ')", "doc_id", "docs", "lm_model"
        )
        + "\nSELECT * FROM lm_xent"
    )
    con.sql("CREATE TABLE docs AS SELECT 'd1' AS doc_id, 'a b' AS txt")
    with pytest.raises(Exception, match="reference model is empty"):
        con.sql(sql).fetchall()


def test_bigram_lane_drops_sub_two_token_docs(spark):
    docs = spark.createDataFrame(
        [("d1", ["a", "b", "a", "b"]), ("d2", ["solo"]), ("d3", [])],
        "doc_id string, toks array<string>",
    )
    bi = lm.bigram_counts(docs, "toks")
    out = lm.bigram_cross_entropy_milli(docs, "doc_id", "toks", bi)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {"d1"}
    assert rows["d1"]["n_bigrams"] == 3
    # in-model pairs under lambda=3/4: a->b has c_bi=2,c_w1=2 (q1=2^20),
    # b->a has c_bi=1,c_w1=1; N=3, c_w2(b)=2, c_w2(a)=1
    q2_b = (2 * lm.FP_ONE) // 3
    q2_a = (1 * lm.FP_ONE) // 3
    m_ab = (3 * lm.FP_ONE + q2_b) // 4
    m_ba = (3 * lm.FP_ONE + q2_a) // 4
    expected = (
        2 * (20000 - _expected_milli(m_ab)) + (20000 - _expected_milli(m_ba))
    ) // 3
    assert rows["d1"]["xent_milli"] == expected


def test_empty_bigram_model_fails_loud_spark(spark):
    docs = spark.createDataFrame(
        [("d1", ["a", "b"])], "doc_id string, toks array<string>"
    )
    empty = spark.createDataFrame([], "_w1 string, _w2 string, c_bi bigint")
    out = lm.bigram_cross_entropy_milli(docs, "doc_id", "toks", empty)
    with pytest.raises(Exception, match="bigram reference model is empty"):
        out.collect()


def test_kenlm_adapter_is_import_gated():
    with pytest.raises(NotImplementedError, match="kenlm is not installed"):
        lm.kenlm_scorer("/nonexistent/model.arpa")


def test_score_perplexity_with_fake_scorer_plumbing(spark):
    """The mapInPandas plumbing for the real-model lane, exercised with
    a deterministic fake: score = -len(text). Batch-shape invariant by
    construction; asserts schema, row alignment, and that the scorer
    saw genuine batches."""
    docs = spark.createDataFrame(
        [(f"d{i}", "x" * (i + 1)) for i in range(10)],
        "doc_id string, text string",
    ).repartition(3)

    def fake(texts):
        assert isinstance(texts, list)
        return [-float(len(t)) for t in texts]

    out = lm.score_perplexity_with(docs, "doc_id", "text", fake, batch_size=4)
    assert out.columns == ["doc_id", "lm_score"]
    got = {r["doc_id"]: r["lm_score"] for r in out.collect()}
    assert got == {f"d{i}": -float(i + 1) for i in range(10)}


def test_trigram_lane_closed_form_pin(spark):
    """Hand-computed xent for a 5-token doc under its own trigram
    model: triples (a,b,a) x2 + (b,a,b); all marginals derived from
    the trigram table; (8,5,3)/16 mixture at 2^20 fixed point."""
    docs = spark.createDataFrame(
        [("d1", ["a", "b", "a", "b", "a"]), ("d2", ["x", "y"]), ("d3", [])],
        "doc_id string, toks array<string>",
    )
    tri = lm.trigram_counts(docs, "toks")
    out = lm.trigram_cross_entropy_milli(docs, "doc_id", "toks", tri)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {"d1"}  # sub-3-token docs dropped
    assert rows["d1"]["n_trigrams"] == 3
    FP = lm.FP_ONE
    # (a,b,a): q3 = (2*FP)//2, q2 = bi23(b,a)=2 over ctx1(b)=2,
    #          q1 = uni3(a)=2 over N=3
    m1 = (8 * FP + 5 * FP + 3 * ((2 * FP) // 3)) // 16
    # (b,a,b): q3 = (1*FP)//1, q2 = bi23(a,b)=1 over ctx1(a)=1,
    #          q1 = uni3(b)=1 over N=3
    m2 = (8 * FP + 5 * FP + 3 * (FP // 3)) // 16
    bits = lambda m: 20000 - _expected_milli(m)  # noqa: E731
    assert rows["d1"]["xent_milli"] == (2 * bits(m1) + bits(m2)) // 3


def test_empty_trigram_model_fails_loud_both_engines(spark):
    docs = spark.createDataFrame(
        [("d1", ["a", "b", "c"])], "doc_id string, toks array<string>"
    )
    empty = spark.createDataFrame(
        [], "_w1 string, _w2 string, _w3 string, c_tri bigint"
    )
    out = lm.trigram_cross_entropy_milli(docs, "doc_id", "toks", empty)
    with pytest.raises(Exception, match="trigram reference model is empty"):
        out.collect()
    con = duckdb.connect()
    con.sql("CREATE TABLE docs AS SELECT 'd1' AS doc_id, 'a b c' AS txt")
    sql = (
        "WITH tg AS (SELECT 'x' AS _w1, 'x' AS _w2, 'x' AS _w3, "
        "1::BIGINT AS c_tri WHERE false),\n"
        + lm.trigram_cross_entropy_sql(
            "string_split(txt, ' ')", "doc_id", "docs", "tg"
        )
        + "\nSELECT * FROM tg_xent"
    )
    with pytest.raises(Exception, match="trigram reference model is empty"):
        con.sql(sql).fetchall()


def test_parse_arpa_format_and_quantization():
    text = (
        "\\data\\\nngram 1=3\nngram 2=2\n\n"
        "\\1-grams:\n-0.5\tthe\t-0.3\n-1.0\ta\n-2.0\t<unk>\n\n"
        "\\2-grams:\n-0.2\tthe a\n-0.9\ta the\n\n\\end\\\n"
    )
    p = lm.parse_arpa(text)
    assert p[1] == [("the", -500, -300), ("a", -1000, 0), ("<unk>", -2000, 0)]
    assert p[2] == [("the", "a", -200, 0), ("a", "the", -900, 0)]
    with pytest.raises(ValueError, match="malformed"):
        lm.parse_arpa("\\data\\\nbogus\n\\end\\")
    with pytest.raises(ValueError, match="before any section"):
        lm.parse_arpa("just some text")
    with pytest.raises(ValueError, match="no n-gram sections"):
        lm.parse_arpa("")


def test_arpa_katz_backoff_closed_form(spark):
    """Hand-computed Katz scoring: listed bigram; backoff w/ explicit
    weight; backoff w/ absent weight; OOV w2 -> <unk>."""
    uni = spark.createDataFrame(
        [("the", -500, -300), ("a", -1000, 0), ("cat", -1500, -100),
         ("<unk>", -2000, 0)],
        "w string, logp_milli bigint, bo_milli bigint",
    )
    bi = spark.createDataFrame(
        [("the", "a", -200)], "w1 string, w2 string, logp_milli bigint"
    )
    docs = spark.createDataFrame(
        [("d1", ["the", "a", "cat", "zzz", "the"])],
        "doc_id string, toks array<string>",
    )
    out = lm.arpa_bigram_logprob_milli(docs, "doc_id", "toks", uni, bi)
    row = out.collect()[0]
    # pairs: (the,a) listed -200; (a,cat) backoff(a)=0 + P1(cat)=-1500;
    # (cat,zzz) backoff(cat)=-100 + unk -2000; (zzz,the) backoff absent
    # (zzz not in uni) = 0 + P1(the) = -500
    total = -200 + (0 - 1500) + (-100 - 2000) + (0 - 500)
    assert row["n_bigrams"] == 4
    assert row["nll10_milli"] == (-total) // 4


def test_parse_arpa_validates_declared_counts_and_end_marker():
    """A model truncated at a clean row boundary (section shorter than
    its \\data\\ declaration) or missing \\end\\ must fail loud (r13
    ADVICE): a partial model would silently score garbage."""
    ok = (
        "\\data\\\nngram 1=2\nngram 2=1\n\n"
        "\\1-grams:\n-0.5\tthe\t-0.3\n-2.0\t<unk>\n\n"
        "\\2-grams:\n-0.2\tthe the\n\n\\end\\\n"
    )
    assert lm.parse_arpa(ok)[2] == [("the", "the", -200, 0)]
    short = ok.replace("ngram 2=1", "ngram 2=2")
    with pytest.raises(ValueError, match="declares 2 2-grams"):
        lm.parse_arpa(short)
    no_end = ok.replace("\\end\\\n", "")
    with pytest.raises(ValueError, match="missing .end."):
        lm.parse_arpa(no_end)
    undeclared = ok.replace("ngram 2=1\n", "")
    with pytest.raises(ValueError, match="undeclared"):
        lm.parse_arpa(undeclared)


def _py_katz(window, tables, unk):
    """Reference longest-listed-suffix Katz scorer (plain Python)."""
    n = len(window)
    for k in range(n, 0, -1):
        gram = " ".join(window[n - k:])
        if gram in tables[k]:
            lp = tables[k][gram][0]
            break
    else:
        k, lp = 1, unk
    if k == 1 and " ".join(window[n - 1:]) not in tables[1]:
        lp = unk
    for j in range(k, n):
        ctx = " ".join(window[n - 1 - j: n - 1])
        lp += tables[j].get(ctx, (0, 0))[1]
    return min(lp, 0)


def test_arpa_ngram_cascade_closed_form(spark):
    """Order-4 Katz cascade against a plain-Python reference scorer on
    windows engineered to hit EVERY level: full 4-gram, 3-gram +
    bo3, 2-gram + bo3 + bo2, 1-gram + all backoffs, and the <unk>
    floor — plus a POSITIVE backoff that pushes one window's logp
    above 0 to pin the <=0 clamp."""
    model = {
        1: {"a": (-400, -100), "b": (-600, -200), "c": (-800, 300),
            "d": (-500, -50), "<unk>": (-2000, 0)},
        2: {"a b": (-300, -80), "b c": (-350, 90), "c d": (-320, -60)},
        3: {"a b c": (-250, -40), "b c d": (-260, 2500)},
        4: {"a b c d": (-150, 0)},
    }
    tables = {
        n: spark.createDataFrame(
            [(g, lp, bo) for g, (lp, bo) in rows.items()],
            "gram string, logp_milli bigint, bo_milli bigint",
        )
        for n, rows in model.items()
    }
    docs = spark.createDataFrame(
        [
            ("full", ["a", "b", "c", "d"]),      # 4-gram listed
            ("back3", ["d", "b", "c", "d"]),     # suffix "b c d" at k=3
            ("back2", ["d", "d", "c", "d"]),     # suffix "c d" at k=2
            ("back1", ["d", "d", "d", "a"]),     # unigram "a" at k=1
            ("unk", ["d", "d", "d", "zzz"]),     # OOV floor
            # "b c d" carries bo=+2500: the window (x, b, c, d) whose
            # 4-gram misses but suffix hits at k=3 stays NEGATIVE, while
            # a deeper backoff chain crossing it can go positive -> clamp
            ("clamp", ["b", "c", "d", "c"]),     # suffix "c" (+bo chain)
        ],
        "doc_id string, toks array<string>",
    )
    out = {
        r["doc_id"]: (r["n_ngrams"], r["nll10_milli"])
        for r in lm.arpa_ngram_logprob_milli(
            docs, "doc_id", "toks", tables, order=4
        ).collect()
    }
    pys = {"full": ["a", "b", "c", "d"], "back3": ["d", "b", "c", "d"],
           "back2": ["d", "d", "c", "d"], "back1": ["d", "d", "d", "a"],
           "unk": ["d", "d", "d", "zzz"], "clamp": ["b", "c", "d", "c"]}
    py_tables = {n: dict(rows) for n, rows in model.items()}
    for name, win in pys.items():
        expect = _py_katz(win, py_tables, -2000)
        assert out[name] == (1, -expect), name
    # the clamp case really exercised the clamp: unclamped it is > 0
    # (suffix "c" P1=-800 + bo3("b c d")=+2500 + bo2("c d")=-60 +
    #  bo1("d")=-50 = +1590)
    assert out["clamp"] == (1, 0)
    # docs shorter than the order are dropped
    short = spark.createDataFrame(
        [("s", ["a", "b", "c"])], "doc_id string, toks array<string>"
    )
    assert (
        lm.arpa_ngram_logprob_milli(
            short, "doc_id", "toks", tables, order=4
        ).count()
        == 0
    )


def test_arpa_ngram_matches_bigram_lane_at_order_2(spark):
    """The arbitrary-order cascade at order=2 must reproduce the
    dedicated bigram lane bit-for-bit on the same model (the bigram
    scorer is the order-2 special case)."""
    uni = spark.createDataFrame(
        [("the", -500, -300), ("a", -1000, 0), ("cat", -1500, -100),
         ("<unk>", -2000, 0)],
        "w string, logp_milli bigint, bo_milli bigint",
    )
    bi = spark.createDataFrame(
        [("the", "a", -200)], "w1 string, w2 string, logp_milli bigint"
    )
    docs = spark.createDataFrame(
        [("d1", ["the", "a", "cat", "zzz", "the"]),
         ("d2", ["a", "the", "a", "a"])],
        "doc_id string, toks array<string>",
    )
    old = {
        r["doc_id"]: (r["n_bigrams"], r["nll10_milli"])
        for r in lm.arpa_bigram_logprob_milli(
            docs, "doc_id", "toks", uni, bi
        ).collect()
    }
    tables = {
        1: uni.select(F.col("w").alias("gram"), "logp_milli", "bo_milli"),
        2: bi.select(
            F.concat_ws(" ", "w1", "w2").alias("gram"),
            "logp_milli",
            F.lit(0).cast("bigint").alias("bo_milli"),
        ),
    }
    new = {
        r["doc_id"]: (r["n_ngrams"], r["nll10_milli"])
        for r in lm.arpa_ngram_logprob_milli(
            docs, "doc_id", "toks", tables, order=2
        ).collect()
    }
    assert old == new


def test_arpa_tables_rejects_non_contiguous_orders(spark):
    with pytest.raises(ValueError, match="non-contiguous"):
        lm.arpa_tables(spark, {1: [("a", -1, 0)], 3: [("a b c", -1, 0)]})


def test_arpa_inline_and_join_paths_agree(spark):
    """The r14 inline-literal-map fast path (small models from
    arpa_tables, zero broadcast exchanges) must reproduce the
    broadcast-join path bit-for-bit — every cascade level, the <unk>
    floor and the <=0 clamp included. The join path is forced by
    stripping the parsed-rows attachment (a plain dict of the same
    DataFrames, the hand-built-caller shape)."""
    parsed = {
        1: [("a", -400, -100), ("b", -600, -200), ("c", -800, 300),
            ("d", -500, -50), ("<unk>", -2000, 0)],
        2: [("a", "b", -300, -80), ("b", "c", -350, 90),
            ("c", "d", -320, -60)],
        3: [("a", "b", "c", -250, -40), ("b", "c", "d", -260, 2500)],
        4: [("a", "b", "c", "d", -150, 0)],
    }
    tables = lm.arpa_tables(spark, parsed)
    assert tables.parsed is parsed  # inline path eligible
    plain = dict(tables)  # no .parsed -> join path
    docs = spark.createDataFrame(
        [
            ("full", ["a", "b", "c", "d"]),
            ("back3", ["d", "b", "c", "d"]),
            ("back2", ["d", "d", "c", "d"]),
            ("back1", ["d", "d", "d", "a"]),
            ("unk", ["d", "d", "d", "zzz"]),
            ("clamp", ["b", "c", "d", "c"]),
            ("multi", ["a", "b", "c", "d", "c", "d"]),
        ],
        "doc_id string, toks array<string>",
    )
    via_inline = sorted(
        map(tuple, lm.arpa_ngram_logprob_milli(
            docs, "doc_id", "toks", tables, order=4).collect())
    )
    via_join = sorted(
        map(tuple, lm.arpa_ngram_logprob_milli(
            docs, "doc_id", "toks", plain, order=4).collect())
    )
    assert via_inline == via_join
    # the inline plan really is join-free; the join plan really joins
    inline_plan = lm.arpa_ngram_logprob_milli(
        docs, "doc_id", "toks", tables, order=4
    )._jdf.queryExecution().executedPlan().toString()
    join_plan = lm.arpa_ngram_logprob_milli(
        docs, "doc_id", "toks", plain, order=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in inline_plan
    assert "BroadcastHashJoin" in join_plan


def test_arpa_inline_falls_back_on_duplicate_keys(spark):
    """A model with duplicate grams at one order keeps the left-join
    semantics (row duplication) instead of silently deduping through a
    map literal."""
    parsed = {
        1: [("a", -400, 0), ("a", -900, 0), ("<unk>", -2000, 0)],
        2: [("a", "a", -100, 0)],
    }
    tables = lm.arpa_tables(spark, parsed)
    docs = spark.createDataFrame(
        [("x", ["a", "b"])], "doc_id string, toks array<string>"
    )
    out = lm.arpa_ngram_logprob_milli(docs, "doc_id", "toks", tables, order=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fell back to the join path
    # the duplicated unigram "a" context row duplicates the window,
    # exactly as the raw left join always did
    assert out.collect()[0]["n_ngrams"] == 2


def test_arpa_bigram_inline_and_join_paths_agree(spark):
    """The order-2 lane's r15 inline path (small models from
    arpa_bigram_tables → literal maps, zero broadcast exchanges) must
    reproduce the three-broadcast-join path bit-for-bit: listed
    bigram, backoff with/without bo, positive-backoff ≤0 clamp, <unk>
    floor. The join path is forced by re-selecting the frames (which
    drops the parsed-rows attachment — the hand-built-caller shape)."""
    parsed = {
        1: [("a", -400, -100), ("b", -600, -200), ("c", -800, 300),
            ("d", -500, 0), ("<unk>", -2000, 0)],
        2: [("a", "b", -300, 0), ("b", "c", -350, 0), ("c", "a", 250, 0)],
    }
    uni, bi = lm.arpa_bigram_tables(spark, parsed)
    assert uni._arpa_parsed is parsed and bi._arpa_parsed is parsed
    docs = spark.createDataFrame(
        [
            ("listed", ["a", "b", "c"]),
            ("backoff", ["b", "a", "d"]),
            ("clamp", ["c", "a", "c"]),
            ("unk", ["d", "zzz", "a"]),
            ("short", ["a"]),
        ],
        "doc_id string, toks array<string>",
    )
    via_inline = sorted(
        map(tuple, lm.arpa_bigram_logprob_milli(
            docs, "doc_id", "toks", uni, bi).collect())
    )
    via_join = sorted(
        map(tuple, lm.arpa_bigram_logprob_milli(
            docs, "doc_id", "toks", uni.select("*"), bi.select("*")
        ).collect())
    )
    assert via_inline == via_join
    assert len(via_inline) == 4  # "short" (<2 toks) dropped by both
    inline_plan = lm.arpa_bigram_logprob_milli(
        docs, "doc_id", "toks", uni, bi
    )._jdf.queryExecution().executedPlan().toString()
    join_plan = lm.arpa_bigram_logprob_milli(
        docs, "doc_id", "toks", uni.select("*"), bi.select("*")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in inline_plan
    assert "BroadcastNestedLoopJoin" not in inline_plan
    assert "BroadcastHashJoin" in join_plan


def test_arpa_bigram_inline_falls_back_on_spaced_or_duplicate_keys(spark):
    """Space-bearing model tokens would make the concat'd map key
    ambiguous against the two-column equi-join, and duplicate keys
    would dedupe through create_map where the join row-duplicates —
    both model shapes must keep the join path."""
    docs = spark.createDataFrame(
        [("x", ["a", "b"])], "doc_id string, toks array<string>"
    )
    spaced = {
        1: [("a", -400, 0), ("<unk>", -2000, 0)],
        2: [("a b", "c", -100, 0)],
    }
    uni_s, bi_s = lm.arpa_bigram_tables(spark, spaced)
    plan_s = lm.arpa_bigram_logprob_milli(
        docs, "doc_id", "toks", uni_s, bi_s
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_s
    dup = {
        1: [("a", -400, 0), ("a", -900, 0), ("<unk>", -2000, 0)],
        2: [("a", "a", -100, 0)],
    }
    uni_d, bi_d = lm.arpa_bigram_tables(spark, dup)
    out = lm.arpa_bigram_logprob_milli(docs, "doc_id", "toks", uni_d, bi_d)
    plan_d = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_d
    # the duplicated unigram "a" row-duplicates the pair, exactly as
    # the raw left join always did
    assert out.collect()[0]["n_bigrams"] == 2


def test_sentence_bounds_kenlm_framing(spark):
    """BOS/EOS framing: every real token plus the </s> transition is
    scored (n_ngrams = len + 1), the first window conditions on
    <s> markers, and an empty doc scores the single <s>...</s>
    window instead of being dropped."""
    model = {
        1: {"a": (-400, -100), "<s>": (-99000, -60), "</s>": (-700, 0),
            "<unk>": (-2000, 0)},
        2: {"<s> a": (-300, -80), "a </s>": (-350, 0), "<s> <s>": (-98000, -50)},
    }
    tables = {
        n: spark.createDataFrame(
            [(g, lp, bo) for g, (lp, bo) in rows.items()],
            "gram string, logp_milli bigint, bo_milli bigint",
        )
        for n, rows in model.items()
    }
    docs = spark.createDataFrame(
        [("one", ["a"]), ("empty", [])],
        "doc_id string, toks array<string>",
    )
    framed = docs.select(
        "doc_id", lm.with_sentence_bounds(F.col("toks"), 2).alias("toks")
    )
    out = {
        r["doc_id"]: (r["n_ngrams"], r["nll10_milli"])
        for r in lm.arpa_ngram_logprob_milli(
            framed, "doc_id", "toks", tables, order=2
        ).collect()
    }
    # "one": windows (<s>, a) listed -300; (a, </s>) listed -350
    assert out["one"] == (2, (300 + 350) // 2)
    # "empty": single window (<s>, </s>) -> backoff bo(<s>)=-60 + P1(</s>)=-700
    assert out["empty"] == (1, 760)
