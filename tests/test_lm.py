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
