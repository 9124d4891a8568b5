"""Corpus-LM perplexity quality gates — the CCNet lane (operators/lm.py).

CCNet scores crawl text by perplexity under a reference-domain LM and
buckets each language's documents into head/middle/tail quality
tertiles. Here the reference domain is the src0/src1 slice of the
documents table (the "Wikipedia" stand-in), the model is the unigram
count table, and every log is the exact integer milli-bit ladder — so
the per-doc cross-entropies and the tertile assignments hash-compare
bit-for-bit against the DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import cleaning, lm
from ..operators.cleaning import tokens_sql
from ..tables import load_table
from .registry import register

#: the reference-domain ("clean corpus") slice the unigram LM trains on
_REF_SOURCES = ("src0", "src1")
_REF_PRED_SQL = "source IN ('src0', 'src1')"

_MODEL_CTE = f"""
lm_model AS (
  {lm.unigram_counts_sql(tokens_sql("text"),
                         f"(SELECT * FROM documents WHERE {_REF_PRED_SQL})")}
)"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", cleaning.tokens(F.col("text")).alias("toks")
    )
    model = lm.unigram_counts(
        docs.filter(F.col("source").isin(*_REF_SOURCES)), "toks"
    )
    return lm.cross_entropy_milli(
        docs, "doc_id", "toks", model, keep_cols=["lang"]
    )


@register(
    "lm_perplexity_report",
    doc="CCNet-style quality scoring: per-doc cross-entropy (exact "
    "integer milli-bits) under a unigram LM trained on the src0/src1 "
    "reference slice — add-one smoothing, OOV scored at c=0, the "
    "fractional log2 from a 256-entry integer ladder shared verbatim "
    "by both engines. One corpus scan: explode -> broadcast model "
    "join -> keyed aggregation; the smoothing denominator is a 1-row "
    "broadcast. The 100 TB shape of the reference's per-doc "
    "LLM-judge quality stage.",
    oracle=f"""
WITH {_MODEL_CTE},
{lm.cross_entropy_sql(tokens_sql("text"), "doc_id", "documents",
                      "lm_model", keep_cols=["lang"])}
SELECT _id AS doc_id, lang, n_toks, xent_milli FROM lm_xent
""",
)
def lm_perplexity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scored(spark, sf_dir).select(
        "doc_id", "lang", "n_toks", "xent_milli"
    )


@register(
    "ccnet_quality_buckets",
    doc="CCNet head/middle/tail bucketing: per-language perplexity "
    "tertiles (ntile(3) over the total order (xent_milli, doc_id)) "
    "with per-bucket counts and the xent band — the thresholds a "
    "100 TB crawl build uses to keep the head, down-weight the "
    "middle, and drop the tail of each language.",
    oracle=f"""
WITH {_MODEL_CTE},
{lm.cross_entropy_sql(tokens_sql("text"), "doc_id", "documents",
                      "lm_model", keep_cols=["lang"])},
{lm.ccnet_buckets_sql("lm_xent")}
""",
)
def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm.ccnet_buckets(_scored(spark, sf_dir))


_BI_MODEL_CTE = f"""
bg_model AS (
  {lm.bigram_counts_sql(tokens_sql("text"),
                        f"(SELECT * FROM documents WHERE {_REF_PRED_SQL})")}
)"""


def _bi_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", cleaning.tokens(F.col("text")).alias("toks")
    )
    bi = lm.bigram_counts(
        docs.filter(F.col("source").isin(*_REF_SOURCES)), "toks"
    )
    return lm.bigram_cross_entropy_milli(
        docs, "doc_id", "toks", bi, keep_cols=["lang"]
    )


@register(
    "lm_bigram_report",
    doc="Sequence-aware CCNet scoring (order=2): per-doc cross-entropy "
    "in exact integer milli-bits under a Jelinek-Mercer interpolated "
    "BIGRAM LM (lambda=3/4 rational, 2^20 fixed-point mixture, the "
    "shared log2 ladder) trained on the src0/src1 reference slice — "
    "CCNet's actual scorer is a 5-gram KenLM; conditioning on the "
    "previous token penalizes improbable sequences of individually-"
    "common tokens, which the unigram lane cannot see. One pair "
    "explode -> broadcast model joins -> keyed aggregation.",
    oracle=f"""
WITH {_BI_MODEL_CTE},
{lm.bigram_cross_entropy_sql(tokens_sql("text"), "doc_id", "documents",
                             "bg_model", keep_cols=["lang"])}
SELECT _id AS doc_id, lang, n_bigrams, xent_milli FROM bg_xent
""",
)
def lm_bigram_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bi_scored(spark, sf_dir).select(
        "doc_id", "lang", "n_bigrams", "xent_milli"
    )


@register(
    "ccnet_bigram_buckets",
    doc="CCNet head/middle/tail bucketing under the interpolated "
    "bigram LM: per-language perplexity tertiles over the sequence-"
    "aware xent_milli (keyed ntile window, no global sort) with "
    "per-bucket counts and the xent band — the order-2 twin of "
    "ccnet_quality_buckets, one step closer to the production 5-gram "
    "KenLM thresholds.",
    oracle=f"""
WITH {_BI_MODEL_CTE},
{lm.bigram_cross_entropy_sql(tokens_sql("text"), "doc_id", "documents",
                             "bg_model", keep_cols=["lang"])},
{lm.ccnet_buckets_sql("bg_xent")}
""",
)
def ccnet_bigram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm.ccnet_buckets(_bi_scored(spark, sf_dir))


_TRI_MODEL_CTE = f"""
tg_model AS (
  {lm.trigram_counts_sql(tokens_sql("text"),
                         f"(SELECT * FROM documents WHERE {_REF_PRED_SQL})")}
)"""


@register(
    "ccnet_trigram_buckets",
    doc="CCNet head/middle/tail bucketing under a THREE-way "
    "Jelinek-Mercer interpolated trigram LM ((8,5,3)/16 rational "
    "weights, 2^20 fixed-point mixture, every marginal derived from "
    "the one trigram table, the shared log2 ladder) — the order-3 "
    "step toward the production 5-gram KenLM. Per-language tertiles "
    "over the per-doc exact milli-bit xent; keyed ntile window, no "
    "global sort.",
    oracle=f"""
WITH {_TRI_MODEL_CTE},
{lm.trigram_cross_entropy_sql(tokens_sql("text"), "doc_id", "documents",
                              "tg_model", keep_cols=["lang"])},
{lm.ccnet_buckets_sql("tg_xent")}
""",
)
def ccnet_trigram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", cleaning.tokens(F.col("text")).alias("toks")
    )
    tri = lm.trigram_counts(
        docs.filter(F.col("source").isin(*_REF_SOURCES)), "toks"
    )
    scored = lm.trigram_cross_entropy_milli(
        docs, "doc_id", "toks", tri, keep_cols=["lang"]
    )
    return lm.ccnet_buckets(scored)


@register(
    "ccnet_head_selection",
    doc="The CCNet bucketing APPLIED as corpus selection: keep each "
    "language's perplexity head (tertile 1 — closest to the reference "
    "domain), emitting the per-doc rows a corpus build consumes "
    "(doc_id, lang, n_toks, xent_milli). Same exact-integer scoring "
    "chain, one keyed ntile window, no global sort.",
    oracle=f"""
WITH {_MODEL_CTE},
{lm.cross_entropy_sql(tokens_sql("text"), "doc_id", "documents",
                      "lm_model", keep_cols=["lang"])},
bucketed AS (
  SELECT _id AS doc_id, lang, n_toks, xent_milli,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY xent_milli, _id) AS bucket
  FROM lm_xent
)
SELECT doc_id, lang, n_toks, xent_milli FROM bucketed WHERE bucket = 1
""",
)
def ccnet_head_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("xent_milli", "doc_id")
    return (
        scored.withColumn("bucket", F.ntile(3).over(w))
        .filter(F.col("bucket") == 1)
        .select("doc_id", "lang", "n_toks", "xent_milli")
    )


# ---------------------------------------------------------------------------
# Pretrained-model scoring via the ARPA interchange format: the gate
# round-trips a model through the REAL text format (render → parse_arpa
# → broadcast tables → Katz scoring) while the oracle consumes the SAME
# numbers as VALUES literals — so the hash-compare verifies the parser
# AND the distributed backoff arithmetic in one shot. The model is a
# deliberately tiny corpus-vocabulary bigram LM; production swaps in a
# real KenLM-exported ARPA file with zero code changes.

_ARPA_UNI = [
    ("table", -500, -300),
    ("value", -700, -150),
    ("row", -900, -250),
    ("key", -1100, 0),
    ("a", -1300, -100),
    ("<unk>", -2500, 0),
]
_ARPA_BI = [
    ("table", "value", -250),
    ("value", "row", -400),
    ("row", "key", -550),
    ("key", "table", -300),
    ("a", "table", -350),
]


def _arpa_text() -> str:
    lines = ["\\data\\", f"ngram 1={len(_ARPA_UNI)}", f"ngram 2={len(_ARPA_BI)}", ""]
    lines.append("\\1-grams:")
    for w, lp, bo in _ARPA_UNI:
        lines.append(f"{lp / 1000:.3f}\t{w}\t{bo / 1000:.3f}")
    lines.append("")
    lines.append("\\2-grams:")
    for w1, w2, lp in _ARPA_BI:
        lines.append(f"{lp / 1000:.3f}\t{w1} {w2}")
    lines += ["", "\\end\\", ""]
    return "\n".join(lines)


_ARPA_UNI_SQL = ", ".join(f"('{w}', {lp}, {bo})" for w, lp, bo in _ARPA_UNI)
_ARPA_BI_SQL = ", ".join(f"('{a}', '{b}', {lp})" for a, b, lp in _ARPA_BI)


@register(
    "arpa_bigram_scores",
    doc="Pretrained-LM corpus scoring through the ARPA interchange "
    "format (KenLM's export): the model text is parsed by parse_arpa "
    "(probabilities quantized to integer milli-log10 at parse time), "
    "loaded as broadcastable unigram/bigram tables, and every "
    "document scored with the standard Katz backoff rule — listed "
    "bigram prob, else backoff(w1) + P1(w2), <unk> for OOV — as one "
    "pair explode + three broadcast joins + one keyed agg. The "
    "oracle consumes the same model as VALUES literals, so the hash "
    "compare verifies the parser and the distributed backoff "
    "arithmetic together.",
    oracle=f"""
WITH ar_uni(w, logp_milli, bo_milli) AS (VALUES {_ARPA_UNI_SQL}),
ar_bi(w1, w2, logp_milli) AS (VALUES {_ARPA_BI_SQL}),
{lm.arpa_bigram_logprob_sql(tokens_sql("text"), "doc_id", "documents",
                            "ar_uni", "ar_bi", keep_cols=["lang"]).lstrip()}
SELECT _id AS doc_id, lang, n_bigrams, nll10_milli FROM ar_xent
""",
)
def arpa_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = lm.parse_arpa(_arpa_text())
    uni, bi = lm.arpa_bigram_tables(spark, parsed)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", cleaning.tokens(F.col("text")).alias("toks")
    )
    return lm.arpa_bigram_logprob_milli(
        docs, "doc_id", "toks", uni, bi, keep_cols=["lang"]
    ).select("doc_id", "lang", "n_bigrams", "nll10_milli")


# ---------------------------------------------------------------------------
# Arbitrary-order ARPA scoring — the real CCNet shape (Wenzek et al.
# 2020 §3 filters with 5-GRAM KenLM exports). The fixture model is a
# 5-gram ARPA file whose deeper entries are real corpus n-grams, so at
# sf0.01 every cascade level — full 5-gram hit, each backoff depth,
# and the <unk> floor — is exercised and hash-compared. Some backoff
# weights are deliberately POSITIVE (real KenLM exports carry them) to
# pin the ≤0 clamp in both engines.

_ARPA5 = {
    1: [
        ("table", -500, -300), ("value", -700, -150), ("row", -900, -250),
        ("key", -1100, 0), ("a", -1300, -100), ("hash", -800, -200),
        ("part", -750, -180), ("filter", -950, -220), ("scan", -850, -160),
        ("merge", -1000, -240), ("group", -900, -190), ("slow", -1050, -130),
        ("batch", -950, -170), ("column", -1000, -210), ("sort", -1100, -140),
        ("the", -600, -110), ("<unk>", -2500, 0),
        # sentence markers, KenLM-style: <s> carries the placeholder
        # prob (never predicted) but a REAL backoff weight; </s> is a
        # normally-predicted event
        ("<s>", -99000, -60), ("</s>", -700, 0),
    ],
    2: [
        ("table hash", -250, -120), ("part filter", -300, -140),
        ("merge group", -280, 120), ("slow hash", -350, -160),
        ("row value", -400, -100), ("scan row", -320, -130),
        ("group part", -290, -150), ("filter scan", -310, -110),
        ("<s> merge", -290, -70), ("value </s>", -310, 0),
        ("<s> <s>", -98000, -80),
    ],
    3: [
        ("slow hash batch", -200, -90), ("part filter scan", -220, -80),
        ("merge group part", -210, 70), ("scan row value", -230, -95),
        ("group part scan", -240, -85), ("<s> <s> merge", -240, -60),
    ],
    4: [
        ("merge group part scan", -150, -60),
        ("group part scan row", -160, 50),
        ("part scan row value", -170, -70),
    ],
    5: [
        ("merge group part scan row", -100, 0),
        ("group part scan row value", -110, 0),
        ("part scan row value column", -120, 0),
    ],
}


def _arpa5_text() -> str:
    lines = ["\\data\\"]
    lines += [f"ngram {n}={len(rows)}" for n, rows in sorted(_ARPA5.items())]
    for n, rows in sorted(_ARPA5.items()):
        lines += ["", f"\\{n}-grams:"]
        for gram, lp, bo in rows:
            if bo:
                lines.append(f"{lp / 1000:.3f}\t{gram}\t{bo / 1000:.3f}")
            else:
                lines.append(f"{lp / 1000:.3f}\t{gram}")
    lines += ["", "\\end\\", ""]
    return "\n".join(lines)


_ARPA5_CTES = ",\n".join(
    f"g{n}(gram, logp_milli, bo_milli) AS (VALUES "
    + ", ".join(f"('{g}', {lp}, {bo})" for g, lp, bo in rows)
    + ")"
    for n, rows in sorted(_ARPA5.items())
)


@register(
    "arpa_5gram_scores",
    doc="Pretrained 5-gram LM scoring through the ARPA interchange "
    "format — the real CCNet shape (Wenzek et al. 2020 filter with "
    "5-gram KenLM exports): the model text round-trips through "
    "parse_arpa, loads as five broadcastable gram tables, and every "
    "full-width token window is scored with the "
    "longest-listed-suffix Katz rule — one window explode + nine "
    "broadcast joins + one keyed agg; per-window logp clamped at <=0 "
    "(real exports carry positive backoffs) so trunc-div and "
    "floor-div agree. The oracle consumes the same model as VALUES "
    "literals, so the hash compare verifies the parser and the "
    "arbitrary-order distributed backoff cascade together.",
    oracle=f"""
WITH {_ARPA5_CTES},
{{chain}}
SELECT _id AS doc_id, lang, n_ngrams, nll10_milli FROM arn_xent
""".format(
        chain=lm.arpa_ngram_logprob_sql(
            tokens_sql("text"), "doc_id", "documents",
            {n: f"g{n}" for n in range(1, 6)}, 5, keep_cols=["lang"],
        ).lstrip()
    ),
)
def arpa_5gram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = lm.parse_arpa(_arpa5_text())
    tables = lm.arpa_tables(spark, parsed)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", cleaning.tokens(F.col("text")).alias("toks")
    )
    return lm.arpa_ngram_logprob_milli(
        docs, "doc_id", "toks", tables, keep_cols=["lang"]
    ).select("doc_id", "lang", "n_ngrams", "nll10_milli")


@register(
    "ccnet_arpa_buckets",
    doc="CCNet head/middle/tail bucketing under the PRETRAINED 5-gram "
    "ARPA model — the production CCNet configuration (per-language "
    "perplexity tertiles under a KenLM export) expressed through the "
    "same shared bucketing builder as the unigram/bigram/trigram "
    "lanes: ccnet_buckets(order=1|2|3|arpa) is one operator with the "
    "scorer injected. The min/max band columns keep the shared "
    "xent_milli report names whatever the scorer's unit (here "
    "milli-log10 NLL).",
    oracle=f"""
WITH {_ARPA5_CTES},
{{chain}},
{{buckets}}
""".format(
        chain=lm.arpa_ngram_logprob_sql(
            tokens_sql("text"), "doc_id", "documents",
            {n: f"g{n}" for n in range(1, 6)}, 5, keep_cols=["lang"],
        ).lstrip(),
        buckets=lm.ccnet_buckets_sql("arn_xent", xent_col="nll10_milli"),
    ),
)
def ccnet_arpa_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = lm.parse_arpa(_arpa5_text())
    tables = lm.arpa_tables(spark, parsed)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", cleaning.tokens(F.col("text")).alias("toks")
    )
    scored = lm.arpa_ngram_logprob_milli(
        docs, "doc_id", "toks", tables, keep_cols=["lang"]
    )
    return lm.ccnet_buckets(scored, xent_col="nll10_milli")


@register(
    "arpa_5gram_scores_bos",
    doc="KenLM-exact sentence-bounded 5-gram scoring: the token array "
    "is framed with four leading <s> markers and a trailing </s> "
    "before windowing, so every real token PLUS the end transition is "
    "scored under the pretrained ARPA model — n_ngrams = len + 1, "
    "matching kenlm.Model.score(text, bos=True, eos=True) window for "
    "window (the unpadded gate skips the first order-1 positions). "
    "Same Katz cascade, same scoring plan (inline literal maps for "
    "this small pinned model); the padding is a pure projection.",
    oracle=f"""
WITH {_ARPA5_CTES},
{{chain}}
SELECT _id AS doc_id, lang, n_ngrams, nll10_milli FROM arn_xent
""".format(
        chain=lm.arpa_ngram_logprob_sql(
            lm.sentence_bounds_sql(tokens_sql("text"), 5),
            "doc_id", "documents",
            {n: f"g{n}" for n in range(1, 6)}, 5, keep_cols=["lang"],
        ).lstrip()
    ),
)
def arpa_5gram_scores_bos(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = lm.parse_arpa(_arpa5_text())
    tables = lm.arpa_tables(spark, parsed)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang",
        lm.with_sentence_bounds(
            cleaning.tokens(F.col("text")), 5
        ).alias("toks"),
    )
    return lm.arpa_ngram_logprob_milli(
        docs, "doc_id", "toks", tables, keep_cols=["lang"]
    ).select("doc_id", "lang", "n_ngrams", "nll10_milli")
