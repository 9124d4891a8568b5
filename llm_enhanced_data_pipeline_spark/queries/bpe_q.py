"""BPE tokenizer queries (beyond-reference scale suite).

The trainer is iterative (argmax merge per round), so the DuckDB twin
unrolls the rounds as a generated CTE chain — the same oracle strategy
as the k-means gate. Every round's argmax uses the total order
(freq DESC, lhs ASC, rhs ASC) and the two-pass-replace merge fixpoint
documented in operators/bpe.py, so the learned merge tables agree
bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import rounding
from ..operators import bpe, cleaning
from ..operators.cleaning import tokens_sql
from ..tables import load_table
from .registry import register

_TOKS = tokens_sql("text")
ITERS = 12

# Trained-tokenizer memo, per (app, sf_dir, iters) — the single-session
# analogue of a persisted tokenizer artifact: a corpus trains its BPE
# once and every consumer (merge-table export, segmentation, token
# stats) reads the same artifact. The merges list is driver-side data;
# final_words is a lazy projection over a _persist_tracked base, so a
# dedup.release_caches() only costs a recompute, never wrong results.
_TRAINED: dict[tuple[str, str, int], tuple[list, DataFrame]] = {}


def _trained(
    spark: SparkSession,
    sf_dir: str,
    iters: int = ITERS,
    slice_n: int | None = None,
):
    key = (spark.sparkContext.applicationId, sf_dir, iters, slice_n)
    if key not in _TRAINED:
        docs = load_table(spark, "documents", sf_dir)
        if slice_n is not None:
            docs = docs.filter(F.col("doc_id") < slice_n)
        docs = docs.withColumn("toks", cleaning.tokens(F.col("text")))
        _TRAINED[key] = bpe.bpe_train(bpe.word_freqs(docs, "toks"), iters=iters)
    return _TRAINED[key]


def _bpe_ctes(iters: int = ITERS, where: str = "") -> str:
    parts = [
        f"tok AS MATERIALIZED (SELECT unnest({_TOKS}) AS word "
        f"FROM documents WHERE 1=1{where})",
        "w0 AS MATERIALIZED (SELECT word, count(*)::BIGINT AS freq, "
        f"{bpe.init_symbols_sql('word')} AS _s FROM tok GROUP BY word)",
    ]
    for i in range(iters):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT pr.l AS l, pr.r AS r, sum(freq)::BIGINT AS f
  FROM (
    SELECT freq,
           unnest(list_transform(range(1, greatest(len(_sy) - 1, 0) + 1),
                                 _i -> {{'l': _sy[_i], 'r': _sy[_i + 1]}})) AS pr
    FROM (SELECT freq, string_split(trim(_s), ' ') AS _sy FROM w{i})
  ) GROUP BY pr.l, pr.r)"""
        )
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT l, r, f FROM p{i} ORDER BY f DESC, l ASC, r ASC LIMIT 1)"
        )
        parts.append(
            f"""w{i + 1} AS MATERIALIZED (
  SELECT word, freq,
         replace(replace(_s,
             (SELECT ' ' || l || ' ' || r || ' ' FROM m{i}),
             (SELECT ' ' || l || r || ' ' FROM m{i})),
           (SELECT ' ' || l || ' ' || r || ' ' FROM m{i}),
           (SELECT ' ' || l || r || ' ' FROM m{i})) AS _s
  FROM w{i})"""
        )
    return ",\n".join(parts)


def _merges_union_sql(iters: int = ITERS) -> str:
    rows = [
        f"SELECT {i + 1}::INT AS rank, l AS lhs, r AS rhs, f AS pair_freq FROM m{i}"
        for i in range(iters)
    ]
    return "\nUNION ALL ".join(rows)


@register(
    "bpe_train_merges",
    doc="Distributed BPE tokenizer training (arXiv:1508.07909): 12 "
    "merge rounds over the word-type table; each round is one pair-"
    "count aggregation (freq-weighted shingle shape) + a 1-row argmax "
    "collect, and the merge itself is a pure projection (two-pass "
    "replace fixpoint) that Catalyst collapses. The oracle unrolls the "
    "rounds as a CTE chain, k-means-style.",
    oracle=f"""
WITH {_bpe_ctes()}
{_merges_union_sql()}
""",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _trained(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank: int, lhs: string, rhs: string, pair_freq: long"
    )


@register(
    "bpe_segment_stats",
    doc="Apply the trained BPE tokenizer to the corpus: subword token "
    "frequencies (top 30, total tie order). Application is a broadcast "
    "equi-join of corpus tokens against the learned word->subword "
    "lookup — no re-segmentation work at apply time.",
    oracle=f"""
WITH {_bpe_ctes()},
sub AS (
  SELECT unnest(string_split(trim(w._s), ' ')) AS subword
  FROM tok t JOIN w{ITERS} w USING (word)
)
SELECT subword, count(*)::BIGINT AS n
FROM sub GROUP BY subword
ORDER BY n DESC, subword ASC LIMIT 30
""",
)
def bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, final_words = _trained(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir).withColumn(
        "toks", cleaning.tokens(F.col("text"))
    )
    tok_rows = docs.select(F.explode("toks").alias("word"))
    sub = bpe.segment_tokens(tok_rows, "word", final_words)
    return (
        sub.groupBy("subword")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("subword").asc())
        .limit(30)
    )


@register(
    "bpe_fertility_by_lang",
    doc="Tokenizer-quality report: per-language word count, emitted "
    "subword count and fertility (subwords per word, marker included) "
    "under the trained BPE — the standard compression diagnostic for a "
    "tokenizer/corpus pairing. One equi-join against the word->subword "
    "lookup + one aggregation; reuses the session's trained artifact.",
    oracle=f"""
WITH {_bpe_ctes()},
tokl AS (SELECT lang, unnest({_TOKS}) AS word FROM documents),
j AS (
  SELECT t.lang, len(string_split(trim(w._s), ' ')) AS ns
  FROM tokl t JOIN w{ITERS} w USING (word)
)
SELECT lang, count(*)::BIGINT AS n_words, sum(ns)::BIGINT AS n_subwords,
       {rounding.stable_round_sql('sum(ns)::DOUBLE / count(*)', 4)} AS fertility
FROM j GROUP BY lang
""",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, final_words = _trained(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir).withColumn(
        "toks", cleaning.tokens(F.col("text"))
    )
    vocab = final_words.select("word", F.col("_s").alias("_seg"))
    j = (
        docs.select("lang", F.explode("toks").alias("word"))
        .join(vocab, "word")
        .select(
            "lang", F.size(F.split(F.trim(F.col("_seg")), " ")).alias("_ns")
        )
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("_ns").cast("long").alias("n_subwords"),
        rounding.stable_round(
            F.sum("_ns").cast("double") / F.count(F.lit(1)), 4
        ).alias("fertility"),
    )


# --- sf0.1-sweep slice twins (r12): the full BPE gates' unrolled
# 12-round CTE chains re-replace the whole word-type table per round
# in DuckDB, so they were sf0.01-only; these twins run the SAME
# trainer/apply lineages over the first-600-doc slice, keeping the
# oracle tractable at 10x driver scale. The unbounded-scale COST law
# is scale_smoke's bpe_train slot.

_BPE_SLICE_N = 600
_BPE_SLICE_WHERE = f" AND doc_id < {_BPE_SLICE_N}"


@register(
    "bpe_train_merges_sliced",
    doc="bpe_train_merges over the first-600-doc slice — the sf0.1-"
    "sweep twin. Same 12 merge rounds, same argmax total order.",
    oracle=f"""
WITH {_bpe_ctes(where=_BPE_SLICE_WHERE)}
{_merges_union_sql()}
""",
)
def bpe_train_merges_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _trained(spark, sf_dir, slice_n=_BPE_SLICE_N)
    return spark.createDataFrame(
        merges, "rank: int, lhs: string, rhs: string, pair_freq: long"
    )


@register(
    "bpe_segment_stats_sliced",
    doc="bpe_segment_stats over the first-600-doc slice — the sf0.1-"
    "sweep twin. Same trained artifact, same broadcast apply join.",
    oracle=f"""
WITH {_bpe_ctes(where=_BPE_SLICE_WHERE)},
sub AS (
  SELECT unnest(string_split(trim(w._s), ' ')) AS subword
  FROM tok t JOIN w{ITERS} w USING (word)
)
SELECT subword, count(*)::BIGINT AS n
FROM sub GROUP BY subword
ORDER BY n DESC, subword ASC LIMIT 30
""",
)
def bpe_segment_stats_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, final_words = _trained(spark, sf_dir, slice_n=_BPE_SLICE_N)
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < _BPE_SLICE_N
    ).withColumn("toks", cleaning.tokens(F.col("text")))
    tok_rows = docs.select(F.explode("toks").alias("word"))
    sub = bpe.segment_tokens(tok_rows, "word", final_words)
    return (
        sub.groupBy("subword")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("subword").asc())
        .limit(30)
    )


@register(
    "bpe_fertility_by_lang_sliced",
    doc="bpe_fertility_by_lang over the first-600-doc slice — the "
    "sf0.1-sweep twin. Same fertility arithmetic per language.",
    oracle=f"""
WITH {_bpe_ctes(where=_BPE_SLICE_WHERE)},
tokl AS (SELECT lang, unnest({_TOKS}) AS word FROM documents
         WHERE doc_id < {_BPE_SLICE_N}),
j AS (
  SELECT t.lang, len(string_split(trim(w._s), ' ')) AS ns
  FROM tokl t JOIN w{ITERS} w USING (word)
)
SELECT lang, count(*)::BIGINT AS n_words, sum(ns)::BIGINT AS n_subwords,
       {rounding.stable_round_sql('sum(ns)::DOUBLE / count(*)', 4)} AS fertility
FROM j GROUP BY lang
""",
)
def bpe_fertility_by_lang_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, final_words = _trained(spark, sf_dir, slice_n=_BPE_SLICE_N)
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < _BPE_SLICE_N
    ).withColumn("toks", cleaning.tokens(F.col("text")))
    vocab = final_words.select("word", F.col("_s").alias("_seg"))
    j = (
        docs.select("lang", F.explode("toks").alias("word"))
        .join(vocab, "word")
        .select(
            "lang", F.size(F.split(F.trim(F.col("_seg")), " ")).alias("_ns")
        )
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("_ns").cast("long").alias("n_subwords"),
        rounding.stable_round(
            F.sum("_ns").cast("double") / F.count(F.lit(1)), 4
        ).alias("fertility"),
    )
