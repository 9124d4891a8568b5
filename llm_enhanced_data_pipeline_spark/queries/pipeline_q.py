"""End-to-end pipeline queries: the flagship entry chain, schema
alignment, global stage stats, and the (rows-only) LLM enrichment pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cleaning, dedup, text_analysis
from ..operators.cleaning import tokens_sql
from ..tables import load_table
from .registry import register

_TOKS = tokens_sql("text")


@register(
    "stage_stats_global",
    doc="A1 single-row corpus stats (the reference's stage-over-stage "
    "comparison row, data_quality_comparison.py:40-115).",
    oracle=f"""
SELECT count(*) AS n_rows,
       round(avg(length(text)), 4) AS avg_len,
       round(100.0 * avg(CASE WHEN length(trim(text)) > 0 THEN 1.0 ELSE 0.0 END), 2) AS pct_nonempty,
       round(100.0 * avg(CASE WHEN length(trim(text)) > 0 AND length(source) > 0
                              AND lang IS NOT NULL AND length(lang) > 0
                              AND n_chars > 0 THEN 1.0 ELSE 0.0 END), 2) AS pct_schema_complete,
       round(avg(len({_TOKS})), 4) AS avg_words,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources
FROM documents
""",
)
def stage_stats_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # pct_schema_complete: the reference's all-required-fields-truthy
    # metric (data_quality_comparison.py:82-87) mapped onto the
    # documents schema (text/source/lang/n_chars are its required set).
    schema_complete = (
        (F.length(F.trim(F.col("text"))) > 0)
        & (F.length("source") > 0)
        & F.col("lang").isNotNull()
        & (F.length("lang") > 0)
        & (F.col("n_chars") > 0)
    )
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(F.length("text")), 4).alias("avg_len"),
        F.round(
            100.0 * F.avg(F.when(F.length(F.trim(F.col("text"))) > 0, 1.0).otherwise(0.0)),
            2,
        ).alias("pct_nonempty"),
        F.round(
            100.0 * F.avg(F.when(schema_complete, 1.0).otherwise(0.0)), 2
        ).alias("pct_schema_complete"),
        F.round(F.avg(F.size(cleaning.tokens(F.col("text")))), 4).alias("avg_words"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "align_schema",
    doc="P1: canonical projection with coalesce defaults over a source "
    "with injected missing values (format_alignment.py:4-29).",
    oracle="""
WITH raw AS (
  SELECT doc_id,
         nullif(source, 'src0') AS source,
         nullif(lang, 'de') AS lang,
         CASE WHEN doc_id % 5 = 0 THEN NULL ELSE text END AS text,
         CASE WHEN doc_id % 3 = 0 THEN NULL ELSE n_chars END AS n_chars
  FROM documents
)
SELECT CAST(doc_id AS VARCHAR) AS doc_key,
       coalesce(source, '') AS source,
       coalesce(lang, '') AS lang,
       coalesce(text, '') AS text,
       coalesce(n_chars, 0) AS n_chars
FROM raw
""",
)
def align_schema_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    raw = docs.select(
        F.col("doc_id").cast("string").alias("doc_key"),
        F.nullif(F.col("source"), F.lit("src0")).alias("source"),
        F.nullif(F.col("lang"), F.lit("de")).alias("lang"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.col("text")).alias("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    aligned = cleaning.align_schema(
        raw,
        string_fields=["doc_key", "source", "lang", "text"],
        array_fields=[],
        int_fields=["n_chars"],
    )
    return aligned


@register(
    "flagship_pipeline",
    bench=True,
    doc="The entry() chain: cleanse → content-hash dedup → quality "
    "score → per-lang rollup (the reference's full batch pipeline in "
    "one lineage, SURVEY.md §3.1).",
    oracle=f"""
WITH cleaned AS (
  SELECT doc_id, lang, source,
         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
  FROM documents
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                 ORDER BY doc_id) AS rn
    FROM cleaned
  ) WHERE rn = 1
),
scored AS (
  SELECT lang,
         least(length(text)::DOUBLE / 2000.0, 1.0) * 0.3
         + (len(list_distinct({_TOKS}))::DOUBLE / greatest(len({_TOKS}), 1)) * 0.3
         + least((len(list_filter({_TOKS}, _t -> _t IN ('the','a','and','of','to','in','is','that','it','for')))::DOUBLE
                 / greatest(len({_TOKS}), 1)) * 5.0, 1.0) * 0.2
         + CASE WHEN (list_sum(list_transform({_TOKS}, _t -> length(_t)::DOUBLE))::DOUBLE
                      / greatest(len({_TOKS}), 1)) BETWEEN 3.0 AND 12.0
                THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END AS q,
         length(text) AS n_chars
  FROM deduped
)
SELECT lang, count(*) AS n_docs,
       round(avg(q), 4) AS avg_quality,
       round(avg(n_chars), 4) AS avg_chars
FROM scored GROUP BY lang
""",
)
def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    cleaned = docs.select(
        "doc_id",
        "lang",
        "source",
        cleaning.normalize_whitespace(F.col("text")).alias("text"),
    )
    deduped = dedup.dedup_content_hash(cleaned, "text", [F.col("doc_id")])
    comps = text_analysis.text_quality_components(F.col("text"))
    q = (
        comps["length"] * 0.3
        + comps["diversity"] * 0.3
        + comps["stopword"] * 0.2
        + comps["wordlen"] * 0.2
    )
    scored = deduped.select("lang", q.alias("q"), F.length("text").alias("n_chars"))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "llm_enrichment_fake",
    doc="P19/P20/P11: the enrichment harness end-to-end on the "
    "deterministic fake client — prompt build → rate-limited Arrow "
    "batches → 4-level parser cascade (the client deliberately emits "
    "fenced/prose-wrapped shapes). Fully oracle-checked: the fake's "
    "payload is md5 arithmetic on the prompt, so the SQL twin rebuilds "
    "it — verifying the whole mapInPandas round trip, not just row "
    "counts. Confidence crosses as an int (x100) to dodge double-"
    "rounding ulp skew.",
    oracle="""
WITH s AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5('Score this document: ' || substring(text, 1, 200)), 1, 8)) AS UBIGINT)::BIGINT AS seed
  FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       (seed % 11)::INTEGER AS novelty,
       ((seed // 11) % 11)::INTEGER AS technical_depth,
       ((seed // 121) % 11)::INTEGER AS clarity,
       (30 + (seed % 70))::INTEGER AS conf_x100
FROM s
""",
)
def llm_enrichment_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..enrich import DeterministicFakeLLM, enrich_with_llm

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 100)

    def prompts(pdf: pd.DataFrame) -> pd.Series:
        return "Score this document: " + pdf["text"].str.slice(0, 200)

    out = enrich_with_llm(
        docs,
        "doc_id",
        prompts,
        lambda: DeterministicFakeLLM(task="scoring"),
        rate_per_sec=10_000.0,
    )
    parsed = out.select(
        "doc_id",
        F.from_json(
            F.col("llm_json"),
            "struct<novelty:int, technical_depth:int, clarity:int, impact_potential:int, confidence:double>",
        ).alias("s"),
    )
    return parsed.select(
        "doc_id",
        F.col("s.novelty").alias("novelty"),
        F.col("s.technical_depth").alias("technical_depth"),
        F.col("s.clarity").alias("clarity"),
        F.round(F.col("s.confidence") * 100).cast("int").alias("conf_x100"),
    )


# ---------------------------------------------------------------------------
# The composite training-data pipeline: the canonical LLM-corpus path
# (language ID -> heuristic quality gate -> exact content dedup ->
# near-dup dedup against the SHARED MinHash pair index -> per-language
# corpus stats) as ONE lazy lineage. Execution shape at scale:
# projection/filter (codegen) -> window over the md5 content-hash
# partition -> two semi-joins against the corpus-level verified-pairs
# frame (near-dup-ness is pairwise, so pairs among the post-gate subset
# are exactly the corpus pairs with both endpoints surviving — the pair
# index is computed ONCE per corpus snapshot and every consumer
# filters it, never rebuilds signatures over its own subset) -> hash
# aggregate. No quadratic joins anywhere.

def _training_pipeline_oracle() -> str:
    from ..operators.text_analysis import lang_id_sql
    from .dedup_q import _MINHASH_CTE, _MINHASH_VERIFIED_PAIRS_SQL

    diversity = f"(len(list_distinct({_TOKS}))::DOUBLE / greatest(len({_TOKS}), 1))"
    return (
        _MINHASH_CTE
        + ","
        + _MINHASH_VERIFIED_PAIRS_SQL
        + f""",
lang AS (
  SELECT doc_id, text, {lang_id_sql(_TOKS)} AS pred_lang FROM u
),
gated AS (
  SELECT * FROM lang
  WHERE pred_lang <> 'und'
    AND length(text) >= 150
    AND len({_TOKS}) >= 25
    AND {diversity} >= 0.35
),
cd AS (
  SELECT doc_id, text, pred_lang FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                 ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
dup AS (
  SELECT DISTINCT id_b AS doc_id FROM vp
  WHERE id_a IN (SELECT doc_id FROM cd)
    AND id_b IN (SELECT doc_id FROM cd)
),
survivors AS (
  SELECT * FROM cd WHERE doc_id NOT IN (SELECT doc_id FROM dup)
)
SELECT pred_lang,
       count(*) AS n_docs,
       sum(len({_TOKS}))::BIGINT AS total_words,
       round(avg(len({_TOKS})), 4) AS avg_words
FROM survivors GROUP BY pred_lang
"""
    )


@register(
    "training_data_pipeline",
    bench=True,
    doc="The composite LLM training-corpus pipeline in one lineage: "
    "language-ID filter -> quality gate (length/word-count/diversity) "
    "-> exact content-hash dedup (window, keep min id) -> near-dup "
    "dedup by semi-join against the shared corpus-level MinHash "
    "verified-pair index (computed once per corpus, reused by the "
    "whole dedup family) -> per-language corpus stats. The scale "
    "shape of the whole beyond-reference suite composed end-to-end.",
    oracle=_training_pipeline_oracle(),
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import quality
    from .dedup_q import _minhash_corpus, _shared_minhash_pairs

    # The memoized tokenized corpus (doc_id, text, toks): tokenize-once
    # shared with the dedup_q family — lang ID and the gate predicates
    # read the persisted array column.
    corpus = _minhash_corpus(spark, sf_dir)
    toks = F.col("toks")
    diversity = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    )
    lang = corpus.withColumn("pred_lang", text_analysis.lang_id(toks))
    gated, _ = quality.quality_gate(
        lang.filter(F.col("pred_lang") != "und"),
        [
            ("text_too_short", F.length("text") < 150),
            ("too_few_words", F.size(toks) < 25),
            ("low_diversity", diversity < 0.35),
        ],
    )
    exact = dedup.dedup_content_hash(gated, "text", [F.col("doc_id")])
    # The deduped frame is consumed three times (both semi-join id
    # sides, the survivor anti-join) — persist it so the
    # scan->gate->window lineage runs once, not three times.
    with_toks = dedup.persist_tracked(exact)
    with_toks.count()  # 3 consumers; see minhash_grouped on why eager
    # Near-dup stage: filter the shared pair index to pairs whose BOTH
    # endpoints survived the gate + exact dedup (near-dup-ness is
    # pairwise, so this equals recomputing pairs over the subset), then
    # drop the later endpoint of each pair.
    pairs = _shared_minhash_pairs(spark, sf_dir)
    ids = with_toks.select("doc_id")
    dup_ids = (
        pairs.join(ids.withColumnRenamed("doc_id", "id_a"), "id_a", "semi")
        .join(ids.withColumnRenamed("doc_id", "id_b"), "id_b", "semi")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    survivors = with_toks.join(dup_ids, "doc_id", "left_anti")
    return survivors.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("total_words"),
        F.round(F.avg(F.size("toks")), 4).alias("avg_words"),
    )
