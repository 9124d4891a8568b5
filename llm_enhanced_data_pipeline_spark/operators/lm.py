"""Corpus-LM perplexity quality scoring — the CCNet lane.

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") filters crawl text by PERPLEXITY UNDER A
REFERENCE-DOMAIN LANGUAGE MODEL: a model trained on a known-clean
corpus (Wikipedia) scores every crawled paragraph, and per-language
perplexity tertiles split the crawl into head/middle/tail quality
buckets (the head feeds training; the tail is dropped or down-weighted).
LLaMA-1 and many open corpora reuse the recipe verbatim. The reference
pipeline scores quality with an LLM judge per document — this lane is
what that stage becomes when the corpus is 100 TB of crawl and the
scorer must be a model you can evaluate inside the engine.

Spark-first shape: the reference-domain model is a UNIGRAM count table
(token -> count) built with one hash aggregation — at 100 TB this is
the classic shared-nothing LM-count job, and the resulting vocabulary
is small enough to broadcast. Scoring is explode -> broadcast-join ->
per-doc sum: one scan over the corpus, no shuffle wider than the
per-doc aggregation.

EXACT INTEGER cross-entropy (the package's oracle discipline): per
token, -log2 P(tok) with add-one smoothing is

    log2(N + V) - log2(c_tok + 1)        [bits]

computed in MILLI-BITS through :func:`log2_milli`: integer part from
the bigint bit length (``length(bin(n))`` — identical in Spark and
DuckDB, the HyperBall trick), fractional part from a 256-entry
precomputed integer ladder indexed by the top 8 mantissa bits
(generated at import from math.log2, shared verbatim by both engines
as an array literal). Every per-doc sum is a bigint sum of integers —
order-independent, so distributed aggregation and the DuckDB twin
agree bit-for-bit, with no float-summation hazard at any scale.

Mantissa truncation to 8 bits costs < 6 milli-bits per token of
quantization — irrelevant for quality BUCKETING (CCNet thresholds are
corpus-relative tertiles), and identical in both engines, which is the
property that matters.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import index_1_to

#: mantissa buckets for the fractional log2 ladder (top 8 bits)
LOG2_BUCKETS = 256
#: fractional ladder: round(log2(1 + k/256) * 1000) for k in [0, 256)
#: — integer literals shared verbatim by the Spark expression and the
#: DuckDB twin, so the one place a logarithm appears is resolved at
#: import, never computed by an engine.
LOG2_TABLE_MILLI = [
    round(math.log2(1.0 + k / LOG2_BUCKETS) * 1000)
    for k in range(LOG2_BUCKETS)
]


def log2_milli(col: Column) -> Column:
    """1000·log2(n) for a POSITIVE bigint column, exact-integer:
    ``(bitlen-1)·1000 + ladder[top 8 mantissa bits]``. n must be >= 1
    (callers add smoothing before taking logs).

    The top-8-mantissa index is ``floor(n·256 / 2^(bl−1)) − 256``, but
    the naive ``n * 256`` pre-multiply silently WRAPS in Spark for
    n ≥ 2^55 (ANSI off) while the DuckDB twin raises on BIGINT
    overflow — an engine divergence at extreme scale. Shift instead:
    for bl ≥ 9 the multiply-then-shift is exactly ``n >> (bl−9)``; for
    bl < 9 (n < 256) it is exactly ``n << (9−bl)`` (< 512, overflow-
    free). Valid for every positive int64. call_function: the Python
    F.shiftright/shiftleft bindings only accept a LITERAL bit count,
    but the underlying SQL functions take a column fine."""
    n = col.cast("bigint")
    bl = F.length(F.bin(n))
    sh = (bl - 9).cast("int")
    k = (
        F.when(sh >= 0, F.call_function("shiftright", n, sh)).otherwise(
            F.call_function("shiftleft", n, -sh)
        )
        - LOG2_BUCKETS
    )
    ladder = F.array(*[F.lit(v) for v in LOG2_TABLE_MILLI])
    return ((bl - 1) * 1000 + F.element_at(ladder, (k + 1).cast("int"))).cast(
        "bigint"
    )


def log2_milli_sql(expr: str) -> str:
    """DuckDB twin of :func:`log2_milli` — same bit length, same
    ladder literals, same shift-not-multiply mantissa (so neither
    engine ever forms ``n * 256``, which would raise here and wrap in
    Spark for n ≥ 2^55)."""
    ladder = "[" + ", ".join(str(v) for v in LOG2_TABLE_MILLI) + "]"
    bl = f"length(bin(({expr})::BIGINT))"
    k = (
        f"(CASE WHEN ({bl}) >= 9 THEN (({expr})::BIGINT >> (({bl}) - 9)) "
        f"ELSE (({expr})::BIGINT << (9 - ({bl}))) END - {LOG2_BUCKETS})"
    )
    return f"((({bl}) - 1) * 1000 + ({ladder})[({k}) + 1])::BIGINT"


def unigram_counts(
    reference: DataFrame, toks_col: str
) -> DataFrame:
    """Reference-domain unigram model: ``(tok, c)`` counts over the
    token-array column of the clean corpus — one explode + one hash
    aggregation (the 100 TB LM-count job). The result is the
    BROADCASTABLE model table scoring joins against."""
    return (
        reference.select(F.explode(F.col(toks_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def lm_stats(model: DataFrame) -> DataFrame:
    """1-row (n_total, v_vocab) frame for the smoothing denominator."""
    return model.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("v_vocab"),
    )


def cross_entropy_milli(
    docs: DataFrame,
    id_col: str,
    toks_col: str,
    model: DataFrame,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-doc cross-entropy under the unigram reference model, in
    exact milli-bits → ``(id_col, *keep_cols, n_toks, xent_milli)``.

    Add-one smoothing: P(tok) = (c+1)/(N+V), OOV tokens score c=0.
    Per token the -log2 P term is ``log2_milli(N+V) −
    log2_milli(c+1)`` — a bigint — so the per-doc sum is
    order-independent and the floor-divided mean is engine-exact.
    Empty docs (no tokens) are dropped, like CCNet drops empty
    paragraphs. Plan shape: explode → broadcast equi-join against the
    model → one keyed aggregation; the (N+V) denominator is a 1-row
    broadcast crossJoin.

    An EMPTY reference model (N+V = 0) fails LOUD in both engines
    (raise_error / error()) rather than feeding log2_milli its
    out-of-domain 0 — which would silently NULL every xent_milli via
    an out-of-range element_at with no signal that the reference
    slice was empty."""
    keep = keep_cols or []
    toks = docs.select(
        F.col(id_col), *[F.col(c) for c in keep],
        F.explode(F.col(toks_col)).alias("tok"),
    )
    scored = toks.join(F.broadcast(model), "tok", "left").withColumn(
        "_c1", (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("bigint")
    )
    nv = (F.col("n_total") + F.col("v_vocab")).cast("bigint")
    guarded_nv = F.when(nv >= 1, nv).otherwise(
        F.raise_error(
            F.lit("lm reference model is empty (n_total + v_vocab < 1)")
        ).cast("bigint")
    )
    denom = F.broadcast(
        lm_stats(model).select(log2_milli(guarded_nv).alias("_lden"))
    )
    per_tok = scored.crossJoin(denom).withColumn(
        "_bits_milli", F.col("_lden") - log2_milli(F.col("_c1"))
    )
    return (
        per_tok.groupBy(F.col(id_col), *[F.col(c) for c in keep])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.sum("_bits_milli").cast("bigint").alias("_sum_milli"),
        )
        .select(
            id_col,
            *keep,
            "n_toks",
            F.expr("cast(_sum_milli div n_toks as bigint)").alias(
                "xent_milli"
            ),
        )
    )


#: fixed-point fraction bits for the interpolated bigram probability
FP_BITS = 20
FP_ONE = 1 << FP_BITS
#: Jelinek-Mercer interpolation weight λ = LAM_NUM/LAM_DEN on the
#: bigram term (the unigram term gets 1−λ) — a RATIONAL so the mixture
#: stays exact-integer in both engines
LAM_NUM, LAM_DEN = 3, 4


def bigram_pairs(df: DataFrame, toks_col: str, keep: list[str]) -> DataFrame:
    """One row per adjacent token pair → (*keep, _w1, _w2). Array
    transform + explode: no self-join, no positional window.
    index_1_to (not raw sequence()) so sub-2-token docs yield ZERO
    pairs in both engines instead of Spark's descending [1, 0]."""
    toks = F.col(toks_col)
    idx = F.transform(
        index_1_to(F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i.cast("int")).alias("_w1"),
            F.element_at(toks, (i + 1).cast("int")).alias("_w2"),
        ),
    )
    return df.select(
        *[F.col(c) for c in keep], F.explode(idx).alias("_p")
    ).select(*keep, F.col("_p._w1").alias("_w1"), F.col("_p._w2").alias("_w2"))


def bigram_counts(reference: DataFrame, toks_col: str) -> DataFrame:
    """Reference-domain bigram model: (_w1, _w2, c_bi) counts over the
    clean corpus — one pair explode + one hash aggregation. Vocab²-
    bounded (in practice Zipf-bounded far below that), broadcastable
    like the unigram table."""
    return (
        bigram_pairs(reference, toks_col, [])
        .groupBy("_w1", "_w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_bi"))
    )


def bigram_cross_entropy_milli(
    docs: DataFrame,
    id_col: str,
    toks_col: str,
    bi_model: DataFrame,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-doc cross-entropy under a Jelinek-Mercer interpolated
    BIGRAM reference model, in exact milli-bits →
    ``(id_col, *keep_cols, n_bigrams, xent_milli)`` — the sequence-
    aware upgrade of :func:`cross_entropy_milli` (CCNet's actual
    scorer is a 5-gram KenLM; conditioning on the previous token
    penalizes improbable SEQUENCES of individually-common tokens,
    which the unigram lane cannot see).

    Exact-integer mixture: the interpolated probability
    λ·c_bi/c_w1 + (1−λ)·c_w2/N is quantized to FP_BITS fixed point —

        q1 = (c_bi · 2^20) div c_w1        (≤ 2^20 since c_bi ≤ c_w1)
        q2 = (c_w2 · 2^20) div N           (≤ 2^20)
        m  = max((LAM_NUM·q1 + (LAM_DEN−LAM_NUM)·q2) div LAM_DEN, 1)

    and the per-pair cost is ``20000 − log2_milli(m)`` milli-bits —
    every step a bigint, so the per-doc sum is order-independent and
    the DuckDB twin matches bit-for-bit. Unseen bigrams fall to the
    unigram floor (q1 = 0); a fully-OOV pair clamps at m = 1 = 20
    bits/pair, CCNet's practical ceiling. Docs with < 2 tokens are
    dropped (no sequence to score), like empty paragraphs in the
    unigram lane. Input bound (documented like pagerank_int's): any
    single bigram/unigram count must stay < 2^43 so the 2^20
    fixed-point shift cannot overflow int64 — at 8.8e12 occurrences
    of ONE pair this outlasts any real corpus shard.

    Plan shape: one pair explode → broadcast joins against the bigram
    table and its two unigram marginals → 1-row broadcast total →
    one keyed aggregation. One corpus scan; the model tables are
    vocab-bounded and broadcast at any corpus size. Empty reference
    model fails loud (same raise_error guard as the unigram lane)."""
    keep = keep_cols or []
    uni1 = bi_model.groupBy("_w1").agg(F.sum("c_bi").cast("bigint").alias("c_w1"))
    uni2 = bi_model.groupBy("_w2").agg(F.sum("c_bi").cast("bigint").alias("c_w2"))
    n_raw = bi_model.agg(
        F.coalesce(F.sum("c_bi"), F.lit(0)).cast("bigint").alias("_n_raw")
    )
    total = F.broadcast(
        n_raw.select(
            F.when(F.col("_n_raw") >= 1, F.col("_n_raw"))
            .otherwise(
                F.raise_error(
                    F.lit("lm bigram reference model is empty (no pairs)")
                ).cast("bigint")
            )
            .alias("_n")
        )
    )
    pairs = bigram_pairs(docs, toks_col, [id_col, *keep])
    scored = (
        pairs.join(F.broadcast(bi_model), ["_w1", "_w2"], "left")
        .join(F.broadcast(uni1), "_w1", "left")
        .join(F.broadcast(uni2), "_w2", "left")
        .crossJoin(total)
    )
    m = F.greatest(
        F.expr(
            f"({LAM_NUM} * coalesce((c_bi * {FP_ONE}) div c_w1, 0) + "
            f"{LAM_DEN - LAM_NUM} * coalesce((c_w2 * {FP_ONE}) div _n, 0)) "
            f"div {LAM_DEN}"
        ),
        F.lit(1).cast("bigint"),
    )
    per_pair = scored.withColumn(
        "_bits_milli",
        (F.lit(FP_BITS * 1000).cast("bigint") - log2_milli(m)).cast("bigint"),
    )
    return (
        per_pair.groupBy(F.col(id_col), *[F.col(c) for c in keep])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("_bits_milli").cast("bigint").alias("_sum_milli"),
        )
        .select(
            id_col,
            *keep,
            "n_bigrams",
            F.expr("cast(_sum_milli div n_bigrams as bigint)").alias(
                "xent_milli"
            ),
        )
    )


def bigram_counts_sql(toks_expr: str, relation: str) -> str:
    """DuckDB twin of :func:`bigram_counts` as a SELECT body producing
    (_w1, _w2, c_bi)."""
    return f"""SELECT _w1, _w2, count(*)::BIGINT AS c_bi FROM (
  SELECT toks[_i] AS _w1, toks[_i + 1] AS _w2
  FROM (SELECT {toks_expr} AS toks FROM {relation}),
       LATERAL unnest(range(1, greatest(len(toks) - 1, 0) + 1)) r(_i)
) GROUP BY 1, 2"""


def bigram_cross_entropy_sql(
    toks_expr: str,
    id_expr: str,
    docs_relation: str,
    bi_cte: str,
    keep_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`bigram_cross_entropy_milli`: CTE text
    computing ``bg_xent(_id, *keep_cols, n_bigrams, xent_milli)``
    given a ``bi_cte`` with (_w1, _w2, c_bi) — same fixed-point
    mixture, same ladder, same clamp, same loud empty-model guard."""
    keep = keep_cols or []
    k_sel = "".join(f", {c}" for c in keep)
    k_p = "".join(f", p.{c}" for c in keep)
    m = (
        f"greatest(({LAM_NUM} * coalesce((b.c_bi * {FP_ONE}) // u1.c_w1, 0)"
        f" + {LAM_DEN - LAM_NUM} * coalesce((u2.c_w2 * {FP_ONE}) // t._n, 0))"
        f" // {LAM_DEN}, 1)"
    )
    return f"""
bg_uni1 AS (
  SELECT _w1, sum(c_bi)::BIGINT AS c_w1 FROM {bi_cte} GROUP BY 1
),
bg_uni2 AS (
  SELECT _w2, sum(c_bi)::BIGINT AS c_w2 FROM {bi_cte} GROUP BY 1
),
bg_n AS (
  SELECT CASE WHEN coalesce(sum(c_bi), 0) >= 1
              THEN coalesce(sum(c_bi), 0)::BIGINT
              ELSE error('lm bigram reference model is empty (no pairs)')
         END AS _n
  FROM {bi_cte}
),
bg_pairs AS (
  SELECT {id_expr} AS _id{k_sel}, toks[_i] AS _w1, toks[_i + 1] AS _w2
  FROM (SELECT {id_expr}{k_sel}, {toks_expr} AS toks FROM {docs_relation}),
       LATERAL unnest(range(1, greatest(len(toks) - 1, 0) + 1)) r(_i)
),
bg_scored AS (
  SELECT p._id{k_p},
         ({FP_BITS * 1000}::BIGINT - {log2_milli_sql(m)}) AS bits_milli
  FROM bg_pairs p
  LEFT JOIN {bi_cte} b ON p._w1 = b._w1 AND p._w2 = b._w2
  LEFT JOIN bg_uni1 u1 ON p._w1 = u1._w1
  LEFT JOIN bg_uni2 u2 ON p._w2 = u2._w2
  CROSS JOIN bg_n t
),
bg_xent AS (
  SELECT _id{k_sel}, count(*)::BIGINT AS n_bigrams,
         (sum(bits_milli)::BIGINT // count(*))::BIGINT AS xent_milli
  FROM bg_scored GROUP BY ALL
)"""


def unigram_counts_sql(toks_expr: str, relation: str) -> str:
    """DuckDB twin of :func:`unigram_counts` as a SELECT body
    producing (tok, c)."""
    return (
        f"SELECT tok, count(*)::BIGINT AS c FROM ("
        f"SELECT unnest({toks_expr}) AS tok FROM {relation}) GROUP BY tok"
    )


def cross_entropy_sql(
    toks_expr: str,
    id_expr: str,
    docs_relation: str,
    model_cte: str,
    keep_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`cross_entropy_milli`: CTE text computing
    ``lm_xent(_id, *keep_cols, n_toks, xent_milli)`` given a
    ``model_cte`` with (tok, c)."""
    keep = keep_cols or []
    k_sel = "".join(f", {c}" for c in keep)
    k_t = "".join(f", t.{c}" for c in keep)
    guarded_nv = (
        "CASE WHEN nv >= 1 THEN nv "
        "ELSE error('lm reference model is empty (n_total + v_vocab < 1)') END"
    )
    return f"""
lm_nv AS (
  SELECT (coalesce(sum(c), 0) + count(*))::BIGINT AS nv FROM {model_cte}
),
lm_den AS (
  SELECT {log2_milli_sql(guarded_nv)} AS lden FROM lm_nv
),
lm_tok AS (
  SELECT {id_expr} AS _id{k_sel}, unnest({toks_expr}) AS tok
  FROM {docs_relation}
),
lm_scored AS (
  SELECT t._id{k_t},
         d.lden - {log2_milli_sql("coalesce(m.c, 0) + 1")} AS bits_milli
  FROM lm_tok t LEFT JOIN {model_cte} m ON t.tok = m.tok
  CROSS JOIN lm_den d
),
lm_xent AS (
  SELECT _id{k_sel}, count(*)::BIGINT AS n_toks,
         (sum(bits_milli)::BIGINT // count(*))::BIGINT AS xent_milli
  FROM lm_scored GROUP BY ALL
)"""


def kenlm_scorer(
    model_path: str,
):  # pragma: no cover - model lib absent in this container
    """Real-model CCNet scorer: a KenLM n-gram model (the 5-gram
    scorer CCNet actually ships) behind the same import gate as the
    sentence-transformers embedder (enrich/embedding.py) — raises with
    a clear message when the library is absent; the exact-integer
    unigram/bigram lanes are the deterministic in-engine substitutes.

    Returns ``texts -> [log10 prob per text]``. The model loads lazily
    INSIDE the executor on first call (the closure pickles only the
    path), matching the contract that models are never shipped from
    the driver."""
    try:
        import kenlm  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "kenlm is not installed in this environment; use the "
            "exact-integer unigram/bigram CCNet lanes (queries/lm_q) "
            "or install kenlm on the executors"
        ) from e
    state: dict[str, object] = {}

    def score(texts: list[str]) -> list[float]:
        import kenlm

        if "m" not in state:
            state["m"] = kenlm.Model(model_path)
        m = state["m"]
        return [float(m.score(t, bos=True, eos=True)) for t in texts]

    return score


def score_perplexity_with(
    df: DataFrame,
    id_col: str,
    text_col: str,
    scorer,
    batch_size: int = 64,
) -> DataFrame:
    """Arrow-batched adapter running ANY ``texts -> [float]`` scorer
    (a :func:`kenlm_scorer`, or a deterministic fake in tests) over
    the corpus → ``(id_col, lm_score)``. mapInPandas, never
    row-at-a-time: one Python worker per partition, the scorer sees
    real batches — the exact plumbing shape of the embedding lane, so
    swapping in the real KenLM model changes zero Spark code."""
    import pandas as pd

    schema = f"{id_col} string, lm_score double"

    def run(batches):
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            scores: list[float] = []
            for i in range(0, len(texts), batch_size):
                scores.extend(scorer(texts[i : i + batch_size]))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype(str), "lm_score": scores}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


#: trigram Jelinek-Mercer weights (λ3, λ2, λ1)·16 — rationals over a
#: /16 denominator so the three-way mixture stays exact-integer
TRI_LAM = (8, 5, 3)
TRI_DEN = 16


def trigram_triples(df: DataFrame, toks_col: str, keep: list[str]) -> DataFrame:
    """One row per adjacent token TRIPLE → (*keep, _w1, _w2, _w3);
    sub-3-token docs yield zero rows in both engines (index_1_to)."""
    toks = F.col(toks_col)
    idx = F.transform(
        index_1_to(F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i.cast("int")).alias("_w1"),
            F.element_at(toks, (i + 1).cast("int")).alias("_w2"),
            F.element_at(toks, (i + 2).cast("int")).alias("_w3"),
        ),
    )
    return df.select(
        *[F.col(c) for c in keep], F.explode(idx).alias("_p")
    ).select(
        *keep,
        F.col("_p._w1").alias("_w1"),
        F.col("_p._w2").alias("_w2"),
        F.col("_p._w3").alias("_w3"),
    )


def trigram_counts(reference: DataFrame, toks_col: str) -> DataFrame:
    """Reference-domain trigram model: (_w1, _w2, _w3, c_tri) — one
    triple explode + one hash aggregation; every lower-order marginal
    the scorer needs (context pairs, backoff bigrams, unigrams, the
    total) is derived FROM this table by further aggregation, so the
    whole model family is one pass over the reference corpus."""
    return (
        trigram_triples(reference, toks_col, [])
        .groupBy("_w1", "_w2", "_w3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_tri"))
    )


def trigram_cross_entropy_milli(
    docs: DataFrame,
    id_col: str,
    toks_col: str,
    tri_model: DataFrame,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-doc cross-entropy under a THREE-way Jelinek-Mercer
    interpolated trigram reference model, exact milli-bits →
    ``(id_col, *keep_cols, n_trigrams, xent_milli)`` — the order-3
    step toward CCNet's 5-gram KenLM.

    Mixture (all marginals from the trigram table, the same
    one-model-table discipline as the bigram lane):

        P = λ3·c_tri/c_ctx2(w1,w2) + λ2·c_bi23(w2,w3)/c_ctx1(w2)
                                   + λ1·c_uni3(w3)/N
        (λ3, λ2, λ1) = (8, 5, 3)/16

    quantized per term to 2^20 fixed point (each q ≤ 2^20 because each
    numerator is dominated by its denominator by construction), mixed
    with the integer weights, floored at m = 1 (fully-OOV ≈ 20
    bits/triple), scored as ``20000 − log2_milli(m)``. Every step is a
    bigint; the DuckDB twin matches bit-for-bit. Docs with < 3 tokens
    are dropped. Same < 2^43 single-count bound as the bigram lane.

    Plan: one triple explode → five broadcast model joins (tri, ctx2,
    bi23, ctx1, uni3) → 1-row broadcast total → one keyed agg. One
    corpus scan; every model table is vocab-bounded."""
    keep = keep_cols or []
    ctx2 = tri_model.groupBy("_w1", "_w2").agg(
        F.sum("c_tri").cast("bigint").alias("c_ctx2")
    )
    bi23 = tri_model.groupBy("_w2", "_w3").agg(
        F.sum("c_tri").cast("bigint").alias("c_bi23")
    )
    ctx1 = tri_model.groupBy("_w2").agg(
        F.sum("c_tri").cast("bigint").alias("c_ctx1")
    )
    uni3 = tri_model.groupBy("_w3").agg(
        F.sum("c_tri").cast("bigint").alias("c_uni3")
    )
    n_raw = tri_model.agg(
        F.coalesce(F.sum("c_tri"), F.lit(0)).cast("bigint").alias("_n_raw")
    )
    total = F.broadcast(
        n_raw.select(
            F.when(F.col("_n_raw") >= 1, F.col("_n_raw"))
            .otherwise(
                F.raise_error(
                    F.lit("lm trigram reference model is empty (no triples)")
                ).cast("bigint")
            )
            .alias("_n")
        )
    )
    triples = trigram_triples(docs, toks_col, [id_col, *keep])
    scored = (
        triples.join(F.broadcast(tri_model), ["_w1", "_w2", "_w3"], "left")
        .join(F.broadcast(ctx2), ["_w1", "_w2"], "left")
        .join(F.broadcast(bi23), ["_w2", "_w3"], "left")
        .join(F.broadcast(ctx1), "_w2", "left")
        .join(F.broadcast(uni3), "_w3", "left")
        .crossJoin(total)
    )
    l3, l2, l1 = TRI_LAM
    m = F.greatest(
        F.expr(
            f"({l3} * coalesce((c_tri * {FP_ONE}) div c_ctx2, 0) + "
            f"{l2} * coalesce((c_bi23 * {FP_ONE}) div c_ctx1, 0) + "
            f"{l1} * coalesce((c_uni3 * {FP_ONE}) div _n, 0)) div {TRI_DEN}"
        ),
        F.lit(1).cast("bigint"),
    )
    per = scored.withColumn(
        "_bits_milli",
        (F.lit(FP_BITS * 1000).cast("bigint") - log2_milli(m)).cast("bigint"),
    )
    return (
        per.groupBy(F.col(id_col), *[F.col(c) for c in keep])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.sum("_bits_milli").cast("bigint").alias("_sum_milli"),
        )
        .select(
            id_col,
            *keep,
            "n_trigrams",
            F.expr("cast(_sum_milli div n_trigrams as bigint)").alias(
                "xent_milli"
            ),
        )
    )


def trigram_counts_sql(toks_expr: str, relation: str) -> str:
    """DuckDB twin of :func:`trigram_counts`."""
    return f"""SELECT _w1, _w2, _w3, count(*)::BIGINT AS c_tri FROM (
  SELECT toks[_i] AS _w1, toks[_i + 1] AS _w2, toks[_i + 2] AS _w3
  FROM (SELECT {toks_expr} AS toks FROM {relation}),
       LATERAL unnest(range(1, greatest(len(toks) - 2, 0) + 1)) r(_i)
) GROUP BY 1, 2, 3"""


def trigram_cross_entropy_sql(
    toks_expr: str,
    id_expr: str,
    docs_relation: str,
    tri_cte: str,
    keep_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`trigram_cross_entropy_milli`: CTE text
    computing ``tg_xent(_id, *keep_cols, n_trigrams, xent_milli)``
    given a ``tri_cte`` with (_w1, _w2, _w3, c_tri)."""
    keep = keep_cols or []
    k_sel = "".join(f", {c}" for c in keep)
    k_p = "".join(f", p.{c}" for c in keep)
    l3, l2, l1 = TRI_LAM
    m = (
        f"greatest(({l3} * coalesce((t3.c_tri * {FP_ONE}) // x2.c_ctx2, 0)"
        f" + {l2} * coalesce((b23.c_bi23 * {FP_ONE}) // x1.c_ctx1, 0)"
        f" + {l1} * coalesce((u3.c_uni3 * {FP_ONE}) // t._n, 0))"
        f" // {TRI_DEN}, 1)"
    )
    return f"""
tg_ctx2 AS (
  SELECT _w1, _w2, sum(c_tri)::BIGINT AS c_ctx2 FROM {tri_cte} GROUP BY 1, 2
),
tg_bi23 AS (
  SELECT _w2, _w3, sum(c_tri)::BIGINT AS c_bi23 FROM {tri_cte} GROUP BY 1, 2
),
tg_ctx1 AS (
  SELECT _w2, sum(c_tri)::BIGINT AS c_ctx1 FROM {tri_cte} GROUP BY 1
),
tg_uni3 AS (
  SELECT _w3, sum(c_tri)::BIGINT AS c_uni3 FROM {tri_cte} GROUP BY 1
),
tg_n AS (
  SELECT CASE WHEN coalesce(sum(c_tri), 0) >= 1
              THEN coalesce(sum(c_tri), 0)::BIGINT
              ELSE error('lm trigram reference model is empty (no triples)')
         END AS _n
  FROM {tri_cte}
),
tg_triples AS (
  SELECT {id_expr} AS _id{k_sel},
         toks[_i] AS _w1, toks[_i + 1] AS _w2, toks[_i + 2] AS _w3
  FROM (SELECT {id_expr}{k_sel}, {toks_expr} AS toks FROM {docs_relation}),
       LATERAL unnest(range(1, greatest(len(toks) - 2, 0) + 1)) r(_i)
),
tg_scored AS (
  SELECT p._id{k_p},
         ({FP_BITS * 1000}::BIGINT - {log2_milli_sql(m)}) AS bits_milli
  FROM tg_triples p
  LEFT JOIN {tri_cte} t3
    ON p._w1 = t3._w1 AND p._w2 = t3._w2 AND p._w3 = t3._w3
  LEFT JOIN tg_ctx2 x2 ON p._w1 = x2._w1 AND p._w2 = x2._w2
  LEFT JOIN tg_bi23 b23 ON p._w2 = b23._w2 AND p._w3 = b23._w3
  LEFT JOIN tg_ctx1 x1 ON p._w2 = x1._w2
  LEFT JOIN tg_uni3 u3 ON p._w3 = u3._w3
  CROSS JOIN tg_n t
),
tg_xent AS (
  SELECT _id{k_sel}, count(*)::BIGINT AS n_trigrams,
         (sum(bits_milli)::BIGINT // count(*))::BIGINT AS xent_milli
  FROM tg_scored GROUP BY ALL
)"""


# ---------------------------------------------------------------------------
# ARPA n-gram model ingestion — the REAL-model lane without a model
# library. KenLM (CCNet's scorer) interchanges models as ARPA text
# (\data\ counts, \N-grams: sections of "log10prob words [backoff]");
# parsing one into broadcastable tables lets the engine score a corpus
# under a PRETRAINED reference LM with plain joins — no kenlm import,
# no model server, the only way a 100 TB scoring pass works.
#
# Determinism discipline: the file's float log10 probabilities are
# quantized to INTEGER MILLI-UNITS at parse time (round(logp * 1000)),
# so every per-doc sum is a bigint — order-independent, bit-identical
# across engines and partitionings. Quantization costs < 0.0005
# log10-units per token: irrelevant for filtering thresholds and far
# below the model's own estimation error.


def parse_arpa(text: str) -> dict[int, list[tuple]]:
    """Parse ARPA text → {order: [(w1..wn, logp_milli, backoff_milli)]}.

    Follows the published format: a ``\\data\\`` header with per-order
    counts, one ``\\N-grams:`` section per order with
    ``log10prob<ws>w1 .. wN[<ws>log10backoff]`` rows, ``\\end\\``.
    Missing backoff = 0 (the ARPA convention for highest-order rows
    and for entries that never appear as a context). Malformed rows
    raise, each section's row count is checked against the ``\\data\\``
    declaration, and a missing ``\\end\\`` raises — a model truncated
    even at a clean row boundary must fail loud, not score garbage."""
    out: dict[int, list[tuple]] = {}
    declared: dict[int, int] = {}
    order = 0
    in_data = False
    saw_end = False
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line == "\\data\\":
            in_data = True
            continue
        if line == "\\end\\":
            saw_end = True
            break
        if line.endswith("-grams:") and line.startswith("\\"):
            order = int(line[1:].split("-")[0])
            out[order] = []
            in_data = False
            continue
        if in_data:
            if not line.startswith("ngram "):
                raise ValueError(f"malformed \\data\\ line: {raw!r}")
            spec = line[len("ngram ") :]
            n_str, _, cnt_str = spec.partition("=")
            try:
                declared[int(n_str)] = int(cnt_str)
            except ValueError:
                raise ValueError(f"malformed \\data\\ line: {raw!r}") from None
            continue
        if order == 0:
            raise ValueError(f"n-gram row before any section: {raw!r}")
        parts = line.split()
        if len(parts) == order + 2:  # trailing backoff
            logp, words, bo = parts[0], parts[1:-1], parts[-1]
        elif len(parts) == order + 1:
            logp, words, bo = parts[0], parts[1:], "0"
        else:
            raise ValueError(f"malformed {order}-gram row: {raw!r}")
        out[order].append(
            (*words, round(float(logp) * 1000), round(float(bo) * 1000))
        )
    if not out:
        raise ValueError("no n-gram sections found (not an ARPA file?)")
    if not saw_end:
        raise ValueError("ARPA file missing \\end\\ marker (truncated?)")
    for n, cnt in declared.items():
        got = len(out.get(n, []))
        if got != cnt:
            raise ValueError(
                f"\\data\\ declares {cnt} {n}-grams but section has "
                f"{got} rows (truncated or corrupt model)"
            )
    for n in out:
        if n not in declared:
            raise ValueError(
                f"{n}-gram section present but undeclared in \\data\\"
            )
    return out


def arpa_bigram_tables(spark, parsed: dict[int, list[tuple]]):
    """(unigrams, bigrams) DataFrames from a parsed order-≥2 ARPA
    model: ``(w, logp_milli, bo_milli)`` and ``(w1, w2, logp_milli)``.
    Both are vocab-bounded → broadcast at any corpus size.

    Both frames carry the parsed rows (``._arpa_parsed``, same
    invariant as :func:`arpa_tables`: a caller that filters/replaces a
    frame must not keep the attribute) so
    :func:`arpa_bigram_logprob_milli` can inline small models as
    literal maps — the order-2 twin of the generalized scorer's
    inline path."""
    uni = spark.createDataFrame(
        [(w, lp, bo) for (w, lp, bo) in parsed.get(1, [])],
        "w string, logp_milli bigint, bo_milli bigint",
    )
    bi = spark.createDataFrame(
        [(w1, w2, lp) for (w1, w2, lp, _bo) in parsed.get(2, [])],
        "w1 string, w2 string, logp_milli bigint",
    )
    uni._arpa_parsed = parsed
    bi._arpa_parsed = parsed
    return uni, bi


#: -log10 prob (milli) assigned to a token absent from the model's
#: vocabulary when the model ships no <unk> entry
ARPA_OOV_MILLI = -99_000


def arpa_bigram_logprob_milli(
    docs: DataFrame,
    id_col: str,
    toks_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    unk_milli: int = ARPA_OOV_MILLI,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-doc mean NEGATIVE log10-likelihood (milli-units) under a
    pretrained ARPA bigram model with Katz backoff →
    ``(id_col, *keep_cols, n_bigrams, nll10_milli)``.

    Per adjacent pair (w1, w2):

        logp = P2(w1, w2)                     if the bigram is listed
             = backoff(w1) + P1(w2)           otherwise
        (backoff absent → 0; w2 unseen → the model's <unk> entry if
         present, else ``unk_milli``)

    — the standard ARPA evaluation rule. Every term is an integer
    milli-log10, so sums are exact. Each per-pair logp is clamped at
    ≤ 0 (identically in both engines): real ARPA files can carry
    POSITIVE backoff weights, so an un-clamped backoff path
    ``bo(w1) + P1(w2)`` could push a per-doc sum positive — negated it
    goes negative, where Spark's trunc-div and DuckDB's floor-div
    diverge by 1. With the clamp the mean always divides a
    NON-NEGATIVE total by a positive count, where the two engines
    agree exactly (a probability > 1 is a model artifact anyway). Docs
    with
    < 2 tokens are dropped. Plan: one pair explode → three broadcast
    equi-joins → one keyed agg; one corpus scan.

    Lookup strategy (guide §2.4, the order-2 twin of
    :func:`arpa_ngram_logprob_milli`'s inline path): when the tables
    came from :func:`arpa_bigram_tables` (parsed rows attached), the
    entry count is at most ``ARPA_INLINE_MAX_ENTRIES``, keys are
    unique, and every model token is space-free, the model is INLINED
    as literal maps — the three broadcast joins + the 1-row crossJoin
    become ``try_element_at`` projections and the scoring pass is one
    codegen stage with zero exchanges. The space-free guard is what
    makes the bigram map key (``concat(_w1, ' ', _w2)``, NULL-strict)
    provably equivalent to the two-column equi-join: with space-free
    model tokens every map key is exactly two words, so a corpus pair
    whose tokens embed spaces (≥3 words joined) can match neither the
    map nor the join. Larger/duplicate-key/space-bearing models keep
    the broadcast-join path — the correct 100 TB shape."""
    keep = keep_cols or []
    parsed = getattr(unigrams, "_arpa_parsed", None)
    pairs = bigram_pairs(docs, toks_col, [id_col, *keep])
    inline = (
        parsed is not None
        and parsed is getattr(bigrams, "_arpa_parsed", object())
        and len(parsed.get(1, ())) + len(parsed.get(2, ()))
        <= ARPA_INLINE_MAX_ENTRIES
        and len({w for (w, _lp, _bo) in parsed.get(1, ())})
        == len(parsed.get(1, ()))
        and len({(w1, w2) for (w1, w2, _lp, _bo) in parsed.get(2, ())})
        == len(parsed.get(2, ()))
        and all(
            " " not in w
            for row in parsed.get(2, ())
            for w in row[:2]
        )
    )
    if inline:
        def lit_map(entries):
            args: list = []
            for key, milli in entries:
                args += [F.lit(key), F.lit(int(milli)).cast("bigint")]
            return F.create_map(*args) if args else None

        def lookup(m, key_col):
            if m is None:
                return F.lit(None).cast("bigint")
            return F.try_element_at(m, key_col)

        unks = [lp for (w, lp, _bo) in parsed.get(1, ()) if w == "<unk>"]
        unkp = min(unks) if unks else unk_milli
        scored = pairs.select(
            "*",
            lookup(
                lit_map(
                    [(f"{w1} {w2}", lp) for (w1, w2, lp, _bo) in parsed.get(2, ())]
                ),
                # concat (not concat_ws): NULL-strict, so a NULL token
                # yields a NULL key and a NULL lookup — exactly the
                # equi-join's null-never-matches behavior
                F.concat(F.col("_w1"), F.lit(" "), F.col("_w2")),
            ).alias("_p2"),
            lookup(
                lit_map([(w, bo) for (w, _lp, bo) in parsed.get(1, ())]),
                F.col("_w1"),
            ).alias("_bo1"),
            lookup(
                lit_map([(w, lp) for (w, lp, _bo) in parsed.get(1, ())]),
                F.col("_w2"),
            ).alias("_p1w2"),
            F.lit(int(unkp)).cast("bigint").alias("_unkp"),
        ).withColumn(
            "_logp",
            F.least(
                F.coalesce(
                    F.col("_p2"),
                    F.coalesce(F.col("_bo1"), F.lit(0))
                    + F.coalesce(F.col("_p1w2"), F.col("_unkp")),
                ),
                F.lit(0),
            ).cast("bigint"),
        )
        return (
            scored.groupBy(F.col(id_col), *[F.col(c) for c in keep])
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.sum("_logp").cast("bigint").alias("_sum_logp"),
            )
            .select(
                id_col,
                *keep,
                "n_bigrams",
                F.expr("cast((-_sum_logp) div n_bigrams as bigint)").alias(
                    "nll10_milli"
                ),
            )
        )
    unk = unigrams.filter(F.col("w") == "<unk>").select(
        F.col("logp_milli").alias("_unk")
    )
    bo1 = unigrams.select(
        F.col("w").alias("_w1"), F.col("bo_milli").alias("_bo1")
    )
    p2 = unigrams.select(
        F.col("w").alias("_w2"), F.col("logp_milli").alias("_p1w2")
    )
    bi = bigrams.select(
        F.col("w1").alias("_w1"),
        F.col("w2").alias("_w2"),
        F.col("logp_milli").alias("_p2"),
    )
    unk_row = unk.agg(
        F.coalesce(F.min("_unk"), F.lit(unk_milli)).cast("bigint").alias("_unkp")
    )
    scored = (
        pairs.join(F.broadcast(bi), ["_w1", "_w2"], "left")
        .join(F.broadcast(bo1), "_w1", "left")
        .join(F.broadcast(p2), "_w2", "left")
        .crossJoin(F.broadcast(unk_row))
        .withColumn(
            "_logp",
            F.least(
                F.coalesce(
                    F.col("_p2"),
                    F.coalesce(F.col("_bo1"), F.lit(0))
                    + F.coalesce(F.col("_p1w2"), F.col("_unkp")),
                ),
                F.lit(0),
            ).cast("bigint"),
        )
    )
    return (
        scored.groupBy(F.col(id_col), *[F.col(c) for c in keep])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("_logp").cast("bigint").alias("_sum_logp"),
        )
        .select(
            id_col,
            *keep,
            "n_bigrams",
            F.expr("cast((-_sum_logp) div n_bigrams as bigint)").alias(
                "nll10_milli"
            ),
        )
    )


def arpa_bigram_logprob_sql(
    toks_expr: str,
    id_expr: str,
    docs_relation: str,
    uni_cte: str,
    bi_cte: str,
    unk_milli: int = ARPA_OOV_MILLI,
    keep_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`arpa_bigram_logprob_milli` given
    ``uni_cte(w, logp_milli, bo_milli)`` and
    ``bi_cte(w1, w2, logp_milli)`` → CTE chain ending in
    ``ar_xent(_id, *keep, n_bigrams, nll10_milli)``."""
    keep = keep_cols or []
    k_sel = "".join(f", {c}" for c in keep)
    k_p = "".join(f", p.{c}" for c in keep)
    return f"""
ar_unk AS (
  SELECT coalesce(min(logp_milli), {unk_milli})::BIGINT AS _unkp
  FROM {uni_cte} WHERE w = '<unk>'
),
ar_pairs AS (
  SELECT {id_expr} AS _id{k_sel}, toks[_i] AS _w1, toks[_i + 1] AS _w2
  FROM (SELECT {id_expr}{k_sel}, {toks_expr} AS toks FROM {docs_relation}),
       LATERAL unnest(range(1, greatest(len(toks) - 1, 0) + 1)) r(_i)
),
ar_scored AS (
  SELECT p._id{k_p},
         least(coalesce(b.logp_milli,
                        coalesce(u1.bo_milli, 0)
                        + coalesce(u2.logp_milli, k._unkp)), 0)::BIGINT AS logp
  FROM ar_pairs p
  LEFT JOIN {bi_cte} b ON p._w1 = b.w1 AND p._w2 = b.w2
  LEFT JOIN {uni_cte} u1 ON p._w1 = u1.w
  LEFT JOIN {uni_cte} u2 ON p._w2 = u2.w
  CROSS JOIN ar_unk k
),
ar_xent AS (
  SELECT _id{k_sel}, count(*)::BIGINT AS n_bigrams,
         ((-sum(logp))::BIGINT // count(*))::BIGINT AS nll10_milli
  FROM ar_scored GROUP BY ALL
)"""


# ---------------------------------------------------------------------------
# Arbitrary-order ARPA scoring — the real 5-gram CCNet path. CCNet
# (Wenzek et al. 2020 §3) filters with 5-gram KenLM models shipped as
# ARPA exports; the bigram scorer above is the order-2 special case of
# the Katz recursion this section implements for any order:
#
#   score(w1..wN) = logp_N(w1..wN)                 if the N-gram is listed
#                 = bo(w1..w_{N-1}) + score(w2..wN) otherwise
#                   (backoff of an unlisted context = 0)
#
# which closed-forms to: find the LONGEST listed suffix (length k*),
# then  score = logp_{k*}(suffix) + Σ_{j=k*..N-1} bo(last-j context).
# Distributed shape: one window explode → (2N−1) broadcast equi-joins
# (N suffix-probability lookups + N−1 context-backoff lookups, every
# table vocab-bounded) → one keyed aggregation. One corpus scan at any
# order — the scan cost dominates at 100 TB, the joins are map-side.


#: total parsed entries at or below which :func:`arpa_ngram_logprob_milli`
#: inlines the model into the scoring plan as literal maps (one
#: ``try_element_at`` per lookup) instead of broadcast equi-joins. The
#: model is a compile-time CONSTANT of the query — its size does not
#: grow with the corpus — so for small models the (2N−1) broadcast
#: exchanges + join operators are pure plan overhead: measured r14 at
#: sf0.1, the 42-entry 5-gram fixture scored the corpus_build_v11
#: lineage in 2.38s inlined vs 5.38s joined (bit-identical output).
#: Real CCNet-scale KenLM exports (~1e8 n-grams) stay on the
#: broadcast-join path, which is the correct 100 TB shape; the
#: threshold is bounded by codegen expression size, not memory.
ARPA_INLINE_MAX_ENTRIES = 2048


class _ArpaTables(dict):
    """``{order: DataFrame}`` that also remembers the parsed rows so
    the scorer can inline small models as literal maps (the DataFrame
    form stays authoritative for large models and for callers that
    build the dict by hand)."""

    parsed: dict[int, list[tuple]] | None = None


def arpa_tables(spark, parsed: dict[int, list[tuple]]):
    """{order: DataFrame(gram, logp_milli, bo_milli)} from a parsed
    ARPA model; ``gram`` is the space-joined token tuple so every
    lookup at every order is a single string equi-join key. ARPA
    orders must be contiguous from 1 (the format guarantees it; a
    model that skips an order fails loud here rather than silently
    scoring with a hole in the backoff chain). The returned mapping
    carries the parsed rows (``.parsed``) so the scorer can choose the
    inline-literal plan for small models.

    Invariant: ``.parsed`` must stay in sync with the per-order
    DataFrames. A caller that replaces or filters one of the mapping's
    DataFrames must drop ``.parsed`` (or rebuild via this function) —
    otherwise the scorer's inline path would silently score from the
    stale attached rows. Callers that build the ``{order: DataFrame}``
    dict by hand get the join path, for which the DataFrames are
    authoritative."""
    orders = sorted(parsed)
    if orders != list(range(1, len(orders) + 1)):
        raise ValueError(f"non-contiguous ARPA orders: {orders}")
    out = _ArpaTables()
    for n in orders:
        out[n] = spark.createDataFrame(
            [(" ".join(r[:-2]), r[-2], r[-1]) for r in parsed[n]],
            "gram string, logp_milli bigint, bo_milli bigint",
        )
    out.parsed = parsed
    return out


def arpa_ngram_logprob_milli(
    docs: DataFrame,
    id_col: str,
    toks_col: str,
    tables: dict[int, DataFrame],
    order: int | None = None,
    unk_milli: int = ARPA_OOV_MILLI,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-doc mean NEGATIVE log10-likelihood (milli-units) under a
    pretrained ARPA model of ANY order with Katz backoff →
    ``(id_col, *keep_cols, n_ngrams, nll10_milli)``.

    Every full-width window of ``order`` adjacent tokens is scored
    with the longest-listed-suffix rule (module comment above); docs
    shorter than ``order`` tokens are dropped, mirroring the
    order-2 lane's < 2-token rule. Per-window logp is clamped at ≤ 0
    (identically in the SQL twin) so the negated per-doc sum stays
    non-negative, where Spark trunc-div and DuckDB floor-div agree.

    The cascade evaluates as a single chained CASE over the looked-up
    columns — whole-stage-codegen friendly, no UDFs.

    Lookup strategy (guide §2.4 — remove exchanges outright): when
    ``tables`` came from :func:`arpa_tables` (so the parsed rows are
    attached), the total entry count is at most
    ``ARPA_INLINE_MAX_ENTRIES``, and every order's keys are unique,
    the model is INLINED into the plan as literal maps — each of the
    (2N−1) lookups becomes one ANSI-safe ``try_element_at`` projection
    and the whole scoring pass is a single codegen stage with zero
    broadcast exchanges. Larger models (real KenLM exports) take the
    broadcast equi-join path, the correct 100 TB shape. A model with
    duplicate keys also falls back to the join path, which preserves
    its (row-duplicating) left-join semantics exactly."""
    n = order or max(tables)
    if n < 2:
        raise ValueError(f"order must be >= 2, got {n}")
    for k in range(1, n + 1):
        if k not in tables:
            raise ValueError(f"model has no {k}-gram table (order {n})")
    keep = keep_cols or []
    toks = F.col(toks_col)
    wins = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.explode(
            F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.slice(toks, i, n),
                ),
            ).otherwise(F.array().cast("array<array<string>>"))
        ).alias("_win"),
    )
    keyed = wins.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        *[
            F.array_join(F.slice(F.col("_win"), n - k + 1, k), " ").alias(f"_s{k}")
            for k in range(1, n + 1)
        ],
        *[
            F.array_join(F.slice(F.col("_win"), n - j, j), " ").alias(f"_c{j}")
            for j in range(1, n)
        ],
    )
    parsed = getattr(tables, "parsed", None)
    # Uniqueness is checked on the SPACE-JOINED key — the key the
    # literal map (and the equi-join) actually uses. Two distinct
    # token tuples at one order can collide after joining when tokens
    # contain spaces (("a b","c") vs ("a","b c")); tuple-level
    # uniqueness would pass such a model into create_map, which raises
    # DUPLICATED_MAP_KEY under Spark's default policy where the join
    # path row-duplicates instead. Joined-key uniqueness sends it down
    # the join path, preserving those semantics.
    inline = (
        parsed is not None
        and sum(len(parsed.get(k, ())) for k in range(1, n + 1))
        <= ARPA_INLINE_MAX_ENTRIES
        and all(
            len({" ".join(r[:-2]) for r in parsed.get(k, ())})
            == len(parsed.get(k, ()))
            for k in range(1, n + 1)
        )
    )
    if inline:
        def lit_map(entries):
            args: list = []
            for gram, milli in entries:
                args += [F.lit(gram), F.lit(int(milli)).cast("bigint")]
            return F.create_map(*args) if args else None

        def lookup(m, key):
            # try_element_at: NULL on a missing key (matches the left
            # join) even under ANSI, where element_at would raise
            if m is None:
                return F.lit(None).cast("bigint")
            return F.try_element_at(m, F.col(key))

        unks = [r[-2] for r in parsed[1] if r[:-2] == ("<unk>",)]
        unkp = min(unks) if unks else unk_milli
        cur = keyed.select(
            "*",
            *[
                lookup(
                    lit_map(
                        [(" ".join(r[:-2]), r[-2]) for r in parsed[k]]
                    ),
                    f"_s{k}",
                ).alias(f"_p{k}")
                for k in range(1, n + 1)
            ],
            *[
                lookup(
                    lit_map(
                        [(" ".join(r[:-2]), r[-1]) for r in parsed[j]]
                    ),
                    f"_c{j}",
                ).alias(f"_bo{j}")
                for j in range(1, n)
            ],
            F.lit(int(unkp)).cast("bigint").alias("_unkp"),
        )
    else:
        unk_row = (
            tables[1]
            .filter(F.col("gram") == "<unk>")
            .agg(
                F.coalesce(F.min("logp_milli"), F.lit(unk_milli))
                .cast("bigint")
                .alias("_unkp")
            )
        )
        cur = keyed
        for k in range(1, n + 1):
            tk = tables[k].select(
                F.col("gram").alias(f"_s{k}"),
                F.col("logp_milli").alias(f"_p{k}"),
            )
            cur = cur.join(F.broadcast(tk), f"_s{k}", "left")
        for j in range(1, n):
            tj = tables[j].select(
                F.col("gram").alias(f"_c{j}"),
                F.col("bo_milli").alias(f"_bo{j}"),
            )
            cur = cur.join(F.broadcast(tj), f"_c{j}", "left")
        cur = cur.crossJoin(F.broadcast(unk_row))
    cascade = F.coalesce(F.col("_p1"), F.col("_unkp"))
    for m in range(2, n + 1):
        cascade = F.when(F.col(f"_p{m}").isNotNull(), F.col(f"_p{m}")).otherwise(
            F.coalesce(F.col(f"_bo{m - 1}"), F.lit(0)) + cascade
        )
    scored = cur.withColumn("_logp", F.least(cascade, F.lit(0)).cast("bigint"))
    return (
        scored.groupBy(F.col(id_col), *[F.col(c) for c in keep])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            F.sum("_logp").cast("bigint").alias("_sum_logp"),
        )
        .select(
            id_col,
            *keep,
            "n_ngrams",
            F.expr("cast((-_sum_logp) div n_ngrams as bigint)").alias(
                "nll10_milli"
            ),
        )
    )


def arpa_ngram_logprob_sql(
    toks_expr: str,
    id_expr: str,
    docs_relation: str,
    gram_ctes: dict[int, str],
    order: int,
    unk_milli: int = ARPA_OOV_MILLI,
    keep_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`arpa_ngram_logprob_milli` given one CTE
    name per order, each ``(gram, logp_milli, bo_milli)`` → CTE chain
    ending in ``arn_xent(_id, *keep, n_ngrams, nll10_milli)``. The
    window indexing, join keys, CASE cascade and ≤0 clamp mirror the
    Spark lane token for token."""
    n = order
    keep = keep_cols or []
    k_sel = "".join(f", {c}" for c in keep)
    k_w = "".join(f", w.{c}" for c in keep)
    suffix_keys = ",\n         ".join(
        "concat_ws(' ', "
        + ", ".join(f"toks[_i + {m}]" for m in range(n - k, n))
        + f") AS _s{k}"
        for k in range(1, n + 1)
    )
    ctx_keys = ",\n         ".join(
        "concat_ws(' ', "
        + ", ".join(f"toks[_i + {m}]" for m in range(n - 1 - j, n - 1))
        + f") AS _c{j}"
        for j in range(1, n)
    )
    p_joins = "\n  ".join(
        f"LEFT JOIN {gram_ctes[k]} p{k} ON w._s{k} = p{k}.gram"
        for k in range(1, n + 1)
    )
    bo_joins = "\n  ".join(
        f"LEFT JOIN {gram_ctes[j]} b{j} ON w._c{j} = b{j}.gram"
        for j in range(1, n)
    )
    cascade = f"coalesce(p1.logp_milli, k._unkp)"
    for m in range(2, n + 1):
        cascade = (
            f"CASE WHEN p{m}.logp_milli IS NOT NULL THEN p{m}.logp_milli "
            f"ELSE coalesce(b{m - 1}.bo_milli, 0) + {cascade} END"
        )
    return f"""
arn_unk AS (
  SELECT coalesce(min(logp_milli), {unk_milli})::BIGINT AS _unkp
  FROM {gram_ctes[1]} WHERE gram = '<unk>'
),
arn_wins AS (
  SELECT {id_expr} AS _id{k_sel},
         {suffix_keys},
         {ctx_keys}
  FROM (SELECT {id_expr}{k_sel}, {toks_expr} AS toks FROM {docs_relation}),
       LATERAL unnest(range(1, greatest(len(toks) - {n} + 1, 0) + 1)) r(_i)
),
arn_scored AS (
  SELECT w._id{k_w},
         least({cascade}, 0)::BIGINT AS logp
  FROM arn_wins w
  {p_joins}
  {bo_joins}
  CROSS JOIN arn_unk k
),
arn_xent AS (
  SELECT _id{k_sel}, count(*)::BIGINT AS n_ngrams,
         ((-sum(logp))::BIGINT // count(*))::BIGINT AS nll10_milli
  FROM arn_scored GROUP BY ALL
)"""


# ---------------------------------------------------------------------------
# Shared CCNet bucketing — ONE builder for every scorer order. The
# head/middle/tail split is identical whatever produced the per-doc
# cross-entropy (unigram, JM bigram/trigram, ARPA n-gram): per-language
# tertiles over (xent, doc_id), per-bucket counts + xent band. Keeping
# it here means the surface grows linearly in SCORERS, not in
# (scorers x bucketing) gate pairs, and the keyed-window (no global
# sort) discipline is pinned once.


def ccnet_buckets(
    scored: DataFrame,
    xent_col: str = "xent_milli",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail bucketing over ANY per-doc xent frame →
    ``(lang, bucket, n_docs, min_xent_milli, max_xent_milli)``.
    ntile(3) over the total order (xent, id) PARTITIONED BY language —
    a keyed window, so no partition ever holds more than one
    language's docs and there is no global sort at any corpus size."""
    w = Window.partitionBy(lang_col).orderBy(xent_col, id_col)
    return (
        scored.withColumn("bucket", F.ntile(3).over(w).cast("bigint"))
        .groupBy(lang_col, "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(xent_col).cast("bigint").alias("min_xent_milli"),
            F.max(xent_col).cast("bigint").alias("max_xent_milli"),
        )
    )


def ccnet_buckets_sql(
    xent_cte: str,
    xent_col: str = "xent_milli",
    id_expr: str = "_id",
    lang_col: str = "lang",
) -> str:
    """DuckDB twin of :func:`ccnet_buckets`: a ``cb_bucketed`` CTE body
    plus the final SELECT, to append after the scorer's xent chain."""
    return f"""cb_bucketed AS (
  SELECT {lang_col}, {xent_col},
         ntile(3) OVER (PARTITION BY {lang_col}
                        ORDER BY {xent_col}, {id_expr}) AS bucket
  FROM {xent_cte}
)
SELECT {lang_col}, bucket::BIGINT AS bucket, count(*)::BIGINT AS n_docs,
       min({xent_col})::BIGINT AS min_xent_milli,
       max({xent_col})::BIGINT AS max_xent_milli
FROM cb_bucketed GROUP BY {lang_col}, bucket"""


def with_sentence_bounds(toks: Column, order: int) -> Column:
    """KenLM-exact sentence framing: pad the token array with
    ``order−1`` leading ``<s>`` markers and one trailing ``</s>``.
    Real KenLM evaluation conditions a sentence's first tokens on
    ``<s>`` and scores the ``</s>`` transition; the unpadded window
    scorer instead skips the first ``order−1`` positions entirely.
    With the padding every real token (plus the end transition) gets
    scored — ``n_ngrams = len(toks) + 1`` — matching
    ``kenlm.Model.score(text, bos=True, eos=True)`` window for
    window. An empty doc scores the single window
    ``<s>…<s> </s>`` instead of being dropped."""
    return F.concat(
        F.array_repeat(F.lit("<s>"), order - 1), toks, F.array(F.lit("</s>"))
    )


def sentence_bounds_sql(toks_expr: str, order: int) -> str:
    """DuckDB twin of :func:`with_sentence_bounds`."""
    bos = ", ".join(["'<s>'"] * (order - 1))
    return f"([{bos}] || {toks_expr} || ['</s>'])"
