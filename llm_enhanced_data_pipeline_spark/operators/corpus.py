"""Corpus-construction operators for LLM training-data pipelines.

The reference stops at cleaning/dedup/enrichment of a paper corpus
(`Data_Enhancement/bulid_final_dataset.py`); everything here is the
next stage a 100 TB training-data build needs: deterministic splits,
domain-weighted sampling, per-domain token quotas, sequence packing,
eval-set decontamination, and Gopher-style repetition signals.

Design rules (same as the rest of the package):

- Every semantics-bearing hash is md5-derived (``functions.hashing``)
  so the DuckDB oracle reproduces decisions bit-for-bit — sampling and
  split decisions are *auditable*, not engine-private.
- Sampling rates/thresholds are integer per-mille values compared
  against integer hash buckets: no floating-point boundary can flip a
  row between engines (or between runs at different parallelism).
- Everything is a pure column expression or a single keyed window —
  no Python row loops, no driver-side state. Per-domain windows
  parallelize across domains; the only sequential dependency is the
  per-domain prefix scan the quota/packing semantics inherently need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing

#: Number of hash buckets all split/sample decisions are made over.
#: 1000 buckets = per-mille resolution, plenty for corpus mixing and
#: small enough that every (seed, key) decision is one md5.
SPLIT_BUCKETS = 1000


# ---------------------------------------------------------------------------
# Deterministic splits / sampling
# ---------------------------------------------------------------------------


def split_bucket(key: Column, seed: int = 11) -> Column:
    """Stable per-mille bucket in [0, 1000) for a string key column.

    The bucket is a pure function of (seed, key): reshuffling,
    repartitioning, or re-running the job never moves a row between
    splits — the property that makes train/test membership durable
    across pipeline versions.
    """
    return hashing.stable_hash32(key, seed=seed) % SPLIT_BUCKETS


def split_bucket_sql(expr: str, seed: int = 11) -> str:
    """DuckDB twin of :func:`split_bucket`."""
    return f"({hashing.stable_hash32_sql(expr, seed)} % {SPLIT_BUCKETS})"


def split_label(
    key: Column,
    train_permille: int = 900,
    val_permille: int = 50,
    seed: int = 11,
) -> Column:
    """'train' / 'val' / 'test' label from the hash bucket.

    Bucket ranges: [0, train) → train, [train, train+val) → val,
    the rest → test. Integer thresholds — no FP boundary ambiguity.
    """
    b = split_bucket(key, seed=seed)
    return (
        F.when(b < train_permille, F.lit("train"))
        .when(b < train_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_label_sql(
    expr: str, train_permille: int = 900, val_permille: int = 50, seed: int = 11
) -> str:
    b = split_bucket_sql(expr, seed)
    return (
        f"(CASE WHEN {b} < {train_permille} THEN 'train' "
        f"WHEN {b} < {train_permille + val_permille} THEN 'val' "
        f"ELSE 'test' END)"
    )


def sample_keep(key: Column, rate_permille: Column, seed: int = 7) -> Column:
    """Deterministic Bernoulli(rate/1000) keep decision per key.

    ``rate_permille`` may be a per-row column (domain-dependent mixing
    weights). Integer-vs-integer comparison: exact, engine-portable.
    """
    return split_bucket(key, seed=seed) < rate_permille


def sample_keep_sql(expr: str, rate_permille_expr: str, seed: int = 7) -> str:
    return f"({split_bucket_sql(expr, seed)} < ({rate_permille_expr}))"


# ---------------------------------------------------------------------------
# Per-domain token quotas
# ---------------------------------------------------------------------------


def token_budget_filter(
    df: DataFrame,
    domain_col: str,
    tokens_col: str,
    order_cols: list[Column],
    budget: int,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Keep rows per domain, in priority order, until a token budget.

    A row survives iff the running token total *including it* is within
    budget — the classic "take the best docs until the domain quota is
    full" corpus-mixing rule. One hash-partitioned window per domain:
    domains fill in parallel, and the per-domain prefix sum is the
    minimum sequential work the semantics allow. No driver state.
    """
    w = Window.partitionBy(domain_col).orderBy(*order_cols)
    return df.withColumn(cum_col, F.sum(tokens_col).over(w)).filter(
        F.col(cum_col) <= budget
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    part_col: str,
    order_cols: list[Column],
    tokens_col: str,
    seq_len: int,
) -> DataFrame:
    """Assign each document a training-sequence id by concat-and-chunk.

    Documents are laid end-to-end per partition column (shard) in a
    deterministic order; sequence ``i`` covers token offsets
    [i*seq_len, (i+1)*seq_len). A document belongs to the sequence its
    FIRST token lands in; ``spans_boundary`` marks documents that cross
    into the next sequence (the ones a loss mask would split).

    Columns added: ``start_offset``, ``seq_id``, ``spans_boundary``.
    Per-shard windows keep packing embarrassingly parallel across
    shards — the global corpus never needs a total order.
    """
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("start_offset")
    df = df.withColumn("start_offset", start)
    seq_id = F.floor(F.col("start_offset") / seq_len)
    end_seq = F.floor((F.col("start_offset") + F.col(tokens_col) - 1) / seq_len)
    return df.withColumn("seq_id", seq_id).withColumn(
        "spans_boundary", (end_seq > seq_id).cast("int")
    )


# ---------------------------------------------------------------------------
# N-gram machinery shared by decontamination / repetition signals
# ---------------------------------------------------------------------------


def ngram_hashes_sql(token_hashes_expr: str, n: int) -> str:
    """DuckDB list of rolling n-gram hashes over per-token hash list.

    Twin of ``operators.dedup.shingle_hash_rows`` arithmetic for any n:
    fold over n consecutive token hashes with (acc*131 + h) mod p.
    ``token_hashes_expr`` must be a BIGINT list (``stable_hash32`` per
    token, see ``dedup_q._TOKHASH``).
    """
    p = hashing.ROLLING_PRIME
    acc = f"(_th[_i] % {p})"
    for k in range(1, n):
        acc = f"(({acc} * 131 + _th[_i + {k}]) % {p})"
    return (
        f"list_transform(range(1, greatest(len(_th) - {n - 1}, 0) + 1), _i -> {acc})"
    )


def contamination_scores(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    token_col: str,
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-train-document overlap with the eval set's n-gram universe.

    Returns (id, n_grams, n_hit, contamination): distinct n-gram hashes
    per train doc, how many also occur anywhere in the eval set, and
    the ratio. The membership test is an equi-join on the n-gram hash —
    never a doc×doc comparison — so cost is O(corpus n-grams), not
    O(train×eval).

    At 100 TB the train side dominates; the eval n-gram universe (a few
    benchmarks) is small and is broadcast by default so the train-side
    scan joins map-side with no shuffle of the big table. Set
    ``broadcast_eval=False`` if the eval universe is itself huge.
    """
    from . import dedup

    train_grams = dedup.shingle_hash_rows(train, id_col, token_col, n=n).distinct()
    eval_grams = (
        dedup.shingle_hash_rows(eval_df, id_col, token_col, n=n)
        .select("_sh")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    joined = train_grams.join(eval_grams, "_sh", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, token_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition signals from n-grams.

    Per document: ``n_ngrams`` (total), ``n_distinct``, ``top_count``
    (occurrences of the most frequent n-gram), ``dup_count`` (n-grams
    occurring more than once, counting every occurrence) — the inputs
    to the duplicate-n-gram-fraction and top-n-gram-fraction quality
    rules of Rae et al. 2021 (Gopher), §A1.1.

    Shape: explode → two hash aggregations keyed on the doc id. The
    n-gram hashing reuses the codegen-friendly exploded rolling-hash
    window (NOT nested array lambdas, which run interpreted and
    re-evaluate captured subtrees per element).
    """
    from . import dedup

    grams = dedup.shingle_hash_rows(df, id_col, token_col, n=n)
    per_gram = grams.groupBy(id_col, "_sh").agg(F.count(F.lit(1)).alias("_c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("_c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("_c").alias("top_count"),
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))).alias(
            "dup_count"
        ),
    )


# ---------------------------------------------------------------------------
# Document chunking (RAG / context-window preparation)
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    chunk_size: int,
    stride: int,
) -> DataFrame:
    """Explode documents into overlapping token windows.

    Chunk ``i`` covers tokens [i*stride, i*stride + chunk_size); the
    last chunk starts at the smallest multiple of ``stride`` that still
    reaches the document's end (so every token lands in >=1 chunk).
    Zero-token documents produce zero chunks.

    Adds ``chunk_idx`` (bigint) and ``chunk_tokens`` (array). Pure
    sequence-explode + slice — row-parallel, no window, no shuffle;
    the downstream embed/index stages see independent chunk rows.
    """
    size = F.size(F.col(token_col))
    n_extra = F.greatest(
        F.ceil((size - F.lit(chunk_size)).cast("double") / stride).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    out = (
        df.filter(size > 0)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0).cast("bigint"), n_extra)))
        .withColumn(
            "chunk_tokens",
            F.slice(
                F.col(token_col),
                (F.col("chunk_idx") * stride + 1).cast("int"),
                chunk_size,
            ),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Span-level exact dedup (pretraining-corpus hygiene)
# ---------------------------------------------------------------------------


def chunk_dedup(
    df: DataFrame,
    id_col: str,
    token_col: str,
    chunk_size: int = 8,
) -> DataFrame:
    """Remove globally-duplicated token spans, keeping first occurrence.

    The span-level twin of document dedup: every document is cut into
    consecutive ``chunk_size``-token spans; a span whose exact text
    occurred earlier in the corpus (ordered by (id, span index)) is
    dropped; each document is reassembled from its surviving spans.
    This is the "remove duplicated lines/paragraphs across documents"
    stage of C4-style corpus construction, expressed on token windows
    because the synthetic corpus has no line structure.

    Returns (id, n_chunks, n_kept, dedup_text) — one row per input
    document with >=1 token; documents whose every span was seen before
    survive with dedup_text = ''.

    Scale shape: explode -> window over (span fingerprint, span tokens)
    (hash shuffle on the key, the only wide op) -> groupBy(id)
    reassemble. The rolling hash (mod a ~2^30 prime) is only the
    shuffle-friendly LEADING key — the span token array itself is part
    of the dedup key, so two distinct spans whose fingerprints collide
    land in the same partition but stay distinct rows: the dedup is
    exact, not fingerprint-approximate. Partition keys are near-unique
    and skew-free; no cross-document comparison ever happens.
    """
    from ..functions import hashing

    chunks = chunk_documents(df, id_col, token_col, chunk_size, chunk_size).select(
        id_col,
        "chunk_idx",
        F.col("chunk_tokens"),
        hashing.rolling_token_hash(F.col("chunk_tokens")).alias("_fp"),
    )
    w = Window.partitionBy("_fp", "chunk_tokens").orderBy(
        F.col(id_col).asc(), F.col("chunk_idx").asc()
    )
    ranked = chunks.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_rn") == 1,
                                    F.struct(F.col("chunk_idx"), F.col("chunk_tokens")),
                                )
                            )
                        ),
                        lambda s: s["chunk_tokens"],
                    )
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


def chunk_dedup_sql(
    toks_expr: str,
    id_expr: str = "doc_id",
    chunk_size: int = 8,
    relation: str = "documents",
) -> str:
    """DuckDB twin of :func:`chunk_dedup` over ``relation``."""
    from ..functions import hashing

    slice_expr = (
        f"list_slice(toks, _i * {chunk_size} + 1, _i * {chunk_size} + {chunk_size})"
    )
    return f"""
WITH t AS (SELECT {id_expr} AS id, {toks_expr} AS toks FROM {relation}),
ch AS (
  SELECT id, _i AS chunk_idx, {slice_expr} AS chunk_tokens,
         {hashing.rolling_token_hash_sql(slice_expr)} AS _fp
  FROM t, LATERAL unnest(
    range(0, greatest(ceil((len(toks) - {chunk_size})::DOUBLE / {chunk_size})::BIGINT, 0) + 1)
  ) r(_i)
  WHERE len(toks) > 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY _fp, chunk_tokens ORDER BY id, chunk_idx) AS _rn
  FROM ch
)
SELECT id AS doc_id,
       count(*)::BIGINT AS n_chunks,
       coalesce(sum(CASE WHEN _rn = 1 THEN 1 ELSE 0 END), 0)::BIGINT AS n_kept,
       coalesce(string_agg(CASE WHEN _rn = 1 THEN array_to_string(chunk_tokens, ' ') END,
                           ' ' ORDER BY chunk_idx), '') AS dedup_text
FROM ranked GROUP BY id
"""


# ---------------------------------------------------------------------------
# Temperature-based domain mixing (GPT-3 / multilingual-T5 sampling)
# ---------------------------------------------------------------------------


def temperature_mix_rates(
    df: DataFrame,
    domain_col: str,
    target_rows: int,
) -> DataFrame:
    """Per-domain keep rates for temperature-based corpus mixing.

    Sampling probability q_d proportional to n_d^(1/2) (temperature
    T=2): small domains are up-weighted relative to their natural share,
    the standard rebalancing rule for multilingual / multi-source
    pretraining mixes. Per-domain keep rate to land ``target_rows``
    total expected rows:

        w_d            = floor(sqrt(n_d) * 1000)      (milli-weight)
        rate_permille  = min(1000, (1000 * target * w_d) div (Z * n_d))

    with Z = sum(w_d). The exponent is computed via sqrt — IEEE
    correctly-rounded, so bit-identical on every engine — and
    everything after the floor is INTEGER arithmetic: no float
    summation order or pow() libm variance can move a rate by one
    per-mille between engines or cluster sizes. The products run in
    128-bit-capable integer types (Spark decimal(38,0), DuckDB
    HUGEINT), so neither ``1000 * target * w_d`` nor ``Z * n_d`` can
    hit int64 overflow at trillion-row corpora; exact up to
    ``Z * n_d < 10^38``, i.e. any corpus expressible in bigint rows.

    Scale shape: one count-by-domain aggregation (tiny output), one
    1-row broadcast for Z. Returns (domain, n_rows, rate_permille);
    feed the rate into :func:`sample_keep` for the row-level decision.
    """
    sizes = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_rows"))
    sized = sizes.withColumn(
        "_w", F.floor(F.sqrt(F.col("n_rows")) * F.lit(1000.0)).cast("bigint")
    )
    z = sized.agg(F.sum("_w").alias("_z"))
    return (
        sized.crossJoin(F.broadcast(z))
        .withColumn(
            "rate_permille",
            F.least(
                F.lit(1000).cast("bigint"),
                F.expr(
                    # decimal(38,0) products: exact integer math with
                    # 128-bit headroom — bigint would overflow _z*n_rows
                    # around 1e12-row corpora (ANSI: runtime error).
                    f"(cast({1000 * int(target_rows)} as decimal(38,0)) * _w)"
                    " div (cast(_z as decimal(38,0)) * n_rows)"
                ),
            ),
        )
        .select(domain_col, "n_rows", "rate_permille")
    )


def temperature_mix_rates_sql(
    domain_expr: str, target_rows: int, relation: str = "documents"
) -> str:
    """DuckDB twin of :func:`temperature_mix_rates` (CTE body; exposes
    ``rates(domain, n_rows, rate_permille)``)."""
    return f"""
sizes AS (SELECT {domain_expr} AS domain, count(*) AS n_rows FROM {relation} GROUP BY 1),
w AS (SELECT domain, n_rows, floor(sqrt(n_rows) * 1000)::BIGINT AS _w FROM sizes),
z AS (SELECT sum(_w) AS _z FROM w),
rates AS (
  SELECT domain, n_rows,
         least(1000::BIGINT,
               (({1000 * int(target_rows)}::HUGEINT * _w) // (_z::HUGEINT * n_rows))::BIGINT
         )::BIGINT AS rate_permille
  FROM w CROSS JOIN z
)"""


def dsir_scores(
    df: DataFrame,
    id_col: str,
    token_col: str,
    target_filter: Column,
    num_buckets: int = 1024,
    select_quantile: float = 0.75,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    importance weights over hashed n-gram features, selecting raw
    examples that look like a target distribution.

    Features are unigram + bigram rolling hashes (the decontamination
    machinery) folded into ``num_buckets`` buckets. The bucket model is
    two smoothed count vectors — target (rows matching
    ``target_filter``) and raw (everything) — and a document's score is
    the sum over its features of log(p_target(b)/p_raw(b)), i.e. the
    log importance weight of the hashed-n-gram bigram model. ``selected``
    marks docs at or above the ``select_quantile`` score quantile (the
    deterministic stand-in for the paper's Gumbel-noise resampling).

    Returns (id, n_feats, dsir_score, selected).

    Scale shape: one explode per n-gram order sharing the id-hash
    window, two B-row count aggregations, a broadcast join of features
    against the <=B-row model, one per-doc aggregation, and a 1-row
    quantile broadcast. Never doc x doc; at 100 TB the model frame is
    KBs and every shuffle is keyed on the id or the bucket.
    """
    from ..functions.rounding import stable_round
    from .dedup import shingle_hash_rows

    b = F.lit(num_buckets).cast("bigint")
    feats = (
        shingle_hash_rows(df, id_col, token_col, n=1)
        .unionByName(shingle_hash_rows(df, id_col, token_col, n=2))
        .select(F.col(id_col), (F.col("_sh") % b).alias("_b"))
    )
    tgt_ids = df.filter(target_filter).select(id_col)
    raw_counts = feats.groupBy("_b").agg(F.count(F.lit(1)).alias("_rc"))
    tgt_counts = (
        feats.join(tgt_ids, id_col, "left_semi")
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_tc"))
    )
    model = raw_counts.join(tgt_counts, "_b", "left").select(
        "_b", "_rc", F.coalesce(F.col("_tc"), F.lit(0)).alias("_tc")
    )
    totals = model.agg(
        F.sum("_rc").cast("double").alias("_R"),
        F.sum("_tc").cast("double").alias("_T"),
    )
    llr = model.crossJoin(F.broadcast(totals)).select(
        "_b",
        (
            F.log((F.col("_tc") + 1) / (F.col("_T") + num_buckets))
            - F.log((F.col("_rc") + 1) / (F.col("_R") + num_buckets))
        ).alias("_llr"),
    )
    scored = (
        feats.join(F.broadcast(llr), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            stable_round(F.sum("_llr"), 4).alias("dsir_score"),
        )
    )
    qrow = scored.agg(
        stable_round(
            F.percentile(F.col("dsir_score"), F.lit(select_quantile)), 4
        ).alias("_q")
    )
    return scored.crossJoin(F.broadcast(qrow)).select(
        F.col(id_col),
        "n_feats",
        "dsir_score",
        (F.col("dsir_score") >= F.col("_q")).alias("selected"),
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, fp_col: str
) -> DataFrame:
    """Corpus-version diff: (id, status) with status in
    added / removed / changed / unchanged, from one full-outer equi-join
    of the two snapshots' (id, content-fingerprint) frames.

    The operational primitive behind dataset versioning at 100 TB: both
    sides reduce to id+fp projections before the join (fingerprints are
    maintained by the ingest path, see ``content_index``), so the diff
    never rereads document bodies and shuffles only the two id/fp
    column pairs.
    """
    o = old.select(F.col(id_col), F.col(fp_col).alias("_ofp"))
    n = new.select(F.col(id_col), F.col(fp_col).alias("_nfp"))
    return (
        o.join(n, id_col, "full_outer")
        .select(
            F.col(id_col),
            F.when(F.col("_ofp").isNull(), F.lit("added"))
            .when(F.col("_nfp").isNull(), F.lit("removed"))
            .when(F.col("_ofp") != F.col("_nfp"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )
