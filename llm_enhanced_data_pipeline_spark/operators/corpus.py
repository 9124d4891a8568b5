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


# ---------------------------------------------------------------------------
# Exact substring dedup over UNALIGNED spans (Lee et al. 2021)
# ---------------------------------------------------------------------------

def _dup_islands(
    df: DataFrame,
    id_col: str,
    token_col: str,
    k: int,
) -> DataFrame:
    """Shared core of :func:`duplicated_spans` /
    :func:`remove_duplicated_spans`: maximal merged duplicated spans,
    one row per island — (id, _s, _me) with token positions
    [_s, _me) duplicated (0-based).

    The dedup key is the gram token ARRAY itself (same device as
    chunk_dedup): no separator-joined string, so no character that
    happens to survive tokenization can make two distinct windows
    collide into one key."""
    n = F.size(F.col(token_col))
    grams = (
        df.filter(n >= k)
        .select(
            F.col(id_col),
            F.col(token_col),
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), (n - k).cast("bigint"))
            ).alias("start"),
        )
        .select(
            id_col,
            "start",
            F.slice(
                F.col(token_col), (F.col("start") + 1).cast("int"), k
            ).alias("_gram"),
        )
    )
    w_gram = Window.partitionBy("_gram").orderBy(
        F.col(id_col).asc(), F.col("start").asc()
    )
    hits = (
        grams.withColumn("_rn", F.row_number().over(w_gram))
        .filter(F.col("_rn") >= 2)
        .select(F.col(id_col), "start", (F.col("start") + k).alias("_e"))
    )
    w_doc = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max("_e").over(w_doc.rowsBetween(Window.unboundedPreceding, -1))
    return (
        hits.withColumn(
            "_brk",
            F.when(prev_end.isNull() | (F.col("start") > prev_end), 1).otherwise(0),
        )
        .withColumn(
            "_isl",
            F.sum("_brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "_isl")
        .agg(F.min("start").alias("_s"), F.max("_e").alias("_me"))
        .drop("_isl")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    token_col: str,
    k: int = 8,
) -> DataFrame:
    """Exact duplicated-substring detection at every token offset —
    the unaligned twin of :func:`chunk_dedup` (which only sees spans on
    chunk_size-aligned boundaries) and the DataFrame re-expression of
    suffix-array substring dedup ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2021, arXiv:2107.06499).

    Every k-token window of every document is a candidate substring;
    an occurrence whose exact text occurred earlier in corpus order
    (id, offset) is a duplicate hit, and overlapping hits merge into
    maximal duplicated SPANS — exactly the "all but one occurrence of
    any length->=threshold repeated substring" contract of the paper,
    with the suffix array replaced by a k-gram group-by (common prefix
    >= k between adjacent suffixes in suffix order == equal k-token
    prefix == same group; island-merging recovers the maximal-run
    semantics the suffix array's LCP scan provides).

    Returns one row per document: (id, n_tokens, dup_spans,
    dup_tokens, dup_frac) where dup_tokens counts tokens inside merged
    duplicated spans (within-doc self-repeats count too, matching the
    paper's ExactSubstr).

    Scale shape: explode (k tokens carried per position — the k-gram
    analogue of the suffix array's pointer indirection), one window
    over the exact gram token array (near-unique keys; the tokens ARE
    the dedup key, so no hash or separator collision can merge
    distinct spans), one
    per-doc ordered window for island merging, two keyed aggregations.
    Never doc x doc; the only skew risk is a hyper-frequent gram
    (boilerplate), which is precisely the row the operator exists to
    find — its group is processed by one ordered scan, not a join.
    """
    from ..functions.rounding import stable_round

    islands = _dup_islands(df, id_col, token_col, k)
    agg = islands.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum(F.col("_me") - F.col("_s")).alias("dup_tokens"),
    )
    base = df.select(F.col(id_col), F.size(F.col(token_col)).cast("bigint").alias("n_tokens"))
    return base.join(agg, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("dup_spans"), F.lit(0)).cast("bigint").alias("dup_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias("dup_tokens"),
        stable_round(
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            4,
        ).alias("dup_frac"),
    )


def duplicated_spans_sql(
    toks_expr: str,
    id_expr: str = "doc_id",
    k: int = 8,
    relation: str = "documents",
) -> str:
    """DuckDB twin of :func:`duplicated_spans` over ``relation``."""
    from ..functions.rounding import stable_round_sql

    return f"""
WITH t AS (SELECT {id_expr} AS id, {toks_expr} AS toks FROM {relation}),
g AS (
  SELECT id, _i AS start,
         list_slice(toks, _i + 1, _i + {k}) AS _gram
  FROM t, LATERAL unnest(range(0, len(toks) - {k} + 1)) r(_i)
),
rk AS (
  SELECT id, start, start + {k} AS _e,
         row_number() OVER (PARTITION BY _gram ORDER BY id, start) AS _rn
  FROM g
),
h AS (SELECT id, start, _e FROM rk WHERE _rn >= 2),
brk AS (
  SELECT id, start, _e,
         CASE WHEN max(_e) OVER w IS NULL OR start > max(_e) OVER w
              THEN 1 ELSE 0 END AS _brk
  FROM h
  WINDOW w AS (PARTITION BY id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT id, start, _e,
         sum(_brk) OVER (PARTITION BY id ORDER BY start
                         ROWS UNBOUNDED PRECEDING) AS _isl
  FROM brk
),
per AS (SELECT id, _isl, min(start) AS _s, max(_e) AS _me FROM isl GROUP BY 1, 2),
agg AS (
  SELECT id, count(*)::BIGINT AS dup_spans, sum(_me - _s)::BIGINT AS dup_tokens
  FROM per GROUP BY id
)
SELECT t.id AS {id_expr}, len(t.toks)::BIGINT AS n_tokens,
       coalesce(agg.dup_spans, 0)::BIGINT AS dup_spans,
       coalesce(agg.dup_tokens, 0)::BIGINT AS dup_tokens,
       {stable_round_sql("coalesce(agg.dup_tokens, 0) / greatest(len(t.toks), 1)", 4)} AS dup_frac
FROM t LEFT JOIN agg ON t.id = agg.id
"""


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str,
    token_col: str,
    k: int = 8,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """The APPLY side of :func:`duplicated_spans`: excise every merged
    duplicated span (all occurrences past the global first) and
    reassemble each document from its surviving tokens — the actual
    corpus transformation of Lee et al. 2021's ExactSubstr dedup, not
    just the report.

    Returns (id, *keep_cols, n_tokens, n_kept, clean_text) for EVERY
    input document; a fully-duplicated document survives with
    clean_text ''. ``keep_cols`` are carried through the reassembly
    projection (guide §2.4): they ride the per-doc side only — never
    the gram shuffle — so a consumer that needs, say, the language
    column does not have to re-join the corpus on the id (measured r15
    on corpus_build_v4: the carried column removes one corpus-sized
    equi-join — broadcast at bench scale, sort-merge at 100 TB —
    3.52s -> 3.29s median at sf0.1).

    Scale shape: the shared island computation, one per-doc island-list
    aggregation (islands are FEW per doc by construction — they are
    maximal merged spans), then excision as pure array algebra: the
    kept text is the concatenation of the token slices BETWEEN islands
    (zip_with over segment boundaries + slice + flatten), computed in a
    single projection. No position explode, no (id, pos) anti-join, no
    per-doc sort — the earlier shape paid a corpus-sized shuffle and a
    collect_list sort for what is per-row array arithmetic.
    """
    keep = keep_cols or []
    islands = _dup_islands(df, id_col, token_col, k)
    isl_per_doc = islands.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_s").alias("s"), F.col("_me").alias("e")))
        ).alias("_isl")
    )
    j = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.col(token_col).alias("_toks"),
    ).join(isl_per_doc, id_col, "left")
    isl = F.coalesce(
        F.col("_isl"), F.expr("cast(array() as array<struct<s:bigint,e:bigint>>)")
    )
    # kept segments: [0, isl[0].s), [isl[0].e, isl[1].s), ..., [last.e, n)
    starts = F.concat(
        F.array(F.lit(0).cast("bigint")), F.transform(isl, lambda i: i["e"])
    )
    ends = F.concat(
        F.transform(isl, lambda i: i["s"]),
        F.array(F.size("_toks").cast("bigint")),
    )
    kept = F.flatten(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.slice(
                F.col("_toks"), (s + 1).cast("int"), (e - s).cast("int")
            ),
        )
    )
    return j.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def remove_duplicated_spans_sql(
    toks_expr: str,
    id_expr: str = "doc_id",
    k: int = 8,
    relation: str = "documents",
) -> str:
    """DuckDB twin of :func:`remove_duplicated_spans`."""
    return f"""
WITH t AS (SELECT {id_expr} AS id, {toks_expr} AS toks FROM {relation}),
g AS (
  SELECT id, _i AS start,
         list_slice(toks, _i + 1, _i + {k}) AS _gram
  FROM t, LATERAL unnest(range(0, len(toks) - {k} + 1)) r(_i)
),
rk AS (
  SELECT id, start, start + {k} AS _e,
         row_number() OVER (PARTITION BY _gram ORDER BY id, start) AS _rn
  FROM g
),
h AS (SELECT id, start, _e FROM rk WHERE _rn >= 2),
brk AS (
  SELECT id, start, _e,
         CASE WHEN max(_e) OVER w IS NULL OR start > max(_e) OVER w
              THEN 1 ELSE 0 END AS _brk
  FROM h
  WINDOW w AS (PARTITION BY id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT id, start, _e,
         sum(_brk) OVER (PARTITION BY id ORDER BY start
                         ROWS UNBOUNDED PRECEDING) AS _isl
  FROM brk
),
per AS (SELECT id, _isl, min(start) AS _s, max(_e) AS _me FROM isl GROUP BY 1, 2),
dropped AS (
  SELECT id, unnest(range(_s, _me)) AS pos FROM per
),
toks AS (
  SELECT id, _p - 1 AS pos, toks[_p] AS _tok
  FROM t, LATERAL unnest(range(1, len(toks) + 1)) r(_p)
),
kept AS (
  SELECT toks.id, toks.pos, toks._tok
  FROM toks ANTI JOIN dropped USING (id, pos)
),
re AS (
  SELECT id, count(*)::BIGINT AS n_kept,
         string_agg(_tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY id
)
SELECT t.id AS {id_expr}, len(t.toks)::BIGINT AS n_tokens,
       coalesce(re.n_kept, 0)::BIGINT AS n_kept,
       coalesce(re.clean_text, '') AS clean_text
FROM t LEFT JOIN re ON t.id = re.id
"""


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (one multiplicative-weights step)
# ---------------------------------------------------------------------------


def doremi_domain_weights(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    eta: float = 1.0,
    smoothing_permille: int = 100,
) -> DataFrame:
    """One DoReMi multiplicative-weights update of the domain mixture
    (Xie et al. 2023, arXiv:2305.10429), with the per-domain "excess
    loss" instantiated as a deterministic reference-free proxy.

    DoReMi reweights domains by exp(eta * excess_d) where excess_d is
    how much worse the proxy model does on domain d than the reference
    model. Here the reference model is the domain's OWN unigram LM and
    the proxy is the pooled corpus unigram LM, so the excess is exactly
    the per-token KL divergence KL(P_d || P_corpus) — "how badly does
    the global mixture underfit this domain" — which is >= 0 by Gibbs'
    inequality (the paper's clip-at-0 is a provable no-op). Starting
    from uniform alpha, one update gives w_d proportional to
    exp(eta * excess_d), then the paper's uniform smoothing:
    weight_d = (1-s) * w_d / sum(w) + s / D.

    Swapping real per-domain NLLs from a trained proxy/reference pair
    in for the unigram KL is a column substitution (see
    ``text_analysis.lm_score_with`` for the adapter pattern).

    Returns (domain, n_docs, n_tokens, excess_kl, weight), both floats
    engine-stably rounded (the KL sum is rounded BEFORE exp so both
    engines exponentiate identical doubles).

    Scale shape: one token explode feeding a (domain, token) count, two
    reductions of that frame (per-domain and per-token totals), one
    equi-join of the counts against the per-token totals (vocab-sized,
    AQE-broadcast), a per-domain aggregation, and window math over the
    D-row result. Never doc x doc; the D-row tail is trivially tiny.

    EAGER + caching contract: the (domain, token) count frame is
    persisted via ``dedup.persist_tracked`` and materialized at
    plan-construction time (four downstream branches would otherwise
    each re-run the token explode — measured 4x at sf0.1; exchange
    reuse does not dedupe these shapes). Callers therefore pay the
    token shuffle when BUILDING the plan, and own a
    ``dedup.release_caches()`` call after consuming the result.
    """
    from ..functions.rounding import stable_round

    from . import dedup

    s = smoothing_permille / 1000.0
    tok = df.select(
        F.col(domain_col).alias("domain"), F.explode(F.col(token_col)).alias("_tok")
    )
    dt = tok.groupBy("domain", "_tok").agg(F.count(F.lit(1)).alias("_c_dt"))
    # Materialize the (domain, token) count frame NOW: four branches
    # (domain totals, token totals, corpus total, the KL terms) consume
    # it, and each would otherwise re-run the token explode + shuffle —
    # the operator's entire data-sized cost — once per branch (measured
    # 4x at sf0.1; exchange reuse does not dedupe these shapes). The
    # frame itself is vocab x domains rows, trivially cacheable at any
    # corpus size; released via dedup.release_caches.
    dt = dedup.persist_tracked(dt)
    dt.count()
    d_tot = dt.groupBy("domain").agg(F.sum("_c_dt").alias("_n_d"))
    t_tot = dt.groupBy("_tok").agg(F.sum("_c_dt").alias("_c_t"))
    n_total = dt.agg(F.sum("_c_dt").alias("_n"))
    terms = (
        dt.join(t_tot, "_tok")
        .join(F.broadcast(d_tot), "domain")
        .crossJoin(F.broadcast(n_total))
        .select(
            "domain",
            "_n_d",
            (
                F.col("_c_dt")
                * F.log(
                    (F.col("_c_dt").cast("double") * F.col("_n"))
                    / (F.col("_n_d").cast("double") * F.col("_c_t"))
                )
            ).alias("_term"),
        )
    )
    kl = terms.groupBy("domain").agg(
        F.max("_n_d").alias("n_tokens"),
        stable_round(F.sum("_term") / F.max("_n_d"), 6).alias("excess_kl"),
    )
    n_docs = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w_all = Window.partitionBy()
    return (
        kl.join(F.broadcast(n_docs), "domain")
        .withColumn("_w", F.exp(F.lit(float(eta)) * F.col("excess_kl")))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            "excess_kl",
            stable_round(
                F.lit(1.0 - s) * F.col("_w") / F.sum("_w").over(w_all)
                + F.lit(s) / F.count(F.lit(1)).over(w_all),
                6,
            ).alias("weight"),
        )
    )


def doremi_domain_weights_sql(
    toks_expr: str,
    domain_expr: str,
    eta: float = 1.0,
    smoothing_permille: int = 100,
    relation: str = "documents",
) -> str:
    """DuckDB twin of :func:`doremi_domain_weights` over ``relation``."""
    from ..functions.rounding import stable_round_sql

    s = smoothing_permille / 1000.0
    return f"""
WITH tok AS (
  SELECT {domain_expr} AS domain, unnest({toks_expr}) AS _tok FROM {relation}
),
dt AS (SELECT domain, _tok, count(*)::BIGINT AS _c_dt FROM tok GROUP BY 1, 2),
dtot AS (SELECT domain, sum(_c_dt)::BIGINT AS _n_d FROM dt GROUP BY 1),
ttot AS (SELECT _tok, sum(_c_dt)::BIGINT AS _c_t FROM dt GROUP BY 1),
n AS (SELECT sum(_c_dt)::BIGINT AS _n FROM dt),
terms AS (
  SELECT dt.domain, dtot._n_d,
         dt._c_dt * ln((dt._c_dt::DOUBLE * n._n) / (dtot._n_d::DOUBLE * ttot._c_t))
           AS _term
  FROM dt
  JOIN ttot USING (_tok)
  JOIN dtot USING (domain)
  CROSS JOIN n
),
kl AS (
  SELECT domain, max(_n_d)::BIGINT AS n_tokens,
         {stable_round_sql("sum(_term) / max(_n_d)", 6)} AS excess_kl
  FROM terms GROUP BY domain
),
nd AS (SELECT {domain_expr} AS domain, count(*)::BIGINT AS n_docs FROM {relation} GROUP BY 1),
w AS (
  SELECT kl.domain, nd.n_docs, kl.n_tokens, kl.excess_kl,
         exp({float(eta)!r} * kl.excess_kl) AS _w
  FROM kl JOIN nd USING (domain)
)
SELECT domain, n_docs, n_tokens, excess_kl,
       {stable_round_sql(f"{1.0 - s!r} * _w / (sum(_w) OVER ()) + {s!r} / (count(*) OVER ())", 6)} AS weight
FROM w
"""


def mixture_schedule(
    weights: DataFrame,
    budget_tokens: int,
) -> DataFrame:
    """Turn a domain-weight frame (:func:`doremi_domain_weights` or the
    temperature-mix rates) plus a total token budget into the concrete
    training plan: per-domain token targets and epoch counts (how many
    passes over each domain the sampler makes — the >1-epoch domains
    are the up-weighted minorities, the <1 ones are subsampled).

    target_tokens_d = floor(weight_d * budget + 0.5) (exact from the
    6dp-rounded weight, so both engines agree bit-for-bit);
    epochs_d = target_tokens_d / n_tokens_d, 4dp stable-rounded.

    Pure projection over the D-row weight frame — free at any scale.
    """
    from ..functions.rounding import stable_round

    target = F.floor(F.col("weight") * F.lit(float(budget_tokens)) + 0.5).cast(
        "bigint"
    )
    return weights.select(
        "domain",
        "n_tokens",
        "weight",
        target.alias("target_tokens"),
        stable_round(target / F.col("n_tokens"), 4).alias("epochs"),
    )


def mixture_schedule_sql(doremi_sql: str, budget_tokens: int) -> str:
    """DuckDB twin of :func:`mixture_schedule` over the output of a
    :func:`doremi_domain_weights_sql` query (nested as a subquery)."""
    from ..functions.rounding import stable_round_sql

    t = f"floor(weight * {float(budget_tokens)!r} + 0.5)::BIGINT"
    return f"""
SELECT domain, n_tokens, weight,
       {t} AS target_tokens,
       {stable_round_sql(f"{t} / n_tokens", 4)} AS epochs
FROM ({doremi_sql}) _w
"""


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


# ---------------------------------------------------------------------------
# Exact budget apportionment (largest-remainder / Hamilton method)


def apportion_budget(
    df: DataFrame,
    domain_col: str,
    budget: int,
) -> DataFrame:
    """Split an integer item budget across domains proportionally to
    their row counts, EXACTLY: floor quotas first, then the leftover
    seats go to the largest fractional remainders (Hamilton's method —
    the standard way to size a fixed eval/annotation budget across
    strata so the quotas sum to the budget, no float drift).

    All arithmetic is integer (quota = budget*n_d div N; remainder =
    budget*n_d mod N), ties broken by domain ascending. Returns
    (domain, n_rows, quota) with sum(quota) == min(budget, N... budget)
    exactly.

    Scale shape: one count aggregation + window math over the D-row
    result. The 128-bit decimal product keeps budget*n_d exact at any
    corpus size.
    """
    sizes = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = sizes.agg(F.sum("n_rows").alias("_n"))
    b = f"cast({int(budget)} as decimal(38,0))"
    based = (
        sizes.crossJoin(F.broadcast(tot))
        .withColumn("_fl", F.expr(f"cast(({b} * n_rows) div _n as bigint)"))
        .withColumn("_rem", F.expr(f"cast(({b} * n_rows) % _n as bigint)"))
    )
    leftover = F.lit(int(budget)) - F.sum("_fl").over(Window.partitionBy())
    rank = F.row_number().over(
        Window.orderBy(F.col("_rem").desc(), F.col("domain").asc())
    )
    return (
        based.withColumn("_left", leftover)
        .withColumn("_rk", rank)
        .select(
            "domain",
            "n_rows",
            (
                F.col("_fl")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            ).cast("bigint").alias("quota"),
        )
    )


def apportion_budget_sql(
    domain_expr: str, budget: int, relation: str = "documents"
) -> str:
    """DuckDB twin of :func:`apportion_budget`."""
    return f"""
WITH sizes AS (
  SELECT {domain_expr} AS domain, count(*)::BIGINT AS n_rows
  FROM {relation} GROUP BY 1
),
tot AS (SELECT sum(n_rows)::BIGINT AS _n FROM sizes),
based AS (
  SELECT domain, n_rows,
         (({budget}::HUGEINT * n_rows) // _n)::BIGINT AS _fl,
         (({budget}::HUGEINT * n_rows) % _n)::BIGINT AS _rem
  FROM sizes CROSS JOIN tot
),
ranked AS (
  SELECT *,
         {budget} - sum(_fl) OVER () AS _left,
         row_number() OVER (ORDER BY _rem DESC, domain ASC) AS _rk
  FROM based
)
SELECT domain, n_rows,
       (_fl + CASE WHEN _rk <= _left THEN 1 ELSE 0 END)::BIGINT AS quota
FROM ranked
"""



# ---------------------------------------------------------------------------
# Epoch allocation under a token budget (data-recipe planning)
# ---------------------------------------------------------------------------


def epoch_waterfill(
    per_source: DataFrame,
    budget_tokens: int,
    max_epochs: int,
    source_col: str = "source",
    tok_col: str = "n_toks",
    weight_col: str = "weight",
) -> DataFrame:
    """Allocate a training token budget across sources, weighted, with
    a per-source repetition cap — the Gopher/Llama-style "repeat good
    sources up to E epochs" recipe, solved exactly in closed form.

    Maximizes weight-proportional allocation: ``alloc_s =
    min(cap_s, lam * w_s)`` with ``cap_s = n_toks_s * max_epochs`` and
    the water level ``lam`` chosen so allocations sum to the budget
    (clamped to the total cap — a budget beyond every cap just fills
    everything). The level has a CLOSED FORM, no iteration: order
    sources by ``r_s = cap_s / w_s`` ascending; the first row j whose
    candidate ``lam_j = (B - prefix_cap_j) / suffix_w_j`` satisfies
    ``lam_j <= r_j`` gives the level. (Candidates at later rows are
    both smaller and still "valid", so it must be the FIRST such row,
    not the min — picked via an ordered window, valid rows first.)

    ``per_source`` is the per-source stats frame — one row per source
    (D rows, dimension-sized), so the unbounded windows here sweep a
    tiny frame, never the corpus. Weights must be strictly POSITIVE
    (a zero weight makes cap/weight undefined; drop no-weight sources
    before planning). Integer token counts and integer weights keep
    every sum exact in double, so the division algebra is
    bit-identical across engines. Returns one row per source:
    (source, n_toks, weight, cap_toks, alloc_toks, epochs).
    """
    e = float(max_epochs)
    base = per_source.select(
        F.col(source_col).alias("source"),
        F.col(tok_col).cast("double").alias("_t"),
        F.col(weight_col).cast("double").alias("_w"),
    ).withColumn("_cap", F.col("_t") * F.lit(e)).withColumn(
        "_r", F.col("_cap") / F.col("_w")
    )
    order = [F.col("_r").asc(), F.col("source").asc()]
    w_pre = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_full = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    x = (
        base.withColumn("_pc", F.coalesce(F.sum("_cap").over(w_pre), F.lit(0.0)))
        .withColumn("_pw", F.coalesce(F.sum("_w").over(w_pre), F.lit(0.0)))
        .withColumn("_tw", F.sum("_w").over(w_full))
        .withColumn("_tc", F.sum("_cap").over(w_full))
    )
    b = F.least(F.lit(float(budget_tokens)), F.col("_tc"))
    x = x.withColumn(
        "_lam_cand", (b - F.col("_pc")) / (F.col("_tw") - F.col("_pw"))
    ).withColumn("_valid", F.col("_lam_cand") <= F.col("_r"))
    # first valid row in (r, source) order carries the level; with the
    # budget clamped to total cap the last row is always valid, so the
    # window never comes up empty
    w_pick = Window.orderBy(
        F.col("_valid").desc(), F.col("_r").asc(), F.col("source").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    x = x.withColumn("_lam", F.first("_lam_cand").over(w_pick))
    alloc = F.least(F.col("_cap"), F.col("_lam") * F.col("_w"))
    return x.select(
        "source",
        F.col("_t").cast("bigint").alias(tok_col),
        F.col("_w").alias(weight_col),
        F.col("_cap").cast("bigint").alias("cap_toks"),
        alloc.alias("alloc_toks"),
        (alloc / F.col("_t")).alias("epochs"),
    )


def epoch_waterfill_sql(
    per_source_sql: str,
    budget_expr: str,
    max_epochs: int,
    tok_col: str = "n_toks",
    weight_col: str = "weight",
) -> str:
    """DuckDB twin of :func:`epoch_waterfill` — identical window
    algebra over the same (r, source) order, so the double arithmetic
    is bit-identical. ``per_source_sql`` must yield
    (source, n_toks, weight); ``budget_expr`` is a scalar SQL
    expression."""
    e = float(max_epochs)
    return f"""
WITH ps AS ({per_source_sql}),
base AS (
  SELECT source, {tok_col}::DOUBLE AS _t, {weight_col}::DOUBLE AS _w,
         {tok_col}::DOUBLE * {e} AS _cap,
         ({tok_col}::DOUBLE * {e}) / {weight_col}::DOUBLE AS _r
  FROM ps
),
x AS (
  SELECT *,
         coalesce(sum(_cap) OVER (ORDER BY _r, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS _pc,
         coalesce(sum(_w) OVER (ORDER BY _r, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS _pw,
         sum(_w) OVER () AS _tw,
         sum(_cap) OVER () AS _tc
  FROM base
),
lamx AS (
  SELECT *,
         (least(({budget_expr})::DOUBLE, _tc) - _pc) / (_tw - _pw) AS _lam_cand,
         ((least(({budget_expr})::DOUBLE, _tc) - _pc) / (_tw - _pw)) <= _r
           AS _valid
  FROM x
),
picked AS (
  SELECT *,
         first_value(_lam_cand) OVER (ORDER BY _valid DESC, _r, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS _lam
  FROM lamx
)
SELECT source,
       _t::BIGINT AS {tok_col},
       _w AS {weight_col},
       _cap::BIGINT AS cap_toks,
       least(_cap, _lam * _w) AS alloc_toks,
       least(_cap, _lam * _w) / _t AS epochs
FROM picked
"""


def epoch_plan_copies(
    docs: DataFrame,
    plan: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    tok_col: str = "n_toks",
    seed: int = 23,
) -> DataFrame:
    """Apply an :func:`epoch_waterfill` plan to the corpus: each
    document of a source with allocation ``epochs`` appears
    ``floor(epochs)`` times, plus one more for the deterministic
    per-mille slice of documents selected by a stable hash gate on
    the fractional part — so each source's REALIZED token count tracks
    its allocation without any randomness (re-runs reproduce the same
    multiset). Returns docs + ``n_copies`` (0 allowed: a sub-1-epoch
    source keeps only its sampled slice).

    One broadcast-sized join (the plan is D rows) + pure column
    algebra; the fractional permille is derived as
    ``floor(epochs * 1000) - 1000 * floor(epochs)`` — exact in double
    for the exact-algebra plans this module produces."""
    p = plan.select(
        F.col(source_col),
        F.floor(F.col("epochs")).cast("bigint").alias("_full"),
        (
            F.floor(F.col("epochs") * 1000)
            - 1000 * F.floor(F.col("epochs"))
        ).cast("bigint").alias("_frac_permille"),
    )
    j = docs.join(F.broadcast(p), source_col)
    extra = F.when(
        split_bucket(F.col(id_col).cast("string"), seed=seed)
        < F.col("_frac_permille"),
        F.lit(1),
    ).otherwise(F.lit(0))
    return j.withColumn(
        "n_copies", (F.col("_full") + extra).cast("bigint")
    ).drop("_full", "_frac_permille")


def epoch_plan_copies_sql(
    docs_sql: str,
    plan_sql: str,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 23,
) -> str:
    """DuckDB twin of :func:`epoch_plan_copies` (same hash gate, same
    exact permille algebra)."""
    gate = split_bucket_sql(f"{id_col}::VARCHAR", seed)
    return f"""
SELECT d.*,
       (floor(p.epochs)::BIGINT
        + CASE WHEN {gate} < (floor(p.epochs * 1000)
                              - 1000 * floor(p.epochs))::BIGINT
               THEN 1 ELSE 0 END)::BIGINT AS n_copies
FROM ({docs_sql}) d JOIN ({plan_sql}) p USING ({source_col})
"""


def padding_waste(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    tok_col: str,
    batch_size: int,
) -> DataFrame:
    """Per-batch padding accounting for fixed-size training batches:
    rows batch up ``batch_size`` at a time in ``order_cols`` order
    within each ``part_cols`` partition; every batch pads its rows to
    the batch max, so ``padded_toks = n_rows * max - sum``. Returns
    one row per (partition, batch): n_rows, max_toks, sum_toks,
    padded_toks — all exact integers. Keyed windows only: batching is
    embarrassingly parallel across partitions (shard by a stable hash
    first; a LENGTH-bucketed partition key turns this into the
    classic padding-minimizing bucketed batching)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    b = df.withColumn(
        "_batch", F.floor((F.row_number().over(w) - 1) / batch_size)
    )
    return (
        b.groupBy(*part_cols, "_batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max(tok_col).cast("bigint").alias("max_toks"),
            F.sum(tok_col).cast("bigint").alias("sum_toks"),
        )
        .withColumn(
            "padded_toks",
            (F.col("n_rows") * F.col("max_toks") - F.col("sum_toks")).cast(
                "bigint"
            ),
        )
    )


def padding_waste_sql(
    docs_sql: str,
    part_exprs: list[str],
    order_exprs: list[str],
    tok_col: str,
    batch_size: int,
) -> str:
    """DuckDB twin of :func:`padding_waste` (same windows, same
    integer algebra)."""
    parts = ", ".join(part_exprs)
    order = ", ".join(order_exprs)
    return f"""
SELECT {parts}, _batch,
       count(*)::BIGINT AS n_rows,
       max({tok_col})::BIGINT AS max_toks,
       sum({tok_col})::BIGINT AS sum_toks,
       (count(*) * max({tok_col}) - sum({tok_col}))::BIGINT AS padded_toks
FROM (
  SELECT *,
         (row_number() OVER (PARTITION BY {parts} ORDER BY {order}) - 1)
           // {batch_size} AS _batch
  FROM ({docs_sql})
)
GROUP BY {parts}, _batch
"""
