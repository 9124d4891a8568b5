"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (BASELINE.json north star): language
identification, quality scoring, token counting, and document
fingerprinting — each a pure-SQL-expression operator that scales as a
single projection (no shuffle) over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import hashing
from ..functions.arrays import index_1_to
from .cleaning import tokens

# ---------------------------------------------------------------------------
# Language ID: tiny stopword-profile heuristic. Real pipelines plug a
# fastText model in via predict_batch_udf; the heuristic keeps the
# operator deterministic and oracle-checkable. Score per language =
# fraction of tokens in that language's stopword list; argmax with
# 'und' (undetermined) when no list matches.

LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de", "que", "por"),
}


def lang_scores(toks: Column) -> dict[str, Column]:
    n = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).cast("double")
        / n
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(toks: Column) -> Column:
    """Predicted language code; ties resolved by language-code order,
    'und' when every score is zero.

    Note: uses set-intersection ratio (distinct stopwords present /
    total tokens), deliberately cheap; the per-occurrence count variant
    is a one-line change.
    """
    scores = lang_scores(toks)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(LANG_STOPWORDS):  # deterministic tie order
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def lang_id_sql(tokens_expr: str) -> str:
    """DuckDB twin of :func:`lang_id` (same fold, same tie order)."""
    expr = "'und'"
    score = "0.0"
    # fold in sorted order, rebuilding the when-chain bottom-up
    chain: list[tuple[str, str]] = []
    for lang in sorted(LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        s = (
            f"(len(list_intersect({tokens_expr}, [{words}]))::DOUBLE"
            f" / greatest(len({tokens_expr}), 1))"
        )
        chain.append((lang, s))
    for lang, s in chain:
        expr = f"(CASE WHEN {s} > {score} THEN '{lang}' ELSE {expr} END)"
        score = f"(CASE WHEN {s} > {score} THEN {s} ELSE {score} END)"
    return expr


# ---------------------------------------------------------------------------
# Token counting: whitespace words plus a BPE-ish regex sub-token count
# (splits words into alpha runs, digit runs, and punctuation singles —
# the usual pre-tokenizer shape).

BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def word_count(col: Column) -> Column:
    return F.size(tokens(col))


def subtoken_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def subtoken_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))"


# ---------------------------------------------------------------------------
# Quality scoring: deterministic heuristics in [0,1] —
#  - length_score: saturating chars/2000
#  - diversity: type-token ratio (distinct/total words)
#  - stopword_score: presence of common-word signal (capped ratio*5)
#  - avg word length sanity band [3, 12]
# weighted like the reference's ruler scorer shape
# (Data_Analysis/evaluation/quality_scoring.py:98-133: weighted sum of
# component scores, rounded).

QUALITY_WEIGHTS = {"length": 0.3, "diversity": 0.3, "stopword": 0.2, "wordlen": 0.2}
_EN_STOP = LANG_STOPWORDS["en"]


def text_quality_components(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    n = F.greatest(F.size(toks), F.lit(1))
    length_score = F.least(F.length(text).cast("double") / 2000.0, F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*_EN_STOP))).cast("double") / n
    )
    stopword_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    awl = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    ) / n
    wordlen_score = F.when((awl >= 3.0) & (awl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return {
        "length": length_score,
        "diversity": diversity,
        "stopword": stopword_score,
        "wordlen": wordlen_score,
    }


def text_quality_score(text: Column) -> Column:
    from ..functions.rounding import stable_round

    comps = text_quality_components(text)
    total = F.lit(0.0)
    for name, weight in QUALITY_WEIGHTS.items():
        total = total + comps[name] * F.lit(weight)
    return stable_round(total, 4)


def text_quality_score_sql(toks_expr: str, text_expr: str = "text") -> str:
    """DuckDB twin of :func:`text_quality_score` — the ONE place the
    weighted component formula is spelled in SQL (every oracle that
    needs the score must use this, or a weight change silently forks
    the engines)."""
    from ..functions.rounding import stable_round_sql

    stop_list = ",".join(f"'{w}'" for w in _EN_STOP)
    n = f"greatest(len({toks_expr}), 1)"
    length = f"least(length({text_expr}) / 2000.0, 1.0)"
    diversity = f"len(list_distinct({toks_expr})) / {n}"
    stopword = (
        f"least((len(list_filter({toks_expr}, _t -> _t IN ({stop_list})))"
        f" / {n}) * 5.0, 1.0)"
    )
    wordlen = (
        f"(CASE WHEN (list_sum(list_transform({toks_expr}, _t -> length(_t)::DOUBLE))"
        f" / {n}) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END)"
    )
    w = QUALITY_WEIGHTS
    return stable_round_sql(
        f"{length} * {w['length']} + {diversity} * {w['diversity']}"
        f" + {stopword} * {w['stopword']} + {wordlen} * {w['wordlen']}",
        4,
    )


# ---------------------------------------------------------------------------
# Document fingerprinting

def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized lowercase
    text (the reference's title hash generalized, strict_deduplication.py:40)."""
    from .cleaning import normalize_whitespace

    return hashing.md5_hex(F.lower(normalize_whitespace(text)))


def fingerprint_rolling(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash over tokens (mod prime)."""
    return hashing.rolling_token_hash(tokens(text))


# ---------------------------------------------------------------------------
# Corpus-model likelihood scoring (CCNet-style quality signal)


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str,
    token_col: str,
) -> DataFrame:
    """Per-document average token log-probability under the corpus's own
    unigram model — the shuffle-light stand-in for CCNet's "perplexity
    under a reference LM" quality filter (real pipelines swap in a KenLM
    via a Pandas UDF; the unigram model keeps the operator deterministic
    and oracle-checkable).

    Returns (id, n_tokens, avg_logprob). Low avg_logprob = rare-token-
    heavy documents (gibberish, boilerplate-free noise); high = common-
    token documents. Downstream filters cut both tails.

    Scale shape: one explode + two hash aggregations on the token key
    (the vocab agg and the doc agg reuse the same token shuffle), one
    broadcast of the 1-row corpus total, and one equi-join of tokens
    against the vocab (vocab << corpus, so AQE broadcasts it). No
    driver-side state, no all-pairs anything.
    """
    from ..functions.rounding import stable_round

    tok = df.select(F.col(id_col), F.explode(F.col(token_col)).alias("_tok"))
    vocab = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    total = vocab.agg(F.sum("_cnt").cast("double").alias("_total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "_tok", F.log(F.col("_cnt") / F.col("_total")).alias("_lp")
    )
    return (
        tok.join(lp, "_tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            stable_round(F.avg("_lp"), 4).alias("avg_logprob"),
        )
    )


def lm_score_with(
    df: DataFrame,
    id_col: str,
    text_col: str,
    make_scorer,
    batch_size: int = 64,
) -> DataFrame:
    """(id, lm_score) under ANY batched language model — the production
    upgrade path of :func:`unigram_logprob_scores`' corpus-unigram
    stand-in (CCNet's actual filter is perplexity under a KenLM).

    ``make_scorer`` is a zero-arg factory returning
    ``score_batch(texts: list[str]) -> list[float]``; it runs INSIDE
    each partition (models must not be pickled from the driver — same
    contract as enrich.enrich_with_llm / enrich.embed_with). Arrow
    batches carry text out and doubles back; Spark-side shape is one
    narrow mapInPandas, so the operator scales with the corpus
    partitioning and the model cost, nothing else.
    """
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("lm_score", T.DoubleType()),
        ]
    )

    def run(batches):
        score_batch = make_scorer()
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            scores: list[float] = []
            for i in range(0, len(texts), batch_size):
                scores.extend(float(s) for s in score_batch(texts[i : i + batch_size]))
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "lm_score": scores})

    return df.select(id_col, text_col).mapInPandas(run, schema)


def deterministic_fake_lm(scale: int = 500):
    """Test-grade LM scorer factory: per-token pseudo-logprob derived
    from the same md5-based 32-bit token hash the engine uses
    (functions/hashing.stable_hash32, seed 0), averaged with the
    stable_round(4) convention. Deliberately engine-exact so the
    adapter's gate query can carry a FULL DuckDB oracle — the plumbing
    is exercised end-to-end under the hash-compare, not a rows-only
    check. Score range (-3, -1]; empty text scores 0.0."""
    import hashlib
    import math

    def score_batch(texts: list[str]) -> list[float]:
        out = []
        for t in texts:
            toks = [x for x in t.split(" ") if x]
            if not toks:
                out.append(0.0)
                continue
            s = 0.0
            for tok in toks:
                h = int(hashlib.md5(f"0:{tok}".encode()).hexdigest()[:8], 16)
                s += -1.0 - (h % 1000) / scale
            out.append(math.floor((s / len(toks)) * 10000.0 + 0.5) / 10000.0)
        return out

    return lambda: score_batch


def deterministic_fake_lm_sql(text_expr: str, scale: int = 500) -> str:
    """DuckDB twin of :func:`deterministic_fake_lm`'s scorer. The
    reduction mirrors the Python loop ORDER (list_reduce is sequential)
    so IEEE summation is bit-identical."""
    toks = f"list_filter(string_split({text_expr}, ' '), _x -> _x <> '')"
    tok_lp = (
        f"-1.0 - (CAST(('0x' || substring(md5('0:' || _t), 1, 8)) AS UBIGINT)::BIGINT"
        f" % 1000) / {float(scale)}"
    )
    lps = f"list_transform({toks}, _t -> {tok_lp})"
    total = f"list_reduce(list_prepend(0.0::DOUBLE, {lps}), (_a, _b) -> _a + _b)"
    return f"""
CASE WHEN len({toks}) = 0 THEN 0.0
     ELSE floor(({total} / len({toks})) * 10000.0 + 0.5) / 10000.0 END"""


def unigram_logprob_sql(
    toks_expr: str, id_expr: str = "doc_id", relation: str = "documents"
) -> str:
    """DuckDB twin of :func:`unigram_logprob_scores` over ``relation``.

    ln() on both engines is IEEE-double libm over IDENTICAL integer
    ratios (counts are exact), and the 4dp stable_round keeps the
    sub-ulp ln/summation-order differences from crossing a rounding
    boundary.
    """
    from ..functions.rounding import stable_round_sql

    return f"""
WITH tok AS (SELECT {id_expr} AS id, unnest({toks_expr}) AS _tok FROM {relation}),
vocab AS (SELECT _tok, count(*) AS _cnt FROM tok GROUP BY _tok),
tot AS (SELECT sum(_cnt)::DOUBLE AS _total FROM vocab),
lp AS (SELECT _tok, ln(_cnt / _total) AS _lp FROM vocab CROSS JOIN tot)
SELECT id AS doc_id,
       count(*)::BIGINT AS n_tokens,
       {stable_round_sql("avg(_lp)", 4)} AS avg_logprob
FROM tok JOIN lp USING (_tok) GROUP BY id
"""


# ---------------------------------------------------------------------------
# Vocabulary drift between corpus snapshots (data-freshness monitoring)


def vocab_drift(
    old: DataFrame,
    new: DataFrame,
    token_col: str,
) -> DataFrame:
    """Per-token frequency shift between two corpus snapshots — the
    monitoring primitive behind "did this ingest batch change what the
    model will see": token-level p_old vs p_new with the signed delta,
    full outer over both vocabularies (a token present in only one
    snapshot gets probability 0 on the other side).

    Returns (token, c_old, c_new, p_old, p_new, delta) for the union
    vocabulary; callers rank by |delta| for top movers or sum |delta|/2
    for total-variation distance.

    Scale shape: two token-keyed count aggregations, a full-outer
    equi-join on the token, and two broadcast 1-row totals. Cost is
    O(vocab), never O(corpus^2); at 100 TB the counts frames are the
    only shuffles and both are map-side combined.
    """
    from ..functions.rounding import stable_round

    oc = (
        old.select(F.explode(F.col(token_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_old"))
    )
    nc = (
        new.select(F.explode(F.col(token_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c_new"))
    )
    tot_o = oc.agg(F.sum("c_old").cast("double").alias("_to"))
    tot_n = nc.agg(F.sum("c_new").cast("double").alias("_tn"))
    joined = (
        oc.join(nc, "token", "full_outer")
        .select(
            "token",
            F.coalesce(F.col("c_old"), F.lit(0)).cast("bigint").alias("c_old"),
            F.coalesce(F.col("c_new"), F.lit(0)).cast("bigint").alias("c_new"),
        )
        .crossJoin(F.broadcast(tot_o))
        .crossJoin(F.broadcast(tot_n))
    )
    p_old = F.col("c_old") / F.col("_to")
    p_new = F.col("c_new") / F.col("_tn")
    return joined.select(
        "token",
        "c_old",
        "c_new",
        stable_round(p_old, 6).alias("p_old"),
        stable_round(p_new, 6).alias("p_new"),
        stable_round(p_new - p_old, 6).alias("delta"),
    )


def vocab_drift_sql(
    old_rel: str,
    new_rel: str,
    toks_expr: str,
) -> str:
    """DuckDB twin of :func:`vocab_drift`; ``old_rel``/``new_rel`` are
    relation expressions (subqueries or table names) with the same
    text column ``toks_expr`` tokenizes."""
    from ..functions.rounding import stable_round_sql

    return f"""
WITH oc AS (
  SELECT _tok AS token, count(*)::BIGINT AS c_old
  FROM (SELECT unnest({toks_expr}) AS _tok FROM {old_rel}) GROUP BY 1
),
nc AS (
  SELECT _tok AS token, count(*)::BIGINT AS c_new
  FROM (SELECT unnest({toks_expr}) AS _tok FROM {new_rel}) GROUP BY 1
),
tot_o AS (SELECT sum(c_old)::DOUBLE AS _to FROM oc),
tot_n AS (SELECT sum(c_new)::DOUBLE AS _tn FROM nc),
j AS (
  SELECT coalesce(oc.token, nc.token) AS token,
         coalesce(oc.c_old, 0)::BIGINT AS c_old,
         coalesce(nc.c_new, 0)::BIGINT AS c_new
  FROM oc FULL OUTER JOIN nc ON oc.token = nc.token
)
SELECT token, c_old, c_new,
       {stable_round_sql("c_old / _to", 6)} AS p_old,
       {stable_round_sql("c_new / _tn", 6)} AS p_new,
       {stable_round_sql("c_new / _tn - c_old / _to", 6)} AS delta
FROM j CROSS JOIN tot_o CROSS JOIN tot_n
"""


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", table A1 — public parameters). Each rule is a pure
# column expression over the raw text (single projection, no shuffle);
# `True` means the document FAILS that rule. Word = raw whitespace
# token (case preserved — symbol and alpha rules need the raw form);
# line = '\n'-split segment.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1          # '#' and '...' per word
GOPHER_MAX_BULLET_LINE_FRAC = 0.9      # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3    # lines ending with '...'
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8       # words containing a letter
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2               # distinct required stopwords


def _ws_tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def _ws_tokens_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), _w -> _w <> '')"
    )


def _occurrences(text: Column, needle: str) -> Column:
    """Count of non-overlapping needle occurrences (leftmost-greedy
    replace semantics — identical in Spark and DuckDB)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / len(needle)


def gopher_flags(
    text: Column,
    min_words: int = GOPHER_MIN_WORDS,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> dict[str, Column]:
    """Per-rule FAIL flags, keyed in report-column order. ``min_words``
    and ``stopwords`` are tunable (the stopword rule is language- and
    domain-specific by nature); every other bound is the published
    Gopher parameter."""
    toks = _ws_tokens(text)
    n_words = F.size(toks)
    n_safe = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = (
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t).cast("double"))
        / n_safe
    )
    symbol_ratio = (_occurrences(text, "#") + _occurrences(text, "...")) / n_safe
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != F.lit(""))
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("..."))) / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n_safe
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in stopwords]),
        )
    )
    return {
        "fail_word_count": (n_words < min_words)
        | (n_words > GOPHER_MAX_WORDS),
        "fail_mean_word_len": (mean_wl < GOPHER_MIN_MEAN_WORD_LEN)
        | (mean_wl > GOPHER_MAX_MEAN_WORD_LEN),
        "fail_symbol_ratio": symbol_ratio > GOPHER_MAX_SYMBOL_RATIO,
        "fail_bullet_lines": bullet_frac > GOPHER_MAX_BULLET_LINE_FRAC,
        "fail_ellipsis_lines": ellipsis_frac > GOPHER_MAX_ELLIPSIS_LINE_FRAC,
        "fail_alpha_words": alpha_frac < GOPHER_MIN_ALPHA_WORD_FRAC,
        "fail_stopwords": stop_hits < GOPHER_MIN_STOPWORDS,
    }


def gopher_pass(
    text: Column,
    min_words: int = GOPHER_MIN_WORDS,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> Column:
    """True iff the document passes every Gopher rule."""
    combined = F.lit(False)
    for flag in gopher_flags(text, min_words, stopwords).values():
        combined = combined | flag
    return ~combined


def gopher_flags_sql(
    expr: str,
    min_words: int = GOPHER_MIN_WORDS,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> dict[str, str]:
    """DuckDB twins of :func:`gopher_flags`, same keys/order."""
    toks = _ws_tokens_sql(expr)
    n_words = f"len({toks})"
    n_safe = f"greatest({n_words}, 1)::DOUBLE"
    mean_wl = f"(list_sum(list_transform({toks}, _w -> length(_w)))::DOUBLE / {n_safe})"
    occ_hash = f"(length({expr}) - length(replace({expr}, '#', '')))"
    occ_ell = f"((length({expr}) - length(replace({expr}, '...', ''))) / 3)"
    symbol_ratio = f"(({occ_hash} + {occ_ell})::DOUBLE / {n_safe})"
    lines = f"list_filter(string_split({expr}, chr(10)), _l -> trim(_l) <> '')"
    n_lines = f"greatest(len({lines}), 1)::DOUBLE"
    bullet = (
        f"(len(list_filter({lines}, _l -> regexp_matches(trim(_l), '^[-*•]')))"
        f"::DOUBLE / {n_lines})"
    )
    ellipsis = (
        f"(len(list_filter({lines}, _l -> rtrim(_l) LIKE '%...'))::DOUBLE / {n_lines})"
    )
    alpha = (
        f"(len(list_filter({toks}, _w -> regexp_matches(_w, '[A-Za-z]')))"
        f"::DOUBLE / {n_safe})"
    )
    stop_arr = "[" + ", ".join(f"'{w}'" for w in stopwords) + "]"
    stops = f"len(list_intersect(list_transform({toks}, _w -> lower(_w)), {stop_arr}))"
    return {
        "fail_word_count": f"({n_words} < {min_words} OR {n_words} > {GOPHER_MAX_WORDS})",
        "fail_mean_word_len": f"({mean_wl} < {GOPHER_MIN_MEAN_WORD_LEN} OR {mean_wl} > {GOPHER_MAX_MEAN_WORD_LEN})",
        "fail_symbol_ratio": f"({symbol_ratio} > {GOPHER_MAX_SYMBOL_RATIO})",
        "fail_bullet_lines": f"({bullet} > {GOPHER_MAX_BULLET_LINE_FRAC})",
        "fail_ellipsis_lines": f"({ellipsis} > {GOPHER_MAX_ELLIPSIS_LINE_FRAC})",
        "fail_alpha_words": f"({alpha} < {GOPHER_MIN_ALPHA_WORD_FRAC})",
        "fail_stopwords": f"({stops} < {GOPHER_MIN_STOPWORDS})",
    }


def gopher_pass_sql(
    expr: str,
    min_words: int = GOPHER_MIN_WORDS,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> str:
    return (
        "NOT ("
        + " OR ".join(gopher_flags_sql(expr, min_words, stopwords).values())
        + ")"
    )


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020 §2.2 — public heuristics).
# Line rules: keep a line only if it ends in terminal punctuation, has
# >= 5 words, and does not mention javascript. Document rules: >= 3
# retained lines, no '{', no 'lorem ipsum'. Everything is array-lambda
# column algebra over the split text — a single projection with NO
# explode and NO shuffle, so it runs map-side at any corpus size.

C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
_C4_TERMINAL_RE = r'[.!?"]$'


def c4_kept_lines(text: Column) -> Column:
    """Array of retained lines, original order preserved."""
    lines = F.split(text, "\n")
    def _keep(l: Column) -> Column:
        t = F.trim(l)
        return (
            t.rlike(_C4_TERMINAL_RE)
            & (F.size(_ws_tokens(t)) >= C4_MIN_LINE_WORDS)
            & ~F.lower(t).contains("javascript")
        )
    return F.filter(lines, _keep)


def c4_doc_pass(text: Column, kept: Column) -> Column:
    return (
        (F.size(kept) >= C4_MIN_KEPT_LINES)
        & ~text.contains("{")
        & ~F.lower(text).contains("lorem ipsum")
    )


def c4_clean(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Filtered corpus: line-cleaned text for documents that survive the
    doc-level rules; adds n_lines/n_kept stats columns."""
    text = F.col(text_col)
    kept = c4_kept_lines(text)
    return (
        df.withColumn("_kept", kept)
        .filter(c4_doc_pass(text, F.col("_kept")))
        .withColumn("n_lines", F.size(F.split(text, "\n")))
        .withColumn("n_kept", F.size(F.col("_kept")))
        .withColumn(text_col, F.array_join(F.col("_kept"), "\n"))
        .drop("_kept")
    )


def c4_kept_lines_sql(expr: str) -> str:
    toks = _ws_tokens_sql("trim(_l)")
    return (
        f"list_filter(string_split({expr}, chr(10)), _l -> "
        f"regexp_matches(trim(_l), '{_C4_TERMINAL_RE}') "
        f"AND len({toks}) >= {C4_MIN_LINE_WORDS} "
        f"AND NOT contains(lower(trim(_l)), 'javascript'))"
    )


def c4_doc_pass_sql(expr: str, kept_expr: str) -> str:
    return (
        f"(len({kept_expr}) >= {C4_MIN_KEPT_LINES} "
        f"AND NOT contains({expr}, '{{') "
        f"AND NOT contains(lower({expr}), 'lorem ipsum'))"
    )


# ---------------------------------------------------------------------------
# Naive Bayes quality classifier (the GPT-3/CCNet "quality classifier"
# pattern, public method: Brown et al. 2020 appendix A — a linear
# classifier over token features separates high-quality from
# low-quality text; filtering keeps docs the classifier scores
# positive). Training IS aggregation here: per-token class counts +
# Laplace-smoothed log-likelihood ratios, so the classifier trains in
# two hash aggs over the token shuffle and scores with one equi-join —
# no gradient loop, no driver state, 100 TB-shaped end to end.

def nb_token_llr(
    train: DataFrame, token_col: str, label_col: str
) -> tuple[DataFrame, DataFrame]:
    """Train: (token llr frame, 1-row model-stats frame).

    llr(t) = ln(pos_t + 1) - ln(pos_total + V) - (ln(neg_t + 1) -
    ln(neg_total + V)); the stats frame carries the class prior and the
    out-of-vocabulary llr (a token never seen in training backs off to
    count 0 in both classes). All counts are exact integers, so the ln
    inputs — and therefore the model — are bit-identical across engines
    and partitionings.
    """
    tok = train.select(
        F.explode(F.col(token_col)).alias("_tok"),
        F.col(label_col).cast("int").alias("_y"),
    )
    counts = tok.groupBy("_tok").agg(
        F.sum("_y").alias("_pos"),
        F.sum(1 - F.col("_y")).alias("_neg"),
    )
    docs_agg = train.select(F.col(label_col).cast("int").alias("_y")).agg(
        F.sum("_y").alias("n_pos_docs"),
        F.sum(1 - F.col("_y")).alias("n_neg_docs"),
    )
    stats = (
        counts.agg(
            F.sum("_pos").alias("_pos_total"),
            F.sum("_neg").alias("_neg_total"),
            F.count(F.lit(1)).alias("_v"),
        )
        .crossJoin(F.broadcast(docs_agg))
        .select(
            "_pos_total",
            "_neg_total",
            "_v",
            (
                F.log(F.col("n_pos_docs").cast("double"))
                - F.log(F.col("n_neg_docs").cast("double"))
            ).alias("prior"),
            (
                F.log(F.lit(1.0))
                - F.log((F.col("_pos_total") + F.col("_v")).cast("double"))
                - (
                    F.log(F.lit(1.0))
                    - F.log((F.col("_neg_total") + F.col("_v")).cast("double"))
                )
            ).alias("oov_llr"),
        )
    )
    llr = counts.crossJoin(F.broadcast(stats)).select(
        "_tok",
        (
            F.log((F.col("_pos") + 1).cast("double"))
            - F.log((F.col("_pos_total") + F.col("_v")).cast("double"))
            - (
                F.log((F.col("_neg") + 1).cast("double"))
                - F.log((F.col("_neg_total") + F.col("_v")).cast("double"))
            )
        ).alias("_llr"),
    )
    return llr, stats


def nb_score(
    df: DataFrame, id_col: str, token_col: str, llr: DataFrame, stats: DataFrame
) -> DataFrame:
    """(id, nb_score): prior + Σ llr(token), OOV tokens backed off.
    One explode + equi-join on the token key + doc-key agg."""
    from ..functions.rounding import stable_round

    tok = df.select(F.col(id_col), F.explode(F.col(token_col)).alias("_tok"))
    scored = tok.join(llr, "_tok", "left").crossJoin(F.broadcast(stats))
    return scored.groupBy(id_col).agg(
        stable_round(
            F.first("prior") + F.sum(F.coalesce(F.col("_llr"), F.col("oov_llr"))),
            4,
        ).alias("nb_score")
    )


def nb_token_llr_sql(train_rel: str, toks_expr: str, label_expr: str) -> str:
    """DuckDB CTE block defining tok/counts/stats/llr over ``train_rel``
    (identical expression structure to the Spark builders, so the libm
    ln calls see bit-identical integer ratios)."""
    return f"""
tok AS (SELECT unnest({toks_expr}) AS _tok, ({label_expr})::INT AS _y FROM {train_rel}),
counts AS (SELECT _tok, sum(_y)::BIGINT AS _pos, sum(1 - _y)::BIGINT AS _neg
           FROM tok GROUP BY _tok),
dstats AS (SELECT sum(({label_expr})::INT)::BIGINT AS n_pos_docs,
                  sum(1 - ({label_expr})::INT)::BIGINT AS n_neg_docs
           FROM {train_rel}),
stats AS (
  SELECT _pos_total, _neg_total, _v,
         (ln(n_pos_docs::DOUBLE) - ln(n_neg_docs::DOUBLE)) AS prior,
         (ln(1.0) - ln((_pos_total + _v)::DOUBLE)
          - (ln(1.0) - ln((_neg_total + _v)::DOUBLE))) AS oov_llr
  FROM (SELECT sum(_pos)::BIGINT AS _pos_total, sum(_neg)::BIGINT AS _neg_total,
               count(*)::BIGINT AS _v FROM counts) CROSS JOIN dstats
),
llr AS (
  SELECT _tok,
         (ln((_pos + 1)::DOUBLE) - ln((_pos_total + _v)::DOUBLE)
          - (ln((_neg + 1)::DOUBLE) - ln((_neg_total + _v)::DOUBLE))) AS _llr
  FROM counts CROSS JOIN stats
)"""


# ---------------------------------------------------------------------------
# Corpus diversity indices (per-domain lexical-statistics report)


def diversity_by_domain(
    df: DataFrame,
    domain_col: str,
    token_col: str,
) -> DataFrame:
    """Per-domain lexical diversity: vocabulary size, type-token ratio,
    Shannon entropy of the token distribution, and the Simpson
    repeat-probability — the standard corpus-analysis panel for "is
    this slice of the corpus degenerate or diverse".

    Shannon is computed as ln(N) - (1/N) * sum(c * ln(c)) — one log per
    VOCAB entry, no per-token division, and the only float sum is over
    the vocab (4dp-rounded). Simpson's numerator sum(c*(c-1)) is pure
    integer arithmetic, exact on any engine.

    Scale shape: one (domain, token) count aggregation, one domain
    reduction. Nothing global; the output is D rows.
    """
    from ..functions.rounding import stable_round

    dt = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.col(token_col)).alias("_tok"),
        )
        .groupBy("domain", "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return dt.groupBy("domain").agg(
        F.sum("_c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        stable_round(F.count(F.lit(1)) / F.sum("_c"), 4).alias("ttr"),
        stable_round(
            F.log(F.sum("_c"))
            - F.sum(F.col("_c") * F.log(F.col("_c"))) / F.sum("_c"),
            4,
        ).alias("shannon"),
        stable_round(
            F.sum(F.col("_c") * (F.col("_c") - 1))
            / (F.sum("_c") * (F.sum("_c") - F.lit(1))),
            6,
        ).alias("simpson"),
    )


def diversity_by_domain_sql(
    toks_expr: str, domain_expr: str, relation: str = "documents"
) -> str:
    """DuckDB twin of :func:`diversity_by_domain`."""
    from ..functions.rounding import stable_round_sql

    return f"""
WITH tok AS (
  SELECT {domain_expr} AS domain, unnest({toks_expr}) AS _tok FROM {relation}
),
dt AS (SELECT domain, _tok, count(*)::BIGINT AS _c FROM tok GROUP BY 1, 2)
SELECT domain,
       sum(_c)::BIGINT AS n_tokens,
       count(*)::BIGINT AS vocab,
       {stable_round_sql("count(*) / sum(_c)", 4)} AS ttr,
       {stable_round_sql("ln(sum(_c)) - sum(_c * ln(_c)) / sum(_c)", 4)} AS shannon,
       {stable_round_sql("sum(_c * (_c - 1)) / (sum(_c) * (sum(_c) - 1))", 6)} AS simpson
FROM dt GROUP BY domain
"""


# ---------------------------------------------------------------------------
# Shared OLS-slope closed form (zipf / heaps fits). The SAME expression
# text must back both the Spark aggregation and the SQL twin, or the
# fits silently fork between engines.


def ols_slope(xcol: Column, ycol: Column) -> Column:
    n = F.count(F.lit(1))
    sx, sy = F.sum(xcol), F.sum(ycol)
    sxy, sxx = F.sum(xcol * ycol), F.sum(xcol * xcol)
    return (sxy - sx * sy / n) / (sxx - sx * sx / n)


def ols_intercept(xcol: Column, ycol: Column) -> Column:
    return (F.sum(ycol) - ols_slope(xcol, ycol) * F.sum(xcol)) / F.count(F.lit(1))


def ols_slope_sql(x: str, y: str) -> str:
    return (
        f"(sum({x} * {y}) - sum({x}) * sum({y}) / count(*))"
        f" / (sum({x} * {x}) - sum({x}) * sum({x}) / count(*))"
    )


def zipf_slope_by_domain(
    df: DataFrame,
    domain_col: str,
    token_col: str,
) -> DataFrame:
    """Per-domain Zipf fit: OLS slope of ln(freq) on ln(rank) over the
    domain's rank-frequency table. Natural text sits near -1; a slope
    collapsing toward 0 (flat) or diving steeply flags synthetic or
    template-degenerate slices — the classic corpus sanity plot,
    reduced to its statistic.

    Ranking is deterministic (freq desc, token asc). Returns (domain,
    vocab, zipf_slope). One (domain, token) count, one per-domain rank
    window, one reduction.
    """
    from pyspark.sql import Window

    from ..functions.rounding import stable_round

    dt = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.col(token_col)).alias("_tok"),
        )
        .groupBy("domain", "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy("domain").orderBy(F.col("_c").desc(), F.col("_tok").asc())
    ranked = dt.withColumn("_r", F.row_number().over(w)).select(
        "domain",
        F.log(F.col("_r").cast("double")).alias("_x"),
        F.log(F.col("_c").cast("double")).alias("_y"),
    )
    return ranked.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        stable_round(ols_slope(F.col("_x"), F.col("_y")), 4).alias("zipf_slope"),
    )


def zipf_slope_by_domain_sql(
    toks_expr: str, domain_expr: str, relation: str = "documents"
) -> str:
    """DuckDB twin of :func:`zipf_slope_by_domain`."""
    from ..functions.rounding import stable_round_sql

    return f"""
WITH tok AS (
  SELECT {domain_expr} AS domain, unnest({toks_expr}) AS _tok FROM {relation}
),
dt AS (SELECT domain, _tok, count(*)::BIGINT AS _c FROM tok GROUP BY 1, 2),
rk AS (
  SELECT domain,
         ln(row_number() OVER (PARTITION BY domain ORDER BY _c DESC, _tok ASC)::DOUBLE) AS _x,
         ln(_c::DOUBLE) AS _y
  FROM dt
)
SELECT domain, count(*)::BIGINT AS vocab,
       {stable_round_sql(ols_slope_sql("_x", "_y"), 4)} AS zipf_slope
FROM rk GROUP BY domain
"""


def pmi_collocations(
    df: DataFrame,
    token_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the
    classic collocation detector (Church & Hanks 1990): phrases whose
    words co-occur far above chance ("new york", "machine learning").

    PMI = ln(c_xy * N / (cL_x * cR_y)) with cL/cR the word's counts in
    the left/right bigram slot and N the bigram total — each slot
    distribution sums to N, so the measure is internally consistent,
    and every product under the log is integer-derived (identical
    doubles on every engine). Pairs below ``min_count`` are dropped
    (rare-pair PMI explodes by definition).

    Returns (w1, w2, n_pair, pmi). Scale shape: one bigram explode,
    three keyed counts (pair, left-slot, right-slot — the slot counts
    reduce FROM the pair frame, reusing its shuffle), two vocab-keyed
    equi-joins, a 1-row total broadcast.
    """
    from ..functions.rounding import stable_round

    n = F.size(F.col(token_col))
    pairs = (
        df.filter(n >= 2)
        .select(
            F.explode(F.sequence(F.lit(1), n - 1)).alias("_i"), F.col(token_col)
        )
        .select(
            F.element_at(F.col(token_col), F.col("_i")).alias("w1"),
            F.element_at(F.col(token_col), F.col("_i") + 1).alias("w2"),
        )
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    left = pc.groupBy("w1").agg(F.sum("n_pair").alias("_cl"))
    right = pc.groupBy("w2").agg(F.sum("n_pair").alias("_cr"))
    total = pc.agg(F.sum("n_pair").cast("double").alias("_n"))
    return (
        pc.filter(F.col("n_pair") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            stable_round(
                F.log(
                    (F.col("n_pair") * F.col("_n"))
                    / (F.col("_cl").cast("double") * F.col("_cr"))
                ),
                4,
            ).alias("pmi"),
        )
    )


def pmi_collocations_sql(
    toks_expr: str, min_count: int = 5, relation: str = "documents"
) -> str:
    """DuckDB twin of :func:`pmi_collocations`."""
    from ..functions.rounding import stable_round_sql

    return f"""
WITH t AS (SELECT {toks_expr} AS toks FROM {relation}),
bg AS (
  SELECT toks[_i] AS w1, toks[_i + 1] AS w2
  FROM t, LATERAL unnest(range(1, greatest(len(toks) - 1, 0) + 1)) r(_i)
),
pc AS (SELECT w1, w2, count(*)::BIGINT AS n_pair FROM bg GROUP BY 1, 2),
lc AS (SELECT w1, sum(n_pair)::BIGINT AS _cl FROM pc GROUP BY 1),
rc AS (SELECT w2, sum(n_pair)::BIGINT AS _cr FROM pc GROUP BY 1),
n AS (SELECT sum(n_pair)::DOUBLE AS _n FROM pc)
SELECT pc.w1, pc.w2, pc.n_pair,
       {stable_round_sql("ln((pc.n_pair * n._n) / (lc._cl::DOUBLE * rc._cr))", 4)} AS pmi
FROM pc
JOIN lc USING (w1)
JOIN rc USING (w2)
CROSS JOIN n
WHERE pc.n_pair >= {min_count}
"""


def heaps_fit_by_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    token_col: str,
) -> DataFrame:
    """Per-domain Heaps' law fit V(N) ~ K * N^beta: how fast the
    vocabulary grows as the corpus streams in (doc-id order). Natural
    text sits around beta ~ 0.5; beta near 0 means the vocabulary
    saturated (template/synthetic text), near 1 means near-disjoint
    documents. The companion statistic to the Zipf slope.

    Mechanics: each token's first-occurrence doc (min id per (domain,
    token)) -> per-doc new-type counts -> running (N_i, V_i) cumulative
    token/vocab curves via one per-domain window -> OLS of ln V on
    ln N. Returns (domain, n_docs, beta, k), both floats 4dp
    stable-rounded.

    Scale shape: one token-keyed aggregation, one doc-keyed
    aggregation, one per-domain ordered window, one reduction. The
    window runs over doc-level rows (not tokens); its parallelism is
    the domain count, so at 1e9-docs-per-domain scale the curve should
    be SAMPLED at log-spaced checkpoints before the cumsum — the fit
    only needs O(100) curve points, and subsampling the x-axis does
    not bias the OLS.
    """
    from pyspark.sql import Window

    from ..functions.rounding import stable_round

    tok = df.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("_id"),
        F.explode(F.col(token_col)).alias("_tok"),
    )
    first = tok.groupBy("domain", "_tok").agg(F.min("_id").alias("_fid"))
    new_per_doc = first.groupBy("domain", F.col("_fid").alias("_id")).agg(
        F.count(F.lit(1)).alias("_n_new")
    )
    per_doc = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.col(id_col).alias("_id"),
            F.size(F.col(token_col)).alias("_n_toks"),
        )
        .join(new_per_doc, ["domain", "_id"], "left")
        .select(
            "domain",
            "_id",
            "_n_toks",
            F.coalesce(F.col("_n_new"), F.lit(0)).alias("_n_new"),
        )
    )
    # explicit ROWS frame: Spark's default for an ordered window is RANGE
    # UNBOUNDED..CURRENT, which folds in all ORDER-BY tie peers — the SQL
    # twin pins ROWS, so the engines' curves would diverge if (domain,
    # doc_id) were ever non-unique
    w = (
        Window.partitionBy("domain")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curves = (
        per_doc.withColumn("_N", F.sum("_n_toks").over(w))
        .withColumn("_V", F.sum("_n_new").over(w))
        .filter((F.col("_N") > 0) & (F.col("_V") > 0))
        .select(
            "domain",
            F.log(F.col("_N").cast("double")).alias("_x"),
            F.log(F.col("_V").cast("double")).alias("_y"),
        )
    )
    x, y = F.col("_x"), F.col("_y")
    return curves.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        stable_round(ols_slope(x, y), 4).alias("beta"),
        stable_round(F.exp(ols_intercept(x, y)), 4).alias("k"),
    )


def heaps_fit_by_domain_sql(
    toks_expr: str,
    domain_expr: str,
    id_expr: str = "doc_id",
    relation: str = "documents",
) -> str:
    """DuckDB twin of :func:`heaps_fit_by_domain`."""
    from ..functions.rounding import stable_round_sql

    beta = ols_slope_sql("_x", "_y")
    return f"""
WITH tok AS (
  SELECT {domain_expr} AS domain, {id_expr} AS _id, unnest({toks_expr}) AS _tok
  FROM {relation}
),
first AS (SELECT domain, _tok, min(_id) AS _fid FROM tok GROUP BY 1, 2),
npd AS (SELECT domain, _fid AS _id, count(*)::BIGINT AS _n_new FROM first GROUP BY 1, 2),
per_doc AS (
  SELECT d.domain, d._id, d._n_toks, coalesce(npd._n_new, 0) AS _n_new
  FROM (SELECT {domain_expr} AS domain, {id_expr} AS _id,
               len({toks_expr})::BIGINT AS _n_toks FROM {relation}) d
  LEFT JOIN npd USING (domain, _id)
),
curves AS (
  SELECT domain,
         ln((sum(_n_toks) OVER w)::DOUBLE) AS _x,
         ln((sum(_n_new) OVER w)::DOUBLE) AS _y,
         sum(_n_toks) OVER w AS _N, sum(_n_new) OVER w AS _V
  FROM per_doc
  WINDOW w AS (PARTITION BY domain ORDER BY _id ROWS UNBOUNDED PRECEDING)
)
SELECT domain, count(*)::BIGINT AS n_docs,
       {stable_round_sql(beta, 4)} AS beta,
       {stable_round_sql(f"exp((sum(_y) - ({beta}) * sum(_x)) / count(*))", 4)} AS k
FROM curves WHERE _N > 0 AND _V > 0
GROUP BY domain
"""


def bigram_logprob_scores(
    df: DataFrame,
    id_col: str,
    token_col: str,
    lam: float = 0.7,
) -> DataFrame:
    """Per-document average interpolated bigram log-probability under
    the corpus's own LM: ln(lam * P(w2|w1) + (1-lam) * P(w2)) averaged
    over the doc's bigram positions — one step closer to CCNet's
    reference-LM perplexity than the unigram signal (conditioning
    penalizes improbable SEQUENCES of individually-common tokens; the
    unigram interpolation floor keeps unseen bigrams finite, Jelinek-
    Mercer smoothing).

    Returns (id, n_bigrams, avg_logprob); docs with < 2 tokens get a
    zero-bigram row with NULL avg_logprob.

    Scale shape: one bigram explode feeding the model aggregation AND
    the doc aggregation (same shuffle key), a vocab²-bounded bigram
    model equi-join, a vocab-bounded unigram join, one broadcast 1-row
    total. Never doc x doc.
    """
    from ..functions.rounding import stable_round

    toks = F.col(token_col)
    bigrams = F.transform(
        index_1_to(F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i.cast("int")).alias("w1"),
            F.element_at(toks, i.cast("int") + 1).alias("w2"),
        ),
    )
    rows = df.select(F.col(id_col), F.explode(bigrams).alias("_b")).select(
        F.col(id_col), F.col("_b.w1").alias("_w1"), F.col("_b.w2").alias("_w2")
    )
    bi = rows.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c_bi"))
    uni = bi.groupBy("_w1").agg(F.sum("_c_bi").alias("_c_w1"))
    # unigram dist over SECOND positions (the interpolation floor)
    uni2 = bi.groupBy("_w2").agg(F.sum("_c_bi").alias("_c_w2"))
    total = bi.agg(F.sum("_c_bi").cast("double").alias("_n"))
    p = (
        F.lit(float(lam)) * (F.col("_c_bi") / F.col("_c_w1"))
        + F.lit(1.0 - float(lam)) * (F.col("_c_w2") / F.col("_n"))
    )
    scored = (
        rows.join(bi, ["_w1", "_w2"])
        .join(uni, "_w1")
        .join(uni2, "_w2")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), F.log(p).alias("_lp"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        stable_round(F.avg("_lp"), 4).alias("avg_logprob"),
    )
    base = df.select(F.col(id_col))
    return base.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.col("avg_logprob"),
    )


def bigram_logprob_sql(
    toks_expr: str,
    id_expr: str = "doc_id",
    relation: str = "documents",
    lam: float = 0.7,
) -> str:
    """DuckDB twin of :func:`bigram_logprob_scores`."""
    from ..functions.rounding import stable_round_sql

    return f"""
WITH t AS (SELECT {id_expr} AS id, {toks_expr} AS toks FROM {relation}),
rows_ AS (
  SELECT id, toks[_i] AS _w1, toks[_i + 1] AS _w2
  FROM t, LATERAL unnest(range(1, greatest(len(toks) - 1, 0) + 1)) r(_i)
),
bi AS (SELECT _w1, _w2, count(*) AS _c_bi FROM rows_ GROUP BY 1, 2),
uni AS (SELECT _w1, sum(_c_bi) AS _c_w1 FROM bi GROUP BY 1),
uni2 AS (SELECT _w2, sum(_c_bi) AS _c_w2 FROM bi GROUP BY 1),
tot AS (SELECT sum(_c_bi)::DOUBLE AS _n FROM bi),
sc AS (
  SELECT rows_.id,
         ln({float(lam)!r} * (bi._c_bi / uni._c_w1)
            + {1.0 - float(lam)!r} * (uni2._c_w2 / tot._n)) AS _lp
  FROM rows_
  JOIN bi USING (_w1, _w2) JOIN uni USING (_w1) JOIN uni2 USING (_w2)
  CROSS JOIN tot
),
agg AS (
  SELECT id, count(*)::BIGINT AS n_bigrams,
         {stable_round_sql("avg(_lp)", 4)} AS avg_logprob
  FROM sc GROUP BY id
)
SELECT t.id AS {id_expr},
       coalesce(agg.n_bigrams, 0)::BIGINT AS n_bigrams,
       agg.avg_logprob
FROM t LEFT JOIN agg ON t.id = agg.id
"""


# ---------------------------------------------------------------------------
# Okapi BM25 (Robertson & Walker / Sparck Jones; the Lucene +1 idf
# variant that keeps idf positive for terms in more than half the
# corpus) — the sparse-retrieval baseline next to the dense ANN family.


def bm25_scores(
    df: DataFrame,
    id_col: str,
    token_col: str,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document against a fixed query-term list:
    score(d) = sum over q of idf(q) * tf * (k1+1) /
    (tf + k1 * (1 - b + b * dl / avgdl)), idf = ln(1 + (N - df + .5) /
    (df + .5)). Documents matching NO query term are omitted (their
    score is 0 — at corpus scale emitting all-zero rows is the bug).

    Returns (id, n_terms_matched, score), score engine-stably rounded.

    Scale shape: corpus doc-length frame is one narrow projection;
    the token explode is FILTERED to the |Q| query terms before any
    shuffle (predicate pushes to the scan side of the explode), so the
    shuffled volume is matching postings only — the classic inverted-
    index posting traversal as a dataframe plan. Per-term df and the
    1-row (N, avgdl) stats broadcast. Never doc x doc.
    """
    from ..functions.rounding import stable_round

    q = [t.lower() for t in query_terms]
    lens = df.select(
        F.col(id_col), F.size(F.col(token_col)).cast("double").alias("_dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    post = (
        df.select(F.col(id_col), F.explode(F.col(token_col)).alias("_term"))
        .filter(F.col("_term").isin(q))
        .groupBy(id_col, "_term")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )
    dft = post.groupBy("_term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    scored = (
        post.join(F.broadcast(dft), "_term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1.0))
                / (
                    F.col("_tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b * F.col("_dl") / F.greatest(F.col("_avgdl"), F.lit(1e-9))
                    )
                )
            ).alias("_s"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
        stable_round(F.sum("_s"), 4).alias("score"),
    )


def bm25_scores_sql(
    toks_expr: str,
    query_terms: tuple[str, ...],
    id_expr: str = "doc_id",
    relation: str = "documents",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_scores` (same idf form, same
    rounding)."""
    from ..functions.rounding import stable_round_sql

    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    s = (
        f"ln(1.0 + (st._n - d._df + 0.5) / (d._df + 0.5))"
        f" * (p._tf * {float(k1 + 1.0)!r})"
        f" / (p._tf + {float(k1)!r} * (1.0 - {float(b)!r}"
        f" + {float(b)!r} * l._dl / greatest(st._avgdl, 1e-9)))"
    )
    return f"""
WITH t AS (SELECT {id_expr} AS id, {toks_expr} AS toks FROM {relation}),
lens AS (SELECT id, len(toks)::DOUBLE AS _dl FROM t),
st AS (SELECT count(*)::DOUBLE AS _n, avg(_dl) AS _avgdl FROM lens),
post AS (
  SELECT id, _term, count(*)::DOUBLE AS _tf
  FROM (SELECT id, unnest(toks) AS _term FROM t)
  WHERE _term IN ({terms})
  GROUP BY id, _term
),
d AS (SELECT _term, count(*)::DOUBLE AS _df FROM post GROUP BY _term),
sc AS (
  SELECT p.id, ({s}) AS _s
  FROM post p JOIN d USING (_term) JOIN lens l ON l.id = p.id CROSS JOIN st
)
SELECT id AS {id_expr}, count(*)::BIGINT AS n_terms_matched,
       {stable_round_sql("sum(_s)", 4)} AS score
FROM sc GROUP BY id
"""
