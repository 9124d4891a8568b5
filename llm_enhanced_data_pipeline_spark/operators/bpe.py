"""Distributed BPE tokenizer training and application.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) is the
tokenizer family behind every modern LLM corpus, so "token counting"
in a training-data pipeline ultimately means "counting tokens of a
LEARNED subword vocabulary" — this module learns that vocabulary on
the cluster. The reference pipeline stops at whitespace tokens
(Data_Cleaning/strict_deduplication.py:54); this is the beyond-
reference scale path.

Design (all engine-reproducible, oracle-checkable):

- Training operates on the WORD-TYPE table (word, freq) — the classic
  BPE formulation. The type table is orders of magnitude smaller than
  the corpus (Heaps' law), so per-iteration work is tiny even at
  100 TB corpus scale.
- Segmentation state is a separator-joined symbol string
  ``" c h a r s </w> "`` per word. Applying a merge (a, b) is TWO
  passes of plain (non-regex) string replace of ``" a b "`` with
  ``" ab "``. One pass of left-to-right non-overlapping replacement
  can miss a merge whose leading separator was consumed by the
  previous match (e.g. runs like ``b b b b``); a second pass reaches
  the fixpoint, PROVABLY: a replacement never creates a new occurrence
  (the merged symbol is strictly longer than both parts, and symbols
  never contain the separator), so pass 2 only clears matches that
  pass 1's space-sharing blocked, and those are mutually isolated.
  Spark's ``replace``, DuckDB's ``replace`` and Python's
  ``str.replace`` share these exact semantics, which makes the merge
  step bit-reproducible across engines. (On degenerate same-symbol
  runs the fixpoint differs from the textbook leftmost-greedy fold by
  at most the grouping of the run — a documented convention choice.)
- Pair counting is array algebra: the symbol array zipped with its own
  tail gives every adjacent pair in one projection, so each round's
  only shuffle is the (left, right) count aggregation (map-side
  partials). The argmax merge comes to the driver (ONE 1-row collect
  per iteration — it is the round's single job and its result must
  become literal plan constants for the next round's replace chain,
  so an in-plan broadcast argmax cannot remove it without adding a
  checkpoint job per round; measured r15, see OPTIMIZATION_r15.md);
  the merge itself is a pure projection, so Catalyst collapses the
  whole merge chain into one stage over the persisted word table.
- At real merge counts (30k) one merge per round-trip is too chatty;
  a production variant would batch the top-k pairwise-disjoint merges
  per round (an API extension, not built here). The oracle gates pin
  the k=1 semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import index_1_to
from .dedup import persist_tracked

EOW = "</w>"


def word_freqs(df: DataFrame, token_col: str) -> DataFrame:
    """(word, freq) type table from an array-of-tokens column."""
    return (
        df.select(F.explode(F.col(token_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def init_symbols(word: F.Column) -> F.Column:
    """Word -> ``" c h a r s </w> "`` separator-joined symbol string."""
    chars = F.transform(
        index_1_to(F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )
    return F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(f" {EOW} "))


def init_symbols_sql(expr: str) -> str:
    return (
        f"' ' || array_to_string(list_transform(range(1, length({expr}) + 1), "
        f"_i -> substring({expr}, _i, 1)), ' ') || ' {EOW} '"
    )


def apply_merge(state: F.Column, left: str, right: str) -> F.Column:
    """Two-pass replace = the engine-reproducible merge fixpoint."""
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    return F.replace(F.replace(state, pat, rep), pat, rep)


def pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, f): adjacent-symbol pair frequencies, freq-weighted.

    Adjacency is pure array algebra — the symbol array zipped with its
    own tail (``zip_with(sy[0:n-1], sy[1:n], struct)``) — so the ONLY
    shuffle is the (l, r) aggregation with map-side partial counts.
    The earlier shape (posexplode + lead() over a (word, pos) window)
    exploded one ROW per symbol and paid a per-round sort + window
    pass (the window reused the word aggregation's hash partitioning,
    so the extra cost was the sort and the row blowup, not an
    exchange) for what one row's array arithmetic expresses; measured
    r15 at sf0.1 the 12-round trainer dropped 3.64s -> 3.29s median
    (guide §2.4; plan diff Window 2 -> 0, Sort 2 -> 0 in
    plans/r15/bpe_pair_counts_*), pair counts and learned merges
    bit-identical.
    """
    sy = words.select("freq", F.split(F.trim(F.col("_s")), " ").alias("_sy"))
    n = F.size("_sy")
    prs = sy.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice("_sy", F.lit(1), n - 1),
                F.slice("_sy", F.lit(2), n - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("_p"),
    )
    return prs.groupBy(
        F.col("_p.l").alias("l"), F.col("_p.r").alias("r")
    ).agg(F.sum("freq").alias("f"))


def bpe_train(
    words: DataFrame, iters: int = 12
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``iters`` merges; returns (merges, final word table).

    merges = [(rank, left, right, pair_freq)] in learned order, the
    argmax by (freq DESC, left ASC, right ASC) each round — the
    deterministic tie order both engines reproduce. The returned word
    frame carries the final segmentation in ``_s`` (word -> subword
    lookup table: applying the tokenizer to the training corpus is a
    broadcast equi-join against it, no re-segmentation).
    """
    base = persist_tracked(
        words.select("word", "freq", init_symbols(F.col("word")).alias("_s"))
    )
    cur = base
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, iters + 1):
        top = (
            pair_counts(cur)
            .orderBy(F.col("f").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:  # corpus fully merged (tiny inputs only)
            break
        l, r, f = top[0].l, top[0].r, top[0].f
        merges.append((rank, l, r, int(f)))
        cur = cur.withColumn("_s", apply_merge(F.col("_s"), l, r))
    return merges, cur


def segment_tokens(
    corpus_tokens: DataFrame, token_col: str, final_words: DataFrame
) -> DataFrame:
    """Apply a trained tokenizer to token rows via the word->subword
    lookup join; returns one (subword) row per emitted BPE token.

    The word table is a vocabulary (<< corpus), so AQE broadcasts it;
    out-of-vocabulary words (applying to a DIFFERENT corpus) fall back
    to their character segmentation, exactly like training would have
    initialized them.
    """
    vocab = final_words.select(
        F.col("word").alias(token_col), F.col("_s").alias("_seg")
    )
    joined = corpus_tokens.join(vocab, token_col, "left").withColumn(
        "_seg",
        F.coalesce(F.col("_seg"), init_symbols(F.col(token_col))),
    )
    return joined.select(
        F.explode(F.split(F.trim(F.col("_seg")), " ")).alias("subword")
    )
