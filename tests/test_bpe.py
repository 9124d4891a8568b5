"""BPE trainer/segmenter semantics: textbook example, engine-convention
properties, OOV fallback, and a randomized differential test against a
pure-Python reference of the documented convention."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import bpe


# -- pure-Python reference of the documented convention ----------------------

def _ref_init(word: str) -> str:
    return " " + " ".join(word) + f" {bpe.EOW} "


def _ref_merge(state: str, left: str, right: str) -> str:
    pat, rep = f" {left} {right} ", f" {left}{right} "
    return state.replace(pat, rep).replace(pat, rep)


def _ref_train(freqs: dict[str, int], iters: int):
    words = {w: _ref_init(w) for w in freqs}
    merges = []
    for rank in range(1, iters + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, s in words.items():
            syms = s.split()
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freqs[w]
        if not counts:
            break
        (left, right), f = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, f))
        words = {w: _ref_merge(s, left, right) for w, s in words.items()}
    return merges, words


def test_bpe_textbook_example(spark):
    """Sennrich et al.'s canonical example: es -> est -> est</w> -> lo."""
    df = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word: string, freq: long",
    )
    merges, final = bpe.bpe_train(df, iters=4)
    assert [(m[1], m[2]) for m in merges] == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
    ]
    segs = {r.word: r._s for r in final.collect()}
    assert segs["newest"] == " n e w est</w> "
    assert segs["low"] == " lo w </w> "


def test_pair_counts_array_zip_shape(spark):
    """r15: adjacency is the symbol array zipped with its own tail —
    no window, no sort, one aggregation shuffle. A fully-merged word
    (single symbol, no pairs) contributes nothing; counts match the
    pure-Python zip reference exactly."""
    df = spark.createDataFrame(
        [("aaaa", 3), ("ab", 5), ("a", 2)], "word: string, freq: long"
    )
    sy = df.select("word", "freq", bpe.init_symbols(F.col("word")).alias("_s"))
    got = {(r.l, r.r): r.f for r in bpe.pair_counts(sy).collect()}
    expected: dict[tuple[str, str], int] = {}
    for word, freq in [("aaaa", 3), ("ab", 5), ("a", 2)]:
        syms = _ref_init(word).split()
        for a, b in zip(syms, syms[1:]):
            expected[(a, b)] = expected.get((a, b), 0) + freq
    assert got == expected
    # single-symbol rows produce zero pair rows (not nulls)
    one = spark.createDataFrame([("x", 1)], "word: string, freq: long")
    one_s = one.select(
        "word", "freq", F.lit(" x ").alias("_s")  # fully merged state
    )
    assert bpe.pair_counts(one_s).count() == 0
    plan = (
        bpe.pair_counts(sy)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_bpe_differential_random_corpora(spark):
    """Random word tables agree with the pure-Python reference of the
    documented convention (argmax tie order + two-pass-replace merge)."""
    rng = random.Random(42)
    for trial in range(3):
        vocab = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 12))
        ]
        freqs = {w: rng.randint(1, 9) for w in set(vocab)}
        df = spark.createDataFrame(
            list(freqs.items()), "word: string, freq: long"
        )
        got_merges, got_final = bpe.bpe_train(df, iters=6)
        want_merges, want_words = _ref_train(freqs, 6)
        assert got_merges == want_merges, f"trial {trial}"
        got_segs = {r.word: r._s for r in got_final.collect()}
        assert got_segs == want_words, f"trial {trial}"


def test_bpe_segment_tokens_oov_falls_back_to_chars(spark):
    """Applying a trained tokenizer to a corpus with unseen words
    segments them at the character level (training-init behavior)."""
    train = spark.createDataFrame([("aab", 3)], "word: string, freq: long")
    _, final = bpe.bpe_train(train, iters=1)  # learns (a, a)
    toks = spark.createDataFrame([("aab",), ("xy",)], "word: string")
    sub = bpe.segment_tokens(toks, "word", final)
    got = sorted(r.subword for r in sub.collect())
    # aab -> [aa, b, </w>]; xy (OOV) -> [x, y, </w>]
    assert got == sorted(["aa", "b", "</w>", "x", "y", "</w>"])


def test_bpe_merge_fixpoint_on_runs(spark):
    """Two-pass replace reaches the fixpoint on same-symbol runs (the
    case one pass provably misses)."""
    df = spark.createDataFrame([("bbbb", 1), ("bbbbb", 2)], "word: string, freq: long")
    merges, final = bpe.bpe_train(df, iters=1)
    assert (merges[0][1], merges[0][2]) == ("b", "b")
    segs = {r.word: r._s for r in final.collect()}
    for s in segs.values():
        assert " b b " not in s  # fixpoint: no mergeable pair left
