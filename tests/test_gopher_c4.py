"""Gopher rule-set and C4 line-filter semantics on engineered realistic
fixtures (the synthetic documents table has no natural prose structure;
the oracle gates cover engine parity, these cover the heuristics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import text_analysis as ta

GOOD_PROSE = (
    "The quick brown fox jumps over the lazy dog and runs to the river of "
    "dreams with great joy. " * 6
)  # ~108 words, plenty of stopwords, sane word lengths


def _flags(spark, text):
    df = spark.createDataFrame([(text,)], "text STRING")
    flags = ta.gopher_flags(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in flags.items()]).first()
    return row.asDict()


def test_gopher_passes_good_prose(spark):
    assert not any(_flags(spark, GOOD_PROSE).values())


def test_gopher_word_count_bounds(spark):
    assert _flags(spark, "too short")["fail_word_count"]
    assert not _flags(spark, GOOD_PROSE)["fail_word_count"]


def test_gopher_mean_word_length(spark):
    short = " ".join(["a b c d"] * 30)
    assert _flags(spark, short)["fail_mean_word_len"]
    long = " ".join(["incomprehensibilities"] * 60)
    assert _flags(spark, long)["fail_mean_word_len"]


def test_gopher_symbol_ratio(spark):
    hashy = GOOD_PROSE + " " + "# # # # # # # # # # # # # #" * 2
    assert _flags(spark, hashy)["fail_symbol_ratio"]


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(f"- {GOOD_PROSE[:40]}" for _ in range(10))
    assert _flags(spark, bullets)["fail_bullet_lines"]
    ells = "\n".join(f"{GOOD_PROSE[:40]}..." for _ in range(10))
    assert _flags(spark, ells)["fail_ellipsis_lines"]
    assert not _flags(spark, GOOD_PROSE)["fail_bullet_lines"]


def test_gopher_alpha_word_fraction(spark):
    numeric = GOOD_PROSE + " " + " ".join(str(i) for i in range(40))
    assert _flags(spark, numeric)["fail_alpha_words"]


def test_gopher_stopword_rule(spark):
    no_stops = " ".join(["lorem", "dolor", "amet", "elit"] * 20)
    assert _flags(spark, no_stops)["fail_stopwords"]
    assert not _flags(spark, GOOD_PROSE)["fail_stopwords"]


# ---------------------------------------------------------------------------


def _c4(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")
    return ta.c4_clean(df, "text").collect()


def test_c4_keeps_only_terminal_punctuation_lines(spark):
    text = (
        "This is a proper sentence with enough words here.\n"
        "no terminal punctuation on this line of words\n"
        "Another proper sentence that ends with a question mark?\n"
        "A third proper sentence right here ends with a period."
    )
    rows = _c4(spark, text)
    assert len(rows) == 1
    out = rows[0]
    assert out["n_lines"] == 4 and out["n_kept"] == 3
    assert "no terminal punctuation" not in out["text"]
    assert out["text"].count("\n") == 2  # order-preserving reassembly


def test_c4_line_rules_words_and_javascript(spark):
    text = (
        "First good sentence with plenty of words in it.\n"
        "Too short.\n"
        "Please enable JavaScript to view the comments powered here.\n"
        "Second good sentence with plenty of words in it.\n"
        "Third good sentence with plenty of words in it."
    )
    rows = _c4(spark, text)
    out = rows[0]
    assert out["n_kept"] == 3
    assert "JavaScript" not in out["text"]
    assert "Too short." not in out["text"]


def test_c4_doc_level_drops(spark):
    # fewer than 3 kept lines -> doc dropped entirely
    assert _c4(spark, "Only one good sentence with enough words here.") == []
    # brace and lorem ipsum are page-level kills even with good lines
    good3 = "\n".join(
        f"Good sentence number {i} with plenty of words in it." for i in range(3)
    )
    assert _c4(spark, good3 + " {") == []
    assert _c4(spark, good3 + "\nLorem ipsum dolor sit amet consectetur elit.") == []
    assert len(_c4(spark, good3)) == 1


def test_c4_clean_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x.")], "doc_id BIGINT, text STRING")
    plan = ta.c4_clean(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Randomized differential tests: one Spark pass over a seeded random
# corpus vs a naive single-threaded Python reference of the published
# rules.


def _naive_gopher_flags(text: str, min_words: int, stopwords: tuple[str, ...]):
    words = text.split()
    n = len(words)
    n_safe = max(n, 1)
    mean_wl = sum(len(w) for w in words) / n_safe
    symbols = text.count("#") + text.count("...")
    lines = [l for l in text.split("\n") if l.strip()]
    n_lines = max(len(lines), 1)
    bullet = sum(1 for l in lines if l.strip()[:1] in "-*•") / n_lines
    ellipsis = sum(1 for l in lines if l.rstrip().endswith("...")) / n_lines
    alpha = sum(1 for w in words if any(c.isascii() and c.isalpha() for c in w)) / n_safe
    stops = len({w.lower() for w in words} & set(stopwords))
    return {
        "fail_word_count": n < min_words or n > ta.GOPHER_MAX_WORDS,
        "fail_mean_word_len": not (
            ta.GOPHER_MIN_MEAN_WORD_LEN <= mean_wl <= ta.GOPHER_MAX_MEAN_WORD_LEN
        ),
        "fail_symbol_ratio": symbols / n_safe > ta.GOPHER_MAX_SYMBOL_RATIO,
        "fail_bullet_lines": bullet > ta.GOPHER_MAX_BULLET_LINE_FRAC,
        "fail_ellipsis_lines": ellipsis > ta.GOPHER_MAX_ELLIPSIS_LINE_FRAC,
        "fail_alpha_words": alpha < ta.GOPHER_MIN_ALPHA_WORD_FRAC,
        "fail_stopwords": stops < ta.GOPHER_MIN_STOPWORDS,
    }


def _random_doc(rng):
    vocab = ["the", "fox", "of", "run", "#", "12", "be", "incomprehensible", "to", "x"]
    lines = []
    for _ in range(rng.randint(1, 6)):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        line = " ".join(words)
        tail = rng.random()
        if tail < 0.3:
            line += "."
        elif tail < 0.4:
            line += "..."
        if rng.random() < 0.2:
            line = "- " + line
        lines.append(line)
    return "\n".join(lines)


def test_gopher_flags_match_naive_reference_on_random_docs(spark):
    import random

    rng = random.Random(99)
    docs = [(i, _random_doc(rng)) for i in range(150)]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    flags = ta.gopher_flags(F.col("text"), 10, ta.GOPHER_STOPWORDS)
    got = {
        r["doc_id"]: {k: r[k] for k in ta.gopher_flags(F.col("text"))}
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in flags.items()]
        ).collect()
    }
    for i, text in docs:
        want = _naive_gopher_flags(text, 10, ta.GOPHER_STOPWORDS)
        assert got[i] == want, f"doc {i}: {text!r}\n got {got[i]}\nwant {want}"


def _naive_c4(text: str):
    kept = []
    for line in text.split("\n"):
        t = line.strip()
        if (
            t
            and t[-1] in '.!?"'
            and len(t.split()) >= ta.C4_MIN_LINE_WORDS
            and "javascript" not in t.lower()
        ):
            kept.append(line)
    doc_ok = (
        len(kept) >= ta.C4_MIN_KEPT_LINES
        and "{" not in text
        and "lorem ipsum" not in text.lower()
    )
    return kept, doc_ok


def test_c4_matches_naive_reference_on_random_docs(spark):
    import random

    rng = random.Random(7)
    docs = [(i, _random_doc(rng)) for i in range(150)]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    out = {
        r["doc_id"]: (r["text"], r["n_kept"])
        for r in ta.c4_clean(df, "text").collect()
    }
    for i, text in docs:
        kept, doc_ok = _naive_c4(text)
        if not doc_ok:
            assert i not in out, f"doc {i} should have been dropped: {text!r}"
        else:
            assert out[i] == ("\n".join(kept), len(kept)), f"doc {i}: {text!r}"


# ---------------------------------------------------------------------------
# Naive Bayes quality-classifier semantics (operators/text_analysis
# nb_token_llr / nb_score)


def test_nb_classifier_separates_engineered_classes(spark):
    pos = [(i, ["good", "clean", "prose", "text"], True) for i in range(10)]
    neg = [(100 + i, ["spam", "junk", "noise", "garbage"], False) for i in range(10)]
    train = spark.createDataFrame(
        pos + neg, "doc_id BIGINT, toks ARRAY<STRING>, label BOOLEAN"
    )
    llr, stats = ta.nb_token_llr(train, "toks", "label")
    test = spark.createDataFrame(
        [
            (1000, ["good", "clean", "text"]),
            (1001, ["spam", "junk", "garbage"]),
            (1002, ["unseen", "words", "only"]),  # pure OOV -> prior-ish
        ],
        "doc_id BIGINT, toks ARRAY<STRING>",
    )
    got = {
        r["doc_id"]: r["nb_score"]
        for r in ta.nb_score(test, "doc_id", "toks", llr, stats).collect()
    }
    assert got[1000] > 0
    assert got[1001] < 0
    # balanced classes -> prior 0; OOV llr is 0 for equal class totals
    assert abs(got[1002]) < 1e-6


def test_nb_model_is_partitioning_invariant(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.choice(["a", "b", "c", "d", "e"]) for _ in range(8)], i % 3 == 0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, toks ARRAY<STRING>, label BOOLEAN")
    llr1, s1 = ta.nb_token_llr(df, "toks", "label")
    llr2, s2 = ta.nb_token_llr(df.repartition(13), "toks", "label")
    assert sorted(map(tuple, llr1.collect())) == sorted(map(tuple, llr2.collect()))
    assert s1.collect() == s2.collect()
