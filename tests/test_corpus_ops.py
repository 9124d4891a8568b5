"""Semantics tests for operators/corpus.py and the new join operators
(as-of, bucketed range) — hand-computed fixtures + equivalence to the
naive forms the scale paths replace."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import corpus, joins


# ---------------------------------------------------------------------------
# splits / sampling
# ---------------------------------------------------------------------------


def test_split_label_partitions_and_is_deterministic(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    labeled = df.select("k", corpus.split_label(F.col("k")).alias("s"))
    counts = {r["s"]: r["n"] for r in labeled.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # 900/50/50 per-mille within generous tolerance
    assert 0.85 < counts["train"] / 2000 < 0.95
    # rerun gives the identical assignment (pure function of the key)
    again = df.select("k", corpus.split_label(F.col("k")).alias("s"))
    assert labeled.exceptAll(again).count() == 0


def test_sample_keep_rate_is_exact_bucket_compare(spark):
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    kept = df.filter(corpus.sample_keep(F.col("k"), F.lit(250))).count()
    # md5 buckets are uniform; 25% +- a few points on n=1000
    assert 180 < kept < 320
    # rate 0 keeps nothing, rate 1000 keeps everything (boundary exactness)
    assert df.filter(corpus.sample_keep(F.col("k"), F.lit(0))).count() == 0
    assert df.filter(corpus.sample_keep(F.col("k"), F.lit(1000))).count() == 1000


# ---------------------------------------------------------------------------
# token budget / packing
# ---------------------------------------------------------------------------


def _doc_rows(spark):
    rows = [
        # domain a: sizes by priority order (bigger n_chars first)
        Row(d="a", id=1, words=300, n_chars=30),
        Row(d="a", id=2, words=300, n_chars=20),
        Row(d="a", id=3, words=300, n_chars=10),
        # domain b fits entirely
        Row(d="b", id=4, words=100, n_chars=5),
        Row(d="b", id=5, words=100, n_chars=4),
    ]
    return spark.createDataFrame(rows)


def test_token_budget_filter_per_domain_prefix(spark):
    kept = corpus.token_budget_filter(
        _doc_rows(spark), "d", "words", [F.col("n_chars").desc(), F.col("id")], 650
    )
    got = {(r["d"], r["id"]) for r in kept.collect()}
    # domain a: 300+300=600 <= 650, third doc would hit 900 -> dropped
    assert got == {("a", 1), ("a", 2), ("b", 4), ("b", 5)}


def test_pack_sequences_hand_computed(spark):
    rows = [
        Row(d="a", id=1, words=300),
        Row(d="a", id=2, words=300),  # starts at 300, crosses 512
        Row(d="a", id=3, words=100),  # starts at 600 -> seq 1
        Row(d="b", id=4, words=10),
    ]
    packed = corpus.pack_sequences(
        spark.createDataFrame(rows), "d", [F.col("id")], "words", 512
    ).collect()
    by_id = {r["id"]: r for r in packed}
    assert by_id[1]["start_offset"] == 0 and by_id[1]["seq_id"] == 0
    assert by_id[1]["spans_boundary"] == 0  # ends at 299
    assert by_id[2]["start_offset"] == 300 and by_id[2]["seq_id"] == 0
    assert by_id[2]["spans_boundary"] == 1  # 300..599 crosses 511|512
    assert by_id[3]["start_offset"] == 600 and by_id[3]["seq_id"] == 1
    assert by_id[4]["seq_id"] == 0  # shards pack independently


# ---------------------------------------------------------------------------
# contamination / repetition
# ---------------------------------------------------------------------------


def test_contamination_exact_copy_scores_one(spark):
    toks = "w1 w2 w3 w4 w5 w6".split()
    train = spark.createDataFrame(
        [Row(id=1, toks=toks), Row(id=2, toks=["x1", "x2", "x3", "x4"])]
    )
    ev = spark.createDataFrame([Row(id=9, toks=toks)])
    got = {
        r["id"]: (r["n_grams"], r["n_hit"])
        for r in corpus.contamination_scores(train, ev, "id", "toks", n=3).collect()
    }
    assert got[1] == (4, 4)  # all 4 distinct 3-grams hit
    assert got[2] == (2, 0)  # disjoint vocabulary


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, toks=["a", "b", "a", "b", "a"]),  # 2-grams ab,ba,ab,ba
            Row(id=2, toks=["u", "v", "w"]),  # uv, vw — all unique
        ]
    )
    got = {r["id"]: r for r in corpus.repetition_stats(df, "id", "toks", n=2).collect()}
    assert got[1]["n_ngrams"] == 4
    assert got[1]["n_distinct"] == 2
    assert got[1]["top_count"] == 2
    assert got[1]["dup_count"] == 4  # every 2-gram occurs twice
    assert got[2]["n_ngrams"] == 2 and got[2]["dup_count"] == 0


# ---------------------------------------------------------------------------
# as-of join / range join
# ---------------------------------------------------------------------------


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=5),
            Row(k=1, ts=15),
            Row(k=1, ts=25),
            Row(k=2, ts=7),  # key with no right rows at all
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=10, v=100.0, rid=1),
            Row(k=1, ts=15, v=200.0, rid=2),  # tie with a left ts: inclusive
            Row(k=1, ts=15, v=300.0, rid=3),  # dup (k, ts): max rid wins
        ]
    )
    out = joins.asof_join(left, right, "k", "ts", "ts", ["v"], right_tiebreak="rid")
    got = {(r["k"], r["ts"]): r["matched_v"] for r in out.collect()}
    assert got[(1, 5)] is None  # nothing at or before ts=5
    assert got[(1, 15)] == 300.0  # inclusive tie, deterministic dup winner
    assert got[(1, 25)] == 300.0  # latest prior
    assert got[(2, 7)] is None
    # no join node in the physical plan — it's a window scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_range_join_bucketed_equals_naive_theta_join(spark):
    import random

    rng = random.Random(7)
    pts = spark.createDataFrame(
        [Row(k=rng.randrange(3), p=rng.randrange(1000), pid=i) for i in range(300)]
    )
    ivs = spark.createDataFrame(
        [
            Row(k=rng.randrange(3), s=(s := rng.randrange(950)), e=s + rng.randrange(1, 120), iid=i)
            for i in range(40)
        ]
    )
    fast = joins.range_join_bucketed(pts, ivs, "k", "p", "s", "e", 64)
    naive = pts.join(ivs, "k").filter((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
    fast_set = {(r["pid"], r["iid"]) for r in fast.collect()}
    naive_set = {(r["pid"], r["iid"]) for r in naive.collect()}
    assert fast_set == naive_set
    assert len(fast_set) > 0
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_join_equals_naive_on_random_data(spark):
    import random

    rng = random.Random(17)
    left = [(rng.randrange(5), rng.randrange(1000)) for _ in range(200)]
    right = [
        (rng.randrange(5), rng.randrange(1000), float(i), i) for i in range(120)
    ]
    ldf = spark.createDataFrame([Row(k=k, ts=t) for k, t in left])
    rdf = spark.createDataFrame(
        [Row(k=k, ts=t, v=v, rid=r) for k, t, v, r in right]
    )
    out = joins.asof_join(ldf, rdf, "k", "ts", "ts", ["v"], right_tiebreak="rid")
    got = sorted((r["k"], r["ts"], r["matched_v"]) for r in out.collect())

    def naive(k, ts):
        cands = [(t, rid, v) for rk, t, v, rid in right if rk == k and t <= ts]
        if not cands:
            return None
        return max(cands)[2]  # latest ts, then highest rid, wins

    expected = sorted((k, ts, naive(k, ts)) for k, ts in left)
    assert got == expected


def test_chunk_dedup_drops_repeated_spans_keeps_first(spark):
    from llm_enhanced_data_pipeline_spark.operators import corpus

    # doc 1: spans A B; doc 2: spans B C (B repeats -> dropped from 2);
    # doc 3 = doc 1 exactly (all spans seen -> empty text survives)
    span_a = "a1 a2 a3 a4"
    span_b = "b1 b2 b3 b4"
    span_c = "c1 c2 c3 c4"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, toks=(span_a + " " + span_b).split()),
            Row(doc_id=2, toks=(span_b + " " + span_c).split()),
            Row(doc_id=3, toks=(span_a + " " + span_b).split()),
        ]
    )
    out = {
        r.doc_id: (r.n_chunks, r.n_kept, r.dedup_text)
        for r in corpus.chunk_dedup(df, "doc_id", "toks", chunk_size=4).collect()
    }
    assert out[1] == (2, 2, span_a + " " + span_b)
    assert out[2] == (2, 1, span_c)
    assert out[3] == (2, 0, "")


def test_chunk_dedup_partial_tail_span_is_its_own_unit(spark):
    from llm_enhanced_data_pipeline_spark.operators import corpus

    # 6 tokens at chunk_size=4 -> spans [t1..t4], [t5 t6]; the 2-token
    # tail is NOT equal to a 4-token span starting with the same tokens
    df = spark.createDataFrame(
        [
            Row(doc_id=1, toks=["t1", "t2", "t3", "t4", "t5", "t6"]),
            Row(doc_id=2, toks=["t5", "t6"]),  # dup of doc 1's tail span
        ]
    )
    out = {
        r.doc_id: (r.n_chunks, r.n_kept, r.dedup_text)
        for r in corpus.chunk_dedup(df, "doc_id", "toks", chunk_size=4).collect()
    }
    assert out[1] == (2, 2, "t1 t2 t3 t4 t5 t6")
    assert out[2] == (1, 0, "")


def test_chunk_dedup_survives_fingerprint_collision(spark):
    """Two DISTINCT spans whose rolling hashes collide must both
    survive — the hash is only the shuffle key, not the dedup key.

    The pair below is a genuine collision of rolling_token_hash (both
    spans hash to 192097142 mod 1_000_000_007, found by brute force
    over the md5-backed token hashes); before the (fingerprint, tokens)
    compound key, the later span was silently dropped.
    """
    from llm_enhanced_data_pipeline_spark.functions import hashing
    from llm_enhanced_data_pipeline_spark.operators import corpus

    df = spark.createDataFrame(
        [
            Row(doc_id=1, toks=["w9947", "x9947"]),
            Row(doc_id=2, toks=["w60118", "x60118"]),
        ]
    )
    # precondition: the collision is real (else the test is vacuous)
    fps = (
        df.select(hashing.rolling_token_hash(F.col("toks")).alias("fp"))
        .distinct()
        .collect()
    )
    assert len(fps) == 1, "expected engineered hash collision"

    out = {
        r.doc_id: (r.n_chunks, r.n_kept, r.dedup_text)
        for r in corpus.chunk_dedup(df, "doc_id", "toks", chunk_size=2).collect()
    }
    assert out[1] == (1, 1, "w9947 x9947")
    assert out[2] == (1, 1, "w60118 x60118")


def test_unigram_logprob_hand_computed(spark):
    import math

    from llm_enhanced_data_pipeline_spark.operators import text_analysis

    # corpus: 4x "x", 2x "y", 2x "z" -> p(x)=.5, p(y)=p(z)=.25
    df = spark.createDataFrame(
        [
            Row(doc_id=1, toks=["x", "x", "y"]),
            Row(doc_id=2, toks=["x", "x", "y", "z", "z"]),
        ]
    )
    out = {
        r.doc_id: (r.n_tokens, r.avg_logprob)
        for r in text_analysis.unigram_logprob_scores(df, "doc_id", "toks").collect()
    }

    def sr(x):  # stable_round(x, 4)
        return math.floor(x * 10000.0 + 0.5) / 10000.0

    lx, ly, lz = math.log(0.5), math.log(0.25), math.log(0.25)
    assert out[1] == (3, sr((2 * lx + ly) / 3))
    assert out[2] == (5, sr((2 * lx + ly + 2 * lz) / 5))


def test_temperature_mix_rates_hand_computed(spark):
    import math

    from llm_enhanced_data_pipeline_spark.operators import corpus

    # domains: a=100 rows, b=400 rows; T=2 -> w_a=10000, w_b=20000,
    # Z=30000; target=250:
    #   rate_a = min(1000, 1000*250*10000 // (30000*100)) = 833
    #   rate_b = min(1000, 1000*250*20000 // (30000*400)) = 416
    # (small domain keeps 83%, big domain 42% — the rebalancing)
    rows = [Row(i=i, d="a") for i in range(100)] + [
        Row(i=100 + i, d="b") for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.d: (r.n_rows, r.rate_permille)
        for r in corpus.temperature_mix_rates(df, "d", target_rows=250).collect()
    }
    assert got == {
        "a": (100, 1000 * 250 * math.floor(math.sqrt(100) * 1000) // (30000 * 100)),
        "b": (400, 1000 * 250 * math.floor(math.sqrt(400) * 1000) // (30000 * 400)),
    }
    assert got["a"][1] == 833 and got["b"][1] == 416


def test_temperature_mix_rates_caps_at_1000(spark):
    from llm_enhanced_data_pipeline_spark.operators import corpus

    # a target larger than the corpus must clamp every rate to 1000
    df = spark.createDataFrame(
        [Row(i=i, d="a") for i in range(10)] + [Row(i=10 + i, d="b") for i in range(40)]
    )
    got = {
        r.d: r.rate_permille
        for r in corpus.temperature_mix_rates(df, "d", target_rows=10_000).collect()
    }
    assert got == {"a": 1000, "b": 1000}


def test_chunk_dedup_matches_naive_reference_on_random_corpus(spark):
    import random

    from llm_enhanced_data_pipeline_spark.operators import corpus

    rng = random.Random(41)
    vocab = [f"w{j}" for j in range(4)]  # tiny vocab -> many span
    # collisions, including duplicate spans WITHIN one document
    docs = {
        did: [rng.choice(vocab) for _ in range(rng.randrange(0, 23))]
        for did in range(60)
    }
    k = 2

    # naive single-threaded reference: first occurrence in (doc_id,
    # chunk_idx) order wins — an intra-document repeat of an earlier
    # span is a duplicate too (C4 drops repeated lines within a page)
    seen: set[tuple[str, ...]] = set()
    expected = {}
    for did in sorted(docs):
        toks = docs[did]
        if not toks:
            continue
        spans = [tuple(toks[i : i + k]) for i in range(0, len(toks), k)]
        kept = []
        for s in spans:
            if s not in seen:
                kept.append(s)
            seen.add(s)
        expected[did] = (
            len(spans),
            len(kept),
            " ".join(" ".join(s) for s in kept),
        )
    # the generated corpus must actually contain an intra-doc duplicate
    assert any(
        len({tuple(t[i : i + k]) for i in range(0, len(t), k)})
        < len(range(0, len(t), k))
        for t in docs.values()
    )

    df = spark.createDataFrame([Row(doc_id=d, toks=t) for d, t in docs.items()])
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.dedup_text)
        for r in corpus.chunk_dedup(df, "doc_id", "toks", chunk_size=k).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# exact substring dedup at unaligned offsets (Lee et al. 2021)
# ---------------------------------------------------------------------------


def test_duplicated_spans_catches_unaligned_cross_doc_repeat(spark):
    """An 8-token run repeated at a NON-chunk-aligned offset is invisible
    to chunk_dedup's aligned windows but found by duplicated_spans."""
    t = [f"t{i}" for i in range(12)]
    doc1 = t  # first occurrence of everything — stays clean
    doc2 = ["x", "y", "z"] + t[3:11] + ["w"]  # t3..t10 repeated at offset 3
    df = spark.createDataFrame([Row(doc_id=1, toks=doc1), Row(doc_id=2, toks=doc2)])

    got = {
        r.doc_id: (r.n_tokens, r.dup_spans, r.dup_tokens, r.dup_frac)
        for r in corpus.duplicated_spans(df, "doc_id", "toks", k=8).collect()
    }
    assert got[1] == (12, 0, 0, 0.0)
    assert got[2] == (12, 1, 8, round(8 / 12 + 1e-12, 4))

    # the aligned-window operator misses it: every aligned chunk is unique
    aligned = {
        r.doc_id: (r.n_chunks, r.n_kept)
        for r in corpus.chunk_dedup(df, "doc_id", "toks", chunk_size=8).collect()
    }
    assert aligned[2][0] == aligned[2][1]


def test_duplicated_spans_merges_overlapping_self_repeats(spark):
    """Within-doc repetition: 12x the same token -> starts 1..4 are all
    duplicate hits of the start-0 gram, merging into one span covering
    tokens 1..12 (11 tokens)."""
    df = spark.createDataFrame([Row(doc_id=1, toks=["a"] * 12)])
    row = corpus.duplicated_spans(df, "doc_id", "toks", k=8).collect()[0]
    assert (row.n_tokens, row.dup_spans, row.dup_tokens) == (12, 1, 11)


def test_duplicated_spans_short_and_empty_docs_survive(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, toks=["a", "b"]), Row(doc_id=2, toks=[])],
        "doc_id long, toks array<string>",
    )
    got = {r.doc_id: (r.n_tokens, r.dup_spans, r.dup_tokens, r.dup_frac)
           for r in corpus.duplicated_spans(df, "doc_id", "toks", k=8).collect()}
    assert got == {1: (2, 0, 0, 0.0), 2: (0, 0, 0, 0.0)}


def test_duplicated_spans_matches_naive_reference_on_random_corpus(spark):
    import random

    rng = random.Random(43)
    vocab = [f"w{j}" for j in range(3)]  # tiny vocab -> dense collisions
    docs = {
        did: [rng.choice(vocab) for _ in range(rng.randrange(0, 18))]
        for did in range(50)
    }
    k = 3

    # naive reference: every k-gram occurrence past the global first
    # (in (doc_id, start) order) is a hit; merge overlapping hits into
    # maximal islands per doc
    seen: set[tuple[str, ...]] = set()
    hits: dict[int, list[int]] = {d: [] for d in docs}
    for did in sorted(docs):
        toks = docs[did]
        for start in range(len(toks) - k + 1):
            g = tuple(toks[start : start + k])
            if g in seen:
                hits[did].append(start)
            seen.add(g)
    expected = {}
    for did, toks in docs.items():
        spans, dup_tokens = 0, 0
        cur_s = cur_e = None
        for start in hits[did]:
            if cur_e is None or start > cur_e:
                if cur_e is not None:
                    spans, dup_tokens = spans + 1, dup_tokens + (cur_e - cur_s)
                cur_s, cur_e = start, start + k
            else:
                cur_e = max(cur_e, start + k)
        if cur_e is not None:
            spans, dup_tokens = spans + 1, dup_tokens + (cur_e - cur_s)
        n = len(toks)
        expected[did] = (n, spans, dup_tokens, round(dup_tokens / max(n, 1) + 1e-12, 4))

    df = spark.createDataFrame([Row(doc_id=d, toks=t) for d, t in docs.items()])
    got = {
        r.doc_id: (r.n_tokens, r.dup_spans, r.dup_tokens, r.dup_frac)
        for r in corpus.duplicated_spans(df, "doc_id", "toks", k=k).collect()
    }
    assert got == expected


def test_remove_duplicated_spans_excises_exactly_the_islands(spark):
    """Apply-side contract: the reassembled text is the original minus
    the merged duplicated spans, order preserved; counts agree with the
    report operator on every document."""
    t = [f"t{i}" for i in range(12)]
    doc2 = ["x", "y", "z"] + t[3:11] + ["w"]
    df = spark.createDataFrame(
        [Row(doc_id=1, toks=t), Row(doc_id=2, toks=doc2), Row(doc_id=3, toks=["a"] * 12)]
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.clean_text)
        for r in corpus.remove_duplicated_spans(df, "doc_id", "toks", k=8).collect()
    }
    assert got[1] == (12, 12, " ".join(t))  # first occurrences untouched
    assert got[2] == (12, 4, "x y z w")  # the repeated run excised
    assert got[3] == (12, 1, "a")  # self-repeat collapses to the seed token

    report = {
        r.doc_id: r.dup_tokens
        for r in corpus.duplicated_spans(df, "doc_id", "toks", k=8).collect()
    }
    for did, (n, kept, _) in got.items():
        assert n - kept == report[did]


def test_remove_duplicated_spans_keep_cols_carried(spark):
    """keep_cols ride the per-doc reassembly projection (never the gram
    shuffle): values match what a doc_id re-join would produce, schema
    places them right after the id, and the excision output is
    unchanged."""
    t = [f"t{i}" for i in range(12)]
    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", toks=t),
            Row(doc_id=2, lang="fr", toks=["x", "y", "z"] + t[3:11] + ["w"]),
        ]
    )
    out = corpus.remove_duplicated_spans(
        df, "doc_id", "toks", k=8, keep_cols=["lang"]
    )
    assert out.columns == ["doc_id", "lang", "n_tokens", "n_kept", "clean_text"]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].lang == "en" and rows[2].lang == "fr"
    plain = {
        r.doc_id: (r.n_tokens, r.n_kept, r.clean_text)
        for r in corpus.remove_duplicated_spans(df, "doc_id", "toks", k=8).collect()
    }
    for did, r in rows.items():
        assert (r.n_tokens, r.n_kept, r.clean_text) == plain[did]


# ---------------------------------------------------------------------------
# DoReMi domain reweighting
# ---------------------------------------------------------------------------


def test_doremi_weights_hand_computed(spark):
    """Two 2-token domains: A={x,x}, B={x,y}. KL_A = ln(4/3),
    KL_B = 0.5*ln(4/3); exp/normalize/smooth per the operator contract."""
    import math

    df = spark.createDataFrame(
        [Row(dom="A", toks=["x", "x"]), Row(dom="B", toks=["x", "y"])]
    )
    got = {
        r.domain: r
        for r in corpus.doremi_domain_weights(
            df, "dom", "toks", eta=1.0, smoothing_permille=100
        ).collect()
    }
    kl_a = round(math.log(4 / 3) + 1e-12, 6)
    kl_b = round(0.5 * math.log(4 / 3) + 1e-12, 6)
    assert got["A"].excess_kl == kl_a
    assert got["B"].excess_kl == kl_b
    w_a, w_b = math.exp(kl_a), math.exp(kl_b)
    exp_a = 0.9 * w_a / (w_a + w_b) + 0.05
    exp_b = 0.9 * w_b / (w_a + w_b) + 0.05
    assert abs(got["A"].weight - exp_a) < 1e-5
    assert abs(got["B"].weight - exp_b) < 1e-5
    assert abs(got["A"].weight + got["B"].weight - 1.0) < 1e-5
    assert got["A"].n_docs == 1 and got["A"].n_tokens == 2


def test_doremi_identical_domains_get_uniform_weights(spark):
    """KL(P_d || P_corpus) = 0 when every domain has the same token
    distribution -> weights collapse to exactly uniform."""
    toks = ["x", "y", "z"]
    df = spark.createDataFrame(
        [Row(dom=d, toks=toks) for d in ("A", "B", "C", "D")]
    )
    rows = corpus.doremi_domain_weights(df, "dom", "toks").collect()
    assert all(r.excess_kl == 0.0 for r in rows)
    assert all(abs(r.weight - 0.25) < 1e-9 for r in rows)


# ---------------------------------------------------------------------------
# pluggable LM quality scorer (the unigram_logprob upgrade path)
# ---------------------------------------------------------------------------


def test_lm_score_with_runs_injected_scorer_per_partition(spark):
    """Adapter contract: any batched scorer plugs in; the factory runs
    inside partitions; scores come back row-aligned as doubles."""
    from llm_enhanced_data_pipeline_spark.operators import text_analysis

    df = spark.createDataFrame(
        [Row(doc_id=i, text=("tok " * (i + 1)).strip()) for i in range(7)]
    ).repartition(3)

    def make_scorer():
        # token count as a fake NLL: deterministic, verifiable per row
        return lambda texts: [-float(len(t.split())) for t in texts]

    out = {
        r.doc_id: r.lm_score
        for r in text_analysis.lm_score_with(
            df, "doc_id", "text", make_scorer, batch_size=2
        ).collect()
    }
    assert out == {i: -float(i + 1) for i in range(7)}


def test_deterministic_fake_lm_matches_duckdb_twin(spark):
    """The fake scorer must be engine-exact (it backs a full-oracle
    gate query): compare the Python scorer against the DuckDB SQL twin
    on texts with empties, repeats, and multi-space runs."""
    import duckdb

    from llm_enhanced_data_pipeline_spark.operators import text_analysis

    texts = ["alpha beta gamma", "", "x", "dup dup dup", "a  b   c", "Zz yY"]
    score = text_analysis.deterministic_fake_lm()()
    got = score(texts)
    con = duckdb.connect()
    expr = text_analysis.deterministic_fake_lm_sql("t")
    want = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_corpus_build_v2_accepts_injected_quality_scorer(spark, sf_dir):
    """corpus_build_v2's quality stage is pluggable: an adapter-backed
    scorer (lm_score_with + fake LM) slots in where the unigram model
    sits, the floor applies to ITS scores, and the report keeps its
    schema."""
    from llm_enhanced_data_pipeline_spark.operators import text_analysis
    from llm_enhanced_data_pipeline_spark.queries.corpus_q import (
        corpus_build_v2_with_scorer,
    )

    calls = []

    def scorer(surv):
        calls.append(1)
        lm = text_analysis.lm_score_with(
            surv, "doc_id", "dedup_text", text_analysis.deterministic_fake_lm()
        )
        return surv.select(
            "doc_id", F.size("dtoks").cast("bigint").alias("n_tokens")
        ).join(lm.withColumnRenamed("lm_score", "avg_logprob"), "doc_id")

    # fake-LM scores live in (-3, -1]; a -2.0 floor must actually cut
    out = corpus_build_v2_with_scorer(spark, sf_dir, scorer, lp_floor=-2.0)
    rows = out.collect()
    assert calls, "injected scorer was never invoked"
    assert set(out.columns) == {
        "lang", "n_docs", "n_kept_mix", "total_tokens", "rate_permille"
    }
    assert rows  # languages survive the floor
    default = corpus_build_v2_with_scorer(spark, sf_dir, None)
    n_inj = sum(r.n_docs for r in rows)
    n_def = sum(r.n_docs for r in default.collect())
    assert n_inj != n_def, "floor on injected scores changed nothing"


def test_dsir_separates_target_like_vocabulary(spark):
    """Docs sharing the target domain's vocabulary must outscore docs
    from a disjoint vocabulary, and the score of a target-vocab doc is
    positive (importance weight > 1) while alien-vocab docs go negative."""
    from pyspark.sql import functions as F

    from llm_enhanced_data_pipeline_spark.operators import corpus

    rows = [
        (0, "alpha beta gamma delta", "tgt"),
        (1, "alpha beta gamma epsilon", "tgt"),
        (2, "alpha gamma beta delta", "raw"),   # target-like vocab
        (3, "zeta eta theta iota", "raw"),      # alien vocab
        (4, "zeta theta eta kappa", "raw"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, grp: string")
    df = df.withColumn("toks", F.split("text", " "))
    out = corpus.dsir_scores(
        df, "doc_id", "toks", F.col("grp") == "tgt", num_buckets=64
    ).collect()
    scores = {r.doc_id: r.dsir_score for r in out}
    # target-vocab doc strictly outscores both alien-vocab docs (the
    # absolute level is smoothing-dominated at this corpus size, so
    # only the ordering is meaningful)
    assert scores[2] > scores[3] and scores[2] > scores[4]
    assert scores[0] > scores[3]  # target members themselves score high


def test_dsir_selected_is_top_quantile(spark, sf_dir):
    """`selected` is exactly the >= 0.75-quantile score set."""
    from pyspark.sql import functions as F

    from llm_enhanced_data_pipeline_spark.queries import REGISTRY

    out = REGISTRY["dsir_importance"].fn(spark, sf_dir).collect()
    scores = sorted(r.dsir_score for r in out)
    import math
    # quantile_cont at 0.75 over n values: interpolate at (n-1)*0.75
    pos = (len(scores) - 1) * 0.75
    lo, g = int(math.floor(pos)), pos - int(math.floor(pos))
    q = scores[lo] + (scores[lo + 1] - scores[lo]) * g if g else scores[lo]
    q = math.floor(q * 1e4 + 0.5) / 1e4
    sel = {r.doc_id for r in out if r.selected}
    expect = {r.doc_id for r in out if r.dsir_score >= q}
    assert sel == expect and sel


# ---------------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_in_exhaustive_regime_and_close_above_it(spark):
    from llm_enhanced_data_pipeline_spark.operators import aggregates

    # fewer distinct values than k -> the sketch is exhaustive: exact
    small = spark.range(100).select(F.col("id").cast("string").alias("v"))
    est = aggregates.kmv_distinct(small, "v", k=256).collect()[0].n_estimate
    assert est == 100

    # duplicates never inflate the estimate (distinct-hash semantics)
    dup = small.unionAll(small).unionAll(small)
    est_dup = aggregates.kmv_distinct(dup, "v", k=256).collect()[0].n_estimate
    assert est_dup == 100

    # well above k: estimate within 3 sigma (~1/sqrt(k-2) ~ 6.3%)
    big = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    est_big = aggregates.kmv_distinct(big, "v", k=256).collect()[0].n_estimate
    assert abs(est_big - 5000) / 5000 < 0.20


def test_kmv_sketches_merge_by_k_smallest_union(spark):
    """Mergeability: KMV over A ∪ B == KMV over (sketch rows of A) ∪
    (sketch rows of B) — per-shard sketches compose without rescans."""
    from llm_enhanced_data_pipeline_spark.functions import hashing
    from llm_enhanced_data_pipeline_spark.operators import aggregates

    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("v"))
    whole = aggregates.kmv_distinct(a.unionAll(b), "v", k=128).collect()[0].n_estimate

    def sketch_rows(df):
        return (
            df.select(hashing.stable_hash32(F.col("v"), seed=9).alias("_h"))
            .distinct()
            .orderBy("_h")
            .limit(128)
            .select(F.col("_h").cast("string").alias("v"))
        )

    # hashing an already-hashed sketch row must be avoided in a real
    # merge; here we re-feed raw hash strings through a pass-through
    # estimator equivalent: union the sketch ROWS and re-sketch on _h
    merged_rows = sketch_rows(a).unionAll(sketch_rows(b)).withColumnRenamed("v", "_h")
    sk = merged_rows.select(F.col("_h").cast("bigint").alias("_h")).distinct().orderBy("_h").limit(128)
    row = sk.agg(F.count(F.lit(1)).alias("_k"), F.max("_h").alias("_hk")).collect()[0]
    merged_est = (
        row._k if row._k < 128 else int((128 - 1) * 4294967296.0 / row._hk + 0.5)
    )
    assert merged_est == whole


def test_kmv_intersection_exact_when_both_sides_exhaustive(spark):
    """Both sketches exhaustive (distinct < k) -> theta = 2^32 and the
    intersection estimate is exactly the true overlap."""
    from llm_enhanced_data_pipeline_spark.operators import aggregates

    a = spark.range(0, 150).select(F.col("id").cast("string").alias("v"))
    b = spark.range(100, 260).select(F.col("id").cast("string").alias("v"))
    est = aggregates.kmv_intersection(a, b, "v", k=256).collect()[0].n_estimate
    assert est == 50  # ids 100..149

    # disjoint sides -> 0, not null
    c = spark.range(1000, 1100).select(F.col("id").cast("string").alias("v"))
    est0 = aggregates.kmv_intersection(a, c, "v", k=256).collect()[0].n_estimate
    assert est0 == 0


def test_kmv_intersection_close_in_estimator_regime(spark):
    from llm_enhanced_data_pipeline_spark.operators import aggregates

    a = spark.range(0, 4000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("v"))
    est = aggregates.kmv_intersection(a, b, "v", k=256).collect()[0].n_estimate
    assert abs(est - 2000) / 2000 < 0.35  # overlap fraction ~0.5 of each side


# ---------------------------------------------------------------------------
# 2-D skyline
# ---------------------------------------------------------------------------


def test_skyline_2d_hand_computed_with_ties_and_duplicates(spark):
    from llm_enhanced_data_pipeline_spark.operators import aggregates

    rows = [
        Row(id=1, q=0.9, l=100),  # front
        Row(id=2, q=0.9, l=100),  # duplicate of a front point: kept
        Row(id=3, q=0.9, l=120),  # dominated by 1 (same q, longer)
        Row(id=4, q=0.7, l=50),   # front (shorter than everything better)
        Row(id=5, q=0.7, l=100),  # dominated by 1 (worse q, same l)
        Row(id=6, q=0.5, l=50),   # dominated by 4 (worse q, same l)
        Row(id=7, q=0.5, l=10),   # front
    ]
    got = {
        r.id
        for r in aggregates.skyline_2d(spark.createDataFrame(rows), "q", "l").collect()
    }
    assert got == {1, 2, 4, 7}


def test_skyline_2d_equals_naive_dominance_on_random_data(spark):
    import random

    from llm_enhanced_data_pipeline_spark.operators import aggregates

    rng = random.Random(47)
    rows = [
        Row(id=i, q=round(rng.random(), 2), l=rng.randrange(1, 60))
        for i in range(300)
    ]
    sky = {
        r.id
        for r in aggregates.skyline_2d(spark.createDataFrame(rows), "q", "l").collect()
    }
    naive = {
        a.id
        for a in rows
        if not any(
            b.q >= a.q and b.l <= a.l and (b.q > a.q or b.l < a.l) for b in rows
        )
    }
    assert sky == naive and len(sky) > 0


# ---------------------------------------------------------------------------
# Hamilton apportionment
# ---------------------------------------------------------------------------


def test_apportion_budget_hand_computed_and_sums_exactly(spark):
    # counts 3/3/4 over budget 10 -> exact quotas 3/3/4, no remainders
    rows = [Row(d=d) for d in ["a"] * 3 + ["b"] * 3 + ["c"] * 4]
    got = {
        r.domain: r.quota
        for r in corpus.apportion_budget(spark.createDataFrame(rows), "d", 10).collect()
    }
    assert got == {"a": 3, "b": 3, "c": 4}

    # classic remainder case: 5/5/7 over 10 -> floors 2/2/4 (sum 8),
    # remainders 16/16/2 (x17): a and b (tie -> domain asc) get the +1s
    rows = [Row(d=d) for d in ["a"] * 5 + ["b"] * 5 + ["c"] * 7]
    got = {
        r.domain: r.quota
        for r in corpus.apportion_budget(spark.createDataFrame(rows), "d", 10).collect()
    }
    assert got == {"a": 3, "b": 3, "c": 4}
    assert sum(got.values()) == 10


def test_apportion_budget_sums_to_budget_on_random_distributions(spark):
    import random

    rng = random.Random(53)
    for trial in range(3):
        weights = [rng.randrange(1, 40) for _ in range(rng.randrange(2, 9))]
        rows = [
            Row(d=f"d{i}") for i, w in enumerate(weights) for _ in range(w)
        ]
        budget = rng.randrange(5, 200)
        quotas = [
            r.quota
            for r in corpus.apportion_budget(
                spark.createDataFrame(rows), "d", budget
            ).collect()
        ]
        assert sum(quotas) == budget
        assert all(q >= 0 for q in quotas)


def test_count_min_sketch_guarantee_and_mergeability(spark):
    """CMS invariants: (a) the point estimate NEVER underestimates
    (one-sided guarantee — min over rows of bucket counts >= true
    count); (b) shard sketches merge cell-wise: cms(A ∪ B) equals the
    cell-wise sum of cms(A) + cms(B), the property that makes per-shard
    sketches composable at 100 TB without rescanning."""
    from llm_enhanced_data_pipeline_spark.operators import aggregates
    from llm_enhanced_data_pipeline_spark.queries.text_q import cms_heavy_hitters

    from .conftest import SMOKE_SF_DIR

    # (a) on the real table via the registered report
    rep = cms_heavy_hitters(spark, SMOKE_SF_DIR).collect()
    assert len(rep) == 10
    assert all(r.overestimate >= 0 for r in rep), rep
    assert all(r.cms_estimate >= r.true_count for r in rep)

    # (b) mergeability on synthetic shards
    a = spark.createDataFrame([Row(_tok=t) for t in ["x", "y", "x", "z"] * 5])
    b = spark.createDataFrame([Row(_tok=t) for t in ["y", "w"] * 7])
    u = a.unionByName(b)
    cells = lambda df: {  # noqa: E731
        (r.cms_row, r.bucket): r.n
        for r in aggregates.count_min_table(df, "_tok", depth=4, width=16).collect()
    }
    ca, cb, cu = cells(a), cells(b), cells(u)
    merged = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    assert merged == cu


def test_epoch_waterfill_exact_solution(spark):
    """epoch_waterfill against a hand-solved instance: budget
    conservation, per-source caps, weight-proportionality of the
    uncapped sources, the all-capped clamp, and the single-source
    degenerate case."""
    from pyspark.sql import Row

    from llm_enhanced_data_pipeline_spark.operators import corpus

    # caps: a=30, b=300, c=300; r = cap/w: a:10, b:300, c:100.
    # budget 250: candidate at a (r=10): lam = 250/7 ≈ 35.7 > 10 -> a
    # caps. Next (c, r=100): lam = (250-30)/4 = 55 <= 100 -> level 55.
    # alloc: a=30 (cap), c=165, b=55. Sum = 250 ✓.
    ps = spark.createDataFrame(
        [Row(source="a", n_toks=10, weight=3.0),
         Row(source="b", n_toks=100, weight=1.0),
         Row(source="c", n_toks=100, weight=3.0)]
    )
    out = {r.source: r for r in corpus.epoch_waterfill(
        ps, budget_tokens=250, max_epochs=3
    ).collect()}
    assert out["a"].alloc_toks == 30.0 and out["a"].epochs == 3.0
    assert out["b"].alloc_toks == 55.0
    assert out["c"].alloc_toks == 165.0
    assert sum(r.alloc_toks for r in out.values()) == 250.0
    # uncapped sources sit at the same level lam = alloc/weight
    assert out["b"].alloc_toks / 1.0 == out["c"].alloc_toks / 3.0

    # budget beyond every cap: clamp -> everything fully capped
    full = {r.source: r for r in corpus.epoch_waterfill(
        ps, budget_tokens=10_000, max_epochs=3
    ).collect()}
    assert all(r.alloc_toks == r.cap_toks for r in full.values())
    assert all(r.epochs == 3.0 for r in full.values())

    # single source: min(budget, cap), epochs bounded by E
    one = corpus.epoch_waterfill(
        spark.createDataFrame([Row(source="x", n_toks=50, weight=2.0)]),
        budget_tokens=80, max_epochs=3,
    ).collect()[0]
    assert one.alloc_toks == 80.0 and one.epochs == 1.6


def test_epoch_plan_copies_determinism_and_tracking(spark):
    """epoch_plan_copies: floor(epochs) copies + the stable-hash
    fractional slice — deterministic across invocations, counts track
    the fractional part, zero copies allowed below one epoch."""
    from pyspark.sql import Row

    from llm_enhanced_data_pipeline_spark.operators import corpus

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s" if i < 1000 else "t", n_toks=10)
         for i in range(1500)]
    )
    plan = spark.createDataFrame(
        [Row(source="s", epochs=2.25), Row(source="t", epochs=0.4)]
    )
    out = corpus.epoch_plan_copies(docs, plan)
    rows = {r.doc_id: r.n_copies for r in out.collect()}
    s_copies = [rows[i] for i in range(1000)]
    t_copies = [rows[i] for i in range(1000, 1500)]
    assert set(s_copies) == {2, 3} and set(t_copies) <= {0, 1}
    # the fractional slice tracks the permille within hash noise
    assert abs(sum(s_copies) - 2250) < 100
    assert abs(sum(t_copies) - 200) < 80
    # deterministic: a second invocation reproduces the multiset
    again = {r.doc_id: r.n_copies for r in
             corpus.epoch_plan_copies(docs, plan).collect()}
    assert again == rows


def test_padding_waste_hand_case_and_bucketing_wins(spark):
    from pyspark.sql import Row

    from llm_enhanced_data_pipeline_spark.operators import corpus

    # one shard, batch=2, lengths 1,100,1,100: naive doc order pairs
    # (1,100)x2 -> padded 99*2; length order pairs (1,1),(100,100) -> 0
    rows = [Row(doc_id=i, shard=0, n_toks=[1, 100, 1, 100][i])
            for i in range(4)]
    df = spark.createDataFrame(rows)
    naive = corpus.padding_waste(
        df, ["shard"], [F.col("doc_id").asc()], "n_toks", 2
    ).collect()
    assert sum(r.padded_toks for r in naive) == 198
    ordered = corpus.padding_waste(
        df, ["shard"], [F.col("n_toks").asc(), F.col("doc_id").asc()],
        "n_toks", 2,
    ).collect()
    assert sum(r.padded_toks for r in ordered) == 0
    # partial final batch pads within itself only
    odd = corpus.padding_waste(
        spark.createDataFrame(
            [Row(doc_id=i, shard=0, n_toks=t) for i, t in
             enumerate([5, 5, 9])]
        ),
        ["shard"], [F.col("doc_id").asc()], "n_toks", 2,
    ).collect()
    by_batch = {r._batch: r for r in odd}
    assert by_batch[0].padded_toks == 0
    assert by_batch[1].n_rows == 1 and by_batch[1].padded_toks == 0

    # the registered report must show bucketing strictly reducing waste
    from llm_enhanced_data_pipeline_spark.queries.corpus_q import (
        padding_efficiency_report,
    )

    rep = {r.strategy: r for r in padding_efficiency_report(
        spark, "/root/testdata/sf0.001"
    ).collect()}
    assert rep["bucketed"].padded_toks < rep["naive"].padded_toks
    assert rep["bucketed"].n_docs == rep["naive"].n_docs
    assert rep["bucketed"].total_toks == rep["naive"].total_toks


def test_preference_pairs_nonempty_and_well_formed(spark, sf_dir):
    # hash gates pass vacuously when both engines agree on empty —
    # pin non-emptiness and the pair invariants (distinct members,
    # positive gap, <= 3 pairs per pool) explicitly
    from llm_enhanced_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["preference_pair_build"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    per_pool = {}
    for r in rows:
        assert r["chosen_id"] != r["rejected_id"]
        assert r["gap"] >= 0.05
        per_pool.setdefault((r["source"], r["lang"]), []).append(r["pair_idx"])
    assert all(len(v) <= 3 for v in per_pool.values())
