"""Structured Streaming twins produce the same answers as the batch
operators on identical input."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.streaming import events as se


def _write_events_jsonl(tmp_path, rows):
    p = tmp_path / "stream_in"
    p.mkdir()
    # two "micro-batch" files
    half = len(rows) // 2
    for name, chunk in (("a.json", rows[:half]), ("b.json", rows[half:])):
        with open(p / name, "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
    return str(p)


def _rows():
    out = []
    for i in range(40):
        out.append(
            {
                "event_id": i,
                "ts": f"2024-01-01T{i // 20:02d}:{(i * 3) % 60:02d}:00.000Z",
                "user_id": i % 4,
                "event_type": "click" if i % 2 == 0 else "view",
                "value": float(i),
                "props": json.dumps({"k": i}),
            }
        )
    return out


def test_hourly_rollup_stream_matches_batch(spark, tmp_path):
    path = _write_events_jsonl(tmp_path, _rows())
    stream = se.read_event_stream(spark, path, max_files_per_trigger=1)
    assert stream.isStreaming
    rollup = se.hourly_rollup_stream(stream)
    se.run_to_memory_sink(rollup, "rollup_test", timeout_s=120)
    got = {
        (str(r.window_start), r.event_type): (r.n, r.total_value)
        for r in spark.sql("select * from rollup_test").collect()
    }

    batch = spark.read.schema(se.EVENT_SCHEMA).json(path)
    expected = {
        (str(r.window_start), r.event_type): (r.n, r.total_value)
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .collect()
    }
    assert got == expected
    assert len(got) == 4  # 2 hours × 2 event types


def test_sessionize_stream_counts_sessions(spark, tmp_path):
    # user 0: two bursts 90 minutes apart → 2 sessions
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 0,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:10:00.000Z", "user_id": 0,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T01:40:00.000Z", "user_id": 0,
         "event_type": "click", "value": 1.0, "props": "{}"},
    ]
    path = _write_events_jsonl(tmp_path, rows)
    stream = se.read_event_stream(spark, path)
    sessions = se.sessionize_stream(stream, gap="30 minutes")
    se.run_to_memory_sink(sessions, "sessions_test", timeout_s=120)
    got = spark.sql("select * from sessions_test").collect()
    assert len(got) == 2
    assert sorted(r.n_events for r in got) == [1, 2]


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """A row older than the advanced watermark must not reopen its
    already-finalized window (the 100 TB state-bound guarantee)."""
    import os

    p = tmp_path / "late_in"
    p.mkdir()

    def write(name, rows, mtime):
        fp = p / name
        with open(fp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(fp, (mtime, mtime))

    def ev(eid, ts, value):
        return {"event_id": eid, "ts": ts, "user_id": 0,
                "event_type": "click", "value": value, "props": "{}"}

    ckpt = str(tmp_path / "late_ckpt")

    outdir = str(tmp_path / "late_out")

    def drain():
        stream = se.read_event_stream(spark, str(p), max_files_per_trigger=1)
        rollup = se.hourly_rollup_stream(stream, watermark="2 hours")
        q = (
            rollup.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        q.stop()

    # run 1: two rows in window [00:00,01:00) + one at 03:10 that
    # advances the checkpointed watermark to 01:10
    write("a.json", [ev(1, "2024-01-01T00:05:00.000Z", 1.0),
                     ev(2, "2024-01-01T00:15:00.000Z", 2.0),
                     ev(3, "2024-01-01T03:10:00.000Z", 4.0)], 1_000)
    drain()
    # run 2 (restart from checkpoint — watermark recovered): a LATE row
    # for the closed 00:00 window (dropped) + one at 06:10 that
    # advances the watermark past the 03:00 window's end
    write("b.json", [ev(4, "2024-01-01T00:20:00.000Z", 8.0),
                     ev(5, "2024-01-01T06:10:00.000Z", 16.0)], 2_000)
    drain()
    got: dict[str, tuple] = {}
    for r in spark.read.parquet(outdir).collect():
        key = str(r.window_start)
        assert key not in got, f"window {key} emitted twice"
        got[key] = (r.n, r.total_value)
    # 00:00 window finalized with ONLY the two on-time rows; the late
    # 00:20/8.0 row was dropped, not merged and not re-emitted
    assert got["2024-01-01 00:00:00"] == (2, 3.0)
    assert got["2024-01-01 03:00:00"] == (1, 4.0)
    # the 06:00 window never closed (watermark never passed 07:00), so
    # append mode correctly emitted nothing for it
    assert "2024-01-01 06:00:00" not in got


def test_stateful_running_counters(spark, tmp_path):
    from llm_enhanced_data_pipeline_spark.streaming.stateful import running_user_counters

    rows = []
    for i in range(30):
        rows.append(
            {"event_id": i, "ts": f"2024-01-01T00:{i:02d}:00.000Z",
             "user_id": i % 3, "event_type": "click", "value": float(i), "props": "{}"}
        )
    path = _write_events_jsonl(tmp_path, rows)
    stream = se.read_event_stream(spark, path, max_files_per_trigger=1)
    out = running_user_counters(stream)
    q = (
        out.writeStream.format("memory").queryName("stateful_test")
        .outputMode("update").trigger(availableNow=True).start()
    )
    # A stateful query with pending processing-time timeouts does not
    # self-terminate under availableNow (and processAllAvailable blocks
    # on the timeout-driven empty batches) — poll the sink for the
    # drained counters, then stop explicitly.
    import time

    deadline = time.monotonic() + 90
    while time.monotonic() < deadline:
        done = spark.sql(
            "select count(distinct user_id) c from stateful_test where n_events = 10"
        ).collect()[0].c
        if done == 3:
            break
        time.sleep(0.5)
    q.stop()
    got = spark.sql(
        "select user_id, max(n_events) n, max(total_value) t from stateful_test group by user_id"
    ).collect()
    by_user = {r.user_id: (r.n, r.t) for r in got}
    for u in range(3):
        expected_n = 10
        expected_t = float(sum(i for i in range(30) if i % 3 == u))
        assert by_user[u] == (expected_n, expected_t), by_user


def test_dedup_stream_drops_duplicates_across_microbatches(spark, tmp_path):
    """The same event_id arriving again (same or later micro-batch,
    within the watermark) must come out exactly once."""
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 0,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 0,
         "event_type": "click", "value": 1.0, "props": "{}"},  # dup, same batch
        {"event_id": 1, "ts": "2024-01-01T00:01:00.000Z", "user_id": 0,
         "event_type": "click", "value": 1.0, "props": "{}"},  # dup, next batch
        {"event_id": 2, "ts": "2024-01-01T00:02:00.000Z", "user_id": 0,
         "event_type": "click", "value": 2.0, "props": "{}"},
    ]
    path = _write_events_jsonl(tmp_path, rows)
    stream = se.read_event_stream(spark, path, max_files_per_trigger=1)
    deduped = se.dedup_stream(stream, key_cols=("event_id",))
    se.run_to_memory_sink(deduped, "dedup_stream_test", timeout_s=120, mode="append")
    got = spark.sql("select event_id from dedup_stream_test").collect()
    assert sorted(r.event_id for r in got) == [1, 2]


def test_incremental_enrichment_foreachbatch_exactly_once(spark, tmp_path):
    """The incremental LLM-enrichment stream (SURVEY.md §1.3/§3.2):
    across a stop/restart with a new input file, every doc_id is
    enriched exactly once — the engine's offset checkpoint skips
    already-read files, and the result-checkpoint anti-join skips
    re-delivered ids (here: file c re-ships ids 0 and 1)."""
    import pandas as pd

    from llm_enhanced_data_pipeline_spark.enrich import DeterministicFakeLLM
    from llm_enhanced_data_pipeline_spark.sources.checkpoint import ParquetCheckpoint
    from llm_enhanced_data_pipeline_spark.streaming import enrichment as en

    indir = tmp_path / "docs_in"
    indir.mkdir()

    def write(name, ids):
        with open(indir / name, "w") as f:
            for i in ids:
                f.write(json.dumps({"doc_id": i, "text": f"document body {i}"}) + "\n")

    def prompts(pdf: pd.DataFrame) -> pd.Series:
        return "Score this document: " + pdf["text"]

    ckpt = ParquetCheckpoint(spark, str(tmp_path / "enrich_ckpt"), "doc_id")
    stream_ckpt = str(tmp_path / "stream_ckpt")

    def run():
        en.incremental_enrichment_stream(
            spark,
            str(indir),
            ckpt,
            prompts,
            lambda: DeterministicFakeLLM(task="scoring"),
            rate_per_sec=10_000.0,
            stream_checkpoint_dir=stream_ckpt,
        )

    # run 1: two files, ids 0-5
    write("a.json", [0, 1, 2])
    write("b.json", [3, 4, 5])
    run()
    done = ckpt.load()
    assert sorted(r.doc_id for r in done.select("doc_id").collect()) == list(range(6))

    # restart: new file ships NEW ids 6-7 plus re-deliveries of 0 and 1
    write("c.json", [6, 7, 0, 1])
    run()
    rows = ckpt.load().collect()
    got = sorted(r.doc_id for r in rows)
    # exactly once per id — the re-delivered 0/1 appended nothing
    assert got == list(range(8))
    assert all(r.llm_json is not None for r in rows)

    # direct engine-replay simulation: the foreachBatch body re-invoked
    # with an already-processed batch (a crash between append and offset
    # commit) must append nothing
    batch = spark.read.schema(en.DOC_SCHEMA).json(str(indir / "c.json"))
    fn = en.make_enrich_batch_fn(
        ckpt, prompts, lambda: DeterministicFakeLLM(task="scoring"), rate_per_sec=10_000.0
    )
    fn(batch, 99)
    assert ckpt.load().count() == 8


def test_stream_stream_interval_join_matches_batch_range_join(spark, tmp_path):
    rows = []
    # user 0: purchase at 00:00, views at 00:10 (in window) and 01:00 (out)
    rows.append({"event_id": 10, "ts": "2024-01-01T00:00:00.000Z", "user_id": 0,
                 "event_type": "purchase", "value": 9.5, "props": "{}"})
    rows.append({"event_id": 11, "ts": "2024-01-01T00:10:00.000Z", "user_id": 0,
                 "event_type": "view", "value": 0.0, "props": "{}"})
    rows.append({"event_id": 12, "ts": "2024-01-01T01:00:00.000Z", "user_id": 0,
                 "event_type": "view", "value": 0.0, "props": "{}"})
    # user 1: view with no purchase
    rows.append({"event_id": 20, "ts": "2024-01-01T00:05:00.000Z", "user_id": 1,
                 "event_type": "view", "value": 0.0, "props": "{}"})
    path = _write_events_jsonl(tmp_path, rows)
    stream = se.read_event_stream(spark, path, max_files_per_trigger=1)
    joined = se.view_purchase_interval_join_stream(stream, max_gap_minutes=30)
    se.run_to_memory_sink(joined, "ssj_test", timeout_s=120, mode="append")
    got = [
        (r.user_id, r.view_id, r.purchase_id, r.purchase_value)
        for r in spark.sql("select * from ssj_test").collect()
    ]
    assert got == [(0, 11, 10, 9.5)]


def test_incremental_ingest_stream_cross_batch_content_dedup(spark, tmp_path):
    """Continuous corpus ingest (streaming/ingest.py): the accepted
    store is simultaneously corpus, content-hash index, and idempotence
    checkpoint. Across a restart, re-shipped ids, re-crawled CONTENT
    under new ids, and intra-batch copies all collapse to one accepted
    row per distinct content."""
    from llm_enhanced_data_pipeline_spark.streaming import ingest as ig

    indir = tmp_path / "docs_in"
    indir.mkdir()

    def write(name, rows):
        with open(indir / name, "w") as f:
            for i, text in rows:
                f.write(json.dumps({"doc_id": i, "text": text}) + "\n")

    store = ig.corpus_store(spark, str(tmp_path / "corpus_store"))
    stream_ckpt = str(tmp_path / "stream_ckpt")

    def run():
        ig.incremental_ingest_stream(
            spark, str(indir), store, stream_checkpoint_dir=stream_ckpt
        )

    # run 1: batch a has an intra-batch copy (ids 2/3 share content)
    write("a.json", [(0, "alpha"), (1, "beta"), (2, "gamma"), (3, "gamma")])
    run()
    rows = {r.doc_id: r.text for r in store.load().collect()}
    assert rows == {0: "alpha", 1: "beta", 2: "gamma"}  # first-wins on 2

    # restart: batch b re-crawls 'alpha' under a NEW id (cross-batch
    # content dup -> dropped by the index anti-join) + genuinely new doc
    write("b.json", [(10, "alpha"), (11, "delta")])
    run()
    rows = {r.doc_id: r.text for r in store.load().collect()}
    assert rows == {0: "alpha", 1: "beta", 2: "gamma", 11: "delta"}

    # engine-replay simulation: re-invoking the foreachBatch body with an
    # already-accepted batch appends nothing (crash between append and
    # offset commit)
    batch = spark.read.schema(ig.DOC_SCHEMA).json(str(indir / "b.json"))
    ig.make_ingest_batch_fn(store)(batch, 99)
    assert store.load().count() == 4


def test_near_dup_ingest_stream_rejects_fuzzy_recrawls(spark, tmp_path):
    """Near-dup-aware ingest (streaming/ingest.py): the persisted
    MinHash band index screens each batch against everything previously
    accepted, so a lightly-edited recrawl is rejected even though its
    content hash differs; replaying an accepted batch appends nothing."""
    from llm_enhanced_data_pipeline_spark.streaming import ingest as ig

    indir = tmp_path / "docs_in"
    indir.mkdir()
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def write(name, rows):
        with open(indir / name, "w") as f:
            for i, text in rows:
                f.write(json.dumps({"doc_id": i, "text": text}) + "\n")

    store = ig.corpus_store(spark, str(tmp_path / "corpus_store"))
    index_store = ig.near_dup_index_store(spark, str(tmp_path / "band_index"))
    ckpt = str(tmp_path / "stream_ckpt")

    def run():
        ig.near_dup_ingest_stream(
            spark, str(indir), store, index_store, stream_checkpoint_dir=ckpt
        )

    write("a.json", [(0, base), (1, "one two three four five six seven eight")])
    run()
    assert {r.doc_id for r in store.load().collect()} == {0, 1}

    # restart: 10 = near-identical recrawl of 0 (different fp!),
    # 11 = novel, 12 = too short to shingle (accepted by contract)
    write("b.json", [(10, base + " lambda"), (11, "red orange yellow"), (12, "hi")])
    run()
    assert {r.doc_id for r in store.load().collect()} == {0, 1, 11, 12}

    # engine-replay simulation: re-running the accepted batch is a no-op
    batch = spark.read.schema(ig.DOC_SCHEMA).json(str(indir / "b.json"))
    ig.make_near_dup_ingest_batch_fn(store, index_store)(batch, 99)
    assert store.load().count() == 4
    # index rows exist only for accepted, shingle-able docs
    assert {r.doc_id for r in index_store.load().select("doc_id").distinct().collect()} == {0, 1, 11}


def test_near_dup_ingest_survives_torn_index_append(spark, tmp_path):
    """Crash-window contract: the index is appended BEFORE the corpus
    store, and the screen ignores index rows matching the batch's own
    (doc_id, fp) pairs — so a batch whose index rows landed but whose
    corpus append did not is re-admitted on replay instead of rejecting
    itself, and leaves no leaked localCheckpoint blocks behind."""
    from llm_enhanced_data_pipeline_spark.operators import dedup
    from llm_enhanced_data_pipeline_spark.streaming import ingest as ig

    store = ig.corpus_store(spark, str(tmp_path / "corpus_store"))
    index_store = ig.near_dup_index_store(spark, str(tmp_path / "band_index"))
    process = ig.make_near_dup_ingest_batch_fn(store, index_store)

    b1 = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta epsilon zeta eta theta")]
    )
    process(b1, 1)

    # simulate the torn window for a NOVEL doc: index rows written
    # (carrying fp, exactly as the real first attempt writes them),
    # corpus append lost
    novel = "one two three four five six seven eight nine"
    b2 = spark.createDataFrame([Row(doc_id=20, text=novel)])
    b2k = b2.withColumn(
        "fp", dedup.content_hash(F.coalesce(F.col("text"), F.lit("")))
    )
    g = dedup.minhash_grouped(
        b2k.withColumn("toks", dedup.tokens(F.col("text"))),
        "doc_id", "toks", shingle_n=3,
    )
    index_store.append(
        dedup.minhash_index(g, "doc_id").join(
            b2k.select("doc_id", "fp"), "doc_id"
        )
    )
    dedup.release_caches()
    assert {r.doc_id for r in store.load().collect()} == {0}  # torn state

    # replay: doc 20 must be ACCEPTED despite its own stale index rows
    n_blocks_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    process(b2, 2)
    assert {r.doc_id for r in store.load().collect()} == {0, 20}
    # no leaked localCheckpoint blocks from the batch body
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= n_blocks_before

    # the (now duplicated) index rows still reject a fuzzy recrawl of 20
    b3 = spark.createDataFrame([Row(doc_id=30, text=novel + " ten")])
    process(b3, 3)
    assert {r.doc_id for r in store.load().collect()} == {0, 20}


def test_near_dup_ingest_screens_reused_doc_id_against_prior(spark, tmp_path):
    """doc_id reuse contract (ADVICE r5): the torn-replay self-exclusion
    keys on (doc_id, fp), so a doc_id legitimately reused by a later
    batch with EDITED text is still screened against its own prior
    version — a lightly-edited resubmission under the same id is
    rejected, while a wholly different text under the same id is
    accepted and indexed alongside the prior version's rows."""
    from llm_enhanced_data_pipeline_spark.streaming import ingest as ig

    store = ig.corpus_store(spark, str(tmp_path / "corpus_store"))
    index_store = ig.near_dup_index_store(spark, str(tmp_path / "band_index"))
    process = ig.make_near_dup_ingest_batch_fn(store, index_store)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    process(spark.createDataFrame([Row(doc_id=0, text=base)]), 1)
    assert store.load().count() == 1

    # same doc_id, lightly edited text (different fp): with bare-id
    # exclusion this sailed through unscreened; the pair exclusion
    # keeps the prior version's index rows and rejects the near-dup
    process(spark.createDataFrame([Row(doc_id=0, text=base + " lambda")]), 2)
    assert [r.text for r in store.load().collect()] == [base]

    # same doc_id, wholly different text: accepted, and the band index
    # now carries rows for BOTH versions (distinct fps) of the id
    other = "one two three four five six seven eight nine ten"
    process(spark.createDataFrame([Row(doc_id=0, text=other)]), 3)
    assert {r.text for r in store.load().collect()} == {base, other}
    assert index_store.load().select("fp").distinct().count() == 2

    # and a fuzzy recrawl of EITHER version under a fresh id is rejected
    process(spark.createDataFrame([Row(doc_id=9, text=other + " eleven")]), 4)
    assert {r.text for r in store.load().collect()} == {base, other}


def test_stateful_domain_cap_matches_batch_twin(spark, tmp_path):
    """Streaming per-domain cap (streaming/stateful.domain_cap_stream):
    at most N docs accepted per domain across micro-batches, earliest
    doc_ids win within each batch — and with batches arriving in
    doc_id order the accepted set equals the batch-side
    web.cap_per_domain on the union. Cross-batch state is the point:
    batch 2's rows must see batch 1's counts."""
    import json as _json

    from llm_enhanced_data_pipeline_spark.operators import web
    from llm_enhanced_data_pipeline_spark.streaming.stateful import (
        CAP_OUTPUT_SCHEMA,
        domain_cap_stream,
    )

    indir = tmp_path / "docs_in"
    indir.mkdir()
    # batch a: a.com ids 0..3, b.com ids 0..1 | batch b: a.com 10..13
    rows_a = [("a.com", i) for i in range(4)] + [("b.com", i) for i in range(2)]
    rows_b = [("a.com", 10 + i) for i in range(4)]
    for name, rows in (("a.json", rows_a), ("b.json", rows_b)):
        with open(indir / name, "w") as f:
            for d, i in rows:
                f.write(_json.dumps({"domain": d, "doc_id": i}) + "\n")

    stream = (
        spark.readStream.schema("domain string, doc_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    out = str(tmp_path / "out")
    q = (
        domain_cap_stream(stream, cap=6)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = spark.read.schema(CAP_OUTPUT_SCHEMA).parquet(out)
    assert got.count() == 10  # every input row gets a decision
    accepted = {
        (r.domain, r.doc_id) for r in got.filter(F.col("accepted")).collect()
    }
    # a.com: 4 from batch a + first 2 of batch b (cap 6); b.com: both
    assert accepted == {("a.com", i) for i in (0, 1, 2, 3, 10, 11)} | {
        ("b.com", 0), ("b.com", 1)
    }
    # batch twin: same accepted set as cap_per_domain over the union
    batch = spark.createDataFrame(
        [Row(domain=d, doc_id=i) for d, i in rows_a + rows_b]
    )
    twin = {
        (r.domain, r.doc_id)
        for r in web.cap_per_domain(
            batch, "domain", [F.col("doc_id")], cap=6
        ).collect()
    }
    assert accepted == twin


def test_embed_on_ingest_stream_exactly_once_real_model(spark, tmp_path):
    """Embed-on-ingest (r6 verdict #6): the vendored 384-d transformer
    runs through the incremental streaming path with the fp-keyed
    exactly-once store. Across a stop/restart mid-stream, embeddings
    are neither lost (every distinct content fp is stored) nor
    recomputed (one store row per fp, even when re-crawled content
    re-ships under a NEW doc_id, and even when the foreachBatch body
    replays a committed batch)."""
    from llm_enhanced_data_pipeline_spark.enrich.embedding import (
        vendored_transformer_embedder,
    )
    from llm_enhanced_data_pipeline_spark.sources.checkpoint import ParquetCheckpoint
    from llm_enhanced_data_pipeline_spark.streaming import enrichment as en

    indir = tmp_path / "docs_in"
    indir.mkdir()

    def write(name, rows):
        with open(indir / name, "w") as f:
            for i, text in rows:
                f.write(json.dumps({"doc_id": i, "text": text}) + "\n")

    # small model config: the real attention path at test size
    factory = lambda: vendored_transformer_embedder(  # noqa: E731
        dim=32, n_layers=1, n_heads=2, vocab=256, max_len=16
    )
    store = ParquetCheckpoint(spark, str(tmp_path / "emb_store"), "fp")
    stream_ckpt = str(tmp_path / "stream_ckpt")

    def run():
        en.incremental_embedding_stream(
            spark,
            str(indir),
            store,
            factory,
            stream_checkpoint_dir=stream_ckpt,
        )

    # run 1: docs 0-3; 0 and 3 share CONTENT (one fp) — and doc 2
    # duplicates doc 1's content within the same batch
    write("a.json", [(0, "alpha beta gamma"), (1, "delta epsilon")])
    write("b.json", [(2, "delta epsilon"), (3, "alpha beta gamma")])
    run()
    first = {r.fp: (r.doc_id, list(r.embedding)) for r in store.load().collect()}
    assert len(first) == 2  # one row per distinct content
    assert store.load().count() == 2  # no duplicate appends

    # restart mid-stream: new file ships new content AND a re-crawl of
    # doc 0's content under a brand-new doc_id (the paid-compute trap)
    write("c.json", [(9, "zeta eta theta"), (10, "alpha beta gamma")])
    run()
    rows = store.load().collect()
    assert len(rows) == 3  # new content embedded, re-crawl skipped
    second = {r.fp: (r.doc_id, list(r.embedding)) for r in rows}
    for fp, (doc_id, vec) in first.items():
        # not lost, not recomputed, not re-attributed
        assert second[fp] == (doc_id, vec)

    # direct engine-replay simulation: foreachBatch re-invoked with a
    # committed batch (crash between append and offset commit)
    batch = spark.read.schema(en.DOC_SCHEMA).json(str(indir / "c.json"))
    en.make_embed_batch_fn(store, factory)(batch, 99)
    assert store.load().count() == 3

    # the stored vectors come from the REAL model: unit-norm, 32-d,
    # and distinct contents embed to distinct directions
    import math

    vecs = {r.fp: list(r.embedding) for r in store.load().collect()}
    for v in vecs.values():
        assert len(v) == 32
        assert abs(math.fsum(x * x for x in v) - 1.0) < 1e-3
    vs = list(vecs.values())
    for i in range(len(vs)):
        for j in range(i + 1, len(vs)):
            dot = math.fsum(a * b for a, b in zip(vs[i], vs[j]))
            assert dot < 0.999


def test_warc_corpus_stream_exactly_once_and_resume(spark, tmp_path):
    """Crawl-archive streaming ingest (streaming/ingest.py): binary
    WARC payload files drain through the v6 gate chain into the
    rec_key-keyed store. Checks: the 404 page is gated out, the token
    floor drops short pages, stop/restart with the same stream
    checkpoint processes only NEW files, engine replay of an accepted
    batch appends nothing, and the same clean text under a DIFFERENT
    doc id is its own row (cross-doc dedup is a separate stage)."""
    from pyspark.sql import Row

    from llm_enhanced_data_pipeline_spark.sources import warc
    from llm_enhanced_data_pipeline_spark.streaming import ingest as ig

    indir = tmp_path / "warc_in"
    indir.mkdir()

    def payload(doc_id, text):
        page = f"<html><body><p>{text}</p></body></html>"
        ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
        gone = "HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\n<p>gone</p>"
        return warc.write_warc(
            [{"headers": {"WARC-Type": "response",
                          "WARC-Target-URI": f"http://e.com/{doc_id}"},
              "content": ok.encode()},
             {"headers": {"WARC-Type": "response",
                          "WARC-Target-URI": f"http://e.com/{doc_id}/old"},
              "content": gone.encode()}],
            gzip_members=True,
        )

    def write(name, rows):
        spark.createDataFrame(
            [Row(doc_id=i, payload=payload(i, t)) for i, t in rows]
        ).coalesce(1).write.mode("overwrite").parquet(str(indir / name))

    store = ig.warc_corpus_store(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "stream_ckpt")

    def run():
        ig.warc_corpus_stream(
            spark, str(indir) + "/*", store,
            stream_checkpoint_dir=ckpt, max_files_per_trigger=1,
        )

    # run 1: doc 2 is under the 3-token floor; docs 1/3 share text
    write("a.parquet", [(1, "shared page text here"), (2, "too short")])
    write("b.parquet", [(3, "shared page text here")])
    run()
    rows = {r.doc_id: r for r in store.load().collect()}
    assert set(rows) == {1, 3}  # 404s gated, short page floored
    assert rows[1].fp == rows[3].fp  # same content fp...
    assert rows[1].rec_key != rows[3].rec_key  # ...but per-doc rows
    assert rows[1].n_toks == 4

    # restart with a NEW file only: old files are not reprocessed
    write("c.parquet", [(9, "a brand new page")])
    run()
    assert {r.doc_id for r in store.load().collect()} == {1, 3, 9}

    # engine-replay simulation: same batch through the body twice
    batch = spark.read.parquet(str(indir / "c.parquet"))
    n_before = store.load().count()
    ig.make_warc_corpus_batch_fn(store)(batch, 99)
    assert store.load().count() == n_before


def test_streaming_recrawl_warm_pagerank_on_edge_deltas(spark, tmp_path):
    """The production recrawl cadence (streaming/recrawl.py): WARC
    micro-batches drain through link extraction into the keyed edge
    store; each cadence re-ranks WARM from the prior fixed point.
    Checks: link facts are exactly-once under engine replay and
    stream restart, the store-derived host graph matches the pages'
    links, warm-start from the prior crawl's ranks absorbs the edge
    delta faster than a cold start with the same budget, and warm
    converges to the cold fixed point."""
    from pyspark.sql import Row

    from llm_enhanced_data_pipeline_spark.operators import graph
    from llm_enhanced_data_pipeline_spark.sources import warc
    from llm_enhanced_data_pipeline_spark.streaming import recrawl as rc

    indir = tmp_path / "warc_in"
    indir.mkdir()

    def payload(page_url, hrefs):
        body = "".join(f'<a href="{h}">t</a>' for h in hrefs)
        page = f"<html><body>{body}</body></html>"
        ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
        return warc.write_warc(
            [{"headers": {"WARC-Type": "response",
                          "WARC-Target-URI": page_url},
              "content": ok.encode()}],
            gzip_members=True,
        )

    def write(name, pages):
        spark.createDataFrame(
            [Row(doc_id=i, payload=payload(u, hs))
             for i, (u, hs) in enumerate(pages)]
        ).coalesce(1).write.mode("overwrite").parquet(str(indir / name))

    store = rc.link_store(spark, str(tmp_path / "links"))
    ckpt = str(tmp_path / "stream_ckpt")
    rank_path = str(tmp_path / "ranks")

    def run():
        rc.recrawl_stream(
            spark, str(indir) + "/*", store,
            stream_checkpoint_dir=ckpt, max_files_per_trigger=1,
        )

    # crawl 1: a.com <-> b.com, b.com -> c.com (c dangling; the
    # test_graph delta shape, where 3 cold rounds have NOT converged);
    # the a->b page carries 2 anchors (multiplicity) + a self-loop href
    write("a.parquet", [
        ("http://a.com/p1", ["http://b.com/x", "http://b.com/y", "/self"]),
        ("http://b.com/p1", ["http://a.com/home", "http://c.com/z"]),
    ])
    run()
    edges1 = {(r.src, r.dst): r.weight for r in rc.host_edges(store).collect()}
    assert edges1 == {
        ("a.com", "b.com"): 2,
        ("b.com", "a.com"): 1,
        ("b.com", "c.com"): 1,
    }

    # cold fixed point for crawl 1 becomes the stored prior
    prior = rc.rerank_warm(spark, store, rank_path, n_iter=12)
    assert {r.node for r in prior.collect()} == {"a.com", "b.com", "c.com"}

    # engine-replay: the same batch through the body twice appends nothing
    batch = spark.read.parquet(str(indir / "a.parquet"))
    n_before = store.load().count()
    rc.make_link_extract_batch_fn(store)(batch, 99)
    assert store.load().count() == n_before

    # crawl 2 (stream restart, same checkpoint): only the NEW file is
    # processed; the delta adds c.com -> a.com (weight 2)
    write("b.parquet", [
        ("http://c.com/p9", ["http://a.com/home", "http://a.com/about"]),
    ])
    run()
    edges2 = {(r.src, r.dst): r.weight for r in rc.host_edges(store).collect()}
    assert edges2[("c.com", "a.com")] == 2 and len(edges2) == 4

    # warm absorbs the delta faster than cold at the same budget
    new_edges = rc.host_edges(store)
    target = {r.node: r.rank_u
              for r in graph.pagerank_int(new_edges, n_iter=40).collect()}
    warm3 = {r.node: r.rank_u
             for r in rc.rerank_warm(spark, store, rank_path, n_iter=3).collect()}
    cold3 = {r.node: r.rank_u
             for r in graph.pagerank_int(new_edges, n_iter=3).collect()}
    err_warm = sum(abs(warm3[n] - target[n]) for n in target)
    err_cold = sum(abs(cold3[n] - target[n]) for n in target)
    assert err_warm < err_cold

    # and the warm cadence converges to the cold fixed point
    for _ in range(3):  # 3 more cadences x 3 rounds from the saved prior
        warm = {r.node: r.rank_u
                for r in rc.rerank_warm(spark, store, rank_path, n_iter=3).collect()}
    for node in target:
        assert abs(warm[node] - target[node]) < 10_000_000, node  # <1% scale


def test_recrawl_removed_link_leaves_the_graph_and_warm_ranks(spark, tmp_path):
    """Crawl-versioned edge store (r13 verdict item 4): a page that
    DROPS a link on recrawl must lose the stale edge — the old
    forever-union store kept it in every future re-rank. Covers: a
    recrawled page replaced by its latest generation; a page recrawled
    with ZERO links surviving only as its sentinel (generation still
    advances); a page not recrawled keeping its old-generation facts;
    and the warm rank of the dropped target demonstrably falling."""
    from pyspark.sql import Row

    from llm_enhanced_data_pipeline_spark.sources import warc
    from llm_enhanced_data_pipeline_spark.streaming import recrawl as rc

    indir = tmp_path / "warc_in"
    indir.mkdir()

    def payload(page_url, hrefs):
        body = "".join(f'<a href="{h}">t</a>' for h in hrefs)
        page = f"<html><body>{body}</body></html>"
        ok = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
        return warc.write_warc(
            [{"headers": {"WARC-Type": "response",
                          "WARC-Target-URI": page_url},
              "content": ok.encode()}],
            gzip_members=True,
        )

    def write(name, pages):
        spark.createDataFrame(
            [Row(doc_id=i, payload=payload(u, hs))
             for i, (u, hs) in enumerate(pages)]
        ).coalesce(1).write.mode("overwrite").parquet(str(indir / name))

    store = rc.link_store(spark, str(tmp_path / "links"))
    ckpt = str(tmp_path / "stream_ckpt")
    rank_path = str(tmp_path / "ranks")

    # crawl 0: a links b and c; b links a; d links c (d never recrawled)
    write("c0.parquet", [
        ("http://a.com/p", ["http://b.com/x", "http://c.com/y"]),
        ("http://b.com/p", ["http://a.com/x"]),
        ("http://d.com/p", ["http://c.com/z"]),
    ])
    rc.recrawl_stream(spark, str(indir) + "/*", store,
                      stream_checkpoint_dir=ckpt, crawl_id=0)
    edges0 = {(r.src, r.dst): r.weight for r in rc.host_edges(store).collect()}
    assert edges0 == {
        ("a.com", "b.com"): 1, ("a.com", "c.com"): 1,
        ("b.com", "a.com"): 1, ("d.com", "c.com"): 1,
    }
    prior = {r.node: r.rank_u
             for r in rc.rerank_warm(spark, store, rank_path, n_iter=12).collect()}

    # crawl 1: a DROPS its c-link; b recrawled with ZERO links
    write("c1.parquet", [
        ("http://a.com/p", ["http://b.com/x"]),
        ("http://b.com/p", []),
    ])
    rc.recrawl_stream(spark, str(indir) + "/*", store,
                      stream_checkpoint_dir=ckpt, crawl_id=1)
    edges1 = {(r.src, r.dst): r.weight for r in rc.host_edges(store).collect()}
    # a->c gone, b->a gone (zero-link generation), d->c (not
    # recrawled) retained from generation 0
    assert edges1 == {("a.com", "b.com"): 1, ("d.com", "c.com"): 1}

    # replay-safety per generation: re-running the crawl-1 batch body
    # appends nothing
    batch = spark.read.parquet(str(indir / "c1.parquet"))
    n_before = store.load().count()
    rc.make_link_extract_batch_fn(store, crawl_id=1)(batch, 99)
    assert store.load().count() == n_before

    # the dropped target's warm rank falls once the stale edge is gone
    warm = {r.node: r.rank_u
            for r in rc.rerank_warm(spark, store, rank_path, n_iter=12).collect()}
    assert warm["c.com"] < prior["c.com"]
