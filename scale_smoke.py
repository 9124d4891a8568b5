#!/usr/bin/env python
"""Scale-smoke: empirical near-linearity check for the scale paths.

Replicates the sf0.1 corpus R times IN MEMORY (no files written) and
times the three heaviest scale-path operators at two replication
factors. If an operator hides a quadratic join, its wall-time ratio
explodes past the data ratio; near-linear ratios are the evidence that
the plans that pass test_plans.py also BEHAVE linearly.

Replica salting: every token is prefixed with a per-replica tag
(regexp, one pass), so replicas share no shingles and the engineered
near-dup structure (doc%10 variants WITHIN a replica) scales linearly
instead of forming R-sized mutual-duplicate cliques — replication that
kept replicas identical would make the OUTPUT itself quadratic and
measure nothing.

Usage: python scale_smoke.py [low_R high_R]   (defaults 2 8)
Prints one JSON line with per-operator seconds at each scale + ratios.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import bpe, corpus, dedup, joins, vector
from llm_enhanced_data_pipeline_spark.queries.dedup_q import _docs_with_near_dups
from llm_enhanced_data_pipeline_spark.session import get_spark
from llm_enhanced_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def replicated_docs(spark: SparkSession, r: int) -> DataFrame:
    base = _docs_with_near_dups(spark, SF_DIR)
    reps = spark.range(r).select(F.col("id").alias("_rep"))
    return (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), r"(\S+)", F.concat(F.lit("x"), F.col("_rep"), F.lit("$1"))
            ).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )


def replicated_embeddings(spark: SparkSession, r: int) -> DataFrame:
    base = load_table(spark, "embeddings", SF_DIR)
    reps = spark.range(r).select(F.col("id").alias("_rep"))
    return (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            "label",
            "embedding",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )


def replicated_events(spark: SparkSession, r: int) -> DataFrame:
    base = load_table(spark, "events", SF_DIR)
    reps = spark.range(r).select(F.col("id").alias("_rep"))
    return (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("_rep") * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_rep") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )


def _heuristic_funnel(toked: DataFrame) -> DataFrame:
    """C4 + Gopher + dedup-rank + budget, the corpus_build_v3 shape,
    over synthetic line structure built from the replicated corpus."""
    from pyspark.sql import Window

    from llm_enhanced_data_pipeline_spark.functions import hashing
    from llm_enhanced_data_pipeline_spark.operators import text_analysis
    from llm_enhanced_data_pipeline_spark.queries.text_q import _c4_structured_text

    base = toked.select(
        "doc_id",
        (F.col("doc_id") % 20).alias("source"),
        _c4_structured_text(F.col("doc_id"), F.col("toks")).alias("structured"),
    )
    kept = text_analysis.c4_kept_lines(F.col("structured"))
    flagged = base.select(
        "doc_id",
        "source",
        F.array_join(kept, "\n").alias("cleaned"),
        text_analysis.c4_doc_pass(F.col("structured"), kept).alias("c4_ok"),
    ).withColumn(
        "surv",
        F.col("c4_ok")
        & text_analysis.gopher_pass(
            F.col("cleaned"), 30, ("the", "a", "table", "value", "row", "key")
        ),
    )
    w_fp = Window.partitionBy(
        hashing.md5_hex(F.lower(F.trim(F.col("cleaned"))))
    ).orderBy(F.col("surv").desc(), F.col("doc_id").asc())
    return flagged.withColumn(
        "unique_ok", F.col("surv") & (F.row_number().over(w_fp) == 1)
    )


def time_op(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def run_at(spark: SparkSession, r: int) -> dict[str, float]:
    docs = replicated_docs(spark, r).persist()
    n_docs = docs.count()
    toked = docs.withColumn("toks", dedup.tokens(F.col("text")))
    out: dict[str, float] = {"n_docs": n_docs}

    out["minhash_pairs"] = time_op(
        lambda: dedup.near_dup_pairs_minhash(
            toked, "doc_id", "toks", num_hashes=16, shingle_n=3
        ).count()
    )
    dedup.release_caches()  # isolate measurements: no cross-op cache/GC bleed
    out["simhash_pairs"] = time_op(
        lambda: dedup.near_dup_pairs_simhash(toked, "doc_id", "toks").count()
    )
    dedup.release_caches()
    # containment join: prefix-filtered candidates (rarest shingles
    # only) — must track corpus size, not shingle-frequency skew
    out["containment_pairs"] = time_op(
        lambda: dedup.containment_pairs(
            toked, "doc_id", "toks", threshold=0.8, shingle_n=3
        ).count()
    )
    dedup.release_caches()

    # connected components over the engineered near-dup pair graph: the
    # iterative star-contraction loop localCheckpoints each round, so
    # wall time must track edge count, not blow up with plan depth
    pairs = (
        dedup.near_dup_pairs_minhash(toked, "doc_id", "toks", num_hashes=16, shingle_n=3)
        .select(F.col("id_a"), F.col("id_b"))
        .localCheckpoint(eager=True)
    )
    out["components"] = time_op(
        lambda: dedup.connected_components_star(
            docs.select("doc_id"), pairs, "doc_id"
        ).count()
    )
    pairs.rdd.unpersist()  # free the eager localCheckpoint blocks
    dedup.release_caches()

    # corpus-construction scale paths: decontamination's gram equi-join,
    # chunk explosion, Gopher repetition aggs — all should track data size
    is_eval = corpus.split_bucket(F.col("doc_id").cast("string")) >= 950
    out["decontamination"] = time_op(
        lambda: corpus.contamination_scores(
            toked.filter(~is_eval), toked.filter(is_eval), "doc_id", "toks", n=3
        ).count()
    )
    out["chunking"] = time_op(
        lambda: corpus.chunk_documents(toked, "doc_id", "toks", 32, 24).count()
    )
    out["repetition"] = time_op(
        lambda: corpus.repetition_stats(toked, "doc_id", "toks", n=2).count()
    )
    # unaligned exact-substring dedup: gram explode + gram-text window +
    # per-doc island merge — replica salting keeps grams replica-local,
    # so the gram groups stay constant-size and cost must track tokens
    out["substring_spans"] = time_op(
        lambda: corpus.duplicated_spans(toked, "doc_id", "toks", k=8).count()
    )
    # APPLY side: island aggregation + per-row array-slice excision.
    # count() would prune the clean_text assembly, so force it through
    # a row-hash reduction (same device as bench.py's force()).
    out["substring_apply"] = time_op(
        lambda: corpus.remove_duplicated_spans(toked, "doc_id", "toks", k=8)
        .select(
            F.bit_xor(
                F.xxhash64("doc_id", "n_tokens", "n_kept", "clean_text")
            ).alias("h")
        )
        .collect()
    )
    # DoReMi reweighting: token shuffle + vocab-keyed join + D-row tail
    out["doremi"] = time_op(
        lambda: corpus.doremi_domain_weights(
            toked.withColumn("dom", (F.col("doc_id") % 7).cast("string")),
            "dom",
            "toks",
        ).count()
    )

    ev = replicated_events(spark, r).persist()
    out["n_events"] = ev.count()
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    out["asof_join"] = time_op(
        lambda: joins.asof_join(
            views, purchases, "user_id", "ts", "ts", ["value"], right_tiebreak="event_id"
        ).count()
    )
    win = 30 * 60 * 1_000_000_000
    intervals = purchases.select(
        "user_id", F.col("ts").alias("_s"), (F.col("ts") + win).alias("_e")
    )
    out["range_join"] = time_op(
        lambda: joins.range_join_bucketed(
            views, intervals, "user_id", "ts", "_s", "_e", win
        ).count()
    )

    # heuristic-filter funnel: pure column algebra + two keyed windows —
    # must track data size exactly
    out["heuristic_funnel"] = time_op(
        lambda: _heuristic_funnel(toked).count()
    )

    # incremental ingest: anti equi-join against the snapshot hash index
    snap = docs.filter(F.col("doc_id") % 10 < 8)
    batch = docs.filter(F.col("doc_id") % 10 >= 8)
    out["incremental_dedup"] = time_op(
        lambda: dedup.dedup_against_index(
            batch, dedup.content_index(snap, "text"), "text", ["doc_id"]
        ).count()
    )

    # DSIR selection: feature explode + <=B-row model joins + per-doc agg
    out["dsir"] = time_op(
        lambda: corpus.dsir_scores(
            toked, "doc_id", "toks", F.col("doc_id") % 5 == 0, num_buckets=1024
        ).count()
    )
    # BPE training: 4 merge rounds over the word-type table (replica
    # salting grows the vocab linearly, the production-relevant axis)
    out["bpe_train"] = time_op(
        lambda: bpe.bpe_train(bpe.word_freqs(toked, "toks"), iters=4)
    )
    dedup.release_caches()
    # snapshot diff: full-outer equi-join of id+fp projections
    from llm_enhanced_data_pipeline_spark.functions import hashing as _h

    old_fp = docs.select("doc_id", _h.md5_hex(F.col("text")).alias("fp"))
    new_fp = docs.filter(F.col("doc_id") % 17 != 3).select(
        "doc_id", _h.md5_hex(F.concat(F.col("text"), F.lit("v"))).alias("fp")
    )
    out["snapshot_diff"] = time_op(
        lambda: corpus.snapshot_diff(old_fp, new_fp, "doc_id", "fp").count()
    )

    emb = replicated_embeddings(spark, r).persist()
    out["n_vecs"] = emb.count()
    cents = vector.centroids_by_key(emb, "label", "embedding")
    queries = emb.filter(F.col("vec_id") < 8)
    out["ivf_knn"] = time_op(
        lambda: vector.ivf_knn_join(
            queries, emb, cents, "vec_id", "vec_id", "embedding", "embedding", k=5
        ).count()
    )
    # k-means training: per-iteration cost = broadcast K-row scoring +
    # (cid, pos) agg — linear in rows, independent of K's data share
    out["kmeans_train"] = time_op(
        lambda: vector.kmeans_train_quantized(emb, "vec_id", "embedding", k=8, iters=3)[
            0
        ].count()
    )
    # SemDeDup prune under the production invariant — the auto-k regime
    # (dedup.semdedup_auto_k): cluster COUNT grows with the corpus,
    # cluster SIZE stays at the constant target, so the in-cluster
    # quadratic side is n * target = linear. The synthetic assignment
    # hash-shards vectors into exactly that many clusters (the trainer
    # itself is timed separately in the kmeans_train slot).
    n_clusters = dedup.semdedup_auto_k(out["n_vecs"])
    sd_base = emb.select(
        "vec_id",
        F.pmod(_h.stable_hash32(F.col("vec_id").cast("string")), F.lit(n_clusters))
        .cast("bigint")
        .alias("cluster"),
        F.col("embedding").alias("_v"),
        ((F.col("vec_id") % 997) / 997.0).alias("centroid_sim"),
    )
    out["semdedup_prune"] = time_op(
        lambda: dedup.semdedup_prune_within(sd_base, "vec_id", 0.35).count()
    )
    # MMR: k greedy rounds, each one corpus scan + a 1-row broadcast
    mq = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    out["mmr"] = time_op(
        lambda: vector.mmr_topk(
            emb.filter(F.col("vec_id") != 0), mq, "vec_id", "embedding", k=5
        ).count()
    )
    docs.unpersist()
    ev.unpersist()
    emb.unpersist()
    dedup.release_caches()
    return out


def main() -> None:
    lo, hi = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (2, 8)
    spark = get_spark("scale_smoke")
    run_at(spark, 1)  # throwaway pass: JIT/codegen warmup out of the numbers
    low, high = run_at(spark, lo), run_at(spark, hi)
    data_ratio = hi / lo
    report = {
        "data_ratio": data_ratio,
        "low": low,
        "high": high,
        # every timed op, derived from the measurement dict itself so a
        # newly-added slot can never silently miss the ratio report
        "wall_ratios": {
            k: round(high[k] / max(low[k], 0.01), 2)
            for k in low
            if not k.startswith("n_")
        },
    }
    # Invariant gates: every slot must stay under the data ratio, and
    # semdedup — the one op whose cost law DEPENDS on the auto-k
    # invariant — must stay in line with its linear siblings (r6
    # verdict bound). A violation means a quadratic side regressed.
    bounds = {k: data_ratio for k in report["wall_ratios"]}
    bounds["semdedup_prune"] = min(1.6, data_ratio)
    report["ratio_violations"] = {
        k: {"ratio": report["wall_ratios"][k], "bound": round(b, 2)}
        for k, b in bounds.items()
        if report["wall_ratios"][k] > b
    }
    print(json.dumps(report))
    spark.stop()
    if report["ratio_violations"]:
        sys.exit(f"scale invariant violated: {report['ratio_violations']}")


if __name__ == "__main__":
    main()
