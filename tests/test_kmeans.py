"""K-means trainer semantics (operators/vector.py kmeans_*): exact
integer-grid Lloyd's iterations, cluster recovery on engineered data,
and the dequantize bridge into IVF serving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import vector


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, v ARRAY<FLOAT>")


@pytest.fixture(scope="module")
def two_blob_df(spark):
    # Two tight blobs far apart; seeds (ids 0 and 1) land one per blob.
    blob_a = [(i, [1.0 + 0.001 * i, 0.0]) for i in range(0, 20, 2)]
    blob_b = [(i, [-1.0 - 0.001 * i, 0.5]) for i in range(1, 20, 2)]
    return _vec_df(spark, blob_a + blob_b)


def test_kmeans_recovers_engineered_clusters(spark, two_blob_df):
    assigned, cents = vector.kmeans_train_quantized(
        two_blob_df, "id", "v", k=2, iters=3
    )
    got = {r["id"]: r["cid"] for r in assigned.collect()}
    evens = {got[i] for i in range(0, 20, 2)}
    odds = {got[i] for i in range(1, 20, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
    assert cents.count() == 2


def test_kmeans_is_deterministic_across_partitionings(spark, two_blob_df):
    _, c1 = vector.kmeans_train_quantized(two_blob_df, "id", "v", k=2, iters=2)
    shuffled = two_blob_df.repartition(7)
    _, c2 = vector.kmeans_train_quantized(shuffled, "id", "v", k=2, iters=2)
    rows1 = sorted((r["cid"], r["_cent"]) for r in c1.collect())
    rows2 = sorted((r["cid"], r["_cent"]) for r in c2.collect())
    # exact integer equality — the whole point of the quantized grid
    assert rows1 == rows2


def test_quantize_grid_is_nonnegative_and_invertible_to_1e6(spark):
    df = _vec_df(spark, [(0, [-1.9, 0.0, 1.9])])
    q = df.select(vector.quantize_vec(F.col("v")).alias("q")).first()["q"]
    assert all(x >= 0 for x in q)
    assert q == [100000, 2000000, 3900000 - 1] or q == [100000, 2000000, 3899999]


def test_empty_cluster_drops_out(spark):
    # All vectors identical -> both seeds coincide, every assignment
    # ties, the (distance, cid) tie-break routes everything to cid 0,
    # and cluster 1 empties out of the centroid frame.
    rows = [(i, [1.0, 0.0]) for i in range(12)]
    _, cents = vector.kmeans_train_quantized(_vec_df(spark, rows), "id", "v", k=2, iters=2)
    assert cents.count() == 1


def test_dequantize_bridges_into_ivf_serving(spark, two_blob_df):
    _, cents = vector.kmeans_train_quantized(two_blob_df, "id", "v", k=2, iters=2)
    serving = vector.dequantize_centroids(cents)
    assert serving.columns == ["ckey", "centroid"]
    # centroid components return to the float scale (within grid step)
    c = {r["ckey"]: r["centroid"] for r in serving.collect()}
    assert any(abs(v[0] - 1.0) < 0.05 for v in c.values())
    assert any(abs(v[0] + 1.0) < 0.05 for v in c.values())
    # and the frame drives ivf_knn_join end-to-end: neighbors stay
    # within the query's own blob
    knn = vector.ivf_knn_join(
        two_blob_df, two_blob_df, serving, "id", "id", "v", "v", k=3
    )
    out = knn.filter(F.col("id") == 0).select("neighbor_id").collect()
    assert len(out) == 3
    assert all(r["neighbor_id"] % 2 == 0 for r in out)


def test_mmr_prefers_diverse_over_redundant(spark):
    """MMR semantics: after picking the most relevant doc, a near-clone
    of it (higher raw relevance than the diverse alternative) is passed
    over in favor of the diverse doc; plain top-k would pick the clone."""
    q = spark.createDataFrame([([1.0, 0.0, 0.0, 0.0],)], "qv: array<float>")
    corpus = _vec_df(
        spark,
        [
            (1, [0.95, 0.3, 0.0, 0.0]),   # rel ~0.954 — picked first
            (2, [0.92, 0.4, 0.0, 0.0]),   # rel ~0.917, near-clone of 1
            (3, [0.9, -0.43, 0.0, 0.0]),  # rel ~0.902, diverse from 1
        ],
    )
    out = vector.mmr_topk(corpus, q, "id", "v", k=2, lam=0.5)
    ranks = {r.rank: r.id for r in out.collect()}
    assert ranks[1] == 1
    assert ranks[2] == 3  # diversity beats the redundant near-clone

    # sanity: pure relevance (lam=1.0) picks the clone instead
    rel_only = vector.mmr_topk(corpus, q, "id", "v", k=2, lam=1.0)
    assert {r.rank: r.id for r in rel_only.collect()}[2] == 2


def test_pq_exact_on_separable_corners(spark):
    """Vectors placed at 4 distinct per-subspace corners: codebooks
    learn the corners exactly (zero quantization error), so ADC
    distance equals the true quantized distance and the query's own
    cluster comes back with distance 0."""
    # 2 subspaces x 2 dims; 4 groups of 3 identical vectors each
    corners = [
        [1.0, 0.0, 0.0, 1.0],
        [0.0, 1.0, 1.0, 0.0],
        [1.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 1.0],
    ]
    # interleave ids so the k=4 seeds (smallest ids) hit all 4 corners
    rows = [(i * 4 + g, corners[g]) for g in range(4) for i in range(3)]
    df = _vec_df(spark, rows)
    cb = vector.pq_train(df, "id", "v", m=2, dim=4, k=4, iters=2)
    codes = vector.pq_encode(df, "id", "v", cb, m=2, dim=4)
    got = {(r.id, r.m): r.code for r in codes.collect()}
    # same-corner vectors share codes in every subspace
    for g in range(4):
        for mi in range(2):
            assert got[(g, mi)] == got[(g + 4, mi)] == got[(g + 8, mi)]
    q = spark.createDataFrame([(corners[2],)], "qv: array<float>")
    top = vector.pq_adc_topk(q, cb, codes, "id", m=2, dim=4, k_out=3).collect()
    assert sorted(r.id for r in top) == [2, 6, 10]
    assert all(r.adc_dist == 0 for r in top)


def test_pq_adc_approximates_exact_neighbors(spark, sf_dir):
    """ADC top-10 lands inside the exact top-30 neighborhood. The
    synthetic embeddings are near-isotropic — PQ's worst case (no
    low-dimensional structure for the codebooks to exploit) — so the
    floors are modest and pinned against the deterministic corpus; on
    real embedding manifolds recall is far higher (Jegou et al. 2011)."""
    from llm_enhanced_data_pipeline_spark.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    cb = vector.pq_train(emb, "vec_id", "embedding", m=4, dim=64, k=16, iters=2)
    codes = vector.pq_encode(emb, "vec_id", "embedding", cb, m=4, dim=64)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    adc = vector.pq_adc_topk(
        q, cb, codes.filter(F.col("vec_id") != 0), "vec_id", m=4, dim=64, k_out=10
    )
    adc_ids = {r.vec_id for r in adc.collect()}
    qq = emb.filter(F.col("vec_id") == 0).select(
        vector.quantize_vec(F.col("embedding")).alias("_qa")
    )
    exact = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qq))
        .select(
            "vec_id",
            vector.sqdist_q(
                vector.quantize_vec(F.col("embedding")), F.col("_qa")
            ).alias("d"),
        )
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(30)
    )
    exact_rows = [r.vec_id for r in exact.collect()]
    assert len(adc_ids & set(exact_rows[:10])) >= 2
    assert len(adc_ids & set(exact_rows)) >= 6


def test_embedding_probe_separates_its_training_labels(spark, sf_dir):
    # the probe must actually FIRE (the oracle hash-compare would pass
    # on a degenerate all-zero w too): label 0 overwhelmingly passes,
    # label 1 overwhelmingly fails, and the two classes' score sums
    # sit on opposite sides of 0
    from llm_enhanced_data_pipeline_spark.queries import REGISTRY

    rows = {
        r["label"]: r
        for r in REGISTRY["embedding_probe_filter"].fn(spark, sf_dir).collect()
    }
    pos, neg = rows[0], rows[1]
    pos_rate = pos["n_pass"] / pos["n_vecs"]
    neg_rate = neg["n_pass"] / neg["n_vecs"]
    assert pos_rate >= 0.85            # measured 0.90 at sf0.01
    assert neg_rate <= 0.25            # measured 0.17
    assert pos_rate - neg_rate >= 0.5  # genuine separation
    assert pos["sum_score_u"] > 0 > neg["sum_score_u"]
    assert set(rows) == set(range(10))  # every label scored
