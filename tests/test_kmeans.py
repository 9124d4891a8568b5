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
