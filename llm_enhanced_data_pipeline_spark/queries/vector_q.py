"""Similarity-search queries (SURVEY.md §2.4 J4, §2.10 R4 + ANN suite).

All cosine math is double-precision in deterministic element order on
both engines; similarities are rounded to 6dp and every ranking has a
total tie-break (sim desc, id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import vector
from ..tables import load_table
from .registry import register

# DuckDB cosine(a, b) between two list columns, double precision,
# zero-norm guarded — textual twin of operators.vector.cosine_similarity.


def _cos_sql(a: str, b: str) -> str:
    na = f"sqrt(list_sum(list_transform({a}, _x -> _x::DOUBLE * _x::DOUBLE))::DOUBLE)"
    nb = f"sqrt(list_sum(list_transform({b}, _x -> _x::DOUBLE * _x::DOUBLE))::DOUBLE)"
    dt = (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"_i -> ({a})[_i]::DOUBLE * ({b})[_i]::DOUBLE))::DOUBLE"
    )
    return f"(CASE WHEN ({na} * {nb}) > 0 THEN {dt} / ({na} * {nb}) ELSE 0.0 END)"


@register(
    "cosine_topk",
    bench=True,
    doc="J4/R4: brute-force cosine top-k of one query vector against the "
    "corpus (VectorStore.search, rag.ipynb:488-530). Replicates the "
    "reference's threshold-after-top-k quirk: plain top-k.",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, round({_cos_sql('e.embedding', 'q.qv')}, 6) AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
)
SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id ASC LIMIT 5
""",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    corpus = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    scored = corpus.select(
        "vec_id",
        F.round(vector.cosine_similarity(F.col("embedding"), F.col("qv")), 6).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(5)


@register(
    "knn_brute_force",
    doc="Exact kNN join: 3 nearest neighbors for each of the first 10 "
    "vectors (broadcast corpus + per-query window top-k). Correctness "
    "baseline only — the benched headline is ivf_knn, the scale path.",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, neighbor_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT qid AS vec_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
""",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return vector.knn_join(
        queries, emb, "vec_id", "vec_id", "embedding", "embedding", k=3
    ).select("vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim")


_IVF_CENT_SQL = """
e AS (SELECT vec_id, label, embedding FROM embeddings),
dims AS (
  SELECT label AS ckey, _i, avg(embedding[_i]::DOUBLE) AS m
  FROM e, range(1, 65) r(_i)
  GROUP BY label, _i
),
cent AS (SELECT ckey, list(m ORDER BY _i) AS centroid FROM dims GROUP BY ckey)
"""


@register(
    "ivf_assignments",
    doc="IVF build: per-label mean centroids (distributed elementwise "
    "avg, no driver collect) + max-cosine assignment of every vector.",
    oracle=f"""
WITH {_IVF_CENT_SQL},
assign AS (
  SELECT vec_id, ckey FROM (
    SELECT e.vec_id, c.ckey,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.embedding', 'c.centroid')} DESC,
                                       c.ckey ASC) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn = 1
)
SELECT vec_id, ckey AS cluster FROM assign
""",
)
def ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cents = vector.centroids_by_key(emb, "label", "embedding")
    assigned = vector.ivf_assign(emb, cents, "vec_id", "embedding")
    return assigned.select("vec_id", F.col("ckey").alias("cluster"))


@register(
    "ivf_knn",
    bench=True,
    doc="IVF-routed approximate kNN (nprobe=1): query + corpus bucketed "
    "by nearest centroid, exact kNN inside the bucket — the equi-join "
    "scale path for similarity search.",
    oracle=f"""
WITH {_IVF_CENT_SQL},
assign AS (
  SELECT vec_id, embedding, ckey FROM (
    SELECT e.vec_id, e.embedding, c.ckey,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.embedding', 'c.centroid')} DESC,
                                       c.ckey ASC) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, embedding AS qv, ckey FROM assign WHERE vec_id < 10),
scored AS (
  SELECT q.qid, a.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'a.embedding')}, 6) AS sim
  FROM q JOIN assign a ON q.ckey = a.ckey AND a.vec_id <> q.qid
),
ranked AS (
  SELECT qid, neighbor_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT qid AS vec_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
""",
)
def ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cents = vector.centroids_by_key(emb, "label", "embedding")
    queries = emb.filter(F.col("vec_id") < 10)
    out = vector.ivf_knn_join(
        queries, emb, cents, "vec_id", "vec_id", "embedding", "embedding", k=3
    )
    return out.select(
        "vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim"
    )


@register(
    "hard_negative_mining",
    doc="Hard-negative mining for retrieval training (DPR/ANCE): per "
    "query, top-5 most-similar OTHER-label vectors via the IVF bucket "
    "equi-join — same-group candidates excluded before ranking so a "
    "positive can never be mined as a negative.",
    oracle=f"""
WITH {_IVF_CENT_SQL},
assign AS (
  SELECT vec_id, label, embedding, ckey FROM (
    SELECT e.vec_id, e.label, e.embedding, c.ckey,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.embedding', 'c.centroid')} DESC,
                                       c.ckey ASC) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, label AS qlab, embedding AS qv, ckey
      FROM assign WHERE vec_id % 25 = 0),
scored AS (
  SELECT q.qid, a.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'a.embedding')}, 6) AS sim
  FROM q JOIN assign a ON q.ckey = a.ckey AND a.label <> q.qlab
),
ranked AS (
  SELECT qid, neighbor_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT qid AS vec_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cents = vector.centroids_by_key(emb, "label", "embedding")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    out = vector.hard_negatives(
        queries, emb, cents, "vec_id", "vec_id", "embedding", "embedding",
        "label", "label", k=5,
    )
    return out.select(
        "vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim"
    )


@register(
    "rag_context_assembly",
    doc="R5: top-3 retrieved docs for the query vector, formatted into "
    "the numbered '[Doc i]' context block (rag.ipynb:720-733).",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, round({_cos_sql('e.embedding', 'q.qv')}, 6) AS sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
),
top AS (
  SELECT vec_id, sim, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored QUALIFY rank <= 3
)
SELECT string_agg(
         '[Doc ' || rank::VARCHAR || '] ' || substring(d.text, 1, 80) ||
         ' (sim=' || format('{{:.4f}}', sim) || ')',
         chr(10) ORDER BY rank) AS context
FROM top JOIN documents d ON d.doc_id = top.vec_id
""",
)
def rag_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(vector.cosine_similarity(F.col("embedding"), F.col("qv")), 6).alias(
                "sim"
            ),
        )
    )
    top = (
        scored.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(3)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())),
        )
    )
    joined = top.join(docs, top.vec_id == docs.doc_id)
    line = F.concat(
        F.lit("[Doc "),
        F.col("rank").cast("string"),
        F.lit("] "),
        F.substring(F.col("text"), 1, 80),
        F.lit(" (sim="),
        F.format_number(F.col("sim"), 4),
        F.lit(")"),
    )
    return joined.select("rank", line.alias("line")).groupBy().agg(
        F.concat_ws(
            "\n", F.transform(F.array_sort(F.collect_list(F.struct("rank", "line"))), lambda s: s["line"])
        ).alias("context")
    )


# ---------------------------------------------------------------------------
# K-means IVF training (beyond-reference ANN suite): Lloyd's iterations
# over the integer-quantized grid (operators.vector.kmeans_*). The
# DuckDB twin unrolls the iterations as a generated CTE chain — every
# assignment and mean update is exact int64 arithmetic, so the two
# engines agree bit-for-bit despite distributed float-sum ordering.


def _kmeans_ctes(
    k: int | str = 8,
    iters: int = 3,
    dim: int = 64,
    vec: str = "embedding",
    sfx: str = "",
    relation: str = "embeddings",
) -> list[str]:
    """The shared Lloyd's-iteration CTE chain: e (quantized vectors),
    c0..c{iters} (centroid frames). Reused by the training gate, the
    trained-serving gate, (per-subspace, via ``vec``/``sfx``) the
    product-quantization gates, and (via ``relation`` + a scalar-
    subquery ``k``) the sampled-slice semdedup twin."""
    parts = [
        f"e{sfx} AS (SELECT vec_id, {vector.quantize_vec_sql(vec)} AS q FROM {relation})",
        f"c0{sfx} AS (SELECT vec_id::INT AS cid, q AS cent FROM e{sfx} WHERE vec_id < {k})",
    ]
    for i in range(iters):
        parts.append(
            f"""a{i}{sfx} AS (
  SELECT vec_id, q, cid FROM (
    SELECT e.vec_id, e.q, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {vector.sqdist_q_sql('e.q', 'c.cent')} ASC,
                                       c.cid ASC) AS rn
    FROM e{sfx} e CROSS JOIN c{i}{sfx} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""c{i + 1}{sfx} AS (
  SELECT cid, list(m ORDER BY _i) AS cent FROM (
    SELECT cid, _i, (sum(q[_i]) // count(*))::BIGINT AS m
    FROM a{i}{sfx}, range(1, {dim + 1}) r(_i) GROUP BY cid, _i) GROUP BY cid)"""
        )
    return parts


def _kmeans_sql(
    k: int = 8, iters: int = 3, dim: int = 64, relation: str = "embeddings"
) -> str:
    parts = _kmeans_ctes(k, iters, dim, relation=relation)
    return f"""
WITH {','.join(parts)},
af AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {vector.sqdist_q_sql('e.q', 'c.cent')} ASC,
                                       c.cid ASC) AS rn
    FROM e CROSS JOIN c{iters} c) WHERE rn = 1)
SELECT a.cid AS cluster,
       count(*)::BIGINT AS n_members,
       min(s.centroid_sum) AS centroid_sum,
       min(s.centroid_fp) AS centroid_fp
FROM af a
JOIN (SELECT cid, list_sum(cent)::BIGINT AS centroid_sum,
             md5(array_to_string(cent, ',')) AS centroid_fp
      FROM c{iters}) s ON s.cid = a.cid
GROUP BY a.cid
"""


@register(
    "kmeans_train",
    doc="IVF centroid training: 3 Lloyd's iterations, k=8, integer-"
    "quantized grid (floor(x*1e6)+2e6) so assignment and mean updates "
    "are engine-exact int64 arithmetic. Seeds = vectors of the 8 "
    "smallest ids. Output: per-cluster size + exact centroid "
    "fingerprint. `dequantize_centroids` bridges the result straight "
    "into ivf_assign/ivf_knn_join for serving.",
    oracle=_kmeans_sql(),
)
def kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    assigned, cents = vector.kmeans_train_quantized(
        emb, "vec_id", "embedding", k=8, iters=3
    )
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    cstats = cents.select(
        "cid",
        F.aggregate(
            "_cent", F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("centroid_sum"),
        F.md5(
            F.concat_ws(",", F.transform("_cent", lambda v: v.cast("string")))
        ).alias("centroid_fp"),
    )
    return sizes.join(cstats, "cid").select(
        F.col("cid").alias("cluster"), "n_members", "centroid_sum", "centroid_fp"
    )


@register(
    "ivf_knn_trained",
    doc="End-to-end learned ANN: k-means-trained centroids (the exact "
    "integer-grid Lloyd's chain) dequantized into the IVF serving path "
    "— queries and corpus bucketed by nearest trained centroid, exact "
    "kNN inside the bucket. The full train->serve lineage is one "
    "oracle-checked query.",
    oracle=f"""
WITH {','.join(_kmeans_ctes(k=8, iters=3, dim=64))},
dq AS (
  SELECT cid AS ckey,
         list_transform(cent, _x -> (_x - {vector.Q_OFFSET})::DOUBLE / {vector.Q_SCALE}) AS centroid
  FROM c3
),
assign AS (
  SELECT vec_id, embedding, ckey FROM (
    SELECT v.vec_id, v.embedding, c.ckey,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_sql('v.embedding', 'c.centroid')} DESC,
                                       c.ckey ASC) AS rn
    FROM embeddings v CROSS JOIN dq c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, embedding AS qv, ckey FROM assign WHERE vec_id < 10),
scored AS (
  SELECT q.qid, a.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'a.embedding')}, 6) AS sim
  FROM q JOIN assign a ON a.ckey = q.ckey AND a.vec_id <> q.qid
),
ranked AS (
  SELECT qid, neighbor_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT qid AS vec_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
""",
)
def ivf_knn_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    _, cents = vector.kmeans_train_quantized(emb, "vec_id", "embedding", k=8, iters=3)
    serving = vector.dequantize_centroids(cents)
    out = vector.ivf_knn_join(
        emb.filter(F.col("vec_id") < 10),
        emb,
        serving,
        "vec_id",
        "vec_id",
        "embedding",
        "embedding",
        k=3,
    )
    return out.select(
        "vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim"
    )


# ---------------------------------------------------------------------------
# MMR diversified retrieval: the oracle unrolls the k greedy rounds as
# a materialized CTE chain. Score literals are emitted with full repr
# so both engines compute with bit-identical doubles.


def _mmr_sql(k: int = 5, lam: float = 0.7, relation: str = "embeddings") -> str:
    a, b = repr(lam), repr(1.0 - lam)
    parts = [
        f"q AS MATERIALIZED (SELECT embedding AS qv FROM {relation} WHERE vec_id = 0)",
        f"""c0 AS MATERIALIZED (
  SELECT e.vec_id, e.embedding AS v,
         round({_cos_sql('e.embedding', 'q.qv')}, 6) AS rel,
         -1.0 AS mmax
  FROM {relation} e CROSS JOIN q WHERE e.vec_id <> 0)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT vec_id, v, round({a} * rel - {b} * mmax, 6) AS score
  FROM c{i - 1} ORDER BY score DESC, vec_id ASC LIMIT 1)"""
        )
        if i < k:
            parts.append(
                f"""c{i} AS MATERIALIZED (
  SELECT c.vec_id, c.v, c.rel,
         greatest(c.mmax, round({_cos_sql('c.v', 's.v')}, 6)) AS mmax
  FROM c{i - 1} c CROSS JOIN s{i} s WHERE c.vec_id <> s.vec_id)"""
            )
    union = "\nUNION ALL ".join(
        f"SELECT vec_id, {i}::INT AS rank, score FROM s{i}" for i in range(1, k + 1)
    )
    return f"WITH {','.join(parts)}\n{union}"


@register(
    "mmr_rerank",
    doc="Maximal Marginal Relevance diversified top-5 (Carbonell & "
    "Goldstein 1998), lambda=0.7: greedy relevance-vs-redundancy "
    "selection over the corpus, fully lazy (each round is a 1-row "
    "argmax broadcast back over the remaining candidates — no driver "
    "loop state). Upgrades the reference's undiversified "
    "VectorStore.search top-k (RAG/rag.ipynb).",
    oracle=_mmr_sql(),
)
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import vector

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    corpus = emb.filter(F.col("vec_id") != 0)
    return vector.mmr_topk(corpus, q, "vec_id", "embedding", k=5, lam=0.7)


# ---------------------------------------------------------------------------
# Product quantization: per-subspace Lloyd's chains (the generalized
# _kmeans_ctes with a sliced vector expression), exact-int asymmetric-
# distance scoring. No rounding anywhere — distances are int64.


def _pq_sql(
    m: int = 4,
    dim: int = 64,
    k: int = 16,
    iters: int = 2,
    k_out: int = 10,
    relation: str = "embeddings",
) -> str:
    subdim = dim // m
    parts: list[str] = []
    for mi in range(m):
        lo, hi = mi * subdim + 1, (mi + 1) * subdim
        parts += _kmeans_ctes(
            k=k, iters=iters, dim=subdim, vec=f"embedding[{lo}:{hi}]",
            sfx=f"s{mi}", relation=relation,
        )
        parts.append(
            f"""af_s{mi} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {vector.sqdist_q_sql('e.q', 'c.cent')} ASC,
                                       c.cid ASC) AS rn
    FROM es{mi} e CROSS JOIN c{iters}s{mi} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""d_s{mi} AS (
  SELECT c.cid AS code, {vector.sqdist_q_sql('q.q', 'c.cent')} AS d
  FROM c{iters}s{mi} c
  CROSS JOIN (SELECT q FROM es{mi} WHERE vec_id = 0) q)"""
        )
    return f"""
WITH {','.join(parts)}
SELECT vec_id, (dd0.d + dd1.d + dd2.d + dd3.d)::BIGINT AS adc_dist
FROM af_s0 a0
JOIN af_s1 a1 USING (vec_id)
JOIN af_s2 a2 USING (vec_id)
JOIN af_s3 a3 USING (vec_id)
JOIN d_s0 dd0 ON dd0.code = a0.cid
JOIN d_s1 dd1 ON dd1.code = a1.cid
JOIN d_s2 dd2 ON dd2.code = a2.cid
JOIN d_s3 dd3 ON dd3.code = a3.cid
WHERE vec_id <> 0
ORDER BY adc_dist ASC, vec_id ASC LIMIT {k_out}
"""


@register(
    "pq_adc_knn",
    doc="Product-quantization ANN (Jegou et al. 2011): 4 subspace "
    "codebooks (k=16) trained with the integer-grid Lloyd's chain, "
    "corpus encoded to 4 codes/vector, and asymmetric-distance top-10 "
    "for the query — the m*k exact-int distance table broadcasts, so "
    "query-time work is one equi-join + one aggregation over the "
    "compressed corpus; full-precision vectors are never touched at "
    "query time. Everything is exact int64 arithmetic.",
    oracle=_pq_sql(),
)
def pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cb = vector.pq_train(emb, "vec_id", "embedding", m=4, dim=64, k=16, iters=2)
    codes = vector.pq_encode(emb, "vec_id", "embedding", cb, m=4, dim=64)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return vector.pq_adc_topk(
        q,
        cb,
        codes.filter(F.col("vec_id") != 0),
        "vec_id",
        m=4,
        dim=64,
        k_out=10,
    )


@register(
    "ann_recall_report",
    doc="ANN index quality evaluation: recall@10 of the IVF-routed "
    "search against the exact brute-force ground truth, per query. "
    "The ground-truth side is quadratic BY DESIGN over a small query "
    "sample (the standard ANN eval harness); the index side is the "
    "production bucket equi-join.",
    oracle=f"""
WITH {_IVF_CENT_SQL},
q AS (SELECT vec_id AS qid, embedding AS qv FROM e WHERE vec_id % 25 = 0),
exact AS (
  SELECT qid, neighbor_id, rank FROM (
    SELECT q.qid, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY round({_cos_sql('q.qv', 'e.embedding')}, 6) DESC,
                                       e.vec_id ASC) AS rank
    FROM q CROSS JOIN e WHERE e.vec_id <> q.qid
  ) WHERE rank <= 10
),
assign AS (
  SELECT vec_id, embedding, ckey FROM (
    SELECT e.vec_id, e.embedding, c.ckey,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.embedding', 'c.centroid')} DESC,
                                       c.ckey ASC) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn = 1
),
aq AS (SELECT a.vec_id AS qid, a.embedding AS qv, a.ckey
       FROM assign a WHERE a.vec_id % 25 = 0),
approx AS (
  SELECT qid, neighbor_id FROM (
    SELECT aq.qid, a.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY aq.qid
                              ORDER BY round({_cos_sql('aq.qv', 'a.embedding')}, 6) DESC,
                                       a.vec_id ASC) AS rank
    FROM aq JOIN assign a ON aq.ckey = a.ckey AND a.vec_id <> aq.qid
  ) WHERE rank <= 10
),
hits AS (
  SELECT exact.qid, count(*)::BIGINT AS n_hits
  FROM exact SEMI JOIN approx
    ON exact.qid = approx.qid AND exact.neighbor_id = approx.neighbor_id
  GROUP BY exact.qid
),
base AS (SELECT qid, count(*)::BIGINT AS n_exact FROM exact GROUP BY qid)
SELECT base.qid AS vec_id, base.n_exact,
       coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
       floor((coalesce(hits.n_hits, 0) / base.n_exact) * 10000.0 + 0.5) / 10000.0
         AS recall
FROM base LEFT JOIN hits ON base.qid = hits.qid
""",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import stable_round

    emb = load_table(spark, "embeddings", sf_dir)
    cents = vector.centroids_by_key(emb, "label", "embedding")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    exact = vector.knn_join(
        qs, emb, "vec_id", "vec_id", "embedding", "embedding", k=10
    )
    approx = vector.ivf_knn_join(
        qs, emb, cents, "vec_id", "vec_id", "embedding", "embedding", k=10
    ).select("vec_id", "neighbor_id")
    hits = (
        exact.join(approx, ["vec_id", "neighbor_id"], "left_semi")
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = exact.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return base.join(hits, "vec_id", "left").select(
        "vec_id",
        "n_exact",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        stable_round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_exact"), 4
        ).alias("recall"),
    )


@register(
    "ivf_bucket_stats",
    doc="IVF index-quality report: per-bucket fill (count + share) and "
    "cohesion (mean cosine to own centroid) — the numbers that decide "
    "nprobe and whether the coarse quantizer needs retraining "
    "(under-filled buckets waste probes, low-cohesion buckets leak "
    "recall). Broadcast centroid scoring + one keyed agg; the share "
    "denominator is a window over the K-row aggregate.",
    oracle=f"""
WITH {_IVF_CENT_SQL},
assign AS (
  SELECT vec_id, embedding, ckey FROM (
    SELECT e.vec_id, e.embedding, c.ckey,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.embedding', 'c.centroid')} DESC,
                                       c.ckey ASC) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn = 1
),
per AS (
  SELECT a.ckey AS cluster,
         count(*)::BIGINT AS n_vecs,
         {{mean_sim}} AS mean_sim
  FROM assign a JOIN cent c ON c.ckey = a.ckey
  GROUP BY a.ckey
)
SELECT cluster, n_vecs, mean_sim,
       ((1000 * n_vecs) // sum(n_vecs) OVER ())::BIGINT AS share_permille
FROM per
""".replace(
        "{mean_sim}",
        __import__(
            "llm_enhanced_data_pipeline_spark.functions.rounding",
            fromlist=["stable_round_sql"],
        ).stable_round_sql(
            f"avg({_cos_sql('a.embedding', 'c.centroid')})", 6
        ),
    ),
)
def ivf_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import stable_round

    emb = load_table(spark, "embeddings", sf_dir)
    cents = vector.centroids_by_key(emb, "label", "embedding")
    assigned = vector.ivf_assign(emb, cents, "vec_id", "embedding")
    sim = vector.cosine_similarity(F.col("embedding"), F.col("centroid"))
    per = (
        assigned.join(cents, "ckey")
        .groupBy(F.col("ckey").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            stable_round(F.avg(sim), 6).alias("mean_sim"),
        )
    )
    # integer floor-div against the window total: double division +
    # cast can land a hair under an exact integer and truncate low
    return per.withColumn(
        "_tot", F.sum("n_vecs").over(Window.partitionBy())
    ).select(
        "cluster",
        "n_vecs",
        "mean_sim",
        F.expr("cast(1000 * n_vecs div _tot as bigint)").alias("share_permille"),
    )


# ---------------------------------------------------------------------------
# sf0.1-sweep slice twins (r11 verdict item 3): the ANN gates' oracles
# are all-pairs / iterative-CTE quadratic, tractable in DuckDB only at
# sf0.01 — so the full gates were deselected from the sf0.1 sweep and
# the family had ZERO oracle coverage at 10x scale. These twins run
# the SAME lineages over the first-500-vec_id slice of whatever table
# the sweep points at: deterministic, seed-safe (kmeans seeds ids < 8
# and the query sets ids < 10 / % 25 are always inside the slice), and
# the oracle stays at driver-checking scale while the sweep verifies
# the lineage against the sf0.1 data files. The unbounded-scale COST
# law is scale_smoke's job (ivf_knn / kmeans_train / mmr slots); these
# close the correctness half of the blind spot.

_SLICE_N = 500
_EMB_S = f"(SELECT * FROM embeddings WHERE vec_id < {_SLICE_N})"


def _sliced_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") < _SLICE_N
    )


@register(
    "knn_brute_force_sliced",
    doc="knn_brute_force over the first-500-id slice — the sf0.1-sweep "
    "twin of the full gate (whose all-pairs oracle is sf0.01-only). "
    "Same operator, same lineage.",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM {_EMB_S} WHERE vec_id < 10),
scored AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'e.embedding')}, 6) AS sim
  FROM q JOIN {_EMB_S} e ON e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, neighbor_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT qid AS vec_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
""",
)
def knn_brute_force_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _sliced_emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return vector.knn_join(
        queries, emb, "vec_id", "vec_id", "embedding", "embedding", k=3
    ).select("vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim")


@register(
    "kmeans_train_sliced",
    doc="kmeans_train over the first-500-id slice — the sf0.1-sweep "
    "twin (the full gate's iterative-CTE oracle is sf0.01-only). "
    "Same integer-grid Lloyd's chain, k=8, 3 iterations.",
    oracle=_kmeans_sql(relation=_EMB_S),
)
def kmeans_train_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _sliced_emb(spark, sf_dir)
    assigned, cents = vector.kmeans_train_quantized(
        emb, "vec_id", "embedding", k=8, iters=3
    )
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    cstats = cents.select(
        "cid",
        F.aggregate(
            "_cent", F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("centroid_sum"),
        F.md5(
            F.concat_ws(",", F.transform("_cent", lambda v: v.cast("string")))
        ).alias("centroid_fp"),
    )
    return sizes.join(cstats, "cid").select(
        F.col("cid").alias("cluster"), "n_members", "centroid_sum", "centroid_fp"
    )


@register(
    "ivf_knn_trained_sliced",
    doc="ivf_knn_trained over the first-500-id slice — the sf0.1-sweep "
    "twin of the full train->serve gate. Same lineage end to end.",
    oracle=f"""
WITH {','.join(_kmeans_ctes(k=8, iters=3, dim=64, relation=_EMB_S))},
dq AS (
  SELECT cid AS ckey,
         list_transform(cent, _x -> (_x - {vector.Q_OFFSET})::DOUBLE / {vector.Q_SCALE}) AS centroid
  FROM c3
),
assign AS (
  SELECT vec_id, embedding, ckey FROM (
    SELECT v.vec_id, v.embedding, c.ckey,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_sql('v.embedding', 'c.centroid')} DESC,
                                       c.ckey ASC) AS rn
    FROM {_EMB_S} v CROSS JOIN dq c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, embedding AS qv, ckey FROM assign WHERE vec_id < 10),
scored AS (
  SELECT q.qid, a.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'a.embedding')}, 6) AS sim
  FROM q JOIN assign a ON a.ckey = q.ckey AND a.vec_id <> q.qid
),
ranked AS (
  SELECT qid, neighbor_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT qid AS vec_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
""",
)
def ivf_knn_trained_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _sliced_emb(spark, sf_dir)
    _, cents = vector.kmeans_train_quantized(emb, "vec_id", "embedding", k=8, iters=3)
    serving = vector.dequantize_centroids(cents)
    out = vector.ivf_knn_join(
        emb.filter(F.col("vec_id") < 10),
        emb,
        serving,
        "vec_id",
        "vec_id",
        "embedding",
        "embedding",
        k=3,
    )
    return out.select(
        "vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim"
    )


@register(
    "pq_adc_knn_sliced",
    doc="pq_adc_knn over the first-500-id slice — the sf0.1-sweep twin "
    "of the full gate. Same 4-subspace codebooks, same exact-int "
    "asymmetric-distance scoring.",
    oracle=_pq_sql(relation=_EMB_S),
)
def pq_adc_knn_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _sliced_emb(spark, sf_dir)
    cb = vector.pq_train(emb, "vec_id", "embedding", m=4, dim=64, k=16, iters=2)
    codes = vector.pq_encode(emb, "vec_id", "embedding", cb, m=4, dim=64)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return vector.pq_adc_topk(
        q,
        cb,
        codes.filter(F.col("vec_id") != 0),
        "vec_id",
        m=4,
        dim=64,
        k_out=10,
    )


@register(
    "ann_recall_report_sliced",
    doc="ann_recall_report over the first-500-id slice — the sf0.1-"
    "sweep twin of the full gate (whose exact-ground-truth side is "
    "quadratic by design). Same IVF-vs-brute recall@10 recipe.",
    oracle=f"""
WITH e AS (SELECT vec_id, label, embedding FROM {_EMB_S}),
dims AS (
  SELECT label AS ckey, _i, avg(embedding[_i]::DOUBLE) AS m
  FROM e, range(1, 65) r(_i)
  GROUP BY label, _i
),
cent AS (SELECT ckey, list(m ORDER BY _i) AS centroid FROM dims GROUP BY ckey),
q AS (SELECT vec_id AS qid, embedding AS qv FROM e WHERE vec_id % 25 = 0),
exact AS (
  SELECT qid, neighbor_id, rank FROM (
    SELECT q.qid, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY round({_cos_sql('q.qv', 'e.embedding')}, 6) DESC,
                                       e.vec_id ASC) AS rank
    FROM q CROSS JOIN e WHERE e.vec_id <> q.qid
  ) WHERE rank <= 10
),
assign AS (
  SELECT vec_id, embedding, ckey FROM (
    SELECT e.vec_id, e.embedding, c.ckey,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.embedding', 'c.centroid')} DESC,
                                       c.ckey ASC) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn = 1
),
aq AS (SELECT a.vec_id AS qid, a.embedding AS qv, a.ckey
       FROM assign a WHERE a.vec_id % 25 = 0),
approx AS (
  SELECT qid, neighbor_id FROM (
    SELECT aq.qid, a.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY aq.qid
                              ORDER BY round({_cos_sql('aq.qv', 'a.embedding')}, 6) DESC,
                                       a.vec_id ASC) AS rank
    FROM aq JOIN assign a ON aq.ckey = a.ckey AND a.vec_id <> aq.qid
  ) WHERE rank <= 10
),
hits AS (
  SELECT exact.qid, count(*)::BIGINT AS n_hits
  FROM exact SEMI JOIN approx
    ON exact.qid = approx.qid AND exact.neighbor_id = approx.neighbor_id
  GROUP BY exact.qid
),
base AS (SELECT qid, count(*)::BIGINT AS n_exact FROM exact GROUP BY qid)
SELECT base.qid AS vec_id, base.n_exact,
       coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
       floor((coalesce(hits.n_hits, 0) / base.n_exact) * 10000.0 + 0.5) / 10000.0
         AS recall
FROM base LEFT JOIN hits ON base.qid = hits.qid
""",
)
def ann_recall_report_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import stable_round

    emb = _sliced_emb(spark, sf_dir)
    cents = vector.centroids_by_key(emb, "label", "embedding")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    exact = vector.knn_join(
        qs, emb, "vec_id", "vec_id", "embedding", "embedding", k=10
    )
    approx = vector.ivf_knn_join(
        qs, emb, cents, "vec_id", "vec_id", "embedding", "embedding", k=10
    ).select("vec_id", "neighbor_id")
    hits = (
        exact.join(approx, ["vec_id", "neighbor_id"], "left_semi")
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = exact.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return base.join(hits, "vec_id", "left").select(
        "vec_id",
        "n_exact",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        stable_round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_exact"), 4
        ).alias("recall"),
    )


@register(
    "mmr_rerank_sliced",
    doc="mmr_rerank over the first-500-id slice — the sf0.1-sweep twin "
    "(the greedy rounds' per-candidate redundancy scan is corpus-wide "
    "per round in DuckDB). Same lambda, same 5 greedy rounds.",
    oracle=_mmr_sql(relation=_EMB_S),
)
def mmr_rerank_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _sliced_emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    corpus = emb.filter(F.col("vec_id") != 0)
    return vector.mmr_topk(corpus, q, "vec_id", "embedding", k=5, lam=0.7)


# ---------------------------------------------------------------------------
# Embedding linear-probe quality filtering — the FineWeb-Edu / DCLM
# shape: a tiny classifier over document embeddings decides what joins
# the training corpus. Here the classifier is the exact-arithmetic
# mean-difference probe (w = mean(positive class) - mean(negative
# class) on the integer-quantized grid), trained IN the engine with
# one aggregation and applied with one broadcast — no model server in
# the scoring path, which is the only way classifier filtering works
# at 100 TB.


@register(
    "embedding_probe_filter",
    doc="Embedding linear-probe filter (the FineWeb-Edu/DCLM "
    "classifier-filtering shape, exact-integer): probe weights = "
    "per-dimension mean difference between label-0 (positive) and "
    "label-1 (negative) vectors on the kmeans integer grid (floor "
    "divisions; one explode + one 64-group aggregation, then a 64-row "
    "fold into a single broadcast array); every vector scored by the "
    "offset-centered bigint dot product (deterministic array fold — "
    "no float-summation hazard) and gated at score >= 0. Per-label "
    "report: n_vecs, n_pass, exact score sum. The probe must fire: "
    "label 0 passes, label 1 fails (pinned by test).",
    oracle=f"""
WITH qv AS (
  SELECT vec_id, label, {vector.quantize_vec_sql('embedding')} AS q
  FROM embeddings
),
dims AS (
  SELECT _i,
         (sum(CASE WHEN label = 0 THEN q[_i] END)::BIGINT
            // count(CASE WHEN label = 0 THEN 1 END))
         - (sum(CASE WHEN label = 1 THEN q[_i] END)::BIGINT
            // count(CASE WHEN label = 1 THEN 1 END)) AS w
  FROM qv, range(1, 65) r(_i)
  WHERE label IN (0, 1)
  GROUP BY _i
),
wrow AS (SELECT list(w ORDER BY _i) AS warr FROM dims),
scored AS (
  SELECT label,
         list_sum(list_transform(range(1, 65),
           _i -> (q[_i] - {vector.Q_OFFSET}) * warr[_i]))::BIGINT AS score_u
  FROM qv CROSS JOIN wrow
)
SELECT label::BIGINT AS label, count(*)::BIGINT AS n_vecs,
       sum(CASE WHEN score_u >= 0 THEN 1 ELSE 0 END)::BIGINT AS n_pass,
       sum(score_u)::BIGINT AS sum_score_u
FROM scored GROUP BY label
""",
)
def embedding_probe_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", vector.quantize_vec(F.col("embedding")).alias("q")
    )
    wrow = vector.probe_weights_row(emb)
    scored = emb.crossJoin(F.broadcast(wrow)).select(
        "label",
        vector.probe_score(F.col("q"), F.col("warr")).alias("score_u"),
    )
    return scored.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.when(F.col("score_u") >= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        F.sum("score_u").cast("bigint").alias("sum_score_u"),
    )
