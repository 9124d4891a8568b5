"""Embedding adapters (SURVEY.md §2.10 R2).

The reference's embedding stack: sentence-transformers
`all-MiniLM-L6-v2` (batch 32) with an API fallback and a deterministic
TF-vector fallback (rag.ipynb `EmbeddingModel`, source lines 313-444).

Here the model path is an Arrow-batched ``mapInPandas`` adapter that
loads the model once per partition (executor-local); the deterministic
TF fallback lives in queries/rag_q.py as pure DataFrame ops (the
testable default — the model libraries are not in this container, so
`sentence_transformer_embedder` gates on import and raises a clear
error when unavailable; the Spark-side plumbing is identical either
way).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def embed_with(
    df: DataFrame,
    id_col: str,
    text_col: str,
    batch_embed: Callable[[list[str]], list[list[float]]],
    batch_size: int = 32,
) -> DataFrame:
    """(id, embedding) via any batched embedding function. The function
    is created lazily inside the partition (models must not be pickled
    from the driver); Arrow carries the float batches back."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            vectors: list[list[float]] = []
            for i in range(0, len(texts), batch_size):
                vectors.extend(batch_embed(texts[i : i + batch_size]))
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "embedding": vectors})

    return df.select(id_col, text_col).mapInPandas(run, schema)


def sentence_transformer_embedder(
    model_name: str = "all-MiniLM-L6-v2",
) -> Callable[[list[str]], list[list[float]]]:  # pragma: no cover - model lib absent
    """Batched sentence-transformers embedder (the reference's default
    model). Import-gated: raises with a clear message when the library
    is not installed; the TF fallback (queries/rag_q.tf_embeddings) is
    the deterministic substitute."""
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:
        raise NotImplementedError(
            "sentence-transformers is not installed in this environment; "
            "use the deterministic TF fallback (queries/rag_q) or install "
            "the model library on the executors"
        ) from e
    model = SentenceTransformer(model_name)

    def embed(texts: list[str]) -> list[list[float]]:
        return [list(map(float, v)) for v in model.encode(texts, batch_size=len(texts))]

    return embed


def vendored_transformer_embedder(
    dim: int = 384,
    n_layers: int = 2,
    n_heads: int = 4,
    vocab: int = 2048,
    max_len: int = 64,
    seed: int = 0,
) -> Callable[[list[str]], list[list[float]]]:
    """Vendored numpy transformer encoder — a REAL batched model for the
    ``embed_with`` adapter at the reference's dims (all-MiniLM-L6-v2 is
    384-d; rag.ipynb `EmbeddingModel`, source lines 313-444, batch 32),
    runnable in this container (no model libraries shipped).

    Architecture: hashed-vocab token ids -> learned-shape token + position
    embeddings -> ``n_layers`` pre-LN transformer blocks (multi-head
    self-attention + GELU MLP, residual) -> masked mean-pool -> L2
    normalize. Weights are FIXED pseudo-random (seeded PCG64), so the
    model is untrained but deterministic across processes, platforms,
    and partitionings — unlike the TF/hash fallbacks it genuinely mixes
    tokens through attention (order-sensitive, context-sensitive),
    exercising the adapter end-to-end with realistic batch shapes.

    Batch-shape invariance: pad KEYS are masked to exact-zero attention
    weight and pooling is masked, so a text's vector does not depend on
    its batch neighbors (verified to fp tolerance in test_enrich).

    Weights build lazily on first call INSIDE the executor (the factory
    closure pickles only the config), matching the contract that models
    are never shipped from the driver.
    """
    cfg = (dim, n_layers, n_heads, vocab, max_len, seed)
    state: dict[str, object] = {}

    def _weights():
        import numpy as np

        if "w" in state:
            return state["w"]
        d, L, H, V, M, s = cfg
        rng = np.random.default_rng(s)

        def mat(*shape):
            return (rng.standard_normal(shape) * 0.02).astype(np.float32)

        w = {
            "emb": mat(V, d),
            "pos": mat(M, d),
            "layers": [
                {
                    "wq": mat(d, d), "wk": mat(d, d), "wv": mat(d, d),
                    "wo": mat(d, d),
                    "ln1g": np.ones(d, np.float32), "ln1b": np.zeros(d, np.float32),
                    "w1": mat(d, 4 * d), "b1": np.zeros(4 * d, np.float32),
                    "w2": mat(4 * d, d), "b2": np.zeros(d, np.float32),
                    "ln2g": np.ones(d, np.float32), "ln2b": np.zeros(d, np.float32),
                }
                for _ in range(L)
            ],
        }
        state["w"] = w
        return w

    def embed(texts: list[str]) -> list[list[float]]:
        import hashlib

        import numpy as np

        d, n_l, H, V, M, _ = cfg
        dh = d // H
        w = _weights()

        ids_list = []
        for t in texts:
            toks = (t or "").lower().split()[:M]
            ids_list.append(
                [int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % V for tok in toks]
            )
        B = len(texts)
        Lmax = max((len(i) for i in ids_list), default=0)
        if Lmax == 0:
            return [[0.0] * d for _ in texts]
        ids = np.zeros((B, Lmax), np.int64)
        mask = np.zeros((B, Lmax), np.float32)  # 1 = real token
        for r, i in enumerate(ids_list):
            ids[r, : len(i)] = i
            mask[r, : len(i)] = 1.0

        def ln(x, g, b):
            mu = x.mean(-1, keepdims=True)
            var = x.var(-1, keepdims=True)
            return (x - mu) / np.sqrt(var + 1e-5) * g + b

        x = w["emb"][ids] + w["pos"][:Lmax]  # (B, L, d)
        neg = np.float32(-1e9)
        key_bias = (1.0 - mask)[:, None, None, :] * neg  # (B,1,1,L)
        for lw in w["layers"]:
            h = ln(x, lw["ln1g"], lw["ln1b"])
            q = (h @ lw["wq"]).reshape(B, Lmax, H, dh).transpose(0, 2, 1, 3)
            k = (h @ lw["wk"]).reshape(B, Lmax, H, dh).transpose(0, 2, 1, 3)
            v = (h @ lw["wv"]).reshape(B, Lmax, H, dh).transpose(0, 2, 1, 3)
            scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(np.float32(dh))
            scores = scores + key_bias  # pad keys -> ~zero weight
            scores = scores - scores.max(-1, keepdims=True)
            p = np.exp(scores)
            p = p * mask[:, None, None, :]  # exact zero on pad keys
            p = p / np.maximum(p.sum(-1, keepdims=True), 1e-9)
            att = (p @ v).transpose(0, 2, 1, 3).reshape(B, Lmax, d)
            x = x + att @ lw["wo"]
            h = ln(x, lw["ln2g"], lw["ln2b"])
            u = h @ lw["w1"] + lw["b1"]
            gelu = 0.5 * u * (1.0 + np.tanh(0.7978845608 * (u + 0.044715 * u**3)))
            x = x + gelu @ lw["w2"] + lw["b2"]
        pooled = (x * mask[:, :, None]).sum(1) / np.maximum(
            mask.sum(1, keepdims=True), 1.0
        )
        norms = np.sqrt((pooled * pooled).sum(-1, keepdims=True))
        pooled = pooled / np.maximum(norms, 1e-12)
        return [list(map(float, row)) for row in pooled]

    return embed


def deterministic_hash_embedder(dim: int = 16) -> Callable[[list[str]], list[list[float]]]:
    """Test-grade deterministic embedder: token-count folding by md5
    bucket, L2-normalized — the adapter-path twin of the reference's
    `_embed_simple` fallback."""
    import hashlib
    import math

    def embed(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            vec = [0.0] * dim
            for tok in t.lower().split():
                h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
                vec[h % dim] += 1.0
            norm = math.sqrt(sum(v * v for v in vec))
            out.append([v / norm if norm > 0 else 0.0 for v in vec])
        return out

    return embed
