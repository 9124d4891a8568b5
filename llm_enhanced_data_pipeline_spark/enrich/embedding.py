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
