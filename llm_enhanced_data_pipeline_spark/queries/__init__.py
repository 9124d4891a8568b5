"""Import all query modules so their @register calls populate REGISTRY."""

from . import (  # noqa: F401
    analysis_q,
    bpe_q,
    corpus_q,
    dedup_q,
    events_q,
    graph_q,
    layout_q,
    lm_q,
    pipeline_q,
    rag_q,
    relational,
    text_q,
    vector_q,
    web_q,
)
from .registry import REGISTRY, bench_queries, oracle_sql, queries  # noqa: F401
