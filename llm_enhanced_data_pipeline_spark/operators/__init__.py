from . import (  # noqa: F401
    aggregates,
    cleaning,
    compliance,
    corpus,
    dedup,
    joins,
    multimodal,
    quality,
    skew,
    text_analysis,
    vector,
)
