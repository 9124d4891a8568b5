from . import (  # noqa: F401
    aggregates,
    cleaning,
    compliance,
    dedup,
    joins,
    multimodal,
    quality,
    text_analysis,
    vector,
)
