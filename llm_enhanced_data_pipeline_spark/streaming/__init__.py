from . import enrichment, events, stateful  # noqa: F401
