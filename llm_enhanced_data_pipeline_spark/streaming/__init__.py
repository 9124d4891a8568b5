from . import enrichment, events, ingest, stateful  # noqa: F401
