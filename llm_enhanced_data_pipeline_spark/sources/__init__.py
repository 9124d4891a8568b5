from . import checkpoint, inverted_index, jsonl, warc  # noqa: F401
