from . import checkpoint, inverted_index, jsonl  # noqa: F401
