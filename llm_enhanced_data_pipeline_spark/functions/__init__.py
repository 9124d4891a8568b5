from . import hashing, parsing  # noqa: F401
