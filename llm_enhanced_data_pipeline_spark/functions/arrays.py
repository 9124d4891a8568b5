"""Shared array-index helpers.

Spark's ``sequence(start, stop)`` auto-selects step ``-1`` when
``stop < start``, so the common windowed-index idiom
``sequence(1, greatest(n - k + 1, 0))`` silently becomes the
DESCENDING two-element array ``[1, 0]`` whenever the document is
shorter than the window — and the downstream ``element_at(arr, 0)``
raises ``INVALID_INDEX_OF_ZERO`` (both ANSI modes, verified on
PySpark 4.1.2). DuckDB's ``range(1, n + 1)`` is correctly empty for
``n <= 0``, so the two engines diverge exactly on short documents.

Every rolling-window operator (shingles, k-gram hashes, winnowing,
bigrams, per-char symbol splits) must therefore build its index array
through :func:`index_1_to`, which restores range() semantics.
"""

from pyspark.sql import Column, functions as F


def index_1_to(n: Column) -> Column:
    """Ascending ``[1 .. n]`` index array; EMPTY when ``n <= 0``.

    The Spark-side twin of DuckDB's ``range(1, n + 1)``: never
    descending, never containing 0, safe to feed into ``element_at`` /
    ``slice`` / ``substring`` for documents shorter than the window.
    """
    n = n.cast("int")
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
