"""Engine-stable rounding.

``round(double, n)`` disagrees between engines at exact half-boundaries
(Spark rounds the exact binary value via BigDecimal HALF_UP; DuckDB
scales-and-rounds in floating point). ``stable_round`` uses
floor(x * 10^n + 0.5) / 10^n — identical floating-point operations on
identical inputs give identical outputs everywhere. Intended for
non-negative ratio/score outputs that cross the oracle boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, decimals: int) -> Column:
    scale = float(10**decimals)
    return F.floor(col * scale + 0.5) / scale


def stable_round_sql(expr: str, decimals: int) -> str:
    scale = float(10**decimals)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def stable_round_py(x: float, decimals: int) -> float:
    """The same floor(x * 10^n + 0.5) / 10^n in plain Python floats —
    for pandas-UDF workers whose outputs cross an oracle boundary, so
    the worker and its DuckDB twin round identically (Python round()
    is half-to-even; DuckDB round() is half-away-from-zero; this is
    neither, but it is the SAME f64 ops on both sides). Non-negative
    finite inputs only, like the SQL form."""
    scale = float(10**decimals)
    return math.floor(x * scale + 0.5) / scale
