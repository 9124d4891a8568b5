"""Local twin of the driver's correctness gate: run a registry query on
Spark and its oracle SQL on DuckDB over the same parquet, then compare
the way the driver does — both results land in pandas, columns are
sorted by name, rows are sorted by every column, and the frames must
match bit-exact INCLUDING dtypes.

This is deliberately stricter than a round-to-9dp value compare: the
driver hash-compares canonicalized pandas frames, so an int64-vs-float64
dtype skew (DuckDB integer sum() -> HUGEINT -> float64) or an unsortable
array cell fails there even when Python-level values agree. Local green
must imply driver green, so we replicate the failure modes:

- ``sort_values`` over list-typed cells raises TypeError exactly like
  the driver's canonicalizer did in round 1;
- dtypes are compared verbatim (no int/float coercion);
- float cells must be bit-identical (NaN == NaN allowed), which is what
  a value-hash over the frame implies.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted
    by all columns (raises TypeError on unhashable cells — that is a
    real gate failure, do not catch it here)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if cols:
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    return pdf.reset_index(drop=True)


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return (np.isnan(a) and np.isnan(b)) or a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return False, (
            f"column mismatch: spark={sorted(s_pdf.columns)} "
            f"duck={sorted(d_pdf.columns)}"
        )
    if len(s_pdf) != len(d_pdf):
        return False, f"row count: spark={len(s_pdf)} duck={len(d_pdf)}"
    try:
        s = canonicalize(s_pdf)
    except TypeError as e:
        return False, f"spark result not driver-canonicalizable: {e}"
    try:
        d = canonicalize(d_pdf)
    except TypeError as e:
        return False, f"oracle result not driver-canonicalizable: {e}"
    dt_s, dt_d = list(map(str, s.dtypes)), list(map(str, d.dtypes))
    if dt_s != dt_d:
        bad = [
            (c, a, b) for c, a, b in zip(s.columns, dt_s, dt_d) if a != b
        ]
        return False, f"dtype mismatch (col, spark, duck): {bad}"
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if s[c].dtype == object:
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sv, dv))
                if not _cells_equal(a, b)
            ]
        else:
            neq = ~((sv == dv) | (pd.isna(sv) & pd.isna(dv)))
            bad = [(int(i), sv[i], dv[i]) for i in np.flatnonzero(neq)]
        if bad:
            return False, f"value mismatch in '{c}', first diffs: {bad[:5]}"
    return True, "ok"
