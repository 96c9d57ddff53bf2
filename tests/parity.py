"""Spark <-> DuckDB result comparison, mirroring the driver's canonicalization
(sort columns by name, order-insensitive rows, exact values)."""

from __future__ import annotations

import datetime
import math

import pandas as pd


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def canonicalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = []
    for rec in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(_canon_cell(v) for v in rec))
    # NaN/None-safe order-insensitive compare
    return sorted(rows, key=repr)


def assert_parity(spark_df, duck_con, oracle_sql: str, name: str = "?"):
    spdf = spark_df.toPandas()
    # cast None in object cols uniformly
    spdf = spdf.where(pd.notna(spdf), None)
    ddf = duck_con.execute(oracle_sql).fetchdf()
    ddf = ddf.where(pd.notna(ddf), None)

    assert len(spdf) == len(ddf), f"[{name}] row count: spark={len(spdf)} duck={len(ddf)}"
    assert sorted(spdf.columns) == sorted(
        ddf.columns
    ), f"[{name}] columns: spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"

    s_rows = canonicalize(spdf)
    d_rows = canonicalize(ddf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"[{name}] {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
