"""Spark <-> DuckDB result comparison, mirroring the driver's canonicalization
(sort columns by name, order-insensitive rows, exact values).

Known comparison limits (inherent to the pandas bridge, documented so they
are a decision, not a surprise):

* NULL vs NaN in double columns: both engines' pandas exports render a
  NULL double as NaN (non-nullable float dtype), so a genuine NULL-vs-NaN
  divergence at the TOP level cannot be observed post-export. Inside array
  cells the distinction survives and IS enforced (None vs the NaN
  sentinel).
* int-vs-float dtype drift is tolerated by value (1 == 1.0) ONLY when the
  float side actually contains nulls — that is the one case where pandas'
  null-driven promotion of an integer column to float64 makes the drift a
  bridge artifact rather than an engine divergence. A null-free int-vs-
  float kind mismatch is exactly the failure mode the driver's value hash
  rejects (e.g. DuckDB promoting a bare ``sum(BIGINT)`` to HUGEINT, which
  pandas materializes as float64 ``3.0`` against Spark's int64 ``3``), so
  it fails loudly here too — the in-repo parity gate must be at least as
  strict as the driver's. BOOL columns are always strict — both engines
  export bool as dtype 'b' deterministically, so a bool-vs-number kind
  mismatch is a real schema divergence.
"""

from __future__ import annotations

import math

import pandas as pd

# unique, non-string NaN sentinel: the plain string "NaN" would make a
# string cell 'NaN' compare equal to a float NaN inside array values
_NAN = ("__float_nan__",)


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return _NAN
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


def _kind_check(spdf: pd.DataFrame, ddf: pd.DataFrame, name: str) -> None:
    """Dtype-kind gate mirroring the driver's hash sensitivity (see module
    docstring): bool is always strict; int-vs-float is strict unless the
    float side carries nulls (pandas' null-driven promotion)."""
    for col in spdf.columns:
        sk = spdf[col].dtype.kind
        dk = ddf[col].dtype.kind
        if sk == dk:
            continue
        if "b" in (sk, dk):
            raise AssertionError(
                f"[{name}] column {col!r}: bool-vs-{'bool' if dk == 'b' else dk} "
                f"dtype divergence (spark={sk} duck={dk}) — a 0/1 numeric "
                "column is not a BOOLEAN even when the values compare equal"
            )
        if {sk, dk} <= {"i", "u", "f"} and "f" in (sk, dk):
            float_side = spdf[col] if sk == "f" else ddf[col]
            if not float_side.isna().any():
                raise AssertionError(
                    f"[{name}] column {col!r}: null-free int-vs-float dtype "
                    f"divergence (spark={sk} duck={dk}) — the driver's value "
                    "hash renders these differently (int 3 vs float 3.0). If "
                    "this is the oracle side, the usual cause is DuckDB "
                    "promoting a bare sum()/integer aggregate to HUGEINT: "
                    "wrap it in CAST(... AS BIGINT) like queries/cdc.py does."
                )


def assert_parity(spark_df, duck_con, oracle_sql: str, name: str = "?") -> int:
    """Compare a Spark result against its DuckDB oracle; returns the row
    count so callers need not re-run either side for accounting."""
    spdf = spark_df.toPandas()
    ddf = duck_con.execute(oracle_sql).fetchdf()
    assert len(spdf) == len(ddf), f"[{name}] row count: spark={len(spdf)} duck={len(ddf)}"
    assert sorted(spdf.columns) == sorted(
        ddf.columns
    ), f"[{name}] columns: spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"
    _kind_check(spdf, ddf, name)
    # cast None in object cols uniformly
    spdf = spdf.where(pd.notna(spdf), None)
    ddf = ddf.where(pd.notna(ddf), None)

    s_rows = canonicalize(spdf)
    d_rows = canonicalize(ddf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"[{name}] {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
    return len(spdf)
