"""Run EVERY declared query with an oracle against DuckDB at sf0.001 —
the same check the driver performs at sf0.01 (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from s4hanaconnector_spark.queries import load_all
from tests.parity import assert_parity


def _cases():
    return [(n, q) for n, q in load_all().items()]


@pytest.mark.parametrize("name,q", _cases(), ids=[n for n, _ in _cases()])
def test_query_parity(spark, duck, sf_dir, name, q):
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        # weaker check, mirroring the driver: runs and has a stable schema
        assert df.columns
        df.count()
        return
    assert_parity(df, duck, q.oracle, name)


def test_parity_rejects_hugeint_float_drift(spark, duck):
    """Regression for the r9 driver reds: DuckDB promotes a bare
    ``sum(BIGINT)`` to HUGEINT, which pandas materializes as float64 while
    Spark exports int64 — value-equal (3 vs 3.0) but hash-different at the
    driver. The in-repo gate must fail that BEFORE the driver does."""
    sdf = spark.createDataFrame([(3,)], "total BIGINT")
    bare = "SELECT sum(x) AS total FROM (SELECT CAST(1 AS BIGINT) AS x UNION ALL SELECT 2)"
    with pytest.raises(AssertionError, match="int-vs-float"):
        assert_parity(sdf, duck, bare, "hugeint_drift")
    # the repo-wide convention fixes it
    assert_parity(sdf, duck, f"SELECT CAST(total AS BIGINT) AS total FROM ({bare})",
                  "hugeint_drift_cast")
