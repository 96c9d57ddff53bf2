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
