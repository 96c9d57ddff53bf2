"""Analytics checks the oracle can't express: approximate-aggregate accuracy."""

from __future__ import annotations

from s4hanaconnector_spark.queries import load_all


def test_approx_count_distinct_accuracy(spark, sf_dir):
    reg = load_all()
    approx = {
        r["o_orderpriority"]: r["n_customers_approx"]
        for r in reg["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n_customers"]
        for r in reg["agg_count_distinct"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    # approx_count_distinct defaults to rsd=0.05 (5% relative standard
    # deviation); allow 3 sigma
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(3, 0.15 * v), (k, approx[k], v)
