"""Analytics checks the oracle can't express: approximate-aggregate accuracy."""

from __future__ import annotations

from s4hanaconnector_spark.queries import load_all


def test_approx_count_distinct_accuracy(spark, sf_dir):
    reg = load_all()
    rows = {
        r["o_orderpriority"]: r
        for r in reg["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n_customers"]
        for r in reg["agg_count_distinct"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(exact)
    # The query emits the HLL contract itself: exact distinct plus a flag
    # that the engine's own approx_count_distinct (rsd=0.05) landed within
    # 10% of it. Every group must satisfy the contract.
    for k, r in rows.items():
        assert r["n_customers_exact"] == exact[k], (k, r)
        assert r["approx_within_10pct"] == 1, (k, r)


def test_observed_metrics_single_pass(spark, sf_dir):
    """observed(): quality counters ride the SAME job as the consuming
    action — no second scan (the plan shows CollectMetrics, and the
    observation is populated after one action)."""
    from pyspark.sql import functions as F

    from s4hanaconnector_spark.catalog import load_table
    from s4hanaconnector_spark.operators.relational import observed

    o = load_table(spark, sf_dir, "orders")
    df, obs = observed(
        o,
        "load_metrics",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_price": F.count(F.lit(1)) - F.count("o_totalprice"),
            "max_price": F.max("o_totalprice"),
        },
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan, plan
    df.write.format("noop").mode("overwrite").save()  # one action
    got = obs.get
    assert got["n_rows"] == o.count()
    assert got["n_null_price"] == 0
    assert got["max_price"] > 0


def test_distinct_sketch_incremental_maintenance(spark, sf_dir):
    """The persistable-sketch contract: per-batch HLL states union into a
    maintained state WITHOUT rescanning earlier batches, the folded
    estimate is (a) deterministic, (b) within 10% of the exact distinct
    over everything ingested, and (c) independent of the union tree —
    ((b1 u b2) u b3) == (b1 u (b2 u b3)) estimate-exact, which is what
    makes per-day/per-partition sketch state safe to store and fold in
    any order at 100 TB."""
    from pyspark.sql import functions as F

    from s4hanaconnector_spark.operators.relational import (
        distinct_sketch,
        estimate_distinct,
        union_distinct_sketches,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    batches = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    states = [
        distinct_sketch(b, ["o_orderpriority"], "o_custkey").localCheckpoint()
        for b in batches
    ]

    def est(state):
        return {
            (r["o_orderpriority"], r["n_distinct_est"])
            for r in estimate_distinct(state).collect()
        }

    def u(a, b):
        return union_distinct_sketches(
            a.unionByName(b), ["o_orderpriority"]
        ).localCheckpoint()

    left = est(u(u(states[0], states[1]), states[2]))
    right = est(u(states[0], u(states[1], states[2])))
    assert left == right and left  # (c) tree-independent

    again = est(u(u(states[0], states[1]), states[2]))
    assert again == left  # (a) deterministic

    exact = {
        (r["o_orderpriority"], r["ex"])
        for r in o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("ex"))
        .collect()
    }
    exact_by_g = dict(exact)
    for g, e in left:
        assert abs(e - exact_by_g[g]) * 10 <= exact_by_g[g], (g, e, exact_by_g[g])
