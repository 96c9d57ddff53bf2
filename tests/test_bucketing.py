"""Bucketed co-located joins: prove the Exchange disappears.

The point of bucketing is invisible in results and only visible in plans —
so the assertion IS the plan: joining two tables bucketed on the join key
must produce zero shuffle exchanges, while the same join on plain tables
shuffles both sides."""

from __future__ import annotations

import pytest

from s4hanaconnector_spark.operators.bucketing import (
    bucketed_join_ready,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is static config; tables land in the session default
    # (./spark-warehouse, gitignored) and are dropped on teardown
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8)
    write_bucketed(lineitem, "lineitem_b", ["o_orderkey"], 8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    a, b = bucketed_tables
    assert bucketed_join_ready(spark, a, b)
    # disable broadcast so the join strategy decision is bucketing's alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # both sides scanned with bucket info, join is sort-merge over
        # co-located buckets
        assert "SortMergeJoin" in plan, plan
        # sanity: result matches the plain-parquet join
        n_bucketed = joined.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_plain_join_does_shuffle(spark, sf_dir):
    """Control: the identical join on plain parquet shuffles both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        plan = (
            o.join(li, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") >= 2, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    a, b = bucketed_tables
    bucketed = spark.table(a).join(spark.table(b), "o_orderkey").count()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    assert bucketed == o.join(li, "o_orderkey").count()
