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


class TestPartitionPruning:
    def test_partition_filter_prunes_directories(self, spark, sf_dir, tmp_path):
        from s4hanaconnector_spark.catalog import load_table
        from s4hanaconnector_spark.operators.bucketing import write_partitioned

        path = str(tmp_path / "events_by_type")
        ev = load_table(spark, sf_dir, "events")
        write_partitioned(ev, path, ["event_type"])

        df = spark.read.parquet(path).filter("event_type = 'click'")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the filter must land in PartitionFilters (directory pruning),
        # not as a post-scan data filter
        assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].split("]")[0], plan
        # and the pruned read returns exactly the clicks
        assert df.count() == ev.filter("event_type = 'click'").count()

    def test_compaction_reduces_file_count(self, spark, sf_dir, tmp_path):
        import glob

        from s4hanaconnector_spark.catalog import load_table
        from s4hanaconnector_spark.operators.bucketing import compact_partitions

        path = str(tmp_path / "frag")
        ev = load_table(spark, sf_dir, "events").repartition(16)
        ev.write.parquet(path)
        before = len(glob.glob(f"{path}/part-*.parquet"))
        n = spark.read.parquet(path).count()
        compact_partitions(spark, path, target_files=2)
        after = len(glob.glob(f"{path}/part-*.parquet"))
        assert before >= 16 and after <= 2
        assert spark.read.parquet(path).count() == n

    def test_cluster_within_partitions_no_exchange(self, spark, sf_dir):
        from s4hanaconnector_spark.catalog import load_table
        from s4hanaconnector_spark.operators.bucketing import cluster_within_partitions

        ev = load_table(spark, sf_dir, "events")
        plan = (
            cluster_within_partitions(ev, ["user_id", "ts"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert "Sort" in plan, plan
