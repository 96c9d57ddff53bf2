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


class TestZOrder:
    def test_zorder_value_interleaves_bits(self, spark):
        from pyspark.sql import functions as F

        from s4hanaconnector_spark.operators.bucketing import zorder_value

        df = spark.createDataFrame([(3, 5)], "x int, y int")
        # x=0b011 contributes bits 0,2,4 -> 1 + 4; y=0b101 contributes bits
        # 1,3,5 -> 2 + 32: z = 0b100111 = 39
        got = df.select(zorder_value(["x", "y"], bits=3).alias("z")).first()["z"]
        assert got == 0b100111 == 39
        # identity on a single column
        one = df.select(zorder_value(["x"], bits=8).alias("z")).first()["z"]
        assert one == 3

    def test_cluster_zorder_tightens_hyperrectangles(self, spark):
        import itertools

        from pyspark.sql import functions as F

        from s4hanaconnector_spark.operators.bucketing import cluster_zorder

        # 64x64 grid; z-clustering into 16 files must bound BOTH dims per
        # file near sqrt(4096/16)=16, while a 1-col sort leaves y unbounded.
        rows = [(x, y) for x, y in itertools.product(range(64), range(64))]
        df = spark.createDataFrame(rows, "x int, y int")
        zed = cluster_zorder(df, ["x", "y"], bits=6, n_files=16)
        spans = (
            zed.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        assert len(spans) == 16
        worst = max(r["sx"] + r["sy"] for r in spans)
        # x-sorted control: every 16-file slab spans the full y range (63)
        assert worst <= 46 < 63 + 0, spans
        # no exchange beyond the single range partition, sort is in-partition
        plan = zed._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan


def test_bucketed_nest_has_no_shuffle(spark, bucketed_tables):
    """The O32 scale claim made executable: nest()'s agg-before-join
    (groupBy(collect_list) on the detail, left join onto the master) runs
    with ZERO exchanges when both sides are bucketed on the join key — the
    aggregation rides the detail's bucket distribution and the join rides
    both. At 100 TB this is the difference between shuffling every detail
    row per re-nest and a shuffle-free co-located stage (the nesting
    module's "pre-bucket master and detail" note, operators/nesting.py)."""
    from s4hanaconnector_spark.operators.nesting import nest

    a, b = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nested = nest(
            spark.table(a),
            spark.table(b),
            joincondition=[{"left": "o_orderkey", "right": "o_orderkey"}],
            schemafield="items",
            detail_cols=["l_linenumber", "l_quantity"],
            sort_detail_by=["l_linenumber"],
        )
        plan = nested._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # sanity: nesting content matches the plain-parquet shape
        row = nested.selectExpr(
            "sum(size(items)) AS n_items", "count(*) AS n_docs"
        ).collect()[0]
        assert row["n_docs"] > 0 and row["n_items"] > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_zorder_bits_capped_below_sign_bit(spark):
    """bits * N must stay <= 63: position 63 is the LONG sign bit — without
    the cap, a 4-column key with default 16 bits put column 3's bit 15 at
    position 63, so any row with that column >= 32768 got a NEGATIVE key
    and sorted before everything (silently destroying the clustering)."""
    from s4hanaconnector_spark.operators.bucketing import zorder_value

    df = spark.createDataFrame(
        [(0, 0, 0, 0), (1, 1, 1, 40000), (65535, 65535, 65535, 65535)],
        "a long, b long, c long, d long",
    )
    zs = [r["z"] for r in df.select(zorder_value(["a", "b", "c", "d"]).alias("z")).collect()]
    assert all(z >= 0 for z in zs)  # never negative
    assert zs[0] < zs[1] < zs[2]  # monotone for dominated points
