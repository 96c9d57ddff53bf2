"""Unit tests for the JDBC source config builder (no live database — the
options dict IS the contract Spark consumes; reader behavior beyond that is
Spark's own covered code)."""

from __future__ import annotations

import pytest

from s4hanaconnector_spark.sources import (
    DEFAULT_NUM_PARTITIONS,
    JdbcSourceConfig,
    prepare_pushdown_query,
)

URL = "jdbc:sap://host:39015/HXE"


def test_partitioned_options():
    cfg = JdbcSourceConfig(
        url=URL,
        table="S4HANA_SOURCE.VBAK",
        partition_column="MANDT_NUM",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
        fetchsize=5_000,
    )
    opts = cfg.reader_options()
    assert opts["partitionColumn"] == "MANDT_NUM"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "5000"
    assert opts["dbtable"] == "S4HANA_SOURCE.VBAK"


def test_default_parallelism_matches_reference_pool():
    # Executors.newWorkStealingPool(10), S4HanaProducer.java:536
    assert DEFAULT_NUM_PARTITIONS == 10
    assert JdbcSourceConfig(url=URL, table="T").num_partitions == 10


def test_unpartitioned_options_have_no_partition_keys():
    opts = JdbcSourceConfig(url=URL, table="T").reader_options()
    assert "partitionColumn" not in opts
    assert "numPartitions" not in opts


def test_partition_column_requires_bounds():
    cfg = JdbcSourceConfig(url=URL, table="T", partition_column="ID")
    with pytest.raises(ValueError, match="lower_bound"):
        cfg.reader_options()


def test_bounds_query_shape():
    # letter-leading alias + quoted column: both REQUIRED by real engines
    # (Derby rejects __-leading aliases with 42X01 and folds unquoted
    # identifiers to uppercase) — pinned here after the embedded-Derby
    # execution leg caught the old shape failing on the wire
    cfg = JdbcSourceConfig(url=URL, table="S.T", partition_column="ID")
    q = cfg.bounds_query()
    assert q == '(SELECT min("ID") AS lo, max("ID") AS hi FROM S.T) AS bounds_probe'


def test_pushdown_query_projection_and_filter():
    q = prepare_pushdown_query(
        "S4HANA_SOURCE.VBAK", ["VBELN", "ERDAT"], "MANDT = '100'"
    )
    assert q == "(SELECT VBELN, ERDAT FROM S4HANA_SOURCE.VBAK WHERE MANDT = '100') AS pushdown_q"
    assert prepare_pushdown_query("T") == "(SELECT * FROM T) AS pushdown_q"


def test_predicates_and_partition_column_are_mutually_exclusive(spark):
    """The two partitioning modes define DIFFERENT row sets; configuring
    both must raise instead of silently reading the whole table."""
    import pytest

    from s4hanaconnector_spark.sources.jdbc import JdbcSourceConfig

    cfg = JdbcSourceConfig(
        url="jdbc:h2:mem:x", table="t", partition_column="id",
        lower_bound=0, upper_bound=10, predicates=["region='EU'"],
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        cfg.load(spark)
