"""Derived ``partsupp`` fixture: the TPC-H part-supplier bridge, computed
deterministically from the ``part`` and ``supplier`` fixtures.

The driver's testdata has no partsupp.parquet, so the four TPC-H join
topologies that need it (Q2 correlated-min, Q11 scalar-subquery-over-agg,
Q16 agg-over-anti-join, Q20 nested-semi-join) would otherwise be untestable.
This module derives the table *in-query*, identically in Spark and in the
DuckDB oracle, so those shapes stay under the hash gate:

  * ``ps_suppkey``: part ``p`` gets 4 suppliers ``(4p + i) mod S`` for
    ``i`` in 0..3 with ``S`` the supplier count — four consecutive integers
    mod S are pairwise distinct whenever ``S >= 4``, so (unlike the TPC-H
    dbgen assignment, which only guarantees distinctness at dbgen's own
    supplier cardinalities) every part has exactly 4 distinct suppliers at
    ANY scale factor.  Keys are 0-based to match the driver fixtures
    (``s_suppkey`` ranges 0..S-1, as does ``l_suppkey``), so the derived
    pairs overlap lineitem's (l_partkey, l_suppkey) pairs — required for
    the Q20 nested-semi-join shape to be non-degenerate.
  * ``ps_availqty`` and ``ps_supplycost_cents`` are hash-free integer
    mixes of the two keys — exact BIGINT in both engines, so every
    downstream aggregate/threshold compares bit-for-bit.  Monetary values
    live in integer cents; queries divide by 100.0 only in the final
    projection (one deterministic per-row op over exact ints).

Scale note (100 TB): the derivation is a cross of ``part`` with a 4-element
sequence — row-local explode, zero shuffle — plus a broadcast of the 1-row
supplier count.  partsupp never materializes; Catalyst prunes it like any
other subplan, and part-side filters prune the explode before it happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s4hanaconnector_spark.catalog import load_table


def derive_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp with columns (ps_partkey, ps_suppkey, ps_availqty,
    ps_supplycost_cents).  See module docstring for the generation rule."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    scount = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("__s"))
    )
    base = (
        part.crossJoin(F.broadcast(scount))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__i"),
            "__s",
        )
        .withColumn(
            "ps_suppkey",
            (F.col("ps_partkey") * 4 + F.col("__i")) % F.col("__s"),
        )
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 37) % 100000 + 100
        ).alias("ps_supplycost_cents"),
    )


# The same derivation as a DuckDB WITH-clause body.  Oracles embed it as
# `WITH {PARTSUPP_CTE}, ...` so the hash gate sees identical inputs.
PARTSUPP_CTE = """partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1 AS ps_availqty,
         (ps_partkey * 31 + ps_suppkey * 37) % 100000 + 100 AS ps_supplycost_cents
  FROM (
    SELECT p.p_partkey AS ps_partkey,
           (p.p_partkey * 4 + i.i) % sc.s AS ps_suppkey
    FROM part p
    CROSS JOIN (SELECT count(*) AS s FROM supplier) sc
    CROSS JOIN (SELECT unnest(range(4)) AS i) i
  )
)"""
