"""Bucketed-table utilities — the co-located-join strategy the 100 TB design
notes keep pointing at (SURVEY §4, operators/cdc.py scale notes).

Why: every repeated join/aggregation on the same key (the CDC delta joins
the snapshot on PK every poll; apply_changes anti-joins it again) pays a
full shuffle of the big side unless the table is stored pre-hashed on that
key. Writing the snapshot bucketed by PK makes those joins and groupBys
shuffle-free on the big side forever after: Spark's bucketed scan reports
its hash distribution to the planner, which drops the Exchange.

Reference anchor: HANA stores tables hash-partitioned and the reference
leans on it via ``PARTITION (n)`` initial-load clauses
(S4HanaTableMapping.java:751-755); bucketing is the Spark-native counterpart
that additionally survives restarts and benefits EVERY downstream join.

Local caveat: bucketed tables need a catalog (the embedded Derby metastore
in local mode) — fine on a cluster (Hive/Glue/Unity). Bucket count is fixed
at write time; pick it for the TARGET scale (100 TB / ~128 MB per bucket
file per partition), not the test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``keys``.
    Sorting within buckets additionally enables merge-join without a sort
    step and better min/max skipping."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str) -> bool:
    """True when both tables exist as bucketed tables in the catalog (the
    precondition for a shuffle-free join on their bucket keys)."""
    try:
        da = spark.catalog.listColumns(table_a)
        db = spark.catalog.listColumns(table_b)
        return bool(any(c.isBucket for c in da)) and bool(any(c.isBucket for c in db))
    except Exception:
        return False
