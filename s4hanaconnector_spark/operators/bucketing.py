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


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Persist ``df`` hive-partitioned by ``partition_cols`` (one directory
    per value combination). The payoff is PARTITION PRUNING: any downstream
    filter on a partition column is resolved against the directory listing
    — pruned partitions are never opened, let alone scanned. At 100 TB this
    is the first-order I/O lever (date/table/tenant partitioning), ahead of
    row-group skipping and column pruning, both of which still apply inside
    the surviving partitions.

    Partition columns must be low-cardinality (each value is a directory;
    a high-cardinality partition key creates the millions-of-small-files
    problem ``compact_partitions`` exists to fix)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_partitions(
    spark: SparkSession, path: str, target_files: int, partition_cols: list[str] | None = None
) -> None:
    """Rewrite a parquet dataset into ``target_files`` files (per partition
    value if ``partition_cols`` is given) — the small-files compaction every
    long-running ingest needs: streaming sinks and frequent CDC batches each
    leave a file per micro-batch x shuffle-partition, and scan planning cost
    grows with file count (one footer read + task per tiny file). Uses a
    fresh overwrite write with ``coalesce``; run it on cold partitions, not
    the one currently ingesting."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    w = df.coalesce(target_files).write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    # atomic-ish swap via filesystem rename (object stores: copy + delete)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)


def zorder_value(cols: list, bits: int = 16):
    """Morton/Z-order key: bit-interleave of N non-negative integer columns
    into one LONG (col j contributes bit b to output position ``b*N + j``).

    Sorting/range-partitioning by this key clusters rows that are close in
    EVERY dimension into the same parquet row groups, so min/max statistics
    prune multi-dimension predicates — the layout trick Delta's OPTIMIZE
    ZORDER and Iceberg's sort orders use, available here as a plain column
    expression (pure shifts/ands, whole-stage-codegen'd, no UDF).

    ``bits`` bounds each dimension at 2^bits; map wider domains down first
    (e.g. ``pmod(key, 1 << bits)`` or day-number offsets). Row-local and
    exact in any engine with integer shifts.

    ``bits`` is capped so ``bits * N <= 63``: output position 63 is the
    LONG sign bit (a row with a high value in the last column would get a
    negative key and sort before everything, destroying the clustering),
    and positions >= 64 wrap (JVM shifts are mod 64) — with 4 columns the
    effective default is 15 bits/dimension, with 5 it is 12, and so on.
    The cap trades per-dimension resolution, never correctness."""
    from pyspark.sql import functions as F

    n = len(cols)
    bits = min(bits, 63 // n)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            col = (F.col(c) if isinstance(c, str) else c).cast("long")
            bit = F.shiftrightunsigned(col, b).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, b * n + j)
    return z


def cluster_zorder(df: DataFrame, cols: list, bits: int = 16, n_files: int | None = None) -> DataFrame:
    """Lay ``df`` out in Z-order on ``cols``: range-partition on the Morton
    key (sampled boundaries, fully parallel — NOT a global sort) and sort
    within each partition, so every output file covers a tight hyper-rectangle
    of the key space. Write the result with ``write_partitioned`` /
    plain parquet; multi-dim point and range scans then skip most files and
    row groups on min/max alone."""
    from pyspark.sql import functions as F

    z = zorder_value(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    if n_files:
        out = out.repartitionByRange(n_files, F.col("__z"))
    else:
        out = out.repartitionByRange(F.col("__z"))
    return out.sortWithinPartitions("__z").drop("__z")


def cluster_within_partitions(df: DataFrame, cols: list[str]) -> DataFrame:
    """Sort rows WITHIN each partition by ``cols`` without any shuffle
    (``sortWithinPartitions``) — parquet then writes tight min/max row-group
    statistics on those columns, so point/range predicates skip row groups
    (the poor man's Z-order for single-key access patterns). Exchange-free
    by construction; combine with ``write_partitioned`` for directory-level
    + row-group-level pruning on different keys."""
    return df.sortWithinPartitions(*cols)
