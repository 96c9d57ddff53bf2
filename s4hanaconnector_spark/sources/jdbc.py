"""Partitioned JDBC source — the engine's equivalent of the reference's
parallel initial load and delta reads over a live database connection.

Reference behavior being re-expressed (all file:line into /root/reference):
  * Partition discovery: ``SELECT partition FROM m_cs_partitions WHERE
    schema_name=? AND table_name=?`` then one task per partition
    (S4HanaProducer.java:510-532).
  * Parallel load: ``Executors.newWorkStealingPool(10)`` with one JDBC
    connection per task (S4HanaProducer.java:533-580, :600).
  * Row conversion: per-row JDBCType switch (S4HanaProducer.java:216-315) —
    subsumed by Spark's JDBC dialect, which types whole columns once.

Spark-first translation: ``spark.read.jdbc`` with ``partitionColumn`` +
``numPartitions`` gives the same N-parallel-connections plan, but scheduled,
retried and fused with downstream operators by Spark. The helpers here only
build reader configuration (pure, unit-testable without a database); nothing
opens a connection until an action runs.

At 100 TB: pick a roughly uniform numeric/date partition column (a skewed
column serializes the stragglers), size numPartitions to cluster write
throughput not core count, and always push the projection+filter into the
source query with ``prepare_pushdown_query`` so the database ships only what
the job reads.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# the reference's fixed pool size (S4HanaProducer.java:536) is the default
# parallelism when the caller gives no better number
DEFAULT_NUM_PARTITIONS = 10


@dataclass
class JdbcSourceConfig:
    """Declarative JDBC read spec -> ``spark.read`` options."""

    url: str
    table: str
    partition_column: str | None = None
    lower_bound: int | str | None = None
    upper_bound: int | str | None = None
    num_partitions: int = DEFAULT_NUM_PARTITIONS
    fetchsize: int = 10_000
    predicates: list[str] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        """Options for ``spark.read.format('jdbc')``. Range-partitioned when
        a partition column + bounds are given; single-connection otherwise
        (the reference's 0-partitions => one task case,
        S4HanaProducer.java:530-532)."""
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetchsize),
            **self.properties,
        }
        if self.partition_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    "partition_column requires lower_bound and upper_bound "
                    "(use bounds_query() to discover them)"
                )
            opts.update(
                {
                    "partitionColumn": self.partition_column,
                    "lowerBound": str(self.lower_bound),
                    "upperBound": str(self.upper_bound),
                    "numPartitions": str(self.num_partitions),
                }
            )
        return opts

    def bounds_query(self) -> str:
        """One-row min/max probe for the partition column — the analogue of
        the reference's partition-count discovery (S4HanaProducer.java:510-529).
        Run it through the same JDBC source (numPartitions=1) before the
        partitioned read.

        Two rules learned by EXECUTING this against embedded Derby (they held
        only as prose until then):
          * the subquery alias must start with a letter — ``AS __bounds`` is
            rejected (Derby ERROR 42X01; leading ``_`` is non-standard);
          * the column must be quoted: Spark's JDBC writer creates
            case-sensitive quoted columns, and unquoted references fold to
            uppercase and miss them — exactly why the reference quotes every
            identifier in its generated SQL (S4HanaTableMapping.java:740-761).
        """
        if self.partition_column is None:
            raise ValueError("no partition_column configured")
        c = '"' + self.partition_column.replace('"', '""') + '"'
        return (
            f"(SELECT min({c}) AS lo, max({c}) AS hi FROM {self.table}) AS bounds_probe"
        )

    def discover_bounds(self, spark: SparkSession) -> tuple[int, int]:
        """Execute the bounds probe over the live connection and return
        (lo, hi) — the runtime half of the reference's partition discovery.
        One row, one connection; positional access because engines fold
        unquoted aliases to their own case (Derby: LO/HI)."""
        row = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.bounds_query())
            .options(**self.properties)
            .load()
            .collect()[0]
        )
        return row[0], row[1]

    def with_discovered_bounds(self, spark: SparkSession) -> "JdbcSourceConfig":
        """Copy of this config with lower/upper bounds filled from the live
        probe — probe + partitioned load is the reference's full initial-load
        sequence (S4HanaProducer.java:510-580)."""
        lo, hi = self.discover_bounds(spark)
        from dataclasses import replace

        return replace(self, lower_bound=lo, upper_bound=hi)

    def load(self, spark: SparkSession) -> DataFrame:
        if self.predicates and self.partition_column is not None:
            # the two partitioning modes define DIFFERENT row sets (the
            # predicate list reads exactly the union of its predicates;
            # range partitioning reads the whole table) — silently taking
            # one branch would change the data, not just the parallelism
            raise ValueError(
                "predicates and partition_column are mutually exclusive: "
                "predicate-list partitioning selects rows, range "
                "partitioning stripes the full table"
            )
        reader = spark.read.format("jdbc")
        for k, v in self.reader_options().items():
            reader = reader.option(k, v)
        if self.predicates and self.partition_column is None:
            # predicate-list partitioning: one connection per predicate —
            # the closest analogue of the reference's PARTITION (n) clauses
            # (S4HanaTableMapping.java:751-755)
            return spark.read.jdbc(
                self.url,
                self.table,
                predicates=list(self.predicates),
                properties={"fetchsize": str(self.fetchsize), **self.properties},
            )
        return reader.load()


def prepare_pushdown_query(
    table: str,
    columns: list[str] | None = None,
    where: str | None = None,
) -> str:
    """Build a pushdown subquery for ``dbtable`` so projection and filter run
    in the source database (the reference generates exactly this SQL shape,
    S4HanaTableMapping.java:740-761): ``(SELECT c1, c2 FROM t WHERE p) AS q``.
    """
    cols = ", ".join(columns) if columns else "*"
    pred = f" WHERE {where}" if where else ""
    # letter-leading alias: leading '_' is non-standard and rejected by
    # strict engines (see bounds_query)
    return f"(SELECT {cols} FROM {table}{pred}) AS pushdown_q"
