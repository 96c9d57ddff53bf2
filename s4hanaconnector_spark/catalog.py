"""Catalog helpers: load the driver's parquet fixtures and expose the
reference's metadata queries as DataFrame operations.

Reference parity (SURVEY §2.1): the reference browses the source catalog with
SQL against HANA system views — table listing with descriptions
(S4HanaBrowse.java:85-102, O1), column+PK discovery
(S4HanaTableMapping.java:272-301, O2), existence probes
(S4HanaTableMapping.java:491-505, O4). In Spark the catalog IS the data
source: parquet schemas carry the structure, ``spark.catalog`` answers
existence, and the same left-outer-join-over-metadata shapes are ordinary
DataFrame queries (exercised in tests over synthetic DD02L/DD02T fixtures).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """The fixtures' ``events.parquet`` carries TIMESTAMP(NANOS), which Spark
    rejects unless ``spark.sql.legacy.parquet.nanosAsLong`` is on. The conf is
    runtime-settable, so the loader sets it itself rather than assuming the
    session was built by ``session.get_spark`` — any plain
    ``SparkSession.builder`` session (e.g. an external driver's) works."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already set read-only / unsupported build — the read will tell


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (E1). Parquet scan => columnar read, predicate
    pushdown and column pruning are handled by Catalyst downstream.

    TIMESTAMP(NANOS) columns (events.ts) arrive as LongType under
    ``spark.sql.legacy.parquet.nanosAsLong`` and are converted to µs
    timestamps here — a projection, still fully pushed-down/columnar."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events":
        _ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # -> TIMESTAMP_NTZ to match every other fixture timestamp (parquet
        # NTZ) and the DuckDB oracle's naive timestamps
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def table_exists(spark: SparkSession, name: str) -> bool:
    """Existence probe (O4, S4HanaTableMapping.java:491-505)."""
    return spark.catalog.tableExists(name)


def list_source_tables(tables_df: DataFrame, texts_df: DataFrame) -> DataFrame:
    """Catalog scan O1 (S4HanaBrowse.java:85-102): transparent tables with
    English descriptions.

    ``SELECT l.tabname, t.ddtext FROM DD02L l LEFT OUTER JOIN DD02T t
    ON l.tabname = t.tabname AND t.ddlanguage = 'E'
    WHERE l.tabclass = 'TRANSP' ORDER BY 1``
    """
    from pyspark.sql import functions as F

    t = texts_df.filter(F.col("ddlanguage") == "E").select("tabname", "ddtext")
    return (
        tables_df.filter(F.col("tabclass") == "TRANSP")
        .select("tabname")
        .join(t, "tabname", "left")
        .orderBy("tabname")
    )


def primary_keys_from_dictionary(dd03l: DataFrame, tabname: str) -> DataFrame:
    """ABAP-dictionary PK fallback O3 (S4HanaTableMapping.java:308-321):
    ``SELECT fieldname FROM DD03L WHERE keyflag='X' AND as4local='A'
    AND tabname=? ORDER BY position``."""
    from pyspark.sql import functions as F

    return (
        dd03l.filter(
            (F.col("keyflag") == "X")
            & (F.col("as4local") == "A")
            & (F.col("tabname") == tabname)
        )
        .orderBy("position")
        .select("fieldname")
    )


def load_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming scan of a fixture table (E17 file source): same schema and
    nanos handling as ``load_table``, but as an unbounded source — new files
    dropped into the directory would flow through incrementally. The batch
    read supplies the schema (streaming file sources require one up front;
    on a real deployment this comes from the table's catalog entry)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events":
        _ensure_nanos_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    # the streaming file source wants a directory (or glob) to watch, not a
    # bare file — a one-character glob selects exactly this table's file
    # while making the source treat the fixture DIR as the watched base
    glob_path = os.path.join(sf_dir, f"[{name[0]}]{name[1:]}.parquet")
    df = spark.readStream.schema(schema).parquet(glob_path)
    if name == "events" and isinstance(schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
        )
    return df


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> list[str]:
    """Register every fixture table as a temp view so arbitrary Spark SQL
    runs against the catalog — the raw-SQL escape hatch a migrating user
    needs for queries this engine has no declared operator for. Views are
    lazy: nothing is read until a query touches a table, and Catalyst
    still pushes filters/pruning into each scan."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def sql(spark: SparkSession, query: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Run raw ANSI SQL against the registered fixture tables, registering
    ONLY the genuinely missing ones first — re-registering everything would
    silently clobber same-named views the caller registered from a
    different sf_dir (register_views with a custom dir), and the query
    would run against the wrong data."""
    existing = {t.name for t in spark.catalog.listTables()}
    for name in TABLES:
        if name not in existing:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(query)
