"""File-format sources beyond parquet: CSV and JSON (line-delimited) with
the discipline a 100 TB deployment needs.

The reference ingests exclusively over JDBC (S4HanaProducer.java) — these
loaders exist because a Spark-native deployment of the same engine receives
extracts and event feeds as files. Rules encoded here:

  * EXPLICIT schema always. ``inferSchema`` reads the data twice and types
    drift run-to-run; at scale the second pass alone is the cost of the
    whole job. Schemas come from the mapping layer (mapping.py) or a DDL
    string — never from sampling.
  * PERMISSIVE + ``_corrupt_record`` by default: a bad line lands in the
    corrupt column instead of killing the 10-hour job (FAILFAST is the
    opt-in for pipelines that prefer loud death). ``corrupt_rows`` splits
    them out for quarantine sinks.
  * Both loaders return plain DataFrames — filters and projections push
    into the scan exactly as with parquet (CSV/JSON get column pruning and
    partition pruning; predicate pushdown is format-limited, which is one
    more reason the engine's canonical storage stays parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: str) -> str:
    return f"{schema}, {CORRUPT_COL} string"


def _clean(df: DataFrame) -> DataFrame:
    """Drop quarantined rows from a PERMISSIVE scan, keeping column-free
    downstream queries legal. Filtering ``_corrupt_record IS NULL`` alone
    breaks ``read_csv(...).count()``: the count prunes every data column,
    Spark sees a raw-file plan referencing ONLY the internal corrupt
    column and rejects it (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN). Its documented remedy — cache the parsed scan — is
    unacceptable as a default on a 100 TB read, and DROPMALFORMED is
    worse: with no referenced columns Spark skips parsing entirely and
    silently COUNTS malformed lines (verified on 4.1.2). Instead the
    filter carries a non-foldable tautology on the first data column
    (``c IS NULL OR c IS NOT NULL``), so every plan references at least
    one real column: correctness unchanged, cost one extra scan column in
    the (rare) column-free plans only. Pinned by tests so a future
    Catalyst that constant-folds the tautology fails loudly here."""
    first = df.columns[0]
    keep = F.col(CORRUPT_COL).isNull() & (
        F.col(first).isNull() | F.col(first).isNotNull()
    )
    return df.filter(keep).drop(CORRUPT_COL)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
    keep_corrupt_col: bool = False,
) -> DataFrame:
    """CSV with explicit schema. ``mode``: PERMISSIVE (default; malformed
    lines land in ``_corrupt_record``), DROPMALFORMED, or FAILFAST.

    The default clean path supports column-free downstream queries
    (``read_csv(...).count()``) without caching — see ``_clean`` for the
    mechanism and why DROPMALFORMED/cache were rejected."""
    full = _with_corrupt(schema) if mode == "PERMISSIVE" else schema
    df = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    if mode == "PERMISSIVE" and not keep_corrupt_col:
        df = _clean(df)
    return df


def read_json(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    keep_corrupt_col: bool = False,
) -> DataFrame:
    """Line-delimited JSON with explicit schema (nested structs/arrays come
    through typed, not as strings). The clean path supports column-free
    queries like ``read_csv`` does (see ``_clean``)."""
    full = _with_corrupt(schema) if mode == "PERMISSIVE" else schema
    df = (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if mode == "PERMISSIVE" and not keep_corrupt_col:
        df = _clean(df)
    return df


def corrupt_rows(df: DataFrame) -> DataFrame:
    """The quarantine side of a PERMISSIVE read (requires
    ``keep_corrupt_col=True``): full rows whose raw line failed the schema
    (parsed columns NULL, the offending text in ``_corrupt_record``), ready
    for a dead-letter sink. Same non-foldable-tautology discipline as
    ``_clean`` (see its docstring): Spark refuses plans referencing ONLY
    the internal corrupt column (a count() over the quarantine prunes to
    exactly that), and the documented cache remedy would materialize the
    ENTIRE parsed scan — valid rows included — on a 100 TB read. The
    tautology keeps one real column referenced instead; correctness
    unchanged, nothing cached."""
    first = df.columns[0]
    keep = F.col(CORRUPT_COL).isNotNull() & (
        F.col(first).isNull() | F.col(first).isNotNull()
    )
    return df.filter(keep)
