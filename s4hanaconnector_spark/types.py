"""HANA type-string -> Spark type mapping (SURVEY §1.3).

Mirrors the reference's two mapping layers:
  (a) HANA type string -> Avro schema: ``getDataType()``,
      S4HanaTableMapping.java:603-677 (regex-parsed ``decimal(p,s)`` strings);
  (b) JDBC value -> Java value: ``convert()``, S4HanaProducer.java:216-315.

In Spark, (b) is a no-op — DataFrames are already typed — so only (a) is
implemented, with the documented choices for types Spark lacks:

  * TINYINT is unsigned 0..255 in HANA (comment at
    S4HanaTableMapping.java:619) -> ShortType, NOT ByteType (signed, would
    overflow at 128).
  * TIME has no Spark type -> StringType 'HH:mm:ss' (documented choice).
  * ST_POINT / ST_GEOMETRY -> StringType carrying WKT.
  * Unknown types raise ValueError, matching the reference's
    PropertiesException ("references a data type which is not known",
    S4HanaTableMapping.java:674-676).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_PARAM_RE = re.compile(r"^\s*([A-Za-z_ ]+?)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?\s*$")

# fixed (parameterless) mappings
_SIMPLE: dict[str, T.DataType] = {
    "TINYINT": T.ShortType(),  # unsigned 0..255 (S4HanaTableMapping.java:619)
    "SMALLINT": T.ShortType(),
    "INTEGER": T.IntegerType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "REAL": T.FloatType(),
    "FLOAT": T.DoubleType(),
    "DOUBLE": T.DoubleType(),
    "DATE": T.DateType(),
    "TIME": T.StringType(),  # no TimeType in Spark; 'HH:mm:ss' strings
    "TIMESTAMP": T.TimestampType(),  # µs precision, matches AvroTimestampMicros
    "SECONDDATE": T.TimestampType(),  # second precision (AvroTimestamp millis)
    "CLOB": T.StringType(),
    "NCLOB": T.StringType(),
    "TEXT": T.StringType(),
    "SHORTTEXT": T.StringType(),
    "BINTEXT": T.BinaryType(),
    "BLOB": T.BinaryType(),
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
    "BOOLEAN": T.BooleanType(),
    "ST_POINT": T.StringType(),  # WKT
    "ST_GEOMETRY": T.StringType(),  # WKT
}

_VARCHAR_FAMILY = {"VARCHAR", "CHAR", "NVARCHAR", "NCHAR", "ALPHANUM"}


def hana_to_spark(decl: str) -> T.DataType:
    """Map a HANA type declaration string to a Spark DataType.

    >>> hana_to_spark("DECIMAL(7,4)")
    DecimalType(7,4)
    >>> hana_to_spark("NVARCHAR(8)")
    StringType()
    """
    m = _PARAM_RE.match(decl or "")
    if not m:
        raise ValueError(f"Table mapping references a data type which is not known: {decl!r}")
    base = m.group(1).upper().strip()
    p = int(m.group(2)) if m.group(2) else None
    s = int(m.group(3)) if m.group(3) else 0

    if base in _SIMPLE:
        return _SIMPLE[base]
    if base in _VARCHAR_FAMILY:
        # length is metadata only; Spark strings are unbounded
        return T.StringType()
    if base == "DECIMAL":
        if p is None:
            # bare DECIMAL: HANA treats as float-ish decimal; use max precision
            return T.DecimalType(38, 10)
        if not 1 <= p <= 38:
            raise ValueError(f"DECIMAL precision out of range 1..38: {decl!r}")
        return T.DecimalType(p, s)
    if base == "SMALLDECIMAL":
        # DOCUMENTED LOSSY CHOICE (reference parity): HANA SMALLDECIMAL is
        # a FLOATING-scale decimal (precision 1..16, scale -369..368) that
        # no fixed-point Spark type represents faithfully. The reference
        # maps it to AvroDecimal(length, scale) with the DECLARED scale
        # (S4HanaTableMapping.java:633-634) — a bare declaration therefore
        # lands at scale 0 and drops fractional digits there exactly as it
        # does here. Declare SMALLDECIMAL(p, s) in the mapping (or cast to
        # DOUBLE upstream) when fractions are data.
        return T.DecimalType(16, s)
    raise ValueError(f"Table mapping references a data type which is not known: {decl!r}")


def spark_type_name(decl: str) -> str:
    """DDL-style name of the mapped Spark type (for specs/goldens)."""
    return hana_to_spark(decl).simpleString()
