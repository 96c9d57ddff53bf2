"""HANA scalar-function compatibility surface (E29) and SAP storage-
convention conversions (E15).

The reference emits exactly these scalar functions in its generated SQL
(SURVEY §2.1 "explicitly absent" note): now(), add_seconds(), add_days(),
least(), ifnull(), max(), min(), right(), CASE WHEN, LIKE ... ESCAPE,
string ||, to_alphanum/to_number, top 1, distinct. Each maps 1:1 onto a
Spark builtin — everything stays JVM-side / codegen'd, no Python UDFs.

SAP conventions (VBAK.sql:1): dates stored as NVARCHAR(8) 'yyyyMMdd' with
'00000000' meaning NULL; times as NVARCHAR(6) 'HHmmss'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def now() -> Column:
    """HANA ``now()``."""
    return F.current_timestamp()


def add_seconds(ts: Column, seconds) -> Column:
    """HANA ``add_seconds(ts, n)`` (watermark staleness window,
    S4HanaProducer.java:331). Accepts negative n. Interval arithmetic works
    on both TIMESTAMP and TIMESTAMP_NTZ (the fixtures' parquet timestamps
    are NTZ)."""
    sec = F.lit(seconds) if not isinstance(seconds, Column) else seconds
    return ts + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), sec.cast("decimal(18,6)"))


def add_days(ts: Column, days) -> Column:
    """HANA ``add_days(ts, n)`` (retention, S4HanaProducer.java:475)."""
    d = F.lit(days) if not isinstance(days, Column) else days
    return ts + F.make_dt_interval(d.cast("int"), F.lit(0), F.lit(0), F.lit(0))


def ifnull(c: Column, default) -> Column:
    """HANA ``ifnull`` (watermark sentinel, S4HanaProducer.java:326-334)."""
    return F.coalesce(c, default if isinstance(default, Column) else F.lit(default))


def least(*cols: Column) -> Column:
    """HANA ``least`` (watermark combine, S4HanaProducer.java:324)."""
    return F.least(*cols)


def right(c: Column, n: int) -> Column:
    """HANA ``right(s, n)`` (trigger-suffix probe,
    S4HanaTableMapping.java:124-133)."""
    return F.substring(c, -n, n)


def like_escape(c: Column, pattern: str, escape: str = "\\") -> Column:
    """``LIKE ... ESCAPE`` (trigger-name scan, S4HanaTableMapping.java:126)."""
    return F.like(c, F.lit(pattern), F.lit(escape))


def concat(*cols) -> Column:
    """HANA ``||`` (trigger-name construction, S4HanaTableMapping.java:124)."""
    return F.concat(*[c if isinstance(c, Column) else F.lit(c) for c in cols])


def to_number(c: Column) -> Column:
    """HANA ``to_number`` (change generator, VBAK_change.sql:1)."""
    return c.cast("decimal(38,10)")


def to_alphanum(c: Column, length: int = 10) -> Column:
    """HANA ``to_alphanum`` as used by the reference's test data generator
    (VBAK_change.sql:1): numeric -> zero-padded fixed-width string."""
    return F.lpad(c.cast("bigint").cast("string"), length, "0")


# -- SAP storage conventions (E15) ------------------------------------------


def sap_date(c: Column) -> Column:
    """NVARCHAR(8) 'yyyyMMdd' -> DateType; the SAP initial value '00000000'
    (and malformed strings) -> NULL (VBAK.sql:1 ERDAT/AUDAT defaults)."""
    # try_to_date, NOT to_date: under ANSI mode (PySpark 4 default) to_date
    # RAISES on a malformed string, so one dirty ERDAT value would abort
    # the whole load instead of mapping to NULL as documented
    return F.when(c == "00000000", F.lit(None).cast("date")).otherwise(
        F.try_to_date(c, "yyyyMMdd")
    )


def sap_time(c: Column) -> Column:
    """NVARCHAR(6) 'HHmmss' -> 'HH:mm:ss' string (Spark has no TimeType —
    documented encoding, SURVEY §1.3); '000000' is midnight, kept as-is."""
    # F.concat (NULL-propagating, like HANA/DuckDB ||), not concat_ws
    # (which SKIPS null parts and would turn a NULL UZEIT into '')
    return F.concat(
        F.substring(c, 1, 2), F.lit(":"), F.substring(c, 3, 2), F.lit(":"),
        F.substring(c, 5, 2),
    )
