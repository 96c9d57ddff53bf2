"""Type-mapping and mapping-spec unit tests (SURVEY §5.3/§5.4), mirroring the
reference's ConversionTest and the golden mapping JSON."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from s4hanaconnector_spark.mapping import (
    ColumnMapping,
    TableMapping,
    decode_name,
    encode_name,
)
from s4hanaconnector_spark.types import hana_to_spark


@pytest.mark.parametrize(
    "decl,expected",
    [
        ("TINYINT", T.ShortType()),  # unsigned 0..255 — ByteType would overflow
        ("SMALLINT", T.ShortType()),
        ("INTEGER", T.IntegerType()),
        ("BIGINT", T.LongType()),
        ("DECIMAL(7,4)", T.DecimalType(7, 4)),  # ConversionTest.java:24-32 shape
        ("DECIMAL(15,2)", T.DecimalType(15, 2)),
        ("DECIMAL(38,10)", T.DecimalType(38, 10)),
        ("SMALLDECIMAL", T.DecimalType(16, 0)),
        ("REAL", T.FloatType()),
        ("DOUBLE", T.DoubleType()),
        ("VARCHAR(30)", T.StringType()),
        ("NVARCHAR(8)", T.StringType()),
        ("ALPHANUM(10)", T.StringType()),
        ("BLOB", T.BinaryType()),
        ("VARBINARY(100)", T.BinaryType()),
        ("DATE", T.DateType()),
        ("TIME", T.StringType()),
        ("TIMESTAMP", T.TimestampType()),
        ("SECONDDATE", T.TimestampType()),
        ("CLOB", T.StringType()),
        ("NCLOB", T.StringType()),
        ("TEXT", T.StringType()),
        ("SHORTTEXT(200)", T.StringType()),
        ("ST_POINT", T.StringType()),
        ("ST_GEOMETRY(4326)", T.StringType()),
        ("BOOLEAN", T.BooleanType()),
    ],
)
def test_hana_to_spark(decl, expected):
    assert hana_to_spark(decl) == expected


def test_unknown_type_raises():
    """Matches the reference's PropertiesException
    (S4HanaTableMapping.java:674-676)."""
    with pytest.raises(ValueError, match="not known"):
        hana_to_spark("GEOBLOB")
    with pytest.raises(ValueError):
        hana_to_spark("DECIMAL(99,2)")


def test_name_encoding_roundtrip():
    """`::` encodes as _x003a_x003a while dots stay literal — matching the
    reference's own sample mapping filename
    (tmp/sap.hana.democontent.epm.data_x003a_x003aSO.Header.json)."""
    assert encode_name("sap.hana.democontent.epm.data::SO.Header") == (
        "sap.hana.democontent.epm.data_x003a_x003aSO.Header"
    )
    for name in ["plain", "a::b", "with space", "a/b\\c", "ünïcode", "dotted.name"]:
        assert decode_name(encode_name(name)) == name


def test_mapping_json_roundtrip(tmp_path):
    m = TableMapping(
        name="epm::SO.Header",
        mastertable="orders",
        columnmappings=[
            ColumnMapping("o_orderkey", '"L1"."o_orderkey"', "BIGINT"),
            ColumnMapping("status_u", 'upper("L1"."o_orderstatus")', "NVARCHAR(1)"),
        ],
        pkcolumns=["o_orderkey"],
        initialloadwhere="o_totalprice > 0",
    )
    path = m.write(str(tmp_path))
    assert "_x003a_x003a" in path
    m2 = TableMapping.read(str(tmp_path), "epm::SO.Header")
    assert m2.to_json() == m.to_json()
    assert TableMapping.list_mappings(str(tmp_path)) == ["epm::SO.Header"]
    m2.delete(str(tmp_path))
    assert TableMapping.list_mappings(str(tmp_path)) == []


def test_struct_type_marks_pks_nullable_fields():
    m = TableMapping(
        name="t",
        mastertable="t",
        columnmappings=[
            ColumnMapping("id", '"L1"."id"', "BIGINT"),
            ColumnMapping("d", '"L1"."d"', "DECIMAL(7,4)"),
        ],
        pkcolumns=["id"],
    )
    st = m.struct_type()
    assert st["id"].nullable  # every field nullable (S4HanaTableMapping.java:583)
    assert st["id"].metadata["pk_position"] == 1
    assert st["d"].dataType == T.DecimalType(7, 4)
    assert "pk_position" not in st["d"].metadata


def test_computed_column_source_recovery():
    assert ColumnMapping("k", '"L1"."o_orderkey"').source_column == "o_orderkey"
    assert ColumnMapping("k", 'upper("L1"."x")').source_column is None


def test_pk_required():
    import pandas as pd

    with pytest.raises(ValueError, match="primary keys"):
        TableMapping.infer(None, "t", [])


class TestSchemaEvolution:
    """Source tables grow columns over time (SAP appends Z-fields); the
    ingest layer must unify old and new batches without rewriting history."""

    def test_merge_schema_unifies_batches(self, spark, tmp_path):
        base = str(tmp_path / "evolving")
        spark.createDataFrame([(1, "x")], "id long, a string").write.parquet(
            base + "/b0"
        )
        spark.createDataFrame(
            [(2, "y", 42)], "id long, a string, z_new long"
        ).write.parquet(base + "/b1")
        df = spark.read.option("mergeSchema", True).parquet(base + "/b0", base + "/b1")
        assert set(df.columns) == {"id", "a", "z_new"}
        rows = {r["id"]: r for r in df.collect()}
        assert rows[1]["z_new"] is None  # old rows: new column is null
        assert rows[2]["z_new"] == 42

    def test_mapping_reinfer_picks_up_new_column(self, spark, tmp_path):
        from s4hanaconnector_spark.mapping import TableMapping

        df0 = spark.createDataFrame([(1, "x")], "id long, a string")
        m0 = TableMapping.infer(df0, "t", ["id"])
        df1 = spark.createDataFrame([(1, "x", 1.5)], "id long, a string, z double")
        m1 = TableMapping.infer(df1, "t", ["id"])
        assert [c.alias for c in m0.columnmappings] == ["id", "a"]
        assert [c.alias for c in m1.columnmappings] == ["id", "a", "z"]
        # old mapping still valid against the evolved table (projection subset)
        proj = df1.select(*[c.as_spark() for c in m0.columnmappings])
        assert proj.columns == ["id", "a"]


def test_sap_date_malformed_is_null_not_crash(spark):
    """Under ANSI mode (PySpark 4 default) to_date RAISES on malformed
    input; sap_date must map dirty ERDAT values to NULL as documented."""
    from s4hanaconnector_spark import functions as H
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("20230501",), ("00000000",), ("garbage!",), ("20231332",), (None,)],
        "d string",
    )
    got = [r["x"] for r in df.select(H.sap_date(F.col("d")).alias("x")).collect()]
    assert got[0] is not None
    assert got[1:] == [None, None, None, None]


def test_sap_time_null_propagates(spark):
    """concat_ws skips NULL parts (NULL UZEIT -> ''); sap_time must
    NULL-propagate like the HANA/DuckDB || operator."""
    from s4hanaconnector_spark import functions as H
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("123456",), (None,)], "t string")
    got = [r["x"] for r in df.select(H.sap_time(F.col("t")).alias("x")).collect()]
    assert got == ["12:34:56", None]


def test_mapping_requires_primary_key():
    """PK-less mappings fail at construction (the reference's 'only works
    on tables with primary keys'), not downstream in a zero-column merge."""
    import pytest

    from s4hanaconnector_spark.mapping import ColumnMapping, TableMapping

    with pytest.raises(ValueError, match="no primary key"):
        TableMapping(
            name="x", mastertable="x",
            columnmappings=[ColumnMapping("a", '"L1"."a"')], pkcolumns=[],
        )
