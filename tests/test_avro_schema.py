"""Avro schema export (O28/O29 registry document): golden-file test against
the committed .avsc, type-switch edges, strict-name encoding, and the
reference's error cases. Counterpart of the driver-gated
``avro_schema_export`` query (queries/surface.py)."""

from __future__ import annotations

import json
import os

import pytest

from s4hanaconnector_spark.avro_schema import (
    avro_encode_name,
    field_to_avro,
    hana_to_avro,
    mapping_to_avro,
    mapping_to_avro_json,
)
from s4hanaconnector_spark.mapping import ColumnMapping, TableMapping

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
MAPPING_GOLDEN = os.path.join(GOLDEN_DIR, "demo.orders_x003a_x003aSO.Header.json")
AVSC_GOLDEN = os.path.join(GOLDEN_DIR, "demo.orders_x003a_x003aSO.Header.avsc")


def load_golden() -> TableMapping:
    with open(MAPPING_GOLDEN) as f:
        return TableMapping.from_json(json.load(f))


def test_golden_avsc_byte_stable():
    """The rendered registry document for the reference-shaped sample
    mapping equals the committed golden byte for byte."""
    got = mapping_to_avro_json(load_golden(), namespace="s4hanaconnector_spark")
    with open(AVSC_GOLDEN) as f:
        assert got + "\n" == f.read()


def test_golden_avsc_shape():
    doc = mapping_to_avro(load_golden())
    assert doc["type"] == "record"
    # record name is Avro-strict: dots AND '::' encoded
    assert doc["name"] == "demo_x002eorders_x003a_x003aSO_x002eHeader"
    fields = {f["name"]: f for f in doc["fields"]}
    # every field nullable union with null default (createSchema passes
    # nullable=true for every column, S4HanaTableMapping.java:582)
    for f in doc["fields"]:
        assert f["type"][0] == "null" and f["default"] is None
    # PK flag + position (setPrimaryKey, :583-585)
    assert fields["o_orderkey"]["primarykey"] is True
    assert fields["o_orderkey"]["pkposition"] == 1
    assert "primarykey" not in fields["o_custkey"]
    # decimal logical type with precision/scale
    dec = fields["o_totalprice"]["type"][1]
    assert dec == {
        "type": "bytes", "logicalType": "decimal", "precision": 15, "scale": 2,
    }
    # bounded string carries its HANA length
    assert fields["status_u"]["type"][1] == {"type": "string", "maxLength": 1}


@pytest.mark.parametrize(
    "decl,expected",
    [
        # one assertion per switch branch family (getDataType, :603-677)
        ("TINYINT", "int"),          # unsigned 0..255 -> must not be a byte
        ("SMALLINT", "int"),
        ("INTEGER", "int"),
        ("BIGINT", "long"),
        ("REAL", "float"),
        ("DOUBLE", "double"),
        ("BLOB", "bytes"),
        ("BINTEXT", "bytes"),
        ("DATE", {"type": "int", "logicalType": "date"}),
        ("TIME", {"type": "int", "logicalType": "time-millis"}),
        ("TIMESTAMP", {"type": "long", "logicalType": "timestamp-micros"}),
        ("SECONDDATE", {"type": "long", "logicalType": "timestamp-millis"}),
        ("CLOB", "string"),
        ("TEXT", "string"),
        ("BOOLEAN", "boolean"),
        # parameterized, with the reference's whitespace tolerance (:604)
        (
            "DECIMAL( 15 , 2 )",
            {"type": "bytes", "logicalType": "decimal", "precision": 15, "scale": 2},
        ),
        (
            "SMALLDECIMAL",
            {"type": "bytes", "logicalType": "decimal", "precision": 16, "scale": 0},
        ),
        ("NVARCHAR(10)", {"type": "string", "maxLength": 10}),
        ("ALPHANUM(12)", {"type": "string", "maxLength": 12}),
    ],
)
def test_type_switch(decl, expected):
    assert hana_to_avro(decl) == expected


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="not known"):
        hana_to_avro("HYPERLOGLOG")


def test_empty_mapping_raises():
    m = TableMapping(name="e", mastertable="e", pkcolumns=["k"])
    with pytest.raises(ValueError, match="does not contain any columns"):
        mapping_to_avro(m)


def test_avro_names_strict():
    """Avro names must match [A-Za-z_][A-Za-z0-9_]* — dots, colons, and
    leading digits all encode; plain identifiers pass through; the
    underscore-before-x ambiguity is escaped so decode is unambiguous."""
    assert avro_encode_name("SALESORDERID") == "SALESORDERID"
    assert avro_encode_name("HISTORY.CREATEDAT") == "HISTORY_x002eCREATEDAT"
    assert avro_encode_name("A::B") == "A_x003a_x003aB"
    assert avro_encode_name("1COL") == "_x0031COL"
    assert avro_encode_name("a_xb") == "a_x005fxb"
    import re

    for raw in ["HISTORY.CREATEDBY.EMPLOYEEID", "9lives", "A::B", "ok_name"]:
        assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", avro_encode_name(raw))


def test_computed_column_without_decl_defaults_to_string():
    f = field_to_avro(ColumnMapping("c", 'upper("L1"."x")', None), [])
    assert f["type"] == ["null", "string"] and "hanadatatype" not in f


class TestCompatibility:
    def _m(self, cols, pks):
        from s4hanaconnector_spark.mapping import ColumnMapping, TableMapping

        return TableMapping(
            name="t",
            mastertable="t",
            columnmappings=[ColumnMapping(c, f'"L1"."{c}"', d) for c, d in cols],
            pkcolumns=pks,
        )

    def test_added_nullable_column_is_fully_compatible(self):
        from s4hanaconnector_spark.avro_schema import compatibility, mapping_to_avro

        old = mapping_to_avro(self._m([("k", "BIGINT"), ("a", "NVARCHAR(10)")], ["k"]))
        new = mapping_to_avro(
            self._m([("k", "BIGINT"), ("a", "NVARCHAR(10)"), ("b", "DOUBLE")], ["k"])
        )
        assert compatibility(old, new, "full") == []

    def test_widened_int_is_backward_only(self):
        from s4hanaconnector_spark.avro_schema import compatibility, mapping_to_avro

        old = mapping_to_avro(self._m([("k", "BIGINT"), ("n", "INTEGER")], ["k"]))
        new = mapping_to_avro(self._m([("k", "BIGINT"), ("n", "BIGINT")], ["k"]))
        # new long reader resolves old int data...
        assert compatibility(old, new, "backward") == []
        # ...but an old int reader cannot take long data
        assert any("cannot resolve" in i for i in compatibility(old, new, "forward"))

    def test_decimal_scale_change_flagged(self):
        from s4hanaconnector_spark.avro_schema import compatibility, mapping_to_avro

        old = mapping_to_avro(self._m([("k", "BIGINT"), ("v", "DECIMAL(18,2)")], ["k"]))
        new = mapping_to_avro(self._m([("k", "BIGINT"), ("v", "DECIMAL(18,4)")], ["k"]))
        assert any("cannot resolve" in i for i in compatibility(old, new, "backward"))

    def test_pk_change_always_reported(self):
        from s4hanaconnector_spark.avro_schema import compatibility, mapping_to_avro

        old = mapping_to_avro(self._m([("k", "BIGINT"), ("a", "BIGINT")], ["k"]))
        new = mapping_to_avro(self._m([("k", "BIGINT"), ("a", "BIGINT")], ["k", "a"]))
        for mode in ("backward", "forward", "full"):
            assert any("primary key" in i for i in compatibility(old, new, mode)), mode


class TestSchemaDrift:
    def _schema(self, ddl):
        from pyspark.sql import types as T

        return T.StructType.fromDDL(ddl)

    def test_added_nullable_column_is_backward_compatible(self, spark):
        from s4hanaconnector_spark.avro_schema import schema_drift

        old = self._schema("id bigint, val string")
        new = self._schema("id bigint, val string, extra double")
        assert schema_drift(old, new, "backward", pkcolumns=["id"]) == []

    def test_type_change_is_rejected(self, spark):
        from s4hanaconnector_spark.avro_schema import schema_drift

        old = self._schema("id bigint, val string")
        new = self._schema("id bigint, val bigint")
        issues = schema_drift(old, new, "backward", pkcolumns=["id"])
        assert issues and "val" in issues[0]

    def test_int_to_long_promotion_allowed(self, spark):
        from s4hanaconnector_spark.avro_schema import schema_drift

        old = self._schema("id bigint, n int")
        new = self._schema("id bigint, n bigint")
        # Avro resolution promotes int -> long when reading old data
        assert schema_drift(old, new, "backward", pkcolumns=["id"]) == []

    def test_dropped_column_fails_forward(self, spark):
        from s4hanaconnector_spark.avro_schema import schema_drift

        old = self._schema("id bigint, val string, gone double")
        new = self._schema("id bigint, val string")
        # forward: old consumers read new data; nullable default saves it
        assert schema_drift(old, new, "forward", pkcolumns=["id"]) == []
        # but a decimal scale change never resolves
        old2 = self._schema("id bigint, d decimal(18,2)")
        new2 = self._schema("id bigint, d decimal(18,4)")
        assert schema_drift(old2, new2, "backward", pkcolumns=["id"])


class TestRegistryRoundTrip:
    def test_mapping_to_avro_to_mapping_identity(self):
        from s4hanaconnector_spark.avro_schema import avro_to_mapping, mapping_to_avro
        from s4hanaconnector_spark.mapping import ColumnMapping, TableMapping

        m = TableMapping(
            name="demo::SO.Header",
            mastertable="t",
            columnmappings=[
                ColumnMapping("SalesOrderId", '"L1"."SalesOrderId"', "NVARCHAR(10)"),
                ColumnMapping("GrossAmount", '"L1"."GrossAmount"', "DECIMAL(15,2)"),
                ColumnMapping("CreatedAt", '"L1"."CreatedAt"', "TIMESTAMP"),
            ],
            pkcolumns=["SalesOrderId"],
        )
        doc = mapping_to_avro(m)
        back = avro_to_mapping(doc, mastertable="t")
        assert back.name == m.name
        assert back.pkcolumns == m.pkcolumns
        assert [(c.alias, c.hanadatatype) for c in back.columnmappings] == [
            (c.alias, c.hanadatatype) for c in m.columnmappings
        ]
        # and the re-render is byte-identical
        assert mapping_to_avro(back) == doc

    def test_name_decode_inverts_encode(self):
        from s4hanaconnector_spark.avro_schema import avro_decode_name, avro_encode_name

        for s in ["demo::SO.Header", "a_xb", "1leading", "plain_name", "ä::ö"]:
            assert avro_decode_name(avro_encode_name(s)) == s
