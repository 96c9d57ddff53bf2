"""Golden-file schema test (SURVEY §5.4): the committed mapping JSON — with
the reference's ``::``-in-name encoding and a nested business-object
relation, mirroring the structure of the reference's sample
src/test/resources/tmp/...SO.Header.json — loads, round-trips through the
encoded filename, produces the expected StructType, and materializes as a
nested DataFrame end-to-end."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import types as T

from s4hanaconnector_spark.mapping import TableMapping, encode_name
from s4hanaconnector_spark.operators.nesting import nest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "demo.orders_x003a_x003aSO.Header.json")


def load_golden() -> TableMapping:
    with open(GOLDEN) as f:
        return TableMapping.from_json(json.load(f))


def test_golden_filename_is_encoded_name():
    m = load_golden()
    assert m.name == "demo.orders::SO.Header"
    assert os.path.basename(GOLDEN) == encode_name(m.name) + ".json"


def test_golden_struct_type():
    m = load_golden()
    expected = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True, {"pk_position": 1}),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("status_u", T.StringType(), True),
            T.StructField("o_totalprice", T.DecimalType(15, 2), True),
        ]
    )
    got = m.struct_type()
    assert [(f.name, f.dataType) for f in got.fields] == [
        (f.name, f.dataType) for f in expected.fields
    ]
    assert got["o_orderkey"].metadata == {"pk_position": 1}


def test_golden_relation_parsed():
    m = load_golden()
    assert len(m.relations) == 1
    r = m.relations[0]
    assert r.schemafield == "items"
    assert r.joincondition == [{"left": "o_orderkey", "right": "l_orderkey"}]
    assert r.detail.mastertable == "lineitem"
    assert r.detail.pkcolumns == ["l_orderkey", "l_linenumber"]


def test_golden_write_read_roundtrip(tmp_path):
    m = load_golden()
    path = m.write(str(tmp_path))
    assert os.path.basename(path) == "demo.orders_x003a_x003aSO.Header.json"
    back = TableMapping.read(str(tmp_path), m.name)
    assert back.to_json() == m.to_json()


def test_golden_materializes_nested(spark, sf_dir):
    """End-to-end: the golden spec drives a real nested materialization —
    master projection from columnmappings, detail rows nested under the
    relation's schemafield."""
    m = load_golden()
    r = m.relations[0]
    master = spark.read.parquet(f"{sf_dir}/orders.parquet").select(m.projection())
    detail_src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    detail = detail_src.select(
        "l_orderkey", *[cm.as_spark() for cm in r.detail.columnmappings]
    )
    nested = nest(
        master,
        detail,
        joincondition=r.joincondition,
        schemafield=r.schemafield,
        detail_cols=[cm.alias for cm in r.detail.columnmappings],
    )
    row = nested.filter(nested.o_orderkey.isNotNull()).orderBy("o_orderkey").first()
    item_type = nested.schema["items"].dataType
    assert isinstance(item_type, T.ArrayType)
    assert set(item_type.elementType.fieldNames()) == {
        "l_linenumber", "l_quantity", "l_extendedprice",
    }
    # spot-check content against a direct filter
    want = detail.filter(detail.l_orderkey == row["o_orderkey"]).count()
    assert len(row["items"]) == want
