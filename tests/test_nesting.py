"""Item-level assertions for business-object nesting (E14) — the declared
query only hash-checks flattened summaries; here we assert the nested
structure itself."""

from __future__ import annotations

from pyspark.sql import Row

from s4hanaconnector_spark.operators.nesting import nest


def test_nest_structure(spark):
    master = spark.createDataFrame(
        [Row(k=1, name="a"), Row(k=2, name="b"), Row(k=3, name="empty")],
        "k bigint, name string",
    )
    detail = spark.createDataFrame(
        [
            Row(fk=1, line=2, qty=20.0),
            Row(fk=1, line=1, qty=10.0),
            Row(fk=2, line=1, qty=5.0),
        ],
        "fk bigint, line int, qty double",
    )
    out = nest(
        master,
        detail,
        joincondition=[{"left": "k", "right": "fk"}],
        schemafield="items",
        detail_cols=["line", "qty"],
    )
    rows = {r["k"]: r for r in out.collect()}
    assert [i["line"] for i in rows[1]["items"]] == [1, 2]  # deterministic sort
    assert rows[1]["items"][0]["qty"] == 10.0
    assert [i["line"] for i in rows[2]["items"]] == [1]
    assert rows[3]["items"] == []  # empty array, not NULL
    # master columns preserved
    assert rows[3]["name"] == "empty"


def test_recursive_business_object(spark, sf_dir):
    """Two-level nesting via the relations tree: customer -> orders ->
    lineitem. The detail's own relation appears INSIDE its structs
    (the reference's recursive `relations` key, tmp JSON:148)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from s4hanaconnector_spark.mapping import ColumnMapping, Relation, TableMapping
    from s4hanaconnector_spark.operators.nesting import materialize_business_object

    items = TableMapping(
        name="so.item", mastertable="lineitem",
        columnmappings=[
            ColumnMapping("l_linenumber", '"L3"."l_linenumber"'),
            ColumnMapping("l_quantity", '"L3"."l_quantity"'),
        ],
        pkcolumns=["l_orderkey", "l_linenumber"],
    )
    orders = TableMapping(
        name="so.header", mastertable="orders",
        columnmappings=[
            ColumnMapping("o_orderkey", '"L2"."o_orderkey"'),
            ColumnMapping("o_totalprice", '"L2"."o_totalprice"'),
        ],
        pkcolumns=["o_orderkey"],
        relations=[
            Relation(detail=items, schemafield="items",
                     joincondition=[{"left": "o_orderkey", "right": "l_orderkey"}])
        ],
    )
    cust = TableMapping(
        name="so.customer", mastertable="customer",
        columnmappings=[
            ColumnMapping("c_custkey", '"L1"."c_custkey"'),
            ColumnMapping("c_name", '"L1"."c_name"'),
        ],
        pkcolumns=["c_custkey"],
        relations=[
            Relation(detail=orders, schemafield="orders",
                     joincondition=[{"left": "c_custkey", "right": "o_custkey"}])
        ],
    )

    def load(name):
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    doc = materialize_business_object(cust, load)

    # schema: orders is array<struct<..., items: array<struct<...>>>>
    o_type = doc.schema["orders"].dataType
    assert isinstance(o_type, T.ArrayType)
    assert "items" in o_type.elementType.fieldNames()
    assert isinstance(o_type.elementType["items"].dataType, T.ArrayType)

    # content spot-check: pick a customer with orders, verify counts at
    # both levels against direct filters
    row = doc.filter(F.size("orders") > 0).orderBy("c_custkey").first()
    o = load("orders")
    li = load("lineitem")
    want_orders = o.filter(o.o_custkey == row["c_custkey"]).count()
    assert len(row["orders"]) == want_orders
    first_order = sorted(row["orders"], key=lambda r: r["o_orderkey"])[0]
    want_items = li.filter(li.l_orderkey == first_order["o_orderkey"]).count()
    assert len(first_order["items"]) == want_items
