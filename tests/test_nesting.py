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
