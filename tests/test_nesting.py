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


def test_nest_sorts_by_requested_keys_not_struct_order(spark):
    """sort_detail_by must actually order the nested array: pre-fix the
    parameter was dead and array_sort used detail_cols field order, so any
    sort key that was not the FIRST detail column was silently ignored."""
    from s4hanaconnector_spark.operators.nesting import nest

    m = spark.createDataFrame([(1,)], "k bigint")
    d = spark.createDataFrame(
        [(1, 2, "b"), (1, 1, "a"), (1, 3, "c")], "k bigint, lineno int, v string"
    )
    out = nest(
        m, d, [{"left": "k", "right": "k"}], "items",
        detail_cols=["v", "lineno"],  # v first — struct order would sort by v
        sort_detail_by=["lineno"],
    ).collect()[0]
    assert [i["lineno"] for i in out["items"]] == [1, 2, 3]


def test_nest_prefix_fast_path_matches_wrapper_order(spark):
    """r12 optimization: when sort keys are a leading prefix of detail_cols
    (incl. the default sort_detail_by=None), nest() skips the (keys...,
    payload) sort wrapper — the bare payload struct already sorts by the
    prefix first and the remaining fields as tiebreak. The fast path must
    (a) order ties exactly like the wrapper did and (b) actually elide the
    wrapper from the plan (no __payload projection)."""
    from pyspark.sql import functions as F

    from s4hanaconnector_spark.operators.nesting import nest

    m = spark.createDataFrame([(1,)], "k bigint")
    # duplicate lineno=1 rows: the tiebreak (remaining payload fields) must
    # order (1, "a") before (1, "b") on both paths
    d = spark.createDataFrame(
        [(1, 2, "c"), (1, 1, "b"), (1, 1, "a")],
        "k bigint, lineno int, v string",
    )
    fast = nest(
        m, d, [{"left": "k", "right": "k"}], "items",
        detail_cols=["lineno", "v"], sort_detail_by=["lineno"],
    )
    assert "__payload" not in fast._jdf.queryExecution().optimizedPlan().toString()
    # the wrapper reference: force the non-prefix branch by asking for the
    # same ordering through a reordered detail_cols list, then realign
    wrapped = nest(
        m, d, [{"left": "k", "right": "k"}], "items",
        detail_cols=["v", "lineno"], sort_detail_by=["lineno", "v"],
    ).select(
        "k",
        F.transform(
            "items", lambda x: F.struct(x["lineno"].alias("lineno"), x["v"].alias("v"))
        ).alias("items"),
    )
    assert fast.collect() == wrapped.collect()
    # default sort (None -> all detail cols) takes the fast path too
    default = nest(
        m, d, [{"left": "k", "right": "k"}], "items",
        detail_cols=["lineno", "v"],
    )
    assert "__payload" not in default._jdf.queryExecution().optimizedPlan().toString()
    assert default.collect() == fast.collect()


def test_maintain_nested_docs_rejects_null_join_keys(spark):
    """A detail batch whose delete rows carry NULL join keys (join key not
    in the detail PK — the cdc_delta delete leg nulls non-PK columns) would
    silently leave stale nested documents; the operator must refuse."""
    import pytest

    from s4hanaconnector_spark.operators.nesting import maintain_nested_docs, nest

    m = spark.createDataFrame([(1,)], "k bigint")
    d = spark.createDataFrame([(1, 10, 1.0)], "k bigint, did bigint, q double")
    snap = nest(m, d, [{"left": "k", "right": "k"}], "items", detail_cols=["did", "q"])
    bad_batch = spark.createDataFrame(
        [("D", 10, None, None)], "_change_type string, did bigint, k bigint, q double"
    )
    empty_mb = spark.createDataFrame([], "_change_type string, k bigint")
    with pytest.raises(ValueError, match="NULL join-key"):
        maintain_nested_docs(
            snap, m, d, empty_mb, bad_batch, master_pk=["k"],
            joincondition=[{"left": "k", "right": "k"}], schemafield="items",
            detail_cols=["did", "q"],
        ).collect()


def test_maintain_nested_docs_allows_null_fk_on_upserts(spark):
    """NULL join keys on INSERT/UPDATE rows are legitimately-orphaned
    details (NULL never joins — a full re-nest ignores them the same way);
    only delete rows with nulled join keys are a stale-document hazard.
    Pre-fix the probe hard-failed any NULL, breaking nullable-FK feeds."""
    from s4hanaconnector_spark.operators.nesting import maintain_nested_docs, nest

    jc = [{"left": "k", "right": "k"}]
    m = spark.createDataFrame([(1,), (2,)], "k bigint")
    # current detail table includes an orphan row with NULL FK
    d = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (None, 30, 3.0)],
        "k bigint, did bigint, q double",
    )
    snap = nest(m, d, jc, "items", detail_cols=["did", "q"])
    batch = spark.createDataFrame(
        [("I", 30, None, 3.0)], "_change_type string, did bigint, k bigint, q double"
    )
    empty_mb = spark.createDataFrame([], "_change_type string, k bigint")
    out = maintain_nested_docs(
        snap, m, d, empty_mb, batch, master_pk=["k"],
        joincondition=jc, schemafield="items", detail_cols=["did", "q"],
    )
    full = nest(m, d, jc, "items", detail_cols=["did", "q"])
    assert sorted(map(str, out.collect())) == sorted(map(str, full.collect()))


def test_maintain_nested_docs_strict_mode_rejects_null_fk_updates(spark):
    """strict_update_keys (r6 ADVICE): a feed that cannot guarantee
    D(old)+I(new) delivery of key changes opts into rejecting non-delete
    rows with NULL join keys — the FK->NULL detachment that would otherwise
    silently leave the OLD parent's document stale. The same batch passes
    under the default (orphaned details legal, contract owned upstream)."""
    import pytest

    from s4hanaconnector_spark.operators.nesting import maintain_nested_docs, nest

    jc = [{"left": "k", "right": "k"}]
    m = spark.createDataFrame([(1,)], "k bigint")
    d = spark.createDataFrame([(None, 10, 1.0)], "k bigint, did bigint, q double")
    snap = nest(m, d, jc, "items", detail_cols=["did", "q"])
    # detail 10 was detached from parent 1: delivered as a bare U with NULL FK
    batch = spark.createDataFrame(
        [("U", 10, None, 1.0)], "_change_type string, did bigint, k bigint, q double"
    )
    empty_mb = spark.createDataFrame([], "_change_type string, k bigint")
    kw = dict(
        master_pk=["k"], joincondition=jc, schemafield="items",
        detail_cols=["did", "q"],
    )
    with pytest.raises(ValueError, match="strict_update_keys"):
        maintain_nested_docs(
            snap, m, d, empty_mb, batch, strict_update_keys=True, **kw
        ).collect()
    # default mode maintains (treats the row as an orphaned detail)
    maintain_nested_docs(snap, m, d, empty_mb, batch, **kw).collect()
