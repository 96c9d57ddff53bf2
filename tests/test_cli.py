"""CLI surface (the reference's REST layer analogue, O31): list, run,
plan, import-table — driven in-process through main()."""

from __future__ import annotations

import io
import json


def _run(argv):
    from s4hanaconnector_spark.cli import main

    buf = io.StringIO()
    rc = main(argv, out=buf)
    return rc, buf.getvalue()


def test_list_queries_names_every_declared_query(spark):
    from s4hanaconnector_spark.queries import load_all

    rc, out = _run(["list-queries"])
    assert rc == 0
    lines = [l for l in out.splitlines() if l]
    assert len(lines) == len(load_all())
    assert any("\toracle,headline" in l for l in lines)


def test_run_prints_json_rows(spark, sf_dir):
    rc, out = _run(["run", "cdc_order_limit", "--sf-dir", sf_dir, "--limit", "5"])
    assert rc == 0
    rows = [json.loads(l) for l in out.splitlines()]
    assert len(rows) == 5
    assert "o_orderkey" in rows[0]


def test_run_unknown_query_is_an_error(spark):
    rc, out = _run(["run", "nope"])
    assert rc == 2 and "unknown query" in out


def test_plan_prints_physical_plan(spark, sf_dir):
    rc, out = _run(["plan", "cdc_initial_load", "--sf-dir", sf_dir])
    assert rc == 0 and "FileScan parquet" in out


def test_import_table_writes_mapping_json(spark, sf_dir, tmp_path):
    rc, out = _run(
        ["import-table", "orders", "--pk", "o_orderkey",
         "--sf-dir", sf_dir, "--out-dir", str(tmp_path)]
    )
    assert rc == 0
    path = out.strip()
    m = json.load(open(path))
    assert m["pkcolumns"] == ["o_orderkey"]
    assert any(c["alias"] == "o_totalprice" for c in m["columnmappings"])


def test_raw_sql_surface(spark, sf_dir):
    """register_tables + sql(): a migrating user's arbitrary SQL runs
    unmodified against the engine catalog, with pushdown intact."""
    from s4hanaconnector_spark.catalog import sql

    df = sql(
        spark,
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "WHERE o_totalprice > 100000 GROUP BY o_orderpriority",
        sf_dir,
    )
    rows = {r["o_orderpriority"]: r["n"] for r in df.collect()}
    assert len(rows) == 5 and all(n > 0 for n in rows.values())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_schema_and_check_compat(spark, sf_dir, tmp_path):
    """schema renders the registry Avro document for a mapping file;
    check-compat gates two mapping versions (exit 0 compatible, 1 not)."""
    rc, out = _run(
        ["import-table", "orders", "--pk", "o_orderkey",
         "--sf-dir", sf_dir, "--out-dir", str(tmp_path)]
    )
    assert rc == 0
    path = out.strip()

    rc, out = _run(["schema", path])
    assert rc == 0
    doc = json.loads(out)
    assert doc["type"] == "record"
    assert any(f.get("primarykey") for f in doc["fields"])

    # identical mapping: fully compatible
    rc, out = _run(["check-compat", path, path, "--mode", "full"])
    assert rc == 0 and out.strip() == ""

    # PK change: flagged, nonzero exit
    m = json.load(open(path))
    m["pkcolumns"] = ["o_orderkey", "o_custkey"]
    p2 = str(tmp_path / "changed.json")
    json.dump(m, open(p2, "w"))
    rc, out = _run(["check-compat", path, p2])
    assert rc == 1 and "primary key" in out


def test_cli_checksum_is_deterministic(spark, capsys_out=None):
    import io
    import json as _json

    from s4hanaconnector_spark import cli

    outs = []
    for _ in range(2):
        buf = io.StringIO()
        rc = cli.main(
            [
                "checksum", "region",
                "--cols", "r_regionkey,r_name",
                "--sf-dir", "/root/testdata/sf0.001",
            ],
            out=buf,
        )
        assert rc == 0
        outs.append(_json.loads(buf.getvalue()))
    assert outs[0] == outs[1]
    assert outs[0]["n_rows"] == 5 and outs[0]["checksum"].isdigit()


def test_cli_compact_folds_committed_ranges(spark, tmp_path):
    """`compact` — the operational log-compaction pass: two committed ranges
    in, one latest-per-PK parquet base out, with the summary line reporting
    the range count and frontier."""
    from pyspark.sql import Row

    from s4hanaconnector_spark.poll import RangeCommitSink

    sink = RangeCommitSink(str(tmp_path / "out"))
    mk = lambda ct, pk, tx, v: Row(
        _change_type=ct, _transactionid=tx, id=pk, val=v
    )
    df1 = spark.createDataFrame(
        [mk("A", 1, 10, "old"), mk("A", 2, 10, "b")],
        "_change_type string, _transactionid bigint, id bigint, val string",
    )
    df2 = spark.createDataFrame(
        [mk("D", 1, 20, None)],
        "_change_type string, _transactionid bigint, id bigint, val string",
    )
    sink.write("t", 10, df1)
    sink.write("t", 20, df2)

    dest = str(tmp_path / "compacted")
    rc, out = _run(
        ["compact", str(tmp_path / "out"), "t", "--pks", "id", "--dest", dest]
    )
    assert rc == 0
    doc = json.loads(out.strip().splitlines()[-1])
    assert doc == {"ranges": 2, "txid_hi": 20, "rows": 2, "dest": dest}
    rows = {r["id"]: r["_change_type"] for r in spark.read.parquet(dest).collect()}
    assert rows == {1: "D", 2: "A"}  # key 1's newest record is the tombstone
    # unknown topic is a clean error, not a traceback
    rc, _ = _run(
        ["compact", str(tmp_path / "out"), "nope", "--pks", "id", "--dest", dest]
    )
    assert rc == 2


def test_cli_snapshot_materializes_state(spark, tmp_path):
    from pyspark.sql import Row

    from s4hanaconnector_spark.poll import RangeCommitSink

    sink = RangeCommitSink(str(tmp_path / "out"))
    df1 = spark.createDataFrame(
        [Row(_change_type="A", _transactionid=10, id=1, val="a"),
         Row(_change_type="A", _transactionid=10, id=2, val="b")],
        "_change_type string, _transactionid bigint, id bigint, val string",
    )
    df2 = spark.createDataFrame(
        [Row(_change_type="D", _transactionid=20, id=1, val=None)],
        "_change_type string, _transactionid bigint, id bigint, val string",
    )
    sink.write("t", 10, df1)
    sink.write("t", 20, df2)
    dest = str(tmp_path / "state")
    rc, out = _run(
        ["snapshot", str(tmp_path / "out"), "t", "--pks", "id",
         "--dest", dest, "--as-of", "20"]
    )
    assert rc == 0
    assert json.loads(out.strip().splitlines()[-1])["rows"] == 1
    rows = {r["id"]: r["val"] for r in spark.read.parquet(dest).collect()}
    assert rows == {2: "b"}  # key 1 died at txid 20


def test_cli_compact_drop_tombstones_yields_snapshot_base(spark, tmp_path):
    """ADVICE r7: `compact --drop-tombstones` must produce a directly
    usable `snapshot --base` — live rows only AND meta columns stripped —
    while the default (tombstone-keeping) output is REJECTED as a base,
    because apply_changes would read its 'D' rows as live and resurrect
    deleted keys."""
    from pyspark.sql import Row

    from s4hanaconnector_spark.poll import RangeCommitSink

    sink = RangeCommitSink(str(tmp_path / "out"))
    df1 = spark.createDataFrame(
        [Row(_change_type="A", _transactionid=10, id=1, val="a"),
         Row(_change_type="A", _transactionid=10, id=2, val="b")],
        "_change_type string, _transactionid bigint, id bigint, val string",
    )
    df2 = spark.createDataFrame(
        [Row(_change_type="D", _transactionid=20, id=1, val=None)],
        "_change_type string, _transactionid bigint, id bigint, val string",
    )
    sink.write("t", 10, df1)
    sink.write("t", 20, df2)

    base = str(tmp_path / "base")
    rc, out = _run(
        ["compact", str(tmp_path / "out"), "t", "--pks", "id",
         "--dest", base, "--drop-tombstones"]
    )
    assert rc == 0
    snap = spark.read.parquet(base)
    assert set(snap.columns) == {"id", "val"}  # meta columns stripped
    assert {r["id"] for r in snap.collect()} == {2}  # tombstoned key gone

    # the stripped base feeds snapshot cleanly
    dest = str(tmp_path / "state")
    rc, _ = _run(
        ["snapshot", str(tmp_path / "out"), "t", "--pks", "id",
         "--dest", dest, "--base", base]
    )
    assert rc == 0
    assert {r["id"] for r in spark.read.parquet(dest).collect()} == {2}

    # a tombstone-bearing compact output is refused as a base
    feed = str(tmp_path / "feedbase")
    rc, _ = _run(
        ["compact", str(tmp_path / "out"), "t", "--pks", "id", "--dest", feed]
    )
    assert rc == 0
    rc, out = _run(
        ["snapshot", str(tmp_path / "out"), "t", "--pks", "id",
         "--dest", dest, "--base", feed]
    )
    assert rc == 2
    assert "_change_type" in out and "drop-tombstones" in out
