"""CSV/JSON source loaders (sources/files.py): explicit-schema reads,
PERMISSIVE corrupt-record quarantine, FAILFAST opt-in."""

from __future__ import annotations

import os

import pytest

from s4hanaconnector_spark.sources.files import (
    CORRUPT_COL,
    corrupt_rows,
    read_csv,
    read_json,
)


def _write(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_csv_permissive_quarantines_bad_lines(spark, tmp_path):
    p = str(tmp_path / "d" / "part.csv")
    _write(p, ["id,val", "1,a", "not-a-number,b", "3,c"])
    clean = read_csv(spark, str(tmp_path / "d"), "id bigint, val string")
    assert {(r["id"], r["val"]) for r in clean.collect()} == {(1, "a"), (3, "c")}
    # Column-free query on the clean path must be BOTH legal and correct:
    # a bare corrupt-column filter raises AnalysisException here, and
    # DROPMALFORMED would return a silently wrong 3 (unparsed count).
    # Pins the _clean tautology against future constant-folding.
    assert clean.count() == 2

    kept = read_csv(
        spark, str(tmp_path / "d"), "id bigint, val string", keep_corrupt_col=True
    )
    bad = corrupt_rows(kept).collect()
    assert len(bad) == 1 and "not-a-number" in bad[0][CORRUPT_COL]
    assert bad[0]["id"] is None  # parsed columns NULL on the quarantined row


def test_csv_failfast_raises(spark, tmp_path):
    p = str(tmp_path / "d" / "part.csv")
    _write(p, ["id,val", "1,a", "boom,b"])
    with pytest.raises(Exception):
        read_csv(
            spark, str(tmp_path / "d"), "id bigint, val string", mode="FAILFAST"
        ).collect()


def test_json_nested_schema_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "j" / "part.json")
    _write(
        p,
        [
            '{"id": 1, "meta": {"k": 10}, "tags": [1, 2]}',
            "{this is not json",
            '{"id": 2, "meta": {"k": 20}, "tags": []}',
        ],
    )
    schema = "id bigint, meta struct<k: bigint>, tags array<int>"
    clean = read_json(spark, str(tmp_path / "j"), schema)
    got = {(r["id"], r["meta"]["k"], len(r["tags"])) for r in clean.collect()}
    assert got == {(1, 10, 2), (2, 20, 0)}
    assert clean.count() == 2  # column-free query legal + correct
    kept = read_json(spark, str(tmp_path / "j"), schema, keep_corrupt_col=True)
    assert corrupt_rows(kept).count() == 1
