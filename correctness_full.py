"""Full-registry correctness artifact: run EVERY declared query against its
DuckDB oracle at sf0.01 and write ``CORRECTNESS_FULL.json`` — the in-repo,
auditable parity record for the whole registry (the driver's per-round
``CORRECTNESS_r*.json`` samples 50 queries; this closes the evidence gap for
the rest — ADVICE r3).

Usage: ``python correctness_full.py [sf_dir]`` (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from pyspark.sql import SparkSession
    from tests.parity import assert_parity

    # a PLAIN session, mirroring the driver's injected one — running under
    # get_spark's tuned confs (UTC, nanosAsLong, Arrow) would let this
    # artifact stay green for queries that only work WITH those confs,
    # exactly the portability gap it exists to audit. Only result-neutral
    # infra knobs here.
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("correctness-full-plain")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    con = duckdb.connect()
    for n in TABLES:
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{sf}/{n}.parquet'")
    qs, oracles = e.queries(), e.oracle_sql()
    out: dict[str, dict] = {}
    failed = 0
    for name, fn in qs.items():
        t0 = time.time()
        rec: dict = {"ok": False, "oracle": name in oracles, "err": None}
        try:
            sdf = fn(spark, sf)
            if name in oracles:
                # assert_parity returns the verified row count — re-running
                # the oracle for a separate count(*) would execute every
                # (sometimes expensive) oracle twice
                rec["rows"] = assert_parity(sdf, con, oracles[name], name)
            else:
                rec["rows"] = sdf.count()
            rec["ok"] = True
        except Exception as ex:  # record, keep going
            failed += 1
            rec["err"] = repr(ex)[:400]
        rec["sec"] = round(time.time() - t0, 2)
        out[name] = rec
        print(("OK  " if rec["ok"] else "FAIL"), name, flush=True)
    n_oracle = sum(1 for r in out.values() if r["oracle"] and r["ok"])
    artifact = {
        "sf_dir": sf,
        "n_queries": len(qs),
        "n_ok": len(qs) - failed,
        "n_fail": failed,
        # how many of the oks were actually ORACLE-VERIFIED (vs rows-only
        # smoke for non-SQL-expressible queries) — the summary must not
        # conflate "parity-proven" with "didn't crash"
        "n_oracle_checked": n_oracle,
        "queries": out,
    }
    # anchor to the repo, not the cwd: run from anywhere, the committed
    # artifact is the one that updates
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "CORRECTNESS_FULL.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(
        f"wrote CORRECTNESS_FULL.json: {len(qs) - failed}/{len(qs)} ok "
        f"({n_oracle} oracle-verified)"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
