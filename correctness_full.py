"""Full-registry correctness artifact: run EVERY declared query against its
DuckDB oracle at sf0.01 and write ``CORRECTNESS_FULL.json`` — the in-repo,
auditable parity record for the whole registry (the driver's per-round
``CORRECTNESS_r*.json`` samples 50 queries; this closes the evidence gap for
the rest — ADVICE r3).

Usage: ``python correctness_full.py [sf_dir]`` (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import json
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
    from s4hanaconnector_spark.session import get_spark
    from tests.parity import assert_parity

    spark = get_spark()
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
                assert_parity(sdf, con, oracles[name], name)
                rec["rows"] = con.execute(
                    f"SELECT count(*) FROM ({oracles[name]})"
                ).fetchone()[0]
            else:
                rec["rows"] = sdf.count()
            rec["ok"] = True
        except Exception as ex:  # record, keep going
            failed += 1
            rec["err"] = repr(ex)[:400]
        rec["sec"] = round(time.time() - t0, 2)
        out[name] = rec
        print(("OK  " if rec["ok"] else "FAIL"), name, flush=True)
    artifact = {
        "sf_dir": sf,
        "n_queries": len(qs),
        "n_ok": len(qs) - failed,
        "n_fail": failed,
        "queries": out,
    }
    with open("CORRECTNESS_FULL.json", "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote CORRECTNESS_FULL.json: {len(qs) - failed}/{len(qs)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
