#!/usr/bin/env python
"""Capture .explain('formatted') for headline (or named) queries into
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (default r13) — the
before/after plan evidence for the optimization round.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag    = 'before' or 'after' (file suffix)
  query  = registry names; default = every headline query
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from s4hanaconnector_spark.queries import load_all
    from s4hanaconnector_spark.session import get_spark

    spark = get_spark("plan-capture")
    registry = load_all()
    if not names:
        names = [n for n, q in registry.items() if q.headline]

    out_dir = os.path.join(
        HERE, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        q = registry[name]
        df = q.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({tag})\n")
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
