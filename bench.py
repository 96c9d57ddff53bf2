#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Timing = full query execution materialized via a count-ish action
(``df.foreach`` noop would skip result construction; we use
``df.write.format("noop")`` so every row is produced but nothing hits disk).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from s4hanaconnector_spark.queries import load_all
    from s4hanaconnector_spark.session import get_spark

    spark = get_spark("s4spark-bench")
    registry = load_all()
    headline = {n: q for n, q in registry.items() if q.headline}

    # warm up JVM JIT / whole-stage codegen / shuffle machinery by running
    # every headline query once at the smallest SF — otherwise the first
    # timed query absorbs ~3 s of one-time compilation that is not plan cost
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for q in headline.values():
        q.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # best-of-2 per query: the sandbox VM sees intermittent host CPU
    # starvation (same query 1.5 s or 18 s across runs with an idle guest),
    # so a single sample measures the host's mood, not the plan; the min of
    # two runs is stable to ~10% while the plan cost still dominates it
    timings: dict[str, float] = {}
    for name, q in headline.items():
        best = float("inf")
        for _ in range(2):
            df = q.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
