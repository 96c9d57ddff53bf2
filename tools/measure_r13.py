#!/usr/bin/env python
"""Round-13 targeted measurement harness (guide §1): time a named rung with
the noop sink under a labeled job, N samples, at the cached x10/x100 tier
dirs, with the Spark event log enabled so stage-level time/shuffle/spill/GC
can be attributed afterwards.

Usage: python tools/measure_r13.py <rung> [tier] [samples]
  rung    = one of RUNGS below
  tier    = x10 | x100 | base (default x100)
  samples = int (default 2)

Prints per-sample walls plus a stage table parsed from the event log
(stage name, wall, task time, GC time, shuffle read/write bytes, spill).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

EVDIR = "/tmp/spark-events-r13"


def get_session():
    from s4hanaconnector_spark.session import get_spark

    os.makedirs(EVDIR, exist_ok=True)
    return get_spark(
        "measure-r13",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )


def tier_dir(tier: str) -> str:
    from s4hanaconnector_spark.scale_data import default_tier_dir

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if tier == "base":
        return base
    return default_tier_dir(base, {"x10": 10, "x100": 100}[tier])


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _emb(spark, d):
    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    return (
        e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "embedding"),
        e.select(F.col("vec_id").alias("c_id"), "embedding"),
    )


def rung_ivf_probe_fixed_index(spark, d):
    """The ladder rung: 141 kmeans centroids built on the X10 tier, probe at d."""
    from s4hanaconnector_spark.operators.similarity import ivf_topk, kmeans_centroids

    q10, c10 = _emb(spark, tier_dir("x10"))
    cents = kmeans_centroids(
        c10, vec="embedding", n_centroids=141, sample_fraction=0.7, max_iter=10
    ).localCheckpoint()
    q, c = _emb(spark, d)
    return ivf_topk(q, c, k=10, n_probe=4, centroids=cents)


def rung_ivf_assign_2500(spark, d):
    from s4hanaconnector_spark.operators.similarity import ivf_topk

    q, c = _emb(spark, d)
    return ivf_topk(q, c, k=10, n_centroids=2500, n_probe=4)


def rung_nest_orders_items(spark, d):
    from s4hanaconnector_spark.queries import load_all

    return load_all()["nest_orders_items"].fn(spark, d)


def rung_join_agg(spark, d):
    from s4hanaconnector_spark.queries import load_all

    return load_all()["join_agg_small_qty_revenue"].fn(spark, d)


def rung_winnow(spark, d):
    from s4hanaconnector_spark.queries import load_all

    return load_all()["dedup_substring_winnow"].fn(spark, d)


def rung_minhash(spark, d):
    from s4hanaconnector_spark.queries import load_all

    return load_all()["dedup_minhash_lsh"].fn(spark, d)


def rung_pmi(spark, d):
    from s4hanaconnector_spark.queries import load_all

    return load_all()["collocations_pmi"].fn(spark, d)


def rung_query(name):
    def f(spark, d):
        from s4hanaconnector_spark.queries import load_all

        return load_all()[name].fn(spark, d)

    return f


RUNGS = {
    "ivf_probe_fixed_index": rung_ivf_probe_fixed_index,
    "ivf_assign_2500": rung_ivf_assign_2500,
    "nest_orders_items": rung_nest_orders_items,
    "join_agg": rung_join_agg,
    "winnow": rung_winnow,
    "minhash": rung_minhash,
    "pmi": rung_pmi,
}


def stage_report(app_id: str) -> list[dict]:
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(EVDIR) if p.startswith(app_id)]
        if not cands:
            return []
        path = os.path.join(EVDIR, cands[0])
    stages = {}
    jobs = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "desc": props.get("spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                agg = stages.setdefault(sid, {})
                agg.update(
                    name=si.get("Name", "")[:60],
                    wall=round(((comp or 0) - (sub or 0)) / 1000.0, 2),
                    tasks=si.get("Number of Tasks"),
                )
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = stages.setdefault(sid, {})
                agg["task_time"] = agg.get("task_time", 0) + m.get("Executor Run Time", 0)
                agg["gc"] = agg.get("gc", 0) + m.get("JVM GC Time", 0)
                agg["cpu"] = agg.get("cpu", 0) + m.get("Executor CPU Time", 0) // 1_000_000
                srm = m.get("Shuffle Read Metrics") or {}
                agg["sh_read"] = agg.get("sh_read", 0) + srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                agg["fetch_wait"] = agg.get("fetch_wait", 0) + srm.get("Fetch Wait Time", 0)
                swm = m.get("Shuffle Write Metrics") or {}
                agg["sh_write"] = agg.get("sh_write", 0) + swm.get("Shuffle Bytes Written", 0)
                agg["spill_mem"] = agg.get("spill_mem", 0) + m.get("Memory Bytes Spilled", 0)
                agg["spill_disk"] = agg.get("spill_disk", 0) + m.get("Disk Bytes Spilled", 0)
                pym = m.get("Python Worker Metrics") or {}
                if pym:
                    agg["py"] = agg.get("py", 0) + sum(v for v in pym.values() if isinstance(v, int))
    out = []
    for sid in sorted(stages):
        s = stages[sid]
        desc = ""
        for j in jobs.values():
            if sid in j["stages"] and j["desc"]:
                desc = j["desc"]
        out.append({"stage": sid, "desc": desc[:40], **s})
    return out


def main() -> None:
    rung = sys.argv[1]
    tier = sys.argv[2] if len(sys.argv) > 2 else "x100"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    fn = RUNGS.get(rung) or rung_query(rung)

    spark = get_session()
    app_id = spark.sparkContext.applicationId
    d = tier_dir(tier)
    print(f"rung={rung} tier={tier} dir={d} app={app_id}")
    df = fn(spark, d)
    walls = []
    for i in range(n):
        spark.sparkContext.setJobDescription(f"{rung}@{tier}#{i}")
        t0 = time.perf_counter()
        _noop(df)
        walls.append(round(time.perf_counter() - t0, 2))
        spark.sparkContext.setJobDescription(None)
    print("walls:", walls)
    spark.stop()
    time.sleep(1)
    rep = stage_report(app_id)
    total_task = sum(s.get("task_time", 0) for s in rep)
    hdr = f"{'sid':>4} {'wall':>7} {'task_s':>8} {'cpu_s':>8} {'gc_s':>6} {'shR_MB':>7} {'shW_MB':>7} {'spill_MB':>8} {'tasks':>5}  name / desc"
    print(hdr)
    for s in rep:
        print(
            f"{s['stage']:>4} {s.get('wall', 0):>7} {s.get('task_time', 0)/1000:>8.1f} "
            f"{s.get('cpu', 0)/1000:>8.1f} {s.get('gc', 0)/1000:>6.1f} "
            f"{s.get('sh_read', 0)/1e6:>7.1f} {s.get('sh_write', 0)/1e6:>7.1f} "
            f"{(s.get('spill_disk', 0))/1e6:>8.1f} {s.get('tasks', 0):>5}  "
            f"{s.get('name', '')} | {s.get('desc', '')}"
        )
    print(f"total task seconds: {total_task/1000:.1f}")


if __name__ == "__main__":
    main()
