"""Bench harness: times the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with the noop writer (computes every
column — count() would let Catalyst prune the work away).

The JSON is self-describing about measurement validity: `load` is the
host's (1,5,15)-min loadavg BEFORE the suite ran, `cpu_s` the total
CPU-seconds burned by this process tree, and `quiet` whether ambient
load was below the threshold where co-tenant contention starts to
dominate wall time on this shared host (see BENCH/ANALYSIS.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feature_engineering_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "asof_join_events",
    "backfill_interp",
    "sessionize_events",
    "rolling_causal_stats",
    "lag_lead_delta",
    "sliding_window_agg",
    "window_features_35",
    "group_topstats",
    "join_orders_customer",
    "text_quality",
    "dedup_exact",
    "minhash_lsh_dedup",
    "ann_topk",
]


def _descendants_cpu_s() -> float:
    """Sum utime+stime over this process and every live descendant (the
    JVM + Python workers are children, not reaped, so RUSAGE_CHILDREN
    misses them). Contention inflates CPU-seconds for identical work, so
    this number lets a reader judge whether a slow wall time was code or
    co-tenants."""
    me = os.getpid()
    ppid: dict[int, int] = {}
    cpu: dict[int, float] = {}
    tick = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            parts = open(f"/proc/{pid}/stat").read().rsplit(") ", 1)[1].split()
            ppid[int(pid)] = int(parts[1])
            cpu[int(pid)] = (int(parts[11]) + int(parts[12])) / tick
        except (OSError, IndexError, ValueError):
            # a pid can exit between listdir and read, leaving an empty
            # or truncated stat — skip it rather than crash the bench
            pass
    total, frontier = cpu.get(me, 0.0), {me}
    while frontier:
        frontier = {p for p, pp in ppid.items() if pp in frontier}
        total += sum(cpu.get(p, 0.0) for p in frontier)
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load_before = tuple(float(x) for x in open("/proc/loadavg").read().split()[:3])
    spark = get_spark("fes-bench")

    from feature_engineering_spark.plans.driver_queries import QUERIES

    # Warmup: spin up Python workers + JIT the scan paths so per-query
    # timings measure the operators, not session cold start.
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: (b for b in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    for t in ["events", "orders", "customer", "lineitem"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "asof_window_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load": list(load_before),
        "cpu_s": round(_descendants_cpu_s(), 1),
        "quiet": load_before[0] < 6.0,
    }))


if __name__ == "__main__":
    main()
