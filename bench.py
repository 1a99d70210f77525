"""Bench harness: times the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with the noop writer (computes every
column — count() would let Catalyst prune the work away).
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
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
    }))


if __name__ == "__main__":
    main()
