"""Round-6 measurement harness (guide §1): per-query noop-sink timing with
repeats + plan capture, SEPARATE from the frozen bench.py.

Usage:
    python bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries minhash_lsh_dedup,sliding_window_agg --repeats 3
    python bench_extra.py --explain-dir plans/r06 --suffix before

Prints one JSON line: {"sf_dir": ..., "load": [...], "queries": {name:
[sec, ...]}}. --explain-dir writes <query>_<suffix>.txt with
explain("formatted") for each selected query (no execution).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feature_engineering_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "asof_join_events", "backfill_interp", "sessionize_events",
    "rolling_causal_stats", "lag_lead_delta", "sliding_window_agg",
    "window_features_35", "group_topstats", "join_orders_customer",
    "text_quality", "dedup_exact", "minhash_lsh_dedup", "ann_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--queries", default=None,
                    help="comma list; default = bench.py headline set")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--explain-dir", default=None,
                    help="write explain('formatted') per query, skip timing")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else DEFAULT
    load = tuple(float(x) for x in open("/proc/loadavg").read().split()[:3])
    spark = get_spark("fes-bench-extra")

    from feature_engineering_spark.plans.driver_queries import QUERIES

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf_dir)
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {path}", file=sys.stderr)
        return

    # Warmup identical in spirit to bench.py: python workers + scans JITed.
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: (b for b in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    for t in ["events", "orders", "customer", "lineitem", "documents"]:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()

    timings: dict[str, list[float]] = {n: [] for n in names}
    for r in range(args.repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:{r}")
            df = QUERIES[name](spark, args.sf_dir)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf_dir": args.sf_dir, "load": list(load),
        "queries": timings,
        "load_after": [float(x) for x in
                       open("/proc/loadavg").read().split()[:3]],
    }))


if __name__ == "__main__":
    main()
