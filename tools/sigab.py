"""A/B the text-signal expressions' DRAM-allocation cost at local[N].

Variants (identical output values, proven by tests/test_windows.py
equivalence test):
  split:  n_tokens = size(split(trim, \s+));        digits via regexp_replace
  count:  n_tokens = regexp_count(trim, \s+) + 1;   digits via translate
  mixed:  n_tokens via split;                        digits via translate

Rationale: split materializes the whole token ARRAY (copies the text),
regexp_replace builds a full replaced string; regexp_count and translate
allocate nothing / one string. On a DRAM-bandwidth-bound socket the
allocation traffic is the cost, not the scan.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from feature_engineering_spark.session import get_spark

variant, cpus = sys.argv[1], int(sys.argv[2])
spark = get_spark("sigab", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
pages = spark.read.parquet("/tmp/fes_scaling/pages_8000000.parquet")
pages.count()

t = F.col("text")
trim = F.trim(t)
if variant == "split":
    n_tokens = F.size(F.split(trim, r"\s+"))
    n_digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
elif variant == "count":
    n_tokens = F.regexp_count(trim, F.lit(r"\s+")) + F.lit(1)
    n_digits = F.length(t) - F.length(F.translate(t, "0123456789", ""))
elif variant == "mixed":
    n_tokens = F.size(F.split(trim, r"\s+"))
    n_digits = F.length(t) - F.length(F.translate(t, "0123456789", ""))
else:
    raise SystemExit(f"unknown variant {{variant}}")

sig = pages.select(
    "url", "warc_ts",
    F.length(t).cast("double").alias("n_chars"),
    n_tokens.cast("double").alias("n_tokens"),
    F.when(F.length(t) > 0,
           (n_digits / F.length(t))).otherwise(F.lit(0.0)).alias("digit_ratio"),
)
t0 = time.monotonic()
for _ in range(2):
    sig.write.format("noop").mode("overwrite").save()
wall = time.monotonic() - t0
print(json.dumps({{"variant": variant, "cpus": cpus, "wall_s": round(wall, 2),
                   "rows_per_sec": round(2 * 8000000 / wall, 1)}}))
"""


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
    script = CHILD.format(repo=REPO)
    env = dict(os.environ, SPARK_DRIVER_MEMORY="48g")
    # interleave to cancel drift
    for v in ["split", "count", "mixed", "split", "count", "mixed"]:
        load0 = float(open("/proc/loadavg").read().split()[0])
        out = subprocess.run([sys.executable, "-c", script, v, cpus],
                             capture_output=True, text=True, timeout=900, env=env)
        lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
        if not lines:
            print(v, "FAILED", out.stderr[-1500:])
            continue
        r = json.loads(lines[-1])
        r["load_before"] = load0
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
