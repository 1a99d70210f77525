"""One-off isolation: why did surrogate keys slow local[8]?

Variants (each a fresh subprocess/Spark session, same 8M-row fixture):
  A  string-keyed pipeline (r2 shape)
  B  full surrogate: dict build + encode + decode join (r3 shape)
  C  surrogate, NO decode join (write url_key)
  D  surrogate, NO dictionary at all (encode only)
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
from feature_engineering_spark.session import get_spark
from feature_engineering_spark.operators.asof import asof_join
from feature_engineering_spark.operators.sessionize import sessionize
from feature_engineering_spark.operators.skew import salted_window_features
from feature_engineering_spark.operators.windows import derive_text_signals
from feature_engineering_spark.operators.keys import decode_key, encode_key, key_dictionary

variant, cpus = sys.argv[1], int(sys.argv[2])
spark = get_spark("keyab", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
pages = spark.read.parquet("/tmp/fes_scaling/pages_8000000.parquet")
labels = spark.read.parquet("/tmp/fes_scaling/labels_8000000.parquet")
pages.count()
spark.range(100000).repartition(cpus).mapInPandas(
    lambda it: (b for b in it), schema="id long"
).write.format("noop").mode("overwrite").save()

t0 = time.monotonic()
sig = derive_text_signals(pages).select("url", "warc_ts", "n_chars", "n_tokens", "digit_ratio")
if variant == "A":
    ses = sessionize(sig, "url", "warc_ts", 1800)
    lab = asof_join(ses, labels, on="url", left_ts="warc_ts", right_ts="label_ts",
                    right_cols=["iri"], tolerance_seconds=7 * 86400.0)
    feats = salted_window_features(lab, key="url", ts="warc_ts",
                                   signals=("n_chars", "n_tokens", "digit_ratio"),
                                   window_size=3600.0, step=360.0, min_points=5,
                                   target_rows_per_task=20000)
else:
    ses = sessionize(encode_key(sig, "url"), "url_key", "warc_ts", 1800)
    lab = asof_join(ses, encode_key(labels, "url"), on="url_key",
                    left_ts="warc_ts", right_ts="label_ts",
                    right_cols=["iri"], tolerance_seconds=7 * 86400.0)
    feats = salted_window_features(lab, key="url_key", ts="warc_ts",
                                   signals=("n_chars", "n_tokens", "digit_ratio"),
                                   window_size=3600.0, step=360.0, min_points=5,
                                   target_rows_per_task=20000)
    if variant == "B":
        feats = decode_key(feats, key_dictionary(sig, "url"))
feats.write.format("noop").mode("overwrite").save()
wall = time.monotonic() - t0
print(json.dumps({{"variant": variant, "cpus": cpus, "wall_s": round(wall, 2),
                   "docs_per_sec": round(8000000 / wall, 1)}}))
"""


def main() -> None:
    variants = sys.argv[1:] or ["A", "B", "C", "D"]
    script = CHILD.format(repo=REPO)
    env = dict(os.environ, SPARK_DRIVER_MEMORY="48g")
    for v in variants:
        load0 = float(open("/proc/loadavg").read().split()[0])
        out = subprocess.run([sys.executable, "-c", script, v, "8"],
                             capture_output=True, text=True, timeout=1800, env=env)
        lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
        if not lines:
            print(v, "FAILED", out.stderr[-2000:])
            continue
        r = json.loads(lines[-1])
        r["load_before"] = load0
        r["load_after"] = float(open("/proc/loadavg").read().split()[0])
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
