"""Zip the engine package for spark-submit --py-files (north_rule: "the
whole job runs via spark-submit --py-files").

    python tools/package.py [--out /tmp/fes.zip]
    spark-submit --master local[8] --py-files /tmp/fes.zip \
        jobs/extract_features.py --rows 20000 --out /tmp/run
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str) -> str:
    pkg = os.path.join(REPO, "feature_engineering_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fes.zip")
    args = ap.parse_args()
    print(build_zip(args.out))
