"""Dup-timestamp determinism property of the flagship job (jobs/
extract_features.py): with rows that COLLIDE on (url, warc_ts) but differ
in content, the content-derived row_key tiebreak must pin the pipeline's
output exactly — the same logical input presented in a different physical
row order (a shuffled parquet copy) must hash identically.

Teeth verified: without order_tiebreak the same pair of runs produces
DIFFERENT hashes (the 35-feature kernel is order-sensitive in Centroid,
Median diff, Signal distance and Slope for equal-ts rows)."""

from __future__ import annotations

import hashlib

import pandas as pd


def _inject_dup_ts(pdf: pd.DataFrame, frac: float = 0.15) -> pd.DataFrame:
    """Duplicate a slice of rows at IDENTICAL (url, warc_ts) but with
    different text (so ordering among the twins is content-ambiguous
    without a tiebreak and window stats genuinely depend on it)."""
    dup = pdf.sample(frac=frac, random_state=7).copy()
    dup["text"] = "zz " + dup["text"].str.slice(0, 40)
    dup["html"] = [t.encode() for t in ("<html><body>" + dup["text"] + "</body></html>")]
    return pd.concat([pdf, dup], ignore_index=True)


def _run_hash(spark, pages_path: str, out_root: str, n_rows: int) -> str:
    from jobs.extract_features import run

    run(spark, pages_path, out_root, n_rows,
        window_size=3600.0, step=360.0, min_points=3)
    feat = spark.read.parquet(f"{out_root}/features").toPandas()
    feat = feat[sorted(feat.columns)]
    for c in feat.columns:
        if pd.api.types.is_float_dtype(feat[c]):
            feat[c] = feat[c].round(9)
        feat[c] = feat[c].astype(str)
    lines = sorted("|".join(r) for r in feat.itertuples(index=False))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def test_job_deterministic_under_dup_ts(spark, pages_pdf, tmp_path):
    pages = _inject_dup_ts(pages_pdf.head(3000))
    assert pages.duplicated(["url", "warc_ts"]).any()

    nat = str(tmp_path / "pages_nat.parquet")
    shuf = str(tmp_path / "pages_shuf.parquet")
    pages.to_parquet(nat, row_group_size=500)
    pages.sample(frac=1.0, random_state=99).reset_index(drop=True).to_parquet(
        shuf, row_group_size=500
    )

    # different physical row order AND different shuffle-partition count
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        h1 = _run_hash(spark, nat, str(tmp_path / "run_a"), 3000)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        h2 = _run_hash(spark, shuf, str(tmp_path / "run_b"), 3000)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert h1 == h2
