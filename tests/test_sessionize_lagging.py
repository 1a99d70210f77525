"""Sessionize + lag/lead + rolling causal stats vs a pure-pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from feature_engineering_spark.operators.lagging import (
    lag_lead_delta,
    rolling_causal_stats,
)
from feature_engineering_spark.operators.sessionize import sessionize


def _oracle_sessions(pdf: pd.DataFrame, gap_s: float = 1800.0) -> pd.Series:
    def per_url(g: pd.DataFrame) -> pd.Series:
        d = g["warc_ts"].diff().dt.total_seconds()
        return (d > gap_s).fillna(False).cumsum().astype("int64")

    out = pdf.sort_values(["url", "warc_ts"], kind="stable").groupby("url", group_keys=False)
    return out.apply(per_url, include_groups=False)


def test_sessionize_matches_oracle(spark, pages_pdf, pages_df):
    got = (
        sessionize(pages_df, "url", "warc_ts", 1800)
        .select("url", "warc_ts", "session_id")
        .toPandas()
        .sort_values(["url", "warc_ts"], kind="stable")
        .reset_index(drop=True)
    )
    exp_pdf = pages_pdf.sort_values(["url", "warc_ts"], kind="stable").reset_index(drop=True)
    exp = _oracle_sessions(pages_pdf).reset_index(drop=True)
    assert (got["url"] == exp_pdf["url"]).all()
    assert (got["session_id"].to_numpy() == exp.to_numpy()).all()


def test_sessionize_edges(spark):
    # single session (no gap > 30min) and all-gaps (every row a session)
    ts = pd.date_range("2024-01-01", periods=5, freq="10min")
    one = pd.DataFrame({"url": "u", "warc_ts": ts, "value": 1.0})
    ts2 = pd.date_range("2024-01-01", periods=5, freq="31min")
    many = pd.DataFrame({"url": "v", "warc_ts": ts2, "value": 1.0})
    df = spark.createDataFrame(pd.concat([one, many]))
    got = sessionize(df).groupBy("url").agg({"session_id": "max"}).collect()
    m = {r["url"]: r["max(session_id)"] for r in got}
    assert m == {"u": 0, "v": 4}


def test_lag_lead_delta_oracle(spark):
    pdf = pd.DataFrame(
        {
            "url": ["a"] * 4 + ["b"] * 3,
            "warc_ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:05", "2024-01-01 00:06",
                 "2024-01-01 01:00", "2024-01-02 00:00", "2024-01-02 00:01",
                 "2024-01-02 00:02"]
            ),
            "value": [1.0, 3.0, 2.0, 10.0, 5.0, 5.0, 8.0],
        }
    )
    got = (
        lag_lead_delta(spark.createDataFrame(pdf))
        .orderBy("url", "warc_ts")
        .toPandas()
    )
    g = pdf.groupby("url", group_keys=False)
    exp_prev = g["value"].shift(1)
    exp_next = g["value"].shift(-1)
    assert np.allclose(got["prev_value"], exp_prev, equal_nan=True)
    assert np.allclose(got["next_value"], exp_next, equal_nan=True)
    assert np.allclose(got["delta_prev"], pdf["value"] - exp_prev, equal_nan=True)
    assert np.allclose(
        got["dt_prev_s"],
        g["warc_ts"].diff().dt.total_seconds(),
        equal_nan=True,
    )


def test_rolling_causal_stats_oracle(spark, pages_pdf, pages_df):
    pdf = pages_pdf.assign(value=pages_pdf["text"].str.len().astype("float64"))
    df = pages_df.withColumn("value", __import__("pyspark.sql.functions", fromlist=["length"]).length("text").cast("double"))
    k = 7
    got = (
        rolling_causal_stats(df, k=k)
        .select("url", "warc_ts", "roll_mean", "roll_std", "roll_min", "roll_max", "roll_cnt")
        .toPandas()
        .sort_values(["url", "warc_ts"], kind="stable")
        .reset_index(drop=True)
    )
    s = pdf.sort_values(["url", "warc_ts"], kind="stable").reset_index(drop=True)
    g = s.groupby("url")["value"]
    r = g.rolling(k, min_periods=1)
    exp_mean = r.mean().reset_index(drop=True)
    exp_std = g.rolling(k, min_periods=1).std(ddof=0).reset_index(drop=True)
    assert np.allclose(got["roll_mean"], exp_mean, rtol=1e-9, atol=1e-12)
    # Spark stddev_pop of a single row is 0.0; pandas ddof=0 likewise
    assert np.allclose(got["roll_std"].fillna(0), exp_std.fillna(0), rtol=1e-9, atol=1e-9)
    exp_min = g.rolling(k, min_periods=1).min().reset_index(drop=True)
    exp_max = g.rolling(k, min_periods=1).max().reset_index(drop=True)
    assert np.allclose(got["roll_min"], exp_min)
    assert np.allclose(got["roll_max"], exp_max)


def test_rolling_exclusive_current_matches_reference_slice(spark):
    """include_current=False reproduces the reference's `[:-1]` trailing
    mean (data_loaders.py:483): the anchor row itself is excluded."""
    pdf = pd.DataFrame(
        {
            "url": ["a"] * 5,
            "warc_ts": pd.date_range("2024-01-01", periods=5, freq="1min"),
            "value": [1.0, 2.0, 4.0, 8.0, 16.0],
        }
    )
    got = (
        rolling_causal_stats(spark.createDataFrame(pdf), k=3, include_current=False)
        .orderBy("warc_ts")
        .toPandas()
    )
    exp = [np.nan, 1.0, 1.5, (1 + 2 + 4) / 3, (2 + 4 + 8) / 3]
    assert np.allclose(got["roll_mean"], exp, equal_nan=True)
