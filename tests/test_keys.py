"""Surrogate-key dictionary encoding (operators/keys.py): url strings must
never enter the middle shuffles, yet the decoded output must be exactly the
string-keyed result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_engineering_spark.operators.keys import (
    decode_key,
    encode_key,
    key_dictionary,
    verify_injective,
)


def test_encode_decode_roundtrip(spark, pages_df):
    sub = pages_df.select("url", "warc_ts").limit(500)
    d = key_dictionary(sub, "url")
    assert verify_injective(d) == sub.select("url").distinct().count()
    enc = encode_key(sub, "url")
    assert "url" not in enc.columns and "url_key" in enc.columns
    dec = decode_key(enc, d)
    assert "url_key" not in dec.columns
    a = sorted(r["url"] for r in sub.select("url").collect())
    b = sorted(r["url"] for r in dec.select("url").collect())
    assert a == b


def test_verify_injective_raises_on_collision(spark):
    fake = spark.createDataFrame(
        [(1, "https://a"), (1, "https://b")], "url_key long, url string"
    )
    with pytest.raises(ValueError, match="collision"):
        verify_injective(fake)


def test_encode_128_bits(spark, pages_df):
    sub = pages_df.select("url").distinct().limit(100)
    enc = encode_key(sub.withColumn("x", F.lit(1)), "url", bits=128)
    f = dict(enc.dtypes)["url_key"]
    assert f.startswith("struct")
    d = key_dictionary(pages_df.limit(500), "url", bits=128)
    assert verify_injective(d) > 0


def test_pipeline_equivalence_with_surrogate_keys(spark, pages_df, labels_df):
    """The scaling pipeline's surrogate-key variant produces EXACTLY the
    string-keyed variant's feature rows (same url, same window, same
    values) — encoding is a pure transport optimization."""
    from feature_engineering_spark.operators.asof import asof_join
    from feature_engineering_spark.operators.sessionize import sessionize
    from feature_engineering_spark.operators.skew import salted_window_features
    from feature_engineering_spark.operators.windows import derive_text_signals

    sig = derive_text_signals(pages_df.limit(2000)).select(
        "url", "warc_ts", "n_chars"
    )

    def straight():
        ses = sessionize(sig, "url", "warc_ts", 1800)
        lab = asof_join(ses, labels_df, on="url", left_ts="warc_ts",
                        right_ts="label_ts", right_cols=["iri"],
                        tolerance_seconds=7 * 86400.0)
        return salted_window_features(
            lab, key="url", ts="warc_ts", signals=("n_chars",),
            window_size=3600.0, step=360.0, min_points=3,
            target_rows_per_task=20000,
        )

    def surrogate():
        d = key_dictionary(sig, "url")
        ses = sessionize(encode_key(sig, "url"), "url_key", "warc_ts", 1800)
        lab = asof_join(ses, encode_key(labels_df, "url"), on="url_key",
                        left_ts="warc_ts", right_ts="label_ts",
                        right_cols=["iri"], tolerance_seconds=7 * 86400.0)
        out = salted_window_features(
            lab, key="url_key", ts="warc_ts", signals=("n_chars",),
            window_size=3600.0, step=360.0, min_points=3,
            target_rows_per_task=20000,
        )
        return decode_key(out, d)

    a = straight().toPandas()
    b = surrogate().toPandas()
    key = ["url", "win_start"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)[a.columns]
    # 9-decimal grid: surrogate keys change which windows stack into one
    # kernel batch, and numpy's blocked matmul reductions (te = e @ idx)
    # differ at 1 ulp across batch shapes — same caveat as
    # test_job_determinism, not a semantic difference.
    import pandas as pd  # noqa: PLC0415

    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            a[c], b[c] = a[c].round(9), b[c].round(9)
    assert a.equals(b)
