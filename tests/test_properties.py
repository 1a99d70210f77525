"""Hypothesis property tests (SURVEY §5.5): sessionization gap invariant,
as-of correctness against merge_asof on arbitrary small frames, duplicate-
timestamp tie-break determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from feature_engineering_spark.operators.asof import asof_join
from feature_engineering_spark.operators.lagging import rolling_causal_stats
from feature_engineering_spark.operators.sessionize import sessionize

_SETTINGS = dict(max_examples=12, deadline=None)


def _frame(keys, ts_offsets, vals):
    base = pd.Timestamp("2024-01-01")
    return pd.DataFrame({
        "url": [f"u{k}" for k in keys],
        "warc_ts": [base + pd.Timedelta(seconds=float(o)) for o in ts_offsets],
        "value": vals,
    })


rows = st.integers(2, 40)


@given(
    data=st.data(),
    n=rows,
)
@settings(**_SETTINGS)
def test_sessionize_gap_invariant(spark, data, n):
    keys = data.draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    offs = data.draw(st.lists(st.floats(0, 1e6, allow_nan=False), min_size=n, max_size=n))
    pdf = _frame(keys, offs, [0.0] * n)
    out = (
        sessionize(spark.createDataFrame(pdf), gap_seconds=1800)
        .toPandas()
        .sort_values(["url", "warc_ts"], kind="stable")
    )
    for _, g in out.groupby("url"):
        dt = g["warc_ts"].diff().dt.total_seconds().to_numpy()[1:]
        ds = g["session_id"].diff().to_numpy()[1:]
        # session increments exactly where gap > 1800
        assert ((ds == 1) == (dt > 1800)).all() or len(g) < 2
        assert ((ds == 0) | (ds == 1)).all()


@given(data=st.data(), nl=rows, nr=st.integers(0, 30))
@settings(**_SETTINGS)
def test_asof_union_matches_merge_asof(spark, data, nl, nr):
    lkeys = data.draw(st.lists(st.integers(0, 2), min_size=nl, max_size=nl))
    loffs = data.draw(st.lists(st.integers(0, 10**6), min_size=nl, max_size=nl))
    rkeys = data.draw(st.lists(st.integers(0, 2), min_size=nr, max_size=nr))
    roffs = data.draw(
        st.lists(st.integers(0, 10**6), min_size=nr, max_size=nr, unique=True)
    )
    left = _frame(lkeys, loffs, list(np.arange(nl, dtype="float64")))
    right = _frame(rkeys, roffs, list(np.arange(nr, dtype="float64"))).rename(
        columns={"warc_ts": "label_ts", "value": "iri"}
    )
    right_sdf = spark.createDataFrame(
        right.assign(iri=right["iri"] + 0.5) if nr else right,
        schema="url string, label_ts timestamp, iri double",
    )
    got = (
        asof_join(
            spark.createDataFrame(left), right_sdf,
            right_ts="label_ts", right_cols=["iri"],
        )
        .toPandas()
        .sort_values(["url", "warc_ts", "value"], kind="stable")
        .reset_index(drop=True)
    )
    exp_parts = []
    r2 = right.assign(iri=right["iri"] + 0.5) if nr else right
    for url, lg in left.sort_values(["url", "warc_ts"], kind="stable").groupby("url"):
        rg = r2[r2["url"] == url].sort_values("label_ts", kind="stable")
        if len(rg) == 0:
            m = lg.assign(iri=np.nan)
        else:
            m = pd.merge_asof(
                lg, rg[["label_ts", "iri"]].assign(__t=rg["label_ts"]),
                left_on="warc_ts", right_on="__t", direction="backward",
            )
        exp_parts.append(m)
    exp = (
        pd.concat(exp_parts)
        .sort_values(["url", "warc_ts", "value"], kind="stable")
        .reset_index(drop=True)
    )
    assert np.allclose(got["iri"], exp["iri"], equal_nan=True)


def test_dup_ts_deterministic_tiebreak(spark):
    """edge_dup_ts (FIXTURES F4): duplicate timestamps with an explicit
    tiebreak column give a pinned, repeatable rolling result."""
    pdf = pd.DataFrame({
        "url": ["u"] * 4,
        "warc_ts": pd.to_datetime(["2024-01-01"] * 2 + ["2024-01-02"] * 2),
        "event_id": [2, 1, 4, 3],
        "value": [10.0, 20.0, 30.0, 40.0],
    })
    outs = [
        rolling_causal_stats(
            spark.createDataFrame(pdf), k=2, order_tiebreak="event_id"
        )
        .orderBy("warc_ts", "event_id")
        .toPandas()["roll_mean"]
        .tolist()
        for _ in range(3)
    ]
    assert outs[0] == outs[1] == outs[2]
    # order by (ts, event_id): 20(e1),10(e2),40(e3),30(e4)
    assert outs[0] == [20.0, 15.0, 25.0, 35.0]
