"""Physical-plan audits (the plans we'd want at 100 TB, asserted) and the
north-rule invariants: byte-identical text, zero leakage in rolling stats.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    """Filter + 2-column projection must reach the parquet scan."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs and "l_extendedprice" not in rs
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_join_orders_customer_broadcasts(spark):
    from feature_engineering_spark.plans.driver_queries import QUERIES

    plan = _plan(QUERIES["join_orders_customer"](spark, SF))
    assert "BroadcastHashJoin" in plan  # dimension side broadcast, no SMJ shuffle


def test_asof_union_is_single_shuffle_no_join(spark):
    """The union as-of strategy: exactly one Exchange, zero join nodes."""
    from feature_engineering_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    j = asof_join(clicks, purchases, on="user_id", left_ts="ts", right_cols=["value"])
    plan = _plan(j)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan.replace("BroadcastNestedLoopJoin", "")  # no join node
    assert "Window" in plan


def test_window_features_single_shuffle(spark):
    from feature_engineering_spark.operators.windows import sliding_window_features

    ev = spark.read.parquet(f"{SF}/events.parquet")
    w = sliding_window_features(ev, key="user_id", ts="ts", signals=("value",),
                                window_size=345600.0, step=86400.0, min_points=5)
    plan = _plan(w)
    assert plan.count("Exchange") == 1  # one hash repartition, then mapInPandas
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in rs  # unused wide column pruned from the scan


def test_whole_stage_codegen_on_scan_agg(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    q.collect()  # AQE only finalizes codegen stages after execution
    plan = _plan(q)
    assert "isFinalPlan=true" in plan
    assert "*(1)" in plan  # whole-stage-codegen span markers


def test_text_byte_identity_through_pipeline(spark, pages_df):
    """north_rule: extracted text per url is byte-identical through the
    engine — hash at ingest == hash after signals+sessionize+asof chain."""
    from feature_engineering_spark.operators.sessionize import sessionize
    from feature_engineering_spark.operators.windows import derive_text_signals

    ingest = pages_df.select(
        "url", "warc_ts", F.sha2(F.col("text"), 256).alias("h_in")
    )
    piped = sessionize(derive_text_signals(pages_df))
    out = piped.select("url", "warc_ts", F.sha2(F.col("text"), 256).alias("h_out"))
    joined = ingest.join(out, ["url", "warc_ts"])
    assert joined.count() == pages_df.count()
    assert joined.where(F.col("h_in") != F.col("h_out")).count() == 0


def test_rolling_stats_zero_leakage(spark, pages_pdf):
    """Mutate values strictly after cutoff T; every rolling stat at rows
    with ts <= T is bit-identical (trailing frames never read forward)."""
    from feature_engineering_spark.operators.lagging import rolling_causal_stats

    cutoff = pd.Timestamp("2024-01-12")
    base = pages_pdf.assign(value=pages_pdf["text"].str.len().astype("float64"))
    mut = base.copy()
    after = mut["warc_ts"] > cutoff
    assert after.any()
    mut.loc[after, "value"] = mut.loc[after, "value"] * 977 + 13

    def run(pdf):
        out = rolling_causal_stats(spark.createDataFrame(pdf), k=8).toPandas()
        out = out[out["warc_ts"] <= cutoff]
        return out.sort_values(["url", "warc_ts"]).reset_index(drop=True)[
            ["url", "warc_ts", "roll_mean", "roll_std", "roll_min", "roll_max"]
        ]

    a, b = run(base), run(mut)
    assert len(a) > 100
    pd.testing.assert_frame_equal(a, b)


def test_sessionize_after_asof_reuses_exchange(spark):
    """Sessionize composed AFTER the union as-of join must NOT add a second
    Exchange: both windows need hash(key) distribution + ts order, and the
    as-of union already shuffled+sorted exactly that way (alias-aware
    partitioning/ordering propagation). This is the fused flagship-pipeline
    shape (jobs/extract_features, tools/scaling_bench)."""
    from feature_engineering_spark.operators.asof import asof_join
    from feature_engineering_spark.operators.sessionize import sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    j = asof_join(clicks, purchases, on="user_id", left_ts="ts", right_cols=["value"])
    fused = sessionize(j, "user_id", "ts", 1800)
    plan = _plan(fused)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_winnow_pairs_plan_no_nlj(spark):
    """The winnow overlap self-join must be a hash equi-join on the
    fingerprint value — never a nested-loop/cartesian product — and the
    fingerprint computation must stay scan-side (no Python eval)."""
    from feature_engineering_spark.operators.dedup import winnow_overlap_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(winnow_overlap_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_trim_plan_no_nlj_semi_probe(spark):
    """Excision's source probe is a (broadcast) hash semi-join on the
    gram hash — no nested loops, no Python."""
    from feature_engineering_spark.operators.dedup import trim_contained_runs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = docs.where(F.col("doc_id") % 7 == 0)
    plan = _plan(trim_contained_runs(docs, src))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
