"""Gap-based sessionization (SURVEY.md W5).

Reference analog: trip/pass segmentation — the reference hard-codes pass
chainage ranges per trip (/root/reference/utils/data_loaders.py:166-176)
and processes one trip file at a time (get_features.py:197-205). The
generalized operator cuts each entity's event stream into sessions wherever
the inter-arrival gap exceeds a threshold (north_rule: 30 minutes on
``warc_ts``).

Implementation is pure built-in Spark — one hash shuffle on the entity key,
then two window functions (lag + running sum) inside the same sort:

    gap_flag = (ts - lag(ts)) > gap  →  session_id = running_sum(gap_flag)

Scale notes: the plan is a single Exchange(hashpartitioning(key)) followed
by one sort per partition; no Python. Skewed keys are bounded by per-url
page counts (a url with billions of rows would need the salted path in
operators/skew.py, but sessionization is inherently sequential per key so
the window itself must see the whole key — Spark's external sort spills).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feature_engineering_spark.functions.timeutil import epoch_seconds


def sessionize(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    gap_seconds: int = 1800,
    session_col: str = "session_id",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Append ``session_col``: 0-based session index per ``key``.

    A new session starts at the first row and at every row whose gap from
    the previous row (same key, ordered by ``ts``) exceeds ``gap_seconds``.
    Ties on ``ts`` are kept in one session (gap 0) — but when a new session
    starts exactly at a tie group, which tie rows land in it depends on the
    order among ties; pass ``order_tiebreak`` (a unique column) to pin it.
    """
    order = [ts] if order_tiebreak is None else [ts, order_tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts: Column = F.lag(ts).over(w)
    gap = epoch_seconds(F.col(ts)) - epoch_seconds(prev_ts)
    is_new = F.when(prev_ts.isNull(), F.lit(0)).otherwise(
        (gap > F.lit(float(gap_seconds))).cast("int")
    )
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def session_bounds(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """One row per (key, session): start/end ts and row count."""
    s = sessionize(df, key, ts, gap_seconds, order_tiebreak=order_tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_rows"),
    )
