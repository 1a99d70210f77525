"""Lag/lead deltas and strictly causal rolling statistics (SURVEY.md W6, §2.6 subset).

Reference analogs:
- first/last/diff extraction: ``GM_time_start = seq[0]``,
  ``dt = Time[1:] - Time[:-1]`` (/root/reference/utils/data_loaders.py:439-440,
  /root/reference/utils/plotting.py:372-374).
- exclusive-of-current window means: ``df[col][:-1].mean()``
  (/root/reference/utils/data_loaders.py:483) — the reference never lets a
  window read its own right boundary; our causal frames generalize that to
  "never read rows with ts > the anchor ts" (north_rule zero-leakage).

All pure built-in Spark window functions: one shuffle on the entity key,
one sort, whole-stage-codegen'd frame evaluation. ``stddev_pop`` matches
the reference's numpy ddof=0 (/root/reference/utils/analysis.py via tsfel;
SURVEY.md §2.6 "Standard deviation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_engineering_spark.functions.timeutil import epoch_seconds


def lag_lead_delta(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    value: str = "value",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Append prev/next value and the deltas to them.

    Columns added: ``prev_value, next_value, delta_prev (v - prev),
    delta_next (next - v), dt_prev_s`` (seconds since previous row).
    ``order_tiebreak`` adds a deterministic secondary sort key for
    duplicate timestamps (FIXTURES.md edge_dup_ts).
    """
    order = [ts] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    v = F.col(value)
    return (
        df.withColumn("prev_value", F.lag(value).over(w))
        .withColumn("next_value", F.lead(value).over(w))
        .withColumn("delta_prev", v - F.col("prev_value"))
        .withColumn("delta_next", F.col("next_value") - v)
        .withColumn(
            "dt_prev_s",
            epoch_seconds(ts) - F.lag(epoch_seconds(ts)).over(w),
        )
    )


def rolling_causal_stats(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    value: str = "value",
    k: int = 10,
    include_current: bool = True,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Rolling mean/std(pop)/min/max/count over the trailing ``k`` rows.

    ``include_current=True`` → frame = ROWS BETWEEN k-1 PRECEDING AND
    CURRENT ROW (the common causal frame). ``include_current=False``
    reproduces the reference's ``[:-1]`` exclusive semantics → ROWS BETWEEN
    k PRECEDING AND 1 PRECEDING. Either way no row later than the anchor is
    ever read — the zero-leakage invariant.
    """
    order = [ts] + ([order_tiebreak] if order_tiebreak else [])
    base = Window.partitionBy(key).orderBy(*order)
    frame = base.rowsBetween(-(k - 1), 0) if include_current else base.rowsBetween(-k, -1)
    v = F.col(value)
    return (
        df.withColumn("roll_mean", F.avg(v).over(frame))
        .withColumn("roll_std", F.stddev_pop(v).over(frame))
        .withColumn("roll_min", F.min(v).over(frame))
        .withColumn("roll_max", F.max(v).over(frame))
        .withColumn("roll_cnt", F.count(v).over(frame))
    )
