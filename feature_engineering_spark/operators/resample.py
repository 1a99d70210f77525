"""Resample/backfill to a regular time grid (SURVEY.md W7).

The reference resamples each window's sequence to a common length with
random interpolation points (/root/reference/utils/analysis.py:504-566);
our engine's deterministic variant reindexes each entity's stream onto a
fixed epoch grid and forward-fills — strictly causal (a grid point only
sees rows at or before it; never bfill in the engine path).

Implementation is a composition of existing operators: generate the grid
rows (explode a per-key sequence — pure JVM), then BACKWARD as-of join the
original stream onto the grid. No new execution machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_spark.functions.timeutil import epoch_seconds
from feature_engineering_spark.operators.asof import asof_join


def resample_to_grid(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    values: list[str] | None = None,
    step: float = 600.0,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """One row per (key, grid point) between each key's min/max ts
    (grid snapped to ``step``), carrying the most recent observation of
    each value column (ffill); null when none within ``tolerance``."""
    values = values or ["n_chars"]
    t = epoch_seconds(ts)
    bounds = df.groupBy(key).agg(F.min(t).alias("t0"), F.max(t).alias("t1"))
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(
                (F.ceil(F.col("t0") / step) * int(step)).cast("long"),
                F.col("t1").cast("long"),
                F.lit(int(step)).cast("long"),
            )
        ).alias("grid_ts_s"),
    ).withColumn("grid_ts", F.timestamp_seconds(F.col("grid_ts_s")))
    return asof_join(
        grid, df, on=key, left_ts="grid_ts", right_ts=ts,
        right_cols=values, direction="backward",
        tolerance_seconds=tolerance_seconds,
    )
