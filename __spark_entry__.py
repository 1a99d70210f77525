"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``feature_engineering_spark/plans/driver_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sessionized rolling causal features over sf0.001 events."""
    from pyspark.sql import functions as F

    from feature_engineering_spark.operators.lagging import rolling_causal_stats
    from feature_engineering_spark.operators.sessionize import sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800,
                   order_tiebreak="event_id")
    r = rolling_causal_stats(
        s, key="user_id", ts="ts", value="value", k=10, order_tiebreak="event_id"
    )
    return r.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("roll_mean"), 6).alias("avg_roll_mean"),
        F.round(F.max("roll_max"), 6).alias("max_value"),
        F.round(F.min("roll_min"), 6).alias("min_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from feature_engineering_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from feature_engineering_spark.plans.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
