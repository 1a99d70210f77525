"""Resumable stage execution with a lineage/metrics ledger (SURVEY.md S5,
§4 "Materialization").

The reference caches every expensive stage as a pickle and re-loads it if
the file exists (/root/reference/utils/analysis.py:160-163, 287-296;
get_features.py:47-48). This module is that semantics made transactional
for a Spark pipeline:

- a **stage** = (name, fn: DataFrame plan) writing one Parquet table (the
  Iceberg analog in this sandbox; an Iceberg writer would swap in at
  ``_commit`` — snapshot-exists == our _SUCCESS sentinel);
- re-running a pipeline skips stages whose output table already committed
  (load-if-exists), so a killed job resumes at the first missing stage;
- every commit appends one **ledger** row per partition: stage, partition
  id, row count, min/max event time, a value checksum — the north_rule's
  "per-partition lineage rows ... metrics emitted to a ledger table".

The ledger is itself a Parquet table; checksums are order-insensitive
(sum of per-row xxhash-style int64 hashes) so they are stable across
shuffle nondeterminism.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _success(path: str) -> str:
    return os.path.join(path, "_SUCCESS")


def table_exists(path: str) -> bool:
    return os.path.exists(_success(path))


def _lineage_rows(df: DataFrame, stage: str, ts_col: str | None) -> DataFrame:
    """One row per output partition: counts, event-time bounds, checksum."""
    # backtick-quote — feature names contain dots/spaces
    h = F.xxhash64(*[F.col(f"`{c}`") for c in df.columns])
    # Order-insensitive SUM of per-row hashes (not XOR: XOR cancels pairs,
    # so a whole duplicated table would leave the checksum unchanged).
    # Summed in decimal(38,0) then wrapped mod 2^63-1 to avoid overflow.
    wrap = (F.sum(h.cast("decimal(38,0)")) % F.lit(2**63 - 1)).cast("long")
    agg = [
        F.count(F.lit(1)).alias("row_count"),
        wrap.alias("checksum"),
    ]
    if ts_col and ts_col in df.columns:
        agg += [
            F.min(ts_col).cast("string").alias("min_ts"),
            F.max(ts_col).cast("string").alias("max_ts"),
        ]
    else:
        agg += [F.lit(None).cast("string").alias("min_ts"),
                F.lit(None).cast("string").alias("max_ts")]
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(*agg).select(
        F.lit(stage).alias("stage"), "partition_id", "row_count",
        "checksum", "min_ts", "max_ts",
    )


class Pipeline:
    """Checkpointed multi-stage job.

    >>> p = Pipeline(spark, root="/data/run1")
    >>> pages = p.stage("pages", lambda: load(...), ts_col="warc_ts")
    >>> feats = p.stage("features", lambda: build(pages), ts_col=None)

    Each ``stage`` returns a DataFrame reading the committed table; if the
    table exists the plan function is never invoked (resume path).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.ledger_path = os.path.join(root, "_ledger")
        self.metrics_path = os.path.join(root, "_metrics.jsonl")
        os.makedirs(root, exist_ok=True)

    def _table(self, name: str) -> str:
        return os.path.join(self.root, name)

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        ts_col: str | None = None,
        repartition: int | None = None,
    ) -> DataFrame:
        path = self._table(name)
        if table_exists(path):
            self._emit_metric(name, "skipped_existing", 0.0, None)
            return self.spark.read.parquet(path)
        t0 = time.monotonic()
        df = fn()
        if repartition:
            df = df.repartition(repartition)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        lineage = _lineage_rows(out, name, ts_col)
        lineage.write.mode("append").parquet(self.ledger_path)
        n = out.count()
        self._emit_metric(name, "committed", time.monotonic() - t0, n)
        return out

    def _emit_metric(self, stage: str, status: str, secs: float, rows: int | None):
        rec = {"stage": stage, "status": status, "secs": round(secs, 3),
               "rows": rows, "wall": time.time()}
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def ledger(self) -> DataFrame:
        return self.spark.read.parquet(self.ledger_path)
