"""Source/sink layer (SURVEY.md S4-S6).

- glob source with per-file provenance (S4: the reference discovers pickle
  files per trip via glob.glob, get_features.py:197-205; Spark globs
  natively and input_file_name() carries provenance)
- CSV/JSON sinks (S6: reference exports selected features to
  csv/excel/json/latex, get_features.py:437-455 — excel/latex are report
  artifacts, out of engine scope)
- TableIO: the Parquet-directory-with-_SUCCESS convention shared with
  plans/checkpoint.py; an Iceberg implementation would replace the
  sentinel check with a snapshot lookup (jars not in this sandbox).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_glob_with_provenance(
    spark: SparkSession, pattern: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a file glob and attach each row's source file (S4)."""
    df = spark.read.format(fmt).load(pattern)
    return df.withColumn("source_file", F.input_file_name())


def write_csv(df: DataFrame, path: str, header: bool = True) -> str:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)
    return path


def write_json(df: DataFrame, path: str) -> str:
    df.write.mode("overwrite").json(path)
    return path


class TableIO:
    """Parquet table store with committed-snapshot semantics (the sandbox
    stand-in for an Iceberg catalog)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write(self, name: str, df: DataFrame, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))
