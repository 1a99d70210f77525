"""Timestamp → epoch helpers that work for both TIMESTAMP and
TIMESTAMP_NTZ inputs (parquet written by other engines arrives as NTZ;
session TZ is pinned to UTC so the NTZ→TZ cast is shift-free and epochs
agree with DuckDB's naive ``epoch()``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds as double (fractional microseconds preserved)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("timestamp").cast("double")


def epoch_micros(c: Column | str) -> Column:
    """Epoch microseconds as bigint (exact)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))
