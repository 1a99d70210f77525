"""Resumability: killed-after-stage-k rerun loads committed tables, never
recomputes, and the final output + ledger are identical (SURVEY §5.6)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from feature_engineering_spark.plans.checkpoint import (
    IcebergTableIO,
    ParquetTableIO,
    Pipeline,
    TableIO,
    iceberg_available,
    table_exists,
)


def test_stage_commit_and_resume(spark, pages_df, tmp_path):
    root = str(tmp_path / "run")
    calls = {"a": 0, "b": 0}

    def build_a():
        calls["a"] += 1
        return pages_df.select("url", "warc_ts")

    def build_b(a_df):
        calls["b"] += 1
        return a_df.groupBy("url").count()

    p = Pipeline(spark, root)
    a = p.stage("a", build_a, ts_col="warc_ts")
    b = p.stage("b", lambda: build_b(a))
    n_b = b.count()
    assert calls == {"a": 1, "b": 1}
    assert table_exists(os.path.join(root, "a"))

    # resume: fresh Pipeline over the same root — nothing recomputes
    p2 = Pipeline(spark, root)
    a2 = p2.stage("a", build_a, ts_col="warc_ts")
    b2 = p2.stage("b", lambda: build_b(a2))
    assert calls == {"a": 1, "b": 1}
    assert b2.count() == n_b


def test_partial_failure_resume(spark, pages_df, tmp_path):
    """Simulate a crash between stage a and b: only a committed; rerun
    recomputes b but loads a."""
    root = str(tmp_path / "run2")
    calls = {"a": 0, "b": 0}

    def build_a():
        calls["a"] += 1
        return pages_df.select("url", "warc_ts")

    p = Pipeline(spark, root)
    p.stage("a", build_a, ts_col="warc_ts")
    assert calls["a"] == 1
    # crash here — b never ran. New process:
    p2 = Pipeline(spark, root)
    a2 = p2.stage("a", build_a, ts_col="warc_ts")

    def build_b():
        calls["b"] += 1
        return a2.groupBy("url").count()

    b = p2.stage("b", build_b)
    assert calls == {"a": 1, "b": 1}
    assert b.count() > 0


def test_ledger_contents(spark, pages_df, tmp_path):
    root = str(tmp_path / "run3")
    p = Pipeline(spark, root)
    p.stage("pages", lambda: pages_df, ts_col="warc_ts", repartition=4)
    led = p.ledger().toPandas()
    assert set(led.columns) == {
        "stage", "partition_id", "row_count", "checksum", "min_ts", "max_ts"
    }
    assert led["row_count"].sum() == pages_df.count()
    assert (led["stage"] == "pages").all()
    assert led["min_ts"].notna().all()
    # determinism: same data committed elsewhere yields the same global
    # checksum (xor of per-partition xors is partitioning-independent)
    from functools import reduce
    from operator import xor

    p2 = Pipeline(spark, str(tmp_path / "run4"))
    p2.stage("pages", lambda: pages_df, ts_col="warc_ts", repartition=4)
    led2 = p2.ledger().toPandas()
    gx = lambda s: reduce(xor, [int(v) for v in s], 0)  # noqa: E731
    assert gx(led["checksum"]) == gx(led2["checksum"])


class _MemoryTableIO(TableIO):
    """Test double standing in for IcebergTableIO: commits whole tables to
    an in-memory dict keyed by 'namespace.table' identifiers (no paths, no
    _SUCCESS files) — proves Pipeline runs entirely through the TableIO
    seam, so a real Iceberg writer slots in without touching Pipeline."""

    def __init__(self):
        self.tables: dict[str, tuple] = {}
        self.calls: list[tuple[str, str]] = []

    def locate(self, root, name):
        return f"{root}.{name.strip('_')}"

    def exists(self, spark, loc):
        self.calls.append(("exists", loc))
        return loc in self.tables

    def write(self, spark, df, loc):
        self.calls.append(("write", loc))
        self.tables[loc] = (df.schema, df.collect())

    def append(self, spark, df, loc):
        self.calls.append(("append", loc))
        schema, rows = self.tables.get(loc, (df.schema, []))
        self.tables[loc] = (schema, rows + df.collect())

    def read(self, spark, loc):
        schema, rows = self.tables[loc]
        return spark.createDataFrame(rows, schema)


def test_pipeline_runs_through_tableio_seam(spark, pages_df, tmp_path):
    """Pipeline with a non-filesystem TableIO: stages commit, resume skips
    recompute, and the ledger accrues — with ZERO parquet directories
    created under the root (identifier-based, like an Iceberg catalog)."""
    io = _MemoryTableIO()
    calls = {"a": 0}

    def build_a():
        calls["a"] += 1
        return pages_df.select("url", "warc_ts")

    p = Pipeline(spark, "lake.db", io=io)
    a = p.stage("a", build_a, ts_col="warc_ts")
    n = a.count()
    assert calls["a"] == 1 and n > 0
    assert "lake.db.a" in io.tables and "lake.db.ledger" in io.tables
    assert not os.path.exists("lake.db")  # nothing touched the filesystem

    p2 = Pipeline(spark, "lake.db", io=io)
    a2 = p2.stage("a", build_a, ts_col="warc_ts")
    assert calls["a"] == 1  # resume loaded the committed table
    assert a2.count() == n
    assert p2.ledger().count() > 0


def test_iceberg_tableio_guard(spark):
    """Without the iceberg-spark-runtime jar the Iceberg impl must fail
    LOUDLY at construction (no silent parquet fallback); with it, a real
    pipeline round-trips. The sandbox ships no jar, so this exercises the
    guard there and the real path on an Iceberg-enabled cluster."""
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="iceberg"):
            IcebergTableIO(spark)
        return
    io = IcebergTableIO(spark)
    p = Pipeline(spark, "default", io=io)
    out = p.stage("t_fes_iceberg_smoke", lambda: spark.range(5).toDF("id"))
    assert out.count() == 5


def test_parquet_tableio_is_default(spark, pages_df, tmp_path):
    root = str(tmp_path / "runp")
    p = Pipeline(spark, root)
    assert isinstance(p.io, ParquetTableIO)
    p.stage("a", lambda: pages_df.select("url"))
    assert table_exists(os.path.join(root, "a"))


def test_iceberg_locate_reserves_internal_names():
    """A user stage named 'ledger' must NOT alias the internal '_ledger'
    lineage table (pre-fix, strip('_') folded them together and silently
    interleaved lineage rows with stage data). locate() needs no Iceberg
    runtime, so the naming contract is testable in this sandbox."""
    import pytest

    from feature_engineering_spark.plans.checkpoint import IcebergTableIO

    io = object.__new__(IcebergTableIO)  # bypass the runtime-jar guard
    assert io.locate("lake.db", "_ledger") == "lake.db.zz_sys_ledger"
    assert io.locate("lake.db", "ledger") == "lake.db.ledger"
    assert io.locate("lake.db", "features") == "lake.db.features"
    for bad in ("ledger_", "zz_sys_ledger", "zz_sys_x"):
        with pytest.raises(ValueError, match="reserved"):
            io.locate("lake.db", bad)
