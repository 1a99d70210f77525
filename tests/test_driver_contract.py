"""Local simulation of the driver's correctness gate: run every
``queries()`` entry on /root/testdata/sf0.01 and compare with the matching
``oracle_sql()`` in DuckDB — row count, column names, and order-insensitive
value equality."""

from __future__ import annotations

import importlib.util
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod():
    return _load_entry()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].dropna().iloc[0] if df[c].notna().any() else "", (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(v) if v is not None else None)
    # Sort on the driver's 6-decimal grid (value_hash rounds floats before
    # hashing): raw-emitted stats may differ between engines in the last
    # ulp, and sorting on raw floats would misalign otherwise-equal rows.
    key = df.copy()
    for c in key.columns:
        if pd.api.types.is_float_dtype(key[c]):
            key[c] = key[c].round(6)
    order = key.sort_values(
        list(key.columns), kind="stable", na_position="last"
    ).index
    return df.loc[order].reset_index(drop=True)


def _assert_frames_match(got: pd.DataFrame, exp: pd.DataFrame, name: str):
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: cols {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
            ok = np.allclose(
                gv.astype("float64").to_numpy(),
                ev.astype("float64").to_numpy(),
                rtol=1e-9, atol=1e-9, equal_nan=True,
            )
        else:
            gn, en = gv.isna(), ev.isna()
            ok = bool((gn == en).all() and (gv[~gn].to_numpy() == ev[~en].to_numpy()).all())
        assert ok, f"{name}: column {c} mismatch\n{gv.head()}\nvs\n{ev.head()}"


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema) > 0


def test_every_query_has_oracle_or_note(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10


@pytest.mark.parametrize("name", sorted(_load_entry().queries().keys()))
def test_query_vs_oracle(spark, ddb, entry_mod, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(got) >= 0  # rows-only check, like the driver's weak path
        return
    exp = ddb.execute(oracles[name]).fetch_df()
    _assert_frames_match(got, exp, name)
