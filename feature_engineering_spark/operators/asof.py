"""Point-in-time / as-of join (SURVEY.md §2.3 J3/J4/J5 — the heart of the
engine).

Reference semantics being generalized:
- J3: pick the reference row at/bebefore a boundary
  (/root/reference/utils/data_transforms.py:52-53)
- J4: kNN matching with a max-distance reject (matching.pyc
  ``do_kNN_matching``; ``max_distance`` ≙ our ``tolerance``)
- J5: backward match at window start + forward match at window end — the
  backfill primitive (matching.pyc ``align_DRD_GM``).

Our key is equality on the entity (``url``) plus time as-of on ``warc_ts``
(north_rule). Matching is strictly causal for ``direction='backward'``: a
left row at time T never reads a right row with ts > T.

Two physical strategies, same semantics:

``strategy='union'`` (default — pure JVM, no Python):
    Tag and union both inputs, hash-shuffle once on the key, sort each
    partition by (ts, tag), and carry the most recent right-side row to
    each left row with ``last(ignorenulls=True)`` over a running window
    (``first`` over the following window for ``direction='forward'``).
    Cost: ONE shuffle of |L|+|R| rows, no join node, no Python worker.
    AQE handles partition coalescing. This is the plan we want at 100 TB:
    sort-merge-like locality without materializing a join.

``strategy='cogroup'`` (Arrow/pandas):
    ``left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas`` running
    ``pd.merge_asof`` per key group — the shape the north_star describes.
    Useful when per-group logic grows beyond what window frames express
    (interpolation, multi-column tolerances). One shuffle per side plus an
    Arrow hop; the union strategy usually wins, benchmarked in bench.py.

Tie semantics match ``pd.merge_asof`` / DuckDB ``ASOF JOIN``:
backward = latest right with rts <= lts (exact match allowed);
forward = earliest right with rts >= lts. Duplicate right timestamps are
broken deterministically by the last column in ``right_order``.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feature_engineering_spark.functions.timeutil import epoch_seconds


def _as_list(x: str | Iterable[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] = "url",
    left_ts: str = "warc_ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    strategy: str = "union",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's columns
    (suffixed on collision) and ``matched_ts`` (null when no match / outside
    tolerance).

    ``right_cols`` limits which right columns are carried (default: all
    non-key, non-ts). Column pruning matters: the carried struct is shuffled.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = _as_list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != rts]
    out_names = [c + suffix if c in left.columns else c for c in right_cols]

    if strategy == "union":
        return _asof_union(
            left, right, keys, left_ts, rts, direction,
            tolerance_seconds, right_cols, out_names, right_tiebreak,
        )
    if strategy == "cogroup":
        return _asof_cogroup(
            left, right, keys, left_ts, rts, direction,
            tolerance_seconds, right_cols, out_names,
        )
    raise ValueError(f"unknown strategy {strategy}")


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lts: str,
    rts: str,
    direction: str,
    tol: float | None,
    right_cols: list[str],
    out_names: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    backward = direction == "backward"
    # Tag order at equal ts: backward wants the right row to sort BEFORE the
    # left row (so an exact-ts match is visible in the trailing frame);
    # forward wants it AFTER (visible in the leading frame).
    ltag, rtag = (1, 0) if backward else (0, 1)

    payload = F.struct(
        F.col(rts).cast("timestamp").alias("__rts"),
        *([F.col(right_tiebreak).alias("__tb")] if right_tiebreak else []),
        *[F.col(c).alias(f"v{i}") for i, c in enumerate(right_cols)],
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).cast("timestamp").alias("__ts"),
        F.lit(rtag).alias("__tag"),
        payload.alias("__r"),
    )
    # Left payload: ONE nullable struct of the non-key left columns (keys
    # stay top-level for the hash partitioning). An UnsafeRow reserves a
    # fixed 8-byte slot per top-level field even when it is null, so the
    # old per-column `__l_*` padding made every RIGHT row pay ~8B x |left
    # schema| of dead weight through the union's shuffle; a null struct
    # costs one slot.
    lcols = [c for c in left.columns if c not in keys]
    lstruct = F.struct(*[F.col(f"`{c}`").alias(c) for c in lcols])
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(lts).cast("timestamp").alias("__ts"),
        F.lit(ltag).alias("__tag"),
        F.lit(None).cast(r2.schema["__r"].dataType).alias("__r"),
        lstruct.alias("__l"),
    )
    r2 = r2.withColumn("__l", F.lit(None).cast(l2.schema["__l"].dataType))
    u = l2.unionByName(r2)

    # Duplicate right timestamps: without a tiebreak, "which right row
    # wins" is partition-order-dependent. Callers with dup-ts right sides
    # pass right_tiebreak (carried inside the payload struct) to pin it.
    order = ["__ts", "__tag"]
    if right_tiebreak is not None:
        u = u.withColumn("__tb", F.col("__r").getField("__tb"))
        order.append("__tb")
    w = Window.partitionBy(*keys).orderBy(*order)
    if backward:
        frame = w.rowsBetween(Window.unboundedPreceding, 0)
        matched: Column = F.last("__r", ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(0, Window.unboundedFollowing)
        matched = F.first("__r", ignorenulls=True).over(frame)

    res = u.withColumn("__m", matched).where(F.col("__tag") == ltag)
    if tol is not None:
        dt = epoch_seconds(F.col("__ts")) - epoch_seconds(F.col("__m.__rts"))
        in_tol = (F.abs(dt) <= F.lit(float(tol)))
        res = res.withColumn("__m", F.when(in_tol, F.col("__m")))
    out_left = [
        F.col(c).alias(c) if c in keys else F.col("__l").getField(c).alias(c)
        for c in left.columns
    ]
    return res.select(
        *out_left,
        F.col("__m.__rts").alias("matched_ts"),
        *[F.col(f"__m.v{i}").alias(n) for i, n in enumerate(out_names)],
    )


def _asof_cogroup(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lts: str,
    rts: str,
    direction: str,
    tol: float | None,
    right_cols: list[str],
    out_names: list[str],
) -> DataFrame:
    import pyspark.sql.types as T

    rschema = {f.name: f.dataType for f in right.schema.fields}
    out_fields = list(left.schema.fields) + [
        T.StructField("matched_ts", T.TimestampType(), True)
    ] + [T.StructField(n, rschema[c], True) for c, n in zip(right_cols, out_names)]
    out_schema = T.StructType(out_fields)
    lcols = list(left.columns)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = lpdf.sort_values(lts, kind="stable")
        rp = rpdf[[rts] + right_cols].rename(
            columns={rts: "matched_ts", **dict(zip(right_cols, out_names))}
        ).sort_values("matched_ts", kind="stable")
        rp = rp.assign(__mts=rp["matched_ts"])
        kw = {}
        if tol is not None:
            kw["tolerance"] = pd.Timedelta(seconds=float(tol))
        m = pd.merge_asof(
            lpdf, rp, left_on=lts, right_on="__mts",
            direction=direction, **kw,
        )
        return m[lcols + ["matched_ts"] + out_names]

    # cogroup shuffles each side once by key; merge_asof runs per Arrow
    # group — the north_star's repartition+sorted-grouped-map shape.
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(merge, schema=out_schema)
    )


def backfill_asof(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] = "url",
    left_ts: str = "warc_ts",
    right_ts: str | None = None,
    value: str = "iri",
    tolerance_seconds: float | None = None,
    strategy: str = "union",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward + forward as-of in one pass with linear interpolation —
    the reference's start/end alignment + GPS interpolation (J5 + W8,
    matching.pyc ``align_DRD_GM`` / ``interpolate_trip``).

    Adds: ``{value}_prev, prev_ts, {value}_next, next_ts, {value}_interp``.
    ``_interp`` is the time-weighted linear blend when both sides exist,
    else whichever side exists (ffill/bfill), else null.
    """
    b = asof_join(
        left, right, on, left_ts, right_ts, "backward",
        tolerance_seconds, [value], strategy=strategy,
        right_tiebreak=right_tiebreak,
    ).withColumnRenamed("matched_ts", "prev_ts").withColumnRenamed(
        value if value not in left.columns else value + "_r", f"{value}_prev"
    )
    f_ = asof_join(
        b, right, on, left_ts, right_ts, "forward",
        tolerance_seconds, [value], strategy=strategy,
        right_tiebreak=right_tiebreak,
    ).withColumnRenamed("matched_ts", "next_ts").withColumnRenamed(
        value if value not in b.columns else value + "_r", f"{value}_next"
    )
    t = epoch_seconds(F.col(left_ts))
    t0, t1 = epoch_seconds(F.col("prev_ts")), epoch_seconds(F.col("next_ts"))
    v0, v1 = F.col(f"{value}_prev"), F.col(f"{value}_next")
    frac = (t - t0) / (t1 - t0)
    interp = (
        F.when(v0.isNotNull() & v1.isNotNull() & (t1 != t0), v0 + (v1 - v0) * frac)
        .when(v0.isNotNull() & v1.isNotNull(), v0)  # degenerate t1 == t0
        .when(v0.isNotNull(), v0)
        .otherwise(v1)
    )
    return f_.withColumn(f"{value}_interp", interp)
