"""Skew-aware window feature extraction: salted hot-key splitting with
halo replication (SURVEY.md §4 conclusion (b); north_rule "salted-key skew
splitting for hot domains").

Problem: ``sliding_window_features`` ships each entity's whole event stream
to one Python worker. A hot url (the pages generator gives 2 hot domains
~60% of rows; real crawls are worse) serializes the stage: one task runs
for hours while the fleet idles.

Approach — deterministic two-pass, exact results:
1. **Heavy-hitter pass**: one map-side-combined aggregate computes per-key
   (count, min_ts, max_ts). Keys above ``target_rows_per_task`` get their
   time range split into ``n_chunks = ceil(count / target)`` chunks.
   The per-key stats table is tiny (one row per key) → broadcast join.
2. **Halo replication**: a window starting inside chunk c reads rows up to
   ``window_size`` past the chunk end, so every row is also replicated
   into earlier chunks whose windows can see it:
   ``explode(sequence(floor((t - t0 - window_size)/span), chunk_of(t)))``.
   With ``span >= window_size`` that is at most one extra copy — bounded
   replication factor <= 2 regardless of skew.
3. **Ownership rule**: each chunk emits only windows whose *start* lies in
   ``[chunk_lo, chunk_hi)`` — no duplicate windows, no missing windows
   (property-tested salted == unsalted on FIXTURES edge_skew data).

The group key becomes (key, chunk): Spark's hash shuffle now spreads a hot
key over n_chunks tasks. Cold keys keep n_chunks=1 and pay one broadcast
join — no second code path.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_spark.functions.timeutil import epoch_seconds
from feature_engineering_spark.operators.windows import window_feature_schema


def salted_window_features(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    signals: Iterable[str] = ("n_chars",),
    window_size: float = 600.0,
    step: float = 60.0,
    min_points: int = 10,
    exclusive_end: bool = True,
    target_rows_per_task: int = 100_000,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Exactly ``sliding_window_features`` semantics, hot keys split across
    tasks. ``target_rows_per_task`` sizes chunks (tune to executor memory;
    at 100k rows x ~100B/row a task holds ~10 MB + feature arrays).
    ``order_tiebreak`` pins dup-ts ordering (see sliding_window_features)."""
    signals = list(signals)
    schema = window_feature_schema(
        key, signals, include_sequences=False, key_type=df.schema[key].dataType
    )
    tb = [order_tiebreak] if order_tiebreak else []
    prepared = df.select(
        F.col(key),
        epoch_seconds(ts).alias("__t"),
        *[F.col(c) for c in tb],
        *[F.col(s).cast("double").alias(s) for s in signals],
    )

    # Pass 1: per-key stats (tiny result; map-side partial agg).
    stats = prepared.groupBy(key).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min("__t").alias("__t0"),
        F.max("__t").alias("__t1"),
    )
    stats = stats.withColumn(
        "__n_chunks",
        F.greatest(F.lit(1), F.ceil(F.col("__cnt") / F.lit(target_rows_per_task))),
    )
    # Chunk span: key's grid-snapped range / n_chunks, floored to a step
    # multiple (>= window_size so halo is a single extra copy; >= step so
    # spans stay grid-aligned).
    t0_snap = F.floor(F.col("__t0") / F.lit(step)) * F.lit(step)
    raw_span = (F.col("__t1") - t0_snap) / F.col("__n_chunks") + F.lit(step)
    span = F.greatest(
        F.floor(raw_span / F.lit(step)) * F.lit(step),
        F.lit(float(max(window_size, step))),
    )
    stats = stats.select(
        key,
        t0_snap.alias("__t0s"),
        F.col("__t1"),
        span.cast("double").alias("__span"),
    )

    j = prepared.join(F.broadcast(stats), on=key, how="inner")
    own_chunk = F.floor((F.col("__t") - F.col("__t0s")) / F.col("__span"))
    halo_lo = F.greatest(
        F.lit(0).cast("long"),
        F.floor(
            (F.col("__t") - F.col("__t0s") - F.lit(float(window_size)))
            / F.col("__span")
        ).cast("long"),
    )
    exploded = j.withColumn(
        "__chunk", F.explode(F.sequence(halo_lo, own_chunk.cast("long")))
    )
    # chunk ownership bounds [t0s + chunk*span, +span) are derived inside
    # the kernel from (t0s, span, chunk) — not shipped as per-row columns

    from feature_engineering_spark.functions.window_kernel import (
        make_partition_window_mapper,
    )

    n_parts = int(exploded.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    part = exploded.repartition(n_parts, key, "__chunk").sortWithinPartitions(
        key, "__chunk", "__t", *tb
    )
    mapper = make_partition_window_mapper(
        key, signals, [f.name for f in schema.fields], window_size, step,
        min_points, exclusive_end, include_sequences=False,
        bounds_cols=("__t0s", "__t1", "__span"),
    )
    return part.mapInPandas(mapper, schema=schema)
