"""Bucketed interval/range join (the range-join analog of J2's
interval-containment bucketing).

Spark's native plan for ``l.ts BETWEEN i.lo AND i.hi`` (plus a key
equality) is fine as long as the optimizer can use the equi-key — but a
pure interval predicate degenerates to BroadcastNestedLoopJoin, which is
quadratic and only works while one side fits in memory. The scalable
shape is the classic bucketing trick:

1. explode each interval into the fixed-width epoch buckets it overlaps
   (cheap: sum(interval_span)/bucket_width extra rows);
2. tag each fact row with its single bucket;
3. hash EQUI-join on (key, bucket) — Catalyst picks sort-merge/shuffled
   hash with AQE skew splitting, like any other equi-join;
4. verify the exact BETWEEN predicate on the matches.

Shuffle volume: |facts| + sum(spans)/width, never |facts| x |intervals|.
Pick ``bucket_width`` ~ median interval length: too small explodes the
interval side, too large fans out false candidates to the verify step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_spark.functions.timeutil import epoch_seconds


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    on: str,
    fact_ts: str,
    lo: str,
    hi: str,
    bucket_width: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to every interval (same ``on`` key) containing their
    timestamp: epoch(fact_ts) in [lo, hi], bounds inclusive, ``lo``/``hi``
    epoch seconds. Returns facts columns + the interval's columns.

    Only ``how='inner'`` is supported: the exact BETWEEN verify is a
    post-join filter, which would silently turn any outer join back into
    inner semantics by discarding its null-padded rows — so other values
    raise instead of lying. Inverted intervals (hi < lo) are dropped on the
    interval side up front (they contain nothing; left unguarded they would
    make F.sequence count DOWNWARD and explode spurious buckets)."""
    if how != "inner":
        raise ValueError(
            "bucketed_range_join supports how='inner' only (the exact-range "
            f"verify filter would break outer semantics); got {how!r}"
        )
    t = epoch_seconds(fact_ts)
    b_facts = facts.withColumn("__b", F.floor(t / F.lit(bucket_width)).cast("long"))
    b_iv = intervals.where(F.col(hi) >= F.col(lo)).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    j = b_facts.join(b_iv, [on, "__b"], how)
    return j.where((t >= F.col(lo)) & (t <= F.col(hi))).drop("__b")
