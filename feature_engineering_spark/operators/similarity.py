"""Similarity search over embedding columns: brute-force cosine top-k
(exactness baseline) and an IVF-style bucketed variant (the scale path).

At 10^12-doc scale brute force is a full scan per query — IVF bounds the
scanned fraction to nprobe/ncentroids. Centroid selection here is
deterministic (first-C vectors by id); a production build would run
distributed k-means (Spark ML) to place centroids, which changes recall
but not the operator's shuffle shape: one broadcast of centroids, one
bucket-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_to_query(df: DataFrame, query: list[float], emb: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.col(emb).cast("array<double>")
    return df.withColumn("cosine", _dot(v, q) / (_norm(v) * _norm(q)))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    emb: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: scan + TakeOrderedAndProject (no shuffle of
    the full table, only the per-partition top-k heads move).

    Ordering is by the RAW cosine with id tiebreak — never by a rounded
    value (round-then-rank can pick different ids than rank-then-round
    near rounding boundaries); callers round once on emission."""
    scored = cosine_to_query(df, query, emb)
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    emb: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (cosine): broadcast the
    tiny centroid table, score every (vector, centroid) pair, keep the
    argmax via max(struct(score, -cid)). One broadcast join + one partial
    aggregate — no all-literal when-chain (which blows up Catalyst's
    expression tree at C x dim literals)."""
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "centroid_id int, cvec array<double>",
    )
    v = F.col(emb).cast("array<double>")
    score = _dot(v, F.col("cvec")) / (_norm(v) * _norm(F.col("cvec")))
    scored = df.join(F.broadcast(cdf)).withColumn("__score", score)
    other = [c for c in df.columns if c != id_col]
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("__score"), F.col("centroid_id"))).alias("__b"),
        *[F.first(c).alias(c) for c in other],
    )
    return best.withColumn("centroid_id", F.col("__b.centroid_id")).drop("__b")


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    emb: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: rank centroids against the query driver-side, scan only
    the nprobe nearest buckets, exact cosine within them. Approximate —
    recall vs brute force is property-tested (tests/test_similarity.py)."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    probe = [cid for cid, cvec in sorted(
        centroids, key=lambda c: -cos(query, c[1])
    )[:nprobe]]
    assigned = ivf_assign(df, centroids, emb, id_col)
    bucket = assigned.where(F.col("centroid_id").isin(probe))
    return brute_force_topk(bucket, query, k, emb, id_col)
