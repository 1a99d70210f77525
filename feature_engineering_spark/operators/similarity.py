"""Similarity search over embedding columns: brute-force cosine top-k
(exactness baseline) and an IVF-style bucketed variant (the scale path).

At 10^12-doc scale brute force is a full scan per query — IVF bounds the
scanned fraction to nprobe/ncentroids. Centroid placement:
``kmeans_centroids`` (Spark ML k-means, fit on a sample — the production
path; recall at scale hinges on centroid quality) or deterministic
first-C-by-id (kept as the DuckDB-oracle fixture: k-means isn't
SQL-replicable). Either way the operator's shuffle shape is the same:
one broadcast of centroids, one bucket-pruned scan.
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


def kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    emb: str = "embedding",
    seed: int = 7,
    sample_fraction: float | None = None,
    max_iter: int = 20,
) -> list[tuple[int, list[float]]]:
    """Centroid placement via Spark ML k-means — the production path for
    ivf_topk (first-C-by-id centroids mis-bucket skewed data; recall@k
    with k-means vs first-C is property-tested in
    tests/test_similarity_multimodal.py).

    Fit on a ``sample_fraction`` of the table when the corpus is large:
    centroid quality needs a sketch of the distribution, not every row —
    at 10^12 docs, fit on ~10^6 sampled rows. Deterministic for a fixed
    seed. Returns the same (centroid_id, vector) list shape ivf_topk
    consumes (tiny: k rows, driver-side then broadcast)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    d = df.select(
        array_to_vector(F.col(emb).cast("array<double>")).alias("features")
    )
    if sample_fraction is not None:
        d = d.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(d)
    return [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    emb: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (cosine) in ONE
    projection: the centroid table ships as an array<struct> literal in
    the plan (it is tiny — C rows), each row scores it with
    transform(...) and takes array_max of (score, cid) structs.

    Rows stay N throughout — the previous implementation cross-joined the
    broadcast centroid table (N x C intermediate rows) and re-aggregated
    the argmax with a groupBy, i.e. a C-fold row inflation plus a full
    hash shuffle of the table for work that is per-row. array_max on
    (score, cid) structs keeps the exact tie-break of the old
    max(struct(score, cid)) aggregate: highest score, then highest cid.
    The per-element lambda keeps codegen size O(1) regardless of C x dim
    (an all-literal when-chain blows up Catalyst's expression tree)."""
    v = F.col(emb).cast("array<double>")
    carr = F.array(*[
        F.struct(
            F.lit(int(cid)).cast("int").alias("cid"),
            F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
        )
        for cid, vec in centroids
    ])
    scored = F.transform(
        carr,
        lambda c: F.struct(
            (_dot(v, c["cvec"]) / (_norm(v) * _norm(c["cvec"]))).alias("s"),
            c["cid"].alias("cid"),
        ),
    )
    return df.withColumn("centroid_id", F.array_max(scored)["cid"])


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
