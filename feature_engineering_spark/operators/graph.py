"""Connected components over a pair list — the cluster-closure step that
turns near-dup PAIRS (MinHash/SimHash/embedding LSH output) into dedup
GROUPS with one canonical survivor per group.

The reference's dedup story ends at pairwise duplicates; a production
corpus dedup must close the transitive hull (A~B, B~C => {A,B,C} is one
cluster) or chained near-dups survive. This is the missing last step of
every large-scale near-dedup pipeline.

Algorithm: hash-min label propagation. Every node starts labeled with its
own id; each round every node takes the MIN label over itself and its
neighbors; converged when no label changes. Rounds needed = graph
diameter, which for near-dup clusters is small (they are dense blobs of
mutually-similar docs, diameter 1-3; chains longer than ~10 are
pathological boilerplate that exact dedup or the LSH bucket cap already
handles). For adversarial diameters the published fix is the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) which converges in O(log^2 n) rounds; the
propagation loop below is the right trade for the near-dup workload.

Scale notes (100 TB / 10^9-node pair graphs):
- each round shuffles only (long, long) label/edge rows — the narrowest
  rows in the engine — and the symmetrized edge frame is checkpointed
  once up front;
- `localCheckpoint` (executor-memory/disk, no lineage) truncates the plan
  each round — without it iteration k replays all k-1 prior shuffles and
  the job goes quadratic (the classic iterative-DataFrame trap);
- convergence is detected with one tiny count per round (changed-label
  count), the SURVEY-sanctioned driver-side aggregate-flag pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) for every node appearing in ``edges``;
    ``component`` is the MIN node id reachable from ``id`` (deterministic
    canonical label). Edges are treated as undirected; isolated nodes
    don't appear (callers union them in as singletons if needed)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    # self-loops make "min over neighbors" include the node's own label
    # without a second join against the label frame
    nodes = sym.select(F.col("u").alias("u")).distinct()
    sym = sym.union(nodes.select("u", F.col("u").alias("v"))).localCheckpoint()

    labels = nodes.select("u", F.col("u").alias("comp")).localCheckpoint()
    for _ in range(max_iter):
        # neighbor labels: edge (u, v) carries comp(u) to v
        prop = (
            sym.join(labels, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(F.min("comp").alias("new_comp"))
        )
        nxt = (
            labels.join(prop, "u")
            .select("u", F.least("comp", "new_comp").alias("comp"),
                    (F.col("new_comp") < F.col("comp")).alias("__chg"))
        )
        nxt = nxt.localCheckpoint()  # truncate lineage: one shuffle per round
        changed = nxt.where("__chg").limit(1).count()
        labels = nxt.drop("__chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pathological diameter — use large-star/small-star)"
        )
    return labels.select(F.col("u").alias("id"), "comp")


def dedup_clusters(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """(doc_id, canonical_id) for every doc in the near-dup pair list;
    canonical_id = min doc id of the doc's transitive cluster. Docs to
    DROP are exactly the rows with doc_id != canonical_id; the keep-set
    is obtained by anti-joining those against the corpus."""
    cc = connected_components(pairs, src, dst)
    return cc.select(F.col("id").alias("doc_id"), F.col("comp").alias("canonical_id"))


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Corpus minus non-canonical cluster members: one anti-join against
    the (small) drop-list. Exactly one survivor per near-dup cluster;
    rows never mentioned in ``pairs`` pass through untouched."""
    drops = dedup_clusters(pairs, src, dst).where("doc_id != canonical_id")
    return df.join(
        drops.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )
