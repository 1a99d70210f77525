"""Connected-components cluster closure (operators/graph.py): distributed
hash-min propagation vs a pure-Python union-find on random graphs, plus
the dedup keep-one-per-cluster semantics."""

from __future__ import annotations

import random

import pytest

from feature_engineering_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    dedup_keep_canonical,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node of the component
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        lo = min(members)
        for m in members:
            out[m] = lo
    return out


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 20), (2, 60, 80), (3, 12, 40)])
def test_components_match_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_chain_closes_to_one_cluster(spark):
    """A~B, B~C, C~D: pairwise output has no (A,D) edge, but the closure
    must put all four in one cluster labeled by the min id."""
    df = spark.createDataFrame([(4, 2), (2, 9), (9, 7)], "a long, b long")
    out = dedup_clusters(df).collect()
    assert {(r["doc_id"], r["canonical_id"]) for r in out} == {
        (2, 2), (4, 2), (7, 2), (9, 2)
    }


def test_keep_canonical_one_survivor_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 3), (3, 5), (7, 8)], "a long, b long")
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    # cluster {1,3,5} -> keep 1; {7,8} -> keep 7; singletons untouched
    assert kept == [0, 1, 2, 4, 6, 7, 9]


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], "a long, b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=2)


def test_pathological_diameter_converges_logarithmically(spark):
    """Worst-case topology for plain hash-min: a 1000-node path (diameter
    999). Pointer jumping must close it in O(log n) rounds — max_iter=15
    (vs the 999 plain propagation would need) both converges and is
    correct. This is the scenario the round-3 implementation RAISED on."""
    n = 1000
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "a long, b long")
    got = {r["id"]: r["comp"] for r in connected_components(df, max_iter=15).collect()}
    assert got == {i: 0 for i in range(n)}


def test_two_paths_and_blob_mixed(spark):
    """Mixed topology: two disjoint long chains + one dense blob — labels
    must not leak across components under frontier pruning + jumping."""
    edges = [(i, i + 1) for i in range(100, 160)]          # chain A (min 100)
    edges += [(i, i + 1) for i in range(300, 370)]         # chain B (min 300)
    edges += [(500 + a, 500 + b) for a in range(8) for b in range(a)]  # blob
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_dedup_corpus_job_closure(spark, tmp_path):
    """End-to-end corpus job: quality filter -> exact dedup -> MinHash
    pairs -> cluster closure, resumable, byte-identity audited. Survivor
    count must be exact: after_exact - (non-canonical cluster members)."""
    from jobs.dedup_corpus import run

    stats = run(spark, str(tmp_path / "dedup_run"), n_rows=4000)
    assert stats["byte_identity_violations"] == 0
    assert stats["input"] > stats["after_quality"] >= stats["after_exact"]
    assert stats["after_exact"] > stats["after_neardup"]  # near-dups exist
    # resume path: a second run over the same root replays nothing and
    # reports identical counts
    again = run(spark, str(tmp_path / "dedup_run"), n_rows=4000)
    assert again == stats


def test_dedup_corpus_survivors_partitioning_independent(spark, tmp_path):
    """doc_id is content-derived (xxhash64 of url+ts+text+dup-layer), so
    the 'min doc_id per cluster' survivor set must be a PURE FUNCTION of
    the corpus: two FRESH runs at different parallelism keep identical
    rows. (The mirror image of the resume-identity test above — the old
    monotonically_increasing_id made survivors depend on partition
    layout.)"""
    from jobs.dedup_corpus import run

    survivors = []
    for parts, root in [("4", "da"), ("13", "db")]:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            out = str(tmp_path / root)
            run(spark, out, n_rows=2500)
            rows = spark.read.parquet(f"{out}/neardup_dedup").select(
                "doc_id", "url", "warc_ts"
            ).collect()
            survivors.append({(r["doc_id"], r["url"], str(r["warc_ts"])) for r in rows})
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    assert survivors[0] == survivors[1]
