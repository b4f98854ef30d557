"""Connected components / dedup clustering."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _cc_reference(n_nodes, edges):
    """Plain union-find ground truth."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def test_chain_and_islands(spark):
    # chain 0-1-2-3, pair 5-6, singleton 4 (via nodes)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "src long, dst long"
    )
    nodes = spark.range(7).select(F.col("id"))
    got = {
        r["id"]: r["comp"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5}


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _cc_reference(n, edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(n)
    got = {
        r["id"]: r["comp"] for r in connected_components(df, nodes=nodes).collect()
    }
    assert got == want


def test_edge_orientation_and_duplicates_irrelevant(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 1), (3, 2)], "src long, dst long"
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_max_iter_raises(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    """checkpoint_dir (production durability path) must be semantically
    identical to the default localCheckpoint path."""
    rng = random.Random(11)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(100)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(n)
    local = {
        r["id"]: r["comp"] for r in connected_components(df, nodes=nodes).collect()
    }
    reliable = {
        r["id"]: r["comp"]
        for r in connected_components(
            df, nodes=nodes, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert reliable == local == _cc_reference(n, edges)
    # the reliable path actually wrote checkpoint data to the shared dir
    assert any((tmp_path / "ckpt").rglob("*"))


def test_dedup_clusters_canonical_flag(spark):
    docs = spark.range(6).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "id_a long, id_b long")
    out = dedup_clusters(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[4]["cluster"] == 1 and by_id[5]["cluster"] == 1
    assert by_id[1]["is_canonical"] and not by_id[4]["is_canonical"]
    # the canonical set is one doc per cluster
    canon = [r for r in out if r["is_canonical"]]
    assert {r["doc_id"] for r in canon} == {0, 1, 2, 3}


def test_cluster_representatives_picks_best_quality(spark):
    from buildkite_logs_parquet_spark.operators.graph import (
        cluster_representatives,
    )

    labeled = spark.createDataFrame(
        [
            (1, 1, 0.2),
            (2, 1, 0.9),
            (3, 1, 0.9),  # ties with 2 → smaller id wins
            (4, 4, 0.1),  # singleton is its own representative
        ],
        "doc_id long, cluster long, quality double",
    )
    out = cluster_representatives(labeled, score_col="quality").collect()
    reps = {r["doc_id"]: r["is_representative"] for r in out}
    assert reps == {1: False, 2: True, 3: False, 4: True}
    assert len(out) == 4  # no rows lost or duplicated by the rejoin
