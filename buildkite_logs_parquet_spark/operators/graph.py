"""Distributed connected components — the clustering step of near-dup
deduplication: candidate pairs from MinHash-LSH / SimHash / embedding-LSH
are edges, and each connected component is one duplicate cluster, of which
one canonical document is kept.

Algorithm: iterative min-label propagation (the alternating-star family of
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14,
reduces round count for pathological diameters; plain propagation is the
right default for near-dup graphs, whose components are shallow).  Each
round is one equi-join + one keyed aggregation — both horizontal — and the
driver sees only a single aggregate per round (the label-sum convergence
probe), never row data.

Lineage is truncated every round with an eager ``localCheckpoint``:
without it the plan doubles per iteration and Catalyst analysis time
dominates beyond ~10 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``edges`` is an undirected pair list (each pair listed once in either
    orientation).  ``nodes`` optionally supplies the full vertex set (one
    ``id_col`` column) so isolated nodes — documents with no near-dup
    candidate — come out as singleton components; without it the vertex
    set is derived from the edges.

    Rounds needed = component diameter (near-dup clusters: a handful).
    Convergence is detected by the label sum, which strictly decreases
    until fixpoint — one tiny aggregate per round instead of a
    changed-rows join.  Raises ``RuntimeError`` after ``max_iter`` rounds
    without convergence rather than returning partial labels.
    """
    from pyspark import StorageLevel

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if nodes is not None:
        vertex = nodes.select(F.col(id_col).alias("id")).distinct()
    else:
        vertex = sym.select(F.col("a").alias("id")).distinct()
    labels = vertex.withColumn("comp", F.col("id")).localCheckpoint(eager=True)

    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("comp").alias("_nc"))
        )
        new_labels = (
            labels.join(neigh_min, on="id", how="left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("_nc"), F.col("comp"))).alias(
                    "comp"
                ),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:  # strict decrease until fixpoint
            sym.unpersist()
            return labels
        prev_sum = cur_sum
    sym.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Assign every document to its near-dup cluster (smallest doc id in
    the component) and flag the canonical survivor.  ``docs`` supplies the
    full corpus so untouched documents become singleton clusters —
    ``.where("is_canonical")`` is then exactly the deduplicated corpus."""
    comp = connected_components(
        pairs, src=pair_a, dst=pair_b, nodes=docs, id_col=id_col
    )
    return comp.select(
        F.col("id").alias(id_col),
        F.col("comp").alias("cluster"),
        (F.col("comp") == F.col("id")).alias("is_canonical"),
    )
