"""Distributed connected components — the clustering step of near-dup
deduplication: candidate pairs from MinHash-LSH / SimHash / embedding-LSH
are edges, and each connected component is one duplicate cluster, of which
one canonical document is kept.

Algorithm: min-label propagation with pointer jumping (the path-doubling
idea of Shiloach–Vishkin; the alternating-star family of Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14, is the same
round-compression goal).  Each round does one edge join, one keyed
min aggregate (the labels table unions in as each vertex's own
contribution, so no separate self-join is needed), and one jump join
``comp ← prev_label(comp)`` through the previous (already materialized)
label table, so label chains compress well beyond plain propagation and
each round evaluates one plan tree exactly once.  The driver sees one
aggregate per round (the label-sum convergence probe), never row data.

Scale discipline:

* The loop iterates over **edge-touched nodes only** — at corpus scale the
  overwhelming majority of documents appear in no candidate pair, and
  carrying them through every round would dominate the cost.  Singletons
  are folded in by one final left join (``dedup_clusters``).
* The input edge list is materialized ONCE (eager ``localCheckpoint``)
  before symmetrization — the candidate-pair pipeline upstream (LSH band
  join + verification) is far too expensive to evaluate once per
  orientation, let alone once per round.
* Lineage is truncated every round with a checkpoint: without it the
  plan doubles per iteration and Catalyst analysis time dominates beyond
  ~10 rounds.  The per-round checkpoint is LAZY — the convergence probe
  is the materializing action, so a round is one job, not two.

Durability: ``localCheckpoint`` stores blocks on executors — fast, but if
an executor is lost mid-job the truncated lineage is unrecoverable and the
whole job dies.  Fine for tests and short local runs; for a multi-hour
1000-executor run pass ``checkpoint_dir`` (HDFS/S3/any shared FS) and the
loop switches to reliable ``checkpoint()``, which survives executor loss
at the cost of one distributed write per round.  The write is label-table
sized (two long columns over edge-touched nodes), not corpus sized.
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
    checkpoint_dir: str | None = None,
    dedupe_edges: bool = False,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``edges`` is an undirected pair list (each pair listed once in either
    orientation).  ``nodes`` optionally supplies the full vertex set (one
    ``id_col`` column) so isolated nodes come out as singleton components;
    when the vertex set is corpus-sized, prefer leaving ``nodes=None`` and
    joining singletons back afterwards (see ``dedup_clusters``) so the
    iteration only carries edge-touched nodes.

    CONTRACT (round-11 ADVICE): a supplied ``nodes`` must be a SUPERSET
    of the edge endpoints.  The union-based propagation (each round's
    labels enter the min-aggregate alongside the edge contributions)
    surfaces every edge-touched id in the output, so an endpoint missing
    from ``nodes`` appears as an extra labeled row rather than being
    silently confined — per-round re-confinement would cost one
    semi-join per round for an out-of-contract input.  Both in-repo
    callers satisfy the superset invariant by construction
    (``dedup_clusters`` passes the documents the pairs came from).

    ``checkpoint_dir``: when set, per-round lineage truncation uses
    reliable ``checkpoint()`` into that directory (survives executor
    loss — the production option for long cluster runs); when ``None``,
    fast executor-local ``localCheckpoint()`` (tests, local mode).

    ``dedupe_edges``: the min-label aggregation is duplicate-tolerant, so
    edge deduplication is NEVER needed for correctness and the default
    skips its whole-edge-table shuffle (measured ~25% off the registered
    dedup-clusters query, whose LSH pair list is already distinct).  Set
    ``True`` only when the edge list carries heavy duplication that would
    bloat every round's join input.

    Convergence is detected by the label sum, which strictly decreases
    until fixpoint — one tiny aggregate per round instead of a
    changed-rows join.  Raises ``RuntimeError`` after ``max_iter`` rounds
    without convergence rather than returning partial labels.
    """
    from pyspark import StorageLevel

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    # Reliable checkpoint() recomputes the full lineage in a SECOND job to
    # write the checkpoint files unless the data is cached — which would
    # break the one-job-per-round design on the durable path (round-3
    # ADVICE).  So on that path each to-be-checkpointed frame is persisted
    # first (the writer then reads cached blocks), and the cache is
    # dropped as soon as the round's probe has materialized the files.
    pinned: list[DataFrame] = []

    def _ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
        if checkpoint_dir is not None:
            df.persist(StorageLevel.MEMORY_AND_DISK)
            pinned.append(df)
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    def _release_pinned() -> None:
        while pinned:
            pinned.pop().unpersist()

    e0 = _ckpt(  # evaluate the pair pipeline ONCE
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
            F.col("a") != F.col("b")
        )
    )
    _release_pinned()  # eager: files are on disk, the cache has served
    sym = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if dedupe_edges:
        sym = sym.distinct()
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    # seed comp = min(id, min neighbor): one round's propagation folded
    # into the init materialization — saves a full loop round (join +
    # checkpoint + probe) on every graph.  Round-11: on the edge-touched
    # path (nodes=None) the seed is ONE aggregate — sym is symmetric, so
    # every vertex appears as `b`, and min over least(a, b) within the
    # group is exactly min(id, min neighbor); the former vertex-distinct
    # and left join were two extra exchanges per query for the same
    # values.
    if nodes is not None:
        vertex = nodes.select(F.col(id_col).alias("id")).distinct()
        seed_min = sym.groupBy(F.col("b").alias("id")).agg(
            F.min("a").alias("_sm")
        )
        labels = vertex.join(seed_min, on="id", how="left").select(
            "id",
            F.least(F.col("id"), F.coalesce(F.col("_sm"), F.col("id"))).alias(
                "comp"
            ),
        )
    else:
        labels = sym.groupBy(F.col("b").alias("id")).agg(
            F.min(F.least("a", "b")).alias("comp")
        )
    # LAZY checkpoints for the per-round label tables: the convergence
    # probe right below is the materializing action, so on the local path
    # each round runs ONE job (materialize-and-sum) instead of two
    # (measured ~10% off the whole query at bench scale).  On the
    # reliable path the checkpoint writer is an extra job by Spark's
    # design, but it reads the pinned cache (see _ckpt) — never a lineage
    # recompute.  The edge table stays eager — it is materialized once
    # and must never re-evaluate the pair pipeline.
    labels = _ckpt(labels, eager=False)

    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
    _release_pinned()  # the probe materialized the seed checkpoint
    for _ in range(max_iter):
        # propagation as ONE aggregate: each edge ships its a-side label
        # to b, and the labels table unions in as every vertex's own
        # contribution — min over that multiset is exactly
        # least(comp, min neighbor comp), with every vertex (isolated
        # ones included) present via the union side.  The former
        # neigh_min + left-join shape was one more join (two more
        # exchanges, one more AQE job) per round for the same values
        # (round-11; A/B'd 64 → 52 jobs on the registered
        # dedup-clusters pair graph).
        contrib = sym.join(labels, sym.a == labels.id).select(
            F.col("b").alias("id"), "comp"
        )
        cand = (
            contrib.union(labels.select("id", "comp"))
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump THROUGH THE MATERIALIZED PREVIOUS LABELS:
        # prev_label(x) ≤ x and stays in x's component, so it is an
        # admissible compression — and unlike jumping through `cand`
        # itself (a self-join on an unmaterialized subtree, which would
        # evaluate the whole round's plan twice), the previous labels are
        # already checkpointed, so each round evaluates one tree once.
        # Exactly ONE jump per round: a second jump join was tried
        # (round-11) and on long-chain graphs it silently defeated the
        # lazy localCheckpoint's lineage truncation — per-round wall grew
        # ~4× per round from round ~10 (0.8 → 2.1 → 8.5 → 37 → 166 s on a
        # 300-node random graph) while the single-jump shape stays flat;
        # the measured round saving (6 → 5 on the registered pair graph)
        # is not worth a shape that degrades with chain length.
        jumped = cand.join(
            labels.select(F.col("id").alias("_jid"), F.col("comp").alias("_jc")),
            cand.comp == F.col("_jid"),
            how="left",
        ).select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("_jc"), F.col("comp"))).alias(
                "comp"
            ),
        )
        new_labels = _ckpt(jumped, eager=False)
        cur_sum = new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).first()[0]
        _release_pinned()  # this round's checkpoint files exist now
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
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Assign every document to its near-dup cluster (smallest doc id in
    the component) and flag the canonical survivor.

    The component iteration runs over edge-touched documents only; the
    full corpus joins in once at the end, untouched documents becoming
    singleton clusters — so the per-round cost scales with the candidate
    pairs, not the corpus.  ``.where("is_canonical")`` is exactly the
    deduplicated corpus.

    Pass ``checkpoint_dir`` on a real cluster — see
    ``connected_components`` for the durability trade-off.
    """
    comp = connected_components(
        pairs, src=pair_a, dst=pair_b, checkpoint_dir=checkpoint_dir
    )
    return (
        docs.select(F.col(id_col))
        .join(
            comp.select(F.col("id").alias(id_col), "comp"), on=id_col, how="left"
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster"),
            (F.coalesce(F.col("comp"), F.col(id_col)) == F.col(id_col)).alias(
                "is_canonical"
            ),
        )
    )


def cluster_representatives(
    labeled: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    score_col: str = "quality",
) -> DataFrame:
    """Quality-aware survivor selection: within each near-dup cluster keep
    the member with the HIGHEST ``score_col`` instead of the smallest id
    (``dedup_clusters``'s ``is_canonical`` default — fine for exact dups,
    wrong for near-dups where members differ in quality; real curation
    pipelines keep the best-written copy, cf. the SemDeDup/NearDedup
    recipes).  Ties break to the smallest id, so selection is
    deterministic.

    ``labeled`` is ``dedup_clusters`` output joined with a per-doc score
    (e.g. ``quality_score`` / ``lm_perplexity``).  Adds
    ``is_representative``; ``.where("is_representative")`` is the kept
    corpus.

    Scale shape: ONE cluster-keyed ``max_by`` aggregate (mergeable
    partials, map-side combine) + a rejoin on the same key — the
    aggregate output is one row per cluster, and AQE plans the rejoin
    against it as broadcast when small.

    Determinism + NULL hardening (round 6): the score compares on the
    9-dp grid (``round(score·10⁹)`` as BIGINT — DETERMINISM.md rule 4,
    so the survivor cannot flip on a last-ulp float difference across
    runs/layouts), and NULL scores coalesce to the grid minimum so a
    NULL-scored member loses to any scored one while an all-NULL
    cluster still keeps exactly its min-id member (previously a raw
    float ``max_by`` whose NULL semantics were engine-defined).
    """
    q9 = F.coalesce(
        F.round(F.col(score_col) * 1_000_000_000).cast("long"),
        F.lit(-(2**63) + 1).cast("long"),
    )
    best = labeled.groupBy(cluster_col).agg(
        F.max_by(
            F.col(id_col), F.struct(q9.alias("q9"), (-F.col(id_col)).alias("nid"))
        ).alias("_rep")
    )
    return (
        labeled.join(best, on=cluster_col)
        .withColumn("is_representative", F.col(id_col) == F.col("_rep"))
        .drop("_rep")
    )
