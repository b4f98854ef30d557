"""Web-graph quality signals: outlink extraction, host-level link graphs,
and PageRank — the URL-level quality prior a crawl-based training-data
pipeline joins back onto documents (the Common-Crawl/FineWeb recipe:
centrality-class signals rank hosts before any content model runs).

Spark-first shapes:

* ``extract_outlinks`` — pure regexp href extraction from raw HTML (no
  parser, no UDF): one narrow map inside the scan's codegen stage;
* ``url_host`` / ``text_link_edges`` — host keys and a co-occurrence
  link graph built from URLs appearing in plain text (window ``lead``
  per document — one document-keyed shuffle);
* ``host_edges`` — aggregate page-level links to a weighted host graph
  (the graph actually ranked at web scale: hosts are ~1e8, pages ~1e11);
* ``pagerank`` — damped PageRank with uniform dangling-mass
  redistribution, run ENTIRELY in scaled-integer arithmetic (see below),
  one join + one aggregate per round, rank state checkpointed per round
  (the ``graph.connected_components`` loop discipline).

Integer-exact iteration (DETERMINISM.md rules 5/6/13): ranks live on a
fixed-point grid ``r12 = rank · 10^12`` as BIGINTs.  Every per-round
quantity is a half-up integer division ``hu(a, b) = (2a + b) // (2b)``
(the scaled-HUGEINT replay device from the Kneser-Ney oracle leg) and the
damping factor is the RATIONAL 85/100, so a round is pure integer
arithmetic: per-edge contribution ``hu(r12·w, degw)``, per-node update
``hu(S−D12, N) + hu(85·(in12 + hu(dangling12, N)), 100)``.  No float
exists anywhere in the loop — the whole trajectory is bit-identical on
any engine, any partitioning, any round order, and a DuckDB oracle can
replay unrolled rounds relationally.  (A double-based loop would drift
across engines the way interpolated quantiles do — rule 13.)

100 TB shape: the state is one (node, r12) row per node; each round is
ONE edge-sized join keyed on ``src`` plus ONE aggregate keyed on ``dst``
(both map-side combinable), a node-sized left join for the update, and a
metadata-sized probe (max delta + next round's dangling mass in one
aggregate — the job that also materializes the round's checkpoint).
Driver state per round: two integers.  Edges and degrees are joined once
and persisted before the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for pagerank state (12 decimal digits of rank)
PR_SCALE = 10**12

#: largest per-edge weight the BIGINT contribution fold tolerates:
#: r12·w·2 + degw with r12 up to ~PR_SCALE (total mass + rounding slack)
#: must stay under 2^63 ≈ 9.2e18 — 4e6 leaves a ~15% margin
_PR_MAX_EDGE_WEIGHT = 4_000_000


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute http(s) URL (NULL for other
    schemes) — anchored, lookaround-free regexp (RE2-safe, the
    ``canonical_url`` discipline)."""
    h = F.regexp_extract(F.lower(url), r"^https?://([^/?#]+)", 1)
    return F.when(h != "", h)


def extract_outlinks(
    df: DataFrame,
    id_col: str,
    html_col: str = "html",
    absolute_only: bool = True,
) -> DataFrame:
    """Per-document outlinks from raw HTML: one row ``(id, href)`` per
    ``href="..."``/``href='...'`` attribute occurrence, document order
    preserved in ``link_idx``.

    Pure regexp chain — no HTML parser, no UDF: at crawl scale link
    extraction must run inside the scan's codegen stage (the
    ``html_text`` module's full parser is for TEXT extraction where
    nesting matters; links don't need a DOM).  ``absolute_only`` keeps
    http(s) hrefs (the cross-host edges a web graph ranks); relative
    links need a base-URL resolver upstream.
    """
    # ONE pattern for both quote styles so link_idx follows DOCUMENT
    # order (two concatenated per-style extractions would renumber all
    # double-quoted links before all single-quoted ones).  Limitation:
    # an href value containing the other quote character truncates at
    # it — malformed-leaning HTML, and order-correctness matters more.
    hrefs = F.regexp_extract_all(
        F.col(html_col), F.lit("href\\s*=\\s*[\"']([^\"']*)[\"']"), 1
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(hrefs).alias("link_idx", "href"),
    )
    if absolute_only:
        out = out.where(F.col("href").rlike(r"^https?://"))
    return out


def text_link_edges(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Host-level co-occurrence edges from URLs found in plain text: for
    each document, consecutive extracted URLs' hosts form one directed
    edge ``(src, dst)`` (self-edges dropped) — the cheap link-graph
    construction when only text survives (WET extracts, chat logs,
    markdown).  One document-keyed shuffle (the ``lead`` window); hosts
    via the same anchored regexp as ``url_host``."""
    from pyspark.sql import Window as W

    urls = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"https?://[^\s/$.?#][^\s]*"), 0
            )
        ).alias("pos", "u"),
    ).select(id_col, "pos", url_host(F.col("u")).alias("h"))
    w = W.partitionBy(id_col).orderBy("pos")
    return (
        urls.withColumn("nxt", F.lead("h").over(w))
        .where(
            F.col("h").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("h") != F.col("nxt"))
        )
        .select(F.col("h").alias("src"), F.col("nxt").alias("dst"))
    )


def host_edges(
    page_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Aggregate page-level links into a weighted host graph: one row per
    (src, dst) host pair with ``weight`` = link count.  ONE shuffle keyed
    on the pair, map-side combined — the page→host rollup that makes
    web-scale ranking tractable (hosts are orders of magnitude fewer
    than pages)."""
    return page_edges.groupBy(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).agg(F.count("*").alias("weight"))


def _loop_state(edges: DataFrame, checkpoint_dir: str | None):
    """Shared persist/checkpoint discipline for the module's iterative
    loops (``pagerank``, ``harmonic_centrality``): returns
    ``(persisted, pinned, _persist, _ckpt)`` where ``_persist`` tracks
    every cached frame for a release-on-ANY-exit finally, and ``_ckpt``
    truncates per-round lineage (reliable into ``checkpoint_dir`` with a
    pinned cache so the writer never recomputes, executor-local
    otherwise)."""
    from pyspark import StorageLevel

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    persisted: list[DataFrame] = []
    pinned: list[DataFrame] = []

    def _persist(df: DataFrame) -> DataFrame:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(df)
        return df

    def _ckpt(df: DataFrame, eager: bool = False) -> DataFrame:
        if checkpoint_dir is not None:
            df.persist(StorageLevel.MEMORY_AND_DISK)
            pinned.append(df)
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    return persisted, pinned, _persist, _ckpt


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    n_iter: int = 10,
    tol12: int = 0,
    checkpoint_dir: str | None = None,
    broadcast_ranks: bool = False,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
) -> DataFrame:
    """Damped PageRank (d = 85/100) with uniform dangling-mass
    redistribution, computed entirely in scaled-integer arithmetic
    (rank · 10^12 as BIGINT — see the module docstring for why).

    ``seeds``: optional personalization (TrustRank / topic-sensitive
    PageRank): teleport and dangling mass flow to the seed set (uniform
    over seeds) instead of all nodes — the trusted-host propagation
    recipe for crawl quality/spam scoring.  State initializes to the
    seed vector; the per-node update becomes
    ``[seed]·hu(S−D12, k) + hu(85·(in12 + [seed]·hu(dangling12, k)), 100)``
    with ``k`` = |seeds ∩ V| — still pure integer arithmetic.  Seeds
    outside the graph are ignored; an empty intersection raises.

    Per round: per-edge contribution ``hu(r12·w, degw_src)`` → per-dst
    long sum ``in12`` (exact: Σ contributions ≤ total mass ≈ 10^12, far
    inside BIGINT) → per-node update
    ``hu(S−D12, N) + hu(85·(in12 + hu(dangling12, N)), 100)`` where
    ``dangling12`` is the previous round's rank mass on zero-out-degree
    nodes.  The probe aggregate that materializes each round's (lazily
    checkpointed) state also returns ``max |Δr12|`` and the NEXT round's
    dangling mass — one job per round, two integers of driver state.

    Stops after ``n_iter`` rounds or when ``max |Δr12| ≤ tol12``
    (``tol12`` is in rank-scale units: 10^6 ≈ 1e-6 of rank mass).
    Duplicate (src, dst) rows each count as a link; pass
    ``weight_col`` (positive integers) for pre-aggregated host graphs
    (``host_edges``).  Self-loops participate like any edge.

    Returns ``(node, r12, rank)`` — the exact integer state and its
    double rendering (``r12 / 10^12``, display only; comparisons and
    oracle hashes must use ``r12``).

    ``checkpoint_dir``: reliable per-round checkpoints for long cluster
    runs; ``None`` = executor-local (the ``connected_components``
    contract).

    ``broadcast_ranks``: hint the per-round rank state into a broadcast
    join so the (persisted) edge table is never re-shuffled — the right
    call when |V| is executor-memory-small (a host graph after
    ``host_edges``: ~1e8 hosts is already marginal).  Default off: at
    page scale the rank state is corpus-sized and must shuffle-join.
    """
    persisted, pinned, _persist, _ckpt = _loop_state(edges, checkpoint_dir)

    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # the edge pipeline upstream of this operator can be arbitrarily
    # expensive (a crawl-wide extraction join) — persist it ONCE and
    # derive degrees / the degree-joined edge table / the node set from
    # the cached rows, so the whole upstream runs exactly one time
    e = _persist(
        edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w")
        ).where(F.col("a").isNotNull() & F.col("b").isNotNull() & (w > 0))
    )
    try:
        return _pagerank_loop(
            e,
            seeds,
            seed_col,
            n_iter,
            tol12,
            broadcast_ranks,
            _ckpt,
            pinned,
            _persist,
        )
    finally:
        # unpersist is idempotent: covers every early exit (empty graph,
        # non-intersecting seeds, overweight edges, n_iter=0) as well as
        # the normal path's already-released frames
        for df in persisted:
            df.unpersist()
        while pinned:
            pinned.pop().unpersist()


def _pagerank_loop(
    e: DataFrame,
    seeds: DataFrame | None,
    seed_col: str,
    n_iter: int,
    tol12: int,
    broadcast_ranks: bool,
    _ckpt,
    pinned: list[DataFrame],
    _persist,
) -> DataFrame:
    S = PR_SCALE
    D12 = S * 85 // 100

    deg = _persist(e.groupBy("a").agg(F.sum("w").alias("degw")))
    # join out-degree onto edges ONCE; the loop's per-round join then
    # carries only the rank column
    e2 = _persist(e.join(deg, on="a"))
    # degree table re-keyed by node, used by the setup aggregate and the
    # per-round probe's dangling test
    degn = _persist(deg.select(F.col("a").alias("node"), "degw"))
    vertex = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    if seeds is not None:
        sd = seeds.select(
            F.col(seed_col).alias("node"), F.lit(True).alias("_seed")
        ).distinct()
        vertex = vertex.join(sd, on="node", how="left").select(
            "node", F.coalesce(F.col("_seed"), F.lit(False)).alias("_seed")
        )
    else:
        vertex = vertex.select("node", F.lit(True).alias("_seed"))
    # fold the LOOP-INVARIANT dangling test into the node table once
    # (round-11): every round's probe used to re-join the degree table
    # to ask "is this node dangling?" — the answer never changes, so it
    # is computed here and carried as a boolean through the loop
    nodes = _persist(
        vertex.join(degn, on="node", how="left").select(
            "node", "_seed", F.col("degw").isNull().alias("_dangling")
        )
    )
    # ONE job for all three driver scalars: |V|, |seeds ∩ V| and the
    # count of dangling seed nodes (round-11: the initial dangling mass
    # used to be a separate node-sized job — but rank init gives exactly
    # ``r0`` to each seed and 0 to everyone else, so the initial dangling
    # mass is ``r0 · |{seed ∧ no out-degree}|``, computable from the same
    # aggregate that fetches |V|)
    hdr = nodes.agg(
        F.count("*").alias("nv"),
        F.sum(F.col("_seed").cast("long")).alias("nk"),
        F.sum(
            F.when(F.col("_seed") & F.col("_dangling"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("nd"),
    ).first()
    n_nodes, n_teleport = int(hdr["nv"]), int(hdr["nk"] or 0)
    n_seed_dangling = int(hdr["nd"] or 0)
    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("r12"),
            F.lit(0.0).alias("rank"),
        )
    if n_teleport == 0:
        raise ValueError("seeds do not intersect the graph's node set")
    # loud overflow guard: the per-edge fold r12·w·2 + degw must stay
    # inside BIGINT with r12 up to ~total mass (S plus rounding slack) —
    # a silent wrap would corrupt every downstream rank (reads the
    # already-cached edge relation: one trivial job)
    max_w = int(e.agg(F.max("w")).first()[0] or 0)
    if max_w > _PR_MAX_EDGE_WEIGHT:
        raise ValueError(
            f"edge weight {max_w} exceeds {_PR_MAX_EDGE_WEIGHT}: the "
            "integer contribution fold would overflow BIGINT; pre-scale "
            "the weights (cap, log-bucket, or divide by their gcd) — "
            "relative weights are all PageRank uses"
        )
    # NOTE: e and deg stay persisted until the loop ENDS (the caller's
    # finally releases them).  An earlier version released them after
    # round 1 "once e2/degn are materialized" — but DataFrame.unpersist
    # recompiles dependent cached plans, INVALIDATING the already-built
    # e2/degn buffers, so every later round silently re-ran the whole
    # upstream extraction join (caught by
    # test_plans.test_pagerank_loop_reuses_persisted_edges: 1 upstream
    # pass per round instead of 1 total).

    # teleport targets: all nodes (classic) or the seed set (PPR)
    k = n_teleport
    r0 = (2 * S + k) // (2 * k)  # hu(S, k): seeds' initial mass
    term1 = (2 * (S - D12) + k) // (2 * k)  # hu(S-D12, k)

    ranks = nodes.select(
        "node",
        F.when(F.col("_seed"), F.lit(r0))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r12"),
    )
    # initial dangling mass: rank init is r0 on seeds / 0 elsewhere, so
    # Σ r12 over zero-out-degree nodes = r0 · |{seed ∧ dangling}| — a
    # driver multiplication off the setup aggregate, not a Spark job
    dangling12 = r0 * n_seed_dangling
    for _round in range(n_iter):
        dang_per = (2 * dangling12 + k) // (2 * k)
        # hu(r12·w, degw) in long `div` arithmetic (never `/`, which is
        # double division — exact only to 2^53): r12 ≤ ~S = 10^12, so
        # r12·w stays inside BIGINT for per-edge weights up to ~10^6;
        # widen to decimal(38,0) here for heavier host graphs
        prev = ranks.select("node", "r12")
        rside = F.broadcast(prev) if broadcast_ranks else prev
        contrib = e2.join(
            rside, on=F.col("a") == F.col("node"), how="inner"
        ).select(
            F.col("b"),
            F.expr("(r12 * w * 2 + degw) div (degw * 2)").alias("c12"),
        )
        agg = contrib.groupBy(F.col("b").alias("node")).agg(
            F.sum("c12").alias("in12")
        )
        # under the broadcast_ranks contract the caller asserts per-node
        # state is executor-memory-small, so every node-sized join side
        # in the round is hinted into a broadcast join: the only shuffle
        # left per round is the contribution groupBy (round-11, guide
        # §2.4/§3.1 — without the hints AQE planned each of these as a
        # two-exchange sort-merge join, ~3 extra exchanges per round)
        if broadcast_ranks:
            agg = F.broadcast(agg)
        # the round's state carries the PREVIOUS rank and the loop-
        # invariant dangling flag, so the probe below is a join-free
        # aggregate over the state itself (round-11: it used to re-join
        # the previous ranks and the degree table every round)
        new_ranks = _ckpt(
            nodes.join(agg, on="node", how="left")
            .join(
                (F.broadcast(prev) if broadcast_ranks else prev)
                .select("node", F.col("r12").alias("_prev")),
                on="node",
                how="inner",
            )
            .select(
                "node",
                (
                    F.when(F.col("_seed"), F.lit(term1))
                    .otherwise(F.lit(0))
                    .cast("long")
                    + F.expr(
                        f"(85 * (coalesce(in12, 0)"
                        f" + if(_seed, {dang_per}, 0)) * 2 + 100) div 200"
                    )
                ).alias("r12"),
                "_prev",
                "_dangling",
            )
        )
        # ONE join-free probe job materializes the round and returns
        # both loop scalars: convergence delta and the next dangling mass
        probe = new_ranks.agg(
            F.max(F.abs(F.col("r12") - F.col("_prev"))).alias("dmax"),
            F.sum(
                F.when(F.col("_dangling"), F.col("r12")).otherwise(F.lit(0))
            ).alias("dang"),
        ).first()
        while pinned:
            pinned.pop().unpersist()
        ranks = new_ranks
        dangling12 = int(probe["dang"] or 0)
        if int(probe["dmax"] or 0) <= tol12:
            break
    e2.unpersist()
    degn.unpersist()
    nodes.unpersist()
    return ranks.select(
        "node",
        "r12",
        (F.col("r12").cast("double") / F.lit(float(S))).alias("rank"),
    )


def harmonic_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_radius: int = 8,
    lg_k: int = 10,
    round_to: int = 6,
    checkpoint_dir: str | None = None,
    stall_rounds: int = 2,
    broadcast_state: bool = False,
) -> DataFrame:
    """Approximate harmonic centrality via HyperBall (Boldi & Vigna
    2013): ``H(v) = Σ_{u≠v} 1/d(u→v)`` — the centrality Common Crawl
    publishes per host, robust on disconnected graphs (unreachable pairs
    contribute 0, no ∞ like closeness).

    Each node carries ONE mergeable HyperLogLog sketch of the set of
    nodes that can REACH it within radius r (Spark's native
    ``hll_sketch_agg``/``hll_union_agg`` — the same DataSketches state
    as ``profiling.build_distinct_sketches``).  Round r: every node
    unions its in-neighbors' radius-(r−1) sketches into its own, and
    adds ``(|B_r| − |B_{r−1}|)/r`` to its harmonic sum.  That is the
    whole algorithm — the sketch makes the per-node reachable-set union
    O(2^lg_k) bytes instead of O(|V|), which is WHY HyperBall scales to
    web graphs while textbook all-pairs BFS cannot.

    100 TB shape: per round ONE edge-sized join + ONE dst-keyed
    mergeable-sketch aggregate + a node-sized union/estimate map; state
    is |V| · (2^lg_k registers).  Rounds stop at ``max_radius`` or at
    the REGISTER-LEVEL fixpoint: the probe digests the sketch bytes
    (``Σ xxhash64(sk)``) and only stops when no sketch changed —
    HyperBall's own rule (estimates can stall for a round while
    registers still grow, then move again; stopping on estimates would
    truncate the tail).  State is checkpointed per round (the
    ``pagerank`` loop discipline via the shared ``_loop_state``).

    Approximate by construction (rule 8): HLL relative error
    ~1.04/√2^lg_k (3.3% at the default 10) per ball, so this is
    pytest-error-bound territory, not an oracle query.  The dominant
    cost is the per-round sketch SHUFFLE (every edge ships a sketch),
    which scales with 2^lg_k — HyperBall's own evaluations run registers
    this small or smaller for exactly that reason; raise lg_k only when
    ball-size accuracy (not rank order) is the product.  ``harmonic`` is
    rounded to ``round_to`` dp after each increment so repeated runs on
    one engine agree; cross-engine exactness is not claimed.

    Returns ``(node, harmonic, reach_est)`` — reach_est is the final
    ball size (how many nodes can reach v at all, ≈ in-component size).

    ``broadcast_state``: the ``pagerank(broadcast_ranks=...)`` contract,
    sketch edition — the caller asserts |V| · 2^lg_k sketch bytes fits
    executor memory (true for host graphs after ``host_edges``; never
    for page-level graphs), and every node-sized join side in the round
    is hinted into a broadcast join, leaving the in-neighbor sketch
    groupBy as the round's only shuffle.  Default off: at page scale
    the state must shuffle-join.
    """
    persisted, pinned, _persist, _ckpt = _loop_state(edges, checkpoint_dir)
    try:
        e = _persist(
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .where(
                F.col("a").isNotNull()
                & F.col("b").isNotNull()
                & (F.col("a") != F.col("b"))
            )
            .distinct()  # multi-edges don't change reachability
        )
        nodes = _persist(
            e.select(F.col("a").alias("node"))
            .union(e.select(F.col("b").alias("node")))
            .distinct()
        )
        # radius-0 ball = {v}: one single-row sketch per node
        state = nodes.groupBy("node").agg(
            F.hll_sketch_agg(F.col("node").cast("string"), F.lit(int(lg_k))).alias(
                "sk"
            )
        ).select(
            "node",
            "sk",
            F.round(F.hll_sketch_estimate(F.col("sk"))).cast("long").alias(
                "cnt"
            ),
            F.lit(0.0).alias("harmonic"),
        )
        state = _ckpt(state)
        # round-0 probe: total estimate AND a register-level digest —
        # "no sketch byte changed" is the true HyperBall fixpoint
        # (estimates can stall for a round while registers still grow at
        # large cardinalities, and growth can resume later).  Digest
        # stability relies on no-op hll_union re-serializing byte-
        # identically — TRUE after a sketch's first union (the first one
        # re-encodes), pinned by test_webgraph.
        # test_hll_union_byte_stability_for_the_digest_fixpoint; if an
        # engine upgrade breaks it the loop degrades to max_radius
        # rounds, never to wrong results
        p0 = state.agg(
            F.sum("cnt").alias("t"), F.sum(F.xxhash64("sk").cast("decimal(38,0)")).alias("h")
        ).first()
        prev_total, prev_digest = int(p0["t"] or 0), int(p0["h"] or 0)
        stall = 0
        for r in range(1, max_radius + 1):
            # in-neighbor union: edge a→b puts a's ball inside b's next
            nbr = (
                e.join(
                    F.broadcast(state) if broadcast_state else state,
                    on=F.col("a") == F.col("node"),
                )
                .groupBy(F.col("b").alias("node"))
                .agg(F.hll_union_agg(F.col("sk"), F.lit(False)).alias("nsk"))
            )
            if broadcast_state:
                nbr = F.broadcast(nbr)
            merged = state.join(nbr, on="node", how="left").select(
                "node",
                F.when(
                    F.col("nsk").isNotNull(),
                    F.hll_union(F.col("sk"), F.col("nsk"), False),
                )
                .otherwise(F.col("sk"))
                .alias("sk"),
                F.col("cnt").alias("_prev"),
                "harmonic",
            )
            new_state = _ckpt(
                merged.select(
                    "node",
                    "sk",
                    F.round(F.hll_sketch_estimate(F.col("sk")))
                    .cast("long")
                    .alias("cnt"),
                    "_prev",
                    "harmonic",
                ).select(
                    "node",
                    "sk",
                    "cnt",
                    F.round(
                        F.col("harmonic")
                        + F.greatest(
                            F.col("cnt") - F.col("_prev"), F.lit(0)
                        ).cast("double")
                        / F.lit(float(r)),
                        round_to,
                    ).alias("harmonic"),
                )
            )
            probe = new_state.agg(
                F.sum("cnt").alias("t"), F.sum(F.xxhash64("sk").cast("decimal(38,0)")).alias("h")
            ).first()
            total, digest = int(probe["t"] or 0), int(probe["h"] or 0)
            while len(pinned) > 1:  # keep the newest pinned frame hot
                pinned.pop(0).unpersist()
            state = new_state
            # register-level fixpoint: stop only when NO sketch changed
            # (digest + total both stable — collision odds ~2^-64)
            if total == prev_total and digest == prev_digest:
                break
            # stall guard (round-7, closing the ADVICE note): the digest
            # fixpoint assumes no-op hll_union re-serializes byte-
            # identically — if an engine upgrade breaks that, the digest
            # never stabilizes and the loop burns max_radius rounds of
            # sketch shuffles for nothing.  A round where the TOTAL
            # estimate didn't move added 0 to every harmonic sum;
            # ``stall_rounds`` consecutive such rounds ends the loop.
            # Estimates can stall one round while registers still grow
            # (the docstring's HyperBall caveat), so the default keeps
            # one grace round; the truncation risk beyond that is far
            # inside the sketch's own ~3% error (rule 8 territory).
            stall = stall + 1 if total == prev_total else 0
            if stall >= stall_rounds:
                break
            prev_total, prev_digest = total, digest
        return state.select(
            "node", "harmonic", F.col("cnt").alias("reach_est")
        )
    finally:
        for df in persisted:
            df.unpersist()
        # the returned frame reads its own (already-materialized)
        # checkpoint, so every pinned pre-checkpoint cache is droppable
        while pinned:
            pinned.pop().unpersist()


def pagerank_py(
    edge_list: list[tuple[str, str, int]],
    n_iter: int = 10,
    tol12: int = 0,
    seeds: set[str] | None = None,
) -> dict[str, int]:
    """Pure-Python integer twin of ``pagerank`` (same hu() arithmetic,
    same update order, same optional seed personalization) — the test
    oracle: the distributed loop must reproduce this dict exactly,
    r12 for r12."""
    S = PR_SCALE
    D12 = S * 85 // 100

    def hu(a: int, b: int) -> int:
        return (2 * a + b) // (2 * b)

    degw: dict[str, int] = {}
    out: dict[str, list[tuple[str, int]]] = {}
    nodes: set[str] = set()
    for a, b, w in edge_list:
        if w <= 0:
            continue
        degw[a] = degw.get(a, 0) + w
        out.setdefault(a, []).append((b, w))
        nodes.add(a)
        nodes.add(b)
    n = len(nodes)
    if n == 0:
        return {}
    tele = nodes if seeds is None else (nodes & seeds)
    if not tele:
        raise ValueError("seeds do not intersect the graph's node set")
    k = len(tele)
    r0 = hu(S, k)
    term1 = hu(S - D12, k)
    ranks = {v: (r0 if v in tele else 0) for v in nodes}
    dangling12 = sum(ranks[v] for v in nodes if v not in degw)
    for _ in range(n_iter):
        dang_per = hu(dangling12, k)
        in12: dict[str, int] = {}
        for a, targets in out.items():
            ra = ranks[a]
            da = degw[a]
            for b, w in targets:
                in12[b] = in12.get(b, 0) + hu(ra * w, da)
        new = {
            v: (term1 if v in tele else 0)
            + hu(85 * (in12.get(v, 0) + (dang_per if v in tele else 0)), 100)
            for v in nodes
        }
        dmax = max(abs(new[v] - ranks[v]) for v in nodes)
        ranks = new
        dangling12 = sum(ranks[v] for v in nodes if v not in degw)
        if dmax <= tol12:
            break
    return ranks


def host_link_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-host link-profile statistics: weighted out/in degree, distinct
    out/in neighbor counts, and the RECIPROCITY ratio — the share of a
    host's out-link weight whose reverse edge exists.  High reciprocity
    with high degree is the classic link-farm / mutual-promotion tell
    (TrustRank-era spam heuristics), the cheap complement to the rank
    priors: ``pagerank`` says how endorsed a host is, this says how
    organic the endorsements look.

    Plan: edges aggregate to the weighted pair relation once, ONE
    self-join on the reversed key marks reciprocated pairs, then one
    aggregate per side unions into per-host rows (full outer on host).
    Everything keyed by host pairs/hosts — no node ever sees more than
    its own edges.  ``reciprocity`` is a single IEEE division of two
    exact integers (deterministic; NULL for hosts with no out-links).

    Returns ``(node, out_w, in_w, out_hosts, in_hosts, recip_w,
    reciprocity)``.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    pairs = (
        edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w")
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull() & (w > 0))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    rev = pairs.select(
        F.col("b").alias("a"), F.col("a").alias("b"), F.lit(True).alias("_r")
    )
    marked = pairs.join(rev, on=["a", "b"], how="left")
    outs = marked.groupBy(F.col("a").alias("node")).agg(
        F.sum("w").alias("out_w"),
        F.count("*").alias("out_hosts"),
        F.sum(F.when(F.col("_r"), F.col("w")).otherwise(F.lit(0))).alias(
            "recip_w"
        ),
    )
    ins = pairs.groupBy(F.col("b").alias("node")).agg(
        F.sum("w").alias("in_w"), F.count("*").alias("in_hosts")
    )
    return (
        outs.join(ins, on="node", how="full")
        .na.fill(
            {"out_w": 0, "in_w": 0, "out_hosts": 0, "in_hosts": 0,
             "recip_w": 0}
        )
        .select(
            "node",
            "out_w",
            "in_w",
            "out_hosts",
            "in_hosts",
            "recip_w",
            F.when(
                F.col("out_w") > 0,
                F.col("recip_w").cast("double") / F.col("out_w"),
            ).alias("reciprocity"),
        )
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph induced
    by ``edges`` — the local clustering signal link-spam detectors pair
    with degree (a farm's hub has huge degree but few triangles; a real
    community is triangle-dense).

    The classic degree-ordered join (Schank & Wagner 2005; the shape
    every distributed triangle counter uses): orient each undirected
    edge from its lexicographically smaller ``(degree, node)`` endpoint
    to the larger, so every triangle closes at exactly ONE wedge and —
    the scale property — a hub with degree d contributes wedges bounded
    by its ORIENTED out-degree (≤ √|E| on any graph), never d², which
    is what kills the naive all-wedges join on power-law webs.

    Plan: 3 narrow preps + two equi-joins (wedge build, closure check);
    output one row per node with its triangle count (nodes in no
    triangle report 0).  All integer arithmetic.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        # the canonical edge set is consumed FOUR times (degree count,
        # both wedge sides through the orientation, closure probe);
        # without materialization every branch replays the upstream
        # extraction lineage — measured 137 exchanges for the planted-URL
        # graph vs single digits materialized.  Lazy local checkpoint =
        # computed once on first use, the house pattern (q_simhash,
        # pagerank's persisted edges)
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select("b"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient by (deg, node) total order — ties can't double-orient
    da = deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "_da")
    db = deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "_db")
    ordered = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("o")
        )
        .select("o.u", "o.v")
    )
    # wedges u→v1, u→v2 with v1 < v2 BY ID, closed against the CANONICAL
    # (a < b) edge set — a pure (v1, v2) = (a, b) equi-join, never an OR
    # condition (which Catalyst can only nested-loop).  Uniqueness: the
    # (deg, node) orientation is acyclic, so each triangle has exactly
    # one node with both out-edges — one wedge per triangle.
    w1 = ordered.select(F.col("u"), F.col("v").alias("v1"))
    w2 = ordered.select(F.col("u"), F.col("v").alias("v2"))
    wedges = w1.join(w2, "u").where(F.col("v1") < F.col("v2"))
    tri = wedges.join(
        e, (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b"))
    ).select("u", "v1", "v2")
    per_node = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select("v1"))
        .unionAll(tri.select("v2"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
    )
