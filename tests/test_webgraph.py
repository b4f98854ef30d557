"""Web-graph signals: link extraction, host graphs, integer-exact
PageRank (vs the pure-Python integer twin)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.webgraph import (
    PR_SCALE,
    extract_outlinks,
    host_edges,
    pagerank,
    pagerank_py,
    text_link_edges,
    url_host,
)


def _run_pr(spark, edge_list, **kw):
    df = spark.createDataFrame(edge_list, "src string, dst string, w long")
    got = pagerank(df, weight_col="w", **kw)
    return {r["node"]: r["r12"] for r in got.collect()}


class TestPagerank:
    def test_matches_python_twin_small(self, spark):
        edges = [
            ("a", "b", 1),
            ("b", "c", 1),
            ("c", "a", 1),
            ("a", "d", 1),  # d is dangling
        ]
        got = _run_pr(spark, edges, n_iter=5)
        want = pagerank_py(edges, n_iter=5)
        assert got == want

    def test_matches_python_twin_weighted_multigraph(self, spark):
        edges = [
            ("h1", "h2", 7),
            ("h1", "h3", 3),
            ("h2", "h1", 1),
            ("h3", "h3", 2),  # self-loop
            ("h4", "h1", 5),  # h4 never linked-to
        ]
        for it in (1, 3, 8):
            assert _run_pr(spark, edges, n_iter=it) == pagerank_py(
                edges, n_iter=it
            )

    def test_mass_conservation_within_rounding(self, spark):
        edges = [("a", "b", 1), ("b", "a", 1), ("a", "c", 1)]
        got = _run_pr(spark, edges, n_iter=6)
        total = sum(got.values())
        # each node's update rounds at most once per hu(); drift stays
        # within a few units per node per round
        assert abs(total - PR_SCALE) < 6 * 6 * 3

    def test_dangling_mass_redistributed(self, spark):
        # star into a sink: without dangling redistribution the sink
        # would swallow all mass and sources decay to (1-d)/N only
        edges = [("s1", "sink", 1), ("s2", "sink", 1)]
        got = _run_pr(spark, edges, n_iter=10)
        want = pagerank_py(edges, n_iter=10)
        assert got == want
        assert got["sink"] > got["s1"] == got["s2"]
        # sources still receive the sink's redistributed mass: strictly
        # above the no-redistribution floor (1-d)/N
        floor = (2 * (PR_SCALE - PR_SCALE * 85 // 100) + 3) // 6
        assert got["s1"] > floor

    def test_convergence_stop(self, spark):
        edges = [("a", "b", 1), ("b", "a", 1)]
        # symmetric 2-cycle: converged after the first round; tol stops
        # the loop and the result equals the twin at any larger n_iter
        got = _run_pr(spark, edges, n_iter=50, tol12=0)
        assert got == pagerank_py(edges, n_iter=50, tol12=0)

    def test_deterministic_across_layouts(self, spark):
        edges = [(f"n{i}", f"n{(i * 7) % 23}", 1 + i % 3) for i in range(60)]
        df1 = spark.createDataFrame(edges, "src string, dst string, w long")
        df2 = df1.repartition(13)
        a = {
            r["node"]: r["r12"]
            for r in pagerank(df1, weight_col="w", n_iter=4).collect()
        }
        b = {
            r["node"]: r["r12"]
            for r in pagerank(df2, weight_col="w", n_iter=4).collect()
        }
        assert a == b == pagerank_py([(s, d, w) for s, d, w in edges], n_iter=4)

    def test_unweighted_duplicate_edges_count_as_links(self, spark):
        dup = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a")]
        df = spark.createDataFrame(dup, "src string, dst string")
        got = {r["node"]: r["r12"] for r in pagerank(df, n_iter=3).collect()}
        # duplicates contribute PER ROW (each hu() rounds separately), so
        # the twin sees the same duplicated rows — NOT the aggregated
        # weight-2 edge, whose single hu(2r, deg) rounds differently;
        # host_edges is the way to get weighted semantics
        want = pagerank_py(
            [(s, d, 1) for s, d in dup], n_iter=3
        )
        assert got == want
        agg = pagerank_py([("a", "b", 2), ("a", "c", 1), ("b", "a", 1)], n_iter=3)
        assert sum(agg.values()) == pytest.approx(sum(got.values()), abs=20)

    def test_personalized_matches_twin_and_localizes(self, spark):
        # two communities bridged by one weak link; seeding in community
        # A must rank A's members above B's
        edges = [
            ("a1", "a2", 3), ("a2", "a1", 3), ("a2", "a3", 2),
            ("a3", "a1", 2),
            ("a3", "b1", 1),  # bridge
            ("b1", "b2", 3), ("b2", "b3", 3), ("b3", "b1", 3),
        ]
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        sd = spark.createDataFrame([("a1",), ("a2",)], "node string")
        got = {
            r["node"]: r["r12"]
            for r in pagerank(
                df, weight_col="w", n_iter=6, seeds=sd
            ).collect()
        }
        want = pagerank_py(edges, n_iter=6, seeds={"a1", "a2"})
        assert got == want
        assert min(got["a1"], got["a2"], got["a3"]) > max(
            got["b2"], got["b3"]
        )

    def test_seeds_outside_graph_raise(self, spark):
        df = spark.createDataFrame(
            [("a", "b", 1)], "src string, dst string, w long"
        )
        sd = spark.createDataFrame([("zzz",)], "node string")
        with pytest.raises(ValueError, match="seeds do not intersect"):
            pagerank(df, weight_col="w", n_iter=2, seeds=sd)

    def test_no_nested_loop_joins(self, spark):
        df = spark.createDataFrame(
            [("a", "b", 1), ("b", "a", 1)], "src string, dst string, w long"
        )
        plan = pagerank(df, weight_col="w", n_iter=2)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestLinkExtraction:
    def test_extract_outlinks_both_quote_styles(self, spark):
        html = (
            '<a href="https://x.com/a">x</a> '
            "<a href='http://y.org/b?q=1'>y</a> "
            '<a href="/relative">rel</a> '
            '<link href="https://cdn.z.net/s.css">'
        )
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        got = [
            r["href"]
            for r in extract_outlinks(df, "doc_id").orderBy("href").collect()
        ]
        assert got == [
            "http://y.org/b?q=1",
            "https://cdn.z.net/s.css",
            "https://x.com/a",
        ]
        all_links = extract_outlinks(df, "doc_id", absolute_only=False)
        assert all_links.count() == 4
        # link_idx follows DOCUMENT order even across mixed quote styles
        ordered = [
            (r["link_idx"], r["href"])
            for r in all_links.orderBy("link_idx").collect()
        ]
        assert [h for _, h in ordered] == [
            "https://x.com/a",
            "http://y.org/b?q=1",
            "/relative",
            "https://cdn.z.net/s.css",
        ]

    def test_url_host(self, spark):
        df = spark.createDataFrame(
            [
                ("https://A.Example.com/p?x=1",),
                ("http://b.org",),
                ("ftp://nope.com/x",),
                ("not a url",),
            ],
            "u string",
        )
        got = [r["h"] for r in df.select(url_host(F.col("u")).alias("h")).collect()]
        assert got == ["a.example.com", "b.org", None, None]

    def test_text_link_edges_consecutive_pairs(self, spark):
        df = spark.createDataFrame(
            [
                (1, "see https://a.com/1 then https://b.com/2 and https://a.com/3"),
                (2, "only https://solo.net/x here"),
                (3, "dup https://c.io/a https://c.io/b stays dropped"),
            ],
            "doc_id long, text string",
        )
        got = sorted(
            (r["src"], r["dst"])
            for r in text_link_edges(df, "doc_id").collect()
        )
        assert got == [("a.com", "b.com"), ("b.com", "a.com")]

    def test_host_edges_weights(self, spark):
        df = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("a", "c")], "src string, dst string"
        )
        got = {
            (r["src"], r["dst"]): r["weight"]
            for r in host_edges(df).collect()
        }
        assert got == {("a", "b"): 2, ("a", "c"): 1}


def _harmonic_exact(edge_list):
    """Exact harmonic centrality by BFS from every node (test oracle)."""
    from collections import defaultdict, deque

    out = defaultdict(list)
    nodes = set()
    for a, b in edge_list:
        if a != b:
            out[a].append(b)
        nodes.add(a)
        nodes.add(b)
    h = {v: 0.0 for v in nodes}
    for u in nodes:
        dist = {u: 0}
        q = deque([u])
        while q:
            x = q.popleft()
            for y in out[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for v, d in dist.items():
            if d > 0:
                h[v] += 1.0 / d
    return h


class TestHarmonicCentrality:
    def test_small_graph_within_sketch_error(self, spark):
        from buildkite_logs_parquet_spark.operators.webgraph import (
            harmonic_centrality,
        )

        # chain + star: exact answers are tiny integers/fractions, and
        # at these cardinalities the HLL sketch is still exact
        edge_list = [
            ("a", "b"), ("b", "c"), ("c", "d"),
            ("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "d"),
        ]
        df = spark.createDataFrame(edge_list, "src string, dst string")
        got = {
            r["node"]: (r["harmonic"], r["reach_est"])
            for r in harmonic_centrality(df, max_radius=6).collect()
        }
        want = _harmonic_exact(edge_list)
        for v, hw in want.items():
            assert got[v][0] == pytest.approx(hw, rel=0.05), v
        # reach counts: d is reachable from everything
        assert got["d"][1] == 8
        assert got["s1"][1] == 1  # nobody reaches a source but itself

    def test_fixpoint_stops_before_max_radius(self, spark):
        from buildkite_logs_parquet_spark.operators.webgraph import (
            harmonic_centrality,
        )

        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        got = {
            r["node"]: r["harmonic"]
            for r in harmonic_centrality(df, max_radius=50).collect()
        }
        assert got == {"a": 0.0, "b": 1.0}

    def test_larger_random_graph_error_bound(self, spark):
        from buildkite_logs_parquet_spark.operators.webgraph import (
            harmonic_centrality,
        )

        edge_list = sorted(
            {(f"n{(i * 13) % 60}", f"n{(i * 29 + 7) % 60}") for i in range(150)}
        )
        edge_list = [(a, b) for a, b in edge_list if a != b]
        df = spark.createDataFrame(edge_list, "src string, dst string")
        got = {
            r["node"]: r["harmonic"]
            for r in harmonic_centrality(df, max_radius=12).collect()
        }
        want = _harmonic_exact(edge_list)
        import math

        rel_errs = [
            abs(got[v] - want[v]) / want[v]
            for v in want
            if want[v] > 0
        ]
        # HLL at lg_k=12 on <=60-element sets is exact or near-exact
        assert max(rel_errs) < 0.05
        assert math.isclose(
            sum(got.values()), sum(want.values()), rel_tol=0.05
        )


# ------------------------------------------------------ hypothesis suite

from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_pagerank_twin_property(spark, raw_edges, n_iter):
    """For ANY small weighted digraph the distributed integer loop
    reproduces the Python twin r12-for-r12."""
    edges = [(f"v{a}", f"v{b}", w) for a, b, w in raw_edges]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r["node"]: r["r12"]
        for r in pagerank(df, weight_col="w", n_iter=n_iter).collect()
    }
    assert got == pagerank_py(edges, n_iter=n_iter)


class TestHostLinkStats:
    def test_reciprocity_and_degrees(self, spark):
        from buildkite_logs_parquet_spark.operators.webgraph import (
            host_link_stats,
        )

        edges = [
            ("a", "b", 3), ("b", "a", 1),   # mutual pair
            ("a", "c", 2),                   # one-way
            ("a", "b", 1),                   # duplicate pair row: w sums
        ]
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        got = {r["node"]: r for r in host_link_stats(df, weight_col="w").collect()}
        a, b, c = got["a"], got["b"], got["c"]
        assert (a["out_w"], a["in_w"], a["out_hosts"], a["in_hosts"]) == (6, 1, 2, 1)
        assert a["recip_w"] == 4 and a["reciprocity"] == 4 / 6
        assert (b["out_w"], b["recip_w"], b["reciprocity"]) == (1, 1, 1.0)
        assert (c["out_w"], c["in_w"], c["reciprocity"]) == (0, 2, None)

    def test_link_farm_ranks_highest_reciprocity(self, spark):
        from buildkite_logs_parquet_spark.operators.webgraph import (
            host_link_stats,
        )

        # a 4-host clique (farm) + a chain of organic one-way links
        farm = [(f"f{i}", f"f{j}", 5) for i in range(4) for j in range(4) if i != j]
        organic = [(f"o{i}", f"o{i+1}", 1) for i in range(5)]
        df = spark.createDataFrame(farm + organic, "src string, dst string, w long")
        got = host_link_stats(df, weight_col="w")
        top = got.where(F.col("out_w") > 0).orderBy(
            F.col("reciprocity").desc(), "node"
        ).collect()
        assert all(r["node"].startswith("f") for r in top[:4])
        assert all(r["reciprocity"] == 1.0 for r in top[:4])
        assert all(r["reciprocity"] == 0.0 for r in top[4:])


def test_hll_union_byte_stability_for_the_digest_fixpoint(spark):
    """harmonic_centrality's register-level fixpoint compares
    sum(xxhash64(sk)) across rounds, which requires a no-op hll_union
    (neighbour ball ⊆ own ball) to re-serialize byte-identically —
    OTHERWISE the digest would never stabilize and every run would burn
    all max_radius rounds (results still correct, rounds wasted).

    Measured semantics this test pins (DataSketches via Spark 4):

    * the FIRST union re-encodes the aggregate's sketch bytes (target
      HLL mode differs from hll_sketch_agg's), so digests legitimately
      move in the round a node first receives an in-neighbour merge;
    * every LATER no-op union — self or subset — reproduces the exact
      bytes, so from the first post-merge round onward the digest is a
      true fixpoint detector and the loop stops one probe after the
      balls stop growing.

    If an engine upgrade breaks the second property, this test fails
    and the loop needs a fallback stop (e.g. two stable-total rounds)."""
    from pyspark.sql import functions as F

    df = spark.range(200).select(F.col("id").cast("string").alias("s"))
    sk = df.agg(F.hll_sketch_agg("s", F.lit(10)).alias("sk"))
    sub = (
        spark.range(50)
        .select(F.col("id").cast("string").alias("s"))
        .agg(F.hll_sketch_agg("s", F.lit(10)).alias("sub"))
    )
    row = (
        sk.crossJoin(sub)  # 1x1: two single-row locals, not a data join
        .select(F.hll_union("sk", "sk", False).alias("u1"), "sk", "sub")
        .select(
            F.xxhash64("u1").alias("h1"),
            F.xxhash64(F.hll_union("u1", "u1", False)).alias("h_self"),
            F.xxhash64(F.hll_union("u1", "sk", False)).alias("h_orig"),
            F.xxhash64(F.hll_union("u1", "sub", False)).alias("h_subset"),
            F.xxhash64(
                F.hll_union(F.hll_union("u1", "sub", False), "sub", False)
            ).alias("h_subset2"),
        )
        .first()
    )
    assert row["h_self"] == row["h1"], "post-merge self-union changed bytes"
    assert row["h_orig"] == row["h1"], "union with the original changed bytes"
    assert row["h_subset"] == row["h1"], "subset-union changed bytes"
    assert row["h_subset2"] == row["h1"], "repeated subset-union changed bytes"


class TestHarmonicStallGuard:
    def test_stall_guard_bounds_rounds_when_digest_never_stabilizes(
        self, spark, monkeypatch
    ):
        """Round-7 ADVICE fix: the register-digest fixpoint assumes no-op
        hll_union re-serializes byte-identically.  Simulate that
        assumption breaking (digest differs every round) and assert the
        estimate-stall guard still ends the loop right after the ball
        stops growing — instead of burning all max_radius rounds — with
        unchanged results."""
        import itertools

        from buildkite_logs_parquet_spark.operators import webgraph as WG

        edge_list = [("a", "b"), ("b", "c"), ("c", "d")]  # diameter 3
        df = spark.createDataFrame(edge_list, "src string, dst string")
        baseline = {
            r["node"]: (r["harmonic"], r["reach_est"])
            for r in WG.harmonic_centrality(df, max_radius=40).collect()
        }

        real_xxhash64 = WG.F.xxhash64
        counter = itertools.count()
        probes = []

        def churning_digest(col):
            # a fresh literal per PROBE makes the digest different every
            # round — the byte-instability failure mode, exactly
            n = next(counter)
            probes.append(n)
            return real_xxhash64(WG.F.concat(col, WG.F.lit(str(n))))

        monkeypatch.setattr(WG.F, "xxhash64", churning_digest)
        got = {
            r["node"]: (r["harmonic"], r["reach_est"])
            for r in WG.harmonic_centrality(df, max_radius=40).collect()
        }
        assert got == baseline
        # probes: 1 at round 0 + one per round; diameter 3 growth rounds
        # + stall_rounds(2) grace, nowhere near max_radius=40
        assert len(probes) <= 1 + 3 + 3, probes


class TestTriangleCounts:
    @staticmethod
    def _brute(edge_list):
        import itertools

        adj = {}
        for a, b in edge_list:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri = {v: 0 for v in adj}
        for x, y, z in itertools.combinations(sorted(adj), 3):
            if y in adj[x] and z in adj[x] and z in adj[y]:
                tri[x] += 1
                tri[y] += 1
                tri[z] += 1
        return {v: (len(adj[v]), tri[v]) for v in adj}

    def test_matches_brute_force_on_random_graph(self, spark):
        from buildkite_logs_parquet_spark.operators.webgraph import (
            triangle_counts,
        )

        edge_list = sorted(
            {
                (f"n{(i * 7) % 25}", f"n{(i * 11 + 3) % 25}")
                for i in range(120)
            }
        )
        edge_list = [(a, b) for a, b in edge_list if a != b]
        df = spark.createDataFrame(edge_list, "src string, dst string")
        got = {
            r["node"]: (r["deg"], r["n_triangles"])
            for r in triangle_counts(df).collect()
        }
        assert got == self._brute(edge_list)

    def test_direction_and_duplicate_edges_collapse(self, spark):
        from buildkite_logs_parquet_spark.operators.webgraph import (
            triangle_counts,
        )

        # triangle a-b-c plus duplicates/reverses/self-loop and a
        # dangling node d: exactly one triangle each for a, b, c
        rows = [
            ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
            ("a", "b"), ("c", "c"), ("c", "d"),
        ]
        df = spark.createDataFrame(rows, "src string, dst string")
        got = {
            r["node"]: (r["deg"], r["n_triangles"])
            for r in triangle_counts(df).collect()
        }
        assert got == {
            "a": (2, 1), "b": (2, 1), "c": (3, 1), "d": (1, 0),
        }

    def test_plan_has_no_nested_loop_join(self, spark):
        from buildkite_logs_parquet_spark.operators.webgraph import (
            triangle_counts,
        )
        from buildkite_logs_parquet_spark.plans.checks import explain_str

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
        )
        plan = explain_str(triangle_counts(df), "simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
