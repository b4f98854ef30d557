"""Similarity search tests: exact brute-force vs LSH-pruned variants."""

import math
import random

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import similarity as S

DIM = 16
N = 60


def _vec(rng):
    return [rng.gauss(0, 1) for _ in range(DIM)]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = random.Random(7)
    base = _vec(rng)
    rows = [(0, [float(x) for x in base])]
    for i in range(1, N):
        if i <= 3:  # near-dups of vector 0
            v = [x + rng.gauss(0, 0.01) for x in base]
        else:
            v = _vec(rng)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), rows


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_cosine_topk_matches_python(spark, vectors):
    df, rows = vectors
    q = rows[0][1]
    got = S.cosine_topk(df.where(F.col("vec_id") != 0), q, k=5).collect()
    want = sorted(
        ((i, _cos([float(x) for x in v], q)) for i, v in rows[1:]),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [r["vec_id"] for r in got] == [i for i, _ in want]
    for r, (_, c) in zip(got, want):
        assert abs(r["cosine"] - c) < 1e-6


def test_lsh_topk_finds_near_duplicates(spark, vectors):
    df, rows = vectors
    q = rows[0][1]
    got = S.cosine_topk_lsh(
        df.where(F.col("vec_id") != 0), q, k=3, dim=DIM, n_planes=6, probe_hamming=1
    ).collect()
    # the three perturbed copies are ~identical to q; LSH must find them
    assert {r["vec_id"] for r in got} == {1, 2, 3}


def test_near_dup_pairs_brute_vs_lsh(spark, vectors):
    df, _ = vectors
    brute = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup_pairs(df, threshold=0.99, brute_force=True, dim=DIM).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup_pairs(df, threshold=0.99, dim=DIM, n_planes=4).collect()
    }
    expected = {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    assert brute == expected
    assert lsh == expected  # colliding buckets at this threshold


def test_banded_lsh_subset_of_brute(spark, vectors):
    """OR-amplified (banded) LSH returns a subset of the exact pair set,
    with identical cosines, and at near-identical vectors full recall."""
    df, _ = vectors
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.embedding_near_dup_pairs(
            df, threshold=0.9, brute_force=True, dim=DIM
        ).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in S.embedding_near_dup_pairs(
            df, threshold=0.9, dim=DIM, n_planes=8, bands=4
        ).collect()
    }
    assert set(banded) <= set(brute)
    for pair, c in banded.items():
        assert abs(c - brute[pair]) < 1e-12
    # the 0.99-cosine clique must survive banding (some band always agrees)
    assert {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)} <= set(banded)
    # multi-band collisions must not duplicate pairs
    out = S.embedding_near_dup_pairs(df, threshold=0.9, dim=DIM, n_planes=8, bands=4)
    assert out.count() == out.select("id_a", "id_b").distinct().count()


def test_near_dup_pairs_salted_bit_equal(spark, vectors):
    """Triangular salting (the hot-bucket skew hatch) is a pure physical
    rewrite: pair set AND cosines bit-equal to the unsalted band join,
    and the salt actually reaches the executed plan."""
    df, _ = vectors
    plain = sorted(
        map(
            tuple,
            S.embedding_near_dup_pairs(
                df, threshold=0.9, dim=DIM, n_planes=8, bands=4
            ).collect(),
        )
    )
    salted_df = S.embedding_near_dup_pairs(
        df, threshold=0.9, dim=DIM, n_planes=8, bands=4, n_salts=4
    )
    assert "pmod" in salted_df._jdf.queryExecution().executedPlan().toString()
    salted = sorted(map(tuple, salted_df.collect()))
    assert salted == plain and len(plain) >= 6


def test_ivf_assign_partitions_all_rows(spark, vectors):
    df, rows = vectors
    centroids = [rows[0][1], rows[10][1], rows[20][1]]
    out = S.ivf_assign(df, centroids)
    assert out.where(F.col("ivf_cell").isNull()).count() == 0
    assert out.select("ivf_cell").distinct().count() <= 3
    # vector 0 must land on its own centroid
    assert out.where(F.col("vec_id") == 0).first()["ivf_cell"] == 0


def test_ivf_topk_equals_bruteforce_within_probed_cells(spark, vectors):
    """ivf_topk == exact top-k restricted to the probed cells, and the
    probed cells are the query's nearest centroids."""
    df, rows = vectors
    rng = random.Random(3)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    qvec = rows[0][1]
    got = S.ivf_topk(
        df.where(F.col("vec_id") != 0), centroids, qvec, k=5, n_probe=2,
        round_to=None,
    ).collect()
    # reference: assign in python, keep 2 nearest cells, brute-force score
    def cell(v):
        best, bs = 0, None
        for cid, c in enumerate(centroids):
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            s = sum(a * b / cn for a, b in zip(v, c))
            if bs is None or s > bs:
                best, bs = cid, s
        return best

    qn = math.sqrt(sum(x * x for x in qvec))
    ranked = sorted(
        range(len(centroids)),
        key=lambda cid: (
            -sum(a * b for a, b in zip(qvec, centroids[cid]))
            / (qn * (math.sqrt(sum(x * x for x in centroids[cid])) or 1.0)),
            cid,
        ),
    )
    probed = set(ranked[:2])
    want = sorted(
        (
            (vid, _cos(v, qvec))
            for vid, v in rows
            if vid != 0 and cell(v) in probed
        ),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r["vec_id"]) for r in got] == [vid for vid, _ in want]
    # rows hold float64 but the table stores float32 — compare loosely
    for r, (_, c) in zip(got, want):
        assert abs(r["cosine"] - c) < 1e-6


def test_ivf_topk_near_dups_found_with_full_probe(spark, vectors):
    """Probing every cell must recover the exact top-k — the approximation
    error is entirely the probe choice."""
    df, rows = vectors
    rng = random.Random(3)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    qvec = rows[0][1]
    approx = S.ivf_topk(
        df.where(F.col("vec_id") != 0), centroids, qvec, k=3,
        n_probe=len(centroids), round_to=None,
    ).collect()
    exact = S.cosine_topk(
        df.where(F.col("vec_id") != 0), qvec, k=3, round_to=None
    ).collect()
    assert [r["vec_id"] for r in approx] == [r["vec_id"] for r in exact]
    # the near-dup plants of vector 0 dominate
    assert {r["vec_id"] for r in approx} == {1, 2, 3}


def test_kmeans_step_hand_computed(spark):
    """Tiny 2-D instance: assignment to the nearest of two centroids, new
    centroid = per-cell sum vector, drift = cosine(old, sum)."""
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (0, [2.0, 0.1]),   # cell 0
        (1, [3.0, -0.2]),  # cell 0
        (2, [0.1, 5.0]),   # cell 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["ivf_cell"]: r for r in S.kmeans_step(df, cents).collect()}
    assert out[0]["n_assigned"] == 2 and out[1]["n_assigned"] == 1
    # cell 0: sum = (5.0, -0.1); drift = cos([1,0], [5,-0.1])
    want0 = _cos([1.0, 0.0], [5.0, -0.1])
    assert abs(out[0]["centroid_drift"] - round(want0, 4)) < 1e-9
    want1 = _cos([0.0, 1.0], [0.1, 5.0])
    assert abs(out[1]["centroid_drift"] - round(want1, 4)) < 1e-9


def test_kmeans_step_empty_cells_absent_and_layout_independent(spark):
    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    rows = [(i, [1.0 + 0.01 * i, 0.001 * i]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.kmeans_step(df, cents).collect()
    assert {r["ivf_cell"] for r in out} == {0}  # cells 1, 2 never appear
    assert out[0]["n_assigned"] == 50
    # decimal sums make the drift identical under any partition layout
    out2 = S.kmeans_step(df.repartition(7), cents).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]


def test_kmeans_fit_converges_on_separated_blobs(spark):
    """Three well-separated directional blobs, deliberately bad init:
    kmeans_fit must converge (drift → ~0 before max_iter), put each blob
    in its own cell, and report a monotone-ish shrinking drift."""
    rng = random.Random(7)
    true_dirs = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    for b, d in enumerate(true_dirs):
        for i in range(30):
            rows.append(
                (b * 100 + i, [x + rng.gauss(0, 0.3) for x in d])
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    init = [[1.0, 0.5, 0.0], [0.5, 1.0, 0.0], [0.4, 0.4, 0.8]]
    cents, hist = S.kmeans_fit(df, init, max_iter=10, tol=1e-9)
    assert hist[-1]["max_drift"] <= 1e-9  # converged, not exhausted
    assert len(hist) < 10
    # each learned centroid aligns with exactly one true direction
    aligned = set()
    for c in cents:
        sims = [_cos(c, d) for d in true_dirs]
        best = max(range(3), key=lambda i: sims[i])
        assert sims[best] > 0.99
        aligned.add(best)
    assert aligned == {0, 1, 2}
    # counts at convergence: one blob per cell
    assert sorted(hist[-1]["counts"]) == [30, 30, 30]


def test_kmeans_fit_determinism_and_empty_cell_hold(spark):
    """Same data, different physical layout → bit-identical centroids
    (decimal sums + driver-side float math); a centroid that captures no
    vectors survives unchanged."""
    rows = [(i, [1.0 + 0.01 * i, 0.001 * i]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    init = [[1.0, 0.0], [-1.0, 0.0]]
    c_a, h_a = S.kmeans_fit(df, init, max_iter=3, tol=0.0)
    c_b, h_b = S.kmeans_fit(df.repartition(11), init, max_iter=3, tol=0.0)
    assert c_a == c_b
    assert [h["counts"] for h in h_a] == [h["counts"] for h in h_b]
    assert c_a[1] == [-1.0, 0.0]  # empty cell kept its centroid verbatim


def test_kmeans_fit_feeds_semantic_dedup(spark, vectors):
    """The SemDeDup recipe end-to-end: learn centroids with kmeans_fit,
    then semantic_dedup with the LEARNED centroids — dup pairs planted in
    the corpus must still be flagged, and every row gets a cell."""
    df, rows = vectors
    rng = random.Random(31)
    init = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    cents, hist = S.kmeans_fit(df, init, max_iter=5, tol=1e-6)
    assert len(cents) == 4 and all(len(c) == DIM for c in cents)
    out = S.semantic_dedup(df, cents, threshold=0.9).collect()
    assert len(out) == len(rows)
    assert any(r["is_semantic_dup"] for r in out)


# ---------------------------------------------------------------- SemDeDup


def test_semantic_dedup_marks_in_cell_near_dups(spark, vectors):
    df, rows = vectors
    rng = random.Random(99)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    out = {
        r["vec_id"]: r
        for r in S.semantic_dedup(
            df, centroids, threshold=0.98, round_to=6
        ).collect()
    }
    # every input row is labeled
    assert set(out) == set(range(N))
    # vectors 1..3 are near-clones of 0 → same cell, cosine ~1 → dups;
    # vector 0 (the lowest id in the clone group) is kept
    assert not out[0]["is_semantic_dup"]
    for i in (1, 2, 3):
        assert out[i]["is_semantic_dup"], i
    # a kept row's cell must host no LOWER-id kept row within threshold:
    # verify against brute force inside each cell
    vecs = {r["vec_id"]: r for r in df.collect()}
    by_cell = {}
    for vid, r in out.items():
        by_cell.setdefault(r["ivf_cell"], []).append(vid)
    def cos(a, b):
        da = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return da / (na * nb)
    for cell, ids in by_cell.items():
        for vid in ids:
            expect_dup = any(
                other < vid
                and round(
                    cos(vecs[other]["embedding"], vecs[vid]["embedding"]), 6
                )
                >= 0.98
                for other in ids
            )
            assert out[vid]["is_semantic_dup"] == expect_dup, (cell, vid)


def test_ivf_cells_as_partition_column_prune_at_rest(spark, vectors, tmp_path):
    """The IVF 100 TB claim made real: write the corpus partitioned by
    ivf_cell, probe 2 cells — the scan must prune cell directories via
    PartitionFilters AND return exactly the probed cells' rows."""
    df, rows = vectors
    rng = random.Random(21)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    assigned = S.ivf_assign(df, centroids)
    lake = str(tmp_path / "ivf_lake")
    assigned.write.partitionBy("ivf_cell").parquet(lake)

    at_rest = spark.read.parquet(lake)
    probed = at_rest.where(F.col("ivf_cell").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan[:800]
    # and no ivf_cell predicate leaked into the row-level data filters
    d = re.search(r"DataFilters: \[([^\]]*)\]", plan)
    if d:
        assert "ivf_cell" not in d.group(1)

    want = {
        r["vec_id"] for r in assigned.where(F.col("ivf_cell").isin([0, 1])).collect()
    }
    got = {r["vec_id"] for r in probed.collect()}
    assert got == want and got  # non-empty probe


def test_write_ivf_lake_and_query_at_rest(spark, vectors, tmp_path):
    """The user-facing IVF-at-rest pair: write_ivf_lake partitions by
    cell; ivf_topk_at_rest prunes cell directories (PartitionFilters) and
    returns exactly the in-memory ivf_topk answer for the same probes."""
    df, rows = vectors
    rng = random.Random(77)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    lake = str(tmp_path / "lake")
    S.write_ivf_lake(df, centroids, lake)

    qvec = [float(x) for x in rows[0][1]]
    got = S.ivf_topk_at_rest(
        spark, lake, centroids, qvec, k=5, n_probe=2
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    want = S.ivf_topk(df, centroids, qvec, k=5, n_probe=2)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_ivf_topk_join_matches_per_query(spark, vectors):
    """Batch k-NN equals the single-query operator run per query (same
    centroids, same probe count) — queries supplied as float64 so both
    paths score identical bits."""
    df, rows = vectors
    rng = random.Random(11)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    qrows = [(100 + i, [float(x) for x in rows[i][1]]) for i in range(5)]
    queries = spark.createDataFrame(qrows, "query_id long, embedding array<double>")
    out = S.ivf_topk_join(
        queries, df, centroids, k=4, n_probe=2, round_to=None
    ).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in qrows}
    for qid, qvec in qrows:
        got = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
        want = S.ivf_topk(
            df, centroids, qvec, k=4, n_probe=2, round_to=None
        ).collect()
        assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
        for g, w in zip(got, want):
            assert abs(g["cosine"] - w["cosine"]) < 1e-9


def test_ivf_topk_join_full_probe_is_exact(spark, vectors):
    """Probing every cell recovers the exact per-query brute-force top-k."""
    df, rows = vectors
    rng = random.Random(12)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(3)]
    qrows = [(0, [float(x) for x in rows[0][1]])]
    queries = spark.createDataFrame(qrows, "query_id long, embedding array<double>")
    got = (
        S.ivf_topk_join(queries, df, centroids, k=4, n_probe=3, round_to=None)
        .orderBy("rank")
        .collect()
    )
    # near-dup family 0..3 tops the exact ranking (query IS vector 0;
    # the perturbed copies' relative order is score-determined)
    assert got[0]["vec_id"] == 0 and got[0]["rank"] == 1
    assert {r["vec_id"] for r in got} == {0, 1, 2, 3}


def test_ivf_topk_join_at_rest_matches_and_prunes(spark, vectors, tmp_path):
    """Batch k-NN against the at-rest lake: same answers as the in-memory
    operator, and the scan carries a literal PartitionFilters predicate
    over the probed cells (static directory pruning)."""
    from buildkite_logs_parquet_spark.plans.checks import explain_str

    df, rows = vectors
    rng = random.Random(13)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    path = str(tmp_path / "ivf_lake_batch")
    S.write_ivf_lake(df, centroids, path)
    queries = spark.createDataFrame(
        [(i, [float(x) for x in rows[i][1]]) for i in range(3)],
        "query_id long, embedding array<double>",
    )
    at_rest = S.ivf_topk_join_at_rest(
        spark, path, queries, centroids, k=5, n_probe=2, round_to=None
    )
    in_mem = S.ivf_topk_join(queries, df, centroids, k=5, n_probe=2, round_to=None)
    a = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in at_rest.collect())
    b = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in in_mem.collect())
    assert a == b
    plan = explain_str(at_rest)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan[:2000]


def test_semantic_contamination_flags_benchmark_neighbors(spark, vectors):
    """Corpus rows near a benchmark embedding are flagged; unrelated rows
    come back with null match columns and contaminated=False."""
    df, rows = vectors
    rng = random.Random(31)
    centroids = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(3)]
    bench = spark.createDataFrame(
        [(900, [float(x) for x in rows[0][1]])],  # the near-dup family seed
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in S.semantic_contamination(
            df, bench, centroids, threshold=0.99,
            n_probe=len(centroids), round_to=None,
        ).collect()
    }
    assert len(out) == N  # one row per corpus row, none lost
    for vid in (0, 1, 2, 3):  # the planted near-dups of the benchmark seed
        assert out[vid]["contaminated"], vid
        assert out[vid]["nearest_bench_id"] == 900
    clean = [r for r in out.values() if not r["contaminated"]]
    assert len(clean) == N - 4
    # rows whose probed cells held no benchmark vector: null match, clean
    unmatched = [r for r in out.values() if r["nearest_bench_id"] is None]
    for r in unmatched:
        assert not r["contaminated"] and r["bench_cosine"] is None


def test_random_projection_preserves_distances(spark, vectors):
    import math as m

    df, rows = vectors
    out = S.random_projection(df, dim=DIM, out_dim=12, seed=23)
    got = {r["vec_id"]: list(r["rp_vec"]) for r in out.collect()}
    assert all(len(v) == 12 for v in got.values())

    # deterministic: same seed → identical values
    again = {
        r["vec_id"]: list(r["rp_vec"])
        for r in S.random_projection(df, dim=DIM, out_dim=12, seed=23).collect()
    }
    assert got == again

    def d(a, b):
        return m.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    base = {i: [float(x) for x in v] for i, v in rows}
    # median pairwise distance ratio concentrates near 1 (JL); individual
    # pairs can deviate at out_dim=12, the MEDIAN is a stable check
    ratios = []
    for i in range(0, 30, 3):
        for j in range(i + 1, 30, 7):
            orig = d(base[i], base[j])
            if orig > 1e-9:
                ratios.append(d(got[i], got[j]) / orig)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    assert 0.7 < med < 1.3, med

    # near-dup structure survives: vector 0's planted near-dups (1..3)
    # stay its nearest neighbors in the projected space
    dists = sorted(
        (d(got[0], got[i]), i) for i in range(1, N)
    )
    assert {i for _, i in dists[:3]} == {1, 2, 3}


class TestEmbeddingOutliers:
    def test_flags_planted_outlier(self, spark):
        from buildkite_logs_parquet_spark.operators.similarity import (
            embedding_outliers,
        )

        # 39 vectors near +e1, one inverted outlier
        rows = [(i, [1.0, 0.01 * (i % 5), 0.0]) for i in range(39)]
        rows.append((99, [-1.0, 0.0, 0.0]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = embedding_outliers(df, bottom_pm=50_000)  # bottom 5% of 40 = 2
        flagged = {r["vec_id"] for r in out.where("is_outlier").collect()}
        assert 99 in flagged
        assert len(flagged) == 2
        assert out.count() == 40

    def test_cutoff_counts_and_tie_break(self, spark):
        from buildkite_logs_parquet_spark.operators.similarity import (
            embedding_outliers,
        )

        # all-identical scores: the id tie-break must cap the flagged set
        rows = [(i, [1.0, 0.0]) for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = embedding_outliers(df, bottom_pm=300_000)  # bottom 30% -> 3 rows
        flagged = sorted(r["vec_id"] for r in out.where("is_outlier").collect())
        assert flagged == [0, 1, 2]

    def test_layout_independent(self, spark):
        from buildkite_logs_parquet_spark.operators.similarity import (
            embedding_outliers,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = sorted(map(tuple, embedding_outliers(emb, bottom_pm=100_000).collect()))
        b = sorted(
            map(
                tuple,
                embedding_outliers(
                    emb.repartition(7, "vec_id"), bottom_pm=100_000
                ).collect(),
            )
        )
        assert a == b
        n = len(a)
        n_flagged = sum(1 for r in a if r[2])
        assert n_flagged == n * 100_000 // 1_000_000


class TestTruncationRecall:
    def test_full_dim_recall_is_exactly_one(self, spark):
        from buildkite_logs_parquet_spark.operators.similarity import (
            truncation_recall,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        dim = len(emb.first()["embedding"])
        out = truncation_recall(
            emb, dims=[dim, dim // 2, dim // 4], k=10, n_queries=4
        )
        rows = out.collect()
        assert len(rows) == 3 * 4
        full = [r for r in rows if r["dim"] == dim]
        assert all(r["recall_pm"] == 1_000_000 for r in full)
        # truncation can only lose candidates: recall in [0, 1e6]
        assert all(0 <= r["recall_pm"] <= 1_000_000 for r in rows)
        assert all(r["recall_pm"] == r["hits"] * 1_000_000 // 10 for r in rows)

    def test_matches_numpy_brute_force(self, spark):
        import numpy as np

        from buildkite_logs_parquet_spark.operators.similarity import (
            truncation_recall,
        )

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(60, 16)).astype(float)
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        k, nq = 5, 3
        out = {
            (r["dim"], r["query_id"]): r["hits"]
            for r in truncation_recall(
                df, dims=[16, 8], k=k, n_queries=nq
            ).collect()
        }

        def topk(d, qi):
            q = vecs[qi, :d]
            sims = (vecs[:, :d] @ q) / (
                np.linalg.norm(vecs[:, :d], axis=1) * np.linalg.norm(q)
            )
            # (score desc, id asc) — numpy argsort on (-sim, id)
            order = sorted(range(60), key=lambda j: (-sims[j], j))
            return set(order[:k])

        for qi in range(nq):
            want_full = topk(16, qi)
            assert out[(16, qi)] == k
            assert out[(8, qi)] == len(topk(8, qi) & want_full)


def test_sql_lambdas_safe_for_colliding_column_names(spark, vectors):
    """Round-11 ADVICE: SQL-string lambda variables shadow same-named
    columns (backticks don't escape lambda-variable resolution), so the
    scoring helpers must use reserved names.  A frame whose vector
    column is named exactly like a former lambda variable (`c`, `p`,
    `x`, `acc`) must score identically to the canonical column name."""
    df, rows = vectors
    want = [
        (r["vec_id"], r["cosine"])
        for r in S.cosine_topk(df, rows[0][1], k=5).collect()
    ]
    for name in ("c", "p", "x", "acc"):
        renamed = df.withColumnRenamed("embedding", name)
        got = [
            (r["vec_id"], r["cosine"])
            for r in S.cosine_topk(renamed, rows[0][1], k=5, vec_col=name).collect()
        ]
        assert got == want, name
        # bucket/assignment paths built from the same SQL-string lambdas
        b_ref = {
            r["vec_id"]: r["bucket"]
            for r in S.hyperplane_buckets(df, "embedding", DIM, 4, seed=3).collect()
        }
        b_got = {
            r["vec_id"]: r["bucket"]
            for r in S.hyperplane_buckets(renamed, name, DIM, 4, seed=3).collect()
        }
        assert b_got == b_ref, name
