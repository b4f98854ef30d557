"""int8 scalar quantization and PQ/IVF-PQ tests: numpy ground truth,
recall vs the exact scan, and plan-shape assertions (zero-shuffle
encode, TakeOrderedAndProject search)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import quantization as Q
from buildkite_logs_parquet_spark.operators import similarity as S

DIM = 32
N = 120
M_SUB = 4
K_CODES = 8


@pytest.fixture(scope="module")
def vectors(spark):
    # clustered, like real embeddings: 8 centers + small noise.  Pure
    # random gaussians are PQ's pathological case (nothing for the
    # codebooks to learn); recall claims here are about structured data.
    rng = random.Random(3)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(8)]
    rows = []
    for i in range(N):
        c = centers[i % 8]
        v = [x + rng.gauss(0, 0.2) for x in c]
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), rows


def _exact_top(rows, q, k):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    return [
        i
        for i, _ in sorted(
            ((i, cos(v, q)) for i, v in rows), key=lambda t: (-t[1], t[0])
        )[:k]
    ]


# --------------------------------------------------------------- int8 SQ


def test_sq_max_abs_matches_python(spark, vectors):
    df, rows = vectors
    want = max(abs(x) for _, v in rows for x in v)
    got = Q.sq_max_abs(df)
    assert got == pytest.approx(want, abs=1e-6)


def test_sq_encode_matches_python_formula(spark, vectors):
    df, rows = vectors
    ma = Q.sq_max_abs(df)
    got = {
        r["vec_id"]: list(r["qvec"])
        for r in Q.sq_encode(df, ma).select("vec_id", "qvec").collect()
    }
    for i, v in rows:
        # float32 storage: quantize the float32-rounded values
        v32 = [float(np.float32(x)) for x in v]
        assert got[i] == Q.sq_quantize_vec(v32, ma), i


def test_sq_int_dot_is_exact(spark, vectors):
    df, rows = vectors
    ma = Q.sq_max_abs(df)
    enc = Q.sq_encode(df, ma)
    q = [float(x) for x in rows[0][1]]
    got = Q.sq_topk(enc, q, ma, k=5).collect()
    qq = np.asarray(Q.sq_quantize_vec(q, ma), dtype=np.int64)
    codes = {
        r["vec_id"]: np.asarray(list(r["qvec"]), dtype=np.int64)
        for r in enc.select("vec_id", "qvec").collect()
    }
    want = sorted(
        ((i, int(codes[i] @ qq)) for i in codes), key=lambda t: (-t[1], t[0])
    )[:5]
    assert [(r["vec_id"], r["int_dot"]) for r in got] == want


def test_sq_topk_recall_vs_exact(spark, vectors):
    df, rows = vectors
    ma = Q.sq_max_abs(df)
    enc = Q.sq_encode(df, ma).cache()
    hits = 0
    for qid in (0, 7, 33):
        q = [float(x) for x in rows[qid][1]]
        approx = {
            r["vec_id"] for r in Q.sq_topk(enc, q, ma, k=10).collect()
        }
        # sq_topk ranks by DOT product — compare against exact-by-dot
        exact = {
            i
            for i, _ in sorted(
                (
                    (i, sum(x * y for x, y in zip(v, q)))
                    for i, v in rows
                ),
                key=lambda t: (-t[1], t[0]),
            )[:10]
        }
        hits += len(approx & exact)
    # int8 is near-lossless on the dot-product ranking; clustered data
    # has near-ties among same-cluster members, so allow a couple of
    # boundary swaps
    assert hits >= 26


# ------------------------------------------------------------------- PQ


def test_pq_encode_matches_numpy_argmin(spark, vectors):
    df, rows = vectors
    books = Q.seeded_codebooks(m=M_SUB, k=K_CODES, d_sub=DIM // M_SUB, seed=5)
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in Q.pq_encode(df, books).select("vec_id", "pq_code").collect()
    }
    cb = np.asarray(books)  # (m, k, d_sub)
    for i, v in rows:
        x = np.asarray([float(np.float32(t)) for t in v]).reshape(M_SUB, -1)
        d2 = ((cb - x[:, None, :]) ** 2).sum(axis=2)  # (m, k)
        assert got[i] == list(d2.argmin(axis=1)), i


def test_pq_adc_topk_matches_numpy(spark, vectors):
    df, rows = vectors
    books = Q.seeded_codebooks(m=M_SUB, k=K_CODES, d_sub=DIM // M_SUB, seed=5)
    enc = Q.pq_encode(df, books)
    q = [float(x) for x in rows[2][1]]
    got = Q.pq_adc_topk(enc, q, books, k=8).collect()
    cb = np.asarray(books)
    lut = np.asarray(Q.adc_lut(q, books))  # (m, k)
    codes = {
        r["vec_id"]: list(r["pq_code"])
        for r in enc.select("vec_id", "pq_code").collect()
    }
    want = sorted(
        (
            (i, round(float(sum(lut[s][c] for s, c in enumerate(cs))), 6))
            for i, cs in codes.items()
        ),
        key=lambda t: (t[1], t[0]),
    )[:8]
    assert [(r["vec_id"], r["adc_dist"]) for r in got] == [
        (i, pytest.approx(d, abs=1e-9)) for i, d in want
    ]


def test_pq_adc_dist_nulls_on_malformed_codes(spark):
    """The zip_with-era contract (round-10 ADVICE): any code array whose
    length differs from m — NULL, too short, or too LONG — yields a NULL
    distance; only an exactly-m array scores.  Trailing codes must never
    be silently ignored."""
    lut = [[1.0, 2.0], [10.0, 20.0]]  # m=2, k=2
    df = spark.createDataFrame(
        [
            (0, [0, 1]),  # exact m -> 1.0 + 20.0
            (1, [0]),  # too short -> NULL
            (2, [0, 1, 0]),  # too long -> NULL (not 21.0)
            (3, None),  # NULL codes -> NULL
        ],
        "vec_id long, pq_code array<int>",
    )
    got = {
        r["vec_id"]: r["d"]
        for r in df.select(
            "vec_id", Q.pq_adc_dist(F.col("pq_code"), lut).alias("d")
        ).collect()
    }
    assert got == {0: 21.0, 1: None, 2: None, 3: None}


def test_pq_train_improves_recall_over_seeded(spark, vectors):
    df, rows = vectors

    def recall(books):
        enc = Q.pq_encode(df, books)
        hits = 0
        for qid in (0, 11, 42, 77):
            q = [float(x) for x in rows[qid][1]]
            approx = [
                r["vec_id"]
                for r in Q.pq_adc_topk(enc, q, books, k=10).collect()
            ]
            hits += len(set(approx) & set(_exact_top(rows, q, 10)))
        return hits

    seeded = Q.seeded_codebooks(
        m=M_SUB, k=K_CODES, d_sub=DIM // M_SUB, seed=5
    )
    trained = Q.pq_train(df, m=M_SUB, k=K_CODES, sample_rows=N, seed=5)
    r_seeded, r_trained = recall(seeded), recall(trained)
    assert r_trained >= r_seeded
    assert r_trained >= 20  # ≥50% avg recall@10 with 4x8-code books


def test_pq_train_is_deterministic(spark, vectors):
    df, _ = vectors
    a = Q.pq_train(df, m=M_SUB, k=K_CODES, sample_rows=64, seed=9)
    b = Q.pq_train(df, m=M_SUB, k=K_CODES, sample_rows=64, seed=9)
    assert a == b


# --------------------------------------------------------------- IVF-PQ


def test_ivf_pq_topk_recall(spark, vectors):
    df, rows = vectors
    rng = random.Random(17)
    coarse = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    books = Q.pq_train(df, m=M_SUB, k=K_CODES, sample_rows=N, seed=5)
    enc = Q.ivf_pq_encode(df, coarse, books).cache()
    # encode keeps every row and every cell id is valid
    cells = [r["ivf_cell"] for r in enc.select("ivf_cell").collect()]
    assert len(cells) == N and all(0 <= c < 4 for c in cells)
    hits = probed = 0
    for qid in (0, 11, 42):
        q = [float(x) for x in rows[qid][1]]
        got = Q.ivf_pq_topk(enc, coarse, books, q, k=10, n_probe=2).collect()
        ids = [r["vec_id"] for r in got]
        assert len(ids) == len(set(ids)) == 10
        # every returned row must come from a probed cell
        pc = set(S.probe_cells(coarse, q, 2))
        cell_of = {
            r["vec_id"]: r["ivf_cell"]
            for r in enc.select("vec_id", "ivf_cell").collect()
        }
        assert all(cell_of[i] in pc for i in ids)
        exact_in_probe = [
            i for i in _exact_top(rows, q, 10) if cell_of[i] in pc
        ]
        probed += len(exact_in_probe)
        hits += len(set(ids) & set(exact_in_probe))
    # within the probed cells, PQ should recover most of the exact top-k
    assert probed > 0 and hits >= probed * 0.6


# ----------------------------------------------------------------- plans


def test_pq_encode_plan_has_no_exchange(spark, vectors):
    df, _ = vectors
    books = Q.seeded_codebooks(m=M_SUB, k=K_CODES, d_sub=DIM // M_SUB, seed=5)
    plan = Q.pq_encode(df, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_topk_plan_is_take_ordered(spark, vectors):
    df, rows = vectors
    books = Q.seeded_codebooks(m=M_SUB, k=K_CODES, d_sub=DIM // M_SUB, seed=5)
    enc = Q.pq_encode(df, books)
    q = [float(x) for x in rows[0][1]]
    plan = (
        Q.pq_adc_topk(enc, q, books, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort stage


def test_pq_scan_prunes_to_code_column(spark, tmp_path, vectors):
    """On a real parquet lake the ADC scan must read ONLY (id, code):
    the raw embedding column stays on disk — the 32x memory win."""
    df, rows = vectors
    books = Q.seeded_codebooks(m=M_SUB, k=K_CODES, d_sub=DIM // M_SUB, seed=5)
    path = str(tmp_path / "pq_lake")
    Q.pq_encode(df, books).write.parquet(path)
    lake = spark.read.parquet(path)
    q = [float(x) for x in rows[0][1]]
    plan = (
        Q.pq_adc_topk(lake, q, books, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "embedding" not in plan.split("ReadSchema")[1][:200]


def test_ivfpq_lake_prunes_partitions_and_matches_in_memory(spark, tmp_path, vectors):
    df, rows = vectors
    rng = random.Random(29)
    coarse = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(4)]
    books = Q.seeded_codebooks(m=M_SUB, k=K_CODES, d_sub=DIM // M_SUB, seed=5)
    path = str(tmp_path / "ivfpq_lake")
    Q.write_ivfpq_lake(df, coarse, books, path, id_col="vec_id")

    q = [float(x) for x in rows[4][1]]
    at_rest = Q.ivf_pq_topk_at_rest(spark, path, coarse, books, q, k=8, n_probe=2)
    in_mem = Q.ivf_pq_topk(
        Q.ivf_pq_encode(df, coarse, books), coarse, books, q, k=8, n_probe=2
    )
    assert [(r["vec_id"], r["adc_dist"]) for r in at_rest.collect()] == [
        (r["vec_id"], r["adc_dist"]) for r in in_mem.collect()
    ]

    # probe = partition pruning: the scan carries PartitionFilters on
    # ivf_cell and reads only the code column
    plan = at_rest._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split(
        "PartitionFilters"
    )[1][:120]
    assert "embedding" not in plan.split("ReadSchema")[1][:200]


# ---------------------------------------------------------- 1-bit binary


def test_bq_encode_matches_python_packing(spark, vectors):
    df, rows = vectors
    got = {
        r["vec_id"]: list(r["bq_bits"])
        for r in Q.bq_encode(df).select("vec_id", "bq_bits").collect()
    }
    for i, v in rows:
        v32 = [float(np.float32(x)) for x in v]
        assert got[i] == Q.bq_quantize_vec(v32), i
        assert len(got[i]) == -(-DIM // 63)


def test_bq_encode_exact_beyond_53_bits(spark):
    # doubles are integer-exact only to 2^53 — a double-space fold packs
    # bits {0, 53} as 2^53 instead of 2^53+1.  96 dims force word 0 to
    # span all 63 positions and word 1 another 33; the long-space fold
    # must bit-match the driver-side packer on every pattern, including
    # the adversarial {0,53}, all-63-set, and random sign patterns.
    import random

    rng = random.Random(47)
    dim = 96
    rows = []
    # bit {0, 53} adversarial pattern
    v = [-1.0] * dim
    v[0] = 1.0
    v[53] = 1.0
    rows.append((0, v))
    # all-positive (word 0 = 2^63 - 1, the max 63-bit value)
    rows.append((1, [1.0] * dim))
    # alternating + random
    rows.append((2, [1.0 if i % 2 == 0 else -1.0 for i in range(dim)]))
    for i in range(3, 20):
        rows.append((i, [rng.choice([-1.0, 1.0]) for _ in range(dim)]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: list(r["bq_bits"])
        for r in Q.bq_encode(df).select("vec_id", "bq_bits").collect()
    }
    for i, v in rows:
        assert got[i] == Q.bq_quantize_vec(v), i
    assert got[0][0] == (1 << 53) | 1
    assert got[1][0] == (1 << 63) - 1


def test_bq_hamming_topk_exact_and_useful(spark, vectors):
    df, rows = vectors
    enc = Q.bq_encode(df).cache()
    q = [float(x) for x in rows[0][1]]
    got = Q.bq_hamming_topk(enc, q, k=20).collect()

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    qb = Q.bq_quantize_vec(q)
    codes = {
        r["vec_id"]: list(r["bq_bits"])
        for r in enc.select("vec_id", "bq_bits").collect()
    }
    want = sorted(
        ((i, ham(codes[i], qb)) for i in codes), key=lambda t: (t[1], t[0])
    )[:20]
    assert [(r["vec_id"], r["hamming"]) for r in got] == want
    # candidate quality: the exact top-3 of query 0's cluster appear in
    # the 20 binary candidates (rerank recipe viability)
    exact3 = set(_exact_top(rows, q, 3))
    assert exact3 <= {r["vec_id"] for r in got}


def test_bq_rerank_recovers_exact_topk(spark, vectors):
    df, rows = vectors
    enc = Q.bq_encode(df)
    q = [float(x) for x in rows[7][1]]
    got = [
        r["vec_id"]
        for r in Q.bq_rerank_topk(enc, q, k=5, prefilter_k=40).collect()
    ]
    # generous prefilter on clustered data: the rerank recovers the
    # exact top-5 (cosine ties broken by id in both)
    assert got == _exact_top(rows, q, 5)


def test_pq_train_distributed_converges_and_improves(spark, vectors):
    df, rows = vectors
    seeded = Q.seeded_codebooks(
        m=M_SUB, k=K_CODES, d_sub=DIM // M_SUB, seed=5
    )
    books, hist = Q.pq_train_distributed(
        df, m=M_SUB, k=K_CODES, init_codebooks=seeded, max_iter=6, tol=1e-9
    )
    assert len(hist) >= 2
    # drift decreases overall (Lloyd monotonicity up to empty-cell jumps)
    assert hist[-1]["max_drift"] < hist[0]["max_drift"]

    def quant_error(bks):
        import numpy as np

        cb = np.asarray(bks)
        tot = 0.0
        for _, v in rows:
            x = np.asarray(
                [float(np.float32(t)) for t in v]
            ).reshape(M_SUB, -1)
            d2 = ((cb - x[:, None, :]) ** 2).sum(axis=2)
            tot += float(d2.min(axis=1).sum())
        return tot

    assert quant_error(books) < quant_error(seeded)

    # deterministic under repartition (decimal sums, literal re-entry)
    books2, _ = Q.pq_train_distributed(
        df.repartition(7), m=M_SUB, k=K_CODES,
        init_codebooks=seeded, max_iter=6, tol=1e-9,
    )
    assert books == books2


class TestPCA:
    def _emb(self, spark):
        # anisotropic cloud: variance concentrated on two planted axes
        import random

        rng = random.Random(5)
        rows = []
        for i in range(300):
            a, b = rng.gauss(0, 10), rng.gauss(0, 3)
            v = [0.0] * 8
            v[0] = a
            v[1] = 0.5 * a + b
            for j in range(2, 8):
                v[j] = rng.gauss(0, 0.05)
            rows.append((i, v))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_matches_numpy_eigendecomposition(self, spark):
        import numpy as np

        from buildkite_logs_parquet_spark.operators.quantization import (
            pca_fit,
        )

        df = self._emb(spark)
        m = pca_fit(df, "embedding", k=3)
        X = np.array([r["embedding"] for r in df.collect()])
        cov = np.cov(X, rowvar=False, bias=False)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1]
        for j in range(3):
            ref = v[:, order[j]]
            mref = max(range(len(ref)), key=lambda i: abs(ref[i]))
            if ref[mref] < 0:
                ref = -ref
            got = np.array(m["components"][j])
            assert np.allclose(got, ref, atol=1e-6), j
        assert m["variance"][0] > m["variance"][1] > m["variance"][2]

    def test_project_matches_manual_dot_and_feeds_sq(self, spark):
        import numpy as np

        from buildkite_logs_parquet_spark.operators.quantization import (
            pca_fit,
            pca_project,
            sq_max_abs,
            sq_encode,
        )

        df = self._emb(spark)
        m = pca_fit(df, "embedding", k=2)
        out = pca_project(df, m, "embedding", out_col="pca")
        rows = out.orderBy("vec_id").collect()
        comps = np.array(m["components"])
        for r in rows[:20]:
            want = comps @ np.array(r["embedding"])
            assert np.allclose(np.array(r["pca"]), want, atol=1e-9)
        # reduced vectors flow into the int8 quantizer unchanged
        ma = sq_max_abs(out, "pca")
        enc = sq_encode(out, ma, vec_col="pca")
        assert enc.select(F.size("qvec")).first()[0] == 2

    def test_validation(self, spark):
        import pytest as _pytest

        from buildkite_logs_parquet_spark.operators.quantization import (
            pca_fit,
        )

        df = self._emb(spark)
        with _pytest.raises(ValueError):
            pca_fit(df, "embedding", k=0)
        with _pytest.raises(ValueError):
            pca_fit(df, "embedding", k=9)
