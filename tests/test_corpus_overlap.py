"""Corpus-level overlap matrix — exact and MinHash (operators/dedup.py)."""

from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.dedup import (
    corpus_overlap,
    corpus_overlap_minhash,
)

SF = "/root/testdata/sf0.001"


def _shingle_set(texts, k):
    out = set()
    for t in texts:
        if len(t) <= k:
            out.add(t[:k] if t else t)
        out.update(t[i : i + k] for i in range(max(len(t) - k + 1, 1)))
    return out


def _python_overlap(groups, k):
    sets = {g: _shingle_set(ts, k) for g, ts in groups.items()}
    out = {}
    names = sorted(sets)
    for i, ga in enumerate(names):
        for gb in names[i + 1 :]:
            inter = len(sets[ga] & sets[gb])
            if inter:
                a, b = len(sets[ga]), len(sets[gb])
                out[(ga, gb)] = (inter, a, b, a + b - inter)
    return out


def test_exact_overlap_matches_python_sets(spark):
    groups = {
        "A": ["the quick brown fox jumps over the lazy dog", "hello world"],
        "B": ["the quick brown fox sleeps", "hello world"],
        "C": ["completely disjoint corpus text here"],
    }
    rows = [(g, t) for g, ts in groups.items() for t in ts]
    df = spark.createDataFrame(rows, "source string, text string")
    k = 5
    got = {
        (r["group_a"], r["group_b"]): (
            r["intersection"],
            r["size_a"],
            r["size_b"],
            r["union_size"],
        )
        for r in corpus_overlap(df, "source", "text", shingle_k=k).collect()
    }
    want = _python_overlap(groups, k)
    assert got == want
    # ppm ratios are exact integer div of the same quantities
    for r in corpus_overlap(df, "source", "text", shingle_k=k).collect():
        assert r["jaccard_pm"] == r["intersection"] * 1_000_000 // r["union_size"]
        assert (
            r["containment_a_pm"] == r["intersection"] * 1_000_000 // r["size_a"]
        )
        assert (
            r["containment_b_pm"] == r["intersection"] * 1_000_000 // r["size_b"]
        )


def test_exact_overlap_identical_corpora(spark):
    rows = [("X", "same text content"), ("Y", "same text content")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = corpus_overlap(df, "source", "text", shingle_k=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("X", "Y")
    assert r["intersection"] == r["size_a"] == r["size_b"] == r["union_size"]
    assert r["jaccard_pm"] == 1_000_000
    assert r["containment_a_pm"] == r["containment_b_pm"] == 1_000_000


def test_exact_overlap_disjoint_pairs_omitted(spark):
    rows = [("A", "aaaaaaaa"), ("B", "bbbbbbbb")]
    df = spark.createDataFrame(rows, "source string, text string")
    assert corpus_overlap(df, "source", "text", shingle_k=4).count() == 0


def test_exact_overlap_on_documents_table(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = corpus_overlap(docs, "source", "text", shingle_k=12)
    rows = out.collect()
    assert rows, "synthetic sources share template shingles"
    groups = {
        g: [t["text"] for t in docs.where(F.col("source") == g).collect()]
        for g in [r["source"] for r in docs.select("source").distinct().collect()]
    }
    want = _python_overlap(groups, 12)
    got = {
        (r["group_a"], r["group_b"]): (
            r["intersection"],
            r["size_a"],
            r["size_b"],
            r["union_size"],
        )
        for r in rows
    }
    assert got == want


def test_minhash_estimate_tracks_exact_jaccard(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["group_a"], r["group_b"]): r["jaccard_pm"]
        for r in corpus_overlap(docs, "source", "text", shingle_k=12).collect()
    }
    est = {
        (r["group_a"], r["group_b"]): r["jaccard_est_pm"]
        for r in corpus_overlap_minhash(
            docs, "source", "text", num_perm=64, shingle_k=12
        ).collect()
    }
    # every true-overlap pair with jaccard over ~1.5 std errs should
    # surface; estimates within 4·sqrt(p(1-p)/64) of truth
    for pair, jpm in exact.items():
        p = jpm / 1e6
        tol = 4 * (p * (1 - p) / 64) ** 0.5 + 1.5 / 64
        got = est.get(pair, 0) / 1e6
        assert abs(got - p) <= tol, (pair, p, got, tol)


def test_minhash_estimate_layout_independent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(
        map(
            tuple,
            corpus_overlap_minhash(docs, "source", "text", num_perm=16).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            corpus_overlap_minhash(
                docs.repartition(13, "doc_id"), "source", "text", num_perm=16
            ).collect(),
        )
    )
    assert a == b
    assert all(r[4] == r[2] * 1_000_000 // 16 for r in a)


def test_no_cartesian_product_in_either_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for q in (
        corpus_overlap(docs, "source", "text"),
        corpus_overlap_minhash(docs, "source", "text", num_perm=8),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_signature_merge_equals_full_recompute(spark):
    """min is mergeable: signatures of (old ∪ new) must equal the
    element-wise min-merge of the two batches' signatures — the
    incremental-maintenance contract."""
    from buildkite_logs_parquet_spark.operators.dedup import (
        corpus_signatures,
        merge_corpus_signatures,
        signature_overlap_matrix,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.where("doc_id % 3 != 0")
    new = docs.where("doc_id % 3 = 0")
    merged = merge_corpus_signatures(
        corpus_signatures(old, "source", "text", num_perm=16),
        corpus_signatures(new, "source", "text", num_perm=16),
        "source",
    )
    full = corpus_signatures(docs, "source", "text", num_perm=16)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    # and the pair stage over the merged lake equals the one-shot
    # estimator's output
    from buildkite_logs_parquet_spark.operators.dedup import (
        corpus_overlap_minhash,
    )

    a = sorted(map(tuple, signature_overlap_matrix(merged, "source").collect()))
    b = sorted(
        map(
            tuple,
            corpus_overlap_minhash(docs, "source", "text", num_perm=16).collect(),
        )
    )
    assert a == b


def test_incremental_merge_reproduces_registered_est_leg(spark):
    """Cross-engine evidence for the incremental path (round 11): the
    min-merged half-corpus signatures, pushed through the pair stage,
    must reproduce the REGISTERED corpus_overlap key's 'est' rows over
    the driver's fixture — the same 64-perm relation the DuckDB oracle
    hashes, so incremental maintenance inherits the key's gate."""
    import __spark_entry__ as E
    from buildkite_logs_parquet_spark.operators.dedup import (
        corpus_signatures,
        merge_corpus_signatures,
        signature_overlap_matrix,
    )
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merged = merge_corpus_signatures(
        corpus_signatures(
            docs.where("doc_id % 2 = 0"), "source", "text", num_perm=64
        ),
        corpus_signatures(
            docs.where("doc_id % 2 != 0"), "source", "text", num_perm=64
        ),
        "source",
    )
    incr = sorted(
        map(tuple, signature_overlap_matrix(merged, "source").collect())
    )
    key_est = sorted(
        (r["group_a"], r["group_b"], r["a"], r["b"], r["c"])
        for r in E.q_corpus_overlap(spark, sf_dir)
        .where(F.col("side") == "est")
        .collect()
    )
    assert incr == key_est and len(incr) > 0


def test_signature_merge_passthrough_and_schema_guard(spark):
    import pytest as _pytest

    from buildkite_logs_parquet_spark.operators.dedup import (
        corpus_signatures,
        merge_corpus_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = corpus_signatures(docs, "source", "text", num_perm=8)
    only_one = corpus_signatures(
        docs.where("source = 'src1'"), "source", "text", num_perm=8
    )
    merged = merge_corpus_signatures(base, only_one, "source")
    # groups absent from the batch pass through unchanged
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, base.collect())
    )
    with _pytest.raises(ValueError, match="schemas differ"):
        merge_corpus_signatures(
            base,
            corpus_signatures(docs, "source", "text", num_perm=4),
            "source",
        )
