"""Hashed-feature logistic regression: learnability, exact determinism,
plan shape, and the zero-model step semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import classifier as C


def _toy_corpus(spark, n=200):
    import random

    rnd = random.Random(3)
    filler = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = []
    for i in range(n):
        y = i % 2
        words = [rnd.choice(filler) for _ in range(10)]
        words += ["good", "great"] if y else ["bad", "awful"]
        rnd.shuffle(words)
        rows.append((i, " ".join(words), y))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_hashed_features_shape_and_portable_hash(spark):
    """Feature ids stay in [0, dim) and match the md5 idiom DuckDB
    replays (same construction the dedup oracles use)."""
    import duckdb

    docs = spark.createDataFrame(
        [(1, "Alpha beta  beta")], "doc_id long, text string"
    )
    rows = {
        r["feat"]: r["cnt"]
        for r in C.hashed_features(docs, dim=64, seed=0).collect()
    }
    assert sum(rows.values()) == 3
    for tok, cnt in (("alpha", 1), ("beta", 2)):
        (feat,) = duckdb.sql(
            "SELECT CAST(concat('0x', substr(md5(concat('0:', ?)), 1, 15)) "
            "AS BIGINT) % 64",
            params=[tok],
        ).fetchone()
        assert rows[feat] == cnt


def test_lr_learns_separable_corpus(spark):
    docs = _toy_corpus(spark)
    feats = C.hashed_features(docs, dim=256)
    labels = docs.select("doc_id", "label")
    w = C.lr_train(feats, labels, spark, epochs=8, lr=1.0)
    scored = C.lr_score(feats, w).join(labels, "doc_id")
    acc = scored.select(
        F.avg(
            ((F.col("score") > 0.5).cast("int") == F.col("label")).cast("int")
        )
    ).first()[0]
    assert acc == 1.0


def test_lr_training_is_bit_deterministic(spark):
    """The decimal-grid discipline makes the whole trajectory exact:
    retraining yields IDENTICAL weights, not just close ones."""
    docs = _toy_corpus(spark, n=80)
    feats = C.hashed_features(docs, dim=128)
    labels = docs.select("doc_id", "label")
    w1 = C.lr_train(feats, labels, spark, epochs=4, lr=0.7)
    w2 = C.lr_train(
        feats.repartition(7), labels, spark, epochs=4, lr=0.7
    )
    diffs = (
        w1.join(w2.withColumnRenamed("w", "w2"), "feat", "full")
        .where("w IS DISTINCT FROM w2")
        .count()
    )
    assert diffs == 0


def test_first_step_from_zero_model_is_half_residual(spark):
    """Zero model → margin 0 → p = 0.5 exactly: the first step's weight
    for a feature is -lr * Σ(0.5 - y)·cnt / n, hand-checkable."""
    docs = spark.createDataFrame(
        [(1, "tok tok", 1), (2, "tok", 0)],
        "doc_id long, text string, label int",
    )
    feats = C.hashed_features(docs, dim=8)
    labels = docs.select("doc_id", "label")
    w0 = spark.createDataFrame([], "feat long, w double")
    w1 = C.lr_step(feats, labels, w0, n_docs=2, lr=1.0).collect()
    # grad = (0.5-1)*2 + (0.5-0)*1 = -0.5; w = 0 - 1.0*(-0.5)/2 = 0.25
    assert len(w1) == 1 and w1[0]["w"] == pytest.approx(0.25, abs=1e-12)


def test_lr_step_broadcasts_model_and_stays_join_safe(spark):
    """The model side of the margin join must broadcast (≤ dim rows),
    and no step may degenerate to a cartesian/BNLJ."""
    docs = _toy_corpus(spark, n=40)
    feats = C.hashed_features(docs, dim=64)
    labels = docs.select("doc_id", "label")
    w = spark.createDataFrame([(1, 0.5)], "feat long, w double")
    plan = C.lr_step(feats, labels, w, n_docs=40)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lr_score_bounds_and_empty_model(spark):
    docs = _toy_corpus(spark, n=20)
    feats = C.hashed_features(docs, dim=64)
    empty = spark.createDataFrame([], "feat long, w double")
    rows = C.lr_score(feats, empty).collect()
    assert len(rows) == 20
    assert all(r["score"] == 0.5 for r in rows)  # zero model: σ(0)
