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


class TestCalibration:
    def _report(self, spark, rows, n_bins=10):
        from buildkite_logs_parquet_spark.operators.classifier import (
            calibration_report,
        )

        df = spark.createDataFrame(rows, "doc_id long, score double, label int")
        return calibration_report(df, "score", "label", n_bins=n_bins)

    def test_bins_and_integer_state(self, spark):
        rows = [
            (1, 0.05, 0), (2, 0.05, 1),   # bin 0
            (3, 0.55, 1), (4, 0.549999, 0),  # bin 5
            (5, 1.0, 1),  # p=1.0 clamps into the last bin
        ]
        got = {r["bin"]: r for r in self._report(spark, rows).collect()}
        assert set(got) == {0, 5, 9}
        assert (got[0]["n"], got[0]["n_pos"], got[0]["sum_p6"]) == (2, 1, 100000)
        assert (got[5]["n"], got[5]["n_pos"], got[5]["sum_p6"]) == (
            2, 1, 1099999,
        )
        assert got[9]["sum_p6"] == 1000000
        assert got[0]["accuracy"] == 0.5
        assert got[0]["mean_conf"] == 0.05

    def test_ece_exact_and_perfectly_calibrated_zero(self, spark):
        from buildkite_logs_parquet_spark.operators.classifier import (
            expected_calibration_error,
        )

        # bin conf exactly matches bin accuracy -> ECE 0
        rows = []
        i = 0
        for conf, acc_num, acc_den in ((0.25, 1, 4), (0.75, 3, 4)):
            for j in range(acc_den):
                rows.append((i, conf, 1 if j < acc_num else 0))
                i += 1
        rep = self._report(spark, rows)
        out = expected_calibration_error(rep).collect()[0]
        assert out["ece"] == "0.000000000"
        # and a known nonzero case: all prob .5, all label 1 -> ECE .5
        rep2 = self._report(spark, [(9, 0.5, 1), (10, 0.5, 1)])
        out2 = expected_calibration_error(rep2).collect()[0]
        assert out2["ece"] == "0.500000000"
        assert out2["num"] == 1000000 and out2["n_total"] == 2

    def test_report_is_one_aggregate(self, spark):
        rep = self._report(spark, [(1, 0.3, 1), (2, 0.9, 0)])
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1  # one bin-keyed shuffle
