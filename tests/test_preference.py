"""Preference-data tier (operators/preference.py) + quality-aware
survivor selection (dedup.dedup_keep_best)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.preference import (
    bt_fit,
    bt_fit_py,
    make_preference_pairs,
    preference_pair_audit,
)


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "prompt_id long, response_id long, score double, n_chars long"
    )


class TestMakePreferencePairs:
    def test_top_vs_bottom_with_tie_breaks(self, spark):
        rows = [
            # prompt 1: clear best/worst
            (1, 10, 0.9, 100),
            (1, 11, 0.2, 50),
            (1, 12, 0.5, 70),
            # prompt 2: score tie at the top -> lower id chosen
            (2, 20, 0.8, 10),
            (2, 21, 0.8, 20),
            (2, 22, 0.1, 30),
            # prompt 3: single response -> no pair
            (3, 30, 0.7, 40),
        ]
        out = {
            r["prompt_id"]: r
            for r in make_preference_pairs(
                _scored(spark, rows), text_len_col="n_chars"
            ).collect()
        }
        assert set(out) == {1, 2}
        assert (out[1]["chosen_id"], out[1]["rejected_id"]) == (10, 11)
        assert out[1]["margin9"] == 700_000_000
        assert (out[1]["chosen_len"], out[1]["rejected_len"]) == (100, 50)
        assert (out[2]["chosen_id"], out[2]["rejected_id"]) == (20, 22)

    def test_min_margin_gate_and_self_pair_exclusion(self, spark):
        rows = [
            (1, 10, 0.50, 5), (1, 11, 0.45, 5),   # margin 0.05
            (2, 20, 0.50, 5), (2, 21, 0.50, 5),   # margin 0 (tie)
            (3, 30, 0.90, 5), (3, 31, 0.10, 5),   # margin 0.8
        ]
        df = _scored(spark, rows)
        got = {
            r["prompt_id"]
            for r in make_preference_pairs(
                df, text_len_col="n_chars", min_margin=0.1
            ).collect()
        }
        assert got == {3}
        # margin 0 pairs ARE emitted without the gate (distinct ids,
        # deterministic chosen = lower id) — but never a self-pair
        loose = {
            r["prompt_id"]: r
            for r in make_preference_pairs(df, text_len_col="n_chars").collect()
        }
        assert set(loose) == {1, 2, 3}
        assert (loose[2]["chosen_id"], loose[2]["rejected_id"]) == (20, 21)

    def test_layout_independent(self, spark):
        import random

        rng = random.Random(5)
        rows = [
            (p, p * 100 + r, round(rng.random(), 6), rng.randrange(10, 500))
            for p in range(30)
            for r in range(rng.randrange(2, 8))
        ]
        a = make_preference_pairs(
            _scored(spark, rows), text_len_col="n_chars"
        ).collect()
        b = make_preference_pairs(
            _scored(spark, rows).repartition(13, "response_id"),
            text_len_col="n_chars",
        ).collect()
        key = lambda r: r["prompt_id"]
        assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
            map(tuple, b), key=lambda t: t[0]
        )

    def test_no_sort_window_in_plan(self, spark):
        df = make_preference_pairs(
            _scored(spark, [(1, 10, 0.5, 5), (1, 11, 0.4, 6)]),
            text_len_col="n_chars",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan  # struct-extrema aggregate, not a sort


class TestAudit:
    def test_counters(self, spark):
        rows = [
            (1, 10, 0.9, 100), (1, 11, 0.1, 10),   # chosen longer
            (2, 20, 0.8, 10), (2, 21, 0.2, 100),   # rejected longer
            (3, 30, 0.5, 7), (3, 31, 0.5, 7),      # tie, zero margin
        ]
        pairs = make_preference_pairs(_scored(spark, rows), text_len_col="n_chars")
        a = preference_pair_audit(pairs).first()
        assert a["n_pairs"] == 3
        assert a["n_chosen_longer"] == 1
        assert a["n_rejected_longer"] == 1
        assert a["n_len_tied"] == 1
        assert a["n_zero_margin"] == 1
        assert a["n_distinct_chosen"] == 3
        assert int(a["sum_margin9"]) == 800_000_000 + 600_000_000


class TestBTFit:
    def _pairs_df(self, spark, pair_list):
        return spark.createDataFrame(
            pair_list, "winner_id long, loser_id long"
        )

    def test_recovers_ordering_and_matches_python_twin_exactly(self, spark):
        import random

        rng = random.Random(11)
        # ground truth: item i has strength ~ (i+1); simulate wins
        true = {0: 1.0, 1: 2.0, 2: 4.0, 3: 8.0}
        pair_list = []
        items = list(true)
        for _ in range(400):
            a, b = rng.sample(items, 2)
            pa = true[a] / (true[a] + true[b])
            w, l = (a, b) if rng.random() < pa else (b, a)
            pair_list.append((w, l))
        got = bt_fit(self._pairs_df(spark, pair_list), n_iter=25)
        ref = bt_fit_py(pair_list, n_iter=25)
        assert got == ref  # EXACT — decimal-summed terms, fixed-order norm
        # strength ordering recovered
        order = sorted(got, key=got.get)
        assert order == [0, 1, 2, 3]

    def test_layout_independent(self, spark):
        pair_list = [(1, 2), (2, 3), (1, 3), (3, 1), (1, 2), (2, 1)]
        a = bt_fit(self._pairs_df(spark, pair_list), n_iter=10)
        b = bt_fit(
            self._pairs_df(spark, pair_list).repartition(7), n_iter=10
        )
        assert a == b

    def test_never_loses_and_never_wins_stay_finite(self, spark):
        pair_list = [(1, 2), (1, 2), (1, 3), (3, 2)]
        got = bt_fit(self._pairs_df(spark, pair_list), n_iter=15)
        assert all(v > 0 for v in got.values())
        assert got[1] > got[3] > got[2]

    def test_empty(self, spark):
        assert bt_fit(self._pairs_df(spark, []), n_iter=3) == {}

    def test_driver_counts_path_equals_distributed_path(self, spark, monkeypatch):
        """The round-12 in-driver contingency loop must be bit-identical
        to the distributed per-round aggregates (decimal t*c == c
        additions of t); force the fallback by shrinking the bound."""
        import random

        from buildkite_logs_parquet_spark.operators import preference as P

        rng = random.Random(7)
        pair_list = [
            (rng.randrange(6), rng.randrange(6)) for _ in range(300)
        ]
        pair_list = [(w, l) for w, l in pair_list if w != l]
        df = self._pairs_df(spark, pair_list)
        fast = bt_fit(df, n_iter=12)
        monkeypatch.setattr(P, "_BT_MAX_DRIVER_COMBOS", 0)
        slow = bt_fit(df, n_iter=12)
        assert fast == slow  # EXACT float equality
        assert fast == bt_fit_py(pair_list, n_iter=12)


class TestDedupKeepBest:
    def test_best_survives_min_id_breaks_ties(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            dedup_keep_best,
        )

        docs = spark.createDataFrame(
            [
                (1, 0.2), (2, 0.9), (3, 0.9),   # cluster A: tie 2 vs 3
                (4, 0.1),                        # cluster B singleton map
                (5, 0.7),                        # unclustered -> singleton
            ],
            "doc_id long, quality double",
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, cluster long"
        )
        out = {
            r["doc_id"]: r
            for r in dedup_keep_best(docs, clusters).collect()
        }
        assert len(out) == 5
        kept = sorted(k for k, r in out.items() if r["is_canonical"])
        assert kept == [2, 4, 5]  # 2 beats 3 on the id tie-break
        assert out[1]["cluster"] == 1 and not out[1]["is_canonical"]

    def test_one_survivor_per_cluster_always(self, spark):
        import random

        from buildkite_logs_parquet_spark.operators.dedup import (
            dedup_keep_best,
        )

        rng = random.Random(3)
        docs = spark.createDataFrame(
            [(i, round(rng.random(), 3)) for i in range(200)],
            "doc_id long, quality double",
        )
        clusters = spark.createDataFrame(
            [(i, i % 17) for i in range(150)], "doc_id long, cluster long"
        )
        out = dedup_keep_best(docs, clusters)
        per = (
            out.groupBy("cluster")
            .agg(F.sum(F.col("is_canonical").cast("long")).alias("k"))
            .collect()
        )
        assert all(r["k"] == 1 for r in per)
        assert out.count() == 200

    def test_no_sort_window_in_plan(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            dedup_keep_best,
        )

        docs = spark.createDataFrame([(1, 0.5)], "doc_id long, quality double")
        clusters = spark.createDataFrame([(1, 1)], "doc_id long, cluster long")
        plan = (
            dedup_keep_best(docs, clusters)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan


class TestAttachPairTexts:
    def test_dpo_records(self, spark):
        from buildkite_logs_parquet_spark.operators.preference import (
            attach_pair_texts,
        )

        rows = [
            (1, 10, 0.9, 3), (1, 11, 0.1, 3),
            (2, 20, 0.8, 3), (2, 21, 0.3, 3),
        ]
        pool = spark.createDataFrame(
            [(rid, f"resp-{rid}") for _, rid, _, _ in rows],
            "response_id long, text string",
        )
        pairs = make_preference_pairs(_scored(spark, rows), text_len_col="n_chars")
        out = {
            r["prompt_id"]: r
            for r in attach_pair_texts(pairs, pool).collect()
        }
        assert out[1]["chosen_text"] == "resp-10"
        assert out[1]["rejected_text"] == "resp-11"
        assert out[2]["chosen_text"] == "resp-20"
        assert len(out) == 2


class TestReviewHardening:
    """Round-6 second-review regressions: NULL handling, duplicate
    scorings, cluster-label namespace collisions."""

    def test_null_score_costs_the_response_not_the_prompt(self, spark):
        rows = [
            (1, 10, 0.9, 5), (1, 11, 0.8, 5), (1, 12, None, 5),
        ]
        df = spark.createDataFrame(
            rows, "prompt_id long, response_id long, score double, n_chars long"
        )
        out = make_preference_pairs(df, text_len_col="n_chars").collect()
        assert len(out) == 1
        assert (out[0]["chosen_id"], out[0]["rejected_id"]) == (10, 11)

    def test_duplicate_scorings_collapse_per_response(self, spark):
        # response 10 scored twice spanning BOTH extremes: must pair
        # 10 (best 0.9) against 11, not silently drop the prompt
        rows = [(1, 10, 0.9, 5), (1, 10, 0.1, 5), (1, 11, 0.5, 5)]
        df = spark.createDataFrame(
            rows, "prompt_id long, response_id long, score double, n_chars long"
        )
        out = make_preference_pairs(df, text_len_col="n_chars").collect()
        assert len(out) == 1
        assert (out[0]["chosen_id"], out[0]["rejected_id"]) == (10, 11)
        assert out[0]["margin9"] == 400_000_000

    def test_audit_zero_not_null_on_empty_and_lenless(self, spark):
        empty = make_preference_pairs(
            _scored(spark, [(1, 10, 0.5, 5)]), text_len_col="n_chars"
        )
        a = preference_pair_audit(empty).first()
        assert a["n_pairs"] == 0
        for c in ("n_chosen_longer", "n_rejected_longer", "n_len_tied",
                  "n_zero_margin"):
            assert a[c] == 0, c
        assert int(a["sum_margin9"]) == 0
        # pairs built WITHOUT lengths: length counters are 0, not NULL
        nolen = make_preference_pairs(
            _scored(spark, [(1, 10, 0.9, 5), (1, 11, 0.1, 5)])
        )
        b = preference_pair_audit(nolen).first()
        assert b["n_pairs"] == 1
        assert (b["n_chosen_longer"], b["n_len_tied"]) == (0, 0)

    def test_no_distinct_aggregate_phase_in_plan(self, spark):
        df = make_preference_pairs(
            _scored(spark, [(1, 10, 0.5, 5), (1, 11, 0.4, 6)]),
            text_len_col="n_chars",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan  # count_distinct would add one

    def test_keep_best_cluster_label_namespace_collision(self, spark):
        # cluster LABEL 7 is not a doc id; doc 7 is unclustered.  A
        # coalesce(cluster, id) fallback would pull doc 7 into cluster 7
        # and let it steal the canonical slot from doc 1.
        from buildkite_logs_parquet_spark.operators.dedup import (
            dedup_keep_best,
        )

        docs = spark.createDataFrame(
            [(7, 0.99), (1, 0.9), (2, 0.5)], "doc_id long, quality double"
        )
        clusters = spark.createDataFrame(
            [(1, 7), (2, 7)], "doc_id long, cluster long"
        )
        out = {r["doc_id"]: r for r in dedup_keep_best(docs, clusters).collect()}
        assert out[7]["is_canonical"] and out[7]["cluster"] == 7  # singleton
        assert out[1]["is_canonical"]  # true best of cluster {1, 2}
        assert not out[2]["is_canonical"]

    def test_keep_best_all_null_quality_keeps_min_id(self, spark):
        from buildkite_logs_parquet_spark.operators.dedup import (
            dedup_keep_best,
        )

        docs = spark.createDataFrame(
            [(1, None), (2, None), (3, 0.4)], "doc_id long, quality double"
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster long"
        )
        out = {r["doc_id"]: r for r in dedup_keep_best(docs, clusters).collect()}
        # scored member beats NULL members; all-NULL falls back to min id
        assert [k for k, r in sorted(out.items()) if r["is_canonical"]] == [3]
        docs2 = spark.createDataFrame(
            [(5, None), (4, None)], "doc_id long, quality double"
        )
        clusters2 = spark.createDataFrame(
            [(4, 1), (5, 1)], "doc_id long, cluster long"
        )
        out2 = {r["doc_id"]: r for r in dedup_keep_best(docs2, clusters2).collect()}
        assert [k for k, r in sorted(out2.items()) if r["is_canonical"]] == [4]


class TestGroupAdvantages:
    """group_advantages: GRPO group-relative normalization + best-of-n."""

    def _pool(self, spark):
        rows = [
            # hard prompt: low absolute rewards, clear internal order
            (1, "p_hard", 0.10), (2, "p_hard", 0.30), (3, "p_hard", 0.20),
            # easy prompt: the SAME reward shape shifted+scaled into the
            # high-absolute regime (affine image of p_hard: 0.8 + 0.5*r)
            (4, "p_easy", 0.85), (5, "p_easy", 0.95), (6, "p_easy", 0.90),
            # singleton: no relative signal
            (7, "p_lone", 0.99),
            # tie group: rank breaks on id
            (8, "p_tie", 0.50), (9, "p_tie", 0.50),
        ]
        return spark.createDataFrame(
            rows, "resp_id long, prompt string, reward double"
        )

    def test_matches_numpy_twin_and_scale_invariance(self, spark):
        import numpy as np

        from buildkite_logs_parquet_spark.operators.preference import (
            group_advantages,
        )

        out = {
            r["resp_id"]: r
            for r in group_advantages(
                self._pool(spark), "prompt", "reward", "resp_id"
            ).collect()
        }
        for group in (["p_hard", [1, 2, 3], [0.10, 0.30, 0.20]],
                      ["p_easy", [4, 5, 6], [0.85, 0.95, 0.90]]):
            _, ids, rs = group
            rs = np.array(rs)
            want = (rs - rs.mean()) / (rs.std() + 1e-6)
            for i, w in zip(ids, want):
                assert out[i]["advantage"] == pytest.approx(w, abs=1e-9)
        # the standardization is shift/scale INVARIANT: p_easy is the
        # affine image 0.8 + 0.5·p_hard, so each member's advantage
        # equals its counterpart's — a hard prompt's winner carries the
        # same gradient scale as an easy prompt's (the GRPO point; the
        # eps in the denominator perturbs below 1e-4 here)
        assert out[2]["advantage"] == pytest.approx(
            out[5]["advantage"], abs=1e-4
        )
        assert out[2]["selected"] and out[5]["selected"]
        assert not out[1]["selected"] and not out[4]["selected"]

    def test_singleton_and_ties(self, spark):
        from buildkite_logs_parquet_spark.operators.preference import (
            group_advantages,
        )

        out = {
            r["resp_id"]: r
            for r in group_advantages(
                self._pool(spark), "prompt", "reward", "resp_id"
            ).collect()
        }
        # singleton: NULL advantage, never selected, group visible
        assert out[7]["advantage"] is None
        assert not out[7]["selected"]
        assert out[7]["n_group"] == 1
        # exact tie: both advantages 0, rank/selection break on min id
        assert out[8]["advantage"] == 0.0 and out[9]["advantage"] == 0.0
        assert out[8]["selected"] and not out[9]["selected"]

    def test_top_n_and_validation(self, spark):
        from buildkite_logs_parquet_spark.operators.preference import (
            group_advantages,
        )

        out = group_advantages(
            self._pool(spark), "prompt", "reward", "resp_id", top_n=2
        )
        sel = {
            r["resp_id"]
            for r in out.where("selected").collect()
        }
        assert sel == {2, 3, 5, 6, 8, 9}
        with pytest.raises(ValueError):
            group_advantages(
                self._pool(spark), "prompt", "reward", "resp_id", top_n=0
            )
        with pytest.raises(ValueError):
            group_advantages(
                self._pool(spark), "prompt", "reward", "resp_id",
                min_group=1,
            )
