"""Bitext mining tests: URL key stripping, pair candidate semantics
(orientation, ratio gate, hot-key cap), positional segment alignment."""

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import bitext as B


@pytest.fixture()
def corpus(spark):
    rows = [
        # translated trio sharing a page
        (1, "https://www.shop.com/en/product/42", "en", 100, "hello\n\nworld"),
        (2, "https://www.shop.com/de/product/42", "de", 110, "hallo\n\nwelt"),
        (3, "https://www.shop.com/fr/product/42", "fr", 130, "salut\n\nmonde"),
        # ratio violator on the same page
        (4, "https://www.shop.com/es/product/42", "es", 500, "x"),
        # subdomain style pair
        (5, "http://en.news.org/a/story", "en", 80, "p1\n\np2\n\np3"),
        (6, "http://de.news.org/a/story", "de", 90, "q1\n\nq2"),
        # same lang twice on one key: never paired
        (7, "https://www.shop.com/en/product/43", "en", 100, "a"),
        (8, "https://www.shop.com/product/43", "en", 100, "b"),
        # trailing-segment language marker
        (9, "https://docs.io/guide/en", "en", 60, "g"),
        (10, "https://docs.io/guide/fr", "fr", 66, "g2"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, lang string, n_chars long, text string"
    )


class TestUrlKey:
    @pytest.mark.parametrize(
        "url,key",
        [
            ("https://www.shop.com/en/product/42", "www.shop.com/product/42"),
            ("https://www.shop.com/de/product/42", "www.shop.com/product/42"),
            ("http://en.news.org/a/story", "news.org/a/story"),
            ("https://docs.io/guide/en", "docs.io/guide"),
            ("https://docs.io/guide/EN", "docs.io/guide"),
            ("https://plain.com/about", "plain.com/about"),
            # 'english' is not a marker: only whole segments strip
            ("https://x.com/english/a", "x.com/english/a"),
        ],
    )
    def test_key(self, spark, url, key):
        got = spark.range(1).select(B.bitext_url_key(F.lit(url))).first()[0]
        assert got == key


class TestCandidates:
    def test_pairs(self, spark, corpus):
        out = B.bitext_url_candidates(corpus).orderBy("id_a", "id_b").collect()
        got = {(r["id_a"], r["id_b"], r["lang_a"], r["lang_b"]) for r in out}
        assert got == {
            (2, 1, "de", "en"),
            (1, 3, "en", "fr"),
            (2, 3, "de", "fr"),
            (6, 5, "de", "en"),
            (9, 10, "en", "fr"),
        }
        # orientation: lang_a < lang_b always
        assert all(r["lang_a"] < r["lang_b"] for r in out)
        # the es/en 500-vs-100 ratio violator never appears
        assert not any(4 in (r["id_a"], r["id_b"]) for r in out)

    def test_hot_key_cap(self, spark):
        rows = [
            (i, f"https://hub.com/{l}/home", l, 100)
            for i, l in enumerate(["en", "de", "fr", "es", "it", "pt"])
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, url string, lang string, n_chars long"
        )
        assert B.bitext_url_candidates(df).count() == 15  # C(6,2)
        assert B.bitext_url_candidates(df, max_docs_per_key=5).count() == 0

    def test_no_cartesian_in_plan(self, spark, corpus):
        plan = (
            B.bitext_url_candidates(corpus)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSegmentAlign:
    def test_positional(self, spark, corpus):
        pairs = B.bitext_url_candidates(corpus)
        segs = B.align_segments_by_position(pairs, corpus).collect()
        by_pair = {}
        for r in segs:
            by_pair.setdefault((r["id_a"], r["id_b"]), []).append(
                (r["seg_idx"], r["seg_a"], r["seg_b"])
            )
        assert sorted(by_pair[(1, 3)]) == [
            (0, "hello", "salut"),
            (1, "world", "monde"),
        ]
        # 3-para doc 5 vs 2-para doc 6: only shared indexes align
        assert sorted(by_pair[(6, 5)]) == [(0, "q1", "p1"), (1, "q2", "p2")]


class TestGaleChurch:
    def test_clean_one_to_one(self):
        from buildkite_logs_parquet_spark.operators.bitext import (
            gale_church_align_py,
        )

        a = ["The cat sat on the mat.", "It was warm.", "Dogs barked outside."]
        b = ["Le chat etait assis sur le tapis.", "Il faisait chaud.",
             "Des chiens aboyaient dehors."]
        beads = gale_church_align_py(a, b)
        assert beads == [((0,), (0,)), ((1,), (1,)), ((2,), (2,))]

    def test_two_to_one_merge_detected(self):
        from buildkite_logs_parquet_spark.operators.bitext import (
            gale_church_align_py,
        )

        # source sentence 1 was split into two short target sentences:
        # lengths make the 1-2 bead much cheaper than two lopsided 1-1s
        a = [
            "Alpha beta gamma delta epsilon zeta eta theta.",
            "Second sentence with a comparable length here ok.",
        ]
        b = [
            "Alpha beta gamma delta.",
            "Epsilon zeta eta theta.",
            "Deuxieme phrase d'une longueur comparable ici bon.",
        ]
        beads = gale_church_align_py(a, b)
        assert ((0,), (0, 1)) in beads
        assert beads[-1] == ((1,), (2,))

    def test_empty_and_degenerate(self):
        from buildkite_logs_parquet_spark.operators.bitext import (
            gale_church_align_py,
        )

        assert gale_church_align_py([], []) == []
        # one side empty: all deletions
        beads = gale_church_align_py(["x one.", "y two."], [])
        assert beads == [((0,), ()), ((1,), ())]

    def test_all_sentences_covered_once_property(self):
        import random

        from buildkite_logs_parquet_spark.operators.bitext import (
            gale_church_align_py,
        )

        rng = random.Random(3)
        a = [
            " ".join("w" * rng.randint(2, 9) for _ in range(rng.randint(3, 10)))
            + "."
            for _ in range(12)
        ]
        b = list(a)
        beads = gale_church_align_py(a, b)
        covered_a = [i for ia, _ in beads for i in ia]
        covered_b = [j for _, jb in beads for j in jb]
        assert covered_a == list(range(len(a)))
        assert covered_b == list(range(len(b)))

    def test_spark_stage_and_hostile_size_skip(self, spark):
        from buildkite_logs_parquet_spark.operators.bitext import (
            gale_church_align,
        )

        pairs = spark.createDataFrame(
            [
                (1, "One sentence here. Another one follows.",
                 "Une phrase ici. Une autre suit."),
                (2, ". ".join(["s"] * 600) + ".", "tiny."),
            ],
            "pair_id long, text_a string, text_b string",
        )
        out = gale_church_align(
            pairs, "text_a", "text_b", id_cols=["pair_id"],
            max_sentences=512,
        )
        rows = sorted(
            out.collect(), key=lambda r: (r["pair_id"], r["bead_idx"])
        )
        p1 = [r for r in rows if r["pair_id"] == 1]
        assert all(r["aligned"] for r in p1)
        assert [(r["src_text"], r["tgt_text"]) for r in p1] == [
            ("One sentence here.", "Une phrase ici."),
            ("Another one follows.", "Une autre suit."),
        ]
        p2 = [r for r in rows if r["pair_id"] == 2]
        assert len(p2) == 1 and not p2[0]["aligned"]


class TestMarginKnnMine:
    """margin_knn_mine: the LASER ratio-margin criterion, verified
    against a brute-force numpy twin (n_probe = |C| makes the IVF path
    exact, so the twin needs no cell model)."""

    CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]

    @staticmethod
    def _vecs():
        import numpy as np

        rng = np.random.RandomState(7)
        base = rng.normal(size=(5, 4))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        left = base + rng.normal(scale=0.02, size=base.shape)
        right = base + rng.normal(scale=0.02, size=base.shape)
        # a HUB on the right: moderately close to every left vector —
        # raw cosine would pair it widely, margin must demote it
        hub = base.mean(axis=0)
        right = list(right) + [hub / np.linalg.norm(hub)]
        return [list(map(float, v)) for v in left], [
            list(map(float, v)) for v in right
        ]

    def _twin(self, lvecs, rvecs, k, threshold):
        """Brute-force numpy margin replay (exact-kNN regime)."""
        import numpy as np

        L, R = np.array(lvecs), np.array(rvecs)
        cos = (
            L @ R.T
            / np.linalg.norm(L, axis=1)[:, None]
            / np.linalg.norm(R, axis=1)[None, :]
        )
        cos = np.round(cos, 6)
        fwd = {
            i: sorted(range(len(R)), key=lambda j: (-cos[i, j], j))[:k]
            for i in range(len(L))
        }
        bwd = {
            j: sorted(range(len(L)), key=lambda i: (-cos[i, j], i))[:k]
            for j in range(len(R))
        }
        ml = {i: round(float(np.mean([cos[i, j] for j in fwd[i]])), 6) for i in fwd}
        mr = {j: round(float(np.mean([cos[i, j] for i in bwd[j]])), 6) for j in bwd}
        edges = {(i, j) for i in fwd for j in fwd[i]} | {
            (i, j) for j in bwd for i in bwd[j]
        }
        out = {}
        for i, j in edges:
            m = round(float(cos[i, j]) * 2.0 / (ml[i] + mr[j]), 6)
            if m >= threshold:
                out[(i, j)] = (float(cos[i, j]), m)
        return out

    def _frames(self, spark):
        lvecs, rvecs = self._vecs()
        left = spark.createDataFrame(
            [(i, v) for i, v in enumerate(lvecs)],
            "vec_id long, embedding array<double>",
        )
        right = spark.createDataFrame(
            [(j, v) for j, v in enumerate(rvecs)],
            "vec_id long, embedding array<double>",
        )
        return lvecs, rvecs, left, right

    def test_matches_numpy_twin(self, spark):
        lvecs, rvecs, left, right = self._frames(spark)
        got = {
            (r["id_left"], r["id_right"]): (r["cosine"], r["margin"])
            for r in B.margin_knn_mine(
                left, right, self.CENTROIDS, k=3, n_probe=2,
                margin_threshold=1.0, mutual_best=False,
            ).collect()
        }
        want = self._twin(lvecs, rvecs, k=3, threshold=1.0)
        assert set(got) == set(want)
        for pair, (c, m) in want.items():
            assert got[pair][0] == pytest.approx(c, abs=1e-6)
            assert got[pair][1] == pytest.approx(m, abs=1e-6)

    def test_mutual_best_pairs_true_translations_and_demotes_hub(self, spark):
        lvecs, rvecs, left, right = self._frames(spark)
        out = B.margin_knn_mine(
            left, right, self.CENTROIDS, k=3, n_probe=2,
            margin_threshold=1.0, mutual_best=True,
        ).collect()
        pairs = {(r["id_left"], r["id_right"]) for r in out}
        # every left doc pairs with its true twin; the hub (right id 5)
        # is nobody's mutual best
        assert pairs == {(i, i) for i in range(5)}
        assert all(j != 5 for _, j in pairs)
        # at most one pair per id on either side (mutual argmax)
        assert len({i for i, _ in pairs}) == len(pairs)
        assert len({j for _, j in pairs}) == len(pairs)

    def test_no_cartesian_plan(self, spark):
        _, _, left, right = self._frames(spark)
        df = B.margin_knn_mine(left, right, self.CENTROIDS, k=2, n_probe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_validates_k(self, spark):
        _, _, left, right = self._frames(spark)
        with pytest.raises(ValueError):
            B.margin_knn_mine(left, right, self.CENTROIDS, k=0)
