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
