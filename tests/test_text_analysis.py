"""Text analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import text_analysis as TA

DOCS = [
    (0, "the quick brown fox and the lazy dog"),  # en markers: the x2, and
    (1, "der hund und die katze ist nicht da"),  # de markers
    (2, "el perro y la casa de los gatos"),  # es markers
    (3, "xyzzy plugh qwerty"),  # no markers → und
    (4, ""),  # empty
    (5, "   "),  # blank
    (6, "a1b2 c3!"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_token_count(spark, docs):
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", TA.token_count(F.col("text")).alias("n")).collect()
    }
    assert got[0] == 8
    assert got[4] == 0 and got[5] == 0
    assert got[6] == 2


def test_bpe_ish_token_count(spark, docs):
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", TA.bpe_ish_token_count(F.col("text")).alias("n")
        ).collect()
    }
    # "a1b2 c3!" → a,1,b,2,c,3,! = 7
    assert got[6] == 7
    assert got[4] == 0


def test_language_id(spark, docs):
    got = {
        r["doc_id"]: r["detected_lang"]
        for r in TA.language_id(docs, "text").collect()
    }
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "es"
    assert got[3] == "und"
    assert got[4] == "und"


def test_quality_score_bounds_and_determinism(spark, docs):
    rows = TA.quality_score(docs, "text").collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.5
        assert 0.0 <= r["alpha_ratio"] <= 1.0
    by_id = {r["doc_id"]: r["quality_score"] for r in rows}
    # marker-rich English prose scores above symbol soup
    assert by_id[0] > by_id[6]


def test_winnow_fingerprints_detect_shared_substring(spark):
    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    df = spark.createDataFrame(
        [
            (0, f"prefix AAA {shared} suffix BBB"),
            (1, f"totally different start {shared} and different end"),
            (2, "no overlap whatsoever in this one, none at all truly"),
        ],
        "doc_id long, text string",
    )
    fps = TA.winnow_fingerprints(df, "doc_id", "text", k=8, window=4)
    by_id = {
        i: {r["fingerprint"] for r in fps.where(F.col("doc_id") == i).collect()}
        for i in (0, 1, 2)
    }
    # winnowing guarantee: a shared substring >= k+window-1 chars yields
    # shared fingerprints
    assert by_id[0] & by_id[1]
    assert len(by_id[0] & by_id[2]) < len(by_id[0] & by_id[1])


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [
            (0, "Hello,   World!"),
            (1, "hello world"),
            (2, "HELLO ... WORLD"),
            (3, "different text"),
        ],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in TA.fingerprint(df, "doc_id").collect()}
    assert fp[0] == fp[1] == fp[2]
    assert fp[0] != fp[3]


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from buildkite_logs_parquet_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    rows = [
        (0, "apple apple banana"),
        (1, "banana cherry"),
        (2, "cherry cherry cherry durian"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, "doc_id", "text", top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: apple tf=2 df=1 → 2*(ln(4/2)+1); banana tf=1 df=2
    idf = lambda dfreq: math.log(4 / (1 + dfreq)) + 1
    top0 = by_doc[0][0]
    assert top0["term"] == "apple" and top0["rank"] == 1
    assert abs(top0["tfidf"] - round(2 * idf(1), 4)) < 1e-9
    # doc 2: cherry tf=3 dominates; durian (df=1) second
    assert [r["term"] for r in sorted(by_doc[2], key=lambda r: r["rank"])] == [
        "cherry",
        "durian",
    ]
    # every doc has at most top_k rows, ranks dense from 1
    for doc, rs in by_doc.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))


def test_tfidf_tie_breaks_lexicographically(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame([(0, "zed alpha")], "doc_id long, text string")
    out = sorted(
        tfidf_top_terms(df, "doc_id", "text", top_k=2).collect(),
        key=lambda r: r["rank"],
    )
    # identical scores → alphabetical order decides ranks
    assert [r["term"] for r in out] == ["alpha", "zed"]
