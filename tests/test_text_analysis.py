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
