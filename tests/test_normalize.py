"""Unicode normalization: golden vectors, DuckDB/utf8proc parity for
the oracle-backed passes, mojibake repair, idempotence, composition."""

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import normalize as N

# Adversarial set: combining sequences, ligatures, full-width forms,
# Hangul (algorithmic NFD), no-decomposition chars, mark-order cases
VECTORS = [
    "café ﬁne",  # combining acute + fi ligature
    "éÃ©",  # composed é + mojibake-looking Ã©
    "Ą̊ring",  # stacked combining marks
    "Ǆǅǆ",  # DZ digraphs (NFKC-sensitive)
    "ＡｂＣ full width",
    "ȫ diaeresis+macron",
    "ø no-decomp",
    "한글 한",  # Hangul syllables + jamo
    "ṩ dot-below dot-above",
    "",
    "plain ascii",
]


def _vec_df(spark, vecs=VECTORS):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id int, text string"
    )


def test_nfc_matches_duckdb(spark):
    got = (
        _vec_df(spark)
        .select("id", N.unicode_normalize_col(F.col("text"), "NFC").alias("n"))
        .orderBy("id")
        .collect()
    )
    for row, v in zip(got, VECTORS):
        want = duckdb.sql(
            "select nfc_normalize(?)", params=[v]
        ).fetchone()[0]
        assert row["n"] == want, repr(v)


def test_strip_accents_matches_duckdb(spark):
    got = (
        _vec_df(spark)
        .select("id", N.strip_accents_col(F.col("text")).alias("n"))
        .orderBy("id")
        .collect()
    )
    for row, v in zip(got, VECTORS):
        want = duckdb.sql("select strip_accents(?)", params=[v]).fetchone()[0]
        assert row["n"] == want, repr(v)


def test_nfkc_folds_compatibility(spark):
    rows = (
        _vec_df(spark, ["ﬁne ＡｂＣ"])
        .select(N.unicode_normalize_col(F.col("text"), "NFKC").alias("n"))
        .collect()
    )
    assert rows[0]["n"] == "fine AbC"


def test_unicode_normalize_rejects_bad_form(spark):
    with pytest.raises(ValueError):
        N.unicode_normalize_col(F.col("text"), "NFX")


def test_control_and_whitespace_passes(spark):
    df = _vec_df(spark, ["a\x00b\x07c\tkeep\nme\x9f  two   spaces\x7f "])
    rows = df.select(
        N.collapse_whitespace(N.strip_control_chars(F.col("text"))).alias("n")
    ).collect()
    assert rows[0]["n"] == "abc keep me two spaces"


def test_mojibake_single_and_double_encoded(spark):
    orig = "café ’quote’ €5"
    once = orig.encode("utf-8").decode("cp1252")  # cafÃ© â€™…
    twice = once.encode("utf-8").decode("cp1252")
    df = _vec_df(spark, [once, twice, orig, "no hints here"])
    rows = (
        df.select("id", N.fix_mojibake_col(F.col("text")).alias("n"))
        .orderBy("id")
        .collect()
    )
    assert rows[0]["n"] == orig
    assert rows[1]["n"] == orig  # two passes undo double encoding
    assert rows[2]["n"] == orig  # already-clean text untouched
    assert rows[3]["n"] == "no hints here"


def test_mojibake_leaves_unrepairable_text(spark):
    # Contains a hint char but the round-trip is not valid UTF-8 —
    # must pass through unchanged, never corrupt
    s = "Ã alone not followed by a continuation byte"
    rows = (
        _vec_df(spark, [s])
        .select(N.fix_mojibake_col(F.col("text")).alias("n"))
        .collect()
    )
    assert rows[0]["n"] == s


def test_normalize_text_composition_and_idempotence(spark):
    mixed = [
        "café  x".encode("utf-8").decode("cp1252"),  # mojibake+NFD
        " run\t\ton  \x01controls ",
        "한글 ok",
    ]
    df = _vec_df(spark, mixed)
    once = N.normalize_text(df, "text", out_col="n")
    rows = once.orderBy("id").collect()
    assert rows[0]["n"] == "café x"
    assert rows[1]["n"] == "run on controls"
    # idempotence: normalizing the normalized column is a fixpoint
    again = N.normalize_text(
        once.select("id", F.col("n").alias("text")), "text", out_col="n2"
    )
    for r in again.select("id", "text", "n2").collect():
        assert r["n2"] == r["text"]


def test_normalized_fingerprints_unify_byte_variants(spark):
    # The curation motivation: byte-different spellings of the same text
    # must dedup together after normalization
    composed = "résumé text"
    decomposed = unicodedata.normalize("NFD", composed)
    mojibake = composed.encode("utf-8").decode("cp1252")
    df = _vec_df(spark, [composed, decomposed, mojibake])
    n = N.normalize_text(df, "text", out_col="n")
    assert n.select("n").distinct().count() == 1


class TestPseudonymize:
    def test_deterministic_and_join_preserving(self, spark):
        from buildkite_logs_parquet_spark.operators.normalize import (
            pseudonymize,
        )

        a = spark.createDataFrame(
            [(1, "alice@x.com"), (2, "bob@y.org"), (3, None)],
            "id long, email string",
        )
        b = spark.createDataFrame(
            [(9, "alice@x.com")], "other long, email string"
        )
        pa = pseudonymize(a, ["email"], secret="k1")
        pb = pseudonymize(b, ["email"], secret="k1")
        rows = {r["id"]: r["email"] for r in pa.collect()}
        assert rows[3] is None
        assert rows[1] != rows[2]
        assert rows[1].startswith("pid_") and len(rows[1]) == 4 + 16
        assert "alice" not in rows[1]
        # joinability survives across tables under the same secret
        assert pa.join(pb, "email").count() == 1
        # rotating the secret unlinks
        pa2 = pseudonymize(a, ["email"], secret="k2")
        assert {r["email"] for r in pa2.collect()} != set(rows.values())

    def test_validation(self, spark):
        import pytest as _pytest

        from buildkite_logs_parquet_spark.operators.normalize import (
            pseudonymize,
        )

        df = spark.createDataFrame([(1, "x")], "id long, v string")
        with _pytest.raises(ValueError):
            pseudonymize(df, [], "k")
        with _pytest.raises(ValueError):
            pseudonymize(df, ["v"], "")
