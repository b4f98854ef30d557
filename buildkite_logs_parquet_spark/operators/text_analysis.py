"""Text analysis operators for training-data curation.

All built-in expressions (regexp/aggregate/transform) — no Python in the
hot path; every scalar here is engine-portable so the DuckDB oracle can
replicate it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic.
#: Deterministic and fixed — quality of the lists matters less than the
#: operator shape (regexp counts + argmax), which is the 100 TB-relevant part.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "es": ["el", "la", "que", "de", "los"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, or single
    punctuation — a deterministic regex stand-in for a BPE tokenizer's
    token budget estimate."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def marker_count(col: Column, word: str) -> Column:
    """Whole-word occurrences of ``word`` (case-insensitive)."""
    return F.regexp_count(F.lower(col), F.lit(rf"\b{word}\b"))


def language_scores(col: Column, markers: dict[str, list[str]] | None = None) -> list[Column]:
    markers = markers or LANG_MARKERS
    return [
        sum(marker_count(col, w) for w in words).alias(f"score_{lang}")
        for lang, words in markers.items()
    ]


def language_id(
    df: DataFrame,
    text_col: str = "text",
    markers: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Stopword-marker language ID: per-language whole-word hit counts,
    argmax with deterministic tie-break (language name ascending);
    ``und`` (undetermined) when no marker hits at all."""
    markers = markers or LANG_MARKERS
    scored = df.withColumns(
        {f"score_{lang}": c for lang, c in zip(markers, language_scores(F.col(text_col), markers))}
    )
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(markers):  # ascending; later larger scores overwrite
        s = F.col(f"score_{lang}")
        better = s > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, s).otherwise(best_score)
    return scored.withColumn("detected_lang", best)


def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality components (all portable scalars)."""
    n_chars = F.length(col)
    alpha = F.regexp_count(col, F.lit(r"[A-Za-z]"))
    digits = F.regexp_count(col, F.lit(r"[0-9]"))
    punct = F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]"))
    toks = token_count(col)
    stop_hits = sum(marker_count(col, w) for w in LANG_MARKERS["en"])
    denom = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": toks,
        "alpha_ratio": alpha / denom,
        "digit_ratio": digits / denom,
        "punct_ratio": punct / denom,
        "stopword_ratio": stop_hits / F.greatest(toks, F.lit(1)).cast("double"),
        "avg_token_len": n_chars / F.greatest(toks, F.lit(1)).cast("double"),
    }


def quality_score(
    df: DataFrame, text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """Length/character-class/stopword quality heuristic in [0, ~1.5]."""
    f = quality_features(F.col(text_col))
    score = (
        F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0)) * 0.3
        + f["alpha_ratio"] * 0.4
        + F.least(f["stopword_ratio"] * F.lit(5.0), F.lit(1.0)) * 0.2
        + (F.lit(1.0) - F.least(f["punct_ratio"] * F.lit(5.0), F.lit(1.0))) * 0.1
    )
    out = df
    for name, c in f.items():
        if name in ("alpha_ratio", "digit_ratio", "punct_ratio", "stopword_ratio", "avg_token_len"):
            c = F.round(c, round_to)
        out = out.withColumn(name, c)
    return out.withColumn("quality_score", F.round(score, round_to))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    top_k: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Top-``top_k`` TF-IDF terms per document (smoothed idf:
    ``ln((1+N)/(1+df)) + 1``, sklearn's formula).

    Plan: token explode → (doc, term) counts → term document-frequency
    aggregation joined back on term → per-doc top-k window.  All shuffles
    are keyed by term or doc.  The corpus size N (total documents, the
    standard idf denominator basis) is taken driver-side as a literal —
    ``df.count()`` on a parquet source is footer-metadata work, and a
    constant-key broadcast join for a scalar folds into a nested-loop
    cross join, which the plan discipline bans.  Ties rank
    lexicographically (term asc) so the result is deterministic.
    """
    from pyspark.sql import Window as W

    from buildkite_logs_parquet_spark.operators.dedup import _fan_out

    tokens = (
        _fan_out(df)
        .select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "term"
            ),
        )
        .where(F.col("term") != "")
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = df.count()
    scored = tf.join(docfreq, on="term").withColumn(
        "tfidf",
        F.col("tf")
        * (
            F.log((F.lit(1.0) + F.lit(float(n))) / (F.lit(1.0) + F.col("df")))
            + F.lit(1.0)
        ),
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            F.col(id_col),
            "rank",
            "term",
            F.col("tf"),
            F.round("tfidf", round_to).alias("tfidf"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken MOSS scheme):
    hash every k-gram, slide a ``window`` over consecutive hashes, keep
    each window's minimum — a position-robust fingerprint set that
    guarantees detection of matches ≥ k+window-1 chars.

    Plan shape: explode k-grams with positions → hash (one digest per
    gram) → per-document sliding-window min (rows-between window) →
    distinct.  Partitioned by document id, so it scales horizontally.
    """
    from pyspark.sql import Window as W

    from buildkite_logs_parquet_spark.operators.dedup import _fan_out, _hash64

    n_sh = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    grams = _fan_out(df).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda p: F.col(text_col).substr(p, F.lit(k)),
            )
        ).alias("pos", "gram"),
    )
    hashed = grams.select(
        F.col(id_col), F.col("pos"), _hash64(F.col("gram"), 0).alias("h")
    )
    w = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(W.currentRow, window - 1)
    )
    return (
        hashed.select(F.col(id_col), F.min("h").over(w).alias("fingerprint"))
        .distinct()
    )


def fingerprint(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    strip non-alphanumerics, md5.  The standard near-exact dedup key."""
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
        r"\s+",
        " ",
    )
    return df.select(
        F.col(id_col),
        F.md5(F.trim(normalized)).alias("fingerprint"),
    )
