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


#: Unicode scripts profiled by ``script_counts``: (name, Java regex
#: spelling, RE2/DuckDB spelling) — parity across both engines verified
#: in tests; declared order is the dominant-script tie-break order.
SCRIPTS: list[tuple[str, str, str]] = [
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("devanagari", r"\p{IsDevanagari}", r"\p{Devanagari}"),
]


def script_counts(col: Column) -> dict[str, Column]:
    """Per-script character counts (Latin/Cyrillic/Han/Arabic/
    Devanagari) — the script-detection signal multilingual curation
    filters on (language ID by stopword markers is useless across
    scripts; a CJK document in an English corpus is caught here first).
    Pure JVM ``regexp_count`` per script: narrow, codegen'd, zero
    Python."""
    return {
        f"n_{name}": F.regexp_count(col, F.lit(java_pat))
        for name, java_pat, _re2 in SCRIPTS
    }


def dominant_script(counts: dict[str, Column]) -> Column:
    """First script (in ``SCRIPTS`` order) holding the maximum count;
    ``'none'`` when no profiled-script character occurs.  The fixed
    order makes ties deterministic and the expression a portable
    greatest+CASE chain (the oracle restates it verbatim)."""
    top = F.greatest(*counts.values())
    expr = F.lit("none")
    for name, _j, _r in reversed(SCRIPTS):
        expr = F.when(counts[f"n_{name}"] == top, F.lit(name)).otherwise(expr)
    return F.when(top == 0, F.lit("none")).otherwise(expr)


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


def fingerprint_col(col: Column) -> Column:
    """Column form of ``fingerprint``: lowercase, strip non-alphanumerics,
    collapse whitespace, md5."""
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", ""),
        r"\s+",
        " ",
    )
    return F.md5(F.trim(normalized))


def fingerprint(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    strip non-alphanumerics, md5.  The standard near-exact dedup key."""
    return df.select(
        F.col(id_col),
        fingerprint_col(F.col(text_col)).alias("fingerprint"),
    )


#: seeded literal weights for the quality classifier — a stand-in for a
#: trained fasttext/logreg quality model; the operator shape (feature
#: projection + linear scoring, one narrow map) is the 100 TB-relevant part
CLASSIFIER_FEATURES = [
    "tokens_capped",
    "alpha_ratio",
    "punct_ratio",
    "stopword_ratio",
    "mean_len_scaled",
]


def classifier_weights(seed: int = 11) -> tuple[list[float], float]:
    """Deterministic (weights, bias) for ``quality_classifier`` — seeded
    PRNG literals, replayed by the oracle."""
    import random

    rng = random.Random(seed)
    return [round(rng.uniform(-2.0, 2.0), 6) for _ in CLASSIFIER_FEATURES], round(
        rng.uniform(-1.0, 1.0), 6
    )


def quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seed: int = 11,
    round_to: int = 4,
) -> DataFrame:
    """Model-based quality scoring: engineered features → linear logit →
    sigmoid probability → keep/drop label.  The weights here are seeded
    literals (no model artifact in the sandbox); swapping in trained
    coefficients changes nothing about the plan — a single narrow
    projection over the corpus, no shuffle, no Python.

    The keep label compares the LOGIT against 0 (exact in any engine)
    rather than the sigmoid against 0.5 — same decision boundary without
    putting a transcendental on the comparison path.
    """
    w, bias = classifier_weights(seed)
    f = quality_features(F.col(text_col))
    feats = {
        "tokens_capped": F.least(
            f["n_tokens"] / F.lit(100.0), F.lit(1.0)
        ),
        "alpha_ratio": f["alpha_ratio"],
        "punct_ratio": f["punct_ratio"],
        "stopword_ratio": f["stopword_ratio"],
        "mean_len_scaled": f["avg_token_len"] / F.lit(10.0),
    }
    logit = F.lit(bias)
    for name, wi in zip(CLASSIFIER_FEATURES, w):
        logit = logit + F.lit(wi) * feats[name]
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return df.select(
        F.col(id_col),
        F.round(logit, round_to).alias("logit"),
        F.round(prob, round_to).alias("prob_keep"),
        (logit >= 0).alias("keep"),
    )


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    min_count: int = 5,
) -> DataFrame:
    """Corpus-wide word n-gram vocabulary with counts — the counting pass
    of tokenizer/vocab induction (BPE-style merges rank exactly these
    pair counts).

    Plan: per-document n-gram explode → ONE global groupBy on the gram.
    Map-side partial aggregation collapses each partition's counts before
    the shuffle, so the shuffle volume is bounded by vocabulary size per
    partition, not corpus token count — the property that makes corpus
    vocab counting feasible at 100 TB.  ``min_count`` prunes the long
    tail after aggregation (a HAVING, not a filter on the explode).
    """
    from buildkite_logs_parquet_spark.operators.dedup import _fan_out

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    sz = F.size(F.col("_ws"))
    # guard: Spark's sequence(1, 0) DESCENDS instead of being empty, so
    # docs shorter than n words must short-circuit to no grams
    grams = F.when(sz >= n, F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.array_join(F.slice(F.col("_ws"), i, n), " "),
    )).otherwise(F.array().cast("array<string>"))
    exploded = _fan_out(df.select(words.alias("_ws"))).select(
        F.explode(grams).alias("gram")
    )
    return (
        exploded.groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int | None = None,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a literal query term set
    — the lexical retrieval complement to the embedding ANN stack.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))``
    with the robust idf ``ln(1 + (N − df + 0.5)/(df + 0.5))``.

    Returns ``(id, bm25, n_matched_terms)`` with ``bm25`` a 9-dp
    DECIMAL rendered as string (per-term scores rounded to 9 dp then
    decimal-summed — exact and order-independent, the ``dsir_weights``
    discipline, DETERMINISM.md §5), descending by score with id
    tie-break.  ``avgdl`` is derived from two exact integers
    (Σ token_count / N) so its double value is bit-stable across engines.

    100 TB shape: the query-term filter lands BEFORE the tf aggregation,
    so only tokens matching the (tiny, literal) query set ever shuffle;
    document length is a narrow ``token_count`` column (no second explode
    and no per-doc shuffle); N and avgdl come from ONE metadata-sized
    driver aggregate; per-term document frequencies are a |query|-row
    broadcast.  ``top_n`` turns the final sort into
    TakeOrderedAndProject (per-partition heap + driver merge) instead of
    a full corpus-sized global sort — at corpus scale always set it.
    """
    from buildkite_logs_parquet_spark.operators.dedup import _fan_out

    terms = [t.lower() for t in query_terms]
    base = _fan_out(df.select(F.col(id_col), F.col(text_col))).withColumn(
        "_dl", token_count(F.col(text_col)).cast("long")
    )
    # ONE combined stats job: doc count + total token count (both exact
    # integers, so avgdl's double value is engine-independent)
    stats = base.agg(
        F.count("*").alias("_n"), F.sum("_dl").alias("_tot")
    ).first()
    n_docs = int(stats["_n"] or 0)
    total_tokens = int(stats["_tot"] or 0)
    avgdl = (total_tokens / n_docs) if n_docs else 1.0
    tokens = (
        base.select(
            F.col(id_col),
            "_dl",
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
                "_t"
            ),
        )
        .where(F.col("_t").isin(terms))  # literal IN: only query tokens survive
    )
    tf = tokens.groupBy(id_col, "_t").agg(
        F.count("*").alias("_tf"), F.first("_dl").alias("_dl")
    )
    docfreq = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    scored = tf.join(F.broadcast(docfreq.withColumn("_idf", idf)), on="_t")
    term_score = F.col("_idf") * (
        F.col("_tf") * (k1 + 1.0)
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.lit(float(avgdl))))
    )
    ranked = (
        scored.groupBy(id_col)
        .agg(
            F.sum(F.round(term_score, 9).cast("decimal(38,9)")).alias("_s"),
            F.count("*").alias("n_matched_terms"),
        )
        .orderBy(F.col("_s").desc(), F.col(id_col))
    )
    if top_n is not None:
        ranked = ranked.limit(top_n)
    return ranked.select(
        F.col(id_col),
        F.col("_s").cast("string").alias("bm25"),
        "n_matched_terms",
    )


def url_domain_stats(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-domain URL statistics over the corpus (web-curation staple:
    domain blocklists, source audits): extract ``http(s)://`` URLs, key by
    lowercased host, count occurrences and distinct documents.

    Narrow extract + explode, ONE aggregation keyed by domain (bounded by
    the web's domain cardinality, not corpus size; a hot domain is
    map-side-combined before it shuffles)."""
    urls = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"https?://[^\s/$.?#][^\s]*"), 0
            )
        ).alias("_url"),
    )
    domain = F.lower(F.regexp_extract(F.col("_url"), r"https?://([^/\s:?#]+)", 1))
    return (
        urls.select(F.col(id_col), domain.alias("domain"))
        .where(F.col("domain") != "")
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
    )


def word_symbol_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distinct-word frequency table with each word as a character-symbol
    array — the starting state of BPE vocabulary induction.  One corpus
    token explode + one word-keyed count; the result is vocabulary-sized,
    orders of magnitude smaller than the corpus."""
    from buildkite_logs_parquet_spark.operators.dedup import _fan_out

    tokens = _fan_out(df.select(F.col(text_col))).select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    return tokens.groupBy("word").agg(F.count("*").alias("freq")).select(
        "word", "freq", F.split(F.col("word"), "").alias("symbols")
    )


def bpe_merge_step(
    words: DataFrame,
    symbols_col: str = "symbols",
    freq_col: str = "freq",
) -> tuple[DataFrame, tuple[str, str] | None, int]:
    """ONE byte-pair-encoding merge iteration (Sennrich et al. 2016) over
    a word/frequency symbol table: count adjacent symbol pairs weighted by
    word frequency, pick the most frequent pair (ties broken
    lexicographically so the learned vocab is deterministic), and merge it
    greedily left-to-right inside every word.

    Returns ``(merged_words, best_pair, pair_count)``; ``best_pair`` is
    ``None`` when no adjacent pair remains (every word is one symbol).

    100 TB shape: the state is the WORD table (vocabulary-sized — the
    corpus itself is never touched after ``word_symbol_table``); pair
    counting is one explode + one groupBy with map-side combine bounded by
    the pair vocabulary; the argmax is a driver-side single row (top-1 via
    ordered limit, a TakeOrdered merge — metadata-sized); the merge itself
    is a narrow higher-order-function map, no shuffle.  An n-merge
    training loop is n such steps — each step's driver traffic is ONE row.
    """
    pairs = words.select(
        F.col(freq_col),
        F.explode(
            F.when(
                F.size(F.col(symbols_col)) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(F.col(symbols_col)) - 1),
                    lambda i: F.struct(
                        F.element_at(F.col(symbols_col), i).alias("a"),
                        F.element_at(F.col(symbols_col), i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    top = (
        pairs.groupBy("p")
        .agg(F.sum(freq_col).alias("n"))
        .orderBy(F.col("n").desc(), F.col("p.a"), F.col("p.b"))
        .limit(1)
        .collect()
    )
    if not top:
        return words, None, 0
    a, b = top[0]["p"]["a"], top[0]["p"]["b"]
    count = top[0]["n"]

    # greedy left-to-right merge of (a, b) via a fold: the accumulator
    # carries the rebuilt prefix plus one pending symbol; a pending `a`
    # followed by `b` flushes as the merged symbol (so "aaa" with pair
    # (a,a) becomes ["aa", "a"], matching the reference implementation)
    merged = F.aggregate(
        F.col(symbols_col),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("pend"),
        ),
        lambda acc, s: F.when(
            acc["pend"].isNull(),
            F.struct(acc["out"].alias("out"), s.alias("pend")),
        ).when(
            (acc["pend"] == F.lit(a)) & (s == F.lit(b)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(a + b))).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                s.alias("pend"),
            )
        ),
        lambda acc: F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
    )
    out = words.withColumn(symbols_col, merged)
    return out, (a, b), count


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint: bool = True,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """BPE vocabulary induction end-to-end (the loop around
    ``word_symbol_table`` + ``bpe_merge_step``, round-3 verdict item):
    build the word/frequency symbol table ONCE from the corpus, then run
    ``n_merges`` merge rounds, stopping early when no adjacent pair
    remains.  Returns ``(merges, final_word_table)`` — feed the merges to
    ``bpe_encode``.

    Lineage discipline: each round rewrites the symbols column with a
    higher-order transform, so after N rounds the unchecked plan is an
    N-deep expression stack that Catalyst re-analyzes per round (the same
    failure mode as the connected-components loop, graph.py).  A lazy
    ``localCheckpoint(eager=False)`` before each round truncates it; the
    round's own argmax job (a 1-row TakeOrdered collect, already paid)
    materializes the checkpoint — ONE job per merge, none extra.

    100 TB shape: the corpus is touched exactly once
    (``word_symbol_table``); every round's state is the vocabulary-sized
    word table and its driver traffic is one row.
    """
    words = word_symbol_table(df, text_col)
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        if checkpoint:
            words = words.localCheckpoint(eager=False)
        words, pair, _count = bpe_merge_step(words)
        if pair is None:
            break
        merges.append(pair)
    return merges, words


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge list to every document — the encode side
    of the ``word_symbol_table``/``bpe_merge_step`` trainer.

    Encoding is inherently sequential per word (each merge rewrites the
    symbol sequence the next merge scans), so this is the honest
    Pandas-UDF case: an Arrow-batched ``mapInPandas`` with the merge
    ranks carried in the closure (broadcast once per executor), applying
    the standard greedy lowest-rank-first merge loop per word with a
    per-batch word cache (corpus word frequency follows Zipf — the cache
    hit rate is high).  No shuffle: output rows inherit the scan's
    partitioning.

    Output: ``(id, n_tokens, tokens array<string>)``.
    """
    from typing import Iterator

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            out = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                toks: list = []
                for w in str(text).lower().split():
                    toks.extend(encode_word(w, cache))
                out.append({id_col: rid, "n_tokens": len(toks), "tokens": toks})
            yield pd.DataFrame(out, columns=[id_col, "n_tokens", "tokens"])

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_tokens long, tokens array<string>"
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema=schema)


def top_terms_by_group(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    k: int = 10,
    max_items_tracked: int = 10_000,
    exact: bool = False,
) -> DataFrame:
    """Approximate per-group heavy-hitter terms via the ``approx_top_k``
    sketch — "most common tokens per language/source" in ONE aggregation.

    The exact formulation needs (group, term) counts plus a rank window —
    two shuffles and a per-group sort.  The sketch keeps the plan at ONE
    group-keyed shuffle of mergeable partial sketches, each bounded by
    ``max_items_tracked``; per-partition partials merge associatively, so
    the cost at 100 TB is the token explode (narrow) plus a
    |groups|-sized reduce.  Accuracy: exact whenever a group's distinct
    term count stays under ``max_items_tracked`` (tested); heavy hitters
    under Zipf skew far beyond it.

    ``exact=True`` swaps the sketch for the exact two-shuffle
    formulation ((group, term) counts + rank window, count-desc with
    lexicographic term tie-break) — deterministic and SQL-expressible,
    so the correctness gate drives the plumbing end-to-end; production
    keeps the one-shuffle sketch.

    Output: one row per (group, rank): ``term``, ``approx_count``.
    """
    from buildkite_logs_parquet_spark.operators.dedup import _fan_out

    tokens = _fan_out(df.select(F.col(group_col), F.col(text_col))).select(
        F.col(group_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_t"),
    ).where(F.col("_t") != "")
    if exact:
        from pyspark.sql import Window as W

        counted = tokens.groupBy(group_col, "_t").agg(
            F.count("*").alias("approx_count")
        )
        w = W.partitionBy(group_col).orderBy(
            F.col("approx_count").desc(), F.col("_t")
        )
        return (
            counted.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                group_col,
                F.col("rank").cast("long").alias("rank"),
                F.col("_t").alias("term"),
                "approx_count",
            )
        )
    sketched = tokens.groupBy(group_col).agg(
        F.expr(f"approx_top_k(_t, {int(k)}, {int(max_items_tracked)})").alias("_tk")
    )
    return sketched.select(
        F.col(group_col),
        F.posexplode(F.col("_tk")).alias("rank0", "_e"),
    ).select(
        group_col,
        (F.col("rank0") + 1).alias("rank"),
        F.col("_e.item").alias("term"),
        F.col("_e.count").alias("approx_count"),
    )


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for dedup keys — the first-stage dedup every
    crawl pipeline runs BEFORE content hashing (the same page arrives
    under utm-tagged, fragment-bearing, default-port variants):

    1. lowercase scheme+host (path case is significant, kept),
    2. drop the fragment (``#…``),
    3. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
       ``ref``) while keeping meaningful ones, removing a ``?`` left
       empty,
    4. drop explicit default ports (``:80`` for http, ``:443`` for
       https),
    5. drop ONE trailing slash on a non-root path.

    Pure regexp_replace chain in the RE2 ∩ Java subset (the pii_scrub
    discipline) — zero shuffle, engine-replayable, so downstream
    ``exact_dedup`` on the canonical key stays oracle-checkable.
    """
    u = url
    # 1. lowercase scheme://host[:port] only (scheme may arrive in any case)
    head = F.lower(F.regexp_extract(u, r"(?i)^(https?://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"(?i)^https?://[^/?#]*", "")
    u = F.concat(head, rest)
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. tracking params: each `?`/`&`-prefixed blocked name=value
    # collapses to its separator, then separator debris is tidied —
    # NO lookaround anywhere (RE2 has none), so DuckDB replays the chain
    u = F.regexp_replace(
        u, r"([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=[^&#]*", "$1"
    )
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    # 4. default ports (optional tail group re-appended; an absent group
    # substitutes as empty in both Java and RE2)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    # 5. one trailing slash on a non-root path (the bare host's "/" stays)
    u = F.regexp_replace(
        u, r"^(https?://[^/?#]+/[^?#]*[^/?#])/([?#].*)?$", "$1$2"
    )
    return u


def code_quality_signals(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Code-corpus curation signals (the StarCoder/CodeParrot-class
    heuristics, as pure JVM expressions — one narrow projection):

    * line geometry — ``n_lines``, ``max_line_len``, ``avg_line_len100``
      (×100 integer, exact ``div``) — minified/generated files have few,
      enormous lines;
    * ``is_minified`` — max line > 1000 chars or (avg > 300 and
      whitespace share < 5%): the standard bundle/minidump tell;
    * ``is_autogenerated`` — the conventional marker phrases
      ("auto-generated", "do not edit", "generated by") in the first
      512 chars, where generators put them;
    * ``has_license_header`` — SPDX tag or license boilerplate phrases
      in the first 1024 chars (dedup keys for license stripping and
      compliance buckets);
    * ``alnum_pct`` / ``ws_pct`` — ×100 integer shares of alphanumeric
      and whitespace bytes (data blobs embedded as "code" skew both).

    All decisions are integer/boolean — layout- and engine-stable; the
    thresholds are arguments of record in the output, not hidden state.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_lines = F.size(F.split(t, "\n"))
    lines = F.split(t, "\n")
    max_line = F.coalesce(
        F.array_max(F.transform(lines, lambda s: F.length(s))), F.lit(0)
    )
    n_ws = F.length(t) - F.length(F.regexp_replace(t, r"\s", ""))
    n_alnum = F.length(F.regexp_replace(t, r"[^A-Za-z0-9]", ""))
    head512 = F.lower(F.substring(t, 1, 512))
    head1024 = F.lower(F.substring(t, 1, 1024))
    avg100 = F.expr(
        f"case when size(split({text_col}, '\\n')) = 0 then 0 "
        f"else length({text_col}) * 100 div size(split({text_col}, '\\n')) end"
    )
    # integer shares: floor((p·100)/q) over ints ≤ 2^31 is exact — the
    # double quotient is correctly rounded and cannot cross an integer
    # boundary at these magnitudes
    ws_pct = (
        F.when(n_chars > 0, F.floor((n_ws * 100) / n_chars))
        .otherwise(0)
        .cast("int")
    )
    alnum_pct = (
        F.when(n_chars > 0, F.floor((n_alnum * 100) / n_chars))
        .otherwise(0)
        .cast("int")
    )
    auto = (
        head512.contains("auto-generated")
        | head512.contains("autogenerated")
        | head512.contains("do not edit")
        | head512.contains("generated by")
        | head512.contains("@generated")
    )
    lic = (
        head1024.contains("spdx-license-identifier")
        | head1024.contains("licensed under")
        | head1024.contains("apache license")
        | head1024.contains("mit license")
        | head1024.contains("gnu general public license")
        | head1024.contains("all rights reserved")
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_lines.alias("n_lines"),
        max_line.alias("max_line_len"),
        avg100.cast("long").alias("avg_line_len100"),
        ws_pct.alias("ws_pct"),
        alnum_pct.alias("alnum_pct"),
        ((max_line > 1000) | ((avg100 > 30000) & (ws_pct < 5))).alias(
            "is_minified"
        ),
        auto.alias("is_autogenerated"),
        lic.alias("has_license_header"),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    encode_fn=None,
) -> DataFrame:
    """Per-group tokenizer efficiency report — the number every
    tokenizer/corpus pairing decision reads first: fertility (sub-word
    tokens per whitespace word) and compression (bytes per token) by
    domain/language/source.  High-fertility groups are the ones a BPE
    vocabulary underserves (they pay more sequence budget per word).

    ``encode_fn`` (optional) maps the text column to a token-COUNT
    column for a real tokenizer (e.g. a trained-BPE encode length);
    default is the deterministic BPE-ish regex count, which keeps the
    whole report a pure narrow projection + one aggregate.

    All outputs are BIGINT (sums, and ratios as ``·10³ div`` integer
    per-mille — rule 15): ``n_docs, n_bytes, n_words, n_tokens,
    fertility_pm3`` (tokens·1000 div words), ``bytes_per_token_pm3``
    (bytes·1000 div tokens), ``tokens_per_doc`` (tokens div docs).

    100 TB shape: one map-side-combined aggregate keyed by the group —
    the shuffle carries |groups| rows of six longs.
    """
    t = F.col(text_col)
    n_tok = (
        encode_fn(t) if encode_fn is not None else bpe_ish_token_count(t)
    )
    agg = (
        df.select(
            F.col(group_col),
            F.octet_length(t).alias("_b"),
            token_count(t).alias("_w"),
            n_tok.alias("_t"),
        )
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_b").cast("long").alias("n_bytes"),
            F.sum("_w").cast("long").alias("n_words"),
            F.sum("_t").cast("long").alias("n_tokens"),
        )
    )
    return agg.select(
        group_col,
        "n_docs",
        "n_bytes",
        "n_words",
        "n_tokens",
        F.when(
            F.col("n_words") > 0, F.expr("n_tokens * 1000L div n_words")
        ).alias("fertility_pm3"),
        F.when(
            F.col("n_tokens") > 0, F.expr("n_bytes * 1000L div n_tokens")
        ).alias("bytes_per_token_pm3"),
        F.when(
            F.col("n_docs") > 0, F.expr("n_tokens div n_docs")
        ).alias("tokens_per_doc"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    vocab_col: str = "token",
) -> DataFrame:
    """Per-group vocabulary coverage / OOV report against a token
    relation (a trained tokenizer's vocab, an allowlist, an embedding
    table's keys): the companion number to :func:`tokenizer_fertility` —
    high OOV domains are the ones the vocabulary underserves.

    Tokens are lowercase whitespace words (the corpus side of a word-
    level vocab); swap the tokenizer upstream by passing a pre-tokenized
    ``df`` with one token per row in ``text_col``.

    Output per group (all BIGINT, rule 15): ``n_tokens`` (occurrences),
    ``n_oov`` (occurrences of out-of-vocab tokens), ``oov_pm``
    (occurrence-weighted, ``·10⁶ div``), ``n_types`` / ``n_oov_types``
    (distinct tokens), ``type_oov_pm``.

    100 TB shape: the vocab side is a tokenizer vocabulary —
    lexicon-sized by construction — so membership is a BROADCAST left
    join against the exploded token stream (no corpus-side shuffle for
    the join); occurrence counts aggregate map-side by group, and the
    type counts aggregate over the (group, token) distinct relation.
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("_tok"),
    ).where(F.col("_tok") != "")
    v = F.broadcast(
        vocab.select(F.lower(F.col(vocab_col)).alias("_tok"))
        .distinct()
        .withColumn("_inv", F.lit(True))
    )
    marked = toks.join(v, "_tok", "left").select(
        "_g", "_tok", F.col("_inv").isNull().alias("_oov")
    )
    occ = marked.groupBy("_g").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.col("_oov").cast("long")).cast("long").alias("n_oov"),
    )
    types = (
        marked.select("_g", "_tok", "_oov")
        .distinct()
        .groupBy("_g")
        .agg(
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.col("_oov").cast("long")).cast("long").alias("n_oov_types"),
        )
    )
    return (
        occ.join(types, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_tokens",
            "n_oov",
            F.when(
                F.col("n_tokens") > 0, F.expr("n_oov * 1000000L div n_tokens")
            ).alias("oov_pm"),
            "n_types",
            "n_oov_types",
            F.when(
                F.col("n_types") > 0,
                F.expr("n_oov_types * 1000000L div n_types"),
            ).alias("type_oov_pm"),
        )
    )
