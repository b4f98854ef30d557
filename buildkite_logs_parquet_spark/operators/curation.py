"""Corpus-curation operators for large-scale training-data pipelines.

Beyond-reference extensions (the reference is a single-log tool and has no
corpus-level ops); every scalar here is engine-portable (md5 / regexp /
integer arithmetic) so the DuckDB oracle replicates it bit-for-bit, and
every plan is a narrow projection or a keyed aggregation — no shuffle
carries document text unless the semantics require it.

* deterministic sampling — md5-bucket Bernoulli: the sample is a pure
  function of (seed, key), so re-running the pipeline (or running it on a
  different cluster layout) selects the SAME rows.  Uniform and per-stratum
  rate variants.  This is what `df.sample()` cannot give you: Spark's
  sampler is seeded per-partition, so the selected set changes whenever the
  partition layout does.
* quality filtering (Gopher-style) — rule-based document filter with
  per-rule failure reasons, after Rae et al. 2021 ("Scaling Language
  Models", §A1.1): token-count bounds, mean-token-length band, symbol
  ratio, stopword presence.  All built-in expressions; at 100 TB this is a
  single narrow map over the corpus.
* repetition metrics — within-document duplication signals from the same
  Gopher appendix: duplicate-token ratio, most-common-token share, top
  bigram share.  Plan: token/bigram explode → per-(doc, gram) count →
  per-doc aggregate; everything is keyed by doc_id so it scales
  horizontally and the shuffle carries (doc_id, gram-hash-sized) rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: sampling buckets span [0, 2^32): the first 8 hex digits of an md5.
_BUCKETS = 1 << 32


def hash_bucket(key: Column, seed: int) -> Column:
    """Deterministic bucket in [0, 2^32) — first 8 md5 hex digits of
    ``"{seed}:{key}"``.  Pure content hash: stable across runs, engines,
    partition layouts."""
    tagged = F.concat(F.lit(f"{seed}:"), key.cast("string"))
    return F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")


def sample_deterministic(
    df: DataFrame, key_col: str, rate: float, seed: int = 42
) -> DataFrame:
    """Keep a ``rate`` fraction of rows, chosen by content hash of
    ``key_col`` — reproducible run-to-run and engine-to-engine (unlike
    ``DataFrame.sample``, whose per-partition RNG ties the selected set to
    the physical layout).  The filter is a narrow predicate: it pushes no
    data movement and composes with scan pruning."""
    threshold = int(rate * _BUCKETS)
    return df.where(hash_bucket(F.col(key_col), seed) < F.lit(threshold))


def sample_stratified(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. downsample English to 10%
    while keeping all low-resource languages.  One narrow predicate; the
    per-stratum threshold is a CASE chain on ``stratum_col`` (broadcast-free:
    the rate table is folded into the expression)."""
    threshold: Column = F.lit(int(default_rate * _BUCKETS))
    for value in sorted(rates):  # fixed order: deterministic expression
        threshold = F.when(
            F.col(stratum_col) == value, F.lit(int(rates[value] * _BUCKETS))
        ).otherwise(threshold)
    return df.where(hash_bucket(F.col(key_col), seed) < threshold)


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: each row's bucket (pure content
    hash of ``key_col``) is mapped to the split whose cumulative weight
    range contains it.  Reproducible across runs/engines/layouts, and
    stable under corpus growth: a document's split never changes when
    other documents are added or removed — the property random shuffling
    cannot give.  Splits are assigned in sorted-name order; weights are
    normalized."""
    total = sum(weights.values())
    bucket = hash_bucket(F.col(key_col), seed)
    expr: Column | None = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(acc * _BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


# --------------------------------------------------------- PII scrubbing

#: redaction patterns — applied in this order, each on the output of the
#: previous (RE2- and Java-regex-compatible: no backrefs, no lookaround)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # card BEFORE phone: a bare 13-19-digit run also matches the
    # phone shape, and the card category must claim it first
    ("card", r"\b[0-9]{13,19}\b", "<CARD>"),
    ("phone", r"\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
]

#: the card-shaped-run pattern (kept in sync with PII_PATTERNS)
CARD_PATTERN = PII_PATTERNS[2][1]


def luhn_valid(col: Column) -> Column:
    """Luhn checksum over a digit string — TRUE iff the mod-10 check
    passes (the payment-card validity test; Dolma-class PII scrubbers
    use it to separate real card numbers from arbitrary digit runs).
    Pure Spark expression (split → indexed transform → aggregate), no
    UDF; the oracle restates it with DuckDB list lambdas."""
    digits = F.split(F.reverse(col), "")
    terms = F.transform(
        digits,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9).otherwise(
                c.cast("int") * 2
            ),
        ).otherwise(c.cast("int")),
    )
    return F.aggregate(terms, F.lit(0), lambda a, b: a + b) % 10 == 0


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Redact emails / IPv4s / card-shaped runs / phone-shaped numbers,
    keeping per-category match counts for auditing.  A narrow map — each
    pattern is counted on and then replaced in the running text, so
    counts reflect what was actually redacted (an IP inside an
    already-redacted email is not double-counted).  Patterns stay in the
    RE2 ∩ Java regex subset so the same semantics run on any engine.

    ``n_card`` counts every card-SHAPED run (all are redacted — shape
    alone is enough to scrub); ``n_card_valid`` additionally applies the
    Luhn checksum to the original text's runs, separating real card
    numbers from arbitrary digit sequences in the audit."""
    cur = F.col(text_col)
    out = df
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    cands = F.regexp_extract_all(F.col(text_col), F.lit(CARD_PATTERN), 0)
    out = out.withColumn(
        "n_card_valid", F.size(F.filter(cands, luhn_valid))
    )
    return out.withColumn(out_col, cur)


# ------------------------------------------------------ quality filtering

#: Gopher-style rule set (Rae et al. 2021 §A1.1, simplified to portable
#: scalars).  Names are the filter-reason vocabulary; order is the fixed
#: reason-string order.
GOPHER_DEFAULTS = {
    "min_tokens": 10,
    "max_tokens": 1000,
    "min_mean_token_len": 3.0,
    "max_mean_token_len": 10.0,
    "max_symbol_ratio": 0.1,
}


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    params: dict | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Rule-based document filter with per-rule reasons.

    Adds ``n_tokens``, ``mean_token_len``, ``symbol_ratio``,
    ``has_stopword``, boolean ``passes``, and ``fail_reasons`` (the
    comma-joined names of every failed rule, in fixed rule order — ``''``
    when the document passes).  Keep/drop is then a trivial
    ``.where("passes")``; keeping the reasons makes the filter auditable,
    which at corpus scale matters more than the boolean.
    """
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        LANG_MARKERS,
        marker_count,
        token_count,
    )

    p = {**GOPHER_DEFAULTS, **(params or {})}
    text = F.col(text_col)
    n_tokens = token_count(text)
    # mean token length over non-whitespace chars: whitespace never counts
    # toward a token, so (chars - whitespace) / tokens is exact
    non_ws = F.length(text) - F.regexp_count(text, F.lit(r"\s"))
    mean_len = non_ws / F.greatest(n_tokens, F.lit(1)).cast("double")
    symbol_ratio = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")) / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")
    has_stopword = (
        sum(marker_count(text, w) for w in LANG_MARKERS["en"]) > 0
    )

    rules: list[tuple[str, Column]] = [
        ("too_few_tokens", n_tokens < p["min_tokens"]),
        ("too_many_tokens", n_tokens > p["max_tokens"]),
        ("mean_token_len_low", mean_len < p["min_mean_token_len"]),
        ("mean_token_len_high", mean_len > p["max_mean_token_len"]),
        ("symbol_heavy", symbol_ratio > p["max_symbol_ratio"]),
        ("no_stopword", ~has_stopword),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    out = df.withColumns(
        {
            "n_tokens": n_tokens,
            "mean_token_len": F.round(mean_len, round_to),
            "symbol_ratio": F.round(symbol_ratio, round_to),
            "has_stopword": has_stopword,
            "fail_reasons": reasons,
        }
    )
    return out.withColumn("passes", F.col("fail_reasons") == "")


# ------------------------------------------------- contamination checking


def benchmark_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 13,
    hash_fn: str = "md5",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Test-set contamination scan (GPT-3-style 13-gram overlap): for every
    training document sharing at least one character k-gram with the
    benchmark set, report ``n_shared_ngrams`` (distinct shared grams) and
    ``n_benchmark_docs`` (distinct benchmark documents hit).

    The 100 TB shape: the benchmark side is an eval set — tiny by
    definition — so its distinct gram hashes are **broadcast**
    (``broadcast_benchmark``), and the corpus-sized side is filtered by a
    broadcast hash join with NO shuffle of corpus grams; only the
    per-document aggregation shuffles, and it carries (id, 8-byte hash)
    rows.  Set ``broadcast_benchmark=False`` only if the "benchmark" is
    itself corpus-sized.

    Documents shorter than ``k`` contribute their whole text as a single
    short gram (consistent with the n-gram Jaccard operator).
    """
    from buildkite_logs_parquet_spark.operators.dedup import _fan_out, _hash64

    def grams(df: DataFrame, alias: str, dedup: bool) -> DataFrame:
        n = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
        out = (
            _fan_out(df)
            .select(
                F.col(id_col).alias(alias),
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), n),
                        lambda p: F.col(text_col).substr(p, F.lit(k)),
                    )
                ).alias("_g"),
            )
            .select(F.col(alias), _hash64(F.col("_g"), 0, hash_fn).alias("_h"))
        )
        # the benchmark (broadcast-build) side dedups — it is tiny and the
        # smaller the broadcast the better; the TRAIN side must NOT: a
        # pre-join distinct would shuffle the whole corpus gram stream,
        # which is exactly what the broadcast join exists to avoid.  The
        # count_distinct aggregates below absorb duplicate (id, gram) rows
        # identically, and only post-filter (contaminated) grams shuffle.
        return out.distinct() if dedup else out

    tg = grams(train, "train_id", dedup=False)
    bg = grams(benchmark, "bench_id", dedup=True)
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    hits = tg.join(bg, on="_h")
    return hits.groupBy(F.col("train_id").alias(id_col)).agg(
        F.count_distinct(F.col("_h")).alias("n_shared_ngrams"),
        F.count_distinct(F.col("bench_id")).alias("n_benchmark_docs"),
    )


def hashed_bigram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: int = 13,
) -> DataFrame:
    """(id, bucket) rows — one per word-bigram occurrence (with
    multiplicity), bucket = md5-hash of the bigram mod ``n_buckets``.
    The shared feature extractor of DSIR weighting and LM perplexity."""
    from buildkite_logs_parquet_spark.operators.dedup import _fan_out, _hash64

    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _fan_out(df)
        .select(F.col(id_col), F.explode(bigrams).alias("_g"))
        .select(
            F.col(id_col),
            (_hash64(F.col("_g"), seed) % n_buckets).alias("_b"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: int = 13,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every raw
    document by how target-like its hashed word-bigram distribution is.

    ``weight(d) = Σ_g  ln( p̂_target(bucket(g)) / p̂_raw(bucket(g)) )``
    over the document's bigram occurrences (with multiplicity), where
    ``p̂`` are add-1-smoothed bucket frequencies.  High weight ⇒ the doc
    looks like the target domain; resampling by these weights is the DSIR
    selection step.

    100 TB shape: the only corpus-sized shuffles are keyed by bucket
    (bounded by ``n_buckets``) and by doc id.  The log-ratio lookup table
    is ``n_buckets`` rows — broadcast, so corpus grams join it with NO
    shuffle; the two totals are driver-collected scalars (metadata-sized,
    same pattern as ``mix_corpora``).

    Engine-exactness: each bucket's log-ratio is computed from exact
    integer-valued doubles (products < 2^53) with ONE division and ONE
    ``ln``, rounded to 9 decimals and summed in DECIMAL — so the per-doc
    sum is order-independent and cross-engine reproducible (the ``ln``
    itself is the only libm call, on bit-identical inputs).
    """
    def grams(df: DataFrame) -> DataFrame:
        return hashed_bigram_buckets(df, id_col, text_col, n_buckets, seed)

    # Both count tables are bounded by n_buckets rows (metadata-sized by
    # design), so they are COLLECTED once and the log-ratio LUT ships back
    # as a literal local table.  Round-3 ADVICE fix: the previous version
    # persisted rg/tcnt/rcnt and never unpersisted, leaking corpus-sized
    # cached blocks into long-lived sessions.  Cost of the trade: the raw
    # gram pipeline is evaluated twice (once for its counts, once in the
    # scoring join) — a narrow re-scan, vs. caching an entire gram stream.
    spark = raw.sparkSession
    t_rows = grams(target).groupBy("_b").agg(F.count("*").alias("_ct")).collect()
    r_rows = grams(raw).groupBy("_b").agg(F.count("*").alias("_cr")).collect()
    t_by = {r["_b"]: r["_ct"] for r in t_rows}
    t_total = sum(t_by.values())
    r_total = sum(r["_cr"] for r in r_rows)
    tb = float(t_total + n_buckets)
    rb = float(r_total + n_buckets)
    counts = spark.createDataFrame(
        [(r["_b"], r["_cr"], t_by.get(r["_b"])) for r in r_rows],
        "_b long, _cr long, _ct long",
    )
    llr = F.round(
        F.log(
            ((F.coalesce(F.col("_ct"), F.lit(0)) + 1).cast("double") * F.lit(rb))
            / ((F.col("_cr") + 1).cast("double") * F.lit(tb))
        ),
        9,
    ).cast("decimal(28,9)")
    lut = counts.select("_b", llr.alias("_llr"))
    scored = grams(raw).join(F.broadcast(lut), on="_b")
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_grams"), F.sum("_llr").alias("_w")
    )
    return (
        raw.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("_w"), F.lit(0).cast("decimal(38,9)"))
            .cast("string")
            .alias("dsir_logweight"),
        )
    )


def lm_perplexity(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_buckets: int = 65536,
    seed: int = 29,
    exact_sum: bool = False,
) -> DataFrame:
    """Per-document perplexity under a bucketed-bigram language model fit
    on ``reference`` — the CCNet-style perplexity signal (Wenzek et al.
    2020 bucket Common Crawl by the perplexity of a clean-corpus LM;
    low-perplexity ⇒ fluent/reference-like).

    Model: ``p(g) = (c_g + 1) / (T + B)`` over hashed bigram buckets with
    add-1 smoothing; ``nll = -mean_g ln p(g)``; ``ppl = exp(nll)``.
    Documents with no bigram get null nll/ppl (no evidence either way).

    ``exact_sum=True`` swaps the float mean for the oracle-grade form:
    each ``ln p`` rounded to 9 dp, decimal-summed (exact and
    order-independent, the ``dsir_weights`` discipline) and rendered as a
    scale-preserving string ``sum_logp9`` alongside ``n_grams`` — the
    registered correctness-gate shape.

    100 TB shape: identical to ``dsir_weights`` — the model is an
    ``n_buckets``-row broadcast LUT, the corpus gram stream joins it with
    no shuffle, and only the per-document aggregation shuffles (id +
    bucket-sized rows).  The reference-side counts are bucket-bounded
    (≤ ``n_buckets`` rows), so they are collected once — no persisted
    intermediate leaks into the session cache (round-3 ADVICE fix) and
    the model LUT ships as a literal local table.
    """
    spark = docs.sparkSession
    counts = (
        hashed_bigram_buckets(reference, id_col, text_col, n_buckets, seed)
        .groupBy("_b")
        .agg(F.count("*").alias("_c"))
        .collect()  # bucket-bounded: ≤ n_buckets rows, metadata-sized
    )
    total = sum(r["_c"] for r in counts)
    denom = float(total + n_buckets)
    lut = spark.createDataFrame(
        [(r["_b"], r["_c"]) for r in counts], "_b long, _c long"
    )
    # ln p for seen buckets comes from the count table; unseen buckets get
    # the smoothed floor at join time.  Both lns run engine-side on
    # bit-identical exact-integer-derived doubles (DETERMINISM.md §5).
    log_p_seen = F.log((F.col("_c") + 1).cast("double") / F.lit(denom))
    floor_lp = F.log(F.lit(1.0 / denom))
    dg = hashed_bigram_buckets(docs, id_col, text_col, n_buckets, seed)
    if exact_sum:
        # round+decimal-cast on the |buckets|-row LUT (and the constant
        # floor, which Catalyst folds), NOT per corpus gram row — the
        # gram-side work is one coalesce + a decimal sum.  round-then-
        # coalesce ≡ coalesce-then-round, so the oracle is unchanged.
        lp9 = F.round(log_p_seen, 9).cast("decimal(28,9)")
        floor9 = F.round(floor_lp, 9).cast("decimal(28,9)")
        scored9 = dg.join(
            F.broadcast(lut.select("_b", lp9.alias("_lp9"))),
            on="_b",
            how="left",
        ).select(F.col(id_col), F.coalesce(F.col("_lp9"), floor9).alias("_lp9"))
        per_doc = scored9.groupBy(id_col).agg(
            F.count("*").alias("n_grams"),
            F.sum("_lp9").alias("_s"),
        )
        return (
            docs.select(id_col)
            .join(per_doc, on=id_col, how="left")
            .select(
                id_col,
                F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
                F.coalesce(
                    F.col("_s"), F.lit(0).cast("decimal(38,9)")
                )
                .cast("string")
                .alias("sum_logp9"),
            )
        )
    scored = dg.join(
        F.broadcast(lut.select("_b", log_p_seen.alias("_lp"))),
        on="_b",
        how="left",
    ).select(F.col(id_col), F.coalesce(F.col("_lp"), floor_lp).alias("_lp"))
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        (-F.avg("_lp")).alias("nll"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round("nll", 6).alias("nll"),
            F.round(F.exp("nll"), 4).alias("perplexity"),
        )
    )


# ------------------------------------------------------ repetition metrics


def _words(text_col: str) -> Column:
    """Lowercased whitespace tokens; blank text → empty array (both engines
    split '' into [''], so empties are filtered on the exploded side)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Within-document repetition signals (Gopher §A1.1): for each doc,
    ``dup_token_ratio`` (fraction of tokens that are repeats of an earlier
    token), ``top_token_ratio`` (share of the most common token) and
    ``top_bigram_ratio`` (share of the most common bigram among the n-1
    bigrams; 0.0 for single-token docs).

    Plan: one explode per gram kind → count by (doc, gram) → per-doc max /
    distinct-count, rejoined on doc_id.  The shuffles are keyed by
    (doc_id, gram): horizontal, and the heavy side carries short grams, not
    documents.  High-repetition docs are exactly the skewed keys — but the
    skew is bounded by document length, not corpus size, so no salting is
    needed.
    """
    from buildkite_logs_parquet_spark.operators.dedup import _fan_out

    words = _fan_out(df.select(F.col(id_col), _words(text_col).alias("_ws")))

    tok = words.select(F.col(id_col), F.explode("_ws").alias("w")).where(
        F.col("w") != ""
    )
    tok_counts = tok.groupBy(id_col, "w").agg(F.count("*").alias("c"))
    tok_stats = tok_counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_unique_tokens"),
        F.max("c").alias("_top_tok"),
    )

    n = F.size(F.filter(F.col("_ws"), lambda w: w != ""))
    bigrams = words.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(F.col("_ws"), 1, F.greatest(n - 1, F.lit(0))),
                F.slice(F.col("_ws"), 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    )
    bg_counts = bigrams.groupBy(id_col, "bg").agg(F.count("*").alias("c"))
    bg_stats = bg_counts.groupBy(id_col).agg(
        F.sum("c").alias("_n_bg"), F.max("c").alias("_top_bg")
    )

    joined = tok_stats.join(bg_stats, on=id_col, how="left")
    denom = F.col("n_tokens").cast("double")
    return joined.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("n_unique_tokens"),
        F.round(
            (F.col("n_tokens") - F.col("n_unique_tokens")) / denom, round_to
        ).alias("dup_token_ratio"),
        F.round(F.col("_top_tok") / denom, round_to).alias("top_token_ratio"),
        F.round(
            F.coalesce(
                F.col("_top_bg") / F.col("_n_bg").cast("double"), F.lit(0.0)
            ),
            round_to,
        ).alias("top_bigram_ratio"),
    )


def compression_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    out_col: str = "compress_ratio",
    level: int = 6,
    round_to: int = 4,
) -> DataFrame:
    """zlib compression ratio per document — ``deflate(text)/len(text)``
    — the cheap information-density quality signal (low ratio = highly
    repetitive machine text, boilerplate, or spam; natural prose sits
    around 0.3-0.6).  Used alongside the explicit Gopher repetition
    metrics: DEFLATE's LZ77 window catches long-range and approximate
    repetition the exact token/bigram counters miss, at one pass over
    the bytes and no shuffle.

    Runs as an Arrow-batched scalar pandas UDF (the Unicode/zlib work is
    per-row C code; Arrow amortizes the transfer).  Deterministic for a
    fixed zlib level — but the exact bytes are library-defined, so this
    operator is golden-tested on ordering properties rather than
    SQL-oracled (DuckDB has no deflate surface).  Empty docs → null.

    100 TB shape: a narrow map over the scan, linear in input bytes;
    output adds one double column.
    """
    import zlib

    @pandas_udf("double")
    def _ratio(s):  # pd.Series -> pd.Series
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), round_to)

        return s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def _bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, v, w) word-bigram stream — the repetition_metrics shift-zip,
    shared by the KN trainer and scorer."""
    words = _words(text_col)
    n = F.size(words)
    return df.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("v"), b.alias("w")),
            )
        ).alias("g"),
    ).select(id_col, F.col("g.v").alias("v"), F.col("g.w").alias("w"))


def train_kn_bigram_lm(
    reference: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> dict:
    """Train an interpolated Kneser-Ney bigram LM (Kneser & Ney 1995;
    Chen & Goodman 1998) from a reference corpus — the model family
    behind the KenLM filters CCNet-class pipelines actually ship, here
    in its bigram form with a fixed discount.

    Everything derives from ONE corpus scan: the bigram count table
    ``c(v,w)``; per-context totals ``c(v)`` and distinct-successor
    counts ``N1+(v·)``; continuation counts ``N1+(·w)`` (distinct left
    contexts — the KN novelty: how many contexts a word CONTINUES, not
    how often it occurs); and the bigram-type total ``N1+(··)``.

    100 TB shape: the corpus shuffles once (bigram groupBy with
    map-side combine); every derived table is an aggregation OF the
    count table, which is bigram-type-bounded (Zipf — orders of
    magnitude below corpus size).  Only ``n_types`` (one row) reaches
    the driver.

    Returns ``{"bigram", "context", "continuation", "n_types"}`` for
    :func:`kn_score`.
    """
    from pyspark import StorageLevel

    bi = (
        _bigram_pairs(reference, id_col, text_col)
        .groupBy("v", "w")
        .agg(F.count("*").alias("c"))
        # round-11: the count table feeds FOUR consumers (ctx, cont, the
        # n_types probe right below and kn_score's bigram join) — without
        # a persist each one re-runs the corpus bigram explode + groupBy.
        # Bigram-type-bounded rows (Zipf), so the cache is tiny relative
        # to the corpus; the n_types count materializes it.  Callers own
        # cache hygiene after materializing (set_similarity_join
        # contract).
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ctx = bi.groupBy("v").agg(
        F.sum("c").alias("cv"), F.count("*").alias("n1v")
    )
    cont = bi.groupBy("w").agg(F.count("*").alias("n1w"))
    n_types = bi.count()
    return {"bigram": bi, "context": ctx, "continuation": cont, "n_types": n_types}


def kn_score(
    docs: DataFrame,
    model: dict,
    id_col: str,
    text_col: str = "text",
    discount: str = "0.75",
    round_to: int = 9,
) -> DataFrame:
    """Per-document log-probability under the interpolated-KN bigram
    model: ``p(w|v) = max(c(vw)−D,0)/c(v) + λ(v)·P_cont(w)`` with
    ``λ(v) = D·N1+(v·)/c(v)`` and ``P_cont(w) = N1+(·w)/N1+(··)``;
    unseen context backs off to ``P_cont(w)``, unseen word to the
    ``1/(2·N1+(··))`` floor.

    Determinism (the lm_perplexity discipline): every ratio is a
    DECIMAL division of exact integers rounded to ``round_to`` dp,
    the interpolation product is exact decimal arithmetic re-rounded,
    and only then does ``ln`` run — on bit-identical decimal-derived
    doubles — with the per-gram 9-dp rounding decimal-summed, so the
    result is order-independent and engine-exact.

    Output: ``(id, n_grams, kn_sum_logp9 string)``; docs with no
    bigram emit no row (left-join on ids to keep them).

    100 TB shape: the gram stream joins count tables keyed by (v,w) /
    v / w — the heavy join side carries short grams; the model tables
    are type-bounded.  Per-doc aggregation shuffles by id.
    """
    D = F.lit(discount).cast("decimal(10,4)")
    dg = _bigram_pairs(docs, id_col, text_col)
    n_types = int(model["n_types"])
    scored = (
        dg.join(model["bigram"], on=["v", "w"], how="left")
        .join(model["context"], on="v", how="left")
        .join(model["continuation"], on="w", how="left")
    )
    # operands stay at precision 18 so decimal PRODUCTS fit in Spark's
    # 38-digit budget exactly (38,9 x 38,9 would overflow and silently
    # truncate scale — measured as a 7th-decimal drift vs the exact twin)
    dec = f"decimal(18,{round_to})"
    # every ratio is one division with precision-18 operands: result
    # precision <= 38, so Spark keeps >= 19 exact fractional digits and
    # the 9-dp round sees the true quotient (at (38,0) the division
    # overflows precision and Spark silently truncates the result scale
    # to SIX digits — measured as a 1e-6 drift vs the exact twin)
    def _i18(c):
        return c.cast("decimal(18,0)")

    pcont = F.round(
        _i18(F.col("n1w")) / F.lit(n_types).cast("decimal(18,0)"), round_to
    ).cast(dec)
    floor = F.round(
        F.lit(1).cast("decimal(18,0)")
        / F.lit(2 * n_types).cast("decimal(18,0)"),
        round_to,
    ).cast(dec)
    pc = F.coalesce(pcont, floor)
    term1 = F.round(
        (F.col("c").cast("decimal(19,4)") - D).cast("decimal(18,4)")
        / _i18(F.col("cv")),
        round_to,
    ).cast(dec)
    lam = F.round(
        (D * _i18(F.col("n1v"))).cast("decimal(18,4)") / _i18(F.col("cv")),
        round_to,
    ).cast(dec)
    p = (
        F.when(
            F.col("cv").isNull(), pc  # unseen context: pure continuation
        )
        .when(
            F.col("c").isNotNull(),
            F.round((term1 + lam * pc).cast("decimal(38,18)"), round_to).cast(dec),
        )
        .otherwise(
            F.round((lam * pc).cast("decimal(38,18)"), round_to).cast(dec)
        )
    )
    lp9 = F.round(F.log(p.cast("double")), round_to).cast(f"decimal(28,{round_to})")
    return (
        scored.select(F.col(id_col), lp9.alias("_lp9"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("_lp9").alias("_s"),
        )
        .select(
            id_col,
            "n_grams",
            F.col("_s").cast("string").alias("kn_sum_logp9"),
        )
    )


# -------------------------------------------------------- corpus mixing


def mix_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-source keep rates realizing the target mixture ``weights`` at
    the maximal achievable corpus size: the binding source (smallest
    count/weight ratio) is kept whole and every other source is
    downsampled to match.  Pure float arithmetic on (counts, weights) —
    the oracle replays the identical expressions in SQL."""
    total = sum(weights.values())
    norm = {s: w / total for s, w in weights.items() if w > 0}
    present = [s for s in norm if s in counts]
    if not present:
        return {}
    scale = min(counts[s] / norm[s] for s in present)
    return {s: min(1.0, scale * norm[s] / counts[s]) for s in present}


def temperature_weights(counts: dict[str, float], alpha: float) -> dict[str, float]:
    """Temperature-based mixture weights (the multilingual-sampling recipe
    of Conneau & Lample 2019 / mT5): target share q_i ∝ p_i^alpha where
    p_i is the source's NATURAL share of the corpus.  ``alpha=1`` keeps
    natural proportions; ``alpha → 0`` approaches uniform — upsampling
    low-resource sources without hand-tuning per-source weights.  Pure
    driver-side float arithmetic on the metadata-sized count dict."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    total = sum(counts.values()) or 1.0
    qs = {s: (c / total) ** alpha for s, c in counts.items() if c > 0}
    z = sum(qs.values()) or 1.0
    return {s: q / z for s, q in qs.items()}


def doremi_weights(
    scored: DataFrame,
    domain_col: str,
    loss_col: str,
    ref_loss_col: str | None = None,
    n_iter: int = 10,
    eta: float = 1.0,
    smoothing: float = 1e-3,
) -> dict[str, float]:
    """DoReMi-style domain mixture reweighting (Xie et al. 2023,
    arXiv:2305.10429 — Group-DRO over domains), the DATA-ENGINE side:
    given per-example proxy-model losses (and optionally per-example
    reference losses), run the exponentiated-gradient outer loop that
    upweights domains with high EXCESS loss and return the learned
    mixture ``{domain: weight}`` — feed it to :func:`mix_corpora` (or
    :func:`weighted_sample`) to materialize the reweighted corpus.

    Full DoReMi alternates proxy-model training steps with this
    reweighting; with a fixed scoring pass (how a lake engine consumes
    it — losses land as a column, the trainer lives elsewhere) the
    per-domain statistics are constant across rounds, so the loop
    needs exactly ONE distributed aggregate: per-domain decimal sums of
    the clipped excess loss on the 9-dp grid (rule 5 — the mean is
    layout- and partition-order-independent) plus counts.  Driver state
    is |domains| floats; the EG updates
    ``α_d ← α_d · exp(η · L̄_d)`` with per-round normalization and
    uniform smoothing ``(1−c)·α + c/k`` run driver-side in
    deterministic sequential order (pytest pins a pure-Python twin
    exactly, not within a tolerance).

    100 TB shape: one domain-keyed partial-aggregated groupBy over the
    scored pool; nothing else touches the cluster.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    excess = F.col(loss_col) - (
        F.col(ref_loss_col) if ref_loss_col else F.lit(0.0)
    )
    stats = (
        scored.where(F.col(loss_col).isNotNull())
        .select(
            F.col(domain_col).alias("_d"),
            F.round(F.greatest(excess, F.lit(0.0)), 9)
            .cast("decimal(28,9)")
            .alias("_x"),
        )
        .groupBy("_d")
        .agg(F.sum("_x").alias("_sx"), F.count("*").alias("_n"))
        .collect()
    )
    if not stats:
        return {}
    mean_excess = {
        r["_d"]: float(r["_sx"]) / int(r["_n"]) for r in sorted(
            stats, key=lambda r: str(r["_d"])
        )
    }
    k = len(mean_excess)
    alpha = {d: 1.0 / k for d in mean_excess}
    for _ in range(int(n_iter)):
        upd = {d: alpha[d] * math.exp(eta * mean_excess[d]) for d in alpha}
        z = sum(upd.values())
        alpha = {
            d: (1.0 - smoothing) * (v / z) + smoothing / k
            for d, v in upd.items()
        }
    return alpha


def mix_corpora(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    by: str = "docs",
    text_col: str = "text",
    temperature: float | None = None,
) -> DataFrame:
    """Deterministic weighted corpus mixing: sample each source so the
    output approximates the target ``weights`` mixture at the largest
    size the corpus supports (sources with weight 0 / absent from
    ``weights`` are dropped).

    The 100 TB shape: per-source counts are a metadata-cheap aggregate
    collected driver-side (one tiny job); the mix itself is then a single
    narrow content-hash predicate via ``sample_stratified`` — no shuffle,
    no window, composes with scan pruning.  An exact-count variant would
    need a per-source global rank (a sort per source — the largest source
    becomes one giant ordered partition); the hash-threshold form trades
    ±binomial-noise counts for a fully parallel plan, and stays
    layout-independent and reproducible.

    ``by="tokens"`` interprets the weights over TOKEN mass instead of
    document count — what a training-mixture spec actually means when
    sources have very different document lengths (a 4:1 doc mix of
    long-form web text vs. short chat turns is nowhere near 4:1 in
    tokens).  Same plan: only the metadata-sized per-source aggregate
    changes (Σ token_count instead of count); the keep-rate still applies
    per document, and since the hash is independent of document length,
    the kept token mass per source converges to rate × source tokens.
    """
    if by == "tokens":
        from buildkite_logs_parquet_spark.operators.text_analysis import (
            token_count,
        )

        mass = F.sum(token_count(F.col(text_col)).cast("long"))
    elif by == "docs":
        mass = F.count("*")
    else:
        raise ValueError(f"by must be 'docs' or 'tokens', got {by!r}")
    if (weights is None) == (temperature is None):
        raise ValueError("pass exactly one of weights / temperature")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(mass.alias("c")).collect()
    }
    if temperature is not None:
        weights = temperature_weights(counts, temperature)
    rates = mix_rates(counts, weights)
    return sample_stratified(
        df, key_col, source_col, rates, default_rate=0.0, seed=seed
    )


# ------------------------------------------------------ training-order shuffle


def corpus_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 42,
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training-data export: order rows
    by a content hash of ``(seed, key)`` — a pseudo-random permutation of
    the corpus that is identical across runs, engines, and physical
    layouts.  ``df.orderBy(rand())`` is neither (per-partition RNG), and
    an unshuffled corpus trains on its crawl/source order.

    100 TB shape: ONE range-partitioned sort on a uniform 32-bit hash key
    (Spark plans ``orderBy`` as range partitioning + in-partition sort,
    and uniform keys make the ranges skew-free by construction).  With
    ``n_shards`` the output is exactly that many balanced files whose
    concatenation in shard order IS the permutation — the shard layout a
    training loader consumes.  Change ``seed`` per epoch for a fresh
    permutation.

    Adds ``shuffle_key`` so downstream stages can verify or resume the
    order; ties (hash collisions) break on the key column itself, keeping
    the permutation total.
    """
    key = hash_bucket(F.col(key_col), seed)
    out = df.withColumn("shuffle_key", key)
    if n_shards is not None:
        return out.repartitionByRange(
            int(n_shards), F.col("shuffle_key"), F.col(key_col)
        ).sortWithinPartitions("shuffle_key", key_col)
    return out.orderBy("shuffle_key", key_col)


def quantile_threshold_filter(
    df: DataFrame,
    score_col: str,
    group_col: str,
    q: float = 0.5,
    keep: str = "above",
    exact: bool = True,
    rel_error: float = 0.001,
) -> DataFrame:
    """Per-group dynamic score cutoff: flag rows that clear their OWN
    group's ``q``-quantile of ``score_col`` — the domain/language-
    balanced form of quality filtering (one global cutoff over-prunes
    low-resource groups whose score distribution sits lower; per-group
    quantiles prune the same *fraction* everywhere).

    Returns the input plus ``threshold`` (the group's quantile) and
    ``kept`` (``score >= threshold`` for ``keep="above"``, ``<=`` for
    ``"below"``); callers filter on ``kept``.  Flag-not-filter keeps the
    decision auditable, the same discipline as ``gopher_quality_filter``.

    100 TB shape: thresholds are ONE per-group aggregate — |groups| rows
    — broadcast back onto the corpus, so the corpus itself never
    shuffles.  ``exact=True`` uses sort-based ``percentile`` (engine-
    exact, matches DuckDB ``quantile_cont`` interpolation — the oracle
    gate); at extreme per-group cardinality set ``exact=False`` for the
    mergeable ``percentile_approx`` sketch (bounded memory, rank error
    ≤ ``rel_error``).
    """
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    s = F.col(score_col).cast("double")
    agg = (
        F.percentile(s, F.lit(float(q)))
        if exact
        else F.percentile_approx(s, F.lit(float(q)), F.lit(int(1.0 / rel_error)))
    )
    thresholds = df.groupBy(group_col).agg(agg.alias("threshold")).select(
        F.col(group_col).alias("_qt_group"), "threshold"
    )
    # null-safe equality so a NULL group matches its own threshold row
    # instead of silently passing everything
    joined = df.join(
        F.broadcast(thresholds),
        on=F.col(group_col).eqNullSafe(F.col("_qt_group")),
        how="left",
    ).drop("_qt_group")
    cond = s >= F.col("threshold") if keep == "above" else s <= F.col("threshold")
    return joined.withColumn("kept", F.coalesce(cond, F.lit(True)))


def blocklist_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: list[str],
    mode: str = "word",
) -> DataFrame:
    """C4-style blocklist filtering: flag documents containing banned
    terms, keeping the hit count for auditing (flag-not-filter, the
    ``gopher_quality_filter`` discipline).

    ``mode="word"`` matches whole lowercased whitespace tokens — the C4
    recipe; ``mode="substring"`` counts raw substring occurrences via one
    escaped regex alternation (catches concatenations at a higher
    false-positive rate).  Adds ``n_blocklist_hits`` and ``blocked``.

    100 TB shape: word mode filters the token explode by the LITERAL
    term set BEFORE the per-doc count aggregate — only matching tokens
    ever shuffle (the bm25 discipline; blocklists are thousands of
    terms, corpora are billions of tokens); substring mode is a narrow
    regex count, zero shuffle.
    """
    import re as _re

    terms = sorted({t.lower() for t in blocklist})
    if not terms:
        raise ValueError("blocklist_filter needs at least one term")
    if mode == "word":
        tokens = df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("_t"),
        ).where(F.col("_t").isin(terms))
        hits = tokens.groupBy(id_col).agg(
            F.count("*").alias("n_blocklist_hits")
        )
        out = (
            df.join(hits, on=id_col, how="left")
            .na.fill({"n_blocklist_hits": 0})
        )
    elif mode == "substring":
        pat = "|".join(_re.escape(t) for t in terms)
        out = df.withColumn(
            "n_blocklist_hits",
            F.regexp_count(F.lower(F.col(text_col)), F.lit(pat)).cast("long"),
        )
    else:
        raise ValueError(f"mode must be 'word' or 'substring', got {mode!r}")
    return out.withColumn("blocked", F.col("n_blocklist_hits") > 0)


def ccnet_buckets(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str = "text",
    group_col: str | None = None,
    cut_lo: float = 1.0 / 3.0,
    cut_hi: float = 2.0 / 3.0,
    tercile_mode: str = "interpolate",
    **lm_kwargs,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score every
    document's perplexity under the ``reference``-fit LM, then bucket by
    per-``group_col`` (language) quantiles — 'head' is the most
    reference-like third of EACH group, so low-resource languages are
    never starved by a global cutoff (the same argument as
    ``quantile_threshold_filter``).

    Pure composition: ``lm_perplexity(exact_sum=True)`` (broadcast-LUT
    scoring, engine-exact decimal Σ ln p) → per-group exact percentile
    thresholds (a |groups|-row aggregate, broadcast back) → label.  The
    per-doc score is ``nll = −(Σ ln p)/n_grams`` derived from the
    decimal sum with one division — deterministic, so bucket boundaries
    are oracle-checkable.  Documents with no bigram land in 'unscored'.

    ``tercile_mode``: ``"interpolate"`` (default) uses the exact
    interpolated percentile — the statistically conventional choice, but
    the interpolation's interior float arithmetic is ENGINE-SENSITIVE
    (DuckDB's quantile_cont formula changed across releases; a boundary
    sitting 1 ulp differently can flip a tied document's bucket).
    ``"rank"`` selects the DATA ELEMENT at 0-indexed rank
    ``floor((n−1)·cut)`` per group (type-1 lower quantile, cuts fixed at
    1/3 and 2/3): pure integer rank math over deterministic doubles, so
    the boundary is bit-identical on any engine — the mode the oracle
    gate runs.  Rank mode is also the scale path: a row_number window +
    rank filter (two bounded shuffles) instead of a percentile sort
    aggregate.

    Returns ``(id, [group], n_grams, sum_logp9, nll, ppl_bucket)``.
    """
    scored = lm_perplexity(
        docs, reference, id_col, text_col, exact_sum=True, **lm_kwargs
    )
    keep = [id_col] + ([group_col] if group_col else [])
    base = docs.select(*keep).join(scored, on=id_col)
    # guard n_grams = 0: a bare double division would produce NaN, which
    # compares false everywhere and would silently land in 'tail'
    nll = F.when(
        F.col("n_grams") > 0,
        -(F.col("sum_logp9").cast("decimal(38,9)").cast("double"))
        / F.col("n_grams"),
    )
    base = base.withColumn("nll", nll)
    if tercile_mode == "rank":
        from pyspark.sql import Window

        if (cut_lo, cut_hi) != (1.0 / 3.0, 2.0 / 3.0):
            raise ValueError(
                "tercile_mode='rank' implements the fixed 1/3 / 2/3 cuts"
            )
        # rank mode lives on an integer grid END TO END: nll9 is the
        # half-up 9-dp fixed-point of Σln p / n_grams, derived from the
        # sum_logp9 STRING by digit extraction (translate drops the dot →
        # the scale-9 integer; sums here fit a long with 5 decimal digits
        # to spare at 2^63), never through a decimal→double cast whose
        # rounding path is engine-implementation-specific.  Ranking,
        # boundary selection, and the bucket comparisons all run on nll9,
        # so the whole split is integer arithmetic on any engine.
        base = base.withColumn(
            "nll9",
            F.when(
                F.col("n_grams") > 0,
                F.expr(
                    "((0 - cast(translate(sum_logp9, '.', '') as bigint))"
                    " * 2 + n_grams) div (2 * n_grams)"
                ),
            ),
        )
        gcols = [group_col] if group_col else []
        scored_nn = base.where(F.col("nll9").isNotNull()).select(
            *gcols, "nll9"
        )
        w = Window.partitionBy(*gcols).orderBy("nll9")
        cw = Window.partitionBy(*gcols)
        ranked = scored_nn.withColumn(
            "_r", F.row_number().over(w) - 1
        ).withColumn("_n", F.count("*").over(cw))
        th = (
            ranked.withColumn(
                "_is_lo", F.col("_r") == F.expr("(_n - 1) div 3")
            )
            .withColumn(
                "_is_hi", F.col("_r") == F.expr("(2 * (_n - 1)) div 3")
            )
            .where(F.col("_is_lo") | F.col("_is_hi"))
            .groupBy(*gcols)
            .agg(
                F.max(F.when(F.col("_is_lo"), F.col("nll9"))).alias("_t_lo"),
                F.max(F.when(F.col("_is_hi"), F.col("nll9"))).alias("_t_hi"),
            )
        )
        if not group_col:
            th = th.select("_t_lo", "_t_hi")
    elif tercile_mode == "interpolate":
        gb = base.groupBy(group_col) if group_col else base.groupBy()
        th = gb.agg(
            F.percentile("nll", F.lit(float(cut_lo))).alias("_t_lo"),
            F.percentile("nll", F.lit(float(cut_hi))).alias("_t_hi"),
        )
    else:
        raise ValueError(f"unknown tercile_mode: {tercile_mode!r}")
    if group_col:
        th = th.select(F.col(group_col).alias("_qg"), "_t_lo", "_t_hi")
        joined = base.join(
            F.broadcast(th), on=F.col(group_col).eqNullSafe(F.col("_qg")), how="left"
        ).drop("_qg")
    else:
        joined = base.crossJoin(F.broadcast(th))  # 1-row threshold table
    score = F.col("nll9") if tercile_mode == "rank" else F.col("nll")
    bucket = (
        F.when(score.isNull(), F.lit("unscored"))
        .when(score <= F.col("_t_lo"), F.lit("head"))
        .when(score <= F.col("_t_hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.withColumn("ppl_bucket", bucket).drop("_t_lo", "_t_hi")


def curriculum_order(
    df: DataFrame,
    key_col: str,
    score_col: str,
    n_buckets: int = 10,
    seed: int = 41,
) -> DataFrame:
    """Curriculum ordering: rank documents by ``score_col`` (ascending —
    "easiest first" when the score is a difficulty proxy like length or
    perplexity), cut the ranking into ``n_buckets`` equal-count stages,
    and shuffle WITHIN each stage by content hash — the standard
    curriculum-learning layout (stage-wise progression, randomized
    within stage so no spurious secondary ordering leaks into training).

    Returns ``(key, bucket, shuffle_key)``; the training order is
    ``ORDER BY (bucket, shuffle_key, key)`` — apply with
    ``corpus_shuffle``'s range-partitioned sort or feed straight into
    ``packing.write_training_shards``.

    Determinism: the stage cut is pure integer rank math —
    ``bucket = (rank · n_buckets) div N`` over the 0-based rank under
    the TOTAL order ``(score, key)`` (rule 6: ties break on the key, so
    equal scores cannot flip buckets across engines) — and the in-stage
    key is rule-2 ``hash_bucket``.  No quantile interpolation anywhere
    (rule 13).  Scale shape: the global rank comes from
    ``packing.with_global_offsets`` (range-partitioned partial sums, no
    single-task window); everything else is a narrow map.
    """
    from buildkite_logs_parquet_spark.operators.packing import (
        with_global_offsets,
    )

    n = df.count()  # driver scalar: corpus size (footer-cheap on parquet)
    if n == 0:
        # schema-faithful empty result: the caller's key column with its
        # REAL name and type, not a hardcoded placeholder
        return df.select(
            F.col(key_col),
            F.lit(0).cast("int").alias("bucket"),
            F.lit(0).cast("long").alias("shuffle_key"),
        ).limit(0)
    ranked = with_global_offsets(
        df.select(
            F.col(key_col),
            F.struct(
                F.col(score_col).alias("s"), F.col(key_col).alias("k")
            ).alias("_ord"),
        ).withColumn("_one", F.lit(1).cast("long")),
        order_col="_ord",
        weight_col="_one",
        out_col="_rank",
    )
    return ranked.select(
        F.col(key_col),
        F.expr(f"cast((_rank * {int(n_buckets)}) div {n} as int)").alias(
            "bucket"
        ),
        hash_bucket(F.col(key_col), seed).alias("shuffle_key"),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    seed: int = 42,
    round_to: int = 12,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    keep the ``n`` rows with the largest ``ln(u)/w`` where ``u`` is a
    content-hash uniform in (0, 1] and ``w = weight_col > 0`` — the
    log-domain form of the classic ``u^(1/w)`` key (same ranking, no
    ``pow`` whose libm varies across engines).

    Inclusion probabilities follow the weights exactly as in the A-ES
    paper, and the chosen SET is a pure content function of
    ``(seed, key)``: reproducible across runs, engines, and physical
    layouts — ``df.sample`` and ``rand()``-keyed top-n are neither.
    This is the primitive behind quality-weighted corpus selection
    ("sample 10M docs proportional to quality score").

    Plan shape: one scan with a narrow key expression, then top-n via
    TakeOrderedAndProject (per-partition heads merged on the driver's
    single final partition) — no global sort, no shuffle of the corpus.
    Rows with non-positive weight are excluded (they have probability 0
    in A-ES).  The key is rounded (rule 4, DETERMINISM.md) and ties
    break on ``key_col``; the selection key survives as ``es_key`` for
    audit.
    """
    u = (hash_bucket(F.col(key_col), seed) + 1).cast("double") / F.lit(
        float(_BUCKETS)
    )
    k = F.round(F.log(u) / F.col(weight_col).cast("double"), round_to)
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn("es_key", k)
        .orderBy(F.col("es_key").desc(), F.col(key_col))
        .limit(n)
    )


def domain_token_budget(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    order_col: str,
) -> DataFrame:
    """Cap each key's (domain's, source's) contribution to the corpus at
    ``budget`` tokens — the standard diversity / anti-spam rule in
    dataset construction ("at most N tokens per domain").

    Prefix-sum admission: rows are ordered by ``order_col`` (must be a
    total order within a key for determinism — rule 6) and a row is
    admitted iff the INCLUSIVE running token total is still within
    budget.  The running sum counts every prior row, admitted or not, so
    the rule is a pure function of the ordered prefix — engine- and
    layout-independent, and exactly the rule the streaming twin
    (``streaming.follow.stream_token_budget``) applies across batches.

    Plan: one key-partitioned window — the single shuffle is keyed by
    ``key_col``; skewed keys (one giant domain) are exactly the rows the
    budget discards, and AQE skew splitting handles the window's sort.
    Returns all rows with ``cum_tokens`` and ``admitted``; filter
    ``admitted`` to apply the cap.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(token_col).cast("long")).over(w)
    return df.withColumn("cum_tokens", run).withColumn(
        "admitted", F.col("cum_tokens") <= F.lit(int(budget))
    )


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    respect_crawl_delay: bool = True,
) -> DataFrame:
    """Robots.txt compliance audit: for every URL, whether ``agent`` may
    fetch it under its domain's robots.txt — the crawl-politeness filter
    every responsible corpus pipeline applies before (or when auditing)
    ingestion.

    ``robots`` is ``(domain, robots_txt)`` — the at-rest table a crawler
    maintains.  The join is a plain shuffle equi-join on domain (the
    robots side is per-domain small but the DOMAIN COUNT is web-scale,
    so no broadcast by default); parsing uses the stdlib
    ``urllib.robotparser`` inside an Arrow-batched ``mapInPandas``,
    with a per-batch parser cache so each domain's rules compile once
    per batch rather than once per URL.  URLs whose domain has no
    robots row are ALLOWED (the crawl convention: no robots.txt means
    no restrictions).

    Output: the URL rows + ``domain``, ``allowed`` boolean, and
    ``crawl_delay`` (seconds, null when unspecified or disabled).
    """
    from collections.abc import Iterator as _Iterator

    dom = F.lower(
        F.regexp_extract(F.col(url_col), r"https?://([^/\s:?#]+)", 1)
    )
    keyed = urls.withColumn("domain", dom)
    joined = keyed.join(robots, on="domain", how="left")

    def run(batches: _Iterator) -> _Iterator:
        import urllib.robotparser

        import pandas as pd

        for pdf in batches:
            parsers: dict[str, object] = {}
            allowed = []
            delays = []
            for url, txt in zip(pdf[url_col], pdf["robots_txt"]):
                if txt is None or not isinstance(txt, str):
                    allowed.append(True)
                    delays.append(None)
                    continue
                rp = parsers.get(txt)
                if rp is None:
                    rp = urllib.robotparser.RobotFileParser()
                    rp.parse(txt.splitlines())
                    parsers[txt] = rp
                allowed.append(bool(rp.can_fetch(agent, url)))
                if respect_crawl_delay:
                    d = rp.crawl_delay(agent)
                    delays.append(float(d) if d is not None else None)
                else:
                    delays.append(None)
            out = pdf.drop(columns=["robots_txt"])
            out["allowed"] = pd.Series(allowed, dtype="boolean")
            out["crawl_delay"] = pd.Series(delays, dtype="float64")
            yield out

    fields = [
        f for f in joined.schema.fields if f.name != "robots_txt"
    ]
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
        + ", allowed boolean, crawl_delay double"
    )
    return joined.mapInPandas(run, schema)


def strip_domain_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    domain_col: str,
    min_docs: int = 5,
    max_ratio: float = 0.5,
) -> DataFrame:
    """Remove per-domain BOILERPLATE lines — navigation, footers, cookie
    banners: lines that repeat across a large fraction of one site's
    pages (the CCNet/RefinedWeb line-level dedup recipe, scoped to the
    domain so a phrase that is boilerplate on one site survives as
    content on another).

    A line is boilerplate in domain D when D has at least ``min_docs``
    documents and the line occurs in more than ``max_ratio`` of them
    (distinct-document frequency, so a line repeated inside ONE page
    is repetition, not boilerplate — ``repetition_metrics`` owns that).
    The ratio decides on integers (``n_docs_with_line · 10^6 >
    ratio6 · n_docs``) so the kept set can't flip on a float ulp.

    Scale shape (the ``segment_dedup`` discipline): lines travel the
    frequency aggregate as rule-3 64-bit hashes — the (domain, line)
    shuffle is text-free; the only text movement is the per-document
    rebuild, a position-ordered ``array_join`` over each doc's own
    lines.  Output: ``(id, text, n_lines, n_removed)`` with ``text``
    rebuilt minus boilerplate lines (original newline structure within
    kept lines preserved).
    """
    if not (0.0 < max_ratio < 1.0):
        raise ValueError("max_ratio must be in (0, 1)")
    r6 = int(round(max_ratio * 1_000_000))
    lines = df.select(
        F.col(id_col),
        F.col(domain_col).alias("_dom"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn(
        "_h",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("bp:"), F.col("_line"))), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    dom_docs = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count("*").alias("_nd")
    )
    line_docs = (
        lines.select("_dom", "_h", id_col)
        .distinct()
        .groupBy("_dom", "_h")
        .agg(F.count("*").alias("_nl"))
    )
    bp = (
        line_docs.join(dom_docs, "_dom")
        .where(
            (F.col("_nd") >= int(min_docs))
            & (F.col("_nl") * 1_000_000 > F.lit(r6) * F.col("_nd"))
        )
        .select("_dom", "_h")
    )
    # drop boilerplate occurrences by (domain, line-hash) semi/anti —
    # USING-style name joins, never expression equality against a
    # self-derived frame (ambiguous attribute ids)
    kept = lines.join(bp, ["_dom", "_h"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", F.col("_line")))
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").alias("_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_kept"), F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
