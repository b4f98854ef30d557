"""Corpus-curation operators: deterministic sampling, Gopher-style quality
filtering, within-document repetition metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.curation import (
    curriculum_order,
    gopher_quality_filter,
    hash_bucket,
    repetition_metrics,
    sample_deterministic,
    sample_stratified,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_sample_deterministic_is_reproducible_and_layout_independent(spark):
    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"] for r in sample_deterministic(df, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in sample_deterministic(df, "doc_id", 0.3).collect()}
    assert a == b
    # layout independence: a different partitioning selects the SAME rows
    # (the property df.sample cannot give)
    c = {
        r["doc_id"]
        for r in sample_deterministic(
            df.repartition(17, "doc_id"), "doc_id", 0.3
        ).collect()
    }
    assert a == c
    # rate is approximately honored (md5 buckets are uniform)
    assert 0.25 < len(a) / 10_000 < 0.35


def test_sample_deterministic_is_a_subset_lattice(spark):
    """Lower rates select subsets of higher rates (same seed): thresholds
    nest, so a 10% sample is contained in the 30% sample — the property
    that makes staged downsampling consistent across pipeline versions."""
    df = spark.range(5_000).select(F.col("id").alias("doc_id"))
    small = {r["doc_id"] for r in sample_deterministic(df, "doc_id", 0.1).collect()}
    large = {r["doc_id"] for r in sample_deterministic(df, "doc_id", 0.3).collect()}
    assert small < large


def test_sample_stratified_respects_per_stratum_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "de", f"doc {i}") for i in range(8_000)]
    df = _docs(spark, rows)
    out = sample_stratified(
        df, "doc_id", "lang", {"en": 0.1, "de": 1.0}, default_rate=0.0
    )
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["de"] == 4_000  # rate 1.0 keeps everything
    assert 250 < counts["en"] < 550  # ~10% of 4,000


def test_sample_stratified_default_rate_drops_unlisted_strata(spark):
    rows = [(i, ["en", "fr", "zh"][i % 3], "x") for i in range(300)]
    out = sample_stratified(
        _docs(spark, rows), "doc_id", "lang", {"en": 1.0}, default_rate=0.0
    )
    assert {r["lang"] for r in out.select("lang").distinct().collect()} == {"en"}


def test_hash_bucket_range(spark):
    df = spark.range(1_000).select(
        hash_bucket(F.col("id"), seed=7).alias("b")
    )
    mn, mx = df.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx < (1 << 32)


def test_gopher_filter_reasons(spark):
    rows = [
        # passes every rule
        (0, "en", "the quick brown fox jumps over the lazy dog and runs to it"),
        # too few tokens + no stopword
        (1, "en", "short text here"),
        # symbol-heavy (and stopword present so only one reason)
        (2, "en", "the $$ %% @@ !! ## && ** (( )) ;; :: '' \"\" ^^ ~~ ||"),
        # mean token length high: 12-char tokens, stopword 'the' present
        (3, "en", "the abcdefghijkl abcdefghijkl abcdefghijkl abcdefghijkl "
                  "abcdefghijkl abcdefghijkl abcdefghijkl abcdefghijkl abcdefghijkl"),
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_filter(_docs(spark, rows)).collect()
    }
    assert out[0]["passes"] and out[0]["fail_reasons"] == ""
    assert not out[1]["passes"]
    assert set(out[1]["fail_reasons"].split(",")) == {
        "too_few_tokens",
        "no_stopword",
    }
    assert "symbol_heavy" in out[2]["fail_reasons"]
    assert out[3]["fail_reasons"] == "mean_token_len_high"
    # reasons are in fixed rule order (auditable, hash-stable)
    assert out[1]["fail_reasons"] == "too_few_tokens,no_stopword"


def test_gopher_filter_params_override(spark):
    rows = [(0, "en", "the cat is on the mat")]
    strict = gopher_quality_filter(
        _docs(spark, rows), params={"min_tokens": 50}
    ).first()
    assert "too_few_tokens" in strict["fail_reasons"]


def test_repetition_metrics_hand_computed(spark):
    rows = [
        (0, "en", "a a a b"),
        (1, "en", "x y z w"),
        (2, "en", "solo"),
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_metrics(_docs(spark, rows), "doc_id").collect()
    }
    d0 = out[0]
    assert d0["n_tokens"] == 4 and d0["n_unique_tokens"] == 2
    assert d0["dup_token_ratio"] == 0.5
    assert d0["top_token_ratio"] == 0.75
    # bigrams: "a a", "a a", "a b" → top share 2/3
    assert d0["top_bigram_ratio"] == 0.6667
    d1 = out[1]
    assert d1["dup_token_ratio"] == 0.0 and d1["top_bigram_ratio"] == 0.3333
    d2 = out[2]  # single token: no bigrams → ratio 0.0
    assert d2["n_tokens"] == 1 and d2["top_bigram_ratio"] == 0.0


def test_repetition_metrics_case_fold(spark):
    rows = [(0, "en", "The THE the")]
    r = repetition_metrics(_docs(spark, rows), "doc_id").first()
    assert r["n_unique_tokens"] == 1 and r["dup_token_ratio"] == 0.6667


def test_benchmark_contamination_hand_computed(spark):
    train = _docs(
        spark,
        [
            (0, "en", "the secret benchmark answer is fortytwo"),
            (1, "en", "completely unrelated training text here"),
            (2, "en", "another doc with the secret benchmark answer inside"),
        ],
    )
    bench = _docs(spark, [(100, "en", "secret benchmark answer")])
    from buildkite_logs_parquet_spark.operators.curation import (
        benchmark_contamination,
    )

    out = {
        r["doc_id"]: r
        for r in benchmark_contamination(train, bench, "doc_id", k=13).collect()
    }
    # doc 1 shares no 13-gram with the benchmark → absent
    assert set(out) == {0, 2}
    # "secret benchmark answer" (23 chars) has 11 distinct 13-grams, all
    # present verbatim in docs 0 and 2
    assert out[0]["n_shared_ngrams"] == 11
    assert out[2]["n_shared_ngrams"] == 11
    assert out[0]["n_benchmark_docs"] == 1


def test_benchmark_contamination_broadcasts_the_benchmark(spark):
    from buildkite_logs_parquet_spark.operators.curation import (
        benchmark_contamination,
    )
    from buildkite_logs_parquet_spark.plans.checks import explain_str

    train = _docs(spark, [(0, "en", "some training document text")])
    bench = _docs(spark, [(1, "en", "benchmark text")])
    plan = explain_str(benchmark_contamination(train, bench, "doc_id"))
    assert "BroadcastHashJoin" in plan


def test_split_assign_partitions_everything_and_is_stable(spark):
    from buildkite_logs_parquet_spark.operators.curation import split_assign

    df = spark.range(9_000).select(F.col("id").alias("doc_id"))
    out = split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 9_000 > 0.75
    assert abs(counts["val"] - 900) < 150 and abs(counts["test"] - 900) < 150
    # growth stability: a row's split is unchanged when the corpus doubles
    small = {
        r["doc_id"]: r["split"]
        for r in split_assign(
            spark.range(100).select(F.col("id").alias("doc_id")),
            "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        ).collect()
    }
    big = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(big[k] == v for k, v in small.items())


def test_pii_scrub_hand_computed(spark):
    from buildkite_logs_parquet_spark.operators.curation import pii_scrub

    rows = [
        (0, "en", "contact alice@example.com or bob@corp.io today"),
        (1, "en", "server at 10.1.2.3 answered; call +1 555-123-4567 now"),
        (2, "en", "nothing sensitive here"),
    ]
    out = {
        r["doc_id"]: r
        for r in pii_scrub(
            spark.createDataFrame(rows, "doc_id long, lang string, text string")
        ).collect()
    }
    assert out[0]["n_email"] == 2 and out[0]["n_ipv4"] == 0
    assert out[0]["scrubbed"] == "contact <EMAIL> or <EMAIL> today"
    assert out[1]["n_ipv4"] == 1 and out[1]["n_phone"] == 1
    assert "<IP>" in out[1]["scrubbed"] and "<PHONE>" in out[1]["scrubbed"]
    assert out[2]["scrubbed"] == "nothing sensitive here"
    assert out[2]["n_email"] == out[2]["n_ipv4"] == out[2]["n_phone"] == 0


from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(
    st.floats(min_value=0.0, max_value=1.0),
    st.integers(min_value=0, max_value=10_000),
)
def test_sample_deterministic_matches_python_md5(spark, rate, seed):
    """Property: the Spark-side md5 bucket decision equals a pure-python
    hashlib computation row for row — the sample is fully predictable."""
    import hashlib

    ids = list(range(400))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]
        for r in sample_deterministic(df, "doc_id", rate, seed=seed).collect()
    }
    thr = int(rate * (1 << 32))
    want = {
        i
        for i in ids
        if int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16) < thr
    }
    assert got == want


# ------------------------------------------------------- corpus mixing


def test_mix_rates_hand_computed():
    """counts {a:100, b:300}, equal weights: a is binding (100/.5 = 200 <
    300/.5 = 600), so a keeps everything and b downsamples to 100."""
    from buildkite_logs_parquet_spark.operators.curation import mix_rates

    rates = mix_rates({"a": 100, "b": 300}, {"a": 1.0, "b": 1.0})
    assert rates["a"] == 1.0
    assert abs(rates["b"] - 100 / 300) < 1e-12


def test_mix_rates_drops_zero_weight_and_missing_sources():
    from buildkite_logs_parquet_spark.operators.curation import mix_rates

    rates = mix_rates(
        {"a": 50, "b": 50, "c": 50}, {"a": 1.0, "b": 0.0, "ghost": 3.0}
    )
    assert set(rates) == {"a"}  # b weight-0, c unweighted, ghost absent
    assert rates["a"] == 1.0


def test_mix_corpora_realizes_target_mixture(spark):
    """4k src 'big' + 1k src 'small', target 1:1 — the output keeps all of
    'small' (binding) and ~1k of 'big', and is layout-independent."""
    from buildkite_logs_parquet_spark.operators.curation import mix_corpora

    rows = [(i, "big" if i < 4000 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_corpora(df, "doc_id", "source", {"big": 1.0, "small": 1.0})
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    assert by_src["small"] == 1000  # binding source kept whole
    assert 850 < by_src["big"] < 1150  # hash-Bernoulli around 1000
    # reproducible across partition layouts
    out2 = mix_corpora(
        df.repartition(13, "doc_id"), "doc_id", "source",
        {"big": 1.0, "small": 1.0},
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in out2.collect()}


# ------------------------------------------------------------- DSIR weights


def test_dsir_weights_hand_computed(spark):
    from buildkite_logs_parquet_spark.operators.curation import dsir_weights

    raw = _docs(
        spark,
        [
            (1, "en", "the cat sat"),          # bigrams: "the cat", "cat sat"
            (2, "en", "dogs run fast"),        # "dogs run", "run fast"
            (3, "en", "one"),                  # no bigram
        ],
    )
    target = _docs(spark, [(10, "en", "the cat sat")])
    out = {r["doc_id"]: r for r in dsir_weights(raw, target, "doc_id").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_grams"] == 2 and out[2]["n_grams"] == 2
    assert out[3]["n_grams"] == 0
    # doc 1's bigrams appear in the target, doc 2's do not → doc 1 must
    # score strictly higher; the gramless doc scores exactly 0
    w = {k: float(v["dsir_logweight"]) for k, v in out.items()}
    assert w[1] > w[2]
    assert w[3] == 0.0
    # hand-check doc 1: each of its 2 grams has ct=1, cr=1;
    # T=2, R=4, B=4096 → per-gram llr = ln((2*(4+B)) / (2*(2+B)))
    import math

    expected = 2 * round(math.log((2 * (4 + 4096)) / (2 * (2 + 4096))), 9)
    assert abs(w[1] - expected) < 1e-8


def test_dsir_weights_deterministic_across_layouts(spark):
    from buildkite_logs_parquet_spark.operators.curation import dsir_weights

    rows = [
        (i, "en", f"token{i % 7} token{(i + 1) % 5} token{i % 3} filler text")
        for i in range(60)
    ]
    raw = _docs(spark, rows)
    target = _docs(spark, rows[:10])
    a = {
        (r["doc_id"], r["dsir_logweight"])
        for r in dsir_weights(raw, target, "doc_id").collect()
    }
    b = {
        (r["doc_id"], r["dsir_logweight"])
        for r in dsir_weights(
            raw.repartition(13, "doc_id"), target, "doc_id"
        ).collect()
    }
    assert a == b


# -------------------------------------------------------- LM perplexity


def test_lm_perplexity_hand_computed(spark):
    import math

    from buildkite_logs_parquet_spark.operators.curation import lm_perplexity

    B = 4096
    ref = _docs(spark, [(10, "en", "the cat sat"), (11, "en", "the cat ran")])
    # ref bigrams: "the cat" x2, "cat sat", "cat ran"  → T=4
    docs = _docs(
        spark,
        [
            (1, "en", "the cat sat"),     # grams seen in ref
            (2, "en", "dogs bark loud"),  # grams unseen
            (3, "en", "one"),             # no bigram
        ],
    )
    out = {
        r["doc_id"]: r
        for r in lm_perplexity(docs, ref, "doc_id", n_buckets=B).collect()
    }
    T = 4
    denom = T + B
    p_the_cat = (2 + 1) / denom
    p_cat_sat = (1 + 1) / denom
    want_nll_1 = -(math.log(p_the_cat) + math.log(p_cat_sat)) / 2
    assert abs(out[1]["nll"] - round(want_nll_1, 6)) < 1e-6
    floor_nll = -math.log(1 / denom)
    assert abs(out[2]["nll"] - round(floor_nll, 6)) < 1e-6
    # fluent (reference-like) doc scores LOWER perplexity than unseen text
    assert out[1]["perplexity"] < out[2]["perplexity"]
    # gramless doc: no evidence
    assert out[3]["n_grams"] == 0 and out[3]["nll"] is None


def test_lm_perplexity_ranks_reference_like_docs_lower(spark):
    from buildkite_logs_parquet_spark.operators.curation import lm_perplexity

    ref_rows = [
        (100 + i, "en", "the quick brown fox jumps over the lazy dog again")
        for i in range(20)
    ]
    docs = _docs(
        spark,
        [(1, "en", "the quick brown fox jumps high")]
        + [(2, "en", "zxq wvu tsr qpo nml kji")],
    )
    out = {
        r["doc_id"]: r["perplexity"]
        for r in lm_perplexity(docs, _docs(spark, ref_rows), "doc_id").collect()
    }
    assert out[1] < out[2]


# ------------------------------------------------------ corpus shuffle


def test_corpus_shuffle_is_a_deterministic_permutation(spark):
    from buildkite_logs_parquet_spark.operators.curation import corpus_shuffle

    rows = [(i, f"doc {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [r["doc_id"] for r in corpus_shuffle(df, "doc_id", seed=42).collect()]
    # permutation: same rows, scrambled order
    assert sorted(a) == list(range(200))
    assert a != list(range(200))
    # layout-independent and run-stable
    b = [
        r["doc_id"]
        for r in corpus_shuffle(df.repartition(13), "doc_id", seed=42).collect()
    ]
    assert a == b
    # a different seed is a different permutation
    c = [r["doc_id"] for r in corpus_shuffle(df, "doc_id", seed=43).collect()]
    assert a != c and sorted(c) == list(range(200))


def test_corpus_shuffle_shards_concatenate_to_the_permutation(spark):
    from pyspark.sql import functions as F

    from buildkite_logs_parquet_spark.operators.curation import corpus_shuffle

    rows = [(i, f"doc {i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = [r["doc_id"] for r in corpus_shuffle(df, "doc_id", seed=7).collect()]
    sharded = corpus_shuffle(df, "doc_id", seed=7, n_shards=4).withColumn(
        "_pid", F.spark_partition_id()
    )
    got_rows = sharded.collect()
    assert {r["_pid"] for r in got_rows} <= set(range(4))
    # concatenating shards in id order reproduces the global permutation
    got = [
        r["doc_id"]
        for r in sorted(got_rows, key=lambda r: (r["_pid"],))
    ]
    # rows within a shard keep collect order (sortWithinPartitions)
    assert got == want
    # shards are balanced within a reasonable factor (uniform hash ranges)
    from collections import Counter

    sizes = Counter(r["_pid"] for r in got_rows)
    assert max(sizes.values()) < 3 * min(sizes.values())


def test_mix_corpora_by_tokens_targets_token_mass(spark):
    """Two sources with 10x different doc lengths, 1:1 target weights:
    by='tokens' brings the KEPT token shares near 50/50, which by='docs'
    cannot (it equalizes doc counts, leaving tokens ~10:1)."""
    from buildkite_logs_parquet_spark.operators.curation import mix_corpora

    rows = []
    for i in range(400):
        rows.append((i, "long", " ".join(["w"] * 50)))       # 50 tokens
    for i in range(400, 4400):
        rows.append((i, "short", "a b c d e"))               # 5 tokens
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = {"long": 1.0, "short": 1.0}

    def token_share(out):
        got = {
            r["source"]: r["t"]
            for r in out.selectExpr(
                "source", "size(split(trim(text), '\\\\s+')) AS n"
            ).groupBy("source").sum("n").withColumnRenamed("sum(n)", "t").collect()
        }
        total = sum(got.values())
        return {s: got.get(s, 0) / total for s in w}

    by_tokens = token_share(mix_corpora(df, "doc_id", "source", w, by="tokens"))
    assert abs(by_tokens["long"] - 0.5) < 0.1, by_tokens
    by_docs = token_share(mix_corpora(df, "doc_id", "source", w, by="docs"))
    assert by_docs["long"] > 0.8, by_docs  # doc-count mixing over-weights long docs

    # determinism: same seed/mode → same selected ids
    a = sorted(r["doc_id"] for r in mix_corpora(df, "doc_id", "source", w, by="tokens").collect())
    b = sorted(r["doc_id"] for r in mix_corpora(df.repartition(9), "doc_id", "source", w, by="tokens").collect())
    assert a == b


def test_mix_corpora_temperature_upsamples_low_resource(spark):
    import pytest

    from buildkite_logs_parquet_spark.operators.curation import (
        mix_corpora,
        temperature_weights,
    )

    rows = [
        (i, "web" if i < 800 else "code", f"doc number {i}")
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    # alpha=0.5: natural (0.8, 0.2) -> shares (2/3, 1/3); the low-resource
    # source binds at rate 1.0, web is halved
    w = temperature_weights({"web": 800, "code": 200}, 0.5)
    assert abs(w["web"] / w["code"] - 2.0) < 1e-9

    out = mix_corpora(df, "doc_id", "source", temperature=0.5)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts["code"] == 200  # binding source kept whole
    assert abs(counts["web"] - 400) < 60  # hash-thresholded ~rate 0.5

    # alpha=1 keeps natural proportions -> every rate is 1.0
    assert mix_corpora(df, "doc_id", "source", temperature=1.0).count() == 1000

    with pytest.raises(ValueError):
        mix_corpora(df, "doc_id", "source", weights={"web": 1}, temperature=0.5)
    with pytest.raises(ValueError):
        mix_corpora(df, "doc_id", "source")


class TestQuantileThresholdFilter:
    def test_matches_numpy_per_group_quantile(self, spark):
        import numpy as np
        from buildkite_logs_parquet_spark.operators.curation import (
            quantile_threshold_filter,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = quantile_threshold_filter(
            docs, "n_chars", "lang", q=0.5
        ).collect()
        by_lang: dict = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append(r)
        for lang, rows in by_lang.items():
            want = float(np.percentile([r["n_chars"] for r in rows], 50))
            for r in rows:
                assert r["threshold"] == pytest.approx(want)
                assert r["kept"] == (r["n_chars"] >= r["threshold"])
        # per-group: roughly half kept, never none
        for lang, rows in by_lang.items():
            kept = sum(r["kept"] for r in rows)
            assert kept >= len(rows) / 2

    def test_keep_below_and_null_group(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            quantile_threshold_filter,
        )

        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
             (4, None, 5.0), (5, None, 15.0)],
            "id long, g string, s double",
        )
        out = {r["id"]: r for r in quantile_threshold_filter(
            df, "s", "g", q=0.5, keep="below"
        ).collect()}
        assert out[1]["kept"] and out[2]["kept"] and not out[3]["kept"]
        # NULL group matched its own threshold row (median 10.0)
        assert out[4]["threshold"] == pytest.approx(10.0)
        assert out[4]["kept"] and not out[5]["kept"]

    def test_approx_mode_and_bad_keep(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            quantile_threshold_filter,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = quantile_threshold_filter(
            docs, "n_chars", "lang", q=0.5, exact=False
        )
        rows = out.collect()
        assert all(r["threshold"] is not None for r in rows)
        with pytest.raises(ValueError):
            quantile_threshold_filter(docs, "n_chars", "lang", keep="sideways")


class TestBlocklistFilter:
    def test_word_mode_counts_and_flags(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            blocklist_filter,
        )

        df = spark.createDataFrame(
            [(1, "Bad word here bad BAD"), (2, "all clean text"),
             (3, "badge is not bad-word but badge")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in blocklist_filter(
            df, "doc_id", "text", ["bad", "awful"]
        ).collect()}
        assert out[1]["n_blocklist_hits"] == 3 and out[1]["blocked"]
        assert out[2]["n_blocklist_hits"] == 0 and not out[2]["blocked"]
        # 'badge' and 'bad-word' are NOT whole-token matches
        assert out[3]["n_blocklist_hits"] == 0

    def test_substring_mode(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            blocklist_filter,
        )

        df = spark.createDataFrame(
            [(1, "badge embadded bad")], "doc_id long, text string"
        )
        r = blocklist_filter(
            df, "doc_id", "text", ["bad"], mode="substring"
        ).first()
        assert r["n_blocklist_hits"] == 3 and r["blocked"]

    def test_empty_blocklist_rejected(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            blocklist_filter,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            blocklist_filter(df, "doc_id", "text", [])
        with pytest.raises(ValueError):
            blocklist_filter(df, "doc_id", "text", ["x"], mode="phrase")


class TestCcnetBuckets:
    def test_buckets_per_group_terciles(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            ccnet_buckets,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ref = docs.where("source = 'src0'")
        rest = docs.where("source != 'src0'")
        out = ccnet_buckets(
            rest, ref, "doc_id", group_col="lang", n_buckets=1024
        ).collect()
        assert {r["ppl_bucket"] for r in out} <= {"head", "middle", "tail", "unscored"}
        by_lang: dict = {}
        for r in out:
            if r["nll"] is not None:
                by_lang.setdefault(r["lang"], []).append(r)
        for lang, rows in by_lang.items():
            heads = [r for r in rows if r["ppl_bucket"] == "head"]
            tails = [r for r in rows if r["ppl_bucket"] == "tail"]
            if heads and tails:
                # every head doc is more reference-like than every tail doc
                assert max(r["nll"] for r in heads) <= min(r["nll"] for r in tails)
            # terciles: head is roughly a third of the group
            assert len(heads) >= len(rows) // 4
        # determinism
        again = ccnet_buckets(
            rest, ref, "doc_id", group_col="lang", n_buckets=1024
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_global_buckets_without_group(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            ccnet_buckets,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = ccnet_buckets(
            docs.where("source != 'src0'"),
            docs.where("source = 'src0'"),
            "doc_id",
            n_buckets=1024,
        )
        counts = {r["ppl_bucket"]: r["n"] for r in out.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()}
        assert counts.get("head", 0) > 0 and counts.get("tail", 0) > 0


def test_weighted_sample_matches_python_ground_truth(spark):
    import hashlib
    import math

    from buildkite_logs_parquet_spark.operators.curation import (
        weighted_sample,
    )

    rows = [(i, float(1 + (i % 7))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "doc_id", "w", n=40, seed=9)
    got_ids = [r["doc_id"] for r in got.collect()]

    def key(i, w):
        h = hashlib.md5(f"9:{i}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 1) / float(1 << 32)
        return round(math.log(u) / w, 12)

    want = sorted(rows, key=lambda t: (-key(*t), t[0]))[:40]
    assert sorted(got_ids) == sorted(i for i, _ in want)


def test_weighted_sample_is_layout_independent(spark):
    from buildkite_logs_parquet_spark.operators.curation import (
        weighted_sample,
    )

    rows = [(i, float(1 + (i * 13) % 5)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 60).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(
            df.repartition(7, "w"), "doc_id", "w", 60
        ).collect()
    }
    assert a == b


def test_weighted_sample_prefers_heavy_rows_and_drops_nonpositive(spark):
    from buildkite_logs_parquet_spark.operators.curation import (
        weighted_sample,
    )

    # one heavy row vs light rows, plus excluded zero/negative weights
    rows = [(0, 10_000.0)] + [(i, 1.0) for i in range(1, 400)]
    rows += [(1000, 0.0), (1001, -5.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    included = 0
    for seed in range(8):
        ids = {
            r["doc_id"]
            for r in weighted_sample(df, "doc_id", "w", 40, seed=seed).collect()
        }
        assert 1000 not in ids and 1001 not in ids
        included += 0 in ids
    # P(include heavy) ≈ 1 − (1 − 10000/10399)^40 ≈ 1
    assert included == 8


def test_weighted_sample_plan_is_take_ordered(spark):
    from buildkite_logs_parquet_spark.operators.curation import (
        weighted_sample,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 9 + 1).alias("w")
    )
    plan = (
        weighted_sample(df, "doc_id", "w", 25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_domain_token_budget_prefix_rule(spark):
    from buildkite_logs_parquet_spark.operators.curation import (
        domain_token_budget,
    )

    rows = [
        # (doc_id, domain, tokens): a = 40+40+30+10 -> 30 rejected AND the
        # later 10 rejected too (prefix rule counts rejected mass)
        (0, "a", 40),
        (1, "a", 40),
        (2, "a", 30),
        (3, "a", 10),
        (4, "b", 120),  # first row alone overflows
        (5, "c", 100),  # exactly at budget
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens long")
    out = {
        r["doc_id"]: (r["cum_tokens"], r["admitted"])
        for r in domain_token_budget(
            df, "domain", "n_tokens", budget=100, order_col="doc_id"
        ).collect()
    }
    assert out[0] == (40, True)
    assert out[1] == (80, True)
    assert out[2] == (110, False)
    assert out[3] == (120, False)  # prefix rule: rejected mass still counts
    assert out[4] == (120, False)
    assert out[5] == (100, True)


def test_domain_token_budget_layout_independent(spark):
    from buildkite_logs_parquet_spark.operators.curation import (
        domain_token_budget,
    )

    rows = [(i, f"d{i % 11}", 7 + (i * 13) % 90) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens long")
    a = {
        (r["doc_id"], r["admitted"])
        for r in domain_token_budget(
            df, "domain", "n_tokens", 500, "doc_id"
        ).collect()
    }
    b = {
        (r["doc_id"], r["admitted"])
        for r in domain_token_budget(
            df.repartition(13), "domain", "n_tokens", 500, "doc_id"
        ).collect()
    }
    assert a == b


class TestRobotsFilter:
    """Crawl-politeness audit via stdlib robotparser inside the
    Arrow-batched stage."""

    def _tables(self, spark):
        urls = spark.createDataFrame(
            [
                (1, "https://a.example/private/page"),
                (2, "https://a.example/public/page"),
                (3, "https://b.example/anything"),
                (4, "https://norobots.example/x"),
                (5, "https://A.EXAMPLE/private/sub/deep"),  # domain casefold
            ],
            "id long, url string",
        )
        robots = spark.createDataFrame(
            [
                (
                    "a.example",
                    "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n",
                ),
                ("b.example", "User-agent: *\nDisallow: /\n"),
            ],
            "domain string, robots_txt string",
        )
        return urls, robots

    def test_rules_delays_and_missing_robots(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            robots_filter,
        )

        urls, robots = self._tables(spark)
        rows = {r["id"]: r for r in robots_filter(urls, robots).collect()}
        assert rows[1]["allowed"] is False  # /private/ disallowed
        assert rows[2]["allowed"] is True
        assert rows[1]["crawl_delay"] == 2.0
        assert rows[3]["allowed"] is False  # blanket Disallow: /
        assert rows[4]["allowed"] is True  # no robots row -> allowed
        assert rows[4]["crawl_delay"] is None
        assert rows[5]["allowed"] is False  # upper-case domain matches

    def test_agent_specific_rules(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            robots_filter,
        )

        urls = spark.createDataFrame(
            [(1, "https://x.example/data")], "id long, url string"
        )
        robots = spark.createDataFrame(
            [
                (
                    "x.example",
                    "User-agent: badbot\nDisallow: /\n\n"
                    "User-agent: *\nAllow: /\n",
                )
            ],
            "domain string, robots_txt string",
        )
        ok = robots_filter(urls, robots, agent="goodbot").first()
        bad = robots_filter(urls, robots, agent="badbot").first()
        assert ok["allowed"] is True and bad["allowed"] is False

    def test_join_is_shuffle_not_broadcast_by_default(self, spark):
        """Web-scale domain counts: the robots side must NOT broadcast
        unless the caller opts in."""
        from buildkite_logs_parquet_spark.operators.curation import (
            robots_filter,
        )

        urls, robots = self._tables(spark)
        plan = (
            robots_filter(urls, robots)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert "ResolvedHint" not in plan


class TestCompressionRatio:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_repetitive_text_compresses_harder(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            compression_ratio,
        )

        import random

        rng = random.Random(7)
        natural = " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
            for _ in range(200)
        )
        spammy = "buy now click here " * 60
        rows = {
            r["doc_id"]: r["compress_ratio"]
            for r in compression_ratio(
                self._df(spark, [natural, spammy]), "doc_id"
            ).collect()
        }
        assert rows[1] < rows[0]  # repetition compresses much harder
        assert rows[1] < 0.1 and 0.3 < rows[0] <= 1.1

    def test_empty_and_null_are_null(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            compression_ratio,
        )

        df = spark.createDataFrame(
            [(0, ""), (1, None)], "doc_id long, text string"
        )
        rows = compression_ratio(df, "doc_id").collect()
        assert all(r["compress_ratio"] is None for r in rows)

    def test_deterministic_across_layout(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            compression_ratio,
        )

        texts = [f"doc {i} " + "pad " * (i % 17) for i in range(40)]
        a = compression_ratio(self._df(spark, texts), "doc_id")
        b = compression_ratio(
            self._df(spark, texts).repartition(7), "doc_id"
        )
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )


def test_pii_card_luhn(spark):
    from buildkite_logs_parquet_spark.operators.curation import pii_scrub

    rows = [
        (0, "pay 4532015112830366 now"),  # Luhn-valid 16-digit
        (1, "ref 4532015112830367 code"),  # same shape, bad checksum
        (2, "short 123456789012 run"),  # 12 digits: not card-shaped
        (3, "call +1 555-123-4567"),  # separated digits stay phone
    ]
    out = {
        r["doc_id"]: r
        for r in pii_scrub(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[0]["n_card"] == 1 and out[0]["n_card_valid"] == 1
    assert out[0]["scrubbed"] == "pay <CARD> now"
    assert out[1]["n_card"] == 1 and out[1]["n_card_valid"] == 0
    assert out[1]["scrubbed"] == "ref <CARD> code"
    assert out[2]["n_card"] == 0 and out[2]["n_card_valid"] == 0
    assert out[3]["n_card"] == 0 and "<PHONE>" in out[3]["scrubbed"]


class TestKneserNey:
    REF = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran and the dog sat"),
        (2, "a dog sat on a mat"),
    ]
    DOCS = [
        (10, "the cat sat"),       # all-seen bigrams
        (11, "the zebra sat"),      # unseen word mid-context
        (12, "zebra the cat"),      # unseen context start
        (13, "single"),             # no bigram -> no row
    ]

    @staticmethod
    def _py_kn(ref_texts, doc_text, r=9):
        """Exact-decimal sequential twin of train+score."""
        from collections import Counter, defaultdict
        from decimal import ROUND_HALF_UP, Decimal
        import math

        def rnd(x, n=r):
            return Decimal(x).quantize(
                Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP
            )

        bi = Counter()
        for t in ref_texts:
            ws = t.lower().split()
            for v, w in zip(ws, ws[1:]):
                bi[(v, w)] += 1
        cv = Counter()
        n1v = Counter()
        n1w = Counter()
        for (v, w), c in bi.items():
            cv[v] += c
            n1v[v] += 1
            n1w[w] += 1
        nt = len(bi)
        D = Decimal("0.75")
        total = Decimal(0)
        ws = doc_text.lower().split()
        n_grams = 0
        for v, w in zip(ws, ws[1:]):
            n_grams += 1
            floor = rnd(Decimal(1) / Decimal(2 * nt))
            pc = rnd(Decimal(n1w[w]) / Decimal(nt)) if w in n1w else floor
            if v not in cv:
                p = pc
            else:
                lam = rnd(D * Decimal(n1v[v]) / Decimal(cv[v]))
                if (v, w) in bi:
                    t1 = rnd((Decimal(bi[(v, w)]) - D) / Decimal(cv[v]))
                    p = rnd(t1 + lam * pc)
                else:
                    p = rnd(lam * pc)
            total += rnd(Decimal(repr(math.log(float(p)))))
        return n_grams, total

    def test_matches_exact_decimal_twin(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            kn_score,
            train_kn_bigram_lm,
        )

        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        model = train_kn_bigram_lm(ref, "doc_id")
        got = {
            r["doc_id"]: r for r in kn_score(docs, model, "doc_id").collect()
        }
        assert 13 not in got  # no bigram -> no row
        from decimal import Decimal

        for did, text in self.DOCS[:3]:
            n, total = self._py_kn([t for _, t in self.REF], text)
            assert got[did]["n_grams"] == n, did
            assert Decimal(got[did]["kn_sum_logp9"]) == total, (did, text)

    def test_seen_context_probabilities_sum_to_one(self, spark):
        """Interpolated-KN normalization: for a seen context v, summing
        p(w|v) over the continuation vocabulary gives 1 (up to the 9-dp
        per-term rounding)."""
        from decimal import Decimal

        from buildkite_logs_parquet_spark.operators.curation import (
            kn_score,
            train_kn_bigram_lm,
        )

        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        model = train_kn_bigram_lm(ref, "doc_id")
        vocab = sorted({r["w"] for r in model["continuation"].collect()})
        probes = spark.createDataFrame(
            [(i, f"the {w}") for i, w in enumerate(vocab)],
            "doc_id long, text string",
        )
        import math

        got = kn_score(probes, model, "doc_id").collect()
        total = sum(
            Decimal(repr(math.exp(float(r["kn_sum_logp9"])))) for r in got
        )
        assert abs(total - 1) < Decimal("0.0001")

    def test_layout_deterministic(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            kn_score,
            train_kn_bigram_lm,
        )

        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        a = kn_score(docs, train_kn_bigram_lm(ref, "doc_id"), "doc_id")
        b = kn_score(
            docs.repartition(5),
            train_kn_bigram_lm(ref.repartition(3), "doc_id"),
            "doc_id",
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestCurriculumOrder:
    def _docs(self, spark, n=50):
        rows = [(f"d{i:03d}", (i * 37) % 100) for i in range(n)]
        return (
            spark.createDataFrame(rows, "doc_id string, score long"),
            dict(rows),
        )

    def test_matches_python_reference(self, spark):
        import hashlib

        df, scores = self._docs(spark)
        got = {
            r["doc_id"]: (r["bucket"], r["shuffle_key"])
            for r in curriculum_order(
                df, "doc_id", "score", n_buckets=5, seed=41
            ).collect()
        }
        ordered = sorted(scores, key=lambda k: (scores[k], k))
        n = len(ordered)
        for rank, k in enumerate(ordered):
            bucket = rank * 5 // n
            hkey = int(
                hashlib.md5(f"41:{k}".encode()).hexdigest()[:8], 16
            )
            assert got[k] == (bucket, hkey), k

    def test_buckets_balanced_and_score_monotone(self, spark):
        df, scores = self._docs(spark, n=100)
        rows = curriculum_order(df, "doc_id", "score", n_buckets=10).collect()
        from collections import defaultdict

        per = defaultdict(list)
        for r in rows:
            per[r["bucket"]].append(scores[r["doc_id"]])
        sizes = {b: len(v) for b, v in per.items()}
        assert set(sizes) == set(range(10)) and set(sizes.values()) == {10}
        for b in range(9):
            assert max(per[b]) <= min(per[b + 1])

    def test_layout_independent(self, spark):
        df, _ = self._docs(spark, n=60)
        a = sorted(map(tuple, curriculum_order(df, "doc_id", "score").collect()))
        b = sorted(
            map(
                tuple,
                curriculum_order(df.repartition(13), "doc_id", "score").collect(),
            )
        )
        assert a == b


class TestDoremiWeights:
    def _scored(self, spark):
        rows = []
        # domain 'hard' has high excess loss, 'easy' low, 'ref' negative
        # excess (clips to 0), plus a NULL-loss row that must be dropped
        for i in range(50):
            rows.append(("hard", 2.0 + (i % 5) * 0.1, 0.5))
            rows.append(("easy", 0.6, 0.5))
            rows.append(("ref", 0.1, 0.5))
        rows.append(("hard", None, 0.5))
        return spark.createDataFrame(
            rows, "domain string, loss double, ref double"
        )

    def test_matches_pure_python_twin_exactly(self, spark):
        import math as m
        from decimal import Decimal

        from buildkite_logs_parquet_spark.operators.curation import (
            doremi_weights,
        )

        df = self._scored(spark)
        got = doremi_weights(
            df, "domain", "loss", ref_loss_col="ref", n_iter=7, eta=0.8
        )

        # twin: same 9-dp decimal sums, same sequential EG updates
        rows = [r for r in df.collect() if r["loss"] is not None]
        sums, counts = {}, {}
        for r in rows:
            x = max(r["loss"] - r["ref"], 0.0)
            q = Decimal(repr(round(x, 9))).quantize(Decimal("1.000000000"))
            sums[r["domain"]] = sums.get(r["domain"], Decimal(0)) + q
            counts[r["domain"]] = counts.get(r["domain"], 0) + 1
        mean = {
            d: float(sums[d]) / counts[d] for d in sorted(sums)
        }
        k = len(mean)
        alpha = {d: 1.0 / k for d in mean}
        for _ in range(7):
            upd = {d: alpha[d] * m.exp(0.8 * mean[d]) for d in alpha}
            z = sum(upd.values())
            alpha = {d: (1 - 1e-3) * (v / z) + 1e-3 / k for d, v in upd.items()}
        assert got == alpha  # exact, not approx

    def test_hard_domains_gain_weight_and_weights_normalize(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            doremi_weights,
        )

        got = doremi_weights(
            self._scored(spark), "domain", "loss", ref_loss_col="ref",
            n_iter=10,
        )
        assert got["hard"] > got["easy"] > got["ref"]
        assert sum(got.values()) == pytest.approx(1.0)
        assert all(v >= 1e-3 / 3 for v in got.values())  # smoothing floor

    def test_without_reference_column_losses_are_the_excess(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            doremi_weights,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("b", 0.0)], "domain string, loss double"
        )
        got = doremi_weights(df, "domain", "loss", n_iter=1, eta=1.0)
        assert got["a"] > got["b"]

    def test_empty_and_invalid(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            doremi_weights,
        )

        empty = spark.createDataFrame([], "domain string, loss double")
        assert doremi_weights(empty, "domain", "loss") == {}
        with pytest.raises(ValueError):
            doremi_weights(empty, "domain", "loss", n_iter=0)

    def test_feeds_mix_corpora(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            doremi_weights,
            mix_corpora,
        )

        df = self._scored(spark).where(F.col("loss").isNotNull())
        docs = df.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("domain").alias("source"),
        )
        w = doremi_weights(df, "domain", "loss", ref_loss_col="ref")
        kept = mix_corpora(docs, "doc_id", "source", w, seed=7)
        shares = {
            r["source"]: r["n"]
            for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        # the upweighted domain is kept whole; others downsample
        assert shares["hard"] == 50
        assert shares.get("easy", 0) < 50


class TestStripDomainBoilerplate:
    def _docs(self, spark):
        nav = "home | products | contact"
        foot = "copyright 2024 example inc"
        rows = []
        for i in range(10):
            rows.append(
                (i, "site-a", f"{nav}\narticle body {i}\nunique line {i}\n{foot}")
            )
        # same nav line on site-b, but only 2 docs there (< min_docs):
        # must SURVIVE — boilerplate is a per-domain decision
        for i in range(10, 12):
            rows.append((i, "site-b", f"{nav}\nreal content {i}"))
        return spark.createDataFrame(rows, "doc_id long, domain string, text string")

    def test_strips_only_in_qualifying_domain(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            strip_domain_boilerplate,
        )

        out = {
            r["doc_id"]: r
            for r in strip_domain_boilerplate(
                self._docs(spark), "doc_id", "text", "domain",
                min_docs=5, max_ratio=0.5,
            ).collect()
        }
        assert out[0]["text"] == "article body 0\nunique line 0"
        assert out[0]["n_lines"] == 4 and out[0]["n_removed"] == 2
        # site-b keeps the same nav line (domain below min_docs)
        assert out[10]["text"].startswith("home | products")
        assert out[10]["n_removed"] == 0

    def test_within_page_repetition_is_not_boilerplate(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            strip_domain_boilerplate,
        )

        # one doc repeats a line 5 times; the line appears in only 1 of
        # 6 docs -> distinct-doc frequency keeps it
        rows = [(0, "d", "spam\nspam\nspam\nspam\nspam")]
        rows += [(i, "d", f"content {i}") for i in range(1, 6)]
        df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
        out = {
            r["doc_id"]: r
            for r in strip_domain_boilerplate(
                df, "doc_id", "text", "domain", min_docs=3, max_ratio=0.5
            ).collect()
        }
        assert out[0]["n_removed"] == 0
        assert out[0]["text"].count("spam") == 5

    def test_fully_boilerplate_doc_empties_not_vanishes(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            strip_domain_boilerplate,
        )

        rows = [(i, "d", "the only line") for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
        out = strip_domain_boilerplate(
            df, "doc_id", "text", "domain", min_docs=3, max_ratio=0.5
        )
        rowsx = out.collect()
        assert len(rowsx) == 6
        assert all(r["text"] == "" and r["n_removed"] == 1 for r in rowsx)

    def test_integer_ratio_boundary(self, spark):
        from buildkite_logs_parquet_spark.operators.curation import (
            strip_domain_boilerplate,
        )

        # line in exactly 50% of docs: strictly-greater gate keeps it
        rows = [(i, "d", "maybe\nbody %d" % i) for i in range(5)]
        rows += [(i, "d", "body %d" % i) for i in range(5, 10)]
        df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
        out = {
            r["doc_id"]: r
            for r in strip_domain_boilerplate(
                df, "doc_id", "text", "domain", min_docs=3, max_ratio=0.5
            ).collect()
        }
        assert out[0]["n_removed"] == 0
        import pytest as _pytest

        with _pytest.raises(ValueError):
            strip_domain_boilerplate(df, "doc_id", "text", "domain", max_ratio=1.5)
