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


def test_quality_classifier_decision_boundary_and_sigmoid(spark, docs):
    """keep must equal logit >= 0, and prob_keep must be the sigmoid of
    the (rounded) logit to within rounding noise."""
    import math

    from buildkite_logs_parquet_spark.operators.text_analysis import (
        quality_classifier,
    )

    out = quality_classifier(docs, "doc_id", "text").collect()
    assert len(out) == docs.count()
    for r in out:
        assert r["keep"] == (r["logit"] >= 0)
        want = 1.0 / (1.0 + math.exp(-r["logit"]))
        assert abs(r["prob_keep"] - want) < 1e-3


def test_quality_classifier_matches_python_linear_model(spark):
    """The Spark logit equals the same weights applied to hand-computed
    features for a simple doc (left-associated sum, same order)."""
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        CLASSIFIER_FEATURES,
        classifier_weights,
        quality_classifier,
    )

    text = "the quick brown fox is happy and the dog is not"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = quality_classifier(df, "doc_id", "text").collect()[0]

    toks = text.split()
    n_tokens, n_chars = len(toks), len(text)
    n_alpha = sum(c.isalpha() for c in text)
    n_punct = sum(not (c.isalnum() or c.isspace()) for c in text)
    stop_hits = sum(t in ("the", "and", "of", "to", "is") for t in toks)
    feats = {
        "tokens_capped": min(n_tokens / 100.0, 1.0),
        "alpha_ratio": n_alpha / n_chars,
        "punct_ratio": n_punct / n_chars,
        "stopword_ratio": stop_hits / n_tokens,
        "mean_len_scaled": (n_chars / n_tokens) / 10.0,
    }
    w, bias = classifier_weights(11)
    logit = bias
    for name, wi in zip(CLASSIFIER_FEATURES, w):
        logit = logit + wi * feats[name]
    assert abs(row["logit"] - round(logit, 4)) < 1e-9


def test_ngram_counts_hand_computed(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import ngram_counts

    rows = [
        (1, "a b c"),        # bigrams: "a b", "b c"
        (2, "a b"),          # "a b"
        (3, "a b c d"),      # "a b", "b c", "c d"
        (4, "solo"),         # 1 word, shorter than n -> no grams
        (5, ""),             # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["gram"]: r["n_occurrences"]
        for r in ngram_counts(df, "text", n=2, min_count=2).collect()
    }
    assert got == {"a b": 3, "b c": 2}  # "c d" pruned by min_count


def test_ngram_counts_trigram_and_short_doc_guard(spark):
    """Docs shorter than n produce no grams (the sequence(1, 0) descending
    footgun is guarded), and trigram windows are correct."""
    from buildkite_logs_parquet_spark.operators.text_analysis import ngram_counts

    rows = [(1, "x y"), (2, "x y z w"), (3, "x y z w")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["gram"]: r["n_occurrences"]
        for r in ngram_counts(df, "text", n=3, min_count=1).collect()
    }
    assert got == {"x y z": 2, "y z w": 2}


# ------------------------------------------------------------------- BM25


def test_bm25_matches_python_reference(spark):
    import math

    from buildkite_logs_parquet_spark.operators.text_analysis import bm25_scores

    corpus = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick quick quick fox"),
        (3, "nothing relevant here at all"),
        (4, "a dog and a fox met a dog"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    q = ["quick", "fox", "dog"]
    got = {r["doc_id"]: r for r in bm25_scores(docs, q, "doc_id").collect()}

    # python reference
    k1, b = 1.2, 0.75
    toks = {i: t.lower().split() for i, t in corpus}
    N = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / N
    df_ = {t: sum(1 for d in toks.values() if t in d) for t in q}
    want = {}
    for i, d in toks.items():
        s = 0.0
        matched = 0
        for t in q:
            tf = d.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (N - df_[t] + 0.5) / (df_[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if matched:
            want[i] = (round(s, 4), matched)
    assert set(got) == set(want)
    for i, (s, m) in want.items():
        assert got[i]["n_matched_terms"] == m
        assert abs(float(got[i]["bm25"]) - s) < 1e-3, i
    # doc 3 matches nothing and must be absent
    assert 3 not in got

    # top_n keeps the best-scored docs (ties broken by id) and becomes a
    # bounded TakeOrderedAndProject, never a full global sort
    top = bm25_scores(docs, q, "doc_id", top_n=2)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert [r["doc_id"] for r in top.collect()] == [i for i, _ in ranked[:2]]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:800]
    # without top_n there must still be no stray extra jobs: the stats
    # aggregate is ONE combined count+sum (checked implicitly by the
    # single .first() in the implementation)


def test_url_domain_stats(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        url_domain_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "see https://Example.com/a and http://example.com/b?x=1"),
            (2, "ref https://other.org/path plus text https://example.com"),
            (3, "no links here"),
        ],
        "doc_id long, text string",
    )
    got = {r["domain"]: r for r in url_domain_stats(docs, "doc_id").collect()}
    assert got["example.com"]["n_urls"] == 3
    assert got["example.com"]["n_docs"] == 2
    assert got["other.org"]["n_urls"] == 1 and got["other.org"]["n_docs"] == 1
    assert set(got) == {"example.com", "other.org"}


# -------------------------------------------------------------------- BPE


def _bpe_python(word_freqs, n_merges):
    """Reference BPE trainer (Sennrich-style greedy merges)."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + f
                )
        if not counts:
            break
        # deterministic tie-break: max count, then lexicographically smallest
        m = max(counts.values())
        best = sorted([p for p, c in counts.items() if c == m])[0]
        merges.append((best, m))
        a, b = best
        for w in vocab:
            syms = vocab[w]
            out, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == a and s == b:
                    out.append(a + b)
                    pend = None
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            vocab[w] = out
    return vocab, merges


def test_bpe_merge_steps_match_python_reference(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        bpe_merge_step,
        word_symbol_table,
    )

    corpus = [
        (1, "low low low lower lower newest newest newest newest widest"),
        (2, "newest widest widest low"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    words = word_symbol_table(docs)

    freqs = {}
    for _, t in corpus:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want_vocab, want_merges = _bpe_python(freqs, 5)

    cur = words
    got_merges = []
    for _ in range(5):
        cur, pair, n = bpe_merge_step(cur)
        if pair is None:
            break
        got_merges.append((pair, n))
        cur = cur.localCheckpoint(eager=True)  # keep the loop plan flat
    assert got_merges == want_merges
    got_vocab = {r["word"]: list(r["symbols"]) for r in cur.collect()}
    assert got_vocab == want_vocab


#: committed golden vocab: the classic Sennrich corpus shape, 6 merges,
#: hand-checkable — 'newest' is the most frequent word (5×), so its
#: suffix pairs merge first; ties break lexicographically
_BPE_GOLDEN_CORPUS = [
    (1, "low low low lower lower newest newest newest newest widest"),
    (2, "newest widest widest low"),
]


def test_learn_bpe_matches_reference_and_golden(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import learn_bpe

    docs = spark.createDataFrame(_BPE_GOLDEN_CORPUS, "doc_id long, text string")
    merges, words = learn_bpe(docs, 6)

    freqs = {}
    for _, t in _BPE_GOLDEN_CORPUS:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want_vocab, want_merges = _bpe_python(freqs, 6)
    assert merges == [p for p, _n in want_merges]
    got_vocab = {r["word"]: list(r["symbols"]) for r in words.collect()}
    assert got_vocab == want_vocab
    # committed golden literal (not just reference-relative): the first
    # merges follow 'newest' (freq 5): e+s, es+t, then 'low' (freq 5)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("l", "o")]


def test_learn_bpe_stops_early_when_exhausted(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import learn_bpe

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges, words = learn_bpe(docs, 50)
    assert merges == [("a", "b")]  # one merge possible, then exhausted
    assert words.first()["symbols"] == ["ab"]


def test_learn_bpe_roundtrips_through_encode(spark):
    """learn_bpe → bpe_encode on the same corpus: token conservation
    (concatenating a doc's tokens recovers its lowercased words) and the
    encoder reproduces the trainer's final symbol table exactly."""
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        bpe_encode,
        learn_bpe,
    )

    docs = spark.createDataFrame(_BPE_GOLDEN_CORPUS, "doc_id long, text string")
    merges, words = learn_bpe(docs, 6)
    trained = {r["word"]: list(r["symbols"]) for r in words.collect()}
    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges, "doc_id").collect()}
    for doc_id, text in _BPE_GOLDEN_CORPUS:
        want = []
        for w in text.lower().split():
            want.extend(trained[w])
        assert list(enc[doc_id]["tokens"]) == want
        assert "".join(enc[doc_id]["tokens"]) == "".join(text.lower().split())


def test_bpe_merge_handles_overlapping_pairs(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import bpe_merge_step

    words = spark.createDataFrame(
        [("aaa", 3, ["a", "a", "a"])],
        "word string, freq long, symbols array<string>",
    )
    out, pair, n = bpe_merge_step(words)
    assert pair == ("a", "a") and n == 6
    assert out.first()["symbols"] == ["aa", "a"]


def test_bpe_encode_applies_learned_merges(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        bpe_encode,
        bpe_merge_step,
        word_symbol_table,
    )

    corpus = [(1, "low low low lower newest newest widest")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")

    # train 4 merges distributedly
    cur = word_symbol_table(docs)
    merges = []
    for _ in range(4):
        cur, pair, _n = bpe_merge_step(cur)
        if pair is None:
            break
        merges.append(pair)
        cur = cur.localCheckpoint(eager=True)

    # encoding the SAME corpus must reproduce the trainer's final symbols
    trained = {r["word"]: list(r["symbols"]) for r in cur.collect()}
    enc = bpe_encode(docs, merges, "doc_id").first()
    want_tokens = []
    for w in corpus[0][1].split():
        want_tokens.extend(trained[w])
    assert list(enc["tokens"]) == want_tokens
    assert enc["n_tokens"] == len(want_tokens)


def test_bpe_encode_greedy_rank_order(spark):
    from buildkite_logs_parquet_spark.operators.text_analysis import bpe_encode

    # rank 0 merge (a,b) applies first, then rank 1 (ab,c) completes:
    # "abc" -> [abc]; "xabc" -> [x, abc]
    docs = spark.createDataFrame([(1, "abc xabc")], "doc_id long, text string")
    out = bpe_encode(docs, [("a", "b"), ("ab", "c")], "doc_id").first()
    assert list(out["tokens"]) == ["abc", "x", "abc"]
    assert out["n_tokens"] == 3


def test_top_terms_by_group_exact_under_capacity(spark):
    """With distinct terms under the sketch capacity the result is exact:
    verify counts and ranking against a python tally on skewed data."""
    import random

    from buildkite_logs_parquet_spark.operators.text_analysis import (
        top_terms_by_group,
    )

    rng = random.Random(9)
    vocab = [f"tok{i}" for i in range(30)]
    rows = []
    for i in range(200):
        lang = "en" if i % 2 == 0 else "de"
        # zipf-ish: low-index tokens much more frequent
        words = [vocab[min(int(rng.expovariate(0.25)), 29)] for _ in range(20)]
        rows.append((i, lang, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = top_terms_by_group(docs, "lang", k=5).collect()

    from collections import Counter

    tallies = {"en": Counter(), "de": Counter()}
    for _, lang, text in rows:
        tallies[lang].update(text.split())
    for lang in ("en", "de"):
        want = tallies[lang].most_common()
        got_lang = sorted(
            (r for r in got if r["lang"] == lang), key=lambda r: r["rank"]
        )
        assert len(got_lang) == 5
        for r in got_lang:
            assert tallies[lang][r["term"]] == r["approx_count"], (lang, r)
        # top-1 must be the true argmax (unique by construction w.h.p.)
        if want[0][1] != want[1][1]:
            assert got_lang[0]["term"] == want[0][0]
        # returned counts are the 5 largest tallies (rank order may permute
        # equal counts)
        assert sorted((r["approx_count"] for r in got_lang), reverse=True) == [
            c for _, c in want[:5]
        ]


def test_canonical_url_rules(spark):
    from pyspark.sql import functions as F

    from buildkite_logs_parquet_spark.operators.text_analysis import (
        canonical_url,
    )

    cases = [
        # case-folded scheme+host, default port, tracking, fragment,
        # trailing slash — all at once
        (
            "HTTP://Example.COM:80/Path/?utm_source=x&q=1#frag",
            "http://example.com/Path?q=1",
        ),
        ("https://A.example:443/", "https://a.example/"),  # root "/" kept
        ("https://a.example/p/?utm_campaign=c", "https://a.example/p"),
        (
            "https://a.example/p?ref=tw&keep=1&utm_medium=m",
            "https://a.example/p?keep=1",
        ),
        ("https://a.example/x/", "https://a.example/x"),
        ("https://a.example/x", "https://a.example/x"),
        ("https://a.example:8443/x", "https://a.example:8443/x"),  # real port
        ("https://a.example/?gclid=abc", "https://a.example/"),
        ("https://a.example/p?utm_a=1&utm_b=2&q=3", "https://a.example/p?q=3"),
        ("https://a.example/p?a=1&utm_x=0&b=2", "https://a.example/p?a=1&b=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i])


class TestScriptDetection:
    def test_counts_match_duckdb_re2(self, spark):
        import duckdb
        from pyspark.sql import functions as F

        from buildkite_logs_parquet_spark.operators.text_analysis import (
            SCRIPTS,
            script_counts,
        )

        s = "abc АБв 汉字漢 العرب देवनागरी mixed"
        got = (
            spark.createDataFrame([(s,)], "t string")
            .select(
                *[
                    c.alias(n)
                    for n, c in script_counts(F.col("t")).items()
                ]
            )
            .first()
        )
        for name, _java, re2 in SCRIPTS:
            want = duckdb.sql(
                f"select len(regexp_extract_all(?, '{re2}'))", params=[s]
            ).fetchone()[0]
            assert got[f"n_{name}"] == want, name

    def test_dominant_script_and_ties(self, spark):
        from pyspark.sql import functions as F

        from buildkite_logs_parquet_spark.operators.text_analysis import (
            dominant_script,
            script_counts,
        )

        rows = [
            (0, "hello world"),  # latin
            (1, "汉字 漢字"),  # han
            (2, "ab АБ"),  # tie latin/cyrillic -> latin (declared order)
            (3, "1234 !?"),  # no profiled script
            (4, "مرحبا بالعالم الواسع x"),  # arabic dominant
        ]
        df = spark.createDataFrame(rows, "id long, t string")
        sc = script_counts(F.col("t"))
        got = {
            r["id"]: r["dom"]
            for r in df.select(
                "id", dominant_script(sc).alias("dom")
            ).collect()
        }
        assert got == {0: "latin", 1: "han", 2: "latin", 3: "none", 4: "arabic"}


class TestTokenizerFertility:
    def test_hand_computed_report(self, spark):
        from buildkite_logs_parquet_spark.operators.text_analysis import (
            tokenizer_fertility,
        )

        df = spark.createDataFrame(
            [
                ("a", "hello world"),          # 2 words, 2 subword tokens
                ("a", "don't stop"),           # 2 words, 4 subword tokens
                ("b", "x1 y2"),                # 2 words, 4 subword tokens
            ],
            "source string, text string",
        )
        out = {r["source"]: r for r in tokenizer_fertility(df).collect()}
        a, b = out["a"], out["b"]
        assert (a["n_docs"], a["n_words"], a["n_tokens"]) == (2, 4, 6)
        assert a["fertility_pm3"] == 6 * 1000 // 4
        assert a["n_bytes"] == len("hello world") + len("don't stop")
        assert b["n_tokens"] == 4  # x,1,y,2
        assert b["bytes_per_token_pm3"] == b["n_bytes"] * 1000 // 4
        assert b["tokens_per_doc"] == 4

    def test_custom_encoder_and_empty_group(self, spark):
        from pyspark.sql import functions as F

        from buildkite_logs_parquet_spark.operators.text_analysis import (
            tokenizer_fertility,
        )

        df = spark.createDataFrame(
            [("a", "abcd"), ("a", ""), ("b", "  "), ("c", "")],
            "source string, text string",
        )
        # character tokenizer: every byte (including spaces) is a token
        out = {
            r["source"]: r
            for r in tokenizer_fertility(
                df, encode_fn=lambda c: F.length(c)
            ).collect()
        }
        assert out["a"]["n_tokens"] == 4
        assert out["a"]["n_words"] == 1
        # blank-only group: zero words -> NULL fertility, but the two
        # space bytes still count as char tokens (2 bytes / 2 tokens)
        assert out["b"]["n_words"] == 0
        assert out["b"]["fertility_pm3"] is None
        assert out["b"]["bytes_per_token_pm3"] == 1000
        # empty group: zero tokens -> NULL bytes-per-token, no div0
        assert out["c"]["n_tokens"] == 0
        assert out["c"]["bytes_per_token_pm3"] is None


class TestVocabCoverage:
    def test_hand_computed_occurrences_and_types(self, spark):
        from buildkite_logs_parquet_spark.operators.text_analysis import (
            vocab_coverage,
        )

        df = spark.createDataFrame(
            [
                ("a", "the cat sat on the MAT"),
                ("b", "unknown words only here"),
            ],
            "source string, text string",
        )
        vocab = spark.createDataFrame(
            [("the",), ("cat",), ("sat",), ("mat",), ("on",)], "token string"
        )
        out = {r["source"]: r for r in vocab_coverage(df, vocab).collect()}
        a = out["a"]
        # 6 occurrences, all in vocab (MAT lowercases in)
        assert (a["n_tokens"], a["n_oov"], a["oov_pm"]) == (6, 0, 0)
        # types: the, cat, sat, on, mat -> 5, none OOV
        assert (a["n_types"], a["n_oov_types"], a["type_oov_pm"]) == (5, 0, 0)
        b = out["b"]
        assert (b["n_tokens"], b["n_oov"], b["oov_pm"]) == (4, 4, 1_000_000)
        assert b["type_oov_pm"] == 1_000_000

    def test_occurrence_vs_type_weighting_differ(self, spark):
        from buildkite_logs_parquet_spark.operators.text_analysis import (
            vocab_coverage,
        )

        # 9 occurrences of a known word + 1 OOV: occurrence OOV = 10%,
        # type OOV = 50%
        df = spark.createDataFrame(
            [("a", "known " * 9 + "rareword")], "source string, text string"
        )
        vocab = spark.createDataFrame([("known",)], "token string")
        (r,) = vocab_coverage(df, vocab).collect()
        assert r["oov_pm"] == 100_000
        assert r["type_oov_pm"] == 500_000

    def test_broadcast_join_in_plan(self, spark):
        from buildkite_logs_parquet_spark.operators.text_analysis import (
            vocab_coverage,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        vocab = docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
        ).limit(100)
        plan = (
            vocab_coverage(docs, vocab)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
