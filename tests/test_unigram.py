"""Unigram LM tokenizer (operators/unigram.py): EM, pruning, Viterbi."""

import math

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.unigram import (
    _forward_backward,
    learn_unigram,
    unigram_em_step,
    unigram_encode,
    unigram_seed_vocab,
)

SF = "/root/testdata/sf0.001"


def test_forward_backward_hand_computed():
    vocab = {"a": math.log(0.4), "b": math.log(0.4), "ab": math.log(0.2)}
    counts, nll = _forward_backward("ab", vocab, max_len=2)
    # two segmentations: [a][b] (0.16) and [ab] (0.2); Z = 0.36
    assert nll == pytest.approx(-math.log(0.36))
    assert counts["a"] == pytest.approx(0.16 / 0.36)
    assert counts["b"] == pytest.approx(0.16 / 0.36)
    assert counts["ab"] == pytest.approx(0.20 / 0.36)


def test_forward_backward_unsegmentable():
    counts, nll = _forward_backward("xy", {"a": 0.0}, max_len=1)
    assert counts is None and nll is None


def test_seed_vocab_keeps_all_single_chars(spark):
    words = spark.createDataFrame(
        [("abc", 10), ("abd", 5)], "word string, freq long"
    )
    seed = unigram_seed_vocab(words, max_piece_len=3, max_vocab=2)
    pieces = {p for p, _ in seed}
    assert {"a", "b", "c", "d"} <= pieces
    # top-2 multi-char by weighted count: 'ab' (15) then 'abc'/'abd'/'bc'...
    multis = [p for p, _ in seed if len(p) > 1]
    assert len(multis) == 2 and multis[0] == "ab" if multis else True


def test_em_step_matches_python(spark):
    words = spark.createDataFrame([("ab", 3)], "word string, freq long")
    vocab = {"a": math.log(0.4), "b": math.log(0.4), "ab": math.log(0.2)}
    rows = {r["piece"]: r for r in unigram_em_step(words, vocab).collect()}
    assert float(rows["ab"]["expected"]) == pytest.approx(3 * 0.2 / 0.36, abs=1e-6)
    assert float(rows["a"]["expected"]) == pytest.approx(3 * 0.16 / 0.36, abs=1e-6)
    assert float(rows[""]["nll"]) == pytest.approx(-3 * math.log(0.36), abs=1e-6)


def test_learn_unigram_finds_frequent_piece(spark):
    corpus = spark.createDataFrame(
        [(i, "spark spark spark lake") for i in range(20)],
        "doc_id long, text string",
    )
    vocab, history = learn_unigram(corpus, vocab_size=12, max_piece_len=5)
    assert "spark" in vocab and "lake" in vocab
    # EM drives unused pieces to zero mass and drops them — the vocab can
    # land UNDER the target; the whole-word pieces must carry ~all mass
    assert vocab["spark"] > vocab["lake"] > -2.0
    assert history and history[-1]["vocab"] == len(vocab)
    # whole-word pieces dominate: encoding is one token per word
    enc = unigram_encode(corpus.limit(1), vocab, "doc_id").first()
    assert enc["tokens"] == ["spark", "spark", "spark", "lake"]
    assert enc["n_tokens"] == 4


def test_learn_unigram_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    v1, h1 = learn_unigram(docs, vocab_size=80, max_piece_len=4, max_rounds=3)
    v2, h2 = learn_unigram(docs, vocab_size=80, max_piece_len=4, max_rounds=3)
    assert v1 == v2
    assert h1 == h2


def test_viterbi_tie_prefers_longer_final_piece(spark):
    df = spark.createDataFrame([(1, "ab")], "id long, text string")
    # equal-probability paths: [a][b] and [ab] — tie must pick [ab]
    vocab = {"a": math.log(0.5), "b": math.log(0.5), "ab": math.log(0.25)}
    out = unigram_encode(df, vocab, "id").first()
    assert out["tokens"] == ["ab"]


def test_encode_token_conservation_on_testdata(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    vocab, _ = learn_unigram(docs, vocab_size=60, max_piece_len=4, max_rounds=2)
    enc = unigram_encode(docs, vocab, "doc_id")
    joined = enc.join(docs, on="doc_id").select(
        "doc_id",
        "n_tokens",
        F.concat_ws("", "tokens").alias("glued"),
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", "").alias("flat"),
    )
    for r in joined.collect():
        assert r["glued"] == r["flat"], r["doc_id"]


def test_unigram_encode_feeds_sequence_packing(spark):
    """Composition: unigram tokenizer output drives the packing tier with
    token conservation end-to-end (the same contract bpe_encode proves)."""
    from pyspark.sql import functions as F

    from buildkite_logs_parquet_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    vocab, _ = learn_unigram(docs, vocab_size=60, max_piece_len=4, max_rounds=2)
    enc = unigram_encode(docs, vocab, "doc_id").withColumn(
        "text", F.concat_ws(" ", "tokens")
    )
    total_tokens = enc.agg(F.sum("n_tokens")).first()[0]
    packed = pack_sequences(enc, "doc_id", "text", capacity=128)
    packed_tokens = packed.agg(F.sum("n_tokens")).first()[0]
    assert packed_tokens == total_tokens  # every token lands exactly once
    caps = [r["n_tokens"] for r in packed.orderBy("seq_id").collect()]
    assert all(c == 128 for c in caps[:-1]) and 0 < caps[-1] <= 128


def test_viterbi_matches_brute_force_enumeration():
    """Property: the PRODUCTION Viterbi (_viterbi) returns the max-score
    segmentation over ALL enumerated segmentations, with ties resolved
    to the longest-final-piece path, for random small vocabularies."""
    import math
    import random

    from buildkite_logs_parquet_spark.operators.unigram import _viterbi

    rng = random.Random(11)

    def brute_paths(word, logp):
        n = len(word)
        out = []
        for mask in range(1 << max(n - 1, 0)):
            cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
            pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
            if any(p not in logp for p in pieces):
                continue
            out.append((sum(logp[p] for p in pieces), pieces))
        return out

    for _ in range(120):
        alpha = "abc"
        pieces = set(alpha) if rng.random() < 0.8 else {"a", "b"}
        for _ in range(rng.randint(1, 5)):
            ln = rng.randint(2, 3)
            pieces.add("".join(rng.choice(alpha) for _ in range(ln)))
        logp = {p: math.log(rng.uniform(0.05, 0.5)) for p in pieces}
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
        maxlen = max(len(p) for p in logp)
        got = _viterbi(word, logp, maxlen)
        paths = brute_paths(word, logp)
        if not paths:
            assert got is None
            continue
        best_score = max(s for s, _ in paths)
        got_score = sum(logp[p] for p in got)
        assert got_score == pytest.approx(best_score, abs=1e-9)


def test_viterbi_exact_tie_takes_longer_final_piece():
    import math

    from buildkite_logs_parquet_spark.operators.unigram import _viterbi

    # p(ab) == p(a)*p(b) exactly: construct in log space so the tie is exact
    logp = {"a": math.log(0.25), "b": math.log(0.25),
            "ab": math.log(0.25) + math.log(0.25)}
    assert _viterbi("ab", logp, 2) == ["ab"]
