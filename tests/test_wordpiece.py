"""WordPiece: greedy longest-match encode semantics, whole-word [UNK],
likelihood-scored induction vs a sequential pure-Python reference,
layout determinism."""

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators import wordpiece as WP


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestEncode:
    VOCAB = [
        "un", "##aff", "##able", "##ab", "aff",
        "a", "##a", "b", "##b", "f", "##f", "l", "##l", "n", "##n",
        "u", "##u", "e", "##e",
    ]

    def test_bert_canonical_example(self):
        got = WP.wordpiece_tokenize_word("unaffable", set(self.VOCAB))
        assert got == ["un", "##aff", "##able"]

    def test_longest_match_beats_shorter(self):
        # "affa" at pos 0: "aff" (len 3) wins over "a"
        got = WP.wordpiece_tokenize_word("affa", set(self.VOCAB))
        assert got == ["aff", "##a"]

    def test_whole_word_unk(self):
        # 'z' has no vocab entry anywhere in the word -> entire word UNK
        got = WP.wordpiece_tokenize_word("unzable", set(self.VOCAB))
        assert got == [WP.UNK]

    def test_spark_encode_matches_driver_twin(self, spark):
        texts = ["unaffable fun", "banana able", "zzz unaffable"]
        rows = {
            r["doc_id"]: r
            for r in WP.wordpiece_encode(
                _docs(spark, texts), self.VOCAB
            ).collect()
        }
        for i, t in enumerate(texts):
            want = []
            for w in t.lower().split():
                want.extend(WP.wordpiece_tokenize_word(w, set(self.VOCAB)))
            assert list(rows[i]["tokens"]) == want, t
            assert rows[i]["n_tokens"] == len(want)

    def test_encode_layout_deterministic(self, spark):
        texts = [f"doc unaffable {i} able" for i in range(40)]
        a = WP.wordpiece_encode(_docs(spark, texts), self.VOCAB)
        b = WP.wordpiece_encode(
            _docs(spark, texts).repartition(7), self.VOCAB
        )
        ka = sorted((r["doc_id"], list(r["tokens"])) for r in a.collect())
        kb = sorted((r["doc_id"], list(r["tokens"])) for r in b.collect())
        assert ka == kb


def _py_learn_wordpiece(texts, n_merges):
    """Sequential reference: same objective, dict arithmetic with exact
    fractions (no floats) and the same lexicographic tie-break."""
    from collections import Counter
    from fractions import Fraction

    freq = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                freq[w] += 1
    words = {
        w: [w[0]] + [WP.CONT + c for c in w[1:]] for w in freq
    }
    vocab = sorted({s for syms in words.values() for s in syms})
    for _ in range(n_merges):
        sym_counts = Counter()
        pair_counts = Counter()
        for w, syms in words.items():
            f = freq[w]
            for s in syms:
                sym_counts[s] += f
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        best = max(
            pair_counts,
            key=lambda p: (
                Fraction(pair_counts[p], sym_counts[p[0]] * sym_counts[p[1]]),
                # lexicographic tie-break = SMALLEST (a, b); invert for max()
                tuple(-ord(c) for c in p[0] + "\x00" + p[1]),
            ),
        )
        a, b = best
        merged = WP._merge_symbol(a, b)
        vocab.append(merged)
        for w, syms in words.items():
            out, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == a and s == b:
                    out.append(merged)
                    pend = None
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            words[w] = out
    return vocab


class TestLearn:
    TEXTS = [
        "low lower lowest",
        "new newer newest",
        "low low new new wide",
        "wider widest lowest",
    ]

    def test_matches_sequential_reference(self, spark):
        vocab, _tbl = WP.learn_wordpiece(_docs(spark, self.TEXTS), 6)
        want = _py_learn_wordpiece(self.TEXTS, 6)
        assert vocab == want

    def test_likelihood_differs_from_bpe_choice(self, spark):
        """The wordpiece objective must be able to pick a pair BPE would
        not: frequent-but-promiscuous symbols score lower than rare pairs
        whose parts only occur together."""
        from buildkite_logs_parquet_spark.operators.text_analysis import (
            bpe_merge_step,
            word_symbol_table,
        )

        # 'q' and 'z' appear ONLY together (qz x3); 'a'/'b' pair 5 times
        # but each also occurs alone many times
        texts = ["qz qz qz", "ab ab ab ab ab", "a a a a a a b b b b b b"]
        df = _docs(spark, texts)
        _w, wp_pair, _s = WP.wordpiece_merge_step(
            WP.wordpiece_symbol_table(df)
        )
        _w2, bpe_pair, _c = bpe_merge_step(word_symbol_table(df))
        assert wp_pair == ("q", "##z")
        assert bpe_pair == ("a", "b")

    def test_learned_vocab_round_trips_training_words(self, spark):
        vocab, _ = WP.learn_wordpiece(_docs(spark, self.TEXTS), 8)
        enc = {
            r["doc_id"]: r
            for r in WP.wordpiece_encode(
                _docs(spark, self.TEXTS), vocab
            ).collect()
        }
        for i, t in enumerate(self.TEXTS):
            # every training word re-assembles from its pieces (no UNK)
            toks = list(enc[i]["tokens"])
            assert WP.UNK not in toks
            rebuilt = "".join(
                tok[len(WP.CONT):] if tok.startswith(WP.CONT) else " " + tok
                for tok in toks
            ).strip()
            assert rebuilt == t.lower()
