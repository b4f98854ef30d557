"""Unigram language-model tokenizer (Kudo 2018, the SentencePiece
`--model_type=unigram` algorithm) trained on a corpus with Spark.

The second of the two standard subword tokenizers (BPE is in
``text_analysis``): a vocabulary of pieces with unigram
log-probabilities, trained by EM over all segmentations of each word,
then applied with Viterbi decoding.

Reference parity note: the reference engine (wolfeidau/
buildkite-logs-parquet) has no tokenizer surface — this module is part
of the LLM-training-data extension tier, sharing the
``word_symbol_table`` corpus reduction with the BPE trainer.

100 TB shape (the same discipline as ``learn_bpe``): the corpus is
touched ONCE to build the word/frequency table (vocabulary-sized —
orders of magnitude smaller than the corpus); every EM iteration is one
Arrow-batched pass over the WORD table with the current vocabulary as a
broadcast closure, reduced to |vocab| expected-count rows.  Driver
traffic per iteration is one vocabulary-sized collect — never corpus
rows.  Encoding is embarrassingly parallel ``mapInPandas`` with a
per-batch word cache.

Determinism discipline (DETERMINISM.md): per-word forward-backward runs
in a fixed order so each word's posterior piece counts are bit-stable;
cross-word aggregation rounds them to 9 dp and sums DECIMAL —
order-independent.  Seed selection and pruning order by (count desc,
piece asc); Viterbi ties prefer the longer final piece.  The learned
vocabulary is therefore a pure function of the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_seed_vocab(
    words: DataFrame,
    max_piece_len: int = 6,
    max_vocab: int = 4000,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[str, int]]:
    """Seed piece inventory: every substring of every distinct word up to
    ``max_piece_len`` chars, scored by frequency-weighted occurrence
    count; the top ``max_vocab`` multi-char pieces PLUS every single
    character (single chars are never dropped — they guarantee any word
    stays segmentable through every pruning round).

    One explode over the (already vocabulary-sized) word table and one
    piece-keyed aggregate; the top-k is a TakeOrdered merge, not a
    global sort.  Returns driver-side ``(piece, weighted_count)`` rows —
    vocabulary-sized by construction.
    """
    w = F.col(word_col)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(w), F.lit(1))),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(int(max_piece_len)), F.length(w) - i + 1),
                ),
                lambda l: w.substr(i, l),
            ),
        )
    )
    counted = (
        words.select(F.col(freq_col), F.explode(subs).alias("piece"))
        .where(F.length("piece") >= 1)
        .groupBy("piece")
        .agg(F.sum(freq_col).alias("c"))
    )
    singles = [
        (r["piece"], int(r["c"]))
        for r in counted.where(F.length("piece") == 1).collect()
    ]
    multis = [
        (r["piece"], int(r["c"]))
        for r in counted.where(F.length("piece") > 1)
        .orderBy(F.col("c").desc(), "piece")
        .limit(int(max_vocab))
        .collect()
    ]
    return sorted(singles + multis, key=lambda t: (-t[1], t[0]))


def _forward_backward(word: str, logp: dict[str, float], max_len: int):
    """Expected piece counts and NLL for ONE word under the unigram model
    (all-segmentations forward-backward in log space, fixed iteration
    order).  Returns ``(counts: dict[piece, posterior], nll)`` or
    ``(None, None)`` if the word cannot be segmented (impossible while
    all single chars remain in the vocabulary)."""
    n = len(word)
    neg = float("-inf")
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    spans = []  # (j, i, piece_logp, piece)
    for i in range(1, n + 1):
        acc = neg
        for j in range(max(0, i - max_len), i):
            p = word[j:i]
            lp = logp.get(p)
            if lp is None or alpha[j] == neg:
                continue
            spans.append((j, i, lp, p))
            t = alpha[j] + lp
            acc = t if acc == neg else (max(acc, t) + math.log1p(math.exp(-abs(acc - t))))
        alpha[i] = acc
    if alpha[n] == neg:
        return None, None
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = neg
        for j2 in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(word[i:j2])
            if lp is None or beta[j2] == neg:
                continue
            t = lp + beta[j2]
            acc = t if acc == neg else (max(acc, t) + math.log1p(math.exp(-abs(acc - t))))
        beta[i] = acc
    z = alpha[n]
    counts: dict[str, float] = {}
    for j, i, lp, p in spans:
        if beta[i] == neg:
            continue
        post = math.exp(alpha[j] + lp + beta[i] - z)
        counts[p] = counts.get(p, 0.0) + post
    return counts, -z


def unigram_em_step(
    words: DataFrame,
    vocab_logp: dict[str, float],
    word_col: str = "word",
    freq_col: str = "freq",
    round_to: int = 9,
) -> DataFrame:
    """ONE EM E-step: expected piece counts over the word table under the
    broadcast ``vocab_logp``, plus the total NLL, as a DataFrame of
    ``(piece, expected decimal(38,9), nll decimal(38,9))`` — |vocab|+1
    rows (the NLL travels on the sentinel piece ``''``).

    Arrow-batched ``mapInPandas`` over the word table (NOT the corpus);
    per-word float posteriors are deterministic (fixed loop order), and
    the cross-word reduce rounds to ``round_to`` dp then DECIMAL-sums —
    order-independent, so the whole EM trajectory is reproducible.
    """
    import pandas as pd

    max_len = max(len(p) for p in vocab_logp)
    lp = dict(vocab_logp)

    def gen(batches):
        for pdf in batches:
            acc: dict[str, float] = {}
            nll_total = 0.0
            for word, freq in zip(pdf[word_col], pdf[freq_col]):
                counts, nll = _forward_backward(str(word), lp, max_len)
                if counts is None:
                    continue
                f = float(freq)
                for p, c in counts.items():
                    acc[p] = acc.get(p, 0.0) + round(f * c, round_to)
                nll_total += round(f * nll, round_to)
            out = pd.DataFrame(
                {
                    "piece": list(acc.keys()) + [""],
                    "expected": [round(v, round_to) for v in acc.values()]
                    + [0.0],
                    "nll": [0.0] * len(acc) + [round(nll_total, round_to)],
                }
            )
            yield out

    partials = words.mapInPandas(gen, "piece string, expected double, nll double")
    d = f"decimal(38,{round_to})"
    return partials.groupBy("piece").agg(
        F.sum(F.col("expected").cast(d)).alias("expected"),
        F.sum(F.col("nll").cast(d)).alias("nll"),
    )


def learn_unigram(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    max_piece_len: int = 6,
    seed_factor: int = 4,
    em_iters_per_round: int = 2,
    shrink: float = 0.75,
    max_rounds: int = 10,
) -> tuple[dict[str, float], list[dict]]:
    """Train a unigram tokenizer to ``vocab_size`` pieces: seed with the
    top ``seed_factor × vocab_size`` substrings, then alternate EM
    (``unigram_em_step``) with count-based pruning (drop the lowest-
    expected multi-char pieces, keep all single chars) shrinking by
    ``shrink`` per round until the target size, plus one final EM.

    Pruning by expected count is the standard simplification of
    SentencePiece's loss-delta prune; both keep the EM fixed point.
    Returns ``(vocab_logp, history)`` — history rows carry per-round
    ``vocab`` size and total ``nll`` for convergence audits.

    The corpus is scanned once (word table); each round is
    ``em_iters_per_round`` word-table passes.  All selection orders are
    (count desc, piece asc) — the learned vocab is corpus-deterministic.
    """
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        word_symbol_table,
    )

    words = (
        word_symbol_table(df, text_col)
        .select("word", "freq")
        .localCheckpoint(eager=True)  # the EM loop re-reads it every pass
    )
    seed = unigram_seed_vocab(
        words, max_piece_len, int(vocab_size) * int(seed_factor)
    )
    total = sum(c for _, c in seed) or 1
    vocab = {p: math.log(c / total) for p, c in seed}
    history: list[dict] = []
    for rnd in range(1, int(max_rounds) + 1):
        counts: dict[str, float] = {}
        nll = 0.0
        for _ in range(int(em_iters_per_round)):
            rows = unigram_em_step(words, vocab).collect()
            counts = {}
            nll = 0.0
            for r in rows:
                if r["piece"] == "":
                    nll = float(r["nll"])
                else:
                    counts[r["piece"]] = float(r["expected"])
            tot = sum(counts.values()) or 1.0
            vocab = {
                p: math.log(c / tot) for p, c in counts.items() if c > 0.0
            }
            # single chars must survive even at zero posterior mass
            for p, _c in seed:
                if len(p) == 1 and p not in vocab:
                    vocab[p] = math.log(1e-12)
        history.append({"round": rnd, "vocab": len(vocab), "nll": nll})
        if len(vocab) <= int(vocab_size):
            break
        keep = max(
            int(vocab_size),
            int(len(vocab) * float(shrink)),
        )
        multis = sorted(
            ((p, counts.get(p, 0.0)) for p in vocab if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )
        singles = [p for p in vocab if len(p) == 1]
        budget = max(keep - len(singles), 0)
        kept = {p for p, _ in multis[:budget]} | set(singles)
        vocab = {p: lp for p, lp in vocab.items() if p in kept}
    return vocab, history


def _viterbi(
    word: str, logp: dict[str, float], max_len: int
) -> list[str] | None:
    """Max-probability segmentation of ONE word (module-level so tests
    can drive the exact production algorithm against brute-force
    enumeration).  Ties prefer the smaller back-pointer j — the LONGER
    final piece — via strict ``>``; unreachable words return None."""
    n = len(word)
    neg = float("-inf")
    best = [neg] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            p = logp.get(word[j:i])
            if p is None or best[j] == neg:
                continue
            s = best[j] + p
            if s > best[i]:
                best[i] = s
                back[i] = j
    if best[n] == neg:
        return None
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_encode(
    df: DataFrame,
    vocab_logp: dict[str, float],
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Viterbi-encode every document with a learned unigram vocabulary:
    per word, the max-log-probability segmentation (ties prefer the
    LONGER final piece, deterministically).  Same whitespace/lowercase
    normalization as ``bpe_encode``; same output contract:
    ``(id, n_tokens, tokens array<string>)``.

    Arrow-batched ``mapInPandas`` with the vocabulary in the closure
    (broadcast once per executor) and a per-batch word cache — encoding
    cost is per DISTINCT word per batch, not per occurrence.
    """
    import pandas as pd

    max_len = max(len(p) for p in vocab_logp)
    lp = dict(vocab_logp)
    id_type = df.schema[id_col].dataType.simpleString()

    def viterbi(word: str) -> list[str] | None:
        return _viterbi(word, lp, max_len)

    def gen(batches):
        for pdf in batches:
            cache: dict[str, list[str] | None] = {}
            ids, ntoks, toks = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                pieces: list[str] = []
                for w in str(text).lower().strip().split():
                    if w not in cache:
                        cache[w] = viterbi(w)
                    seg = cache[w]
                    if seg is not None:
                        pieces.extend(seg)
                ids.append(rid)
                ntoks.append(len(pieces))
                toks.append(pieces)
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": ntoks, "tokens": toks}
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} {id_type}, n_tokens long, tokens array<string>"
    )
