"""Deterministic augmentation: span corruption + negative sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.augment import (
    _B32,
    sample_negatives,
    span_corruption,
)


def _h32(*parts: str) -> int:
    return int(hashlib.md5(":".join(parts).encode()).hexdigest()[:8], 16)


def _span_corruption_py(
    doc_id: str,
    text: str,
    seed: int = 13,
    mask_rate: float = 0.15,
    mean_span: int = 3,
):
    """Sequential reference of the hash-span scheme."""
    toks = [t for t in text.strip().split() if t]
    p_start = int(round(mask_rate / mean_span * _B32))
    span_mod = 2 * mean_span - 1
    cover = 0
    masked = []
    for pos, _ in enumerate(toks):
        if _h32(str(seed), "s", doc_id, str(pos)) < p_start:
            ln = 1 + _h32(str(seed), "l", doc_id, str(pos)) % span_mod
            cover = max(cover, pos + ln)
        masked.append(cover > pos)
    inp, tgt, sent = [], [], -1
    for pos, tok in enumerate(toks):
        if masked[pos]:
            if pos == 0 or not masked[pos - 1]:
                sent += 1
                inp.append(f"<extra_id_{sent}>")
                tgt.append(f"<extra_id_{sent}> {tok}")
            else:
                tgt.append(tok)
        else:
            inp.append(tok)
    return {
        "input_text": " ".join(inp),
        "target_text": " ".join(tgt),
        "n_tokens": len(toks),
        "n_masked": sum(masked),
        "n_spans": sent + 1,
    }


class TestSpanCorruption:
    def test_matches_sequential_reference(self, spark):
        rows = [
            (i, " ".join(f"w{i}t{j}" for j in range(30))) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r.asDict()
            for r in span_corruption(df, "doc_id", mask_rate=0.4).collect()
        }
        for i, text in rows:
            want = _span_corruption_py(str(i), text, mask_rate=0.4)
            g = got[i]
            for k, v in want.items():
                assert g[k] == v, (i, k, g[k], v)

    def test_roundtrip_reconstructs_document(self, spark):
        # merging input around sentinels with the target spans must give
        # back the original token sequence
        rows = [(i, " ".join(f"x{j}" for j in range(50))) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for r in span_corruption(df, "doc_id", mask_rate=0.5).collect():
            spans = {}
            cur = None
            for tok in r["target_text"].split():
                if tok.startswith("<extra_id_"):
                    cur = tok
                    spans[cur] = []
                else:
                    spans[cur].append(tok)
            out = []
            for tok in r["input_text"].split():
                out.extend(spans[tok] if tok in spans else [tok])
            assert out == rows[r["doc_id"]][1].split()

    def test_mask_rate_in_expected_range(self, spark):
        rows = [(i, " ".join(f"t{j}" for j in range(200))) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        agg = span_corruption(df, "doc_id").agg(
            F.sum("n_masked").alias("m"), F.sum("n_tokens").alias("t")
        ).first()
        rate = agg["m"] / agg["t"]
        assert 0.10 < rate < 0.20  # target 0.15

    def test_deterministic_across_layouts(self, spark):
        rows = [(i, " ".join(f"y{j}" for j in range(40))) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(
            map(tuple, span_corruption(df, "doc_id").collect())
        )
        b = sorted(
            map(tuple, span_corruption(df.repartition(7), "doc_id").collect())
        )
        assert a == b

    def test_unmasked_doc_passes_through(self, spark):
        # single-token docs rarely mask; force a seed where pos 0 stays
        df = spark.createDataFrame([(1, "lonely")], "doc_id long, text string")
        r = span_corruption(df, "doc_id", seed=13).collect()[0]
        ref = _span_corruption_py("1", "lonely", seed=13)
        assert r["input_text"] == ref["input_text"]
        assert r["target_text"] == ref["target_text"]


class TestSampleNegatives:
    def test_draws_match_hash_formula(self, spark):
        docs = [(f"d{i:03d}", f"l{i % 3}") for i in range(25)]
        df = spark.createDataFrame(docs, "doc_id string, label string")
        got = sample_negatives(df, "doc_id", k=5, seed=23)
        rows = {(r["anchor_id"], r["neg_rank"]): r["neg_id"] for r in got.collect()}
        ordered = sorted(d for d, _ in docs)
        for d, _ in docs:
            for j in range(1, 6):
                idx = _h32("23", d, str(j)) % len(docs)
                want = ordered[idx]
                if want == d:
                    assert (d, j) not in rows
                else:
                    assert rows[(d, j)] == want

    def test_label_exclusion(self, spark):
        docs = [(f"d{i}", f"l{i % 2}") for i in range(20)]
        df = spark.createDataFrame(docs, "doc_id string, label string")
        got = sample_negatives(df, "doc_id", label_col="label", k=8).collect()
        lbl = dict(docs)
        assert got  # some negatives survive
        for r in got:
            assert r["neg_label"] != lbl[r["anchor_id"]]
            assert r["neg_id"] != r["anchor_id"]

    def test_deterministic_across_layouts(self, spark):
        docs = [(f"d{i}", "x") for i in range(30)]
        df = spark.createDataFrame(docs, "doc_id string, label string")
        a = sorted(map(tuple, sample_negatives(df, "doc_id", k=3).collect()))
        b = sorted(
            map(
                tuple,
                sample_negatives(df.repartition(11), "doc_id", k=3).collect(),
            )
        )
        assert a == b

    def test_tiny_corpus_raises(self, spark):
        df = spark.createDataFrame([("only", "l")], "doc_id string, label string")
        with pytest.raises(ValueError, match="at least 2"):
            sample_negatives(df, "doc_id")


# ------------------------------------------------------ hypothesis suites

from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(_word, min_size=0, max_size=25), min_size=1, max_size=6
    ),
    st.integers(min_value=0, max_value=9999),
)
def test_span_corruption_roundtrip_property(spark, docs, seed):
    """For ANY corpus and seed: targets + input reconstruct every
    document, masked counts agree with the sequential reference, and
    tokenless docs pass through with empty pairs."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in span_corruption(
            df, "doc_id", seed=seed, mask_rate=0.45
        ).collect()
    }
    assert set(out) == {i for i, _ in rows}
    for i, text in rows:
        r = out[i]
        ref = _span_corruption_py(str(i), text, seed=seed, mask_rate=0.45)
        assert r["input_text"] == ref["input_text"]
        assert r["target_text"] == ref["target_text"]
        assert r["n_masked"] == ref["n_masked"]
        # reconstruction
        spans, cur = {}, None
        for tok in r["target_text"].split():
            if tok.startswith("<extra_id_"):
                cur = tok
                spans[cur] = []
            elif cur is not None:
                spans[cur].append(tok)
        rebuilt = []
        for tok in r["input_text"].split():
            rebuilt.extend(spans[tok] if tok in spans else [tok])
        assert rebuilt == text.split()


@settings(max_examples=8, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=30), min_size=2, max_size=12),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=999),
)
def test_sample_negatives_formula_property(spark, ids, k, seed):
    """The drawn negative for (anchor, j) is ALWAYS the hash-indexed
    document of the sorted corpus — independent of layout."""
    import hashlib

    docs = sorted(f"d{i:02d}" for i in ids)
    df = spark.createDataFrame([(d, "x") for d in docs], "doc_id string, l string")
    got = {
        (r["anchor_id"], r["neg_rank"]): r["neg_id"]
        for r in sample_negatives(df.repartition(3), "doc_id", k=k, seed=seed).collect()
    }
    for d in docs:
        for j in range(1, k + 1):
            idx = int(
                hashlib.md5(f"{seed}:{d}:{j}".encode()).hexdigest()[:8], 16
            ) % len(docs)
            want = docs[idx]
            if want == d:
                assert (d, j) not in got
            else:
                assert got[(d, j)] == want
