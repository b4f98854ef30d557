"""Sequence packing and the distributed prefix-sum primitive."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from buildkite_logs_parquet_spark.operators.packing import (
    pack_sequences,
    with_global_offsets,
)


def test_global_offsets_match_single_window(spark):
    """The 3-step distributed prefix sum equals the textbook global-window
    cumsum, on data spread over many partitions."""
    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
    ).repartition(16)
    got = with_global_offsets(df, "k", "w", out_col="start")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("start", F.coalesce(F.sum("w").over(w), F.lit(0)))
    assert got.select("k", "start").subtract(want.select("k", "start")).count() == 0
    assert want.select("k", "start").subtract(got.select("k", "start")).count() == 0


def test_global_offsets_no_single_task_window(spark):
    """The plan must not contain a global-order (empty partition spec)
    window — the whole point of the primitive."""
    df = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    plan = with_global_offsets(df, "k", "w")._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window .*?windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # every window spec must name a partition column before the sort col
        assert "_pid" in spec, plan


def test_pack_sequences_hand_computed(spark):
    rows = [(0, 4), (1, 5), (2, 3), (3, 10), (4, 2)]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    out = {
        r["seq_id"]: r
        for r in pack_sequences(
            df, "doc_id", capacity=10, weight_col="toks"
        ).collect()
    }
    # layout: starts 0,4,9,12,22 — doc2 straddles seq0/1, doc3 seq1/2
    assert out[0]["n_docs"] == 3 and out[0]["n_tokens"] == 10
    assert out[0]["first_doc"] == 0 and out[0]["last_doc"] == 2
    assert out[1]["n_docs"] == 2 and out[1]["n_tokens"] == 10
    assert out[1]["first_doc"] == 2 and out[1]["last_doc"] == 3
    assert out[2]["n_docs"] == 2 and out[2]["n_tokens"] == 4
    assert out[2]["last_doc"] == 4
    assert len(out) == 3


def test_pack_sequences_invariants_on_documents(spark):
    """Every sequence except the last is exactly full, and filled positions
    sum to the corpus token total — conservation, no positions lost or
    duplicated."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cap = 64
    packed = pack_sequences(docs, "doc_id", "text", capacity=cap).collect()
    from buildkite_logs_parquet_spark.operators.text_analysis import token_count

    total = docs.select(F.sum(token_count(F.col("text")))).first()[0]
    assert sum(r["n_tokens"] for r in packed) == total
    last = max(r["seq_id"] for r in packed)
    for r in packed:
        if r["seq_id"] != last:
            assert r["n_tokens"] == cap, r
    # seq ids are dense 0..last
    assert sorted(r["seq_id"] for r in packed) == list(range(last + 1))


def test_pack_sequences_drops_zero_token_docs(spark):
    rows = [(0, "a b c"), (1, "   "), (2, "d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(df, "doc_id", "text", capacity=10).collect()
    assert len(packed) == 1
    assert packed[0]["n_docs"] == 2 and packed[0]["n_tokens"] == 5


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60),
    st.integers(min_value=2, max_value=17),
)
def test_pack_sequences_matches_python_simulation(spark, weights, capacity):
    """Property: packing equals a literal python concat-and-chunk
    simulation for arbitrary weights and capacities."""
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    got = {
        r["seq_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in pack_sequences(
            df, "doc_id", capacity=capacity, weight_col="toks"
        ).collect()
    }
    # python reference
    want: dict[int, list] = {}
    pos = 0
    for i, w in enumerate(weights):
        for seq in range(pos // capacity, (pos + w - 1) // capacity + 1):
            lo = max(pos, seq * capacity)
            hi = min(pos + w, (seq + 1) * capacity)
            e = want.setdefault(seq, [0, 0, i, i])
            e[0] += 1
            e[1] += hi - lo
            e[3] = i
        pos += w
    assert got == {k: tuple(v) for k, v in want.items()}


# ------------------------------------------------------- document chunking


def test_chunk_documents_hand_computed(spark):
    from buildkite_logs_parquet_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = sorted(
        chunk_documents(docs, "doc_id", window=4, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    # 10 tokens, window 4, stride 3 → windows start at 0,3,6 (covers 6..9)
    assert [r["start_token"] for r in out] == [0, 3, 6]
    assert [r["n_tokens"] for r in out] == [4, 4, 4]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[2]["chunk_text"] == "t6 t7 t8 t9"


def test_chunk_documents_covers_every_token_once_per_overlap(spark):
    from buildkite_logs_parquet_spark.operators.packing import chunk_documents

    import random

    rng = random.Random(3)
    rows = [
        (i, " ".join(f"w{j}" for j in range(rng.randint(1, 40))))
        for i in range(25)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    W, S = 8, 5
    out = chunk_documents(docs, "doc_id", window=W, stride=S).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        n = len(text.split())
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        # full coverage: union of [start, start+n_tokens) == [0, n)
        covered = set()
        for c in chunks:
            covered.update(range(c["start_token"], c["start_token"] + c["n_tokens"]))
        assert covered == set(range(n)), doc_id
        # starts advance by exactly the stride
        assert [c["start_token"] for c in chunks] == [
            i * S for i in range(len(chunks))
        ]
        # reassembling non-overlapping prefixes reproduces the document
        reassembled = chunks[0]["chunk_text"].split()
        for c in chunks[1:]:
            overlap = len(reassembled) - c["start_token"]
            reassembled += c["chunk_text"].split()[overlap:]
        assert reassembled == text.split(), doc_id


def test_chunk_documents_short_doc_single_chunk(spark):
    from buildkite_logs_parquet_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    out = chunk_documents(docs, "doc_id", window=64, stride=48).collect()
    assert len(out) == 1
    assert out[0]["n_tokens"] == 3 and out[0]["chunk_text"] == "a b c"


def test_pack_sequences_by_bpe_token_counts(spark):
    """Composition: encode with learned BPE merges, pack by the REAL token
    counts — conservation must hold (sum of packed tokens == sum of doc
    token counts)."""
    from buildkite_logs_parquet_spark.operators.packing import pack_sequences
    from buildkite_logs_parquet_spark.operators.text_analysis import (
        bpe_encode,
        bpe_merge_step,
        word_symbol_table,
    )

    rows = [
        (i, "low lower newest widest " * (1 + i % 3)) for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cur = word_symbol_table(docs)
    merges = []
    for _ in range(3):
        cur, pair, _ = bpe_merge_step(cur)
        if pair is None:
            break
        merges.append(pair)
        cur = cur.localCheckpoint(eager=True)

    encoded = bpe_encode(docs, merges, "doc_id")
    total_tokens = encoded.agg(F.sum("n_tokens")).first()[0]
    packed = pack_sequences(
        encoded, "doc_id", text_col=None, weight_col="n_tokens", capacity=64
    )
    got = packed.agg(F.sum("n_tokens")).first()[0]
    assert got == total_tokens
    # every sequence except possibly the last is exactly at capacity
    seqs = sorted(packed.collect(), key=lambda r: r["seq_id"])
    for r in seqs[:-1]:
        assert r["n_tokens"] == 64


# ------------------------------------------------ whole-document packing


def test_pack_documents_ffd_hand_instance(spark):
    from buildkite_logs_parquet_spark.operators.packing import (
        pack_documents,
        packing_stats,
    )

    lens = {1: 7, 2: 7, 3: 5, 4: 5, 5: 4, 6: 4}
    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in lens.items()], "doc_id long, text string"
    )
    out = pack_documents(docs, "doc_id", capacity=12, num_partitions=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 6 and not any(r["overflow"] for r in rows.values())
    # FFD on [7,7,5,5,4,4] cap 12 -> {7,5} {7,5} {4,4}: optimal 3 bins
    bins = {}
    for r in rows.values():
        bins.setdefault(r["seq_id"], []).append(r["n_tokens"])
    assert sorted(sorted(b) for b in bins.values()) == [[4, 4], [5, 7], [5, 7]]
    stats = packing_stats(out, 12).first()
    assert stats["n_sequences"] == 3
    assert stats["total_tokens"] == 32
    assert abs(stats["utilization"] - round(32 / 36, 4)) < 1e-9


def test_pack_documents_invariants_and_overflow(spark):
    import random

    from buildkite_logs_parquet_spark.operators.packing import pack_documents

    rng = random.Random(53)
    docs = spark.createDataFrame(
        [(i, "t " * rng.randint(1, 40)) for i in range(200)],
        "doc_id long, text string",
    )
    out = pack_documents(docs, "doc_id", capacity=32, num_partitions=4).collect()
    assert len(out) == 200  # every doc packed exactly once
    per_seq = {}
    for r in out:
        per_seq.setdefault(r["seq_id"], 0)
        per_seq[r["seq_id"]] += r["n_tokens"]
        if r["n_tokens"] > 32:
            assert r["overflow"]
    for sid, tot in per_seq.items():
        docs_in = [r for r in out if r["seq_id"] == sid]
        if not any(r["overflow"] for r in docs_in):
            assert tot <= 32, sid
    # determinism: same fixed partition count -> identical assignment
    again = pack_documents(
        docs.repartition(13), "doc_id", capacity=32, num_partitions=4
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_pack_documents_ffd_beats_ff_on_adversarial_order(spark):
    from pyspark.sql import functions as F

    from buildkite_logs_parquet_spark.operators.packing import (
        pack_documents,
        packing_stats,
    )

    # arrival order interleaves big/small so plain first-fit strands
    # capacity; decreasing order repairs it
    lens = [10, 2, 10, 2, 10, 2, 10, 2, 6, 6, 6, 6]
    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    ffd = packing_stats(
        pack_documents(docs, "doc_id", capacity=12, num_partitions=1), 12
    ).first()
    ff = packing_stats(
        pack_documents(
            docs, "doc_id", capacity=12, num_partitions=1, strategy="ff"
        ),
        12,
    ).first()
    assert ffd["n_sequences"] <= ff["n_sequences"]
    assert ffd["utilization"] >= ff["utilization"]
    assert ffd["n_sequences"] == 6  # 4x(10+2) + 2x(6+6): optimal


class TestTrainingShards:
    def test_manifest_certifies_rows_and_is_deterministic(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.operators.packing import (
            write_training_shards,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = str(tmp_path / "shards")
        m1 = {r["shard"]: r for r in write_training_shards(
            docs, p, "doc_id", 4, token_col="n_chars"
        ).collect()}
        assert set(m1) == {0, 1, 2, 3}
        assert sum(r["n_rows"] for r in m1.values()) == docs.count()
        total_chars = docs.agg(F.sum("n_chars")).first()[0]
        assert sum(r["n_tokens"] for r in m1.values()) == total_chars
        # balanced by hash uniformity: no shard more than 2x the mean
        mean = docs.count() / 4
        assert all(r["n_rows"] < 2 * mean for r in m1.values())
        # rewrite -> identical manifest (content digest included)
        m2 = {r["shard"]: r for r in write_training_shards(
            docs, p, "doc_id", 4, token_col="n_chars"
        ).collect()}
        assert {k: tuple(v) for k, v in m1.items()} == {
            k: tuple(v) for k, v in m2.items()
        }

    def test_digest_detects_content_change(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.operators.packing import (
            write_training_shards,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        full = write_training_shards(
            docs, str(tmp_path / "a"), "doc_id", 2
        ).collect()
        dropped = write_training_shards(
            docs.where("doc_id != 0"), str(tmp_path / "b"), "doc_id", 2
        ).collect()
        d1 = {r["shard"]: r["content_digest"] for r in full}
        d2 = {r["shard"]: r["content_digest"] for r in dropped}
        assert d1 != d2  # a missing row shows up in some shard's digest

    def test_shard_membership_stable_under_growth(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.operators.packing import (
            write_training_shards,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        half = docs.where("doc_id < 50")
        write_training_shards(half, str(tmp_path / "h"), "doc_id", 4)
        small = {
            r["doc_id"]: r["shard"]
            for r in spark.read.parquet(str(tmp_path / "h"))
            .select("doc_id", "shard").collect()
        }
        write_training_shards(docs, str(tmp_path / "f"), "doc_id", 4)
        big = {
            r["doc_id"]: r["shard"]
            for r in spark.read.parquet(str(tmp_path / "f"))
            .select("doc_id", "shard").collect()
        }
        assert all(big[k] == v for k, v in small.items())
