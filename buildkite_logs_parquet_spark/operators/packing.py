"""Sequence packing: map a document stream onto fixed-capacity training
sequences (concat-and-chunk at the context length), the final assembly step
of an LLM training-data pipeline.

The core primitive is a **distributed exclusive prefix sum** over a global
ordering — the thing a naive ``Window.orderBy`` does in ONE task and this
module does in three metadata-cheap steps:

1. range-partition by the order column (contiguous key ranges per
   partition, shuffled once, persisted so every downstream pass sees the
   same layout);
2. per-partition totals → driver (one row per partition — metadata-sized,
   like the split-offset technique in ``sources/logs.py``) → cumulative
   partition offsets broadcast back;
3. per-partition windows (parallel across partitions) add the in-partition
   exclusive prefix to the broadcast offset.

Every step is horizontal; the only driver data is #partitions rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_offsets(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "start",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = exclusive prefix sum of ``weight_col`` in global
    ``order_col`` order, without a single-task global window.

    The range repartition is persisted before the totals pass so the
    partition layout is computed once and shared by both jobs (range
    boundaries come from a sampling pass; persisting pins one outcome).
    Rows with equal ``order_col`` values land in one partition (range
    partitioner invariant), but their relative order within the window is
    then arbitrary — use a unique order column for deterministic output.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    tagged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = (
        tagged.groupBy("_pid")
        .agg(F.sum(weight_col).alias("_t"), F.min(order_col).alias("_mn"))
        .collect()
    )
    offsets, acc = [], 0
    for r in sorted(totals, key=lambda r: r["_mn"]):  # ranges are ordered
        offsets.append((r["_pid"], acc))
        acc += r["_t"]
    odf = spark.createDataFrame(offsets, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.join(F.broadcast(odf), "_pid")
        .withColumn(
            out_col,
            (F.coalesce(F.sum(weight_col).over(w), F.lit(0)) + F.col("_off")).cast(
                "long"
            ),
        )
        .drop("_pid", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    capacity: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid end-to-end in
    ``id_col`` order and cut into sequences of exactly ``capacity`` tokens
    (the last sequence may be short) — GPT-style training assembly, where
    a document may straddle a sequence boundary.

    Returns one row per sequence: ``seq_id``, ``n_docs`` (documents
    overlapping the sequence), ``n_tokens`` (token positions filled —
    ``capacity`` everywhere but the tail), ``first_doc``/``last_doc``.

    Token weights default to the whitespace token count of ``text_col``;
    pass ``weight_col`` to pack by a precomputed budget (e.g. a real
    tokenizer's counts).  Zero-token documents are dropped — they occupy
    no positions, so they have no sequence to belong to.

    Plan: prefix-sum (see ``with_global_offsets``) → per-doc sequence span
    by integer division → explode the span → groupBy seq_id.  The explode
    fan-out is bounded by ceil(doc_tokens / capacity) + 1, so the shuffle
    is proportional to corpus tokens / capacity.
    """
    from buildkite_logs_parquet_spark.operators.text_analysis import token_count

    weight = F.col(weight_col) if weight_col else token_count(F.col(text_col))
    base = (
        df.select(F.col(id_col), weight.cast("long").alias("_w"))
        .where(F.col("_w") > 0)
    )
    started = with_global_offsets(base, id_col, "_w", out_col="_start")
    spans = started.select(
        F.col(id_col),
        "_w",
        "_start",
        F.expr(f"_start DIV {capacity}").alias("_first_seq"),
        F.expr(f"(_start + _w - 1) DIV {capacity}").alias("_last_seq"),
    )
    exploded = spans.select(
        F.col(id_col),
        "_w",
        "_start",
        F.explode(F.sequence("_first_seq", "_last_seq")).alias("seq_id"),
    )
    contrib = F.least(
        F.col("_start") + F.col("_w"), (F.col("seq_id") + 1) * capacity
    ) - F.greatest(F.col("_start"), F.col("seq_id") * capacity)
    return exploded.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(contrib).alias("n_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Within-document sliding-window chunking: split each document's
    token stream into windows of ``window`` tokens advancing by
    ``stride`` (overlap = ``window - stride``) — the standard context
    windowing step for training/embedding pipelines, complementary to
    ``pack_sequences`` (which concatenates ACROSS documents).

    Every token index is covered; the last window is the remainder (shorter
    than ``window``) unless a full window already reaches the end.  A
    document shorter than ``window`` yields exactly one chunk.

    100 TB shape: a pure narrow map + explode — no shuffle at all; chunk
    rows inherit the scan's partitioning.  Output is (id, chunk_id,
    start_token, n_tokens, chunk_text).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError("stride > window would drop tokens")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    # number of windows: 1 + ceil(max(n - window, 0) / stride)
    n_win = 1 + F.ceil(
        F.greatest(n - window, F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * stride).alias("start_token"),
            F.slice(words, i * stride + 1, window).alias("_toks"),
        ),
    )
    exploded = df.select(F.col(id_col), F.explode(chunks).alias("_c"))
    return exploded.select(
        F.col(id_col),
        F.col("_c.chunk_id").alias("chunk_id"),
        F.col("_c.start_token").alias("start_token"),
        F.size("_c._toks").alias("n_tokens"),
        F.array_join("_c._toks", " ").alias("chunk_text"),
    )


def pack_documents(
    df: DataFrame,
    id_col: str,
    capacity: int = 64,
    text_col: str = "text",
    weight_col: str | None = None,
    strategy: str = "ffd",
    num_partitions: int | None = None,
) -> DataFrame:
    """WHOLE-document sequence packing — no document ever straddles a
    sequence boundary (the SFT/instruction-tuning discipline, where
    ``pack_sequences``' GPT-style concat-and-chunk boundary crossings are
    harmful).  Here packing efficiency is a real training-cost lever:
    unfilled positions are padding, so fewer/better-filled bins = fewer
    wasted FLOPs.

    ``strategy="ffd"`` runs first-fit-DECREASING inside each partition
    (the classic ≤ 11/9·OPT + 1 bound); ``"ff"`` is first-fit in id
    order, which preserves document locality at slightly worse fill.
    Documents longer than ``capacity`` get a singleton sequence flagged
    ``overflow`` (chunk them first with ``chunk_documents`` if that's
    unacceptable).

    100 TB shape: ONE range exchange by id into ``num_partitions``
    deterministic groups, then an Arrow-batched per-partition pack —
    bins never cross partitions, so the only approximation versus a
    (inherently sequential) global greedy is one partial bin per
    partition: waste ≤ #partitions · capacity, negligible against corpus
    tokens.  ``seq_id`` packs (partition, local bin) so ids are globally
    unique and deterministic (range partitioning on a unique id with a
    FIXED partition count is layout-independent).

    Output: one row per document — ``(id, n_tokens, seq_id, overflow)``;
    aggregate with ``packing_stats`` for the utilization report.
    """
    if strategy not in ("ffd", "ff"):
        raise ValueError("strategy must be 'ffd' or 'ff'")
    from buildkite_logs_parquet_spark.operators.text_analysis import token_count

    weight = (
        F.col(weight_col) if weight_col else token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col), weight.cast("long").alias("_w")
    ).where(F.col("_w") > 0)
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = base.repartitionByRange(n, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_tokens long, seq_id long, overflow boolean"
    )
    cap = int(capacity)
    decreasing = strategy == "ffd"

    def pack(pdf):
        import pandas as pd

        pid = int(pdf["_pid"].iloc[0]) if len(pdf) else 0
        order = (
            pdf.sort_values(["_w", id_col], ascending=[False, True])
            if decreasing
            else pdf.sort_values([id_col])
        )
        remaining: list[int] = []  # bin index -> free positions
        ids, toks, seqs, over = [], [], [], []
        for doc, w in zip(order[id_col], order["_w"]):
            w = int(w)
            if w > cap:
                remaining.append(0)  # full singleton bin
                b = len(remaining) - 1
                ov = True
            else:
                for b, free in enumerate(remaining):
                    if free >= w:
                        remaining[b] = free - w
                        break
                else:
                    remaining.append(cap - w)
                    b = len(remaining) - 1
                ov = False
            ids.append(doc)
            toks.append(w)
            seqs.append((pid << 40) + b)
            over.append(ov)
        return pd.DataFrame(
            {id_col: ids, "n_tokens": toks, "seq_id": seqs, "overflow": over}
        )

    return parts.groupBy("_pid").applyInPandas(pack, schema=out_schema)


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """One-row utilization report for ``pack_documents`` output: sequence
    count, token totals, and ``utilization`` = tokens / (sequences ×
    capacity) over the non-overflow bins — the padding-waste metric."""
    per_seq = packed.where(~F.col("overflow")).groupBy("seq_id").agg(
        F.sum("n_tokens").alias("_t")
    )
    return per_seq.agg(
        F.count("*").alias("n_sequences"),
        F.sum("_t").alias("total_tokens"),
        F.round(
            F.sum("_t") / (F.count("*") * F.lit(int(capacity))), 4
        ).alias("utilization"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: int = 42,
    token_col: str | None = None,
) -> DataFrame:
    """Export the corpus as ``n_shards`` content-sharded parquet
    directories plus a per-shard MANIFEST — the handoff artifact a
    training job verifies before consuming (row/token counts and a
    content digest per shard, so truncated or double-written shards are
    caught before a run, not during one).

    Shard membership is ``hash_bucket(key) % n_shards`` — a pure content
    hash, so a row's shard never changes as the corpus grows (the
    ``split_assign`` property) and shards are balanced by hash
    uniformity.  Rows are written sorted by (shuffle key, key) within
    each shard: concatenating shards in order replays the
    ``corpus_shuffle`` permutation.

    The manifest is computed by READING BACK the written files — it
    certifies the bytes on disk, not the plan that produced them:
    ``(shard, n_rows, n_tokens, content_digest)`` with the digest an
    order-independent DECIMAL sum of per-row content hashes.

    100 TB shape: one hash-partitioned shuffle to write (skew-free by
    uniformity), one scan of the written lake for the manifest
    (aggregate bounded at ``n_shards`` rows).
    """
    from buildkite_logs_parquet_spark.operators.curation import hash_bucket

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.col(key_col)
    tagged = df.withColumn(
        "shard", (hash_bucket(key, seed) % F.lit(int(n_shards))).cast("int")
    ).withColumn("shuffle_key", hash_bucket(key, seed + 1))
    (
        tagged.repartition(int(n_shards), "shard")
        .sortWithinPartitions("shard", "shuffle_key", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    back = df.sparkSession.read.parquet(path)
    digest = F.sum(
        hash_bucket(F.col(key_col), seed + 2).cast("decimal(38,0)")
    ).alias("content_digest")
    toks = (
        F.sum(F.col(token_col)).alias("n_tokens")
        if token_col
        else F.lit(None).cast("long").alias("n_tokens")
    )
    return back.groupBy("shard").agg(
        F.count("*").alias("n_rows"), toks, digest
    )
