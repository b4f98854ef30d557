"""Deterministic training-example augmentation: T5-style span corruption
and contrastive negative sampling — the example-construction step between
a curated corpus and a training run.

Everything here follows the repo's content-hash randomness rule
(DETERMINISM.md rule 2): every "random" decision is a pure function of
``(seed, key)`` via md5, so the generated examples are identical across
runs, engines, physical layouts, and retries — the property an
auditable data pipeline needs (rerunning a shard regenerates byte-equal
examples) and ``rand()`` cannot give.

Span corruption (Raffel et al. 2020, the T5 denoising objective) is
formulated WITHOUT sequential per-token state so it stays in Catalyst
expressions end to end: each token position independently *starts* a
span with probability ``mask_rate / mean_span`` (hash bucket compare),
span length is ``1 + hash2 % (2·mean_span − 1)`` (mean ``mean_span``),
and overlapping spans simply merge — the same interval-union device as
``dedup.substring_dedup``, computed with one running-max window.  Token
explode → window → two group-bys keyed by document: scales like any
other per-document op, no UDF anywhere.

Negative sampling draws ``k`` pseudo-random corpus documents per anchor
via ``hash(seed, anchor, j) % N`` against a contiguous corpus index
(``packing.with_global_offsets`` — no single-task global window), then
drops collisions with the anchor's own label — the standard
contrastive/embedding-training negative pool, reproducible because the
draw is a content function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 32-bit bucket space for hash-threshold decisions (rule 2)
_B32 = 1 << 32


def _h32(*cols: Column) -> Column:
    """First 8 md5 hex digits of the ':'-joined inputs as a uniform
    integer in [0, 2^32) — the repo's seeded content-hash uniform."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *cols)), 1, 8), 16, 10
    ).cast("long")


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seed: int = 13,
    mask_rate: float = 0.15,
    mean_span: int = 3,
    sentinel: str = "<extra_id_{}>",
) -> DataFrame:
    """Build (input_text, target_text) denoising pairs: masked spans are
    replaced by numbered sentinels in the input; the target lists each
    sentinel followed by the tokens it hid (the exact T5 rendering).

    Returns ``(id, input_text, target_text, n_tokens, n_masked,
    n_spans)``.  Whitespace tokenization (the corpus-side convention);
    documents with no maskable token pass through with empty targets.

    Every decision is ``(seed, id, position)``-hashed: span starts by
    bucket-threshold ``p_start = mask_rate / mean_span``, lengths by a
    second tagged hash, overlaps merged by a per-document running max —
    so the pair set is bit-stable anywhere (oracle-replayable in SQL:
    same md5 arithmetic, same window).
    """
    p_start = int(round(mask_rate / mean_span * _B32))
    span_mod = 2 * mean_span - 1
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    sid = F.lit(str(seed))
    starts = toks.withColumn(
        "_starts",
        _h32(sid, F.lit("s"), F.col(id_col).cast("string"), F.col("pos"))
        < F.lit(p_start),
    ).withColumn(
        "_len",
        F.when(
            F.col("_starts"),
            1
            + _h32(
                sid, F.lit("l"), F.col(id_col).cast("string"), F.col("pos")
            )
            % F.lit(span_mod),
        ).otherwise(F.lit(0)),
    )
    # interval union: masked(pos) = max over j ≤ pos of (j + len_j) > pos
    # — one running-max window per document (substring_dedup's device)
    w = W.partitionBy(id_col).orderBy("pos")
    marked = starts.withColumn(
        "_cover",
        F.max(
            F.when(F.col("_starts"), F.col("pos") + F.col("_len")).otherwise(
                F.lit(0)
            )
        ).over(w),
    ).withColumn("_masked", F.col("_cover") > F.col("pos"))
    # run starts: masked token whose predecessor is unmasked → sentinel k
    # numbered in document order
    runs = marked.withColumn(
        "_run_start",
        F.col("_masked")
        & ~F.coalesce(F.lag("_masked").over(w), F.lit(False)),
    ).withColumn(
        "_sent_idx",
        F.sum(F.col("_run_start").cast("int")).over(w) - 1,
    )
    sent = F.format_string(
        sentinel.replace("{}", "%d"), F.col("_sent_idx").cast("int")
    )
    # input pieces: unmasked tokens verbatim, ONE sentinel at each run
    # start (other masked positions emit nothing); target pieces: the
    # sentinel at each run start plus every masked token
    pieces = runs.select(
        F.col(id_col),
        "pos",
        F.when(~F.col("_masked"), F.col("tok"))
        .when(F.col("_run_start"), sent)
        .alias("in_piece"),
        F.when(
            F.col("_run_start"), F.concat(sent, F.lit(" "), F.col("tok"))
        )
        .when(F.col("_masked"), F.col("tok"))
        .alias("tgt_piece"),
        F.col("_masked").cast("int").alias("m"),
        F.col("_run_start").cast("int").alias("rs"),
    )
    agg = pieces.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("in_piece").isNotNull(),
                            F.struct(F.col("pos"), F.col("in_piece").alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("input_text"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("tgt_piece").isNotNull(),
                            F.struct(F.col("pos"), F.col("tgt_piece").alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("target_text"),
        F.count("*").alias("n_tokens"),
        F.sum("m").alias("n_masked"),
        F.sum("rs").alias("n_spans"),
    )
    # docstring contract: tokenless documents pass through with empty
    # pair text (the explode+filter dropped them before the groupBy, so
    # join the aggregate back onto the full id set)
    return df.select(F.col(id_col)).join(agg, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("input_text"), F.lit("")).alias("input_text"),
        F.coalesce(F.col("target_text"), F.lit("")).alias("target_text"),
        F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
            "n_tokens"
        ),
        F.coalesce(F.col("n_masked"), F.lit(0).cast("long")).alias(
            "n_masked"
        ),
        F.coalesce(F.col("n_spans"), F.lit(0).cast("long")).alias("n_spans"),
    )


def sample_negatives(
    df: DataFrame,
    id_col: str,
    label_col: str | None = None,
    k: int = 4,
    seed: int = 23,
) -> DataFrame:
    """``k`` pseudo-random negative documents per anchor:
    ``draw_j = hash(seed, anchor_id, j) % N`` indexes a contiguous
    corpus numbering (one global row_number by ``id_col``), then draws
    that hit the anchor itself — or, with ``label_col``, share the
    anchor's label — are dropped (so some anchors return fewer than
    ``k``; redraw upstream with a different seed if exact-k matters).

    Returns ``(anchor_id, neg_rank, neg_id[, neg_label])``.  Plan: the
    contiguous corpus numbering comes from ``packing.with_global_offsets``
    (range-partitioned partial sums + a partition-offset broadcast — no
    single-task global window), then a k-way explode on the anchor side
    and ONE equi-join on the drawn index — no sampling operator, no
    rand(), layout-independent by construction.
    """
    from buildkite_logs_parquet_spark.operators.packing import (
        with_global_offsets,
    )

    n = df.count()  # driver scalar: corpus size anchors draw against
    if n < 2:
        raise ValueError("need at least 2 documents to sample negatives")
    keep = [F.col(id_col).alias("neg_id")] + (
        [F.col(label_col).alias("neg_label")] if label_col else []
    )
    indexed = with_global_offsets(
        df.select(*keep).withColumn("_one", F.lit(1).cast("long")),
        order_col="neg_id",
        weight_col="_one",
        out_col="_idx",
    ).drop("_one")
    draws = df.select(
        F.col(id_col).alias("anchor_id"),
        *( [F.col(label_col).alias("_albl")] if label_col else [] ),
        F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("neg_rank"),
    ).withColumn(
        "_idx",
        _h32(
            F.lit(str(seed)),
            F.col("anchor_id").cast("string"),
            F.col("neg_rank").cast("string"),
        )
        % F.lit(n),
    )
    out = draws.join(indexed, on="_idx").where(
        F.col("neg_id") != F.col("anchor_id")
    )
    if label_col:
        out = out.where(
            ~F.col("neg_label").eqNullSafe(F.col("_albl"))
        ).select("anchor_id", "neg_rank", "neg_id", "neg_label")
    else:
        out = out.select("anchor_id", "neg_rank", "neg_id")
    return out
