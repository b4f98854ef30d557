"""Distributed quality-classifier training: hashed bag-of-words
features + logistic regression by full-batch gradient descent.

The real-pipeline role: large curation pipelines train a lightweight
linear quality filter (GPT-3's LR-over-features quality classifier,
CCNet's fastText filters) against weak labels (a reference corpus, or a
heuristic like Gopher quality) and score every document with it.  This
module is that loop, Spark-first:

* :func:`hashed_features` — fastText-style feature hashing: tokens →
  md5-hash buckets (engine-portable, same idiom as dedup.py) →
  exploded ``(doc_id, feat, cnt)`` long format.  The shuffle is bounded
  by Σ distinct tokens per doc, never vocabulary size; ``dim`` caps the
  model.
* :func:`lr_step` — ONE full-batch GD step: margins via a BROADCAST
  weights join (the model is ≤ dim rows — always the small side), a
  per-doc aggregate, then per-feature gradient sums.  Two shuffles per
  step (by doc, then by feature ≤ dim) — the minimum for exact batch
  gradients.
* :func:`lr_train` — the epoch loop; like ``similarity.kmeans_fit``
  the evolving state (≤ dim weight rows) re-enters each round tiny and
  bounded, each epoch is one pass over the features.
* :func:`lr_score` — score any corpus with a trained model (broadcast
  join + per-doc aggregate, one shuffle).

Determinism discipline (DETERMINISM.md): weights live on a 9-dp
decimal grid; margins are EXACT decimal sums of ``cnt × w``; the
squashing function is the HARD sigmoid ``clamp(0.5 + m/4, 0, 1)``
(the first-order expansion of σ at 0 — the same surrogate BinaryConnect
/ Keras ``hard_sigmoid`` use), so the probability grid is exact decimal
arithmetic too and there is NO transcendental anywhere in the training
trajectory: it is reproducible bit-for-bit across engines, partition
counts, and run orders — measured, not hoped (the smooth-sigmoid
variant was tried first and the DuckDB replay differed in 2/500 scores
at the 6th decimal from cross-engine ``exp()`` ULPs straddling the
rounding boundary; the hard-sigmoid grid closed that by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal types for exact cross-engine aggregation (margins/grads are
#: sums of 9-dp/6-dp fixed-point values — wide enough to never overflow)
_DEC_W = "decimal(20,9)"
_DEC_SUM = "decimal(38,9)"
_DEC_P = "decimal(16,6)"


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    seed: int = 0,
    lowercase: bool = True,
) -> DataFrame:
    """Hashed bag-of-words: ``(doc_id, feat, cnt)`` with ``feat`` in
    ``[0, dim)`` — md5 of the (seeded) token mod dim, the same
    engine-portable hash idiom as dedup.py's ``_hash64``."""
    tok = F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")
    ).alias("tok")
    base = docs.select(F.col(id_col), tok).where(F.col("tok") != "")
    word = F.lower(F.col("tok")) if lowercase else F.col("tok")
    feat = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), word)), 1, 15),
            16,
            10,
        ).cast("long")
        % dim
    ).alias("feat")
    return (
        base.select(id_col, feat)
        .groupBy(id_col, "feat")
        .agg(F.count("*").cast("int").alias("cnt"))
    )


def _margins(
    features: DataFrame, weights: DataFrame, id_col: str
) -> DataFrame:
    """Per-doc decimal-exact margin Σ cnt·w under the current model;
    docs whose features all miss the model get margin 0."""
    j = features.join(F.broadcast(weights), "feat", "left")
    return j.groupBy(id_col).agg(
        F.coalesce(
            F.sum(
                F.col("cnt").cast(_DEC_SUM)
                * F.coalesce(F.col("w"), F.lit(0)).cast(_DEC_W)
            ),
            F.lit(0).cast(_DEC_SUM),
        ).alias("margin")
    )


def _margins9(
    features: DataFrame, weights: DataFrame, id_col: str
) -> DataFrame:
    """Per-doc margin as the exact scale-9 INTEGER ``m9 = Σ cnt·w9``
    (``w9 = round(w·10^9)`` recovers the grid integer of a 9-dp weight).
    The integer twin of ``_margins`` for the exact-grid path: no decimal
    scale-down exists anywhere, so no engine rounding mode can matter."""
    j = features.join(F.broadcast(weights), "feat", "left")
    w9 = F.expr("cast(round(coalesce(w, 0d) * 1e9) as bigint)")
    return j.groupBy(id_col).agg(
        F.coalesce(F.sum(F.col("cnt") * w9), F.lit(0)).alias("m9")
    )


def _prob6_expr() -> "F.Column":
    """Hard sigmoid on the 6-dp grid as an exact INTEGER over a column
    named ``m9``: ``p6 = (2·(2·10^9 + clamp(m9)) + 4000) div 8000`` —
    algebraically equal to ``round(0.5 + 0.25·m, 6)`` under HALF_UP,
    with the half-up division spelled out so no engine's round() (or
    decimal scale-down mode) is on the path."""
    return F.expr(
        "(2 * (2000000000"
        " + greatest(-2000000000, least(2000000000, m9))) + 4000)"
        " div 8000"
    )


def _prob(margin_col):
    """Hard sigmoid on the 6-dp grid, ALL in exact decimal arithmetic:
    clamp the margin to [-2, 2] (outside it the function saturates to
    exactly 0/1), scale by the exact decimal 0.25, shift by 0.5, round.
    No doubles, no libm — bit-identical on any engine."""
    m = F.greatest(
        F.lit(-2).cast(_DEC_SUM),
        F.least(F.lit(2).cast(_DEC_SUM), margin_col.cast(_DEC_SUM)),
    ).cast("decimal(11,9)")  # safe: value already in [-2, 2]
    p = F.lit(0.5).cast("decimal(2,1)") + m * F.lit(0.25).cast("decimal(3,2)")
    return F.round(p, 6).cast(_DEC_P)


def lr_step(
    features: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    n_docs: int,
    lr: float = 0.5,
    id_col: str = "doc_id",
    label_col: str = "label",
    lr_rational: tuple[int, int] | None = None,
) -> DataFrame:
    """One exact full-batch gradient-descent step of logistic
    regression: ``w ← round(w − lr · Σ_docs (p − y)·cnt / n, 9)``.

    ``weights`` is ``(feat, w)`` (≤ dim rows; an EMPTY DataFrame is the
    all-zero model).  ``n_docs`` is the batch size — a driver scalar the
    caller computes once (metadata-sized).  Features absent from the
    model but present in the batch enter at their first gradient.

    ``lr_rational=(num, den)``: run the WHOLE step in pure integer
    arithmetic on the exact grids — margins ``m9 = Σ cnt·w9`` (scale-9
    longs, ``_margins9``), probabilities via the spelled-out half-up
    ``_prob6_expr`` (scale-6 longs), gradients ``g6 = Σ resid6·cnt``,
    update ``w9' = w9 − half_away(num·g6·10^3, den·n)``.  The default
    decimal/double path has TWO engine-sensitive steps the integer path
    eliminates (both observed diverging at sf0.1, rule 13): the
    decimal scale-down inside ``_prob`` (a double-rounding when the
    margin carries more than 9 fractional digits) and the final
    ``round(double, 9)`` re-quantization (engines disagree at 9-dp
    midpoints).  Oracle-gated callers use the rational path;
    ``lr_train`` keeps the float path for arbitrary learning rates.
    """
    if lr_rational is not None:
        num, den = (int(x) for x in lr_rational)
        if num <= 0 or den <= 0:
            raise ValueError("lr_rational must be positive integers")
        b = den * int(n_docs)
        m9 = _margins9(features, weights, id_col)
        resid = m9.join(labels.select(id_col, label_col), id_col).select(
            id_col,
            (
                _prob6_expr()
                - F.col(label_col).cast("long") * F.lit(1_000_000)
            ).alias("resid6"),
        )
        # corpus-wide per-feature gradients sum in DECIMAL(38,0): a long
        # sum wraps silently once Σ|resid6·cnt| approaches 2^63 — easily
        # reached at corpus scale with few hash buckets (the per-doc
        # m9/resid6 values above stay far inside long range)
        grads = (
            features.join(resid, id_col)
            .groupBy("feat")
            .agg(
                F.sum(
                    (F.col("resid6") * F.col("cnt")).cast("decimal(38,0)")
                ).alias("g6")
            )
        )
        joined = weights.join(grads, "feat", "full")
        w9 = F.expr("cast(round(coalesce(w, 0d) * 1e9) as bigint)")
        a = F.lit(1000 * num).cast("decimal(10,0)") * F.coalesce(
            F.col("g6"), F.lit(0).cast("decimal(38,0)")
        )
        delta9 = F.when(
            a >= 0, F.expr(f"(2 * _a + {b}) div (2 * {b})")
        ).otherwise(-F.expr(f"(2 * (0 - _a) + {b}) div (2 * {b})"))
        return (
            joined.withColumn("_a", a)
            .select("feat", (w9 - delta9.cast("long")).alias("_w9"))
            .where(F.col("_w9") != 0)
            .select(
                "feat",
                (F.col("_w9").cast("double") / F.lit(1e9)).alias("w"),
            )
        )
    m = _margins(features, weights, id_col)
    resid = (
        m.join(labels.select(id_col, label_col), id_col)
        .select(
            id_col,
            (
                _prob(F.col("margin"))
                - F.col(label_col).cast(_DEC_P)
            ).alias("resid"),
        )
    )
    grads = (
        features.join(resid, id_col)
        .groupBy("feat")
        .agg(
            F.sum(F.col("resid") * F.col("cnt").cast(_DEC_P)).alias("grad")
        )
    )
    return (
        weights.join(grads, "feat", "full")
        .select(
            "feat",
            F.round(
                F.coalesce(F.col("w"), F.lit(0)).cast("double")
                - F.lit(float(lr))
                * F.coalesce(F.col("grad"), F.lit(0)).cast("double")
                / F.lit(float(n_docs)),
                9,
            ).alias("w"),
        )
        .where(F.col("w") != 0)
    )


def lr_train(
    features: DataFrame,
    labels: DataFrame,
    spark,
    epochs: int = 5,
    lr: float = 0.5,
    id_col: str = "doc_id",
    label_col: str = "label",
    persist_input: bool = True,
) -> DataFrame:
    """Full-batch GD for ``epochs`` rounds from the zero model.

    100 TB shape: each epoch is one pass over the feature table (two
    bounded shuffles); the evolving state is ≤ dim weight rows,
    collected to the driver between rounds and re-broadcast — the same
    literals-re-enter pattern as ``kmeans_fit``, so no lineage growth
    and every epoch's plan is independent.  Returns the ``(feat, w)``
    model DataFrame.
    """
    base = features
    if persist_input:
        from pyspark import StorageLevel

        # pre-partition by doc: every epoch's per-doc margin aggregate
        # AND its residual join then reuse this one exchange — the only
        # per-epoch shuffle left is the ≤ dim-group gradient aggregate
        base = features.repartition(id_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # labels join into every epoch's residual on the same key: the
        # same one-exchange treatment (round-11 — without it the label
        # projection re-shuffled once per epoch)
        labels = labels.repartition(id_col).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    n_docs = labels.count()
    w_schema = "feat long, w double"
    weights = spark.createDataFrame([], w_schema)
    try:
        for _ in range(epochs):
            new_w = lr_step(
                base, labels, weights, n_docs, lr, id_col, label_col
            )
            # model state is <= dim rows: driver round-trip keeps each
            # epoch's plan flat (literal weights, no growing lineage)
            rows = [(int(r["feat"]), float(r["w"])) for r in new_w.collect()]
            weights = spark.createDataFrame(rows, w_schema)
    finally:
        if persist_input:
            base.unpersist()
            labels.unpersist()
    return weights


def lr_score(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    exact_grid: bool = False,
) -> DataFrame:
    """Score documents under a trained model: ``(doc_id, score)`` with
    ``score`` the hard-sigmoid probability on the 6-dp grid.  Broadcast
    join + one per-doc aggregate — the shape that scores 100 TB in one
    pass.

    ``exact_grid=True`` computes the probability entirely in integers
    (``_margins9`` + ``_prob6_expr``), avoiding the decimal scale-down
    whose rounding mode differs across engines when margins carry more
    than 9 fractional digits — the oracle-gated variant (rule 13)."""
    if exact_grid:
        m9 = _margins9(features, weights, id_col)
        return m9.select(
            id_col,
            (_prob6_expr().cast("double") / F.lit(1e6)).alias("score"),
        )
    m = _margins(features, weights, id_col)
    return m.select(
        id_col,
        _prob(F.col("margin")).cast("double").alias("score"),
    )


def calibration_report(
    scored: DataFrame,
    prob_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram data for a probabilistic classifier: one row
    per confidence bin with count, positives, and the EXACT integer sums
    the calibration metrics derive from — the audit that decides whether
    a quality classifier's scores can be used as sampling weights (a
    miscalibrated filter silently reweights the corpus).

    Integer-exact by construction (rule 13): the model's probabilities
    live on the trainer's 6-dp grid, so ``p6 = round(p·10^6)`` recovers
    the exact grid integer, bins are ``(p6·n_bins) div 10^6`` (pure
    integer — no float bin boundary to disagree on), and the per-bin
    state is ``(n, n_pos, sum_p6)`` — three exact integers.  Derived
    doubles (``mean_conf``, ``accuracy``, ``abs_gap``) are IEEE-exact
    single divisions of those integers.  ONE aggregate over the scored
    relation; bins are metadata-sized.

    Compose with ``expected_calibration_error`` for the headline number.
    """
    p6 = F.round(F.col(prob_col) * 1_000_000).cast("long")
    per = (
        scored.select(
            p6.alias("_p6"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .select(
            F.least(
                F.expr(f"(_p6 * {int(n_bins)}) div 1000000"),
                F.lit(int(n_bins) - 1),
            )
            .cast("int")
            .alias("bin"),
            "_p6",
            "_y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("_y").alias("n_pos"),
            F.sum("_p6").alias("sum_p6"),
        )
    )
    return per.select(
        "bin",
        "n",
        "n_pos",
        "sum_p6",
        (F.col("sum_p6").cast("double") / (F.col("n") * 1e6)).alias(
            "mean_conf"
        ),
        (F.col("n_pos").cast("double") / F.col("n")).alias("accuracy"),
        (
            F.abs(F.col("n_pos") * 1_000_000 - F.col("sum_p6")).cast("double")
            / (F.col("n") * 1e6)
        ).alias("abs_gap"),
    )


def expected_calibration_error(
    report: DataFrame, round_to: int = 9
) -> DataFrame:
    """ECE from a ``calibration_report``:
    ``Σ_b (n_b/N)·|acc_b − conf_b| = Σ_b |n_pos_b·10^6 − sum_p6_b| /
    (N·10^6)`` — the numerator is an exact integer sum, the final value
    one half-up scaled division rendered as a ``round_to``-dp string
    (``ece``), with the raw integer pair alongside.  Engine-exact end to
    end: a DuckDB oracle replays it with the same integer arithmetic."""
    S = 10**round_to
    agg = report.agg(
        F.sum(F.abs(F.col("n_pos") * 1_000_000 - F.col("sum_p6"))).alias(
            "num"
        ),
        F.sum("n").alias("n_total"),
    )
    # hu(num·S, n_total·10^6) in DECIMAL(38,0) `div` arithmetic — the
    # scaled numerator exceeds BIGINT once N ~ 10^4, decimal carries it
    # to N ~ 10^22 exactly (the oracle twin runs HUGEINT)
    hu = (
        "(cast(num as decimal(38,0)) * {S} * 2"
        " + cast(n_total as decimal(38,0)) * 1000000)"
        " div (2 * cast(n_total as decimal(38,0)) * 1000000)"
    ).format(S=S)
    return agg.select(
        "num",
        "n_total",
        F.expr(
            f"concat(cast(({hu}) div {S} as string), '.',"
            f" lpad(cast(({hu}) % {S} as string), {round_to}, '0'))"
        ).alias("ece"),
    )
