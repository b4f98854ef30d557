"""Preference-data operators: pair construction, dataset audits, and a
Bradley–Terry strength fit — the RLHF/DPO data-prep tier.

Post-training pipelines consume (prompt, chosen, rejected) PAIRS, not
scored pools: something has to turn per-response quality scores into
pairs, audit the resulting dataset for the biases that silently poison a
reward model (length bias, degenerate margins, duplicated responses),
and rank the GENERATORS behind the responses (which model/checkpoint/
temperature wins head-to-heads) without training anything.  This module
is that layer, Spark-first:

* :func:`make_preference_pairs` — top-vs-bottom score pairing per
  prompt with deterministic tie-breaks and a minimum-margin gate.  One
  aggregate over the scored pool (lexicographic struct max/min — no
  per-prompt window sort), so the shuffle is prompt-keyed and map-side
  combined: the shape that pairs a 100 TB response pool.
* :func:`preference_pair_audit` — dataset-level bias counters (length
  bias, margin distribution, self-pairs) as ONE aggregate row.
* :func:`bt_fit` — Bradley–Terry strengths via Hunter's (2004) MM
  update ``s_i ← W_i / Σ_j n_ij/(s_i+s_j)``, the classical convergent
  fixed point (public derivation; also the Elo/paired-comparison
  standard).  Distributed per round: the pair relation aggregates
  per item against broadcast current strengths; driver state is one
  strength per ITEM (generators — metadata-sized), the same
  literals-re-enter loop discipline as ``similarity.kmeans_fit`` /
  ``classifier.lr_train``.  Per-pair terms are rounded to 12 dp and
  DECIMAL-summed (DETERMINISM.md rule 5) so the fit is layout- and
  partitioning-independent — pytest pins it against a sequential pure-
  Python twin exactly, not within a tolerance.

Reference parity note: no counterpart in the reference repo (a log
parser); this extends the LLM-pipeline tier the project brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for score handling (rule 5: decide on grid values)
_S9 = 1_000_000_000


def make_preference_pairs(
    scored: DataFrame,
    prompt_col: str = "prompt_id",
    response_col: str = "response_id",
    score_col: str = "score",
    text_len_col: str | None = None,
    min_margin: float = 0.0,
) -> DataFrame:
    """Build one (chosen, rejected) pair per prompt from a scored
    response pool: chosen = argmax score (ties toward the LOWER response
    id), rejected = argmin score (ties toward the HIGHER id) —
    asymmetric tie-breaks so a fully-tied prompt still yields a valid
    distinct pair, deterministically, under any layout.  Prompts with
    fewer than two distinct responses, or whose best-worst margin is
    below ``min_margin``, produce no pair.

    Scores compare on the 9-dp grid (``round(score·10⁹)`` as BIGINT) so
    the argmax/argmin — and therefore the training set — cannot flip on
    a last-ulp float difference between runs or engines (DETERMINISM.md
    rule 4).  NULL-scored rows are dropped up front (a sparse scorer
    failure must cost the failed RESPONSE, never the whole prompt), and
    duplicate rows for one response collapse to that response's best
    score first — so re-scored pools unioned without dedup still pair
    correctly.  Plan shape: a per-(prompt, response) combine then the
    prompt-keyed struct-extrema aggregate, both partial-aggregated
    map-side — never a per-prompt sort window, so hot prompts with
    millions of responses cost a combine, not a single-task sort.

    Output: ``(prompt_id, chosen_id, rejected_id, margin9,
    chosen_len, rejected_len)`` — lengths ride along when
    ``text_len_col`` is given (for :func:`preference_pair_audit`).
    """
    s9 = F.round(F.col(score_col) * _S9).cast("long")
    ln = (
        F.col(text_len_col).cast("long")
        if text_len_col
        else F.lit(None).cast("long")
    )
    row = (
        scored.where(F.col(score_col).isNotNull())
        .select(
            F.col(prompt_col),
            s9.alias("_s9"),
            F.col(response_col).cast("long").alias("_rid"),
            ln.alias("_len"),
        )
        # collapse duplicate scorings of one response to its best score
        # (max_by keeps that scoring's length); without this, a response
        # spanning BOTH extrema silently dropped its prompt
        .groupBy(prompt_col, "_rid")
        .agg(
            F.max("_s9").alias("_s9"),
            # tie-break the carried length on (score, len) so equal-score
            # duplicate rows still collapse deterministically
            F.max_by(
                "_len", F.struct(F.col("_s9"), F.col("_len"))
            ).alias("_len"),
        )
    )
    # lexicographic struct extrema on (score, −id): max picks (highest
    # score, then LOWEST id); min picks (lowest score, then HIGHEST id)
    # — the asymmetry guarantees chosen ≠ rejected whenever the prompt
    # has ≥ 2 distinct responses, even under a full score tie
    ext = F.struct(
        F.col("_s9").alias("s9"),
        (-F.col("_rid")).alias("nid"),
        F.col("_len").alias("len"),
    )
    best = F.max(ext).alias("_best")
    worst = F.min(ext).alias("_worst")
    agg = row.groupBy(prompt_col).agg(best, worst)
    m9 = F.col("_best.s9") - F.col("_worst.s9")
    return (
        agg.where(
            # distinct extrema ⟺ ≥ 2 distinct responses (rows are
            # per-response after the collapse above) — an explicit
            # count_distinct here would force a second, distinct
            # aggregation phase over the pool for zero extra signal
            (F.col("_best.nid") != F.col("_worst.nid"))
            & (m9 >= int(round(float(min_margin) * _S9)))
        )
        .select(
            F.col(prompt_col),
            (-F.col("_best.nid")).alias("chosen_id"),
            (-F.col("_worst.nid")).alias("rejected_id"),
            m9.alias("margin9"),
            F.col("_best.len").alias("chosen_len"),
            F.col("_worst.len").alias("rejected_len"),
        )
    )


def preference_pair_audit(pairs: DataFrame) -> DataFrame:
    """Dataset-level bias counters for a preference set, as ONE row:

    * ``n_pairs``;
    * ``n_chosen_longer`` / ``n_rejected_longer`` / ``n_len_tied`` —
      a reward model trained on a length-skewed set learns "longer is
      better" instead of quality (the classic verbosity bias);
    * ``n_zero_margin`` / ``margin9_p50-ish exact mean`` — degenerate
      near-tie pairs teach noise;
    * ``n_dup_chosen`` — distinct chosen responses vs pairs: a handful
      of star responses chosen everywhere collapses diversity.

    All counters are exact integers from one aggregate (plus one
    distinct count), NEVER NULL: empty pair sets report zeros (the
    repo's sum-over-empty coalesce convention), and the three length
    counters count only pairs where BOTH lengths are known (pairs built
    without ``text_len_col`` contribute to none of them).  Mean margin
    is the exact integer pair ``(sum_margin9, n_pairs)`` so no float
    division enters the artifact.
    """

    def _n(col):
        return F.coalesce(F.sum(col.cast("long")), F.lit(0).cast("long"))

    return pairs.agg(
        F.count("*").alias("n_pairs"),
        _n(F.col("chosen_len") > F.col("rejected_len")).alias(
            "n_chosen_longer"
        ),
        _n(F.col("chosen_len") < F.col("rejected_len")).alias(
            "n_rejected_longer"
        ),
        _n(F.col("chosen_len") == F.col("rejected_len")).alias("n_len_tied"),
        _n(F.col("margin9") == 0).alias("n_zero_margin"),
        F.coalesce(
            F.sum(F.col("margin9").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("sum_margin9"),
        F.count_distinct("chosen_id").alias("n_distinct_chosen"),
    )


#: contingency rows the driver will hold for the in-driver MM loop; a
#: (winner, loser) count row is ~3 machine words, so the bound caps
#: driver state at tens of MB.  Matchup universes past this (millions of
#: distinct item pairs) take the distributed per-round path.
_BT_MAX_DRIVER_COMBOS = 1 << 21


def _bt_loop_counts(rows, n_iter: int, tol: float) -> dict[int, float]:
    """MM loop over the collected (winner, loser, n_ij) contingency —
    the same arithmetic as :func:`_bt_loop`/:func:`bt_fit_py`, with each
    matchup's 12-dp term weighted by its exact integer count (decimal
    multiplication by an int is exact, so ``t * c`` equals ``c`` decimal
    additions of ``t``, which is what the distributed sum computes)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    counts: dict[tuple[int, int], int] = {}
    for r in rows:
        key = (int(r["winner_id"]), int(r["loser_id"]))
        counts[key] = counts.get(key, 0) + int(r["n_ij"])
    items = sorted({i for pair in counts for i in pair})
    if not items:
        return {}
    strengths = {i: 1.0 for i in items}
    q = Decimal(1).scaleb(-12)
    # 38 significant digits = the precision of Spark's decimal(38,12)
    # sum accumulator the distributed path uses
    with localcontext() as ctx:
        ctx.prec = 38
        for _ in range(n_iter):
            wins = {i: 0 for i in items}
            denom = {i: Decimal(0) for i in items}
            for (w, l), c in counts.items():
                t = Decimal(
                    repr(1.0 / (strengths[w] + strengths[l]))
                ).quantize(q, rounding=ROUND_HALF_UP)
                tc = t * c
                wins[w] += c
                denom[w] += tc
                denom[l] += tc
            new = {}
            for i in items:
                if denom[i] == 0:
                    new[i] = strengths[i]
                else:
                    new[i] = max(wins[i], 1e-6) / float(denom[i])
            log_gm = sum(math.log(new[i]) for i in items) / len(items)
            scale = math.exp(-log_gm)
            new = {k: v * scale for k, v in new.items()}
            delta = max(abs(new[i] - strengths[i]) for i in items)
            strengths = new
            if delta <= tol:
                break
    return strengths


def _bt_round_terms(
    pairs: DataFrame, strengths: dict[int, float]
) -> DataFrame:
    """Per-item MM-update aggregates for one round: wins ``W_i`` and the
    decimal-summed denominator ``Σ_j n_ij/(s_i+s_j)`` (terms rounded to
    12 dp before the sum — rule 5 — so the round is order-independent)."""
    spark = pairs.sparkSession
    sdf = F.broadcast(
        spark.createDataFrame(
            [(int(k), float(v)) for k, v in sorted(strengths.items())],
            "item long, s double",
        )
    )
    # one row per (pair, side): item, win flag, opponent strength
    sided = pairs.select(
        F.col("winner_id").alias("item"),
        F.lit(1).alias("win"),
        F.col("loser_id").alias("opp"),
    ).unionByName(
        pairs.select(
            F.col("loser_id").alias("item"),
            F.lit(0).alias("win"),
            F.col("winner_id").alias("opp"),
        )
    )
    j = (
        sided.join(sdf.withColumnRenamed("item", "opp_"), sided.opp == F.col("opp_"))
        .withColumnRenamed("s", "s_opp")
        .drop("opp_")
        .join(sdf, on="item")
    )
    term = F.round(F.lit(1.0) / (F.col("s") + F.col("s_opp")), 12).cast(
        "decimal(28,12)"
    )
    return j.groupBy("item").agg(
        F.sum("win").alias("wins"),
        F.sum(term).alias("denom"),
    )


def bt_fit(
    pairs: DataFrame,
    n_iter: int = 20,
    tol: float = 1e-9,
) -> dict[int, float]:
    """Bradley–Terry strengths from a ``(winner_id, loser_id)`` pair
    relation via Hunter's MM fixed point, geometric-mean-normalized each
    round (the BT likelihood is scale-invariant; without renormalizing,
    strengths drift).  Items that never lose get the +/-inf-free
    treatment for free: their denominator is finite because every
    appearance contributes a term.

    Driver state = the observed (winner, loser) CONTINGENCY TABLE when
    it is driver-sized (≤ ``_BT_MAX_DRIVER_COMBOS`` distinct matchups —
    every round's terms depend on the pairs only through those counts,
    so the whole MM loop runs in driver Python off ONE item-pair-keyed
    Spark aggregate); above the bound it falls back to one float per
    item with one broadcast join + item-keyed aggregate per round over
    the persisted pair relation.  Returns ``{item: strength}``.

    Determinism: per-round terms are 12-dp rounded then DECIMAL-summed,
    and the update arithmetic runs in driver Python floats from those
    exact decimals — bit-identical across layouts and partitionings
    (pinned by the pure-Python-twin test).  The driver-counts path is
    bit-identical to the distributed path because decimal addition is
    exact: summing ``c`` copies of one 12-dp term equals ``term × c``
    (pinned by the forced-fallback equivalence test)."""
    from pyspark import StorageLevel

    pairs = pairs.select("winner_id", "loser_id")
    # one aggregate instead of (1 distinct + n_iter round jobs): the
    # limit(N+1) probe collects the full contingency iff it fits the
    # driver bound — when it truncates, nothing downstream uses the
    # (arbitrary) subset
    cont = pairs.groupBy("winner_id", "loser_id").agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    rows = cont.limit(_BT_MAX_DRIVER_COMBOS + 1).collect()
    if len(rows) <= _BT_MAX_DRIVER_COMBOS:
        return _bt_loop_counts(rows, n_iter, tol)

    # contingency exceeds the driver bound (huge item universes, e.g.
    # player-ranking workloads): per-round distributed aggregates over
    # the persisted pair relation, one float per item on the driver.
    # every MM round re-aggregates the pair relation, whose lineage can
    # be an arbitrarily expensive upstream (make_preference_pairs over a
    # scored pool): persist ONCE so rounds read cached rows — the same
    # persist_input discipline as classifier.lr_train (and the same
    # lesson as webgraph's round-6 per-round-recompute fix)
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _bt_loop(pairs, n_iter, tol)
    finally:
        pairs.unpersist()


def _bt_loop(pairs: DataFrame, n_iter: int, tol: float) -> dict[int, float]:
    items = sorted(
        r["i"]
        for r in pairs.select(F.col("winner_id").alias("i"))
        .unionByName(pairs.select(F.col("loser_id").alias("i")))
        .distinct()
        .collect()  # bounded: the generator/model universe
    )
    if not items:
        return {}
    strengths = {int(i): 1.0 for i in items}
    for _ in range(n_iter):
        rows = _bt_round_terms(pairs, strengths).collect()  # ≤ |items|
        by_item = {int(r["item"]): r for r in rows}
        new: dict[int, float] = {}
        for i in items:
            r = by_item.get(int(i))
            if r is None or float(r["denom"]) == 0.0:
                new[int(i)] = strengths[int(i)]
                continue
            wins = int(r["wins"])
            # never-winning items go to 0 under raw MM; floor at a tiny
            # positive mass so log-ratios stay finite
            new[int(i)] = max(wins, 1e-6) / float(r["denom"])
        # geometric-mean normalization, in a FIXED (sorted) order so the
        # float product is reproducible
        import math

        log_gm = sum(math.log(new[int(i)]) for i in items) / len(items)
        scale = math.exp(-log_gm)
        new = {k: v * scale for k, v in new.items()}
        delta = max(abs(new[int(i)] - strengths[int(i)]) for i in items)
        strengths = new
        if delta <= tol:
            break
    return strengths


def bt_fit_py(
    pair_list: list[tuple[int, int]], n_iter: int = 20, tol: float = 1e-9
) -> dict[int, float]:
    """Sequential pure-Python twin of :func:`bt_fit` (same 12-dp
    round-then-sum, same fixed-order normalization) — the equivalence
    oracle for tests."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    items = sorted({i for p in pair_list for i in p})
    if not items:
        return {}
    strengths = {i: 1.0 for i in items}
    for _ in range(n_iter):
        wins = {i: 0 for i in items}
        denom = {i: Decimal(0) for i in items}
        q = Decimal(1).scaleb(-12)
        for w, l in pair_list:
            t = Decimal(repr(1.0 / (strengths[w] + strengths[l]))).quantize(
                q, rounding=ROUND_HALF_UP
            )
            wins[w] += 1
            denom[w] += t
            denom[l] += t
        new = {}
        for i in items:
            if denom[i] == 0:
                new[i] = strengths[i]
            else:
                new[i] = max(wins[i], 1e-6) / float(denom[i])
        log_gm = sum(math.log(new[i]) for i in items) / len(items)
        scale = math.exp(-log_gm)
        new = {k: v * scale for k, v in new.items()}
        delta = max(abs(new[i] - strengths[i]) for i in items)
        strengths = new
        if delta <= tol:
            break
    return strengths


def attach_pair_texts(
    pairs: DataFrame,
    responses: DataFrame,
    response_col: str = "response_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize DPO-ready records from id pairs: two equi-joins back
    to the response pool turn ``(prompt_id, chosen_id, rejected_id)``
    into ``(…, chosen_text, rejected_text)`` — the exact shape a
    DPO/RLHF trainer ingests.

    Plan shape: the pair relation (one row per prompt) is usually the
    small side; both joins key on the response id so they co-locate on
    one exchange of the pool when AQE doesn't broadcast.  No row
    explosion: each join is 1:1 by construction (ids came from the same
    pool)."""
    resp = responses.select(
        F.col(response_col).alias("_rid"), F.col(text_col).alias("_text")
    )
    return (
        pairs.join(
            resp.withColumnRenamed("_rid", "chosen_id").withColumnRenamed(
                "_text", "chosen_text"
            ),
            on="chosen_id",
        )
        .join(
            resp.withColumnRenamed("_rid", "rejected_id").withColumnRenamed(
                "_text", "rejected_text"
            ),
            on="rejected_id",
        )
    )


def group_advantages(
    responses: DataFrame,
    prompt_col: str,
    reward_col: str,
    id_col: str,
    top_n: int = 1,
    min_group: int = 2,
    eps: float = 1e-6,
    round_to: int = 9,
) -> DataFrame:
    """Group-relative reward normalization + best-of-n selection — the
    GRPO recipe (Shao et al. 2024, DeepSeekMath, arXiv:2402.03300) and
    the rejection-sampling/best-of-n selection step of RLHF data prep
    (Bai et al. 2022): per prompt, a response's learning signal is its
    reward STANDARDIZED within its own sample group::

        advantage = (r - mean(group)) / (std(group) + eps)

    so a hard prompt whose best sample scores 0.3 contributes the same
    gradient scale as an easy prompt whose best scores 0.9 — raw-reward
    selection would starve hard prompts entirely.

    Output: one row per response — ``(id, prompt, reward, advantage,
    n_group, rank, selected)``; ``rank`` orders by (advantage desc, id)
    within the prompt (rule-6 total order), ``selected`` marks the
    top-``top_n``.  Groups smaller than ``min_group`` emit advantage
    NULL and selected false (a 1-sample group has no relative signal;
    callers route those prompts back for more sampling).  ``std`` is the
    population form (/n — the GRPO normalization), computed from the
    sum/sum-of-squares identity on decimal-exact aggregates.

    100 TB shape: ONE prompt-keyed aggregate (map-side combined: n, Σr,
    Σr² travel as partials) broadcast-free via a self-join on the
    prompt key, then one per-prompt rank window over the group's own
    rows.  Skew equals the largest sample group (bounded by the
    sampler's n, typically 4-64) — never corpus-shaped.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    if min_group < 2:
        raise ValueError("min_group must be >= 2 (no signal in 1 sample)")
    from pyspark.sql import Window as W

    r = F.col(reward_col).cast("double")
    stats = responses.groupBy(prompt_col).agg(
        F.count("*").alias("n_group"),
        F.sum(r).alias("_sr"),
        F.sum(r * r).alias("_srr"),
    )
    mean = F.col("_sr") / F.col("n_group")
    var = F.greatest(
        F.col("_srr") / F.col("n_group") - mean * mean, F.lit(0.0)
    )
    adv = F.when(
        F.col("n_group") >= int(min_group),
        F.round(
            (r - mean) / (F.sqrt(var) + F.lit(float(eps))), round_to
        ),
    )
    w = W.partitionBy(prompt_col).orderBy(
        F.col("advantage").desc_nulls_last(), F.col(id_col)
    )
    return (
        responses.select(id_col, prompt_col, F.col(reward_col))
        .join(stats, prompt_col)
        .withColumn("advantage", adv)
        .drop("_sr", "_srr")
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "selected",
            (F.col("rank") <= int(top_n)) & F.col("advantage").isNotNull(),
        )
    )
