"""Fuzzy entity resolution / record linkage: blocked candidate
generation → integer edit-distance gate → deterministic best-match —
the cross-source identity layer a training-data lake needs when the
same document/author/site appears under slightly different keys
(crawl dumps, partner feeds, OCR'd titles).

Spark-first shape, built entirely from JVM expressions:

* **Blocking** (:func:`blocking_keys`) replaces the quadratic all-pairs
  compare with an equi-join on cheap normalized keys — prefix, suffix,
  and a length bucket, OR-amplified like LSH bands (a typo breaks at
  most one of them, so true matches keep >= 1 shared block).  Every
  block is capped (``max_block_size``) so a degenerate key ("inc",
  "untitled") cannot produce a quadratic reduce task: the cap drops
  blocks, never rows, and the drop is COUNTED in the audit so recall
  loss is visible, not silent (the bitext hot-key discipline).
* **Gate**: ``levenshtein(a, b)`` — Spark evaluates it JVM-side and
  the distance is an exact INTEGER, so the keep/drop decision and the
  hash-able artifact cannot drift across runs/engines (DETERMINISM.md
  rule 4 by construction; DuckDB ships the same function for a future
  oracle leg).  The relative form compares ``lev * 100 <=
  rel_pct * greatest(len_a, len_b)`` in pure integers — no float
  ratio anywhere.
* **Best match** (:func:`resolve_entities`): per left id keep the
  lexicographically smallest ``(lev, id_b)`` — one ``min_by``
  aggregate with map-side partials, ties broken to the smaller right
  id (rule 6 total order).

100 TB shape: candidates = one exploded narrow projection (id, block
key) per side + one equi-join on the key + a distinct on (id_a, id_b);
the expensive ``levenshtein`` runs AFTER the distinct, once per
candidate pair.  No cross join exists in any plan (asserted in
tests/test_linkage.py); skew is bounded by the block cap.

Reference parity note: no counterpart in the reference repo (a log
parser); this extends the brief's training-data tier (cross-source
dedup/linkage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    """Match-key normalization: lowercase, collapse runs of
    non-alphanumerics to single spaces, trim.  Deliberately cheap and
    deterministic — heavier normalization belongs in normalize.py and
    feeds this as input."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def blocking_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    prefix_len: int = 4,
    len_bucket: int = 4,
) -> DataFrame:
    """Explode each record into its blocking keys: ``p:<prefix>``,
    ``s:<suffix>``, and ``l:<prefix2>:<len bucket>`` — three cheap,
    typo-complementary views of the normalized text (a single edit hits
    the prefix OR the suffix, not both; the length-bucketed short
    prefix catches edits inside both ends).  Returns
    ``(id, key, norm, n_chars)``; empty/NULL texts produce no keys."""
    norm = _norm(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        norm.alias("norm"),
        F.length(norm).alias("n_chars"),
    ).where(F.col("n_chars") > 0)
    keys = F.array(
        F.concat(F.lit("p:"), F.substring("norm", 1, prefix_len)),
        F.concat(F.lit("s:"), F.substring(F.reverse(F.col("norm")), 1, prefix_len)),
        F.concat(
            F.lit("l:"),
            F.substring("norm", 1, 2),
            F.lit(":"),
            (F.col("n_chars") / len_bucket).cast("long").cast("string"),
        ),
    )
    return base.select(
        "id", F.explode(keys).alias("key"), "norm", "n_chars"
    )


def candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    prefix_len: int = 4,
    max_block_size: int = 256,
    keys: DataFrame | None = None,
    right_keys: DataFrame | None = None,
) -> DataFrame:
    """Blocked candidate pairs between two record sets (pass the same
    frame twice for self-linkage; pairs then orient ``id_a < id_b``).

    Plan: explode both sides into blocking keys, drop keys whose
    COMBINED block exceeds ``max_block_size`` (counted — see
    :func:`linkage_audit`), equi-join on the key, distinct the pair
    space.  Returns ``(id_a, id_b, norm_a, norm_b, len_a, len_b)``.

    ``keys``/``right_keys`` (round-11 optimization): precomputed
    :func:`blocking_keys` output for the left/right side.  The key
    relation feeds three consumers here (block sizes and both join
    sides) and :func:`linkage_audit` derives the same relation again —
    Catalyst re-evaluates each as an independent subtree, so a caller
    that computes the keys ONCE, persists them, and passes them to both
    functions removes ~8 normalize+explode passes per query (measured:
    44 parquet scans in the registered key's plan).  Must be exactly
    ``blocking_keys(left/right, id_col, text_col, prefix_len)``;
    values are unchanged by construction."""
    self_link = right is left
    lk = keys if keys is not None else blocking_keys(
        left, id_col, text_col, prefix_len
    )
    if self_link:
        rk = lk
    elif right_keys is not None:
        rk = right_keys
    else:
        rk = blocking_keys(right, id_col, text_col, prefix_len)
    sizes = (
        lk.groupBy("key").agg(F.count("*").alias("_nl"))
        if self_link
        else lk.groupBy("key").agg(F.count("*").alias("_nl")).join(
            rk.groupBy("key").agg(F.count("*").alias("_nr")), "key"
        )
    )
    ok = sizes.where(
        (F.col("_nl") <= max_block_size)
        if self_link
        else ((F.col("_nl") + F.col("_nr")) <= max_block_size)
    ).select("key")
    a = lk.join(ok, "key").select(
        "key",
        F.col("id").alias("id_a"),
        F.col("norm").alias("norm_a"),
        F.col("n_chars").alias("len_a"),
    )
    b = rk.join(ok, "key").select(
        "key",
        F.col("id").alias("id_b"),
        F.col("norm").alias("norm_b"),
        F.col("n_chars").alias("len_b"),
    )
    cond = F.col("id_a") < F.col("id_b") if self_link else F.col("id_a").isNotNull()
    return (
        a.join(b, "key")
        .where(cond & (F.col("id_a") != F.col("id_b")))
        .select("id_a", "id_b", "norm_a", "norm_b", "len_a", "len_b")
        .distinct()
    )


def link_entities(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    rel_pct: int = 20,
    max_dist: int | None = None,
    prefix_len: int = 4,
    max_block_size: int = 256,
    keys: DataFrame | None = None,
    right_keys: DataFrame | None = None,
) -> DataFrame:
    """Scored fuzzy matches: blocked candidates gated on exact integer
    edit distance.  A pair survives when ``lev * 100 <= rel_pct *
    greatest(len_a, len_b)`` (relative form, pure integers) and, if
    ``max_dist`` is given, ``lev <= max_dist``.  Output
    ``(id_a, id_b, lev, len_a, len_b)``.  ``keys``/``right_keys``:
    precomputed blocking keys, passed through to
    :func:`candidate_pairs` (see its round-11 note)."""
    cand = candidate_pairs(
        left, right, id_col, text_col, prefix_len, max_block_size,
        keys=keys, right_keys=right_keys,
    )
    # round-11 (guide §1.2 step 2 — per-task work): the keep gate
    # ``lev·100 ≤ rel_pct·max(len)`` bounds the distance of every
    # surviving pair by ``t = (rel_pct·max(len)) div 100`` (lev is an
    # integer, so the two forms are equivalent), and Spark's THRESHOLDED
    # levenshtein computes only a 2t+1 diagonal band with early abandon
    # — O(t·len) instead of O(len²) per pair, returning the EXACT
    # distance for every pair at or under the bound and -1 (dropped
    # anyway) above it.  Values of the kept relation are unchanged.
    t_sql = f"cast(({int(rel_pct)} * greatest(len_a, len_b)) div 100 as int)"
    if max_dist is not None:
        t_sql = f"least({t_sql}, {int(max_dist)})"
    # SQL form: the Python levenshtein() wrapper only takes int
    # thresholds, but the underlying expression accepts any IntegerType
    # column (verified: identical distances for kept pairs, -1 above
    # the per-pair bound)
    lev = F.expr(f"levenshtein(norm_a, norm_b, {t_sql})")
    out = cand.select(
        "id_a", "id_b", lev.alias("lev"), "len_a", "len_b"
    ).where(F.col("lev") >= 0)
    return out


def resolve_entities(matches: DataFrame) -> DataFrame:
    """Deterministic best match per left id: the lexicographically
    smallest ``(lev, id_b)`` — one ``min_by`` aggregate (map-side
    partials; rule-6 total order, so the resolution cannot flip with
    layout).  Output ``(id_a, best_id, best_lev, n_candidates)``."""
    return matches.groupBy("id_a").agg(
        F.min_by(
            F.col("id_b"), F.struct(F.col("lev"), F.col("id_b"))
        ).alias("best_id"),
        F.min(F.struct(F.col("lev"), F.col("id_b"))).getField("lev").alias(
            "best_lev"
        ),
        F.count("*").alias("n_candidates"),
    )


def linkage_audit(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    prefix_len: int = 4,
    max_block_size: int = 256,
    keys: DataFrame | None = None,
    right_keys: DataFrame | None = None,
) -> DataFrame:
    """One-row visibility into what blocking DROPPED: total blocks,
    capped blocks, and the records that lost ALL their blocks to the
    cap (the only ones whose matches the cap can actually lose).  A
    capped-block count that creeps up round over round is the signal to
    re-key, re-cap, or pre-split hot blocks.  ``keys``/``right_keys``:
    precomputed blocking keys shared with :func:`candidate_pairs` (see
    its round-11 note)."""
    self_link = left is right
    lk = keys if keys is not None else blocking_keys(
        left, id_col, text_col, prefix_len
    )
    if self_link:
        rk = lk
    elif right_keys is not None:
        rk = right_keys
    else:
        rk = blocking_keys(right, id_col, text_col, prefix_len)
    combined = (
        lk.groupBy("key").agg(F.count("*").alias("n"))
        if self_link
        else lk.groupBy("key")
        .agg(F.count("*").alias("_nl"))
        .join(rk.groupBy("key").agg(F.count("*").alias("_nr")), "key")
        .select("key", (F.col("_nl") + F.col("_nr")).alias("n"))
    )
    # orphaned = records whose EVERY block is capped (the only ones
    # whose matches the cap can actually lose).  Per-record flags via
    # one id-keyed aggregate — a record with two capped blocks and one
    # surviving block has has_ok=1 and is not orphaned (the same SET
    # semantics as a distinct-then-subtract, without the two extra
    # distincts).
    rec_flags = (
        lk.select("id", "key")
        .join(combined, "key")
        .groupBy("id")
        .agg(
            F.max((F.col("n") > max_block_size).cast("int")).alias("_hc"),
            F.max((F.col("n") <= max_block_size).cast("int")).alias("_ho"),
        )
    )
    # all three scalars ride ONE tagged union + ONE aggregate: no
    # scalar-combine join at all (a crossJoin — or an equi-join on a
    # foldable literal key, which Catalyst folds right back — would
    # plan as BroadcastNestedLoopJoin, the operator class the repo-wide
    # plan sweep in tests/test_plans.py bans)
    block_rows = combined.select(
        F.lit(1).cast("long").alias("_is_block"),
        (F.col("n") > max_block_size).cast("long").alias("_is_capped"),
        F.lit(0).cast("long").alias("_is_orphan"),
    )
    rec_rows = rec_flags.select(
        F.lit(0).cast("long").alias("_is_block"),
        F.lit(0).cast("long").alias("_is_capped"),
        ((F.col("_hc") == 1) & (F.col("_ho") == 0))
        .cast("long")
        .alias("_is_orphan"),
    )
    return block_rows.unionByName(rec_rows).agg(
        F.coalesce(F.sum("_is_block"), F.lit(0)).alias("n_blocks"),
        F.coalesce(F.sum("_is_capped"), F.lit(0)).alias("n_capped_blocks"),
        F.coalesce(F.sum("_is_orphan"), F.lit(0)).alias(
            "n_orphaned_records"
        ),
    )
