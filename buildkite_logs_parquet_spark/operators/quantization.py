"""Embedding quantization: int8 scalar quantization (SQ) and Product
Quantization (PQ/IVF-PQ) for approximate nearest-neighbor search over
compressed codes.

The 100 TB problem these solve is MEMORY, not CPU: a 64-dim float32
embedding is 256 bytes/row; int8 SQ stores 64 bytes (4x) and PQ with
m=8 subspaces stores 8 bytes (32x), so a corpus whose raw vectors
overflow the cluster's aggregate RAM scans entirely from compressed
codes.  This is the Jégou/Douze/Schmid PQ recipe (the design Faiss
ships as ``IVFPQ``), re-expressed Spark-first:

* **Encode is a zero-shuffle, whole-stage-codegen map.**  Codebooks are
  metadata-sized (m·k·d_sub doubles) and enter the plan as ONE nested
  array literal; per-row argmin runs in ``transform``/``aggregate``
  lambdas — no Python UDF, no explode, no join, no shuffle
  (plan-asserted in tests/test_quantization.py).
* **Search is a compressed scan + TakeOrderedAndProject.**  The
  query-dependent ADC lookup table is computed driver-side (m·k
  doubles), broadcast as a literal, and each row's approximate distance
  is an m-term table lookup — the scan reads ONLY the code column
  (column pruning drops the raw vectors), and ``orderBy().limit(k)``
  collapses to a per-partition top-k merge, never a global sort.
* **Training is sample-based**, as in every production PQ system
  (Faiss trains codebooks on ~10-100k vectors regardless of corpus
  size): a seeded sample is collected to the driver and Lloyd's k-means
  runs per subspace in numpy.  The corpus itself is never shuffled for
  training.
* **Engine-exact scoring discipline** (DETERMINISM.md): SQ distances
  are INTEGER dot products — exact, order-independent, bit-comparable
  across engines.  PQ distances fold squared differences in sequential
  order (Spark ``aggregate`` = left fold; the DuckDB oracle and the
  driver-side LUT builder replay the identical left-associated sum), so
  codes and ADC scores hash-match the oracle.

Reference scope note: the reference engine (wolfeidau/
buildkite-logs-parquet) has no vector search; this module is part of
the training-data-pipeline extension tier (SURVEY.md §7) alongside
operators/similarity.py, which holds the uncompressed exact/IVF/LSH
paths these codes approximate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.similarity import (
    _as_double,
    _as_double_sql,
    _col_sql,
    ivf_assign,
    lit_double_array as _lit_dmat,
    lit_double_array_sql as _lit_dmat_sql,
    probe_cells,
)

__all__ = [
    "sq_max_abs",
    "sq_encode",
    "sq_quantize_vec",
    "sq_topk",
    "seeded_codebooks",
    "pq_train",
    "pq_train_distributed",
    "pq_encode",
    "adc_lut",
    "pq_adc_dist",
    "pq_adc_topk",
    "ivf_pq_encode",
    "ivf_pq_topk",
    "write_ivfpq_lake",
    "ivf_pq_topk_at_rest",
    "bq_encode",
    "bq_quantize_vec",
    "bq_hamming_topk",
    "bq_rerank_topk",
]


# --------------------------------------------------------------- int8 SQ


def sq_max_abs(df: DataFrame, vec_col: str = "embedding") -> float:
    """Global max-|x| over the corpus — the symmetric int8 scale anchor.

    ONE mergeable ``max`` aggregate (no sums, so the result is the exact
    float maximum regardless of partitioning — deterministic in any
    engine); the collected value is a single scalar.  At 100 TB this is
    a metadata-sized statistics pass, the same shape as a column-stats
    scan; cache it with the codebook artifacts rather than recomputing.
    """
    v = _as_double(F.col(vec_col))
    row = df.select(
        F.max(F.array_max(F.transform(v, lambda x: F.abs(x)))).alias("m")
    ).first()
    m = row["m"]
    if m is None or m == 0.0:
        return 1.0
    return float(m)


def _sq_expr(v: Column, max_abs: float) -> Column:
    """``round-half-up(x * 127/max_abs)`` clamped to [-127, 127], as
    tinyint.  ``floor(x*s + 0.5)`` instead of ``round()`` because both
    engines define floor identically while round's half-case mode
    differs (HALF_UP vs HALF_EVEN) — the formula is the determinism
    carrier (DETERMINISM.md)."""
    s = 127.0 / float(max_abs)
    return F.transform(
        v,
        lambda x: F.least(
            F.greatest(F.floor(x * F.lit(s) + F.lit(0.5)), F.lit(-127.0)),
            F.lit(127.0),
        ).cast("tinyint"),
    )


def sq_encode(
    df: DataFrame,
    max_abs: float,
    vec_col: str = "embedding",
    out_col: str = "qvec",
) -> DataFrame:
    """int8-quantize an embedding column: ``array<float>`` →
    ``array<tinyint>`` (4x smaller at rest and in memory).  Pure
    per-row expression — zero shuffle, whole-stage codegen."""
    return df.withColumn(out_col, _sq_expr(_as_double(F.col(vec_col)), max_abs))


def sq_quantize_vec(vec: list[float], max_abs: float) -> list[int]:
    """Driver-side twin of ``_sq_expr`` for query vectors — identical
    formula and clamping so query codes match what ``sq_encode`` would
    produce for the same floats."""
    s = 127.0 / float(max_abs)
    out = []
    for x in vec:
        q = math.floor(float(x) * s + 0.5)
        out.append(int(min(max(q, -127.0), 127.0)))
    return out


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product (sequential fold in LONG — no overflow
    below 2^63/127² ≈ 5.7e14 dims, no float rounding at all)."""
    return F.aggregate(
        F.zip_with(
            a.cast("array<long>"), b.cast("array<long>"), lambda x, y: x * y
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq_topk(
    df: DataFrame,
    query_vec: list[float],
    max_abs: float,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "qvec",
) -> DataFrame:
    """Top-k by EXACT integer dot product over int8 codes.

    The score is an integer (bit-identical in every engine — int8 SQ is
    the rare ANN path with no float in the hot loop); ``int_dot``
    divided by ``(127/max_abs)²`` estimates the true float dot.  Ties
    break on ``id_col``.  Plan: code-column-only scan →
    TakeOrderedAndProject.
    """
    q = sq_quantize_vec(query_vec, max_abs)
    score = _int_dot(F.col(code_col), F.lit(q))
    s = 127.0 / float(max_abs)
    return (
        df.select(
            F.col(id_col),
            score.alias("int_dot"),
            (score / F.lit(s * s)).alias("approx_dot"),
        )
        .orderBy(F.col("int_dot").desc(), F.col(id_col))
        .limit(k)
    )


# ------------------------------------------------------------------- PQ


def seeded_codebooks(
    m: int = 8,
    k: int = 16,
    d_sub: int = 8,
    seed: int = 11,
    scale: float = 0.15,
) -> list[list[list[float]]]:
    """Deterministic untrained codebooks (seeded PRNG) — the literal,
    reproducible starting point the oracle replays; ``pq_train`` refines
    them on data.  ``scale`` roughly matches unit-ish embedding
    component magnitudes so even untrained codes split the space."""
    import random as _random

    rng = _random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) * scale for _ in range(d_sub)] for _ in range(k)]
        for _ in range(m)
    ]


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 16384,
    seed: int = 11,
    iters: int = 12,
) -> list[list[list[float]]]:
    """Train PQ codebooks: per-subspace Lloyd's k-means on a seeded
    SAMPLE collected to the driver (numpy).

    Sample-based training is the production norm (Faiss trains on
    10-100k vectors however large the index): the corpus is scanned
    once with a seeded bernoulli sample — no shuffle, no iteration over
    distributed data; all iteration happens on the driver against a
    ≤``sample_rows``×dim float array.  Returns ``m`` codebooks of ``k``
    centroids each, ready for ``pq_encode``'s literal plan.
    """
    import numpy as np

    n = df.count()
    frac = min(1.0, (sample_rows * 1.25) / max(n, 1))
    rows = (
        df.select(_as_double(F.col(vec_col)).alias("v"))
        .sample(fraction=frac, seed=seed)
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    if x.ndim != 2 or x.shape[0] < k:
        raise ValueError(
            f"pq_train needs at least k={k} sampled vectors, got {x.shape}"
        )
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    rng = np.random.default_rng(seed)
    books: list[list[list[float]]] = []
    for s in range(m):
        sub = x[:, s * d_sub : (s + 1) * d_sub]
        # init: k distinct sampled subvectors (deterministic given seed)
        init_idx = rng.choice(sub.shape[0], size=k, replace=False)
        cents = sub[init_idx].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k):
                mask = assign == j
                if mask.any():
                    cents[j] = sub[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def _sqdist(c: Column, sub: Column) -> Column:
    """Sequential-fold squared L2 distance — the PQ determinism carrier:
    ``((0 + t1) + t2) + …`` with ``t_i = (c_i - v_i)²``; ``0 + t1 == t1``
    exactly (squares are non-negative), so the fold is bit-identical to
    the left-associated ``t1 + t2 + …`` the oracle SQL and ``adc_lut``
    write out."""
    return F.aggregate(
        F.zip_with(c, sub, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sqdist_sql(c: str, sub: str) -> str:
    """SQL source of :func:`_sqdist` — parses to the identical
    zip_with/aggregate tree (``0.0D`` is the same double-zero literal),
    so distances are bit-identical; exists because every Python-lambda
    higher-order function costs dozens of py4j round-trips of pure
    driver latency per plan build (round-11: 2.9 s of ann_topk's 3.5 s
    build was that chatter)."""
    # __lv-prefixed lambda variables (round-11 ADVICE): a lambda var
    # shadows any same-named column in the body — see similarity.dot_sql
    return (
        f"aggregate(zip_with({c}, {sub},"
        " (__lv0, __lv1) -> (__lv0 - __lv1) * (__lv0 - __lv1)),"
        " 0.0D, (__lv2, __lv3) -> __lv2 + __lv3)"
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Encode vectors to PQ codes: ``array<float>[dim]`` →
    ``array<int>[m]`` (byte-sized codes for k ≤ 256; 32x at m=8,dim=64).

    Zero-shuffle map: each subspace's codebook is a ``k × d_sub`` array
    literal; distances come out of ONE ``transform`` per subspace and
    the argmin is ``array_position(min)`` — first minimal index, ties to
    the lower code deterministically (same convention as ``ivf_assign``).

    Why higher-order functions and not unrolled arithmetic: a round-10
    A/B replaced the ``transform``/``aggregate`` lambdas with fully
    unrolled codegen expressions (codebook floats inlined as literals) —
    bit-identical values, but the ~10k-node expression tree cost MORE in
    Catalyst optimization + codegen compile per plan than the
    interpreted lambdas cost in execution (9.2s vs 1.5s at sf0.1 on 32
    partitions).  The real fix for the round-9 `pq` probe-leg time was
    partition fan-out of the single-row-group fixture
    (``__spark_entry__._fan_out``); per-row lambda interpretation
    parallelizes linearly.
    """
    v = _as_double_sql(vec_col)
    m = len(codebooks)
    d_sub = len(codebooks[0][0])

    # the whole m-code array is ONE SQL expression string (round-11):
    # the per-subspace transform/zip_with/aggregate lambda towers were
    # ~1 s of py4j round-trips per call at m=8 — the parsed tree (and
    # therefore every distance and argmin tie-break) is identical
    codes = []
    for s in range(m):
        sub = f"slice({v}, {s * d_sub + 1}, {d_sub})"
        cb = _lit_dmat_sql([[float(x) for x in c] for c in codebooks[s]])
        dists = f"transform({cb}, __lv8 -> {_sqdist_sql('__lv8', sub)})"
        codes.append(
            f"cast(array_position({dists}, array_min({dists})) - 1 as int)"
        )
    return df.withColumn(out_col, F.expr("array(" + ", ".join(codes) + ")"))


def adc_lut(
    query_vec: list[float], codebooks: list[list[list[float]]]
) -> list[list[float]]:
    """Asymmetric-distance lookup table: ``lut[s][j]`` = squared L2
    between the query's s-th subvector and codebook s's j-th centroid.
    Driver-side on plain floats (m·k·d_sub flops — metadata-sized), in
    the SAME left-fold order as ``_sqdist`` so the literal the plan
    broadcasts is bit-identical to what the engines would compute."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    lut: list[list[float]] = []
    for s in range(m):
        qs = [float(x) for x in query_vec[s * d_sub : (s + 1) * d_sub]]
        row = []
        for c in codebooks[s]:
            acc = 0.0
            for a, b in zip(c, qs):
                acc = acc + (float(a) - b) * (float(a) - b)
            row.append(acc)
        lut.append(row)
    return lut


def pq_adc_dist(code_col: Column, lut: list[list[float]]) -> Column:
    """Approximate squared distance from PQ codes: an m-term sequential
    fold of LUT lookups, unrolled into plain ``get`` arithmetic (the LUT
    rows are literals; m is small by construction, so the tree stays
    tiny) — same left-associated sum as the prior ``aggregate`` fold
    (``0.0 + t1 == t1`` exactly), bit-identical distances, strict-oracle
    re-verified.  Round-10 A/B vs the higher-order-function form
    measured EQUAL wall at sf0.1 (0.26s over cached codes either way);
    kept for the smaller interpreted-expression surface.  ``get`` is
    0-based and null-on-out-of-bounds, which matches ``zip_with``'s
    null propagation for NULL and too-SHORT code arrays; a code array
    LONGER than m would differ (``zip_with`` padded the LUT side with
    nulls → NULL, while a bare ``get`` fold ignores trailing codes), so
    a ``size(code_col) == m`` guard nulls that case explicitly and the
    old contract holds for every malformed shape (round-10 ADVICE)."""
    acc = None
    for s, row in enumerate(lut):
        term = F.get(
            _lit_dmat([float(x) for x in row]), F.get(code_col, s)
        )
        acc = term if acc is None else acc + term
    if acc is None:
        return F.lit(0.0)
    return F.when(F.size(code_col) == len(lut), acc).otherwise(
        F.lit(None).cast("double")
    )


def pq_adc_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    round_to: int = 6,
) -> DataFrame:
    """Top-k nearest by ADC over PQ codes: compressed-scan + per-partition
    top-k merge (TakeOrderedAndProject — never a global sort).  The scan
    touches ONLY ``(id_col, code_col)`` — at 100 TB that is the whole
    point: the raw vector column stays on disk.  Ascending distance,
    ties broken on ``id_col``; distances rounded for stable display and
    cross-engine comparison."""
    lut = adc_lut(query_vec, codebooks)
    return (
        df.select(
            F.col(id_col),
            F.round(pq_adc_dist(F.col(code_col), lut), round_to).alias(
                "adc_dist"
            ),
        )
        .orderBy(F.col("adc_dist"), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------- IVF-PQ


def ivf_pq_encode(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """IVF-PQ encode: coarse cell assignment (``ivf_assign`` — cosine to
    literal centroids, consistent with the module's IVF search paths)
    plus PQ codes of the RESIDUAL ``v − coarse[cell]`` — residual
    magnitudes are smaller than raw vectors, so the same codebook bits
    carry more precision (the classic IVF-PQ win).  Still a zero-shuffle
    map: the centroid matrix is one literal, the residual one
    ``zip_with``.  Partition/sort the output by ``cell_col`` (e.g. via
    ``similarity.write_ivf_lake``) and probes become partition pruning.
    """
    assigned = ivf_assign(df, coarse_centroids, vec_col)
    if cell_col != "ivf_cell":
        assigned = assigned.withColumnRenamed("ivf_cell", cell_col)
    cmat = _lit_dmat_sql([[float(x) for x in c] for c in coarse_centroids])
    # _col_sql(cell_col) instead of raw backticks (round-11 ADVICE): a
    # cell_col containing a backtick must escape like every other site
    resid = F.expr(
        f"zip_with({_as_double_sql(vec_col)},"
        f" element_at({cmat}, {_col_sql(cell_col)} + 1),"
        " (__lv0, __lv1) -> __lv0 - __lv1)"
    )
    out = pq_encode(
        assigned.withColumn("_resid", resid), codebooks, "_resid", code_col
    )
    return out.drop("_resid")


def ivf_pq_topk(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_code",
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ search: probe the query's ``n_probe`` nearest cells, score
    each probed cell's codes against that CELL's residual-query LUT
    (``q − coarse[cell]``), merge, top-k.

    Per-cell work is a filtered compressed scan (on a cell-partitioned
    lake: partition pruning — only probed cells are read at all) + the
    same m-term LUT fold as flat PQ; the probe legs union into one
    TakeOrderedAndProject.  ``n_probe`` is small by construction, so the
    union width is bounded and driver-side LUT cost is n_probe·m·k.
    """
    probes = probe_cells(coarse_centroids, query_vec, n_probe)
    legs = []
    for cid in probes:
        qres = [
            float(q) - float(c)
            for q, c in zip(query_vec, coarse_centroids[cid])
        ]
        lut = adc_lut(qres, codebooks)
        legs.append(
            df.where(F.col(cell_col) == cid).select(
                F.col(id_col),
                F.round(pq_adc_dist(F.col(code_col), lut), round_to).alias(
                    "adc_dist"
                ),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy(F.col("adc_dist"), F.col(id_col)).limit(k)


def write_ivfpq_lake(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
    keep_vectors: bool = False,
) -> None:
    """Materialize the IVF-PQ index AT REST: residual-encode
    (``ivf_pq_encode``) and write partitioned by ``ivf_cell`` — one
    directory per coarse cell, rows carrying only ``(id, pq_code)``
    unless ``keep_vectors``.

    This is the full Faiss-at-rest analog: the index is 8 bytes/vector
    of codes (m=8) plus directory structure; a probed search
    (``ivf_pq_topk_at_rest``) reads ONLY the probed cells' directories
    (partition pruning — plan-asserted in tests) and ONLY the code
    column.  Keep the coarse centroids + codebooks (driver-side, KB)
    beside the lake as the query-time artifacts.
    """
    enc = ivf_pq_encode(df, coarse_centroids, codebooks, vec_col)
    cols = [id_col, "ivf_cell", "pq_code"] + (
        [vec_col] if keep_vectors else []
    )
    enc.select(*cols).write.partitionBy("ivf_cell").mode(mode).parquet(path)


def ivf_pq_topk_at_rest(
    spark,
    path: str,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ search against a ``write_ivfpq_lake`` layout: the probed
    cells enter the scan as partition-column equality filters, so the
    read is pruned to n_probe directories BEFORE any IO (PartitionFilters
    — the plan assertion in tests), and each probed cell scores its
    residual-query ADC LUT exactly as the in-memory form."""
    df = spark.read.parquet(path)
    return ivf_pq_topk(
        df,
        coarse_centroids,
        codebooks,
        query_vec,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        round_to=round_to,
    )


# --------------------------------------------------------- 1-bit binary


def bq_encode(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "bq_bits",
) -> DataFrame:
    """1-bit binary quantization: the sign bit of every component packed
    into ``ceil(dim/63)`` longs (63 bits per word keeps every weight and
    partial sum positive in a signed long) — ~256x smaller than float32,
    the coarsest rung of the SQ→PQ→binary compression ladder (the
    rerank recipe: binary scan → PQ refine → exact rerank).

    Bit i of word w = (v[63w + i] ≥ 0).  Pure per-row expression: each
    word is a weighted fold with the bit weights as ONE literal
    ``array<long>`` and a LONG accumulator — doubles are integer-exact
    only to 2^53, so a double fold silently drops low bits once a word
    spans >53 positions; the integer fold is exact for all 63.  Zero
    shuffle, codegen'd; the last word's missing components read as 0
    bits (zip_with null-pads → otherwise(0)).  Hamming distance over
    these codes approximates angular distance (the same sign-sketch as
    ``hyperplane_buckets``, but over the identity basis and packed for
    arithmetic rather than bucketing).
    """
    v = _as_double(F.col(vec_col))
    # 63 bits per word: weights stay positive in signed longs; the fold
    # runs entirely in long space so every bit position 0..62 is exact
    weights = F.lit([2**i for i in range(63)]).cast("array<long>")
    n_words = F.ceil(F.size(v) / F.lit(63)).cast("int")
    zero = F.lit(0).cast("long")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda wi: F.aggregate(
            F.zip_with(
                F.slice(v, wi * F.lit(63) + F.lit(1), 63),
                F.slice(weights, 1, 63),
                lambda x, w: F.when(x >= 0, w).otherwise(zero),
            ),
            zero,
            lambda acc, b: acc + b,
        ),
    )
    return df.withColumn(out_col, words)


def bq_quantize_vec(vec: list[float]) -> list[int]:
    """Driver-side twin of ``bq_encode`` for query vectors."""
    out = []
    for w0 in range(0, len(vec), 63):
        word = 0
        for i, x in enumerate(vec[w0 : w0 + 63]):
            if float(x) >= 0:
                word |= 1 << i
        out.append(word)
    return out


def bq_hamming_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "bq_bits",
) -> DataFrame:
    """Top-k by Hamming distance between packed sign bits — the exact
    integer distance over the 1-bit codes (``bit_count(xor)`` per word,
    summed), so like int8 SQ there is no float in the hot loop.  Scan
    reads only the code column; TakeOrderedAndProject merges per-
    partition heads.  Rerank the returned candidates with PQ or exact
    cosine (pass k a few times larger than the final cut)."""
    q = F.lit([int(x) for x in bq_quantize_vec(query_vec)])
    ham = F.aggregate(
        F.zip_with(
            F.col(code_col), q, lambda a, b: F.bit_count(a.bitwiseXOR(b))
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        df.select(F.col(id_col), ham.alias("hamming"))
        .orderBy(F.col("hamming"), F.col(id_col))
        .limit(k)
    )


def bq_rerank_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    prefilter_k: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "bq_bits",
    round_to: int = 4,
) -> DataFrame:
    """Two-stage search: binary Hamming scan for ``prefilter_k``
    candidates, exact cosine rerank for the final ``k`` — the standard
    compressed-search recipe (coarse cheap scan over 1-bit codes, exact
    math only on the shortlist).

    ``df`` must carry both the raw vectors and ``bq_encode`` codes (at
    rest: codes in the hot table, vectors joined from the cold one).
    The candidate id set is metadata-sized (``prefilter_k`` rows) and
    broadcast into a semi-join, so the exact stage scans nothing but
    the shortlist; with ``prefilter_k ≈ 10k`` recall approaches exact
    search at a fraction of the float work (tested).
    """
    from buildkite_logs_parquet_spark.operators.similarity import (
        cosine_topk,
    )

    cand = bq_hamming_topk(
        df, query_vec, k=prefilter_k, id_col=id_col, code_col=code_col
    ).select(id_col)
    shortlist = df.join(F.broadcast(cand), id_col, "left_semi")
    return cosine_topk(
        shortlist, query_vec, k=k, id_col=id_col, vec_col=vec_col,
        round_to=round_to,
    )


def pq_train_distributed(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    init_codebooks: list[list[list[float]]] | None = None,
    max_iter: int = 10,
    tol: float = 1e-6,
    seed: int = 11,
) -> tuple[list[list[list[float]]], list[dict]]:
    """Full-corpus PQ codebook training — the distributed complement to
    the sample-based ``pq_train`` for corpora whose tail matters (a
    driver sample can underfit rare-but-important subspace regions).

    Same driver-resolved Lloyd shape as ``similarity.kmeans_fit``: the
    state is the m·k·d_sub codebook matrix, re-entering every round as
    ONE nested array literal.  Each round is a single job: explode each
    vector into its m (subspace, subvector) rows — the honest m× row
    cost of full-corpus training — assign each to its subspace's nearest
    codeword (``element_at`` of the codebook literal by subspace id, so
    one expression serves all subspaces), and reduce to per-(subspace,
    code) DECIMAL element sums + counts: a ≤ m·k-row mergeable
    aggregate, deterministic in any engine and under any partitioning.
    Empty codewords keep their previous centroid.  Returns
    ``(codebooks, history)`` with per-round max centroid drift (L2).
    """
    import math as _math

    v = _as_double(F.col(vec_col))
    if init_codebooks is None:
        # seed from the data dimension
        dim = len(df.select(v.alias("v")).first()["v"])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        books = seeded_codebooks(m=m, k=k, d_sub=dim // m, seed=seed)
    else:
        books = [[list(map(float, c)) for c in b] for b in init_codebooks]
    d_sub = len(books[0][0])

    sub_rows = df.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("s"),
                    F.slice(v, s * F.lit(d_sub) + F.lit(1), d_sub).alias(
                        "sub"
                    ),
                ),
            )
        ).alias("e")
    ).select("e.s", "e.sub")
    # every round re-scans the SAME exploded subvectors: persist them once
    # (kmeans_fit's persist_input pattern) so rounds 2..N read cached
    # columnar blocks instead of re-decoding parquet and re-exploding —
    # the cache is m structs per vector, the same order of bytes as the
    # raw vector column
    from pyspark import StorageLevel

    sub_rows = sub_rows.persist(StorageLevel.MEMORY_AND_DISK)

    sums = tuple(
        F.sum(F.element_at(F.col("sub"), i + 1).cast("decimal(28,12)")).alias(
            f"_s_{i}"
        )
        for i in range(d_sub)
    )
    history: list[dict] = []
    try:
        for it in range(1, max_iter + 1):
            # per-round assignment as ONE SQL string (round-11): the
            # _lit_dmat + transform + _sqdist lambda tower re-paid its
            # py4j chatter EVERY iteration
            cb_lit = _lit_dmat_sql(books)  # m x k x d_sub nested literal
            dists = (
                f"transform(element_at({cb_lit}, `s` + 1),"
                f" __lv8 -> {_sqdist_sql('__lv8', '`sub`')})"
            )
            code = F.expr(
                f"cast(array_position({dists}, array_min({dists})) - 1"
                " as int)"
            )
            rows = (
                sub_rows.withColumn("code", code)
                .groupBy("s", "code")
                .agg(F.count("*").alias("_n"), *sums)
                .collect()
            )
            by_key = {(r["s"], r["code"]): r for r in rows}
            new_books = []
            max_drift = 0.0
            for s in range(m):
                nb = []
                for j in range(k):
                    r = by_key.get((s, j))
                    if r is None:
                        nb.append(list(books[s][j]))
                        continue
                    n = r["_n"]
                    cent = [float(r[f"_s_{i}"]) / n for i in range(d_sub)]
                    drift = _math.sqrt(
                        sum((a - b) ** 2 for a, b in zip(cent, books[s][j]))
                    )
                    max_drift = max(max_drift, drift)
                    nb.append(cent)
                new_books.append(nb)
            books = new_books
            history.append({"iter": it, "max_drift": max_drift})
            if max_drift <= tol:
                break
    finally:
        sub_rows.unpersist()
    return books, history


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
) -> dict:
    """Fit a k-component PCA over an embedding column — the standard
    pre-rotation/reduction in front of scalar/product quantization
    (OPQ's cheap cousin: decorrelated, variance-ordered axes make
    per-subspace codebooks and int8 grids spend their bits where the
    signal is).

    Spark-first: this wraps ``pyspark.ml.feature.PCA`` (the platform's
    distributed covariance + eigendecomposition) behind the repo's
    array<float> column convention via ``array_to_vector`` /
    ``vector_to_array`` — no driver-side matrix of corpus size ever
    exists; driver state is the k×d component matrix + the d-vector
    mean.

    Returns ``{"components": [[...]], "variance": [...], "dim": d,
    "k": k}`` (components row-major, variance = explained variance per
    component).  Components derive from the mean-centered covariance
    (Spark computes it internally) but — matching Spark's own PCAModel
    .transform — projection multiplies RAW vectors, so cosine-style
    downstream scoring sees a consistent convention.  Signs are
    normalized so each component's largest-magnitude coefficient is
    positive — eigenvector sign is arbitrary, and normalizing makes
    fits comparable across runs.
    """
    from pyspark.ml.feature import PCA as _PCA
    from pyspark.ml.functions import array_to_vector

    d = len(df.select(vec_col).first()[0])
    if not (0 < k <= d):
        raise ValueError(f"k must be in (0, {d}]")
    vecs = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
    )
    model = _PCA(k=int(k), inputCol="_v", outputCol="_p").fit(vecs)
    pc = model.pc.toArray()  # d × k
    comps = []
    for j in range(int(k)):
        col = [float(pc[i][j]) for i in range(d)]
        # sign normalization: largest |coefficient| positive
        m = max(range(d), key=lambda i: abs(col[i]))
        if col[m] < 0:
            col = [-x for x in col]
        comps.append(col)
    return {
        "components": comps,
        "variance": [float(v) for v in model.explainedVariance],
        "dim": d,
        "k": int(k),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project an embedding column onto fitted PCA components: one
    narrow expression per component (the sequential ``aggregate`` fold
    every similarity op here uses — deterministic order, no UDF), each
    a dot product against a broadcast-literal component row.  Output is
    ``array<double>`` of length k, ready for ``sq_encode``/``pq_train``
    at the reduced dimension."""
    v = F.col(vec_col).cast("array<double>")
    outs = []
    for comp in model["components"]:
        lit = F.array(*[F.lit(float(x)) for x in comp])
        outs.append(
            F.aggregate(
                F.zip_with(v, lit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return df.withColumn(out_col, F.array(*outs))
