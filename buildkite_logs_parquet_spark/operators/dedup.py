"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference extensions (the reference has no cross-document ops); each
is designed shuffle-aware for the 100 TB point:

* exact dedup — hash-groupBy on a digest of the key columns (shuffle on the
  digest, not the full text; map-side partial aggregation).
* MinHash + LSH — shingle → P permutation-min signature in ONE aggregation
  (no per-permutation shuffle), band → bucket self-join restricted to
  same-bucket candidates (never the O(n²) cross join).
* SimHash — token-hash bit votes folded into a single integer fingerprint.
* n-gram Jaccard — exact verification for candidate pairs.
* embedding cosine near-dup — see operators/similarity.py.

Hashing: ``hash_fn="md5"`` (default) is bit-portable across engines (used by
the DuckDB oracle harness); ``hash_fn="xxhash64"`` is the faster JVM path
for production — same plans, different scalar.
"""

from __future__ import annotations

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash64(col: Column, seed: int, hash_fn: str = "md5") -> Column:
    """Deterministic 60-bit (md5) / 64-bit (xxhash64) hash of a string."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    # first 15 hex digits of md5 → < 2^60, engine-portable, no sign issues
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10).cast(
        "long"
    )


#: universal-hash modulus (largest 32-bit prime) — permutation hashes are
#: (a_p·(h mod P) + b_p) mod P with small a_p, so products stay < 2^63 and
#: the identical integer arithmetic runs exactly in any SQL engine.
MINHASH_PRIME = 4294967291


def _perm_hash(base: Column, p: int) -> Column:
    a = 2 * p + 1
    b = 10007 * p + 12345
    return (F.lit(a) * (base % MINHASH_PRIME) + F.lit(b)) % MINHASH_PRIME


# ------------------------------------------------------------- exact dedup


def exact_dedup_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row of corpus-level duplication stats over ``cols``."""
    key = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols]))
    per_key = df.groupBy(key.alias("dup_key")).agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").alias("unique_rows"),
        F.sum("n").alias("total_rows"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)).alias(
            "removable_duplicates"
        ),
        F.sum((F.col("n") > 1).cast("long")).alias("duplicate_groups"),
    )


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keep one row per distinct key.  ``dropDuplicates`` shuffles whole
    rows; hashing first keeps the shuffle narrow when rows are wide."""
    return df.dropDuplicates(cols)


# ------------------------------------------------------------ shingling


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition ahead of a row-multiplying stage when the input arrives
    in fewer partitions than cores (e.g. one small parquet file).  The
    narrow pre-shuffle of document rows is trivially cheap next to the
    exploded work it parallelizes; at real scale inputs already have
    enough partitions and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Distinct character k-shingles per document.  Documents shorter than
    ``k`` contribute their whole text as a single shingle."""
    return _shingles_inline(df, id_col, text_col, k)


def _shingles_inline(
    df: DataFrame, id_col: str, text_col: str, k: int, distinct: bool = True
) -> DataFrame:
    """Explode-only shingle derivation (no self-join): one pass, one shuffle
    only for the downstream distinct/agg.  Pass ``distinct=False`` for
    consumers that are multiset-invariant (MinHash minima) — skipping the
    dedup removes an entire shuffle of the exploded shingle table."""
    n_sh = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    df = _fan_out(df)
    out = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda p: F.col(text_col).substr(p, F.lit(k)),
            )
        ).alias("shingle"),
    )
    return out.distinct() if distinct else out


# ------------------------------------------------------------- MinHash/LSH


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    shingle_k: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash signature per document: ``minhash_0 .. minhash_{P-1}``.

    All P permutation minima are computed in ONE groupBy over the shingle
    table — a single shuffle keyed on the document id, no P-fold row blowup
    and no repeated scan.  The expensive digest runs ONCE per shingle; the
    P permutations are cheap universal-hash rearrangements of it (classic
    a·h+b mod prime), which cuts the dominant cost by P× at any scale.
    """
    # min over a multiset equals min over the set: no distinct needed —
    # one shuffle (the signature groupBy) instead of two
    sh = _shingles_inline(df, id_col, text_col, shingle_k, distinct=False)
    return _signatures_from_shingles(sh, id_col, num_perm, hash_fn)


def _signatures_from_shingles(
    sh: DataFrame, id_col: str, num_perm: int, hash_fn: str = "md5"
) -> DataFrame:
    """Signature aggregate over an existing (id, shingle) relation —
    split out (round-11) so callers that need BOTH the raw shingles and
    the signatures (``neardup_eval``) explode the text once."""
    base = _hash64(F.col("shingle"), 0, hash_fn)
    hashed = sh.select(id_col, base.alias("_h"))
    aggs = [
        F.min(_perm_hash(F.col("_h"), p)).alias(f"minhash_{p}")
        for p in range(num_perm)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def _banded(
    signatures: DataFrame,
    id_col: str,
    num_perm: int,
    bands: int,
    carry_signature: bool = False,
) -> DataFrame:
    """Explode a signature table into (id, band, key[, sig]) rows.

    Band key = concatenated minhashes of the band's rows.  With
    ``carry_signature`` the full signature travels alongside the band key
    as an array — P longs per row, so carrying it is cheap and lets the
    band self-join compute signature agreement without rejoining the
    signature table.
    """
    rows_per_band = num_perm // bands
    band_cols = []
    for b in range(bands):
        key = F.concat_ws(
            "_",
            *[
                F.col(f"minhash_{b * rows_per_band + r}")
                for r in range(rows_per_band)
            ],
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    sig_cols = (
        [F.array(*[F.col(f"minhash_{p}") for p in range(num_perm)]).alias("sig")]
        if carry_signature
        else []
    )
    out_cols = ["sig"] if carry_signature else []
    return signatures.select(
        F.col(id_col), *sig_cols, F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        id_col,
        *out_cols,
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one LSH band.

    The self-join is an equi-join on (band index, band key) — only
    same-bucket pairs are ever materialized.  Skewed buckets (e.g.
    boilerplate-heavy corpora) are handled by AQE skew-join splitting.
    """
    banded = _banded(signatures, id_col, num_perm, bands)
    left = banded.select(F.col(id_col).alias("id_a"), "band", "key")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "key")
    return (
        left.join(right, on=["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "md5",
    persist_signatures: bool = True,
) -> DataFrame:
    """LSH candidates refined by the signature-estimated Jaccard
    (fraction of agreeing minhashes ≥ threshold).

    Scale shape: the shingle→hash→groupBy signature pipeline runs ONCE.
    Signatures travel through the band self-join as a P-long array, so the
    agreement fraction is computed in place — no rejoin against the
    signature table.  The signature table itself (id + P longs — tiny
    relative to the corpus) is persisted MEMORY_AND_DISK so the two sides
    of the self-join share one computation instead of re-shingling the
    corpus; pass ``persist_signatures=False`` for one-shot plans where the
    caller manages materialization (e.g. checkpointed to parquet).
    """
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k, hash_fn)
    if persist_signatures:
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    banded = _banded(sigs, id_col, num_perm, bands, carry_signature=True)
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band", "key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band", "key"
    )
    agree = sum(
        (F.col("sig_a")[p] == F.col("sig_b")[p]).cast("int")
        for p in range(num_perm)
    )
    return (
        a.join(b, on=["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (agree / F.lit(num_perm)).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
        .distinct()
    )


# --------------------------------------------------------- exact Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
    raw_shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs sharing ≥1 shingle.

    Without ``candidates`` the pair space is bounded by co-occurring
    shingles (an inverted-index join), never a cross join; pass LSH
    candidates to bound it further at scale.  That co-occurrence bound
    is QUADRATIC per shingle — a boilerplate k-gram shared by D docs
    contributes D² pairs — so at scale set ``max_shingle_df``: shingles
    shared by more than that many documents are dropped from the shingle
    UNIVERSE (both intersections and set sizes, so the result is a true
    Jaccard over the capped universe — the classic DF cap of exact-
    similarity indexes).

    Round-11 optimization: the (capped) shingle relation feeds three
    consumers — set sizes and both sides of the inverted-index join —
    and Catalyst re-evaluated the shingling (and the DF-cap semi-join)
    once per consumer; it is persisted MEMORY_AND_DISK for the duration
    of the returned plan (narrow id+shingle rows).  Callers own cache
    hygiene after materializing (the ``set_similarity_join`` contract).
    """
    from pyspark import StorageLevel

    # ``raw_shingles``: an existing possibly-multiset (id, shingle)
    # relation for the SAME documents and the SAME k (round-11 —
    # ``neardup_eval`` shares one explode between this truth index and
    # its signature pipeline); distincted here, so values are identical
    # to the self-derived path
    if raw_shingles is not None:
        sh = raw_shingles.distinct()
    else:
        sh = _shingles_inline(df, id_col, text_col, k)
    if max_shingle_df is not None:
        # anti-join on the OVER-cap shingles rather than semi-join on the
        # under-cap ones: the drop set holds at most (total shingle
        # occurrences)/max_df distinct values — ≥ max_df× smaller than
        # the keep side by construction — so AQE can plan it as a
        # broadcast anti join instead of shuffling the whole shingle
        # relation against a shingle-universe-sized keep set (round-11;
        # identical kept rows: df ≤ cap ⇔ NOT df > cap, df never NULL).
        # NULL shingles (NULL-text docs) are dropped explicitly first:
        # the old semi-join dropped them structurally (NULL never
        # matches), the anti join KEEPS them — pairs-invariant (a NULL
        # key never equi-joins) but the persisted relation and its
        # set_size rows must match the proven shape (round-11 ADVICE)
        sh = sh.where(F.col("shingle").isNotNull())
        drop = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > int(max_shingle_df))
            .select("shingle")
        )
        sh = sh.join(drop, "shingle", "left_anti")
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("intersection"))
    )
    if candidates is not None:
        inter = inter.join(candidates.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("intersection")
                / (F.col("size_a") + F.col("size_b") - F.col("intersection"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------------- SimHash


#: bit-count field width for the packed SimHash aggregation.  20 bits per
#: field (3 fields per signed long) bounds the per-field sum at
#: 2^20 tokens · 2^40 shift = 2^60 < 2^63, so ANSI-mode addition cannot
#: overflow for documents up to ~1M whitespace tokens.
_SIMHASH_FIELD_BITS = 20


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document SimHash fingerprint over whitespace tokens.

    Token hashes vote per bit; the fingerprint packs the majority votes.
    One explode + one groupBy, all JVM-side.  The per-bit ones-counts are
    packed three-to-a-long (20-bit fields), so the aggregation carries
    ``ceil(bits/3)`` sum buffers instead of ``bits`` — the aggregate update
    is the hot path at token volume and this cuts it ~3× (measured 1.0s →
    0.6s on 270k tokens).  Unpacking and the majority vote run once per
    *document*, which is noise.  Documents beyond 2^20 (~1M) whitespace
    tokens would overflow a field and fail loudly under ANSI arithmetic
    rather than corrupt the fingerprint.
    """
    # expressions are built as SQL strings (one F.expr each) — building
    # hundreds of Column objects through py4j costs ~1s of driver time per
    # plan, which dwarfed the actual execution at bench scale
    tokens = _fan_out(df).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    hashed = tokens.select(id_col, _hash64(F.col("tok"), 0, hash_fn).alias("_h"))
    fb = _SIMHASH_FIELD_BITS
    fields_per_long = 63 // fb
    n_packs = -(-bits // fields_per_long)
    packs = []
    for j in range(n_packs):
        terms = [
            f"shiftleft(shiftright(_h, {j * fields_per_long + i}) & 1, {fb * i})"
            for i in range(fields_per_long)
            if j * fields_per_long + i < bits
        ]
        packs.append(F.expr(f"sum({' + '.join(terms)})").alias(f"pk_{j}"))
    voted = hashed.groupBy(id_col).agg(F.count("*").alias("_n"), *packs)
    # majority vote via ones-count: vote_b > 0  ⇔  2·ones_b > n
    mask = (1 << fb) - 1
    bit_terms = []
    for b in range(bits):
        j, i = divmod(b, fields_per_long)
        ones_b = f"(shiftright(pk_{j}, {fb * i}) & {mask})"
        bit_terms.append(
            f"(CASE WHEN {ones_b} * 2 > _n THEN CAST({2 ** b} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    fp = F.expr(" + ".join(bit_terms))
    return voted.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_duplicates(
    fingerprints: DataFrame, id_col: str, max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Pairs within ``max_hamming`` bit flips, bucketed by bit-bands
    (pigeonhole: ≤ d flips over d+1 bands → at least one identical band)."""
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("simhash"), i * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias("key"),
        )
        for i in range(n_bands)
    ]
    banded = fingerprints.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "key")
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    # popcount intrinsic — one expression instead of `bits` shift-mask
    # terms; result widened to long to keep the output schema stable
    hamming = F.bit_count(xor).cast("long")
    return (
        a.join(b, on=["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------------ segment dedup


#: positions-per-document bound for the packed (doc, pos) ordinal — 2^20
#: segments ≈ 10M words per document; ANSI arithmetic fails loudly beyond
_SEGMENT_POS_BOUND = 1 << 20


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
) -> DataFrame:
    """Corpus-level *segment* deduplication: split every document into
    non-overlapping ``k``-word chunks and keep only the canonical (first)
    occurrence of each distinct chunk corpus-wide — the paragraph/line
    dedup step of C4/CCNet-style pipelines, expressed for a corpus whose
    documents are single-line word streams.

    Canonical occurrence = the lowest ``(doc_id, position)`` — encoded as
    one packed BIGINT so "first" is a plain ``min`` aggregate that partial-
    aggregates map-side (no min-by-struct, which not every engine orders
    identically).

    Output: one row per document — ``n_segments``, ``n_kept``, and
    ``dedup_text`` (the kept chunks rejoined in order; ``''`` when every
    chunk was seen earlier).

    100 TB shape: the keep/drop decision is computed on a projected
    ``(id, pos, digest, ord)`` table, so the digest-keyed shuffles (the
    canonical ``min`` groupBy and the membership join) move 16-byte
    digests + packed longs only — a corpus-wide boilerplate chunk is a
    hot digest, and keeping text out of that skewed reduce partition is
    what makes the skew survivable (partial ``min`` bounds the agg
    map-side; the slim membership join is AQE-skew-splittable).  Text
    moves through exactly TWO skew-free exchanges: the keep-flag rejoin
    keyed by ``(id, pos)``, and the per-document rebuild groupBy —
    unavoidable, since ``dedup_text`` must be reassembled somewhere.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_seg = F.greatest(
        F.floor((F.size(words) + (k - 1)) / F.lit(k)), F.lit(1).cast("long")
    )
    seg_at = lambda i: F.array_join(F.slice(words, i * k + 1, k), " ")  # noqa: E731
    segs = _fan_out(df).select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.sequence(F.lit(0), n_seg - 1), seg_at)
        ).alias("pos", "seg"),
    )
    packed = F.col(id_col) * _SEGMENT_POS_BOUND + F.col("pos")
    # keep/drop decided entirely on the text-free projection
    slim = segs.select(
        id_col, "pos", F.md5(F.col("seg")).alias("_h"), packed.alias("_ord")
    )
    canon = slim.groupBy("_h").agg(F.min("_ord").alias("_first"))
    kept = slim.join(canon, on="_h").select(
        id_col, "pos", (F.col("_ord") == F.col("_first")).alias("kept")
    )
    marked = segs.join(kept, on=[id_col, "pos"])
    kept_segs = F.array_sort(
        F.collect_list(F.when(F.col("kept"), F.struct("pos", "seg")))
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(kept_segs, lambda s: s["seg"]), " "
        ).alias("dedup_text"),
    )


def _rolling_window_hashes(id_col: str, id_type: str, k: int):
    """mapInPandas generator + schema for Buzhash (cyclic-polynomial)
    k-window hashes over per-token hash arrays: ``H_i = XOR_j
    rotl(h_{i+j}, k-1-j)`` — rolling, position-shift-invariant, and O(n)
    FULLY VECTORIZED per document (prefix-XOR via ``np.bitwise_xor.
    accumulate`` after de-rotating each token hash by its absolute
    position; no per-token Python loop).  Token hashing itself stays
    JVM-side (``xxhash64`` inside ``transform`` — codegen'd), so the
    Arrow boundary ships long arrays only, never text."""
    import numpy as np
    import pandas as pd

    mask = np.uint64(63)
    full = np.uint64(64)

    def _rotl(x, s):
        s = s & mask
        return np.where(s == 0, x, (x << s) | (x >> (full - s)))

    def gen(batches):
        for pdf in batches:
            ids, poss, hs = [], [], []
            for did, th in zip(pdf[id_col], pdf["_th"]):
                h = np.asarray(th, dtype=np.int64).view(np.uint64)
                nn = h.shape[0]
                if nn < k:
                    continue
                m = np.arange(nn, dtype=np.uint64)
                # de-rotate by absolute position: g_m = rotr(h_m, m)
                g = _rotl(h, (full - (m & mask)) & mask)
                G = np.zeros(nn + 1, dtype=np.uint64)
                G[1:] = np.bitwise_xor.accumulate(g)
                win = G[k:] ^ G[: nn + 1 - k]
                i = np.arange(nn - k + 1, dtype=np.uint64)
                H = _rotl(win, np.uint64(k - 1) + i)
                ids.append(np.full(nn - k + 1, did))
                poss.append(i.astype(np.int32))
                hs.append(H.view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "_h": np.concatenate(hs),
                    }
                )

    return gen, f"{id_col} {id_type}, pos int, _h long"


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 50,
    hash_fn: str = "rolling",
) -> DataFrame:
    """Exact duplicated-substring removal at ARBITRARY alignment (the
    ExactSubstr recipe of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", reformulated for DataFrame execution):
    every ``k``-token window occurring more than once corpus-wide is cut
    from every occurrence EXCEPT the globally first (lowest (doc, pos)),
    with overlapping duplicate windows merged into maximal spans before
    cutting.

    Complements ``segment_dedup`` (fixed non-overlapping chunks): a
    duplicated paragraph shifted by one token defeats chunk alignment but
    never the rolling window.  Lee et al. implement this with a corpus
    suffix array — inherently single-machine; the window-hash + min-ord
    formulation below reaches the same duplicated-span set for spans
    ≥ k tokens using only hash-keyed shuffles.

    Output: one row per document — ``n_tokens`` (original),
    ``n_removed``, ``n_dup_spans``, ``dedup_text``.

    100 TB shape: the hash-keyed shuffles (canonical-min groupBy with
    map-side partial min, membership join) carry (id, pos, hash) longs
    only — text never enters them (the ``segment_dedup`` skew
    discipline).  Only DUP anchors reach the per-document interval-merge
    window, so its cost is bounded by duplication density, not corpus
    size; the rebuild is one per-doc aggregate of (rare) span structs
    plus a codegen token filter.  Window hashing is O(n) with the
    default ``hash_fn="rolling"``: tokens hash JVM-side (``xxhash64``
    inside ``transform``), then one Arrow-batched numpy pass computes
    all k-window Buzhash values (``_rolling_window_hashes``) — no
    O(n·k) gram-text materialization.  ``hash_fn="md5"`` keeps the
    portable per-gram path (the test oracle; O(k) text bytes per
    position), ``"xxhash64"`` its JVM twin; all three produce identical
    dedup output absent hash collisions (property-tested).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = _fan_out(df).select(
        F.col(id_col), F.col(text_col), toks.alias("_toks")
    )
    n = F.size(F.col("_toks"))
    if hash_fn == "rolling":
        hashed = base.where(n >= k).select(
            F.col(id_col),
            F.transform(F.col("_toks"), lambda t: F.xxhash64(t)).alias("_th"),
        )
        gen, schema = _rolling_window_hashes(
            id_col, df.schema[id_col].dataType.simpleString(), k
        )
        slim = hashed.mapInPandas(gen, schema=schema).select(
            id_col,
            "pos",
            "_h",
            (F.col(id_col) * _SEGMENT_POS_BOUND + F.col("pos")).alias("_ord"),
        )
    else:
        # gram at 0-based pos i covers tokens [i, i+k); docs shorter than
        # k contribute no grams (sequence() descends on empty — guard)
        gram_at = lambda i: F.array_join(  # noqa: E731
            F.slice(F.col("_toks"), i + 1, k), " "
        )
        grams = base.where(n >= k).select(
            F.col(id_col),
            F.posexplode(
                F.transform(F.sequence(F.lit(0), n - k), gram_at)
            ).alias("pos", "_g"),
        )
        slim = grams.select(
            id_col,
            "pos",
            _hash64(F.col("_g"), 1, hash_fn).alias("_h"),
            (F.col(id_col) * _SEGMENT_POS_BOUND + F.col("pos")).alias("_ord"),
        )
    # round-11 optimization: slim feeds BOTH the canonical-min agg and
    # the anchors join; without a persist the window-hash pass (the
    # Arrow-batched Buzhash stage on the default path) executed twice
    # per run.  Narrow (id, pos, hash, ord) longs — cache them, not the
    # text.  Callers own cache hygiene after materializing.
    from pyspark import StorageLevel

    slim = slim.persist(StorageLevel.MEMORY_AND_DISK)
    canon = slim.groupBy("_h").agg(
        F.min("_ord").alias("_first"), F.count("*").alias("_cnt")
    )
    # removal anchors: every non-first occurrence of a duplicated window
    anchors = (
        slim.join(canon, on="_h")
        .where((F.col("_cnt") >= 2) & (F.col("_ord") != F.col("_first")))
        .select(id_col, "pos")
    )
    # per-document interval merge of [pos, pos+k): a window over dup
    # anchors only (sparse), running max of span end decides continuation
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = anchors.withColumn(
        "_new", (prev_max_end.isNull() | (F.col("pos") > prev_max_end)).cast("long")
    )
    span_id = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    spans = (
        flagged.withColumn("_sid", span_id)
        .groupBy(id_col, "_sid")
        .agg(F.min("pos").alias("s"), (F.max("pos") + k).alias("e"))
    )
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_spans")
    )
    out = base.join(per_doc, on=id_col, how="left")
    spans_col = F.coalesce(
        F.col("_spans"), F.array().cast("array<struct<s:int,e:int>>")
    )
    # keep token j (0-based) unless some merged span covers it
    kept = F.filter(
        F.transform(F.col("_toks"), lambda t, j: F.struct(t.alias("t"), j.alias("j"))),
        lambda p: ~F.exists(
            spans_col, lambda sp: (p["j"] >= sp["s"]) & (p["j"] < sp["e"])
        ),
    )
    return out.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).alias("n_removed"),
        F.coalesce(F.size("_spans"), F.lit(0)).alias("n_dup_spans"),
        F.array_join(
            F.transform(kept, lambda p: p["t"]), " "
        ).alias("dedup_text"),
    )


# ------------------------------------------------- incremental (at-rest) LSH


def banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, sig, band_key) rows — the exchange format of the signature
    lake.  ``band_key`` packs (band index, band hash key) into ONE string
    column so every downstream join is a single-column equi-join that a
    single-column bucketing co-locates (Spark eliminates the bucketed
    side's Exchange only when the join keys equal the bucket column)."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k, hash_fn)
    banded = _banded(sigs, id_col, num_perm, bands, carry_signature=True)
    return banded.select(
        F.col(id_col),
        "sig",
        F.concat_ws(":", F.col("band"), F.col("key")).alias("band_key"),
    )


def write_signature_lake(
    df: DataFrame,
    id_col: str,
    text_col: str,
    table: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 8,
    hash_fn: str = "md5",
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus's banded MinHash signatures AT REST as a
    table bucketed (and sorted) by ``band_key``.

    This is the 100 TB form of near-dup dedup: the historical corpus is
    (min)hashed ONCE; each new crawl probes the lake with an equi-join in
    which the lake side — the big side — is never reshuffled (bucket
    pruning + co-location; plan-asserted in tests/test_dedup.py).  Append
    each accepted batch with ``mode="append"`` so the lake stays current
    without recomputation.
    """
    banded = banded_signatures(
        df, id_col, text_col, num_perm, bands, shingle_k, hash_fn
    )
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # an in-memory catalog forgets managed tables across sessions
        # while the warehouse directory persists; a stale location blocks
        # CREATE (LOCATION_ALREADY_EXISTS), so clear it after the drop
        wh = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(
            wh.rstrip("/") + "/" + table.split(".")[-1]
        )
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            fs.delete(jpath, True)
    # co-partition write tasks with the bucket function (same column, same
    # modulus, same Murmur3 hash): each task holds exactly one bucket's
    # rows, so the lake is n_buckets files per write — without this every
    # task fans out to up to n_buckets tiny files (the classic bucketed
    # small-files explosion)
    (
        banded.repartition(n_buckets, F.col("band_key"))
        .write.mode(mode)
        .bucketBy(n_buckets, "band_key")
        .sortBy("band_key")
        .saveAsTable(table)
    )


def incremental_near_dups(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    lake_table: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "md5",
    n_salts: int = 1,
) -> DataFrame:
    """Near-duplicate pairs for a NEW batch against an existing
    ``write_signature_lake`` corpus AND within the batch itself — without
    touching the historical text.

    Output: ``(id_a, id_b, est_jaccard, side)`` where ``side`` is
    ``history`` (id_a = new doc, id_b = historical doc) or ``batch``
    (both new, id_a < id_b).  Semantics match running
    ``minhash_near_duplicates`` over (history ∪ batch) restricted to
    pairs that involve the batch — equivalence-tested.

    Scale shape: the batch's banded signatures are computed once and
    persisted (id + P longs per band — tiny); the history probe shuffles
    ONLY the batch side (the lake's bucketing satisfies the join's
    distribution), so incremental cost is O(batch), not O(corpus).

    ``n_salts > 1`` is the skew hatch for a hot ``band_key`` (band keys
    follow data skew — a boilerplate-heavy corpus concentrates history
    rows on few keys, and every probe of such a key lands on one
    reducer).  The history probe becomes a standard salted join: history
    rows get a deterministic salt ``pmod(xxhash64(id), S)``, the (small)
    batch side replicates S ways, and the key grows to (band_key, salt)
    — trading the lake's bucketed zero-Exchange co-location for an S-way
    split of hot keys, which is the right trade exactly when a key is
    hot.  The in-batch self-join uses triangular salting (blocks
    (i ≤ j), pair normalized after the join — see
    ``similarity.embedding_near_dup_pairs``).  Output is bit-equal to
    the unsalted path (equivalence-tested).
    """
    spark = new_df.sparkSession
    from pyspark import StorageLevel

    fresh = banded_signatures(
        new_df, id_col, text_col, num_perm, bands, shingle_k, hash_fn
    ).persist(StorageLevel.MEMORY_AND_DISK)

    agree = sum(
        (F.col("sig_a")[p] == F.col("sig_b")[p]).cast("int")
        for p in range(num_perm)
    )
    est = (agree / F.lit(num_perm)).alias("est_jaccard")

    lake = spark.table(lake_table)
    a_new = fresh.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band_key"
    )
    b_hist = lake.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band_key"
    )
    if n_salts > 1:
        S = int(n_salts)
        hist_salted = b_hist.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("id_b")), S).cast("int")
        )
        batch_rep = a_new.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
        )
        hist_joined = batch_rep.join(hist_salted, on=["band_key", "_salt"])
    else:
        hist_joined = a_new.join(b_hist, on="band_key")
    vs_history = (
        hist_joined.select("id_a", "id_b", est)
        .where(F.col("est_jaccard") >= threshold)
        .distinct()
        .select("id_a", "id_b", "est_jaccard", F.lit("history").alias("side"))
    )
    b_new = fresh.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band_key"
    )
    if n_salts > 1:
        S = int(n_salts)
        ga = F.pmod(F.xxhash64(F.col("id_a")), S).cast("int")
        gb = F.pmod(F.xxhash64(F.col("id_b")), S).cast("int")
        a_tri = a_new.withColumn("_bi", ga).withColumn(
            "_bj", F.explode(F.sequence(F.col("_bi"), F.lit(S - 1)))
        )
        b_tri = b_new.withColumn("_bj", gb).withColumn(
            "_bi", F.explode(F.sequence(F.lit(0), F.col("_bj")))
        )
        # est_jaccard is symmetric in (sig_a, sig_b): normalize the pair
        # after the join; distinct collapses the same-salt double emission
        batch_joined = (
            a_tri.join(b_tri, on=["band_key", "_bi", "_bj"])
            .where(F.col("id_a") != F.col("id_b"))
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
                "sig_a",
                "sig_b",
            )
        )
    else:
        batch_joined = a_new.join(b_new, on="band_key").where(
            F.col("id_a") < F.col("id_b")
        )
    in_batch = (
        batch_joined.select("id_a", "id_b", est)
        .where(F.col("est_jaccard") >= threshold)
        .distinct()
        .select("id_a", "id_b", "est_jaccard", F.lit("batch").alias("side"))
    )
    return vs_history.unionByName(in_batch)


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    sep_pattern: str = r"\n+",
    join_sep: str = "\n",
    min_chars: int = 0,
    hash_fn: str = "md5",
    normalize: bool = False,
) -> DataFrame:
    """CCNet-style paragraph deduplication: split each document at
    NATURAL boundaries (``sep_pattern``, default newlines) and drop every
    non-first corpus-wide occurrence of a duplicated paragraph — the
    boilerplate-removal step (headers, navigation, license blocks) that
    fixed-width ``segment_dedup`` windows blur and ``substring_dedup``
    only catches when the span reaches k tokens.

    Paragraphs shorter than ``min_chars`` are exempt (always kept):
    deduping "Yes." corpus-wide would shred unrelated documents, so short
    interjections are below the boilerplate threshold — same rationale as
    CCNet hashing only substantial paragraphs.

    Canonical occurrence = lowest packed ``(doc, position)`` BIGINT, a
    plain map-side-partial ``min`` (the ``segment_dedup`` discipline);
    keep/drop is decided on a text-free ``(id, pos, digest, ord)``
    projection so the duplicate-heavy digest shuffle never carries text.

    ``normalize=True`` hashes ``normalize_for_dedup`` of each paragraph
    (case/accent/digit/punctuation-folded) so near-boilerplate that
    differs only in dates, ids or casing still collides — the ORIGINAL
    paragraph text is what survives in ``dedup_text``.

    Output: one row per document — ``n_paragraphs``, ``n_kept``,
    ``dedup_text`` (kept paragraphs rejoined with ``join_sep``).
    """
    paras = _fan_out(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_pattern)).alias("pos", "para"),
    ).where(F.length(F.trim(F.col("para"))) > 0)
    packed = F.col(id_col) * _SEGMENT_POS_BOUND + F.col("pos")
    eligible = F.length(F.col("para")) >= min_chars
    hash_key = (
        normalize_for_dedup(F.col("para")) if normalize else F.col("para")
    )
    slim = paras.where(eligible).select(
        id_col,
        "pos",
        _hash64(hash_key, 2, hash_fn).alias("_h"),
        packed.alias("_ord"),
    )
    canon = slim.groupBy("_h").agg(F.min("_ord").alias("_first"))
    dropped = (
        slim.join(canon, on="_h")
        .where(F.col("_ord") != F.col("_first"))
        .select(id_col, "pos", F.lit(False).alias("kept"))
    )
    marked = paras.join(dropped, on=[id_col, "pos"], how="left").select(
        id_col, "pos", "para", F.coalesce(F.col("kept"), F.lit(True)).alias("kept")
    )
    kept_paras = F.array_sort(
        F.collect_list(F.when(F.col("kept"), F.struct("pos", "para")))
    )
    agg = marked.groupBy(id_col).agg(
        F.count("*").alias("n_paragraphs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(kept_paras, lambda s: s["para"]), join_sep
        ).alias("dedup_text"),
    )
    # documents with no non-empty paragraph (empty/whitespace text) fall
    # out of the explode — rejoin so every input row has an output row
    return df.select(F.col(id_col)).join(agg, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_paragraphs"), F.lit(0)).alias("n_paragraphs"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce(F.col("dedup_text"), F.lit("")).alias("dedup_text"),
    )


# --------------------------------------------------- dedup normalization

#: basic-latin accent folding table (translate is O(1) per char; full ICU
#: normalization would need a UDF — this covers the high-frequency
#: European accents the CCNet recipe folds)
_ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuyyaaaaaaceeeeiiiinooooouuuuy"


def normalize_for_dedup(
    col: Column,
    lower: bool = True,
    strip_accents: bool = True,
    collapse_digits: bool = True,
    strip_punct: bool = True,
) -> Column:
    """CCNet-style text normalization applied BEFORE hashing for dedup:
    lowercase, fold accents, map every digit to ``0`` (dates/ids differ,
    boilerplate doesn't), strip punctuation, collapse whitespace.  Two
    paragraphs that differ only in case/accents/numbers/punctuation then
    hash identically, so near-boilerplate is caught by EXACT hashing —
    the cheap precision/recall lever before reaching for MinHash.

    Pure narrow column expression (translate + regexp), composable with
    ``paragraph_dedup(normalize=True)`` / ``exact_dedup_stats`` /
    ``segment_dedup`` inputs; the ORIGINAL text is what survives — only
    the duplicate-detection key is normalized.
    """
    c = col
    if lower:
        c = F.lower(c)
    if strip_accents:
        c = F.translate(c, _ACCENT_SRC, _ACCENT_DST)
    if collapse_digits:
        c = F.regexp_replace(c, r"[0-9]", "0")
    if strip_punct:
        # punctuation becomes a SPACE (then collapses) so hyphenated /
        # slashed words don't fuse into new tokens
        c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    return F.regexp_replace(F.trim(c), r"\s+", " ")


def neardup_eval(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_perm: int = 8,
    bands: int = 4,
    shingle_k: int = 8,
    hash_fn: str = "md5",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Precision/recall audit of the MinHash-LSH near-dup path against
    EXACT shingle Jaccard — the calibration step before trusting a
    banding configuration at corpus scale (bands/rows trade recall for
    candidate volume; this measures the trade on real data).

    Three relations over the same corpus: ``truth`` = exact-Jaccard
    pairs ≥ ``threshold`` (inverted-index join — every pair sharing ANY
    shingle, a strict superset of what LSH can surface, so recall is
    measured against full ground truth); ``candidates`` = banded LSH
    pairs; ``predicted`` = candidates whose signature-agreement estimate
    clears ``threshold``.  ONE summary row: counts (exact ints),
    ``candidate_recall`` (how much truth the bands surface),
    ``precision``/``recall`` of the refined predictor (NULL when a
    denominator is empty, via ``try_divide``).

    100 TB shape: the candidates/predicted legs are LSH-bounded, but the
    TRUTH inverted index is quadratic in shingle co-occurrence — a
    common 8-gram shared by D documents contributes D² pairs (measured:
    10× documents → 11.6× wall at bench scale with no cap).  Two
    standard controls, USE THEM at scale: (1) calibrate on a
    deterministic content-hash SAMPLE of documents (pass a pre-filtered
    ``df`` — precision/recall are ratio estimates, a few thousand docs
    give tight confidence); (2) ``max_shingle_df`` drops shingles shared
    by more than that many documents from the truth index (the classic
    DF cap; biases truth against pairs whose ONLY shared shingles are
    boilerplate — acceptable for calibration, documented here).  The
    confusion counts are one full-outer join of the bounded pair tables
    into a single-row aggregate; the signature table is computed once
    and persisted across the candidate and predicted legs.
    """
    from pyspark import StorageLevel

    # round-11: the signature pipeline (multiset minima) and the truth
    # index (distinct shingles) both start from the SAME k-shingle
    # explode of the same corpus — share one raw shingle relation
    # (values unchanged: min over a multiset equals min over the set,
    # and the truth side distincts below).  The relation is NOT
    # persisted: it is the corpus-occurrence-sized MULTISET — the wrong
    # side of the narrow-relation caching rule, exactly the shape
    # ``corpus_overlap`` refuses to cache — and a cold-methodology A/B
    # measured the string-heavy materialization costing ~1 s at sf0.1
    # against two cheap pipelined re-explodes (9.96 → 8.4-8.9 s across
    # the persist-attribution sweep).  The DISTINCT relation (inside
    # ``ngram_jaccard_pairs``) and the signature/candidate tables below
    # stay cached: each is consumed twice-plus by genuinely expensive
    # consumers (the inverted-index self-join, the band join).
    raw_sh = _shingles_inline(df, id_col, text_col, shingle_k, distinct=False)
    sigs = _signatures_from_shingles(
        raw_sh, id_col, num_perm, hash_fn
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # round-11 optimization: cand feeds BOTH the predicted leg and the
    # confusion full-outer join — persist it so the banded self-join
    # runs once per run, not twice (narrow id-pair rows)
    cand = lsh_candidate_pairs(sigs, id_col, num_perm, bands).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sa = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"minhash_{p}").alias(f"_a{p}") for p in range(num_perm)],
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"minhash_{p}").alias(f"_b{p}") for p in range(num_perm)],
    )
    agree = sum(
        (F.col(f"_a{p}") == F.col(f"_b{p}")).cast("int")
        for p in range(num_perm)
    )
    pred = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .where((agree / F.lit(num_perm)) >= threshold)
        .select("id_a", "id_b")
    )
    truth = ngram_jaccard_pairs(
        df,
        id_col,
        text_col,
        k=shingle_k,
        threshold=threshold,
        max_shingle_df=max_shingle_df,
        raw_shingles=raw_sh,
    ).select("id_a", "id_b")
    u = (
        truth.withColumn("in_t", F.lit(1))
        .join(cand.withColumn("in_c", F.lit(1)), ["id_a", "id_b"], "full_outer")
        .join(pred.withColumn("in_p", F.lit(1)), ["id_a", "id_b"], "full_outer")
        .na.fill({"in_t": 0, "in_c": 0, "in_p": 0})
    )
    zero = F.lit(0).cast("long")
    # coalesce: sum over an EMPTY pair relation is NULL, but "no pairs at
    # all" must read as zero counts, not null ones
    agg = u.agg(
        F.coalesce(F.sum("in_t"), zero).alias("n_truth"),
        F.coalesce(F.sum("in_c"), zero).alias("n_candidates"),
        F.coalesce(F.sum("in_p"), zero).alias("n_predicted"),
        F.coalesce(F.sum(F.col("in_t") * F.col("in_c")), zero).alias(
            "candidate_hits"
        ),
        F.coalesce(F.sum(F.col("in_t") * F.col("in_p")), zero).alias(
            "predicted_hits"
        ),
    )
    return agg.select(
        "n_truth",
        "n_candidates",
        "n_predicted",
        "candidate_hits",
        "predicted_hits",
        F.try_divide("candidate_hits", "n_truth").alias("candidate_recall"),
        F.try_divide("predicted_hits", "n_predicted").alias("precision"),
        F.try_divide("predicted_hits", "n_truth").alias("recall"),
    )


def lsh_tuning(
    num_perm: int,
    threshold: float,
    candidate_bands: list[int] | None = None,
) -> dict:
    """Pick the band count for a MinHash-LSH config, driver-side: for
    each divisor ``b`` of ``num_perm`` (rows per band r = num_perm/b),
    the S-curve collision probability is ``P(s) = 1 − (1 − s^r)^b``; the
    chosen ``b`` minimizes the sum of false-negative mass above
    ``threshold`` and false-positive mass below it (the standard
    datasketch criterion, integrated numerically).

    Returns ``{"bands", "rows_per_band", "fn_weight", "fp_weight",
    "curve": [(s, P(s)), ...]}`` — feed ``bands`` to
    ``minhash_near_duplicates`` / ``write_signature_lake`` and verify
    the choice empirically with ``neardup_eval``.  Pure arithmetic, no
    Spark job.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    bs = candidate_bands or [
        b for b in range(1, num_perm + 1) if num_perm % b == 0
    ]
    steps = 1000
    best = None
    for b in bs:
        r = num_perm // b
        fn = fp = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s**r) ** b
            if s >= threshold:
                fn += (1.0 - p) / steps
            else:
                fp += p / steps
        score = fn + fp
        if best is None or score < best[0]:
            best = (score, b, r, fn, fp)
    _, b, r, fn, fp = best
    curve = [
        (round(s / 20, 3), round(1.0 - (1.0 - (s / 20) ** r) ** b, 6))
        for s in range(21)
    ]
    return {
        "bands": b,
        "rows_per_band": r,
        "fn_weight": round(fn, 6),
        "fp_weight": round(fp, 6),
        "curve": curve,
    }


# ----------------------------------------------- exact dedup vs history


def content_digest(cols: list[str]) -> Column:
    """md5 digest of the key columns (\\x1f-joined) — the at-rest exact
    dedup key (same construction as ``exact_dedup_stats``)."""
    return F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols]))


def write_digest_lake(
    df: DataFrame,
    path: str,
    cols: list[str],
    mode: str = "append",
    ndv: int = 1_000_000,
) -> None:
    """Append the batch's distinct content digests to the exact-dedup
    history lake — a digest-only table with a parquet BLOOM FILTER on
    the digest column (``scale.write_with_bloom``), so point probes skip
    row groups without reading pages."""
    from buildkite_logs_parquet_spark.operators.scale import write_with_bloom

    write_with_bloom(
        df.select(content_digest(cols).alias("digest")).distinct(),
        path,
        ["digest"],
        ndv=ndv,
        mode=mode,
    )


def exact_dedup_against_lake(
    batch: DataFrame,
    lake_path: str,
    cols: list[str],
    max_probe_inlist: int = 10_000,
) -> DataFrame:
    """Drop batch rows whose content digest already exists in the history
    lake — exact cross-history dedup for batch ingestion (the batch twin
    of ``streaming.follow.stream_append_dedup_against_lake``).

    Two probe strategies by batch size, both leaving the LAKE unshuffled:

    * small batch (≤ ``max_probe_inlist`` distinct digests): collect the
      digest list to the driver and scan the lake with ``digest IN
      (...)`` — the predicate pushes into the parquet scan where the
      ``write_digest_lake`` bloom filters + dictionary pages skip nearly
      every row group; the (tiny) hit set comes back and the batch is
      filtered with a broadcast anti-join.  History IO is O(matching row
      groups), not O(lake).
    * large batch: plain ``left_anti`` join against the lake's digest
      column (digest-keyed shuffle of batch + lake digests — the
      classic shape).

    New digests are NOT written back here — call ``write_digest_lake``
    with the survivors after downstream filters accept them.
    """
    spark = batch.sparkSession
    d = content_digest(cols).alias("_digest")
    withd = batch.withColumn("_digest", d)
    try:
        lake_raw = spark.read.parquet(lake_path)
    except AnalysisException as e:
        # ONLY the missing-lake case passes the batch through; any other
        # read failure (corrupt files, transient storage errors, a lake
        # missing the digest column) must surface — silently skipping
        # dedup would poison the corpus
        cond = (
            e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
        )
        if (cond or "") != "PATH_NOT_FOUND":
            raise
        return batch
    # outside the try: a schema problem (no `digest` column — wrong table?)
    # raises instead of being swallowed as "no lake yet"
    lake = lake_raw.select("digest")
    n = withd.select("_digest").distinct().count()
    if n <= max_probe_inlist:
        probe = [r["_digest"] for r in withd.select("_digest").distinct().collect()]
        hits = lake.where(F.col("digest").isin(probe)).distinct()
        out = withd.join(
            F.broadcast(hits),
            withd["_digest"] == hits["digest"],
            "left_anti",
        )
    else:
        out = withd.join(
            lake, withd["_digest"] == lake["digest"], "left_anti"
        )
    return out.drop("_digest")


# --------------------------------------------------- split leakage audit


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs that CROSS a train/val/test boundary — the
    eval-leakage audit every split must pass before a benchmark number
    is trusted (a test doc near-duplicating a train doc inflates eval).

    Runs the standard MinHash-LSH near-dup pipeline over the WHOLE
    corpus (banded equi-join, never all-pairs), joins each side's split
    assignment (an id→split projection — narrow), and keeps pairs whose
    splits differ.  Returns (id_a, split_a, id_b, split_b, est_jaccard);
    roll up with ``split_leakage_summary`` for the gate number.  Fix
    leaks by MOVING whole near-dup clusters (graph.dedup_clusters) into
    one split, not by dropping single offenders — pairs are symptoms,
    clusters are the unit.
    """
    pairs = minhash_near_duplicates(
        df,
        id_col,
        text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        hash_fn=hash_fn,
    )
    sp = df.select(F.col(id_col), F.col(split_col))
    sa = sp.select(
        F.col(id_col).alias("id_a"), F.col(split_col).alias("split_a")
    )
    sb = sp.select(
        F.col(id_col).alias("id_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "split_a", "id_b", "split_b", "est_jaccard")
    )


def split_leakage_summary(leaks: DataFrame) -> DataFrame:
    """Count leaking pairs per ordered split boundary (split_a < split_b
    canonicalized so train↔test and test↔train collapse)."""
    lo = F.least(F.col("split_a"), F.col("split_b"))
    hi = F.greatest(F.col("split_a"), F.col("split_b"))
    return (
        leaks.groupBy(lo.alias("split_lo"), hi.alias("split_hi"))
        .agg(F.count("*").alias("n_pairs"))
    )


def _cdc_spans(id_col: str, id_type: str, window: int, divisor: int,
               min_len: int, max_len: int):
    """mapInPandas generator + schema for content-defined chunk spans:
    a chunk boundary falls after token ``i`` when the Buzhash of the
    ``window`` tokens ending at ``i`` is ``0 (mod divisor)`` — subject
    to ``min_len``/``max_len`` (a forced cut at ``max_len`` bounds the
    worst case; candidates inside ``min_len`` are skipped).  Span
    digests are two independent position-sensitive 64-bit folds over
    the token hashes (the window-hash prefix trick evaluates ANY span
    in O(1)), so the dedup key never carries text; the pair is
    collision-safe to ~2^64 segments, far past any real corpus.
    """
    import numpy as np
    import pandas as pd

    mask = np.uint64(63)
    full = np.uint64(64)
    mult2 = np.uint64(0x9E3779B97F4A7C15)  # odd -> bijective remix

    def _rotl(x, s):
        s = s & mask
        return np.where(s == 0, x, (x << s) | (x >> (full - s)))

    def _prefix(h):
        m = np.arange(h.shape[0], dtype=np.uint64)
        g = _rotl(h, (full - (m & mask)) & mask)
        G = np.zeros(h.shape[0] + 1, dtype=np.uint64)
        G[1:] = np.bitwise_xor.accumulate(g)
        return G

    def _span_hash(G, start, length):
        win = G[start + length] ^ G[start]
        return _rotl(win, np.uint64((length - 1) + start) & mask)

    def gen(batches):
        for pdf in batches:
            out_id, out_seg, out_start, out_len, out_h1, out_h2 = (
                [], [], [], [], [], [],
            )
            for did, th in zip(pdf[id_col], pdf["_th"]):
                h = np.asarray(th, dtype=np.int64).view(np.uint64)
                nn = h.shape[0]
                if nn == 0:
                    continue
                # boundary candidates: window-hash % divisor == 0, at
                # token index (window-1)..(nn-1); short docs have none
                cuts = []
                if nn >= window:
                    m = np.arange(nn, dtype=np.uint64)
                    g = _rotl(h, (full - (m & mask)) & mask)
                    G0 = np.zeros(nn + 1, dtype=np.uint64)
                    G0[1:] = np.bitwise_xor.accumulate(g)
                    win = G0[window:] ^ G0[: nn + 1 - window]
                    i = np.arange(nn - window + 1, dtype=np.uint64)
                    wh = _rotl(win, np.uint64(window - 1) + i)
                    # candidate END positions (inclusive token index)
                    cand = np.nonzero(wh % np.uint64(divisor) == 0)[0] + (
                        window - 1
                    )
                    cuts = cand.tolist()
                # min/max walk over sparse candidates + forced cuts
                bounds = []
                start = 0
                ci = 0
                while start < nn:
                    end = min(start + max_len, nn)  # exclusive forced end
                    while ci < len(cuts) and cuts[ci] < start + min_len - 1:
                        ci += 1
                    if ci < len(cuts) and cuts[ci] < end - 1:
                        end = cuts[ci] + 1
                        ci += 1
                    bounds.append((start, end - start))
                    start = end
                G1 = _prefix(h)
                G2 = _prefix(h * mult2)
                for si, (s0, ln) in enumerate(bounds):
                    out_id.append(did)
                    out_seg.append(si)
                    out_start.append(s0)
                    out_len.append(ln)
                    out_h1.append(np.int64(_span_hash(G1, s0, ln)))
                    out_h2.append(np.int64(_span_hash(G2, s0, ln)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out_id),
                    "pos": pd.Series(out_start, dtype="int32"),
                    "seg_idx": pd.Series(out_seg, dtype="int32"),
                    "seg_len": pd.Series(out_len, dtype="int32"),
                    "_h1": pd.Series(out_h1, dtype="int64"),
                    "_h2": pd.Series(out_h2, dtype="int64"),
                }
            )

    schema = (
        f"{id_col} {id_type}, pos int, seg_idx int, seg_len int, "
        "_h1 long, _h2 long"
    )
    return gen, schema


def cdc_segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 4,
    divisor: int = 16,
    min_len: int = 4,
    max_len: int = 64,
) -> DataFrame:
    """Segment dedup over CONTENT-DEFINED chunks (the rsync/LBFS cut
    rule applied to token streams): boundaries fall where a small
    rolling Buzhash window hits ``0 (mod divisor)``, so an insertion or
    deletion only perturbs the chunks that overlap the edit — the
    chunking re-synchronizes at the next content-defined cut.  Fixed
    ``k``-chunk ``segment_dedup`` loses EVERY chunk after a one-token
    shift; this variant loses only the edited one (asserted in tests).

    Same keep-first discipline and skew story as ``segment_dedup``:
    canonical = min packed ``(doc, seg_idx)``; the canonical groupBy and
    membership join move only (id, positions, two 64-bit span digests)
    — never text (digests are position-sensitive folds of the JVM-side
    ``xxhash64`` token hashes; the Arrow stage ships long arrays only).
    Text moves through exactly two exchanges: the span join keyed by id
    for the rebuild slice, and the per-document rebuild groupBy.

    Output: one row per document — ``n_segments``, ``n_kept``,
    ``dedup_text`` (kept chunks rejoined in order).  Documents with no
    tokens have no chunks and emit NO row (join back on id if the
    pipeline must keep them).
    """
    if not (1 <= min_len <= max_len):
        raise ValueError("need 1 <= min_len <= max_len")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = _fan_out(df).select(
        F.col(id_col),
        F.filter(words, lambda w: w != "").alias("_toks"),
    ).where(F.size("_toks") > 0)
    hashed = base.select(
        F.col(id_col),
        F.transform(F.col("_toks"), lambda t: F.xxhash64(t)).alias("_th"),
    )
    gen, schema = _cdc_spans(
        id_col,
        df.schema[id_col].dataType.simpleString(),
        window,
        divisor,
        min_len,
        max_len,
    )
    spans = hashed.mapInPandas(gen, schema=schema)
    packed = F.col(id_col) * _SEGMENT_POS_BOUND + F.col("seg_idx")
    slim = spans.select(
        id_col, "seg_idx", "_h1", "_h2", packed.alias("_ord")
    )
    canon = slim.groupBy("_h1", "_h2").agg(F.min("_ord").alias("_first"))
    kept = slim.join(canon, on=["_h1", "_h2"]).select(
        id_col, "seg_idx", (F.col("_ord") == F.col("_first")).alias("kept")
    )
    marked = (
        spans.select(id_col, "seg_idx", "pos", "seg_len")
        .join(kept, on=[id_col, "seg_idx"])
        .join(base, on=id_col)
    )
    seg_text = F.array_join(
        F.slice(F.col("_toks"), F.col("pos") + 1, F.col("seg_len")), " "
    )
    with_text = marked.select(
        id_col,
        "seg_idx",
        "kept",
        F.when(F.col("kept"), seg_text).alias("_seg"),
    )
    kept_segs = F.array_sort(
        F.collect_list(
            F.when(F.col("kept"), F.struct("seg_idx", "_seg"))
        )
    )
    return with_text.groupBy(id_col).agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(kept_segs, lambda s: s["_seg"]), " "
        ).alias("dedup_text"),
    )


def dedup_keep_best(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    quality_col: str = "quality",
) -> DataFrame:
    """Quality-aware near-dup survivor selection over a PARTIAL cluster
    map: keep the HIGHEST-quality member of every cluster instead of
    ``dedup_clusters``'s min-id canonical (RefinedWeb/FineWeb-class
    recipes: near-dup groups keep the cleanest member, not the
    first-crawled), with ids absent from ``clusters`` kept as singleton
    clusters of themselves.

    Thin composition over ``graph.cluster_representatives`` (the
    per-cluster argmax aggregate — 9-dp score grid, min-id ties,
    NULL-score hardening all live THERE, one implementation): this
    wrapper only splits clustered from unclustered rows.  The split is
    load-bearing for correctness, not just convenience: a
    ``coalesce(cluster, id)`` singleton fallback would COLLIDE when
    cluster labels are not drawn from the doc-id namespace (an
    unclustered doc whose id equals a cluster label would join that
    cluster and could steal its canonical slot); unclustered rows here
    never enter the aggregate at all.

    Returns ``(id, cluster, quality, is_canonical)``; exactly one
    canonical row per cluster plus every singleton.
    """
    from buildkite_logs_parquet_spark.operators.graph import (
        cluster_representatives,
    )

    cl = clusters.select(F.col(id_col), F.col(cluster_col))
    clustered = docs.select(F.col(id_col), F.col(quality_col)).join(
        cl, on=id_col, how="inner"
    )
    flagged = cluster_representatives(
        clustered, id_col=id_col, cluster_col=cluster_col,
        score_col=quality_col,
    ).withColumnRenamed("is_representative", "is_canonical")
    singletons = (
        docs.select(F.col(id_col), F.col(quality_col))
        .join(cl.select(id_col), on=id_col, how="left_anti")
        .select(
            F.col(id_col),
            F.col(id_col).alias(cluster_col),
            F.col(quality_col),
            F.lit(True).alias("is_canonical"),
        )
    )
    return flagged.select(
        id_col, cluster_col, quality_col, "is_canonical"
    ).unionByName(singletons)


def set_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    tokenizer: str = "words",
    shingle_k: int = 8,
    persist: bool = True,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering (the
    SSJoin/PPJoin family — Chaudhuri et al. 2006, Xiao et al. 2008):
    every pair with ``jaccard >= threshold`` is returned, with NO
    candidate generator to tune and NO DF cap changing the metric —
    the principled exact-at-scale alternative to
    ``ngram_jaccard_pairs``'s capped inverted index.

    The prefix-filter theorem: order each document's token set by a
    GLOBAL total order (ascending document frequency, ties by token —
    rarest first) and keep only its first
    ``p = s − ceil(t·s) + 1`` tokens; two sets with Jaccard ≥ t MUST
    share at least one prefix token.  The candidate join therefore runs
    on the PREFIX inverted index — stopword-class tokens (the quadratic
    mass that forces ``max_shingle_df`` caps) sort to the END of every
    ordering and rarely enter any prefix, so hot-token D² blowup is
    filtered by construction instead of by cutting the metric.  The
    size filter ``t·|A| ≤ |B|`` rides the same join (Jaccard ≥ t bounds
    the size ratio).

    Verification is exact and candidate-bounded: candidates join each
    side's token relation once, intersections count per pair, and the
    threshold decides on INTEGERS (``inter·10^6 ≥ t6·union``) so the
    kept set cannot flip on a float ulp (rule 4).

    Plan: tokens (narrow explode + distinct) → DF counts (one agg) →
    per-doc rank window (one id-keyed shuffle) → prefix equi-join →
    two candidate-bounded joins + one pair agg.  No cross join, no cap.

    ``persist`` (round-11 optimization): the distinct token relation
    feeds FIVE consumers (sizes, document frequencies, the rank window,
    and both verification sides) and the candidate relation two (the
    intersection count and the final decision) — Catalyst plans each
    consumer as an independent subtree (no ReusedExchange fires across
    the differing projections), so without a persist the tokenize +
    distinct shuffle executes five times per run (measured: 28 parquet
    scans / 58 Exchanges in the registered key's plan).  Both relations
    are id+token/id-pair narrow longs — orders of magnitude smaller
    than the text they derive from — so MEMORY_AND_DISK is safe at any
    scale where the join itself is feasible.  The operator does not
    unpersist (the returned plan reads the cached blocks lazily);
    callers own cache hygiene (`spark.catalog.clearCache()` or
    ``DataFrame.unpersist`` after materializing), same contract as
    ``minhash_near_duplicates(persist_signatures=True)``.

    Output: ``(id_a, id_b, intersection, union_size, jaccard)`` with
    ``id_a < id_b``.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from pyspark import StorageLevel
    from pyspark.sql import Window as W

    if tokenizer == "words":
        toks = df.select(
            F.col(id_col),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("tok"),
        ).where(F.col("tok") != "")
    elif tokenizer == "shingles":
        toks = _shingles_inline(df, id_col, text_col, shingle_k).select(
            F.col(id_col), F.col("shingle").alias("tok")
        )
    else:
        raise ValueError("tokenizer must be words | shingles")
    toks = toks.distinct()
    if persist:
        toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("_s"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("_df"))
    # global total order (df asc, tok asc) → per-doc prefix of length
    # s − ceil(t·s) + 1; t as an exact rational t6/10^6 keeps ceil in
    # integer arithmetic: ceil(t·s) = (t6·s + 999999) div 10^6
    t6 = int(round(threshold * 1_000_000))
    ranked = (
        toks.join(dfreq, "tok")
        .join(sizes, id_col)
        .withColumn(
            "_r",
            F.row_number().over(
                W.partitionBy(id_col).orderBy("_df", "tok")
            ),
        )
        .withColumn(
            "_p",
            F.col("_s")
            - F.expr(f"({t6} * _s + 999999) div 1000000").cast("int")
            + F.lit(1),
        )
    )
    prefix = ranked.where(F.col("_r") <= F.col("_p")).select(
        id_col, "tok", "_s"
    )
    pa = prefix.select(
        F.col(id_col).alias("id_a"), "tok", F.col("_s").alias("_sa")
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"), "tok", F.col("_s").alias("_sb")
    )
    cand = (
        pa.join(pb, "tok")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # size filter: jaccard >= t ⇒ t·max ≤ min (integer form)
            & (
                F.lit(t6) * F.greatest("_sa", "_sb")
                <= F.lit(1_000_000) * F.least("_sa", "_sb")
            )
        )
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    if persist:
        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    ta = toks.select(F.col(id_col).alias("id_a"), "tok")
    tb = toks.select(F.col(id_col).alias("id_b"), "tok")
    inter = (
        cand.select("id_a", "id_b")
        .join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("intersection"))
    )
    out = (
        cand.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"intersection": 0})
        .withColumn(
            "union_size",
            F.col("_sa") + F.col("_sb") - F.col("intersection"),
        )
        # integer threshold decision: inter·10^6 ≥ t6·union (rule 4)
        .where(
            F.col("intersection") * 1_000_000
            >= F.lit(t6) * F.col("union_size")
        )
        .select(
            "id_a",
            "id_b",
            "intersection",
            "union_size",
            F.round(
                F.col("intersection") / F.col("union_size"), 6
            ).alias("jaccard"),
        )
    )
    return out


# --------------------------------------------------- corpus-level overlap


def corpus_hashed_shingles(
    df: DataFrame,
    group_col: str,
    text_col: str,
    shingle_k: int = 12,
    hash_fn: str = "md5",
) -> DataFrame:
    """The possibly-multiset ``(group, shingle-hash)`` relation both
    corpus-overlap paths start from — exposed (round-11) so a caller
    running the exact matrix AND the MinHash estimator over the same
    corpora can persist ONE text explode + hash pass and hand it to
    both (the exact path distincts it; the estimator takes minima, and
    min over a multiset equals min over the set)."""
    return _shingles_inline(
        df, group_col, text_col, shingle_k, distinct=False
    ).select(F.col(group_col), _hash64(F.col("shingle"), 0, hash_fn).alias("_h"))


def corpus_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    shingle_k: int = 12,
    hash_fn: str = "md5",
    hashed: DataFrame | None = None,
    hashed_is_distinct: bool = False,
    persist: bool = True,
) -> DataFrame:
    """EXACT pairwise corpus overlap matrix: for every pair of corpora
    (``group_col`` values, e.g. sources or dataset versions), the
    distinct-shingle intersection, both set sizes, and integer
    parts-per-million Jaccard + directed containments.

    The question every training-data merge asks — "how much of corpus B
    is already in corpus A?" — answered at the corpus level rather than
    the document level (``split_leakage`` / ``benchmark_contamination``
    cover the per-document direction).

    Determinism: shingles are rule-3 md5 60-bit hashes; every output is
    a BIGINT (counts, and ratios as ``·10⁶ div`` integers), so the
    matrix is oracle-gated bit-exactly (DETERMINISM.md rules 3/15).

    100 TB shape: ONE distinct over (group, shingle-hash) — text never
    shuffles, only 8-byte hashes — then a self-equi-join keyed on the
    hash whose per-key fan-out is bounded by the number of CORPORA
    sharing the shingle (≤ G, the group count — a handful), never by
    document frequency; the pair aggregate's cardinality is ≤ G².  For
    corpora too large even for the hash-distinct, use
    :func:`corpus_overlap_minhash`.

    Output: ``(group_a, group_b)`` with ``group_a < group_b``, plus
    ``intersection, size_a, size_b, union_size, jaccard_pm,
    containment_a_pm, containment_b_pm`` (containment_a = share of A's
    shingles also in B).  Pairs with an empty intersection are omitted
    (their estimate is 0; emitting G² zero rows would be noise).
    """
    if hashed is None:
        hashed = corpus_hashed_shingles(
            df, group_col, text_col, shingle_k, hash_fn
        )
    sh = hashed if hashed_is_distinct else hashed.distinct()
    if persist:
        # round-11: the distinct relation feeds THREE consumers (sizes
        # and both self-join sides) — narrow (group, 8-byte hash) rows;
        # callers own cache hygiene after materializing
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy(group_col).agg(F.count("*").alias("_n"))
    a = sh.select(F.col(group_col).alias("group_a"), "_h")
    b = sh.select(F.col(group_col).alias("group_b"), "_h")
    inter = (
        a.join(b, on="_h")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.select(F.col(group_col).alias("group_a"), F.col("_n").alias("size_a"))
    sb = sizes.select(F.col(group_col).alias("group_b"), F.col("_n").alias("size_b"))
    return (
        inter.join(F.broadcast(sa), "group_a")
        .join(F.broadcast(sb), "group_b")
        .select(
            "group_a",
            "group_b",
            F.col("intersection").cast("long").alias("intersection"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            (F.col("size_a") + F.col("size_b") - F.col("intersection"))
            .cast("long")
            .alias("union_size"),
            F.expr(
                "intersection * 1000000L div (size_a + size_b - intersection)"
            ).alias("jaccard_pm"),
            F.expr("intersection * 1000000L div size_a").alias("containment_a_pm"),
            F.expr("intersection * 1000000L div size_b").alias("containment_b_pm"),
        )
    )


def corpus_overlap_minhash(
    df: DataFrame,
    group_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 12,
    hash_fn: str = "md5",
    hashed: DataFrame | None = None,
) -> DataFrame:
    """MinHash ESTIMATE of the pairwise corpus Jaccard matrix — the
    scale path when even the distinct (group, hash) relation of
    :func:`corpus_overlap` is too heavy: per-corpus state collapses to
    ``num_perm`` longs regardless of corpus size.

    One groupBy computes all P permutation minima per corpus (the
    :func:`minhash_signatures` single-shuffle trick, keyed on the group
    instead of the document); the pair space is then reached through a
    long-form self-equi-join on ``(permutation, min_value)`` — counting
    AGREEING minima per pair — so no cross join exists even in the
    estimator (pairs with zero agreements simply estimate 0 and are
    omitted, exactly like the exact operator omits empty
    intersections).

    Output: ``(group_a, group_b, n_agree, n_perm, jaccard_est_pm)``
    with ``jaccard_est_pm = n_agree·10⁶ div num_perm`` (exact integers
    over the seeded estimate — rule 8: the approximation itself is
    reproducible).
    """
    sig = corpus_signatures(
        df, group_col, text_col, num_perm, shingle_k, hash_fn, hashed=hashed
    )
    return signature_overlap_matrix(sig, group_col)


def containment_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    tokenizer: str = "words",
    shingle_k: int = 8,
    persist: bool = True,
) -> DataFrame:
    """EXACT containment-threshold join: every pair ``(a ∈ left,
    b ∈ right)`` with ``|A∩B| ≥ t·|A|`` — "a's token set is mostly
    inside b's" — the asymmetric complement to
    :func:`set_similarity_join`'s symmetric Jaccard.  This is the
    quote/excerpt/superset detector: a 50-token quote inside a 5000-token
    page has Jaccard ≈ 0.01 (invisible to any Jaccard threshold) but
    containment 1.0.

    Prefix filter, containment form: ``A∩B`` covers at least ``⌈t·|A|⌉``
    of A's tokens, so among ANY ``|A| − ⌈t·|A|⌉ + 1`` of A's tokens at
    least one lies in B — the probe side keeps only that prefix under a
    global (df asc, token) order (rarest-first, so stopword-mass never
    enters a prefix), while the index side must stay FULL (containment
    puts no upper bound on ``|B|``; the only size filter is
    ``|B| ≥ t·|A|``).  The candidate join is therefore
    probe-prefix × index-token — bounded by the prefix tokens' document
    frequencies, not by the quadratic full-token co-occurrence.

    All decisions are integers (``inter·10⁶ ≥ t6·|A|``, rule 4); output
    ``(id_a, id_b, intersection, size_a, size_b, containment_pm)`` with
    ``containment_pm = inter·10⁶ div |A|``.  Passing the same relation
    as both sides yields the trivial ``a == b`` self-pairs too — filter
    ``id_a != id_b`` downstream for self-join use.

    Citation note (reference parity): the reference engine has no join
    surface at all; this extends the SSJoin tier (Chaudhuri et al. 2006
    prefix filtering, asymmetric variant).

    ``persist`` (round-11 optimization): the probe-side token relation
    feeds four consumers (sizes, the shared df order, the rank window,
    the verification side) and the index-side relation four more —
    Catalyst plans each as an independent subtree (no ReusedExchange
    across the differing projections), so the tokenize + distinct
    shuffles executed ~8× per run (28 parquet scans / 48 Exchanges in
    the registered key's plan).  Tokens and candidates are narrow
    id/token rows; the operator does not unpersist (callers own cache
    hygiene after materializing) — the ``set_similarity_join``
    contract.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from pyspark import StorageLevel
    from pyspark.sql import Window as W

    def toks_of(df: DataFrame) -> DataFrame:
        if tokenizer == "words":
            out = df.select(
                F.col(id_col),
                F.explode(
                    F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                ).alias("tok"),
            ).where(F.col("tok") != "")
        elif tokenizer == "shingles":
            out = _shingles_inline(df, id_col, text_col, shingle_k).select(
                F.col(id_col), F.col("shingle").alias("tok")
            )
        else:
            raise ValueError("tokenizer must be words | shingles")
        return out.distinct()

    tl = toks_of(left)
    # self-join callers pass the same relation twice — share one token
    # tree (and one cached copy) instead of building two identical ones
    tr = tl if right is left else toks_of(right)
    if persist:
        tl = tl.persist(StorageLevel.MEMORY_AND_DISK)
        tr = tl if right is left else tr.persist(StorageLevel.MEMORY_AND_DISK)
    sl = tl.groupBy(id_col).agg(F.count("*").alias("_sa"))
    sr = tr.groupBy(id_col).agg(F.count("*").alias("_sb"))
    # ONE global token order across both relations (df asc, tok asc):
    # any fixed order is correct; rarest-first keeps prefixes selective
    dfreq = (
        tl.select("tok")
        .unionByName(tr.select("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("_df"))
    )
    t6 = int(round(threshold * 1_000_000))
    ranked = (
        tl.join(dfreq, "tok")
        .join(sl, id_col)
        .withColumn(
            "_r",
            F.row_number().over(W.partitionBy(id_col).orderBy("_df", "tok")),
        )
        .withColumn(
            "_p",
            F.col("_sa")
            - F.expr(f"({t6} * _sa + 999999) div 1000000").cast("int")
            + F.lit(1),
        )
    )
    prefix = ranked.where(F.col("_r") <= F.col("_p")).select(
        F.col(id_col).alias("id_a"), "tok", "_sa"
    )
    idx = tr.select(F.col(id_col).alias("id_b"), "tok")
    cand = (
        prefix.join(idx, "tok")
        .select("id_a", "id_b", "_sa")
        .distinct()
        .join(
            sr.select(F.col(id_col).alias("id_b"), "_sb"), "id_b"
        )
        # size filter: |A∩B| ≤ |B| and ≥ t·|A| ⇒ 10⁶·|B| ≥ t6·|A|
        .where(F.lit(1_000_000) * F.col("_sb") >= F.lit(t6) * F.col("_sa"))
    )
    if persist:
        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    ta = tl.select(F.col(id_col).alias("id_a"), "tok")
    tb = tr.select(F.col(id_col).alias("id_b"), "tok")
    inter = (
        cand.select("id_a", "id_b")
        .join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("intersection"))
    )
    return (
        cand.join(inter, ["id_a", "id_b"])
        .where(
            F.col("intersection") * 1_000_000 >= F.lit(t6) * F.col("_sa")
        )
        .select(
            "id_a",
            "id_b",
            F.col("intersection").cast("long").alias("intersection"),
            F.col("_sa").cast("long").alias("size_a"),
            F.col("_sb").cast("long").alias("size_b"),
            F.expr("intersection * 1000000L div _sa").alias("containment_pm"),
        )
    )


def corpus_signatures(
    df: DataFrame,
    group_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 12,
    hash_fn: str = "md5",
    hashed: DataFrame | None = None,
) -> DataFrame:
    """Per-corpus MinHash signature relation ``(group, m0..m{P-1})`` —
    the state :func:`corpus_overlap_minhash` derives internally, exposed
    so it can be PERSISTED and maintained incrementally: a MinHash
    signature is a vector of minima, and ``min`` is mergeable, so
    yesterday's lake plus today's batch signatures combine by
    element-wise min without touching yesterday's text
    (:func:`merge_corpus_signatures`)."""
    sh = (
        corpus_hashed_shingles(df, group_col, text_col, shingle_k, hash_fn)
        if hashed is None
        else hashed
    )
    aggs = [
        F.min(_perm_hash(F.col("_h"), p)).alias(f"m{p}")
        for p in range(num_perm)
    ]
    return sh.groupBy(group_col).agg(*aggs)


def merge_corpus_signatures(
    existing: DataFrame, batch: DataFrame, group_col: str
) -> DataFrame:
    """Element-wise min-merge of two corpus-signature relations (the
    incremental-maintenance step: signatures of (lake ∪ batch) without
    re-reading the lake's text).  Groups present on one side only pass
    through unchanged."""
    perm_cols = [c for c in existing.columns if c != group_col]
    if set(batch.columns) != set(existing.columns):
        raise ValueError(
            "signature schemas differ: "
            f"{sorted(existing.columns)} vs {sorted(batch.columns)}"
        )
    return (
        existing.unionByName(batch)
        .groupBy(group_col)
        .agg(*[F.min(c).alias(c) for c in perm_cols])
    )


def signature_overlap_matrix(sig: DataFrame, group_col: str) -> DataFrame:
    """Pairwise Jaccard estimates from a persisted signature relation —
    :func:`corpus_overlap_minhash`'s pair stage over an arbitrary
    (possibly incrementally-merged) signature input.  Output matches the
    estimator: ``(group_a, group_b, n_agree, n_perm, jaccard_est_pm)``.
    """
    perm_cols = [c for c in sig.columns if c != group_col]
    num_perm = len(perm_cols)
    long_form = sig.select(
        F.col(group_col).alias("_g"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(p).alias("p"), F.col(c).alias("v"))
                    for p, c in enumerate(perm_cols)
                ]
            )
        ).alias("_pv"),
    ).select("_g", F.col("_pv.p").alias("_p"), F.col("_pv.v").alias("_v"))
    a = long_form.select(F.col("_g").alias("group_a"), "_p", "_v")
    b = long_form.select(F.col("_g").alias("group_b"), "_p", "_v")
    return (
        a.join(b, on=["_p", "_v"])
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("n_agree"))
        .select(
            "group_a",
            "group_b",
            F.col("n_agree").cast("long").alias("n_agree"),
            F.lit(int(num_perm)).cast("long").alias("n_perm"),
            F.expr(f"n_agree * 1000000L div {int(num_perm)}").alias(
                "jaccard_est_pm"
            ),
        )
    )
