"""Bitext (parallel-corpus) candidate mining: find cross-language document
pairs that are likely translations of each other — the STRAND / ParaCrawl
recipe for harvesting machine-translation and multilingual training data
from a web crawl.

Spark-first shapes:

* ``bitext_url_key`` — a language-agnostic URL key (language markers
  stripped from host and path), pure regexp chain, lookaround-free so the
  same pattern runs on RE2 engines;
* ``bitext_url_candidates`` — equi-join documents on the stripped key,
  different languages only, with a document-length-ratio sanity filter
  (the Gale–Church prior: translations have similar lengths) and a
  per-key fan-out cap so a boilerplate key (`/index.html` across a
  million sites) cannot go quadratic — the ``max_shingle_df`` discipline
  from ``dedup``;
* ``align_segments_by_position`` — within a candidate pair, align
  segments positionally (i-th with i-th) plus a per-segment length-ratio
  gate: the cheap high-precision first pass that feeds a real aligner.

100 TB shape: one shuffle on ``url_key`` for the join (AQE handles
residual skew; the hot-key cap bounds the worst case BEFORE the join by
dropping keys whose fan-out exceeds the cap — counted on the slim
(key, lang) projection, never the text).  The length filter is a
post-join predicate on two int columns.  No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# default marker set: the languages a crawl pipeline typically plants in
# URL paths/subdomains; call sites mining other language pairs pass their
# own.  Two-letter codes only — longer forms (en-us) collapse via the
# two-letter prefix match being applied AFTER lowercasing.
DEFAULT_LANGS = ("en", "de", "fr", "es", "it", "pt", "ru", "zh", "ja", "ko")


def bitext_url_key(
    url: Column,
    langs: tuple[str, ...] = DEFAULT_LANGS,
) -> Column:
    """Language-agnostic URL key: lowercase, drop the scheme, strip a
    language-code FIRST path segment (``/en/a/b`` → ``/a/b``), a
    language-code LAST segment (``/a/en`` → ``/a``), and a language
    subdomain (``en.site.com`` → ``site.com``).

    Anchored, lookaround-free regexps (RE2-safe — the ``canonical_url``
    discipline, text_analysis.py): two URLs that differ only in language
    marker map to one key, which is exactly the STRAND "URL matching"
    heuristic.  Pure expression — runs inside the scan's codegen stage.
    """
    alt = "|".join(langs)
    u = F.lower(url)
    u = F.regexp_replace(u, r"^https?://", "")
    # language subdomain: en.site.com -> site.com
    u = F.regexp_replace(u, rf"^({alt})\.", "")
    # first path segment: host/en/rest -> host/rest  (anchored via the
    # host part having no '/'), and a bare trailing /en
    u = F.regexp_replace(u, rf"^([^/]*)/({alt})/", r"$1/")
    u = F.regexp_replace(u, rf"/({alt})$", "")
    return u


def bitext_url_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    lang_col: str = "lang",
    len_col: str = "n_chars",
    langs: tuple[str, ...] = DEFAULT_LANGS,
    max_len_ratio: float = 2.0,
    max_docs_per_key: int = 16,
) -> DataFrame:
    """Cross-language translation-pair candidates by URL correspondence.

    Output: one row per candidate pair ``(url_key, id_a, id_b, lang_a,
    lang_b, len_a, len_b)`` with ``lang_a < lang_b`` (each unordered pair
    once, deterministic orientation) and
    ``max(len)/min(len) <= max_len_ratio``.

    Keys whose document fan-out exceeds ``max_docs_per_key`` are dropped
    BEFORE the self-join (hot-key cap): the key-count aggregate runs on
    the slim (key) projection, the surviving-key filter is a broadcast of
    nothing — just a post-aggregation predicate — and only then does the
    pair join shuffle.  Worst-case pair count per key is therefore
    ``cap²``, never ``fanout²``.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lang"),
        F.col(len_col).cast("long").alias("len"),
        bitext_url_key(F.col(url_col), langs).alias("url_key"),
    )
    # hot-key cap on the slim projection; count once, filter, re-join is
    # avoided by a window-free two-step: aggregate -> inner join on the
    # (small) surviving key set is the general shape, but since the keyed
    # relation is already slim we use a windowless groupBy + join that
    # AQE will broadcast when the key table is small
    key_counts = keyed.groupBy("url_key").agg(F.count("*").alias("_n"))
    ok_keys = key_counts.where(F.col("_n") <= max_docs_per_key).select("url_key")
    bounded = keyed.join(ok_keys, "url_key")

    a = bounded.select(
        "url_key",
        F.col("id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("len").alias("len_a"),
    )
    b = bounded.select(
        "url_key",
        F.col("id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("len").alias("len_b"),
    )
    pairs = a.join(b, "url_key").where(F.col("lang_a") < F.col("lang_b"))
    ratio_ok = (
        F.greatest("len_a", "len_b")
        <= F.least("len_a", "len_b") * F.lit(float(max_len_ratio))
    ) & (F.least("len_a", "len_b") > 0)
    return pairs.where(ratio_ok).select(
        "url_key", "id_a", "id_b", "lang_a", "lang_b", "len_a", "len_b"
    )


def align_segments_by_position(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    max_len_ratio: float = 2.0,
) -> DataFrame:
    """Positional segment alignment inside candidate document pairs:
    split both sides on ``sep`` (paragraphs by default), pair the i-th
    segment of A with the i-th of B, keep pairs passing the per-segment
    length-ratio gate.  The cheap 1-1 diagonal prior — high precision on
    page-template sites where paragraph structure survives translation;
    a real DP aligner consumes these as anchors.

    Shape: two equi-joins of the (id, idx, segment) explode against the
    pair list — the explode is narrow, the joins shuffle on (pair, idx)
    keys.  Output: (id_a, id_b, seg_idx, seg_a, seg_b).
    """
    segs = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("seg_idx", "seg"),
    ).where(F.length(F.trim("seg")) > 0)
    sa = segs.select(
        F.col("id").alias("id_a"),
        "seg_idx",
        F.col("seg").alias("seg_a"),
    )
    sb = segs.select(
        F.col("id").alias("id_b"),
        "seg_idx",
        F.col("seg").alias("seg_b"),
    )
    joined = (
        pairs.select("id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, ["id_b", "seg_idx"])
    )
    la, lb = F.length("seg_a"), F.length("seg_b")
    ratio_ok = (F.greatest(la, lb) <= F.least(la, lb) * F.lit(float(max_len_ratio))) & (
        F.least(la, lb) > 0
    )
    return joined.where(ratio_ok).select(
        "id_a", "id_b", "seg_idx", "seg_a", "seg_b"
    )


def _gale_church_cost(la: int, lb: int) -> float:
    """Per-bead length cost from Gale & Church (1993), the published
    constants: translated segment lengths relate by ratio c = 1 with
    per-character variance s2 = 6.8; delta = (lb − la·c)/sqrt(la·s2)
    is ~normal, and the cost is −log P(|delta|) via the standard-normal
    tail (their Appendix's pnorm approximation — public formula)."""
    import math

    if la == 0 and lb == 0:
        return 0.0
    mean = (la + lb / 1.0) / 2.0
    if mean <= 0:
        return 25.0
    delta = (lb - la) / math.sqrt(6.8 * mean)
    z = abs(delta)
    # Gale & Church's pnorm: Abramowitz-Stegun 26.2.17 polynomial
    t = 1.0 / (1.0 + 0.2316419 * z)
    pd = 1.0 - 0.3989423 * math.exp(-z * z / 2.0) * (
        ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
          - 0.356563782) * t + 0.319381530) * t
    )
    p = 2.0 * (1.0 - pd)
    return -math.log(max(p, 1e-300))


#: bead types and their -log prior from the paper's alignment counts
_GC_BEADS = [
    (1, 1, 0.0),            # substitution, prior 0.89 — baseline
    (1, 0, 4.0),            # deletion
    (0, 1, 4.0),            # insertion
    (2, 1, 2.3),            # contraction
    (1, 2, 2.3),            # expansion
    (2, 2, 5.8),            # merge
]


def gale_church_align_py(
    sents_a: list[str], sents_b: list[str]
) -> list[tuple[tuple[int, ...], tuple[int, ...]]]:
    """Sequential Gale–Church DP over one sentence-split pair (the
    public 1993 algorithm): returns beads as (indices into a, indices
    into b).  O(n·m) per pair — pairs are single documents, so the DP
    is executor-local and bounded; the distributed operator maps this
    over candidate pairs."""
    la = [len(s) for s in sents_a]
    lb = [len(s) for s in sents_b]
    n, m = len(la), len(lb)
    INF = float("inf")
    dist = [[INF] * (m + 1) for _ in range(n + 1)]
    back: list[list[tuple[int, int] | None]] = [
        [None] * (m + 1) for _ in range(n + 1)
    ]
    dist[0][0] = 0.0
    for i in range(n + 1):
        for j in range(m + 1):
            d = dist[i][j]
            if d == INF:
                continue
            for da, db, prior in _GC_BEADS:
                ii, jj = i + da, j + db
                if ii > n or jj > m:
                    continue
                cost = d + prior + _gale_church_cost(
                    sum(la[i:ii]), sum(lb[j:jj])
                )
                if cost < dist[ii][jj]:
                    dist[ii][jj] = cost
                    back[ii][jj] = (da, db)
    if back[n][m] is None and (n, m) != (0, 0):
        return []
    beads = []
    i, j = n, m
    while (i, j) != (0, 0):
        da, db = back[i][j]
        beads.append((tuple(range(i - da, i)), tuple(range(j - db, j))))
        i, j = i - da, j - db
    return list(reversed(beads))


def gale_church_align(
    pairs: DataFrame,
    text_a_col: str = "text_a",
    text_b_col: str = "text_b",
    id_cols: list[str] | None = None,
    max_sentences: int = 512,
) -> DataFrame:
    """Sentence-align candidate document pairs (the step after
    ``bitext_url_candidates``): regexp sentence split, then the
    Gale–Church DP per pair inside an Arrow-batched ``mapInPandas`` —
    the honest Pandas-UDF case (a per-pair dynamic program is
    word-sequential by nature; rule: Python only where SQL genuinely
    can't).  Pairs longer than ``max_sentences`` on either side are
    SKIPPED with ``aligned = false`` rather than running an unbounded
    O(n·m) DP on a degenerate page (the hostile-input discipline).

    Output: one row per bead — ``(*, bead_idx, src_text, tgt_text,
    n_src, n_tgt, aligned)`` with id columns carried through."""
    import re as _re

    ids = list(id_cols or [])

    def _split(t: str) -> list[str]:
        parts = _re.split(r"(?<=[.!?。！？])\s+", (t or "").strip())
        return [p for p in parts if p]

    def run(batches):
        import pandas as pd

        cols = [*ids, "bead_idx", "src_text", "tgt_text", "n_src",
                "n_tgt", "aligned"]
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                sa, sb = _split(row[text_a_col]), _split(row[text_b_col])
                base = {c: row[c] for c in ids}
                if len(sa) > max_sentences or len(sb) > max_sentences:
                    out.append(
                        {**base, "bead_idx": -1, "src_text": None,
                         "tgt_text": None, "n_src": len(sa),
                         "n_tgt": len(sb), "aligned": False}
                    )
                    continue
                for k, (ia, ib) in enumerate(gale_church_align_py(sa, sb)):
                    out.append(
                        {
                            **base,
                            "bead_idx": k,
                            "src_text": " ".join(sa[i] for i in ia),
                            "tgt_text": " ".join(sb[j] for j in ib),
                            "n_src": len(ia),
                            "n_tgt": len(ib),
                            "aligned": True,
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    id_schema = ", ".join(
        f"{c} {dict(pairs.dtypes)[c]}" for c in ids
    )
    schema = (
        (id_schema + ", " if id_schema else "")
        + "bead_idx int, src_text string, tgt_text string,"
        " n_src int, n_tgt int, aligned boolean"
    )
    return pairs.select(*ids, text_a_col, text_b_col).mapInPandas(run, schema)


def margin_knn_mine(
    left: DataFrame,
    right: DataFrame,
    centroids: list[list[float]],
    k: int = 4,
    n_probe: int = 2,
    margin_threshold: float = 1.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    mutual_best: bool = True,
) -> DataFrame:
    """Margin-based parallel-document mining over EMBEDDINGS — the
    LASER/CCMatrix criterion (Artetxe & Schwenk 2019, "Margin-based
    Parallel Corpus Mining with Multilingual Sentence Embeddings"):
    raw cosine is miscalibrated across languages (some documents are
    "hubs" near everything), so a pair (x, y) scores by its cosine
    RELATIVE to each side's own neighborhood density::

        margin(x, y) = cos(x, y) / ((mean_kNN(x) + mean_kNN(y)) / 2)

    — the paper's `ratio` variant, > 1 iff the pair is closer than
    either side's typical neighbor.  This is the published recipe behind
    CCMatrix/ParaCrawl-scale bitext harvesting and complements
    ``bitext_url_candidates``: URL keys find page-level pairs where site
    structure cooperates; margin-kNN finds them from content alone.

    Plan (composed entirely from the existing ANN machinery — no new
    join shapes): forward and backward cell-pruned batch k-NN
    (``similarity.ivf_topk_join``: one cell equi-join + one rank window
    each), two k-row-bounded per-id mean aggregates, one union of the
    directed candidate edges (deduped), one margin projection, and for
    ``mutual_best`` two more rank windows over surviving edges only.

    100 TB shape: candidate generation is IVF cell-pruned (scale's
    recall lever is more cells/probes, never more comparisons);
    neighborhood means aggregate k rows per id; every shuffle is keyed
    by id or cell, bounded by (|left| + |right|)·k candidate edges —
    no all-pairs stage exists.

    Output: ``(id_left, id_right, cosine, margin)``, margin rounded to
    ``round_to``; mutual-best ties break on the partner id (a rule-6
    total order).
    """
    from buildkite_logs_parquet_spark.operators.similarity import (
        ivf_topk_join,
    )

    if k < 1:
        raise ValueError("k must be >= 1")
    lv = left.select(
        F.col(id_col).alias("id_left"), F.col(vec_col).alias("_lv")
    )
    rv = right.select(
        F.col(id_col).alias("id_right"), F.col(vec_col).alias("_rv")
    )
    fwd = ivf_topk_join(
        lv, rv, centroids, k=k, n_probe=n_probe,
        query_id_col="id_left", query_vec_col="_lv",
        id_col="id_right", vec_col="_rv", round_to=round_to,
    ).select("id_left", "id_right", "cosine")
    bwd = ivf_topk_join(
        rv, lv, centroids, k=k, n_probe=n_probe,
        query_id_col="id_right", query_vec_col="_rv",
        id_col="id_left", vec_col="_lv", round_to=round_to,
    ).select("id_left", "id_right", "cosine")
    # round-11: each direction's kNN edge list feeds TWO consumers (its
    # side's neighborhood mean AND the candidate union) — without a
    # persist Catalyst re-executes the cell join + rank window per
    # consumer.  The edge lists are k-bounded (id, id, cosine) rows —
    # tiny relative to the corpus.  Callers own cache hygiene after
    # materializing (the set_similarity_join contract).
    from pyspark import StorageLevel

    fwd = fwd.persist(StorageLevel.MEMORY_AND_DISK)
    bwd = bwd.persist(StorageLevel.MEMORY_AND_DISK)
    # neighborhood density per side: mean of each id's own top-k cosines
    mean_l = fwd.groupBy("id_left").agg(
        F.round(F.avg("cosine"), round_to).alias("_ml")
    )
    mean_r = bwd.groupBy("id_right").agg(
        F.round(F.avg("cosine"), round_to).alias("_mr")
    )
    cand = fwd.unionByName(bwd).groupBy("id_left", "id_right").agg(
        F.max("cosine").alias("cosine")
    )
    scored = (
        cand.join(mean_l, "id_left")
        .join(mean_r, "id_right")
        .select(
            "id_left",
            "id_right",
            "cosine",
            F.round(
                F.col("cosine") * 2.0 / (F.col("_ml") + F.col("_mr")),
                round_to,
            ).alias("margin"),
        )
        .where(F.col("margin") >= float(margin_threshold))
    )
    if not mutual_best:
        return scored
    wl = Window.partitionBy("id_left").orderBy(
        F.col("margin").desc(), F.col("id_right")
    )
    wr = Window.partitionBy("id_right").orderBy(
        F.col("margin").desc(), F.col("id_left")
    )
    return (
        scored.withColumn("_rl", F.row_number().over(wl))
        .withColumn("_rr", F.row_number().over(wr))
        .where((F.col("_rl") == 1) & (F.col("_rr") == 1))
        .drop("_rl", "_rr")
    )
