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

from pyspark.sql import Column, DataFrame
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
