"""Hybrid retrieval: rank fusion of lexical (BM25) and dense (embedding
k-NN) result lists.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
``RRF(d) = Σ_lists w_l / (k0 + rank_l(d))`` — robust to incomparable
score scales, which is exactly the lexical-vs-cosine situation, and the
standard first fusion baseline in hybrid search engines.

Reference parity note: the reference engine (wolfeidau/
buildkite-logs-parquet) has no retrieval surface — this module is part
of the training-data/RAG extension tier, composing ``text_analysis.
bm25_scores`` with ``similarity.cosine_topk`` / ``ivf_topk_join``.

Determinism discipline (DETERMINISM.md): each list contributes
``round(w/(k0+rank), round_to)`` summed as DECIMAL — order-independent
and engine-exact, so fused scores are oracle-checkable; final ranks tie-
break on the document id.

100 TB shape: inputs are already top-``depth`` ranked lists (bounded —
TakeOrderedAndProject on the BM25 side, per-query rank windows on the
ANN side), so fusion is a union + one groupBy over ≤ |lists|·depth rows
per query: metadata-sized relative to the corpus, shuffled by id key
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    sources: dict[str, DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k0: int = 60,
    weights: dict[str, float] | None = None,
    round_to: int = 9,
) -> DataFrame:
    """Fuse named ranked lists into one RRF-ordered list.

    ``sources`` maps a list name to a DataFrame carrying ``(id_col,
    rank_col)`` with rank 1-based; missing ids simply contribute nothing
    (the RRF convention).  Returns ``(id_col, rrf_score DECIMAL(38,
    round_to), n_lists, rank)`` ordered by score desc with id tie-break.
    """
    weights = weights or {}
    tagged = None
    for name, df in sources.items():
        w = float(weights.get(name, 1.0))
        contrib = F.round(
            F.lit(w) / (F.lit(int(k0)) + F.col(rank_col).cast("double")),
            round_to,
        ).cast(f"decimal(38,{round_to})")
        part = df.select(
            F.col(id_col), contrib.alias("_contrib")
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    if tagged is None:
        raise ValueError("rrf_fuse needs at least one ranked source")
    fused = tagged.groupBy(id_col).agg(
        F.sum("_contrib").alias("rrf_score"),
        F.count("*").alias("n_lists"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    # the fused relation is ≤ Σ depth rows — the single-partition rank
    # window is metadata-sized by construction (inputs are top-k lists)
    return fused.withColumn("rank", F.row_number().over(w))


def with_rank(
    df: DataFrame, order_by: list, id_col: str, rank_col: str = "rank"
) -> DataFrame:
    """1-based dense ranking helper: ``row_number`` over ``order_by`` with
    the id as the final tie-break, for feeding score-sorted top-k results
    into ``rrf_fuse``.

    Single-partition by design — callers pass ALREADY-TRUNCATED top-k
    lists (≤ depth rows), so the global rank window is metadata-sized;
    ranking an unbounded relation belongs in a partitioned window or
    ``packing``'s distributed prefix machinery, not here."""
    w = Window.orderBy(*order_by, F.col(id_col))
    return df.withColumn(rank_col, F.row_number().over(w))


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    depth: int = 100,
    k0: int = 60,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """One-query hybrid retrieval: BM25 top-``depth`` over ``docs`` fused
    with exact cosine top-``depth`` over ``embeddings`` (ids must refer to
    the same documents).  Returns the ``rrf_fuse`` output keyed by
    ``doc_id_col``."""
    from buildkite_logs_parquet_spark.operators.similarity import cosine_topk
    from buildkite_logs_parquet_spark.operators.text_analysis import bm25_scores

    lex = bm25_scores(docs, query_terms, doc_id_col, text_col, top_n=depth)
    lex_ranked = with_rank(
        lex.withColumn("_s", F.col("bm25").cast("decimal(38,9)")),
        [F.col("_s").desc()],
        doc_id_col,
    )
    dense = cosine_topk(
        embeddings, query_vec, k=depth, id_col=vec_id_col, round_to=4
    )
    dense_ranked = with_rank(
        dense.withColumnRenamed(vec_id_col, doc_id_col),
        [F.col("cosine").desc()],
        doc_id_col,
    )
    return rrf_fuse(
        {"bm25": lex_ranked, "dense": dense_ranked},
        id_col=doc_id_col,
        k0=k0,
        weights=weights,
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    round_to: int = 9,
) -> DataFrame:
    """Per-query retrieval quality at cutoff ``k``: hits, recall,
    precision, reciprocal rank (MRR contribution), and binary-relevance
    NDCG — the evaluation half every retrieval stack needs next to the
    search half (BM25 / dense / fused).

    ``results`` carries ranked lists (1-based ``rank_col``; the shape
    ``with_rank``/``rrf_fuse`` emit), ``qrels`` the relevant
    ``(query, doc)`` pairs.  One ranked-side filter to ``rank ≤ k``, one
    broadcast-friendly equi-join onto the qrels, one query-keyed
    aggregate; a metadata-sized second join adds each query's total
    relevant count for the recall denominator.  All per-rank terms are
    rounded then DECIMAL-summed (DETERMINISM.md rule 5), so the metrics
    are engine-exact and oracle-checkable; queries with no relevant
    docs are excluded (their recall is undefined), and queries whose
    relevant docs were never retrieved still appear with zero metrics
    via the qrels-side grouping.

    .. versionchanged:: round 5
       ``recall_at_k`` now means STANDARD recall (``n_hits / n_relevant``,
       denominator the query's full relevant count).  The earlier
       R-capped variant (denominator ``min(n_relevant, k)``) moved to the
       new ``capped_recall_at_k`` column.  External consumers keying on
       ``recall_at_k`` see different values for queries with
       ``n_relevant > k`` — no schema break signals this, so audit any
       downstream thresholds when upgrading.
    """
    import math as _math

    topk = results.where(F.col(rank_col) <= k).select(
        F.col(query_col), F.col(doc_col), F.col(rank_col)
    )
    rel = qrels.select(query_col, doc_col).distinct()
    n_rel = rel.groupBy(query_col).agg(F.count("*").alias("n_relevant"))
    hits = topk.join(rel, [query_col, doc_col])
    # per-hit contributions, rounded then decimal-summed
    rr = F.round(1.0 / F.col(rank_col), round_to).cast("decimal(28,12)")
    dcg = F.round(
        1.0 / F.log2(F.col(rank_col) + F.lit(1.0)), round_to
    ).cast("decimal(28,12)")
    per_q = hits.groupBy(query_col).agg(
        F.count("*").alias("n_hits"),
        F.max(rr).cast("double").alias("reciprocal_rank"),
        F.sum(dcg).cast("double").alias("dcg"),
    )
    # ideal DCG for binary relevance: the first min(k, n_relevant) ranks
    idcg_terms = [round(1.0 / _math.log2(r + 1.0), round_to) for r in range(1, k + 1)]
    idcg_prefix = []
    acc = 0.0
    for t in idcg_terms:
        acc = round(acc + t, round_to)
        idcg_prefix.append(acc)
    idcg = F.element_at(
        F.lit(idcg_prefix), F.least(F.lit(k), F.col("n_relevant")).cast("int")
    )
    out = (
        n_rel.join(per_q, query_col, "left")
        .na.fill({"n_hits": 0, "reciprocal_rank": 0.0, "dcg": 0.0})
        .select(
            query_col,
            "n_relevant",
            "n_hits",
            # standard recall@k divides by the query's TOTAL relevant
            # count; the capped (R-capped) variant divides by min(k, R)
            # so a query with more relevant docs than k can still reach 1
            F.round(
                F.col("n_hits") / F.col("n_relevant"), round_to
            ).alias("recall_at_k"),
            F.round(
                F.col("n_hits") / F.least(F.lit(k), F.col("n_relevant")),
                round_to,
            ).alias("capped_recall_at_k"),
            F.round(F.col("n_hits") / F.lit(float(k)), round_to).alias(
                "precision_at_k"
            ),
            F.col("reciprocal_rank"),
            F.round(F.col("dcg") / idcg, round_to).alias("ndcg_at_k"),
        )
    )
    return out
