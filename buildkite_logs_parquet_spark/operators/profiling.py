"""Corpus/table profiling with mergeable sketches.

One pass, one global aggregate: every statistic here is backed by a
partial-aggregable sketch (HyperLogLog++ for distinct counts, Greenwald-
Khanna/KLL-style quantile summaries for percentiles), so the profile of a
100 TB table is map-side partials merged into ONE reduce row — no sort, no
per-column jobs, no driver-side data.  This is the audit step a training-
data pipeline runs before/after every transformation (row counts, null
rates, cardinalities, value ranges) without paying for exactness it does
not need; the approximation error is bounded (`rsd` for HLL, `accuracy`
for quantiles) and tested against exact answers in
tests/test_profiling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
    quantile_accuracy: int = 10_000,
    exact: bool = False,
) -> DataFrame:
    """One-row-per-column profile: rows, nulls, approx distinct, and (for
    numeric columns) min / max / approx p50 / p95.

    ``rsd`` is the HyperLogLog++ relative standard deviation;
    ``quantile_accuracy`` trades quantile-summary size for error
    (err ≈ 1/accuracy of the rank).  Everything lands in ONE aggregate —
    profiling N columns costs one scan regardless of N.

    ``exact=True`` swaps the sketches for exact ``count_distinct`` /
    sort-based ``percentile`` — same plan shape, same output schema, so
    the correctness gate can drive the full plumbing through a DuckDB
    oracle while production keeps the mergeable-sketch cost model
    (exact multi-column distinct EXPANDs the scan per distinct column —
    fine at audit scale, not at 100 TB).
    """
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in columns:
        if c not in by_name:
            raise ValueError(f"no such column: {c}")
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__non_null"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact
                else F.approx_count_distinct(col, rsd)
            ).alias(f"{c}__approx_distinct")
        )
        if isinstance(by_name[c], NumericType):
            aggs.append(F.min(col).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(col).cast("double").alias(f"{c}__max"))
            p50 = (
                F.percentile(col, F.lit(0.5))
                if exact
                else F.percentile_approx(col, 0.5, quantile_accuracy)
            )
            p95 = (
                F.percentile(col, F.lit(0.95))
                if exact
                else F.percentile_approx(col, 0.95, quantile_accuracy)
            )
            aggs.append(p50.cast("double").alias(f"{c}__p50"))
            aggs.append(p95.cast("double").alias(f"{c}__p95"))
    wide = df.agg(F.count("*").alias("__rows"), *aggs)

    # unpivot the single wide row into one tidy row per column — the wide
    # row is driver-tiny, but keep it distributed (a 1-row narrow map)
    per_col = []
    for c in columns:
        numeric = isinstance(by_name[c], NumericType)
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__rows").alias("n_rows"),
                (F.col("__rows") - F.col(f"{c}__non_null")).alias("n_nulls"),
                F.col(f"{c}__approx_distinct").alias("approx_distinct"),
                (F.col(f"{c}__min") if numeric else F.lit(None).cast("double")).alias("min"),
                (F.col(f"{c}__max") if numeric else F.lit(None).cast("double")).alias("max"),
                (F.col(f"{c}__p50") if numeric else F.lit(None).cast("double")).alias("approx_p50"),
                (F.col(f"{c}__p95") if numeric else F.lit(None).cast("double")).alias("approx_p95"),
            )
        )
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
