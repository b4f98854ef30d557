"""Scale utilities: bucketed co-located joins and skew-salted operations.

These are the knobs the 100 TB deployment turns that small-scale code never
needs; each is exercised by a plan-asserting test so the claimed shuffle
behavior is verified, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table.

    Two tables bucketed the same way join WITHOUT a shuffle — the classic
    co-location strategy for repeated fact-fact joins (e.g. lineitem ⋈
    orders on the order key, or entries ⋈ entries self-joins on row ranges).
    Bucket count should match the target parallelism at full scale.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salt_column(
    key: Column, n_salts: int, payload: Column | None = None
) -> Column:
    """Per-row salt spreading a hot key across ``n_salts`` reducers.

    A useful salt must differ BETWEEN rows of the same key, so it cannot be
    a function of the key alone.  With ``payload`` (any row-content column
    that varies within a key) the salt is a pure content hash: values are
    reproducible run-to-run.  Without it the salt mixes in
    ``monotonically_increasing_id`` — no RNG and the *plan* is
    deterministic, but the values depend on partition layout and row
    arrival order, so they are arbitrary-but-valid rather than
    reproducible.  Either way aggregate/join RESULTS are exact: the salt
    only routes rows; phase-2 merges / build-side replication erase it.
    """
    mixer = payload if payload is not None else F.monotonically_increasing_id()
    return F.pmod(F.xxhash64(key, mixer), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (key, salt) — the hot key's rows split across
    ``n_salts`` partial groups; phase 2 merges partials per key.  ``aggs``
    maps output name → (column, kind) with kind in {"sum", "count", "min",
    "max"} (the re-aggregatable kinds; avg = sum/count downstream).
    """
    salt = salt_column(F.concat_ws("\x1f", *key_cols), n_salts)
    phase1_aggs = []
    for name, (col, kind) in aggs.items():
        if kind == "count":
            phase1_aggs.append(F.count(col).alias(f"_p_{name}"))
        elif kind == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{name}"))
        elif kind == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{name}"))
        elif kind == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{name}"))
        else:
            raise ValueError(f"non-reaggregatable kind: {kind}")
    partial = df.groupBy(*key_cols, salt.alias("_salt")).agg(*phase1_aggs)
    merge = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    phase2 = [
        merge[kind](F.col(f"_p_{name}")).alias(name)
        for name, (_, kind) in aggs.items()
    ]
    return partial.groupBy(*key_cols).agg(*phase2)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: the skewed side gets a deterministic salt,
    the (smaller) build side is replicated ``n_salts`` times with every salt
    value, and the join key becomes (key, salt) — a hot key's rows land on
    ``n_salts`` different reducers instead of one straggler.

    Spark's AQE skew-join handles most cases at runtime; this is the
    explicit variant for engines/pipelines where AQE is off (e.g. stateful
    streaming) or where the skew is known up front.
    """
    salted_left = skewed.withColumn(
        "_salt", salt_column(F.col(key), n_salts)
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    replicated = small.withColumn("_salt", salts)
    out = salted_left.join(replicated, on=[key, "_salt"])
    return out.drop("_salt")


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    sort_col: str | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` roughly equal files.

    Streaming ingest (stream_to_lake, per-batch appends) accretes
    many small files; at 100 TB the scan's task-scheduling and footer
    overhead is dominated by file COUNT, not bytes — periodic compaction
    is the standard lake-maintenance pass.  The file census is a
    driver-side metadata listing (no data read); the rewrite is one job.

    With ``sort_col`` the rewrite range-partitions and sorts by that
    column, so every output file covers a disjoint value range and
    row-group min/max stats prune scans filtered on it (the poor-man's
    clustering / Z-order for one dimension).

    For a Hive-partitioned source, pass its partition columns as
    ``partition_by`` — the rewrite keeps the directory layout (write
    tasks are co-partitioned with the layout so each task writes into
    one directory); omitting it would flatten the partition columns into
    plain data columns and lose the pruning layout.

    Returns the number of files written (total across partitions when
    ``partition_by`` is set — sized by the global byte census).
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += f.getLen()
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src)
    if partition_by:
        out = df.repartition(n_files, *[F.col(c) for c in partition_by])
        if sort_col is not None:
            out = out.sortWithinPartitions(*partition_by, sort_col)
        out.write.mode(mode).partitionBy(*partition_by).parquet(dst)
    else:
        if sort_col is not None:
            out = df.repartitionByRange(
                n_files, F.col(sort_col)
            ).sortWithinPartitions(sort_col)
        else:
            out = df.repartition(n_files)
        out.write.mode(mode).parquet(dst)
    return n_files


def zorder_key(
    bucket_cols: list[Column], bits: int = 8
) -> Column:
    """Interleave the low ``bits`` of each (integer bucket) column into a
    Z-order (Morton) key: sorting by it clusters rows that are close in
    EVERY dimension, so per-file min/max spans shrink on all of them at
    once — multi-dimensional data skipping from plain row-group stats.
    """
    z = F.lit(0).cast("long")
    n = len(bucket_cols)
    for bit in range(bits):
        for j, c in enumerate(bucket_cols):
            z = z + F.shiftleft(
                F.shiftright(c.cast("long"), bit).bitwiseAND(F.lit(1)),
                bit * n + j,
            ).cast("long")
    return z


def write_zordered(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` Z-ordered by ``cols`` (numeric): each column is
    mapped to a ``2^bits``-bucket equal-width grid (one metadata-sized
    min/max job), the Morton interleave of the grid cells is the sort
    key, and the output is range-partitioned + sorted by it.

    A filter on ANY of ``cols`` then prunes at the row-group/file level:
    unlike a single-column sort (first column fully clustered, the rest
    fully scattered), every Z-ordered file covers a small hyper-rectangle
    of the key space — the one-file-per-region layout lakehouse OPTIMIZE
    ZORDER produces, built from plain DataFrame ops.
    """
    stats = df.agg(
        *[F.min(c).alias(f"_mn_{c}") for c in cols],
        *[F.max(c).alias(f"_mx_{c}") for c in cols],
    ).first()
    n_buckets = 1 << bits
    buckets = []
    for c in cols:
        lo = float(stats[f"_mn_{c}"])
        hi = float(stats[f"_mx_{c}"])
        span = (hi - lo) or 1.0
        b = F.floor(
            (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n_buckets
        )
        buckets.append(F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)))
    zkey = zorder_key(buckets, bits)
    (
        df.withColumn("_zkey", zkey)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int = 100_000,
    mode: str = "overwrite",
    sort_col: str | None = None,
) -> None:
    """Write parquet with per-column BLOOM FILTERS for the given columns
    (``parquet.bloom.filter.enabled#col`` writer options).

    Min/max row-group stats prune RANGE predicates but are useless for
    point lookups on high-cardinality unsorted columns (every row group
    spans most of the value domain); a bloom filter answers "is this key
    possibly in this row group" in O(1) footer-metadata space, so
    ``key = 'x'`` / ``key IN (...)`` scans skip row groups without
    reading data pages.  At 100 TB this is the difference between a
    point lookup touching kilobytes of footers vs terabytes of pages —
    the standard lake pattern for digest/id probe columns (dedup keys,
    URL hashes, document ids).

    ``ndv`` sizes the filter (expected distinct values per row group —
    Parquet derives bits from it; oversizing wastes footer bytes,
    undersizing raises the false-positive rate).  With ``sort_col`` the
    write also range-partitions+sorts so min/max stats stay useful for
    that column alongside the bloom columns.

    Note Spark's vectorized reader applies bloom row-group filtering at
    scan time transparently; nothing special is needed on the read path.
    """
    w = df
    if sort_col is not None:
        w = df.repartitionByRange(F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    writer = w.write.mode(mode)
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        writer = writer.option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(int(ndv))
        )
    writer.parquet(path)


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    n_partitions: int | None = None,
) -> DataFrame:
    """Shuffle-skew diagnosis for a join/aggregation key: the report a
    100 TB operator consults BEFORE picking between a plain shuffle,
    :func:`salted_aggregate`, or an AQE skew-join hint.

    Output is union-tagged (one oracle-friendly relation, all BIGINT /
    strings — DETERMINISM rules 6/14a/15):

    - ``'top'`` rows — the ``top_k`` heaviest keys (rank by count desc,
      key ascending as the rule-6 tie-break), with the key RENDERED as a
      string by the caller-visible cast (keys are grouped on their native
      type; only the report column is a string);
    - one ``'summary'`` row — ``v1..v4`` = total rows, distinct keys,
      max per-key count, max key share in ppm (``max·10⁶ div total``),
      and ``v5`` = the suggested salt factor for ``n_partitions``-way
      parallelism: ``ceil(max_count · P / total)`` — how many ways the
      hottest key must split so its share of one partition's ideal load
      drops to ~1 (1 = no salting needed).

    One groupBy over the key (map-side combined), then metadata-sized
    aggregates — the report never shuffles more than the distinct-key
    relation.
    """
    from pyspark.sql import Window as W

    if n_partitions is None:
        n_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count("*").alias("_c")
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps
    # + driver merge, never a single-task global sort of the key
    # relation); the rank window then runs over ≤ top_k rows
    top = (
        counts.orderBy(F.col("_c").desc(), F.col("_k").asc())
        .limit(int(top_k))
        .withColumn(
            "_r",
            F.row_number().over(
                W.orderBy(F.col("_c").desc(), F.col("_k").asc())
            ),
        )
        .select(
            F.lit("top").alias("side"),
            F.col("_r").cast("long").alias("rank"),
            F.col("_k").cast("string").alias("key"),
            F.col("_c").cast("long").alias("v1"),
            *[F.lit(None).cast("long").alias(c) for c in ("v2", "v3", "v4", "v5")],
        )
    )
    summary = counts.agg(
        F.sum("_c").cast("long").alias("_total"),
        F.count("*").cast("long").alias("_keys"),
        F.max("_c").cast("long").alias("_max"),
    ).select(
        F.lit("summary").alias("side"),
        F.lit(None).cast("long").alias("rank"),
        F.lit("<all>").alias("key"),
        F.col("_total").alias("v1"),
        F.col("_keys").alias("v2"),
        F.col("_max").alias("v3"),
        F.expr("_max * 1000000L div _total").alias("v4"),
        F.expr(f"(_max * {int(n_partitions)}L + _total - 1L) div _total").alias(
            "v5"
        ),
    )
    return top.unionByName(summary)
