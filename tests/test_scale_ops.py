"""Bucketed co-located joins and skew salting — results must equal the
plain operators, and the bucketed join plan must be shuffle-free."""

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.scale import (
    read_table,
    salted_aggregate,
    salted_join,
    write_bucketed_table,
)
from buildkite_logs_parquet_spark.plans.checks import explain_str


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [(0, float(i % 7)) for i in range(9000)] + [
        (k, float(k)) for k in range(1, 1001)
    ]
    return spark.createDataFrame(rows, "k long, v double").cache()


def test_salted_aggregate_equals_plain(spark, skewed):
    salted = salted_aggregate(
        skewed,
        ["k"],
        {"n": ("v", "count"), "total": ("v", "sum"), "mx": ("v", "max")},
        n_salts=8,
    )
    plain = skewed.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 1001)], "k long, name string"
    )
    salted = salted_join(skewed, dim, "k", n_salts=8)
    plain = skewed.join(dim, "k")
    assert salted.count() == plain.count()
    a = sorted(map(tuple, salted.select("k", "v", "name").collect()))
    b = sorted(map(tuple, plain.select("k", "v", "name").collect()))
    assert a == b


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    # warehouse dir is a static conf; rely on DROP TABLE cleanup instead
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed_table(li, "b_lineitem", "l_orderkey", n_buckets=4)
    write_bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=4)

    a = read_table(spark, "b_lineitem")
    b = read_table(spark, "b_orders")
    joined = a.join(b, a.l_orderkey == b.o_orderkey)
    # co-located bucketed join: SortMergeJoin with NO Exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")

def test_compact_parquet_dir_reduces_file_count(spark, tmp_path):
    import glob

    from buildkite_logs_parquet_spark.operators.scale import (
        compact_parquet_dir,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src = str(tmp_path / "frag")
    li.repartition(20).write.parquet(src)  # fragmented lake
    assert len(glob.glob(f"{src}/*.parquet")) == 20

    dst = str(tmp_path / "compact")
    n = compact_parquet_dir(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    assert spark.read.parquet(dst).count() == li.count()


def test_compact_parquet_dir_sorted_ranges(spark, tmp_path):
    import glob

    from buildkite_logs_parquet_spark.operators.scale import (
        compact_parquet_dir,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src = str(tmp_path / "frag2")
    li.repartition(16).write.parquet(src)
    dst = str(tmp_path / "sorted")
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    n = compact_parquet_dir(
        spark, src, dst, target_file_bytes=max(total // 4, 1), sort_col="l_orderkey"
    )
    assert n >= 2
    # disjoint, internally sorted ranges: every file's keys are sorted and
    # file ranges do not overlap
    spans = []
    for f in sorted(glob.glob(f"{dst}/*.parquet")):
        keys = [r["l_orderkey"] for r in spark.read.parquet(f).select("l_orderkey").collect()]
        assert keys == sorted(keys), f
        if keys:
            spans.append((min(keys), max(keys)))
    spans.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo
    assert spark.read.parquet(dst).count() == li.count()


def test_compact_parquet_dir_preserves_partition_layout(spark, tmp_path):
    import glob

    from buildkite_logs_parquet_spark.operators.scale import (
        compact_parquet_dir,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src = str(tmp_path / "p_frag")
    orders.repartition(8).write.partitionBy("o_orderstatus").parquet(src)
    # fragmented: several files per partition directory
    frag_files = glob.glob(f"{src}/o_orderstatus=*/*.parquet")
    assert len(frag_files) > 3

    dst = str(tmp_path / "p_compact")
    compact_parquet_dir(
        spark, src, dst, target_file_bytes=1 << 30,
        partition_by=["o_orderstatus"],
    )
    out_dirs = sorted(
        p.split("=")[-1] for p in glob.glob(f"{dst}/o_orderstatus=*")
    )
    in_dirs = sorted(
        p.split("=")[-1] for p in glob.glob(f"{src}/o_orderstatus=*")
    )
    assert out_dirs == in_dirs  # layout preserved
    for d in glob.glob(f"{dst}/o_orderstatus=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d  # compacted
    back = spark.read.parquet(dst)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)


def test_write_zordered_shrinks_spans_on_both_dims(spark, tmp_path):
    """Z-ordered files cover small hyper-rectangles: versus a layout
    sorted on ONE column, the per-file min/max span of the OTHER column
    must shrink substantially — that span is exactly what row-group
    data skipping prunes on."""
    import glob

    import pyarrow.parquet as pq

    from buildkite_logs_parquet_spark.operators.scale import write_zordered

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )

    single = str(tmp_path / "single_sort")
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(single)
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(spark, li, zpath, ["l_orderkey", "l_partkey"], n_files=8)

    def avg_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            t = pq.read_table(f, columns=[col])[col].to_pylist()
            if t:
                spans.append(max(t) - min(t))
        return sum(spans) / len(spans)

    # value equality first
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(single).count()
        == li.count()
    )
    # the single-sort layout leaves l_partkey fully scattered per file;
    # z-ordering must cut its per-file span while keeping l_orderkey
    # spans far below the full range
    full_part_span = avg_span(single, "l_partkey")
    z_part_span = avg_span(zpath, "l_partkey")
    assert z_part_span < 0.7 * full_part_span, (z_part_span, full_part_span)
    orderkey_range = (
        li.agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("r")
        ).first()["r"]
    )
    assert avg_span(zpath, "l_orderkey") < 0.7 * orderkey_range


def test_write_with_bloom_writes_filters_and_round_trips(spark, tmp_path):
    import glob

    from buildkite_logs_parquet_spark.operators.scale import write_with_bloom

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("digest"),
        (F.col("id") % 7).alias("bucket"),
    )
    path = str(tmp_path / "bloom_lake")
    write_with_bloom(docs, path, ["digest"], ndv=2000)

    # the footer must carry a bloom filter for digest and NOT for the
    # other columns (pyarrow 16 doesn't expose bloom offsets — read the
    # footer through the JVM parquet-mr API)
    files = [
        f
        for f in glob.glob(f"{path}/*.parquet")
        if not f.rsplit("/", 1)[-1].startswith("_")
    ]
    assert files
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    saw_bloom = False
    for f in files:
        hif = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(hif)
        try:
            for block in reader.getFooter().getBlocks():
                for col in block.getColumns():
                    name = col.getPath().toDotString()
                    off = col.getBloomFilterOffset()
                    if name == "digest":
                        assert off >= 0, "digest missing bloom filter"
                        saw_bloom = True
                    else:
                        assert off < 0, name
        finally:
            reader.close()
    assert saw_bloom

    # value equality + point lookup through the spark reader
    back = spark.read.parquet(path)
    assert back.count() == 2000
    probe = docs.where("doc_id = 77").first()["digest"]
    assert back.where(F.col("digest") == probe).count() == 1


def test_skew_report_values_and_rank_order(spark, skewed):
    from buildkite_logs_parquet_spark.operators.scale import skew_report

    out = skew_report(skewed, "k", top_k=3, n_partitions=10).collect()
    top = sorted(
        [r for r in out if r["side"] == "top"], key=lambda r: r["rank"]
    )
    (summary,) = [r for r in out if r["side"] == "summary"]
    # hot key 0 carries 9000 rows; every other key exactly 1
    assert top[0]["key"] == "0" and top[0]["v1"] == 9000
    # rank 2/3 tie on count=1 → rule-6 tie-break ascending on the key's
    # NATIVE type (long: 1 < 2), rendered as string only in the report
    assert [r["key"] for r in top[1:]] == ["1", "2"]
    assert summary["v1"] == 10000          # total rows
    assert summary["v2"] == 1001           # distinct keys
    assert summary["v3"] == 9000           # max per-key count
    assert summary["v4"] == 9000 * 1_000_000 // 10000  # ppm share
    # hot key must split 9 ways for 10-way parallelism: ceil(9000*10/10000)
    assert summary["v5"] == 9

    # uniform data needs no salting
    uni = spark.range(1000).select(F.col("id").alias("k"))
    (s2,) = [
        r
        for r in skew_report(uni, "k", top_k=1, n_partitions=32).collect()
        if r["side"] == "summary"
    ]
    assert s2["v5"] == 1


def test_skew_report_plan_has_no_global_sort_before_limit(spark, skewed):
    from buildkite_logs_parquet_spark.operators.scale import skew_report

    plan = explain_str(skew_report(skewed, "k", top_k=5))
    # top-k must plan as TakeOrderedAndProject, never Sort+GlobalLimit
    assert "TakeOrderedAndProject" in plan
