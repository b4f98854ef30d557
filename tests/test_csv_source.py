"""CSV quarantine source: good/bad split, header drop by value, gz,
round trip."""


def test_good_and_quarantine_split(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.csv_source import (
        read_csv_quarantine,
    )

    p = tmp_path / "d.csv"
    p.write_text(
        "doc_id,n,text\n"
        "1,10,hello\n"
        "2,notanumber,world\n"  # type conflict -> quarantine
        "3,30,ok\n"
        "4,40\n"  # short row: positional format -> quarantine
    )
    good, quar = read_csv_quarantine(
        spark, str(p), "doc_id long, n int, text string"
    )
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 3}
    assert sorted(r["raw"] for r in quar.collect()) == [
        "2,notanumber,world",
        "4,40",
    ]


def test_header_dropped_by_value_any_partition(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.csv_source import (
        read_csv_quarantine,
    )

    # two files, each with its own header — both headers must drop
    for i in range(2):
        (tmp_path / f"part{i}.csv").write_text(
            f"doc_id,text\n{i},row{i}\n"
        )
    good, quar = read_csv_quarantine(
        spark, str(tmp_path) + "/*.csv", "doc_id long, text string"
    )
    assert sorted((r["doc_id"], r["text"]) for r in good.collect()) == [
        (0, "row0"),
        (1, "row1"),
    ]
    assert quar.count() == 0


def test_gz_and_tsv(spark, tmp_path):
    import gzip

    from buildkite_logs_parquet_spark.sources.csv_source import (
        read_csv_quarantine,
    )

    p = tmp_path / "d.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write("a\tb\n1\tx\n2\ty\n")
    good, _q = read_csv_quarantine(
        spark, str(p), "a long, b string", sep="\t"
    )
    assert sorted((r["a"], r["b"]) for r in good.collect()) == [
        (1, "x"),
        (2, "y"),
    ]


def test_round_trip(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.csv_source import (
        read_csv_quarantine,
        write_csv,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    out = str(tmp_path / "out")
    write_csv(df, out)
    good, quar = read_csv_quarantine(
        spark, out + "/*.csv", "doc_id long, text string"
    )
    assert sorted(map(tuple, good.collect())) == [(1, "alpha"), (2, "beta")]
    assert quar.count() == 0
