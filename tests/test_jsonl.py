"""JSONL source/sink: schema-bound ingest with quarantine-don't-abort
(the reference's malformed-input philosophy, scanner.go:55-58, applied to
the corpus ingest format)."""

from buildkite_logs_parquet_spark.sources.jsonl import (
    read_jsonl,
    stream_jsonl,
    write_jsonl,
)

SCHEMA = "doc_id long, text string, lang string"


def test_read_jsonl_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "hello", "lang": "en"}',
                "this is not json at all",
                '{"doc_id": 2, "text": "welt"}',  # missing field -> null, OK
                '{"doc_id": "NaN-ish", "text": 3}',  # type conflict -> quarantine
                '{"doc_id": 4, "text": "ok", "lang": "de"}',
            ]
        )
    )
    good, quarantine = read_jsonl(spark, str(p), SCHEMA)
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2]["lang"] is None
    assert good.columns == ["doc_id", "text", "lang"]
    bad = [r["raw"] for r in quarantine.collect()]
    assert "this is not json at all" in bad
    assert any("NaN-ish" in b for b in bad)
    assert len(bad) == 2


def test_jsonl_round_trip(spark, tmp_path):
    good, _ = read_jsonl(
        spark,
        str(_write_fixture(tmp_path)),
        SCHEMA,
    )
    out = tmp_path / "out"
    write_jsonl(good, str(out))
    back, q2 = read_jsonl(spark, str(out), SCHEMA)
    assert q2.count() == 0
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, good.collect()))


def _write_fixture(tmp_path):
    p = tmp_path / "rt.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "a", "lang": "en"}\n'
        '{"doc_id": 2, "text": "b", "lang": "fr"}'
    )
    return p


def test_stream_jsonl_good_and_quarantine(spark, tmp_path):
    import time

    src = tmp_path / "drops"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        "broken line\n"
        '{"doc_id": 2, "text": "welt", "lang": "de"}'
    )
    good, quarantine = stream_jsonl(spark, str(src), SCHEMA)
    assert good.isStreaming and quarantine.isStreaming
    g_out = str(tmp_path / "good_out")
    q_out = str(tmp_path / "q_out")
    q1 = (
        good.writeStream.format("parquet")
        .option("path", g_out)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        quarantine.writeStream.format("parquet")
        .option("path", q_out)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(60)
    q2.awaitTermination(60)
    time.sleep(0.2)
    got = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(g_out).collect()
    )
    assert got == [(1, "hello"), (2, "welt")]
    bad = [r["raw"] for r in spark.read.parquet(q_out).collect()]
    assert bad == ["broken line"]


def _zst_bytes(text: str) -> bytes:
    import pyarrow as pa

    buf = pa.BufferOutputStream()
    with pa.output_stream(buf, compression="zstd") as z:
        z.write(text.encode("utf-8"))
    return buf.getvalue().to_pybytes()


def test_read_jsonl_gz(spark, tmp_path):
    import gzip

    from buildkite_logs_parquet_spark.sources.jsonl import read_jsonl

    p = tmp_path / "d.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 1, "text": "a"}\n{"doc_id": 2, "text": "b"}\n')
    good, quar = read_jsonl(spark, str(p), "doc_id long, text string")
    assert sorted((r["doc_id"], r["text"]) for r in good.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    assert quar.count() == 0


def test_read_jsonl_zst(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.jsonl import read_jsonl

    p = tmp_path / "d.jsonl.zst"
    p.write_bytes(
        _zst_bytes(
            '{"doc_id": 1, "text": "a"}\r\n'
            "broken\n"
            '{"doc_id": 2, "text": "b"}\n'
        )
    )
    good, quar = read_jsonl(spark, str(p), "doc_id long, text string")
    assert sorted((r["doc_id"], r["text"]) for r in good.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    assert [r["raw"] for r in quar.collect()] == ["broken"]


def test_read_jsonl_zst_corrupt_container_quarantines_file(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.jsonl import read_jsonl

    okf = tmp_path / "ok.jsonl.zst"
    okf.write_bytes(_zst_bytes('{"doc_id": 3, "text": "c"}\n'))
    bad = tmp_path / "bad.jsonl.zst"
    bad.write_bytes(b"\x28\xb5\x2f\xfd" + b"\x00garbage-truncated")
    good, quar = read_jsonl(
        spark, str(tmp_path) + "/*.jsonl.zst", "doc_id long, text string"
    )
    assert [(r["doc_id"], r["text"]) for r in good.collect()] == [(3, "c")]
    q = [r["raw"] for r in quar.collect()]
    assert len(q) == 1 and "bad.jsonl.zst" in q[0] and "zstd" in q[0].lower()
