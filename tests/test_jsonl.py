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
