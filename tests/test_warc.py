"""WARC/WET source tests: synthetic files, gzip, quarantine."""

import gzip


def _record(uri, text, wtype="conversion"):
    payload = text.encode()
    # each header line ends with CRLF; ONE extra CRLF forms the blank
    # line, then Content-Length payload bytes, then the CRLF CRLF
    # record separator (ISO 28500 framing)
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def test_read_warc_wet_plain_and_gzip(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.warc import read_warc_wet

    wet = (
        _record("http://a.example/", "hello world document one")
        + _record("http://b.example/", "second doc\nwith two lines")
        + _record("warcinfo", "software: test", wtype="warcinfo")
    )
    (tmp_path / "f1.warc.wet").write_bytes(wet)
    (tmp_path / "f2.warc.wet.gz").write_bytes(gzip.compress(wet))

    df = read_warc_wet(spark, str(tmp_path)).cache()
    rows = df.collect()
    assert len(rows) == 6  # 3 records x 2 files
    assert all(r["error"] is None for r in rows)

    conv = df.where("warc_type = 'conversion'").collect()
    assert len(conv) == 4
    by_uri = {(r["file"].rsplit("/", 1)[-1], r["target_uri"]): r for r in conv}
    r = by_uri[("f1.warc.wet", "http://a.example/")]
    assert r["text"] == "hello world document one"
    assert r["content_length"] == len("hello world document one")
    assert r["warc_date"] == "2026-08-14T00:00:00Z"
    gz = by_uri[("f2.warc.wet.gz", "http://b.example/")]
    assert gz["text"] == "second doc\nwith two lines"


def test_read_warc_wet_quarantines_broken_tail(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.warc import read_warc_wet

    good = _record("http://ok.example/", "fine document")
    broken = b"WARC/1.0\r\nContent-Length: 99999\r\n\r\nshort tail bytes"
    (tmp_path / "broken.wet").write_bytes(good + broken)

    df = read_warc_wet(spark, str(tmp_path))
    rows = sorted(df.collect(), key=lambda r: r["record_idx"])
    assert len(rows) == 2
    assert rows[0]["error"] is None and rows[0]["text"] == "fine document"
    assert rows[1]["error"] is not None and "truncated" in rows[1]["error"]
    assert rows[1]["text"] is None


def test_read_warc_wet_feeds_curation(spark, tmp_path):
    """Composition: WET records flow straight into the documents-shaped
    pipeline (text profile over conversion records)."""
    from pyspark.sql import functions as F

    from buildkite_logs_parquet_spark.operators.text_analysis import (
        token_count,
    )
    from buildkite_logs_parquet_spark.sources.warc import read_warc_wet

    wet = b"".join(
        _record(f"http://site{i}.example/", f"doc number {i} with some words")
        for i in range(5)
    )
    (tmp_path / "c.wet").write_bytes(wet)
    docs = (
        read_warc_wet(spark, str(tmp_path))
        .where("warc_type = 'conversion'")
        .select(
            F.col("record_idx").cast("long").alias("doc_id"), "text"
        )
    )
    prof = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    ).collect()
    assert len(prof) == 5
    assert all(r["n_tokens"] == 6 for r in prof)


def _response_record(uri, html, ctype="text/html; charset=utf-8",
                     status=200, chunked=False):
    body = html.encode()
    if chunked:
        body = f"{len(body):x}".encode() + b"\r\n" + body + b"\r\n0\r\n\r\n"
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {ctype}\r\n"
        + ("Transfer-Encoding: chunked\r\n" if chunked else "")
        + "\r\n"
    ).encode() + body
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
        f"Content-Length: {len(http)}\r\n"
    ).encode()
    return head + b"\r\n" + http + b"\r\n\r\n"


def test_read_warc_html_extracts_responses(spark, tmp_path):
    """Raw-crawl path: response records (HTTP + HTML) come out as
    extracted text rows; non-response and non-HTML records are skipped."""
    from buildkite_logs_parquet_spark.sources.warc import read_warc_html

    warc = (
        _record("http://meta.example/", "warcinfo-ish", wtype="warcinfo")
        + _response_record(
            "http://a.example/",
            "<html><head><title>Page A</title></head><body>"
            "<p>hello   crawl</p><a href='/x'>x</a><a href='/y'>y</a>"
            "<script>skip()</script></body></html>",
        )
        + _response_record(
            "http://img.example/p.png", "PNGBYTES", ctype="image/png"
        )
        + _response_record(
            "http://b.example/", "<p>chunked body</p>", chunked=True
        )
    )
    (tmp_path / "crawl.warc").write_bytes(warc)
    rows = {r["target_uri"]: r for r in read_warc_html(spark, str(tmp_path)).collect()}
    assert set(rows) == {"http://a.example/", "http://b.example/"}
    a = rows["http://a.example/"]
    assert a["title"] == "Page A"
    assert a["text"] == "hello crawl\nx\ny" or "hello crawl" in a["text"]
    assert "skip()" not in a["text"]
    assert a["n_links"] == 2
    assert a["http_status"] == 200
    b = rows["http://b.example/"]
    assert b["text"] == "chunked body"


def test_read_warc_html_quarantines_broken_tail(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.warc import read_warc_html

    good = _response_record("http://ok.example/", "<p>fine</p>")
    broken = b"WARC/1.0\r\nContent-Length: 99999\r\n\r\nshort"
    (tmp_path / "broken.warc").write_bytes(good + broken)
    rows = read_warc_html(spark, str(tmp_path)).collect()
    ok = [r for r in rows if r["error"] is None]
    bad = [r for r in rows if r["error"] is not None]
    assert len(ok) == 1 and ok[0]["text"] == "fine"
    assert len(bad) == 1 and "truncated" in bad[0]["error"]


def test_read_warc_zstd_compressed(spark, tmp_path):
    """Common Crawl's other wire format: .warc.zst streams through
    pyarrow's zstd codec (no decompressed-size hint available or
    needed); damaged zstd quarantines like damaged gzip."""
    import pyarrow as pa

    from buildkite_logs_parquet_spark.sources.warc import (
        read_warc_html,
        read_warc_wet,
    )

    wet = _record("http://z.example/", "zstd wet document")
    comp = bytes(pa.Codec("zstd").compress(wet))
    (tmp_path / "a.warc.wet.zst").write_bytes(comp)
    rows = read_warc_wet(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0]["text"] == "zstd wet document"

    html_rec = _response_record("http://z.example/", "<p>zstd html</p>")
    (tmp_path / "a.warc.wet.zst").unlink()
    (tmp_path / "b.warc.zst").write_bytes(
        bytes(pa.Codec("zstd").compress(html_rec))
    )
    hrows = read_warc_html(spark, str(tmp_path)).collect()
    assert len(hrows) == 1 and hrows[0]["text"] == "zstd html"

    # corrupt zstd body -> quarantine row, job survives
    (tmp_path / "b.warc.zst").unlink()
    (tmp_path / "broken.warc.zst").write_bytes(comp[:8] + b"\x00garbage")
    q = read_warc_wet(spark, str(tmp_path)).collect()
    assert len(q) == 1 and q[0]["error"] is not None


def test_follow_warc_dir_streams_arrivals(spark, tmp_path):
    """Streaming raw-crawl intake: files dropped into the directory come
    out as extracted-text rows through the SAME stage as the batch
    reader, micro-batch by micro-batch."""
    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.warc").write_bytes(
        _response_record(
            "http://s1.example/",
            "<title>S1</title><p>first streamed page with words</p>",
        )
    )
    (src / "b.warc").write_bytes(
        _response_record(
            "http://s2.example/",
            "<title>S2</title><p>second streamed page with words</p>",
        )
    )

    from buildkite_logs_parquet_spark.sources.warc import follow_warc_dir

    stream = follow_warc_dir(spark, str(src), max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "lake"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["target_uri"]: r
        for r in spark.read.parquet(str(tmp_path / "lake")).collect()
    }
    assert set(rows) == {"http://s1.example/", "http://s2.example/"}
    assert rows["http://s1.example/"]["title"] == "S1"
    assert "first streamed page" in rows["http://s1.example/"]["main_text"]

    # restart with a NEW file: only the arrival is processed (offsets)
    (src / "c.warc").write_bytes(
        _response_record(
            "http://s3.example/",
            "<title>S3</title><p>late arrival page with words</p>",
        )
    )
    q2 = (
        follow_warc_dir(spark, str(src))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "lake"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    lake = spark.read.parquet(str(tmp_path / "lake"))
    assert lake.count() == 3  # no reprocessing of a/b
