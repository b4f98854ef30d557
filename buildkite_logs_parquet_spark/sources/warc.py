"""WARC / WET ingestion — the Common Crawl shape of corpus intake.

A WET file is a concatenation of WARC records: a header block
(``WARC/1.0`` + ``Name: value`` lines, CRLF-separated), a blank line,
``Content-Length`` bytes of payload, and a blank-line separator.  The
files ship gzip-compressed and — crucially for distribution — gzip is
NOT splittable, so the unit of parallelism is the FILE, not the byte
range: every production crawl pipeline assigns whole ~1 GB WET files to
tasks.  That maps exactly onto Spark's ``binaryFile`` source (one row
per file, content as bytes) followed by an Arrow-batched ``mapInPandas``
that decompresses and walks records executor-side; payload bytes never
touch the driver, and downstream partitioning inherits the file
distribution (repartition after parsing if records-per-file is skewed).

No external WARC library is used (none is available here and none is
needed): the record walk below is a direct implementation of the
ISO 28500 framing — length-delimited payloads, tolerant header parse,
malformed tails quarantined per file rather than failing the job
(the same quarantine-don't-abort policy as sources/jsonl.py, inherited
from the reference's scanner error contract, scanner.go:55-58).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

#: output schema of the record walk — one row per WARC record, header
#: fields most pipelines key on promoted to columns, full payload text.
WET_SCHEMA = (
    "file string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, content_length long, text string, error string"
)

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _decompress(fname: str, raw: bytes) -> bytes:
    """gzip or zstd (Common Crawl ships both; ``.warc.zst`` streams via
    pyarrow's CompressedInputStream — no decompressed-size needed);
    plain bytes pass through.  Raises OSError on damage."""
    if fname.endswith(".gz") or raw[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
    if fname.endswith(".zst") or raw[:4] == _ZSTD_MAGIC:
        import pyarrow as pa

        try:
            return pa.input_stream(
                pa.BufferReader(raw), compression="zstd"
            ).read()
        except pa.lib.ArrowInvalid as e:
            raise OSError(f"zstd: {e}") from e
    return raw


def _iter_warc_records(raw: bytes):
    """Yield ``(headers: dict, payload: bytes)`` from concatenated WARC
    record bytes; raises ValueError on unrecoverable framing damage."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        while pos < n and raw[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        head_end = raw.find(b"\r\n\r\n", pos)
        sep = 4
        if head_end == -1:
            head_end = raw.find(b"\n\n", pos)
            sep = 2
        if head_end == -1:
            raise ValueError(f"unterminated header block at byte {pos}")
        head = raw[pos:head_end].decode("utf-8", errors="replace")
        lines = head.splitlines()
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"missing WARC/ version line at byte {pos}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError as e:
            raise ValueError(f"bad Content-Length at byte {pos}") from e
        body_start = head_end + sep
        if body_start + clen > n:
            raise ValueError(f"truncated payload at byte {body_start}")
        yield headers, raw[body_start : body_start + clen]
        pos = body_start + clen


def read_warc_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET/WARC files (plain, ``.gz``, or ``.zst``) into one row
    per record.

    ``binaryFile`` scan (one task per file — the natural gzip
    parallelism unit) → executor-side decompress + record walk in
    ``mapInPandas``.  Header fields are tolerant (missing → null);
    a file whose framing breaks mid-stream yields the records parsed so
    far plus ONE quarantine row (``error`` set, text null) instead of
    failing the job.  Filter ``warc_type = 'conversion'`` for WET text
    records; ``error IS NOT NULL`` is the quarantine audit.
    """
    import pandas as pd

    binary = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    raw = _decompress(fname, bytes(content))
                except OSError as e:
                    out.append(_row(fname, -1, error=str(e)))
                    continue
                idx = 0
                try:
                    for headers, payload in _iter_warc_records(raw):
                        out.append(
                            _row(
                                fname,
                                idx,
                                warc_type=headers.get("warc-type"),
                                target_uri=headers.get("warc-target-uri"),
                                warc_date=headers.get("warc-date"),
                                content_length=len(payload),
                                text=payload.decode(
                                    "utf-8", errors="replace"
                                ),
                            )
                        )
                        idx += 1
                except ValueError as e:
                    out.append(_row(fname, idx, error=str(e)))
            yield pd.DataFrame(
                out,
                columns=[
                    "file",
                    "record_idx",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "content_length",
                    "text",
                    "error",
                ],
            )

    def _row(fname, idx, **kw):
        base = {
            "file": fname,
            "record_idx": idx,
            "warc_type": None,
            "target_uri": None,
            "warc_date": None,
            "content_length": None,
            "text": None,
            "error": None,
        }
        base.update(kw)
        return base

    return binary.select("path", "content").mapInPandas(parse, WET_SCHEMA)


#: output schema of the raw-crawl reader — one row per HTTP response
#: record, body already extracted to text.
HTML_SCHEMA = (
    "file string, record_idx int, target_uri string, warc_date string, "
    "http_status int, content_type string, title string, text string, "
    "main_text string, n_links int, error string"
)


def _html_rows(binary: DataFrame) -> DataFrame:
    """The shared extraction stage: (path, content) rows → HTML_SCHEMA
    rows; works identically on a batch ``binaryFile`` scan and a
    streaming one (``follow_warc_dir``)."""
    import pandas as pd

    from buildkite_logs_parquet_spark.functions.html_text import (
        extract_html_blocks,
        main_content,
        parse_http_response,
    )

    cols = [
        "file", "record_idx", "target_uri", "warc_date", "http_status",
        "content_type", "title", "text", "main_text", "n_links", "error",
    ]

    def blank(fname, idx, **kw):
        base = dict.fromkeys(cols)
        base.update(file=fname, record_idx=idx, **kw)
        return base

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    raw = _decompress(fname, bytes(content))
                except OSError as e:
                    out.append(blank(fname, -1, error=str(e)))
                    continue
                idx = 0
                try:
                    for headers, payload in _iter_warc_records(raw):
                        if headers.get("warc-type") != "response":
                            idx += 1
                            continue
                        http = parse_http_response(payload)
                        ctype = (http["content_type"] or "").lower()
                        if ctype and "html" not in ctype:
                            idx += 1
                            continue
                        doc = extract_html_blocks(http["body"])
                        out.append(
                            blank(
                                fname,
                                idx,
                                target_uri=headers.get("warc-target-uri"),
                                warc_date=headers.get("warc-date"),
                                http_status=http["status"],
                                content_type=http["content_type"],
                                title=doc["title"],
                                text="\n".join(
                                    b["text"] for b in doc["blocks"]
                                ),
                                main_text=main_content(doc["blocks"]),
                                n_links=doc["n_links"],
                            )
                        )
                        idx += 1
                except ValueError as e:
                    out.append(blank(fname, idx, error=str(e)))
            yield pd.DataFrame(out, columns=cols)

    return binary.select("path", "content").mapInPandas(parse, HTML_SCHEMA)


def read_warc_html(spark: SparkSession, path: str) -> DataFrame:
    """Read RAW crawl WARCs (``response`` records: HTTP envelope + HTML
    body) into one extracted-text row per page — the step WET files
    have already had applied, done here natively so the pipeline can
    start from an actual crawl instead of someone else's extraction.

    Same distribution contract as :func:`read_warc_wet` (one task per
    gzip file, Arrow-batched executor-side parse, quarantine rows on
    framing damage).  Non-``response`` records and non-HTML content
    types are skipped; chunked transfer-encoding and charset handling
    live in ``functions/html_text.py``.  ``text`` keeps every block;
    ``main_text`` drops boilerplate (short and/or link-saturated blocks
    per the jusText-style density rule in ``main_content``).
    """
    return _html_rows(spark.read.format("binaryFile").load(path))


def follow_warc_dir(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """STREAMING raw-crawl intake: the same extraction as
    :func:`read_warc_html` over WARC files AS THEY LAND in a directory
    (Structured Streaming ``binaryFile`` source — each micro-batch picks
    up newly arrived files, at most ``max_files_per_trigger`` per
    trigger so one giant drop cannot stall a trigger interval).

    Returns a streaming DataFrame in ``HTML_SCHEMA``; compose with the
    existing sinks — ``streaming.follow.stream_to_lake`` for a document
    lake, ``stream_append_dedup_against_lake`` for arrival-time dedup,
    ``stream_sketch_state`` to keep the ingest profiled — exactly like
    the log-tail sources.  Quarantine rows flow in-stream (``error IS
    NOT NULL``), so damaged files surface in the lake, not in a dead
    executor.
    """
    binary = (
        spark.readStream.format("binaryFile")
        # streaming sources need the schema up front — binaryFile's is
        # fixed by the format
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", int(max_files_per_trigger))
        .load(path)
    )
    return _html_rows(binary)
