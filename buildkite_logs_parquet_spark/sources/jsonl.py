"""JSONL document source/sink with corrupt-record quarantine.

Real training-data pipelines ingest crawl/corpus dumps as JSON Lines.  The
reference engine's philosophy for malformed input is quarantine-don't-abort
(scanner.go:55-58 tags unparseable lines instead of failing the scan); this
source applies the same policy to JSONL: schema-conforming rows flow on,
malformed lines land in a quarantine relation with the raw text preserved
for replay.

Scale notes: ``spark.read.json`` with an EXPLICIT schema is a single
streaming pass per file split (no schema-inference pre-scan, which would
read the corpus twice); PERMISSIVE mode routes bad records into the
corrupt-record column instead of killing tasks.  The good/quarantine split
is one narrow filter each off a shared scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: column holding the raw line for rows that failed to parse
CORRUPT_COL = "_corrupt_record"


def _zst_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line scan for ``.jsonl.zst`` dumps (the Pile/Dolma wire format —
    Hadoop's text source has no pure-Java zstd codec, so ``spark.read.
    text`` cannot serve these).  Same distribution model as the WARC
    source: ``binaryFile`` scan (one task per compressed file — the
    natural parallelism unit for whole-stream compression) + pyarrow
    streaming decompress executor-side, Arrow-batched.  A file whose
    container is damaged quarantines as ONE tagged row instead of
    killing the scan (quarantine-don't-abort, scanner.go:55-58 policy).

    Output: ``(value string, bad string)`` — ``bad`` is null for real
    lines and carries ``<path>: <error>`` for undecompressable files.
    """
    from collections.abc import Iterator

    binary = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from buildkite_logs_parquet_spark.sources.warc import _decompress

        for pdf in batches:
            vals: list[str | None] = []
            bads: list[str | None] = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                try:
                    data = _decompress(str(fpath), bytes(raw))
                except OSError as e:
                    vals.append(None)
                    bads.append(f"{fpath}: {e}")
                    continue
                for ln in data.decode("utf-8", errors="replace").split("\n"):
                    ln = ln.rstrip("\r")
                    if ln.strip():
                        vals.append(ln)
                        bads.append(None)
            yield pd.DataFrame({"value": vals, "bad": bads})

    return binary.select("path", "content").mapInPandas(
        run, schema="value string, bad string"
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON Lines with an explicit schema; return ``(good, quarantine)``.

    ``good`` has exactly the schema's columns (corrupt column dropped);
    ``quarantine`` is one ``raw`` string column with the original line of
    every record that failed parsing or type-coercion — write it next to
    the output so the batch is replayable after a schema fix.

    A line that parses but misses fields yields nulls (standard JSONL
    tolerance) — quarantine is only for lines Spark could not bind to the
    schema at all (malformed JSON, type conflicts).

    Mechanics: the file is scanned as TEXT and parsed with ``from_json``
    (PERMISSIVE + corrupt-record field) — one pass, no caching, and the
    quarantined ``raw`` column is the byte-exact original line.  (A raw
    ``spark.read.json`` scan cannot serve the quarantine side: Spark
    rejects plans whose only referenced column is the internal corrupt
    record, and the documented cache() workaround pins the whole corpus.)

    Compression: plain and ``.jsonl.gz`` ride the text scan directly
    (Hadoop's gzip codec is pure-Java); ``.jsonl.zst`` paths route
    through the ``binaryFile``+pyarrow scan (``_zst_lines``) — damaged
    zstd containers surface in the quarantine as one ``<path>: zstd:…``
    row rather than aborting the batch.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not isinstance(schema, StructType):
        raise TypeError(f"schema must be a struct, got {schema}")
    if str(path).endswith(".zst"):
        raw_lines = _zst_lines(spark, path)
        file_quar = raw_lines.where(F.col("bad").isNotNull()).select(
            F.col("bad").alias("raw")
        )
        lines = raw_lines.where(F.col("bad").isNull()).select("value")
    else:
        file_quar = None
        lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    good, quarantine = _split_parsed(lines, schema)
    if file_quar is not None:
        quarantine = quarantine.unionByName(file_quar)
    return good, quarantine


def _split_parsed(
    lines: DataFrame, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Shared parse stage: ``value`` lines → (good, quarantine)."""
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_j"),
    )
    ok = F.col(f"_j.{CORRUPT_COL}").isNull()
    good = parsed.where(ok).select(
        *[F.col(f"_j.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(~ok).select(F.col("value").alias("raw"))
    return good, quarantine


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as JSON Lines (one object per row, directory of part files —
    the shardable export format training loaders consume)."""
    df.write.mode(mode).json(path)


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``read_jsonl``: follow a directory of JSON Lines
    drops (the continuous-crawl ingest shape) and return streaming
    ``(good, quarantine)`` DataFrames with identical schemas/semantics.

    Both sides derive from ONE file stream; write the quarantine next to
    the lake (e.g. via ``foreachBatch`` or its own sink) so malformed
    batches stay replayable.  State: none beyond the file-source log —
    the parse is stateless, so watermarks are the consumer's concern.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not isinstance(schema, StructType):
        raise TypeError(f"schema must be a struct, got {schema}")
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    lines = reader.text(path).where(F.length(F.trim("value")) > 0)
    return _split_parsed(lines, schema)
