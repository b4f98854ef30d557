"""CSV/TSV document source with corrupt-record quarantine — the
``jsonl.py`` policy (quarantine-don't-abort, scanner.go:55-58) applied
to delimited files, the other ubiquitous corpus-dump format.

Mechanics mirror the JSONL source: the file is scanned as TEXT and
parsed with ``from_csv`` against an EXPLICIT schema (no inference
pre-scan — schema inference reads the corpus twice and guesses types
from a sample, both wrong at 100 TB), PERMISSIVE mode routing rows
Spark cannot bind into a quarantine relation that preserves the
byte-exact original line for replay.  The header line (when present)
is dropped by VALUE — comparing against the rendered header text, not
per-partition position, so the drop is layout-independent and works
when Spark splits a file mid-stream.

Plain and ``.gz`` files ride the text scan's pure-Java codecs; a
malformed row never kills a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from buildkite_logs_parquet_spark.sources.jsonl import CORRUPT_COL


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = ",",
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Read delimited text with an explicit schema; return ``(good,
    quarantine)`` — good has exactly the schema's columns, quarantine
    is one ``raw`` column holding every line that failed parsing,
    type-coercion, or arity (CSV is positional — a row with missing
    trailing fields IS malformed and quarantines, unlike JSONL's
    named-field tolerance)."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not isinstance(schema, StructType):
        raise TypeError(f"schema must be a struct, got {schema}")
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    lines = spark.read.text(path).where(F.length("value") > 0)
    if header:
        header_text = sep.join(f.name for f in schema.fields)
        lines = lines.where(F.col("value") != header_text)
    parsed = lines.select(
        F.col("value"),
        F.from_csv(
            F.col("value"),
            full.simpleString(),
            {
                "sep": sep,
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
            },
        ).alias("_c"),
    )
    ok = F.col(f"_c.{CORRUPT_COL}").isNull()
    good = parsed.where(ok).select(
        *[F.col(f"_c.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(~ok).select(F.col("value").alias("raw"))
    return good, quarantine


def write_csv(
    df: DataFrame, path: str, sep: str = ",", mode: str = "overwrite"
) -> None:
    """Write as headered CSV part files (the interchange export)."""
    df.write.mode(mode).option("header", True).option("sep", sep).csv(path)
