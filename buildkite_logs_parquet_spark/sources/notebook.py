"""Jupyter notebook (.ipynb) intake for code corpora: one row per cell.

Notebooks are a major code-data source (the nbformat JSON layout is
public), but as corpus input they are hostile in two specific ways this
reader handles declaratively:

* ``source`` is EITHER one string or a list of lines depending on the
  producing tool — the reader normalizes both to one string;
* outputs can dwarf the code (plots, data dumps) — the reader never
  materializes them, only counts them (``n_outputs``), so a 100 MB
  embedded image costs schema pruning, not memory.

Plan shape: ``multiLine`` JSON scan (one task per file — notebooks are
document-sized, the right granularity), ``posexplode`` of the cells
array, pure expressions after that.  The file path rides the
``_metadata`` column so provenance survives without
``input_file_name()``'s projection hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_notebook_cells(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.ipynb`` files under ``path`` into
    ``(path, cell_idx, cell_type, source, n_source_chars, n_outputs)``
    — markdown and code cells alike (filter on ``cell_type``
    downstream); malformed notebooks without a ``cells`` array produce
    zero rows rather than failing the scan."""
    raw = (
        spark.read.option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .json(path)
        .select(
            F.col("_metadata.file_path").alias("path"),
            F.col("cells").alias("_cells"),
        )
        .where(F.col("_cells").isNotNull())
    )
    cell = raw.select(
        "path", F.posexplode("_cells").alias("cell_idx", "_c")
    )
    fields = {f.name for f in cell.schema["_c"].dataType.fields}
    src = F.col("_c.source")
    src_type = dict(cell.select(src.alias("_s")).dtypes)["_s"]
    if src_type.startswith("array"):
        source = F.array_join(src, "")
    else:
        source = src.cast("string")
    n_outputs = (
        F.coalesce(F.size("_c.outputs"), F.lit(0))
        if "outputs" in fields
        else F.lit(0)
    )
    return cell.select(
        "path",
        "cell_idx",
        F.col("_c.cell_type").alias("cell_type"),
        source.alias("source"),
        F.length(source).alias("n_source_chars"),
        n_outputs.alias("n_outputs"),
    )
