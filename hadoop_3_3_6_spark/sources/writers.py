"""Sink-side operators (SURVEY.md §2.2).

- TextOutputFormat (key<TAB>value lines)
  MRC/mapreduce/lib/output/TextOutputFormat.java:44
- MultipleOutputs / MultipleTextOutputFormat (route records to files
  by a key) MRC/mapreduce/lib/output/MultipleOutputs.java:187-474 →
  ``partitionBy`` on the routing column: one directory per route,
  written in a single pass (the reference also wrote all routes in one
  task pass).
- FileOutputCommitter atomicity is built-in — Spark drives the same
  commit protocol (MRC/mapreduce/lib/output/FileOutputCommitter.java:51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_key_value_text(df: DataFrame, path: str, key: str = "key", value: str = "value", sep: str = "\t") -> None:
    """TextOutputFormat: ``key<SEP>value`` lines, one file per partition
    (the reference's part-r-NNNNN)."""
    df.select(F.concat_ws(sep, F.col(key).cast("string"), F.col(value).cast("string")).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def named_outputs(df: DataFrame, outputs: dict[str, tuple], base_path: str, fmt: str = "parquet") -> None:
    """MultipleOutputs named-output API (addNamedOutput :321 +
    write(name, k, v) :474): each named output is a (filter_condition,
    projection_columns) pair written to ``{base_path}/{name}``.  The
    input is cached once so N outputs cost one upstream computation —
    mirroring the reference's single task pass over the data."""
    df = df.cache()
    try:
        for name, (condition, columns) in outputs.items():
            out = df.filter(condition)
            if columns:
                out = out.select(*columns)
            getattr(out.write.mode("overwrite"), fmt)(f"{base_path}/{name}")
    finally:
        df.unpersist()


def multiple_outputs(df: DataFrame, path: str, route_col: str, fmt: str = "parquet") -> None:
    """MultipleOutputs: per-record routing to named outputs — a
    partitioned write; each distinct route value becomes
    ``{path}/{route_col}={v}/``.  Single pass, no per-route job."""
    writer = df.write.mode("overwrite").partitionBy(route_col)
    getattr(writer, fmt)(path)


def write_non_empty(df: DataFrame, path: str, fmt: str = "parquet") -> int:
    """LazyOutputFormat analogue (MRC/mapreduce/lib/output/
    LazyOutputFormat.java:42): only partitions that actually produced
    records leave a part file behind.

    Spark's FileFormatWriter already commits lazily for normal jobs —
    an empty task leaves no part file (verified by test), so the
    reference's wrapper is built-in for the common case.  The one gap:
    an entirely empty DataFrame still writes a single schema-only part
    file.  This helper writes normally, then prunes any zero-row part
    files in a post-commit pass over the output listing (driver-side,
    but bounded by the partition count, not the data).  Returns files
    removed.  Text/CSV empties are zero-byte; parquet empties carry
    only a footer, detected via the file metadata row count."""
    import os

    getattr(df.write.mode("overwrite"), fmt)(path)
    removed = 0
    for name in os.listdir(path):
        if not name.startswith("part-"):
            continue
        full = os.path.join(path, name)
        if fmt == "parquet":
            import pyarrow.parquet as pq

            empty = pq.ParquetFile(full).metadata.num_rows == 0
        else:
            empty = os.path.getsize(full) == 0
        if empty:
            os.remove(full)
            removed += 1
    return removed
