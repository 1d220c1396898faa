"""Scan-side operators (SURVEY.md §2.1).

Reference parity targets (paths under /root/reference/):

- TextInputFormat (offset,line)  MRC/mapreduce/lib/input/TextInputFormat.java:42
- KeyValueTextInputFormat (split on first separator)
  MRC/mapreduce/lib/input/KeyValueTextInputFormat.java:47
- SequenceFileInputFilter sampled scans (Regex / Percent / MD5 filters)
  MRC/mapreduce/lib/input/SequenceFileInputFilter.java:111-203
- NLineInputFormat parallelism control
  MRC/mapreduce/lib/input/NLineInputFormat.java:63 → repartition
- JDBC scans (DBInputFormat / DataDrivenDBInputFormat,
  MRC/mapreduce/lib/db/DBInputFormat.java:61, DataDrivenDBInputFormat.java:61)
  are built-in: ``spark.read.jdbc(url, table, column=…, lowerBound=…,
  upperBound=…, numPartitions=…)`` reproduces value-range splitting.

Split planning, small-file packing (CombineFileInputFormat) and codec
auto-detection are built into the Spark file source
(spark.sql.files.maxPartitionBytes / openCostInBytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_lines(spark: SparkSession, path: str, with_offset: bool = False) -> DataFrame:
    """TextInputFormat analogue: one row per line, column ``line``.

    ``with_offset`` adds a monotonic per-file position stand-in for the
    byte offset key (the reference key is the byte offset; no example
    query consumes it as data, it is an iteration artifact).
    """
    df = spark.read.text(path).withColumnRenamed("value", "line")
    if with_offset:
        df = df.withColumn("offset", F.monotonically_increasing_id())
    return df


def read_key_value_text(
    spark: SparkSession, path: str, sep: str = "\t"
) -> DataFrame:
    """KeyValueTextInputFormat: split each line on the FIRST separator
    into (key, value); a line without a separator becomes (line, '')."""
    df = spark.read.text(path)
    parts = F.split(F.col("value"), sep, 2)
    return df.select(
        F.element_at(parts, 1).alias("key"),
        F.coalesce(F.element_at(parts, 2), F.lit("")).alias("value"),
    )


# --- sampled scans (SequenceFileInputFilter) ----------------------------


def sample_filter_regex(df: DataFrame, key_col: str, pattern: str) -> DataFrame:
    """RegexFilter (:111): keep records whose key matches."""
    return df.filter(F.col(key_col).rlike(pattern))


def sample_filter_percent(df: DataFrame, key_col: str, frequency: int) -> DataFrame:
    """PercentFilter (:154): keep every record where
    MD5(key) % frequency == 0 — deterministic hash sampling, pushed to
    the scan as a cheap filter."""
    digest_mod = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(frequency),
    )
    return df.filter(digest_mod == 0)


def sample_filter_md5(df: DataFrame, key_col: str, frequency: int) -> DataFrame:
    """MD5Filter (:203): same digest-mod sampling as PercentFilter in
    the reference (both hash the key with MD5)."""
    return sample_filter_percent(df, key_col, frequency)
