"""JDBC source/sink (SURVEY.md §2.1, §2.2).

Reference parity targets (under /root/reference/, ``MRC/`` =
hadoop-mapreduce-client-core/src/main/java/org/apache/hadoop/):

- DBInputFormat (MRC/mapreduce/lib/db/DBInputFormat.java:61): table /
  query scan, LIMIT/OFFSET splits.
- DataDrivenDBInputFormat (…/DataDrivenDBInputFormat.java:61): splits
  by value ranges of a split column — exactly ``spark.read.jdbc``'s
  column/lowerBound/upperBound/numPartitions contract, so
  ``jdbc_read_partitioned`` is a thin adapter.
- DBOutputFormat (…/DBOutputFormat.java:51): batched INSERT sink →
  ``df.write.jdbc`` (one batched connection per partition).

The DBCountPageView example (MRX/DBCountPageView.java:78) is the
end-to-end JDBC flow: scan access log → aggregate → write counts back
— reproduced in tests with the Derby driver Spark bundles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def jdbc_read(spark: SparkSession, url: str, table: str, properties: dict | None = None) -> DataFrame:
    """Whole-table/query scan (DBInputFormat).  ``table`` may be a
    table name or a ``(SELECT …) alias`` derived-table string."""
    return spark.read.jdbc(url, table, properties=properties or {})


def jdbc_read_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    properties: dict | None = None,
) -> DataFrame:
    """Value-range split scan (DataDrivenDBInputFormat): each partition
    issues WHERE column BETWEEN [lo_i, hi_i) — the reference's
    IntegerSplitter strategy, built into the Spark JDBC source."""
    return spark.read.jdbc(
        url,
        table,
        column=column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=properties or {},
    )


def jdbc_write(df: DataFrame, url: str, table: str, mode: str = "overwrite", properties: dict | None = None) -> None:
    """Batched INSERT sink (DBOutputFormat): one connection per
    partition, statements batched."""
    df.write.jdbc(url, table, mode=mode, properties=properties or {})
