"""TeraGen → TeraSort → TeraValidate pipeline (SURVEY.md §2.13, §5.4).

Reference (under /root/reference/hadoop-mapreduce-project/
hadoop-mapreduce-examples/src/main/java/org/apache/hadoop/examples/terasort/):

- TeraGen.java:61-122   100-byte records: 10-byte key + 90-byte value,
  generated from a synthetic range source (RangeInputFormat :83).
- TeraSort.java:55-239  total-order sort via sampled trie partitioner.
- TeraValidate.java:63-126  asserts global order + checksum equality.
- TeraChecksum.java     global CRC sum, map partials → single reduce.

Spark-first: ``spark.range(n)`` is the range source; deterministic
sha2-derived ASCII bytes replace the reference's PRNG; ``orderBy`` is
the sampled range-partitioned total sort; validation checks both the
sort invariant (max(key) per partition <= min(key) of the next) and
checksum preservation (sum of crc32 over records is sort-invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def teragen(spark: SparkSession, num_rows: int, partitions: int | None = None) -> DataFrame:
    """Deterministic 100-byte records: 10-hex-char key + 90-hex-char
    value derived from xxhash64 of the row id (uniform like TeraGen's
    PRNG records, reproducible on any cluster layout, ~2× cheaper than
    a cryptographic hash — the generator must not dominate the sort
    being benchmarked)."""
    rng = spark.range(0, num_rows, numPartitions=partitions) if partitions else spark.range(num_rows)
    hexes = [F.lpad(F.hex(F.xxhash64(F.col("id"), F.lit(i))), 16, "0") for i in range(7)]
    return rng.select(
        F.substring(hexes[0], 1, 10).alias("key"),
        F.substring(F.concat(*hexes[1:]), 1, 90).alias("value"),
    )


def terasort(df: DataFrame) -> DataFrame:
    """Total-order sort on key: Spark samples the key distribution and
    range-partitions (RangePartitioning) — the built-in equivalent of
    TeraInputFormat.writePartitionFile + the 2-level trie partitioner
    (TeraSort.java:64-239)."""
    return df.orderBy("key")


def terachecksum(df: DataFrame) -> int:
    """Global crc32 sum over whole records (TeraChecksum.java): partial
    sums per partition, single final merge — built-in partial agg."""
    row = df.select(F.sum(F.crc32(F.concat("key", "value"))).alias("cksum")).collect()[0]
    return int(row["cksum"] or 0)


def teravalidate(sorted_df: DataFrame, input_checksum: int) -> Row:
    """TeraValidate: (1) keys globally non-decreasing, checked the way
    TeraValidate.java:63-126 checks its output files — EVERY record in
    partition-iteration order (one Arrow-batched fold per partition
    carrying first/last/sorted across batch boundaries; pandas'
    lexicographic string compare equals Spark's binary UTF8 ordering
    on these ASCII hex keys), then a tiny driver-side scan over the
    per-partition boundaries; (2) checksum equality (content
    preservation).  Round-10 review fix: the previous form trusted
    within-partition order ("guaranteed by the sort") — true of
    Spark's sort operator, but the reference's validator checks the
    records, not the operator contract, and so does this one now."""
    from collections.abc import Iterator

    import pandas as pd

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        first = last = None
        ok = True
        n = 0
        for pdf in batches:
            keys = pdf["key"]
            if len(keys) == 0:
                continue
            if first is None:
                first = keys.iloc[0]
            if last is not None and keys.iloc[0] < last:
                ok = False
            if not keys.is_monotonic_increasing:
                ok = False
            last = keys.iloc[-1]
            n += len(keys)
        if n:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "first_key": [first],
                    "last_key": [last],
                    "rows": [n],
                    "locally_sorted": [ok],
                }
            )

    part_stats = sorted(
        sorted_df.select("key").mapInPandas(
            check,
            "pid int, first_key string, last_key string, rows long, locally_sorted boolean",
        ).collect(),
        key=lambda r: r["pid"],
    )
    globally_sorted = all(r["locally_sorted"] for r in part_stats)
    prev_last = None
    for r in part_stats:
        if prev_last is not None and r["first_key"] < prev_last:
            globally_sorted = False
            break
        prev_last = r["last_key"]
    out_checksum = terachecksum(sorted_df)
    return Row(
        rows=sum(r["rows"] for r in part_stats),
        globally_sorted=globally_sorted,
        checksum_match=bool(out_checksum == input_checksum),
    )
