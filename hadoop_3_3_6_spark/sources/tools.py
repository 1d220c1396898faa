"""Data-movement tools (SURVEY.md §2.11).

- ``dist_copy``: DistCp analogue (hadoop-tools/hadoop-distcp/src/main/
  java/org/apache/hadoop/tools/DistCp.java:60 under /root/reference/):
  distributed file copy — listing is a driver-side walk (DistCp's
  SimpleCopyListing), the byte movement is distributed via the
  binaryFile source + per-partition writes.  ``update=True``
  reproduces ``-update`` incremental semantics (skip files whose
  size matches — DistCp's default skip criterion, CopyMapper.java:
  skipCopy) by filtering the listing against the target state.
- ``archive_files`` / ``unarchive_files``: HadoopArchives analogue
  (hadoop-tools/hadoop-archives/.../HadoopArchives.java:83): pack many
  small files into one indexed container — here a parquet table keyed
  by path (the .har index role), restorable byte-for-byte.
- ``random_kv`` / ``random_text``: RandomWriter/RandomTextWriter
  (MRX/RandomWriter.java:78, MRX/RandomTextWriter.java:77) synthetic
  sources: spark.range + deterministic hash-derived payloads (seeded,
  reproducible — the reference seeds its PRNG per task the same way).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dist_copy(spark: SparkSession, src_glob: str, dst_dir: str, update: bool = False) -> int:
    """Parallel copy of files matching ``src_glob`` into ``dst_dir``.
    Returns number of files copied.  Bytes move inside executors
    (foreachPartition), never through the driver."""
    files = spark.read.format("binaryFile").load(src_glob)
    if update and os.path.isdir(dst_dir):
        # driver-side listing comparison (DistCp also builds its copy
        # listing centrally); only metadata is collected, never bytes
        meta = files.select("path", "length").collect()
        existing = {n: os.path.getsize(os.path.join(dst_dir, n)) for n in os.listdir(dst_dir)}
        to_copy = [
            r["path"]
            for r in meta
            if existing.get(r["path"].rsplit("/", 1)[-1]) != r["length"]
        ]
        listing = files.filter(F.col("path").isin(to_copy)).select("path", "content")
    else:
        listing = files.select("path", "content")
    os.makedirs(dst_dir, exist_ok=True)
    copied = spark.sparkContext.accumulator(0)

    def write_partition(rows):
        for row in rows:
            name = row["path"].rsplit("/", 1)[-1]
            with open(os.path.join(dst_dir, name), "wb") as f:
                f.write(bytes(row["content"]))
            copied.add(1)

    listing.foreachPartition(write_partition)
    return copied.value


def archive_files(spark: SparkSession, src_glob: str, archive_path: str) -> None:
    """Pack small files into one indexed parquet archive (path, size,
    mod_time, content) — the compaction that .har performed, with
    predicate-pushdown lookup by path replacing the .har index."""
    files = spark.read.format("binaryFile").load(src_glob)
    files.select(
        "path",
        F.col("length").alias("size"),
        F.col("modificationTime").alias("mod_time"),
        "content",
    ).write.mode("overwrite").parquet(archive_path)


def unarchive_files(spark: SparkSession, archive_path: str, dst_dir: str, path_filter: str | None = None) -> int:
    """Restore files from an archive (optionally a single path via
    pushdown-filtered lookup — the .har random-access role)."""
    arch = spark.read.parquet(archive_path)
    if path_filter:
        arch = arch.filter(F.col("path").rlike(path_filter))
    os.makedirs(dst_dir, exist_ok=True)
    restored = spark.sparkContext.accumulator(0)

    def write_partition(rows):
        for row in rows:
            name = row["path"].rsplit("/", 1)[-1]
            with open(os.path.join(dst_dir, name), "wb") as f:
                f.write(bytes(row["content"]))
            restored.add(1)

    arch.select("path", "content").foreachPartition(write_partition)
    return restored.value


_WORDLIST_SIZE = 1000


def random_kv(spark: SparkSession, num_rows: int, key_bytes: int = 10, value_bytes: int = 90, seed: int = 42) -> DataFrame:
    """RandomWriter: deterministic pseudo-random binary-ish KV records."""
    return spark.range(num_rows).select(
        F.substring(F.sha2(F.concat(F.lit(f"k{seed}:"), F.col("id").cast("string")), 256), 1, key_bytes).alias("key"),
        F.substring(
            F.repeat(F.sha2(F.concat(F.lit(f"v{seed}:"), F.col("id").cast("string")), 512), (value_bytes // 128) + 1),
            1,
            value_bytes,
        ).alias("value"),
    )


def random_text(spark: SparkSession, num_rows: int, words_per_row: int = 20, seed: int = 42) -> DataFrame:
    """RandomTextWriter: rows of pseudo-random words drawn from a
    1000-word synthetic vocabulary, fully deterministic (hash-seeded —
    no RNG state, identical on any cluster layout; the portable
    md5-ring hash keeps it bit-identical in the DuckDB oracle too)."""
    from hadoop_3_3_6_spark.functions.dedup import portable_hash_expr

    h = portable_hash_expr(f"concat('{seed}:', cast(id as string), ':', cast(j as string))")
    word = f"concat('w', pmod({h}, {_WORDLIST_SIZE}))"
    return spark.range(num_rows).select(
        F.col("id").alias("row_id"),
        F.expr(
            f"array_join(transform(sequence(1, {words_per_row}), j -> {word}), ' ')"
        ).alias("text"),
    )


def dist_ch(
    spark: SparkSession,
    src_glob: str,
    mode: int | None = None,
    mtime: float | None = None,
    num_partitions: int = 8,
) -> int:
    """DistCh analogue (hadoop-tools/hadoop-extras/src/main/java/org/
    apache/hadoop/tools/DistCh.java under /root/reference/):
    distributed metadata mutation — chmod and/or touch applied to every
    file matching ``src_glob``.  The listing is driver-side (as in
    DistCh's job setup), the mutations run in executors over a
    parallelized path list; no file content is ever read.  Ownership
    changes (DistCh -owner) are deliberately out: they require
    privileges an engine should not assume.  Returns files changed."""
    import glob as _glob

    paths = sorted(_glob.glob(src_glob))
    if not paths:
        return 0
    changed = spark.sparkContext.accumulator(0)

    def apply_partition(rows):
        for (path,) in rows:
            if mode is not None:
                os.chmod(path, mode)
            if mtime is not None:
                os.utime(path, (mtime, mtime))
            changed.add(1)

    spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        min(num_partitions, len(paths))
    ).foreachPartition(apply_partition)
    return changed.value
