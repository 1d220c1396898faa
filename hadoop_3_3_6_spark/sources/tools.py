"""Data-movement tools (SURVEY.md §2.11).

- ``dist_copy``: DistCp analogue (hadoop-tools/hadoop-distcp/src/main/
  java/org/apache/hadoop/tools/DistCp.java:60 under /root/reference/):
  distributed file copy — the listing is itself a distributed
  metadata-only scan (binaryFile source with the content column
  pruned: DistCp's SimpleCopyListing made into a job, which the
  reference only does for the copies), byte movement is streamed
  file-to-file inside executors (CopyMapper.java analogue; whole-file
  rows never materialize).  Destinations preserve the path relative
  to the glob base, so equal basenames in different subdirs never
  collide.  ``update=True`` reproduces ``-update`` incremental
  semantics (skip files whose size matches — DistCp's skip criterion,
  CopyMapper.java skipCopy) via an in-plan metadata join, no driver
  listing.  ``dist_copy_sync`` is the snapshot-diff sync analogue
  (DistCpSync.java:1): a recorded manifest plays the from-snapshot,
  the live source tree the to-snapshot; only created/modified files
  are copied and deleted files are removed from the target.
  Executors must share the destination filesystem with the driver
  (true in local mode and on any shared mount; on a real cluster the
  destination is a distributed FS path, same as DistCp assumes).
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


_GLOB_CHARS = "*?[{"


def _glob_base(src_glob: str) -> str:
    """Directory prefix of a glob before its first metacharacter — the
    root that relative destination paths are computed against."""
    parts = src_glob.split(os.sep)
    base: list[str] = []
    for p in parts:
        if any(ch in p for ch in _GLOB_CHARS):
            break
        base.append(p)
    d = os.sep.join(base) or os.sep
    return d if os.path.isdir(d) else (os.path.dirname(d) or os.sep)


def _meta_listing(spark: SparkSession, glob: str, base: str) -> DataFrame:
    """Distributed metadata listing: (rel, src, length, mtime) rows.
    The binaryFile source with content pruned reads only file status —
    the listing scales out instead of walking on the driver.  ``base``
    may be a plain local path (listed by Spark as ``file:/...``) or a
    scheme URI (listed verbatim) — ``rel`` is computed against the
    form the file source actually reports."""
    listed_base = base.rstrip("/") if "://" in base else "file:" + base.rstrip(os.sep)
    prefix_len = len(listed_base) + 2  # +2: 1-based substring past the '/'
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if _GLOB_CHARS[0] not in glob else "false")
        .load(glob)
        .select(
            F.expr(f"substring(path, {prefix_len})").alias("rel"),
            F.regexp_replace("path", "^file:", "").alias("src"),
            "length",
            F.col("modificationTime").cast("double").alias("mtime"),
        )
    )


def _fs_for(path: str):
    """Resolve (pyarrow FileSystem, inner path) for a path or URI —
    the executor-side filesystem abstraction (Hadoop FileSystem.get
    analogue): plain paths and file: URIs land on LocalFileSystem;
    s3://, hdfs://, gs:// route to the matching pyarrow binding where
    its native libs are present (same deployment contract as the
    reference's fs.*.impl registry)."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    if path.startswith("file:"):
        return pafs.LocalFileSystem(), path[len("file:"):]
    return pafs.LocalFileSystem(), path


def _stream_copy(src: str, dst: str, chunk: int = 4 * 1024 * 1024) -> None:
    """Stream one file between (possibly different) filesystems in
    constant memory — bytes never enter a Spark row."""
    import posixpath

    src_fs, src_path = _fs_for(src)
    dst_fs, dst_path = _fs_for(dst)
    parent = posixpath.dirname(dst_path)
    if parent:
        dst_fs.create_dir(parent, recursive=True)
    with src_fs.open_input_stream(src_path) as r, dst_fs.open_output_stream(dst_path) as w:
        while True:
            buf = r.read(chunk)
            if not buf:
                break
            w.write(buf)


def _copy_listing(listing: DataFrame, dst_dir: str) -> int:
    """Execute a (rel, src) copy listing: streamed file-to-file copies
    inside executors (CopyMapper analogue) through the pyarrow
    filesystem layer — multi-GB files copy in constant memory, and
    src/dst may live on different filesystems (the cross-cluster /
    cluster-to-object-store DistCp shape)."""
    copied = listing.sparkSession.sparkContext.accumulator(0)

    def copy_partition(rows):
        import posixpath

        for row in rows:
            _stream_copy(row["src"], posixpath.join(dst_dir, row["rel"]))
            copied.add(1)

    listing.select("rel", "src").foreachPartition(copy_partition)
    return copied.value


def _dst_listing(spark: SparkSession, dst_dir: str) -> DataFrame | None:
    """(rel, _dst_length) listing of an -update destination, or None if
    it is empty/absent — so ``-update`` stays incremental
    cross-filesystem instead of silently degrading to a full recopy
    when ``os.path.isdir`` can't see the destination.

    Local directories and any URI whose scheme has Hadoop jars on the
    classpath use the DISTRIBUTED binaryFile metadata scan (the same
    scale-out listing as the source side — millions of destination
    files never materialize on the driver).  If the scheme can't be
    resolved by the file source, fall back to a driver-side pyarrow
    walk — bounded use only; at large destination counts deploy the
    scheme's Hadoop binding so the distributed path applies."""
    if dst_dir.startswith("file://"):
        dst_dir = dst_dir[len("file://"):] or "/"
    elif dst_dir.startswith("file:"):
        dst_dir = dst_dir[len("file:"):]
    if "://" not in dst_dir:
        if not (os.path.isdir(dst_dir) and any(os.scandir(dst_dir))):
            return None
        return _meta_listing(spark, dst_dir, dst_dir).select(
            "rel", F.col("length").alias("_dst_length")
        )
    try:
        return _meta_listing(spark, dst_dir, dst_dir).select(
            "rel", F.col("length").alias("_dst_length")
        )
    except Exception:
        return _dst_listing_pyarrow(spark, dst_dir)


def _dst_listing_pyarrow(spark: SparkSession, dst_dir: str) -> DataFrame | None:
    """Driver-side pyarrow fallback for :func:`_dst_listing` — bounded
    use: every FileInfo materializes on the driver, so it exists only
    for schemes the Spark file source can't resolve (no Hadoop jars)."""
    from pyarrow import fs as pafs

    fs, inner = _fs_for(dst_dir)
    infos = fs.get_file_info(pafs.FileSelector(inner, recursive=True, allow_not_found=True))
    base = inner.rstrip("/")
    rows = [
        (i.path[len(base) + 1 :], int(i.size))
        for i in infos
        if i.type == pafs.FileType.File
    ]
    if not rows:
        return None
    return spark.createDataFrame(rows, "rel string, _dst_length bigint")


def dist_copy(spark: SparkSession, src_glob: str, dst_dir: str, update: bool = False) -> int:
    """Parallel copy of files matching ``src_glob`` into ``dst_dir``,
    preserving paths relative to the glob base.  Returns number of
    files copied.  Listing and byte movement are both distributed;
    nothing is collected on the driver.  ``dst_dir`` may be a file:
    URI (normalized here) or any pyarrow-supported filesystem URI —
    bytes route through :func:`_fs_for` on executors; the -update
    re-listing of a non-local destination additionally needs the
    scheme's Hadoop jars for the metadata scan (same contract as
    DistCp's)."""
    if dst_dir.startswith("file://"):
        dst_dir = dst_dir[len("file://"):]
    elif dst_dir.startswith("file:"):
        dst_dir = dst_dir[len("file:"):]
    src = _meta_listing(spark, src_glob, _glob_base(src_glob))
    if update:
        dst = _dst_listing(spark, dst_dir)
        if dst is not None:
            # -update skip criterion: same relative path AND same size
            src = (
                src.join(dst, on="rel", how="left")
                .filter(F.col("_dst_length").isNull() | (F.col("_dst_length") != F.col("length")))
                .drop("_dst_length")
            )
    if "://" not in dst_dir:
        os.makedirs(dst_dir, exist_ok=True)
    return _copy_listing(src, dst_dir)


def dist_copy_sync(spark: SparkSession, src_glob: str, dst_dir: str, manifest_path: str) -> dict[str, int]:
    """Snapshot-diff incremental sync (DistCpSync analogue): diff the
    live source tree against the recorded manifest (the from-snapshot),
    copy only created/modified files, delete target files whose source
    vanished, then atomically re-record the manifest.  Returns
    ``{"copied": n, "deleted": m}``.  All diffing is in-plan joins over
    metadata DataFrames — no driver-side listing at any size."""
    src = _meta_listing(spark, src_glob, _glob_base(src_glob))
    os.makedirs(dst_dir, exist_ok=True)
    have_manifest = os.path.isdir(manifest_path)
    if have_manifest:
        old = spark.read.parquet(manifest_path).select(
            "rel", F.col("length").alias("_old_length"), F.col("mtime").alias("_old_mtime")
        )
        changed = (
            src.join(old, on="rel", how="left")
            .filter(
                F.col("_old_length").isNull()
                | (F.col("_old_length") != F.col("length"))
                | (F.col("_old_mtime") != F.col("mtime"))
            )
            .drop("_old_length", "_old_mtime")
        )
        deleted_listing = old.join(src.select("rel"), on="rel", how="left_anti").select("rel")
    else:
        changed = src
        deleted_listing = None
    copied = _copy_listing(changed, dst_dir)

    deleted = 0
    if deleted_listing is not None:
        del_acc = spark.sparkContext.accumulator(0)

        def delete_partition(rows):
            for row in rows:
                target = os.path.join(dst_dir, row["rel"])
                if os.path.exists(target):
                    os.remove(target)
                    del_acc.add(1)

        deleted_listing.foreachPartition(delete_partition)
        deleted = del_acc.value

    # new manifest = current source state (written last: a failed sync
    # re-runs against the old manifest, copies are idempotent)
    src.select("rel", "length", "mtime").write.mode("overwrite").parquet(manifest_path)
    return {"copied": copied, "deleted": deleted}


def archive_files(spark: SparkSession, src_glob: str, archive_path: str) -> None:
    """Pack small files into one indexed parquet archive (path, rel,
    size, mod_time, content) — the compaction that .har performed, with
    predicate-pushdown lookup by path replacing the .har index.  ``rel``
    (path relative to the glob base) is the restore destination, so
    equal basenames in different subdirs survive the roundtrip."""
    base = _glob_base(src_glob)
    prefix_len = len("file:" + base.rstrip(os.sep)) + 2
    files = spark.read.format("binaryFile").load(src_glob)
    files.select(
        "path",
        F.expr(f"substring(path, {prefix_len})").alias("rel"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("mod_time"),
        "content",
    ).write.mode("overwrite").parquet(archive_path)


def unarchive_files(spark: SparkSession, archive_path: str, dst_dir: str, path_filter: str | None = None) -> int:
    """Restore files from an archive (optionally a single path via
    pushdown-filtered lookup — the .har random-access role).  Restores
    to the archived relative path under ``dst_dir``."""
    arch = spark.read.parquet(archive_path)
    if path_filter:
        arch = arch.filter(F.col("path").rlike(path_filter))
    if dst_dir.startswith("file://"):
        dst_dir = dst_dir[len("file://"):]
    elif dst_dir.startswith("file:"):
        dst_dir = dst_dir[len("file:"):]
    if "://" not in dst_dir:
        os.makedirs(dst_dir, exist_ok=True)
    restored = spark.sparkContext.accumulator(0)

    def write_partition(rows):
        import posixpath

        for row in rows:
            dst_fs, dst = _fs_for(posixpath.join(dst_dir, row["rel"]))
            parent = posixpath.dirname(dst)
            if parent:
                dst_fs.create_dir(parent, recursive=True)
            with dst_fs.open_output_stream(dst) as f:
                f.write(bytes(row["content"]))
            restored.add(1)

    arch.select("rel", "content").foreachPartition(write_partition)
    return restored.value


_WORDLIST_SIZE = 1000


def random_kv(spark: SparkSession, num_rows: int, key_bytes: int = 10, value_bytes: int = 90, seed: int = 42) -> DataFrame:
    """RandomWriter: deterministic pseudo-random binary-ish KV records.
    Payloads derive from sha256 of the (seed, row-id) pair — no RNG
    state, identical on any cluster layout, and exactly reproducible in
    the DuckDB oracle (sha256 exists on both engines; the value tiles a
    64-hex digest up to ``value_bytes``)."""
    return spark.range(num_rows).select(
        F.substring(F.sha2(F.concat(F.lit(f"k{seed}:"), F.col("id").cast("string")), 256), 1, key_bytes).alias("key"),
        F.substring(
            F.repeat(F.sha2(F.concat(F.lit(f"v{seed}:"), F.col("id").cast("string")), 256), (value_bytes // 64) + 1),
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


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    num_buckets: int = 1024,
) -> DataFrame:
    """Row-level table reconciliation — DistCpSync's snapshot-diff
    (hadoop-tools/hadoop-distcp/.../DistCpSync.java:1) brought to row
    granularity, the way a 100 TB pipeline audits a replica against
    its source without shipping either table.

    Phase 1 (cheap, always runs): each side reduces to ``num_buckets``
    digests — rows bucket by key hash, and a bucket's digest is the
    bit_xor of its row digests (xxhash64 over key + compare columns),
    so the digest is order-independent, constant-size, and computed
    with map-side partial aggregation (shuffle volume = buckets x
    partitions, independent of row count).  Equal-digest buckets are
    certified equal and PRUNED — for mostly-identical tables that
    eliminates almost all row movement.  (XOR digests collide when a
    bucket's symmetric difference xors to zero — ~2^-64 per bucket;
    the acceptable-audit trade, same class as DistCp's size+checksum
    skip criterion.)

    Phase 2 touches only rows whose bucket mismatched: both sides are
    filtered by a broadcast of the (small) mismatched-bucket list,
    then a full outer join on the keys classifies each row as
    ``added`` (only in b), ``removed`` (only in a), or ``changed``
    (both, differing compare columns).  Returns (key_cols...,
    diff_status)."""
    all_cols = key_cols + compare_cols
    # xxhash64 silently SKIPS null arguments, so a bare multi-arg hash
    # would give identical digests to rows whose values swap between
    # columns via a null swap (a=(k,'v',NULL) vs b=(k,NULL,'v')) — a
    # systematic false negative, not the ~2^-64 collision.  Make null
    # position digest-relevant: every column contributes a non-null
    # (value, is-null) pair.
    digest_args = ", ".join(
        f"coalesce(cast({c} as string), ''), cast({c} is null as int)" for c in all_cols
    )
    row_digest = F.expr(f"xxhash64({digest_args})")
    bucket = F.expr(
        # & mask (not abs): abs(Long.MIN_VALUE) is still negative, and a
        # negative bucket would silently never match the mismatch list
        "(xxhash64(" + ", ".join(f"cast({c} as string)" for c in key_cols) + f") & 1152921504606846975) % {num_buckets}"
    )

    def digests(df: DataFrame) -> DataFrame:
        return (
            df.select(bucket.alias("bucket"), row_digest.alias("_d"))
            .groupBy("bucket")
            .agg(F.expr("bit_xor(_d)").alias("digest"), F.count(F.lit(1)).alias("n"))
        )

    da, db = digests(a), digests(b)
    mismatched = (
        da.join(db, "bucket", "full_outer")
        .filter(
            ~(da["digest"].eqNullSafe(db["digest"]) & da["n"].eqNullSafe(db["n"]))
        )
        .select("bucket")
    )

    def pruned(df: DataFrame) -> DataFrame:
        return df.withColumn("_bucket", bucket).join(
            F.broadcast(mismatched), F.col("_bucket") == mismatched["bucket"], "left_semi"
        )

    pa = pruned(a).select(*[F.col(c).alias(f"_a_{c}") for c in all_cols])
    pb = pruned(b).select(*[F.col(c).alias(f"_b_{c}") for c in all_cols])
    cond = [pa[f"_a_{c}"].eqNullSafe(pb[f"_b_{c}"]) for c in key_cols]
    joined = pa.join(pb, cond, "full_outer")
    a_key, b_key = f"_a_{key_cols[0]}", f"_b_{key_cols[0]}"
    same_payload = F.lit(True)
    for c in compare_cols:
        same_payload = same_payload & joined[f"_a_{c}"].eqNullSafe(joined[f"_b_{c}"])
    status = (
        F.when(joined[a_key].isNull(), F.lit("added"))
        .when(joined[b_key].isNull(), F.lit("removed"))
        .when(~same_payload, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(joined[f"_a_{c}"], joined[f"_b_{c}"]).alias(c) for c in key_cols
    ]
    return joined.select(*out_keys, status.alias("diff_status")).filter(
        F.col("diff_status").isNotNull()
    )
