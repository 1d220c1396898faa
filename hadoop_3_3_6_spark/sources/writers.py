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


def multiple_outputs(
    df: DataFrame,
    path: str,
    route_col,
    fmt: str = "parquet",
    route_name: str = "route",
) -> None:
    """MultipleOutputs: per-record routing to named outputs — a
    partitioned write; each distinct route value becomes
    ``{path}/{route}={v}/``.  Single pass, no per-route job.

    ``route_col`` may be a column NAME, any Column EXPRESSION, or a
    LIST of either — the reference's per-record arbitrary
    ``baseOutputPath`` (MRC/mapreduce/lib/output/MultipleOutputs.java:
    474, write(k, v, baseOutputPath)) is a record-derived route string,
    so an expression computing each path segment routes records to
    fully dynamic destinations while staying ONE distributed
    partitioned write; a list of route expressions yields nested
    directories (``{path}/route=a/route_1=b/...``), the analogue of a
    multi-segment baseOutputPath.  (Partition values are escaped by the
    writer, so a '/' inside one route VALUE does not nest — use a
    second route expression for that.)  Expression routes materialize
    as ``route_name`` (suffixed ``_1``, ``_2``, ... beyond the first)
    and the data columns are unchanged."""
    routes = route_col if isinstance(route_col, (list, tuple)) else [route_col]
    names: list[str] = []
    for i, r in enumerate(routes):
        if isinstance(r, str):
            names.append(r)
            continue
        name = route_name if i == 0 else f"{route_name}_{i}"
        if name in df.columns:
            raise ValueError(f"route_name {name!r} collides with a data column")
        df = df.withColumn(name, r)
        names.append(name)
    writer = df.write.mode("overwrite").partitionBy(*names)
    getattr(writer, fmt)(path)


def zorder_expr(col_a: str, col_b: str, bits: int = 16) -> F.Column:
    """Morton/Z-order value of two non-negative integer columns: the
    low ``bits`` of each, bit-interleaved (a in even positions, b in
    odd).  Pure bitwise higher-order expression, no UDF."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, i) -> "
        f"acc + shiftleft(cast(shiftright(cast({col_a} as bigint), i) & 1 as bigint), 2 * i) "
        f"    + shiftleft(cast(shiftright(cast({col_b} as bigint), i) & 1 as bigint), 2 * i + 1))"
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, bits: int = 12, num_files: int = 8
) -> None:
    """Z-order-clustered parquet write — the lakehouse OPTIMIZE ZORDER
    analogue for multi-dimensional data skipping: rows are range-
    partitioned and sorted by the Morton value of (col_a, col_b), so
    each output file/row-group covers a small rectangle in both
    dimensions at once and parquet min/max stats prune scans filtered
    on EITHER column.  A single-column sort gives perfect pruning on
    one key and none on the other; Z-order trades a little of each
    for skipping on both — the standard layout move when a 100 TB
    table serves two access paths.

    Both dimensions are min/max-normalized to the same ``bits``-wide
    space IN-PLAN (1-row stats broadcast) before interleaving —
    without this, a wider-ranged column's high bits dominate the
    curve and the narrower column gets no clustering at all.  Cost is
    one extra stats aggregate + one range shuffle + in-partition sort
    (same as a total-order sort)."""
    scale = (1 << bits) - 1
    stats = df.agg(
        F.min(col_a).alias("_amin"),
        F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"),
        F.max(col_b).alias("_bmax"),
    )
    norm_a = (
        f"cast(cast(({col_a} - _amin) as double) * {scale} / greatest(_amax - _amin, 1) as bigint)"
    )
    norm_b = (
        f"cast(cast(({col_b} - _bmin) as double) * {scale} / greatest(_bmax - _bmin, 1) as bigint)"
    )
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_na", F.expr(norm_a))
        .withColumn("_nb", F.expr(norm_b))
        .withColumn("_z", zorder_expr("_na", "_nb", bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_na", "_nb", "_amin", "_amax", "_bmin", "_bmax")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bloom_indexed(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    expected_ndv: int | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """BloomMapFile analogue (hadoop-common .../io/BloomMapFile.java:53
    — MapFile plus a per-file bloom filter so a missing key skips the
    index seek entirely): a parquet write with ROW-GROUP BLOOM FILTERS
    on ``bloom_cols`` (parquet-mr's ``parquet.bloom.filter.enabled#col``
    options ride the writer job's Hadoop conf), optionally sorted so
    min/max stats prune ranges and the bloom prunes point probes that
    fall inside a range.

    At 100 TB the read path is: partition/bucket pruning → row-group
    min/max → row-group bloom — a point lookup on a miss touches
    footers only, the exact skip BloomMapFile bought.  ``expected_ndv``
    sizes the filter (parquet.bloom.filter.expected.ndv#col); the
    default dynamic sizing is fine when cardinality per row group is
    unknown."""
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    writer = df.write.mode("overwrite")
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if expected_ndv is not None:
            writer = writer.option(f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv))
    writer.parquet(path)


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


def compact_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict[str, int]:
    """Small-files compaction — the maintenance op
    ``storage_file_profile`` plans for: rewrite a table directory so
    each output file is ~``target_file_bytes``.  At 100 TB, scan
    parallelism and listing cost are governed by file count/balance; a
    streaming or per-batch sink leaving thousands of KB-sized parts
    degrades both (the reference's answer was HAR archiving —
    hadoop-tools/.../HadoopArchives.java:1 — which packs but cannot be
    rewritten; this rewrites to first-class files).

    The byte-size listing is driver-side metadata (like every file
    source's InMemoryFileIndex); the DATA moves executor-side through
    a round-robin repartition to ceil(total/target) files.  The
    rewrite lands in a sibling temp dir then swaps in via two renames.
    Crash recovery: a crash before the first rename leaves the
    original untouched (the temp dir is simply garbage); a crash
    between the renames leaves the data at ``<path>.compact.old`` and
    the completed rewrite at ``<path>.compact.tmp`` — the next call
    (or a reader finding ``path`` missing) restores ``.old`` back to
    ``path`` first.  Stale ``.tmp``/``.old`` dirs from crashed runs
    are cleaned up or restored on entry, so compaction never wedges.
    Returns {files_before, files_after, bytes}."""
    import os
    import shutil

    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    if os.path.isdir(old):
        if os.path.isdir(path):
            shutil.rmtree(old)  # previous run completed the swap; .old is garbage
        else:
            os.rename(old, path)  # previous run crashed mid-swap; restore
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)  # incomplete rewrite from a crashed run

    names = [n for n in os.listdir(path) if n.startswith("part-")]
    total = sum(os.path.getsize(os.path.join(path, n)) for n in names)
    n_out = max(1, -(-total // target_file_bytes))
    df = getattr(spark.read, fmt)(path)
    getattr(df.repartition(int(n_out)).write.mode("overwrite"), fmt)(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"files_before": len(names), "files_after": int(n_out), "bytes": int(total)}
