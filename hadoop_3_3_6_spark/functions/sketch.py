"""Frequency / membership sketches for scale-out pre-filtering
(north-star extension; SURVEY.md §7.2 M6 sketch tier).

Two deterministic sketches built on the portable 60-bit md5 hash ring
(functions.dedup.portable_hash_expr), complementing the approximate
tier (HLL++/approx quantiles/approx_top_k, plans/queries.py):

- count-min sketch: a depth × width grid of counters; the estimate for
  a key is the MIN over its depth cells — always >= the true count,
  with collision error bounded by the width.  The sketch is a FIXED
  depth*width cells no matter the input size, so it broadcasts for
  free — the 100 TB shape for "rough frequency of everything" without
  a full groupBy of the hot key space.  (Reference analogue: the
  aggregate framework's ValueHistogram / UniqValueCount descriptor
  tier, MRC/lib/aggregate/ValueHistogram.java:36 — bounded-memory
  per-key summaries; CMS is the bounded-SKETCH generalization.)
- bloom filter: k bit positions per key in an m-bit mask, aggregated
  IN-PLAN to one array<bigint> word row and broadcast; the probe side
  is then a pure filter expression (k element_at lookups per row — no
  join, no shuffle of the probe table).  This is the explicit form of
  the runtime row-level filtering Spark's own
  spark.sql.optimizer.runtime.bloomFilter applies to shuffle joins
  (public conf), with portable hashing so false positives are
  engine-reproducible and the whole pipeline gets an EXACT oracle.

Unlike a real deployment (xxhash64, Spark's BloomFilterAggregate),
everything here defaults to the portable ring so DuckDB computes
bit-identical sketches; the hash is swappable per call site.  All
expressions are built-in Column/HOF code — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_3_3_6_spark.functions.dedup import portable_hash_expr


def _cell_hash(key_expr: str, row_expr: str, salt: str) -> str:
    """Portable hash of (salt, row index, key) — one independent hash
    function per sketch row, derived by salting a single base hash
    (the standard Kirsch-Mitzenmacher-style construction, done here by
    prefixing the row index into the hashed string)."""
    salted = f"concat('{salt}', cast({row_expr} as string), ':', cast({key_expr} as string))"
    return portable_hash_expr(salted)


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build a count-min sketch over ``key_col``: returns the non-empty
    cells as (r, bucket, cnt) with r in [0, depth) and bucket in
    [0, width).

    Plan shape: each input row fans out to ``depth`` (r, bucket) pairs
    via an inline sequence (narrow), then ONE hash aggregation.
    Map-side partial aggregation collapses every partition to at most
    depth*width cells before the shuffle, so shuffle volume is bounded
    by the sketch size times the partition count — independent of the
    input row count.  The result is at most depth*width rows:
    broadcastable by construction."""
    pairs = df.select(
        F.expr(f"explode(sequence(0, {depth - 1})) as r",),
        F.col(key_col).alias("_k"),
    ).select(
        "r",
        F.expr(f"{_cell_hash('_k', 'r', salt)} % {width}").alias("bucket"),
    )
    return pairs.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` against a sketch built
    by :func:`count_min_sketch` (same depth/width/salt).  Returns
    (key_col, cms_est).

    The sketch is broadcast (<= depth*width rows); each probe key fans
    out to its depth cells, left-joins the sketch (a missing cell means
    a 0 counter), and takes the MIN — so the probe table never
    shuffles beyond the final per-key min aggregation over depth rows."""
    probes = keys.select(F.col(key_col)).distinct().select(
        F.col(key_col),
        F.expr(f"explode(sequence(0, {depth - 1})) as r"),
    ).select(
        key_col,
        "r",
        F.expr(f"{_cell_hash(key_col, 'r', salt)} % {width}").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def bloom_positions_expr(key_expr: str, num_bits: int, num_hashes: int, salt: str = "bloom") -> str:
    """Array of the ``num_hashes`` bit positions for a key (SQL expr)."""
    return (
        f"transform(sequence(0, {num_hashes - 1}), "
        f"h -> {_cell_hash(key_expr, 'h', salt)} % {num_bits})"
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 2048,
    num_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Aggregate the build side's bloom bitmask IN-PLAN: one row with
    ``bloom`` = array<bigint> of ceil(num_bits/64) words.  No driver
    collect — the mask row is produced by an aggregation and meant to
    be cross-joined (broadcast) into the probe plan, mirroring how
    Spark's runtime bloom filter rides the exchange."""
    words = (num_bits + 63) // 64
    pos = df.select(
        F.explode(F.expr(bloom_positions_expr(key_col, num_bits, num_hashes, salt))).alias("p")
    ).distinct()
    # Fold the (<= num_bits) distinct positions into the word array.
    return pos.agg(
        F.expr(
            f"aggregate(collect_list(p), array_repeat(0L, {words}), "
            f"(acc, x) -> transform(acc, (w, i) -> "
            f"case when i = cast(x / 64 as int) then w | shiftleft(1L, cast(x % 64 as int)) else w end))"
        ).alias("bloom")
    )


def bloom_might_contain(key_expr: str, num_bits: int, num_hashes: int, salt: str = "bloom") -> Column:
    """Membership test against a ``bloom`` word-array column (from
    :func:`bloom_build`, available via cross-joined broadcast): true
    iff ALL k positions are set.  Pure expression — k element_at bit
    probes per row, no join, so the probe table is filtered in place
    inside whatever scan stage it already runs."""
    probe = (
        f"forall({bloom_positions_expr(key_expr, num_bits, num_hashes, salt)}, "
        f"p -> (shiftright(element_at(bloom, cast(p / 64 as int) + 1), cast(p % 64 as int)) & 1) = 1)"
    )
    return F.expr(probe)


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    build: DataFrame,
    build_key_col: str,
    num_bits: int = 2048,
    num_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Filter ``probe`` down to rows whose key MIGHT be in ``build``
    (no false negatives; false-positive rate set by num_bits/num_hashes
    vs the build cardinality).  The 100 TB join pattern: run this
    before a shuffle join whose build side is too big to broadcast but
    whose KEY SET sketches into num_bits — the probe side drops
    non-matching rows at the scan, shrinking the shuffle by the join's
    selectivity."""
    mask = bloom_build(build, build_key_col, num_bits, num_hashes, salt)
    return probe.crossJoin(F.broadcast(mask)).filter(
        bloom_might_contain(key_col, num_bits, num_hashes, salt)
    ).drop("bloom")


def oracle_cell_hash_sql(key_sql: str, row_sql: str, salt: str) -> str:
    """DuckDB mirror of :func:`_cell_hash` (same md5 ring)."""
    salted = f"concat('{salt}', cast({row_sql} as varchar), ':', cast({key_sql} as varchar))"
    return f"(('0x' || substr(md5({salted}), 1, 15))::BIGINT)"
