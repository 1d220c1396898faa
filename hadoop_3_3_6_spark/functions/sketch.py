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
  is then a pure filter expression (k bit probes per row — no join,
  no shuffle of the probe table).  This is the explicit form of the
  runtime row-level filtering Spark's own
  spark.sql.optimizer.runtime.bloomFilter applies to shuffle joins
  (public conf), with portable hashing so false positives are
  engine-reproducible and the whole pipeline gets an EXACT oracle.

Both use the Kirsch–Mitzenmacher double-hashing construction: ONE base
hash per key, split into (h1, h2) halves, with the i-th hash function
h1 + i*h2.  That matters for the portable ring — md5 measured ~13x the
cost of xxhash64 per evaluation (string concat + hex + base conversion),
so computing k independent md5s per probe row dominated the whole
query; KM pays for one.  ``portable=False`` flips the base hash to
xxhash64 for the 100 TB path (same plan shape, no cross-engine oracle).
All expressions are built-in Column/HOF code — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_3_3_6_spark.functions.dedup import portable_hash_expr

#: low 30 bits / high 30 bits of the 60-bit base hash feed the
#: Kirsch–Mitzenmacher pair (h2 forced odd so it never degenerates).
_H1_MASK = (1 << 30) - 1


def _base_hash(key_expr: str, salt: str, portable: bool) -> str:
    salted = f"concat('{salt}:', cast({key_expr} as string))"
    if portable:
        return portable_hash_expr(salted)
    # xxhash64 can be negative (and abs(Long.MIN_VALUE) is still
    # negative); mask into the non-negative 60-bit range so the %
    # positions stay non-negative like the portable ring's.
    return f"(xxhash64({salted}) & {(1 << 60) - 1})"


def _km_pos(h_expr: str, i_expr: str, modulus: int) -> str:
    """Position of the i-th KM hash function: (h1 + i*h2) % modulus,
    h1/h2 the low/high halves of the base hash (h2 | 1 keeps the step
    odd, so distinct i give distinct position sequences)."""
    return (
        f"((({h_expr} & {_H1_MASK}) + ({i_expr}) * ((({h_expr} >> 30) & {_H1_MASK}) | 1)) "
        f"% {modulus})"
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
    portable: bool = True,
) -> DataFrame:
    """Build a count-min sketch over ``key_col``: returns the non-empty
    cells as (r, bucket, cnt) with r in [0, depth) and bucket in
    [0, width).

    Plan shape: one base hash per input row, fanned out to ``depth``
    (r, bucket) pairs via an inline sequence (narrow), then ONE hash
    aggregation.  Map-side partial aggregation collapses every
    partition to at most depth*width cells before the shuffle, so
    shuffle volume is bounded by the sketch size times the partition
    count — independent of the input row count.  The result is at most
    depth*width rows: broadcastable by construction."""
    pairs = (
        df.select(F.expr(_base_hash(key_col, salt, portable)).alias("_h"))
        .select("_h", F.expr(f"explode(sequence(0, {depth - 1})) as r"))
        .select("r", F.expr(_km_pos("_h", "r", width)).alias("bucket"))
    )
    return pairs.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
    portable: bool = True,
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` against a sketch built
    by :func:`count_min_sketch` (same depth/width/salt/hash).  Returns
    (key_col, cms_est).

    The sketch is broadcast (<= depth*width rows); each probe key fans
    out to its depth cells, left-joins the sketch (a missing cell means
    a 0 counter), and takes the MIN — so the probe table never
    shuffles beyond the final per-key min aggregation over depth rows."""
    probes = (
        keys.select(F.col(key_col))
        .distinct()
        .select(key_col, F.expr(_base_hash(key_col, salt, portable)).alias("_h"))
        .select(key_col, "_h", F.expr(f"explode(sequence(0, {depth - 1})) as r"))
        .select(key_col, "r", F.expr(_km_pos("_h", "r", width)).alias("bucket"))
    )
    return (
        probes.join(F.broadcast(cms), ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 2048,
    num_hashes: int = 3,
    salt: str = "bloom",
    portable: bool = True,
) -> DataFrame:
    """Aggregate the build side's bloom bitmask IN-PLAN: one row with
    ``bloom`` = array<bigint> of ceil(num_bits/64) words.  No driver
    collect — the mask row is produced by an aggregation and meant to
    be cross-joined (broadcast) into the probe plan, mirroring how
    Spark's runtime bloom filter rides the exchange."""
    words = (num_bits + 63) // 64
    pos = (
        df.select(F.expr(_base_hash(key_col, salt, portable)).alias("_h"))
        .select(F.expr(f"explode(sequence(0, {num_hashes - 1})) as i"), "_h")
        .select(F.expr(_km_pos("_h", "i", num_bits)).alias("p"))
        .distinct()
    )
    # Fold the (<= num_bits) distinct positions into the word array.
    return pos.agg(
        F.expr(
            f"aggregate(collect_list(p), array_repeat(0L, {words}), "
            f"(acc, x) -> transform(acc, (w, i) -> "
            f"case when i = cast(x / 64 as int) then w | shiftleft(1L, cast(x % 64 as int)) else w end))"
        ).alias("bloom")
    )


def bloom_might_contain(
    key_expr: str,
    num_bits: int,
    num_hashes: int,
    salt: str = "bloom",
    portable: bool = True,
    h_expr: str | None = None,
    mask_col: str = "bloom",
) -> Column:
    """Membership test against a ``bloom`` word-array column (from
    :func:`bloom_build`, available via cross-joined broadcast): true
    iff ALL k positions are set.  Pure expression — k bit probes per
    row off ONE base hash, no join, so the probe table is filtered in
    place inside whatever scan stage it already runs.

    The probes are UNROLLED into ANDed scalar predicates rather than a
    forall(transform(...)) fold: higher-order functions are interpreted
    (no whole-stage codegen) and measured ~4x slower on a 600k-row
    probe.  Pass ``h_expr`` (e.g. a projected column holding the base
    hash) to pin single evaluation of the hash; otherwise codegen
    subexpression elimination is relied on to collapse the repeats."""
    h = h_expr or _base_hash(key_expr, salt, portable)
    probes = []
    for i in range(num_hashes):
        pos = _km_pos(h, str(i), num_bits)
        probes.append(
            f"((shiftright(element_at({mask_col}, cast({pos} / 64 as int) + 1), "
            f"cast({pos} % 64 as int)) & 1) = 1)"
        )
    return F.expr(" AND ".join(probes))


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    build: DataFrame,
    build_key_col: str,
    num_bits: int = 2048,
    num_hashes: int = 3,
    salt: str = "bloom",
    portable: bool = True,
) -> DataFrame:
    """Filter ``probe`` down to rows whose key MIGHT be in ``build``
    (no false negatives; false-positive rate set by num_bits/num_hashes
    vs the build cardinality).  The 100 TB join pattern: run this
    before a shuffle join whose build side is too big to broadcast but
    whose KEY SET sketches into num_bits — the probe side drops
    non-matching rows at the scan, shrinking the shuffle by the join's
    selectivity.

    Plan care: the base hash is projected once per row (``_bh``)
    BEFORE the mask joins in, so it evaluates inside the probe scan's
    WholeStageCodegen span and reaches the (interpreted) broadcast
    join condition as a plain attribute.  Filtering after a crossJoin
    of the 1-row mask lets the optimizer inline the bit probes into
    the BroadcastNestedLoopJoin condition — that's fine for the cheap
    shift/mask arithmetic, but without the pre-projected ``_bh`` it
    re-derives the md5 base hash per conjunct (6 interpreted md5s per
    probe row — measured ~3x slower).

    Working columns use a reserved ``__bloom_*`` prefix so a probe
    table that legitimately has a ``bloom`` or ``_bh`` column passes
    through untouched; only the (pathological) reserved names
    themselves are rejected."""
    clash = {"__bloom_mask", "__bloom_bh"} & set(probe.columns)
    if clash:
        raise ValueError(f"probe columns collide with bloom_prefilter internals: {sorted(clash)}")
    from hadoop_3_3_6_spark.functions.text import spread_for_compute

    # the per-row base hash (portable mode: an interpreted md5 ring) is
    # CPU-bound and narrow — rebalance an under-split probe scan to
    # full width (r13: 2.01 → 1.33 s on the sf0.1 lineitem probe).  At
    # real scale the gate is false, preserving the operator's point:
    # rows drop at the SCAN, before any exchange.
    probe = spread_for_compute(probe, key_col)
    mask = bloom_build(build, build_key_col, num_bits, num_hashes, salt, portable).select(
        F.col("bloom").alias("__bloom_mask")
    )
    return (
        probe.withColumn("__bloom_bh", F.expr(_base_hash(key_col, salt, portable)))
        .crossJoin(F.broadcast(mask))
        .filter(
            bloom_might_contain(
                key_col, num_bits, num_hashes, salt, portable,
                h_expr="__bloom_bh", mask_col="__bloom_mask",
            )
        )
        .drop("__bloom_mask", "__bloom_bh")
    )


def oracle_base_hash_sql(key_sql: str, salt: str) -> str:
    """DuckDB mirror of the portable base hash."""
    salted = f"concat('{salt}:', cast({key_sql} as varchar))"
    return f"(('0x' || substr(md5({salted}), 1, 15))::BIGINT)"


def oracle_km_pos_sql(h_sql: str, i_sql: str, modulus: int) -> str:
    """DuckDB mirror of :func:`_km_pos` (same &, >>, | semantics)."""
    return (
        f"((({h_sql} & {_H1_MASK}) + ({i_sql}) * ((({h_sql} >> 30) & {_H1_MASK}) | 1)) "
        f"% {modulus})"
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    p: int = 8,
    salt: str = "hll",
    portable: bool = True,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register build: per group (optional) and bucket in
    [0, 2^p), the max rank = 1 + leading zeros of the base hash's
    suffix — the MERGEABLE state of the cardinality sketch (merge =
    max per bucket, :func:`hll_merge`), which is what a 100 TB
    pipeline stores per partition/day and folds WITHOUT rescanning.
    Spark's own approx_count_distinct is the fused form of this; the
    explicit registers exist for cross-run/cross-source merge and for
    engine-reproducibility (rank uses integer bit-length via bin(),
    never floating log2, so DuckDB mirrors it bit-for-bit).

    Output: (group_cols..., bucket, register); empty buckets are
    absent (a consumer treats missing as register 0).  At most
    groups * 2^p rows — broadcastable by construction."""
    group_cols = group_cols or []
    m = 1 << p
    max_rank = 61 - p  # 60-bit hash: (60-p)-bit suffix, rank in [1, 61-p]
    h = _base_hash(key_col, salt, portable)
    w = f"({h} >> {p})"
    rank = f"(case when {w} = 0 then {max_rank} else {max_rank} - length(bin({w})) end)"
    rows = df.select(
        *group_cols,
        F.expr(f"({h} & {m - 1})").alias("bucket"),
        F.expr(rank).cast("int").alias("_rank"),
    )
    return rows.groupBy(*group_cols, "bucket").agg(F.max("_rank").alias("register"))


def hll_merge(regs: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge HLL register sets (max per bucket) — union of the sketched
    multisets.  ``group_cols`` keeps per-group sketches; [] folds
    everything into one."""
    group_cols = group_cols or []
    return regs.groupBy(*group_cols, "bucket").agg(F.max("register").alias("register"))


def hll_estimate(registers: dict[int, int], p: int = 8) -> float:
    """Finish the cardinality estimate from a collected register dict
    (raw HLL harmonic mean + small-range linear counting).  Driver-side
    math over 2^p integers — NOT part of any query plan; exposed so
    tests/consumers can turn register state into a number.

    Alpha follows the published table (Flajolet et al. 2007 §4 /
    Heule et al. 2013): fixed constants for m in {16, 32, 64} and the
    asymptotic 0.7213/(1 + 1.079/m) only from m >= 128 — applying the
    asymptotic form at small m biases the raw estimate up to ~4%
    (round-9 semantic-review fix; the registered query uses p=8 where
    the two forms coincide, so driver verdicts are unaffected)."""
    import math

    if p < 4:
        raise ValueError(f"p must be >= 4 (m >= 16) for the published alpha table; got {p}")
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    s = sum(2.0 ** -registers.get(b, 0) for b in range(m))
    est = alpha * m * m / s
    zeros = m - len([b for b in registers if registers.get(b, 0) > 0])
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est
