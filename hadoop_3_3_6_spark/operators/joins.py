"""Join operators (SURVEY.md §2.4).

Reference parity targets (paths under /root/reference/):

- CompositeInputFormat map-side join DSL ``inner(...)/outer(...)/
  override(...)``  MRC/mapreduce/lib/join/CompositeInputFormat.java:55-80
- InnerJoinRecordReader.java:34 (all sources have the key),
  OuterJoinRecordReader.java:34 (any source has the key),
  OverrideRecordReader.java:42-56 (rightmost source wins per key)
- reduce-side tagged join  hadoop-tools/hadoop-datajoin/src/main/java/
  org/apache/hadoop/contrib/utils/join/DataJoinReducerBase.java:92-214

Scale notes: the N-way equi-join compiles to chained DataFrame joins,
so Catalyst is free to broadcast small sides (reference dims like
region/nation) and AQE re-plans skew at runtime.  The reference's
shuffle-free property (pre-sorted co-partitioned dirs) corresponds to
bucketed tables (``bucketBy(n, key).sortBy(key)``) — with bucketed
inputs Catalyst elides both exchanges and sorts in the SMJ.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def composite_join(dfs: list[DataFrame], on: str | list[str], how: str = "inner") -> DataFrame:
    """N-way equi-join on a shared key — the ``inner(...)``/``outer(...)``
    forms of the join DSL (CompositeInputFormat.java:69-80).

    ``how="inner"``  -> emit only keys present in every source
                        (InnerJoinRecordReader.combine :45)
    ``how="outer"``  -> emit keys present in any source, absent slots
                        null (OuterJoinRecordReader.combine :45) —
                        chained full_outer joins.
    Also accepts any Spark join type (left/right/semi/anti) as the
    idiomatic extension (§2.4 "semi/anti" note).
    """
    spark_how = {"inner": "inner", "outer": "full_outer"}.get(how, how)
    keys = [on] if isinstance(on, str) else list(on)

    def join2(left: DataFrame, right: DataFrame) -> DataFrame:
        return left.join(right, on=keys, how=spark_how)

    return reduce(join2, dfs)


def override_join(dfs: list[DataFrame], on: str | list[str]) -> DataFrame:
    """``override(...)`` join: per key, the value columns come from the
    RIGHTMOST source that has the key (OverrideRecordReader.emit :56) —
    a prioritized coalesce across N per-key snapshots.

    Implemented as chained full_outer joins with per-column
    ``coalesce(right, left)``.  All frames must share one schema.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = [c for c in dfs[0].columns if c not in keys]

    def override2(left: DataFrame, right: DataFrame) -> DataFrame:
        l, r = left.alias("l"), right.alias("r")
        joined = l.join(r, on=[F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}")) for k in keys], how="full_outer")
        sel = [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys]
        sel += [F.coalesce(F.col(f"r.{c}"), F.col(f"l.{c}")).alias(c) for c in value_cols]
        return joined.select(*sel)

    return reduce(override2, dfs)


def tagged_join(dfs: dict[str, DataFrame], on: str | list[str], how: str = "inner") -> DataFrame:
    """Reduce-side tagged join (hadoop-datajoin): each source's non-key
    columns are prefixed with its tag, then the sources are equi-joined
    — the flattened form of the reference's per-tag regroup +
    cross-product (DataJoinReducerBase.joinAndCollect :174-214; the
    cross product across tags IS the relational join result).
    """
    keys = [on] if isinstance(on, str) else list(on)
    tagged = []
    for tag, df in dfs.items():
        renames = [F.col(k) for k in keys] + [
            F.col(c).alias(f"{tag}_{c}") for c in df.columns if c not in keys
        ]
        tagged.append(df.select(*renames))
    return composite_join(tagged, on=keys, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks the latest right row of the same
    key with ``right_time <= left_time`` (``direction="backward"``, the
    default), the earliest with ``right_time >= left_time``
    (``direction="forward"``), or whichever of the two is closer in
    time (``direction="nearest"``, exact-microsecond deltas, ties →
    backward) — the three pandas ``merge_asof`` directions.  Left rows
    without a match keep nulls.  Nearest runs both directional scans
    over the SAME single hash(key) shuffle (two in-partition sorts, no
    second exchange, no self-join).

    Spark has no native ASOF JOIN; the naive form — range join then
    rank — expands to |left|x|right| pairs per key before the filter.
    This implementation is the linear, one-shuffle form: union both
    sides tagged, sort within key by (time, side) — time descending
    for forward, so "last seen" is the next row in event time — and
    carry the last-seen right values with ``last(ignorenulls)`` over
    an unbounded-preceding frame.  Each row is touched once; the only
    shuffle is hash(key); a hot key degrades to one sorted partition
    (salt upstream if a single key exceeds a partition).

    Ties are deterministic: right rows sort before left rows at equal
    time (inclusive semantics both directions); among equal-time right
    rows backward carries the MAX ``tiebreak_col``, forward the MIN.
    """
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward', or 'nearest', got {direction!r}"
        )
    tb = tiebreak_col or value_cols[0]
    key, t = "_asof_key", "_asof_t"
    carry_cols = list(value_cols) + ["_rt"]
    r = right.select(
        F.col(right_on).alias(key),
        F.col(right_time).alias(t),
        F.col(right_time).alias("_rt"),
        F.lit(1).alias("_is_right"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(f.dataType).alias(f"_l_{f.name}") for f in left.schema.fields],
    )
    l = left.select(
        F.col(left_on).alias(key),
        F.col(left_time).alias(t),
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(f.name).alias(f"_l_{f.name}") for f in left.schema.fields],
    )
    bwd_order = [F.col(t).asc(), F.col("_is_right").desc(), F.col(tb).asc_nulls_first()]
    fwd_order = [F.col(t).desc(), F.col("_is_right").desc(), F.col(tb).desc_nulls_first()]
    unioned = r.unionByName(l)

    def carried_over(order, prefix):
        w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        return [F.last(c, ignorenulls=True).over(w).alias(f"_{prefix}_{c}") for c in carry_cols]

    if direction in ("backward", "forward"):
        prefix = "b" if direction == "backward" else "f"
        order = bwd_order if direction == "backward" else fwd_order
        carried = unioned.select("*", *carried_over(order, prefix))
        picked = {c: F.col(f"_{prefix}_{c}") for c in value_cols}
    else:
        # nearest: both scans share the one hash(key) shuffle; per row
        # the smaller exact-microsecond delta wins, ties -> backward
        # (pandas merge_asof semantics).
        carried = unioned.select("*", *carried_over(bwd_order, "b"), *carried_over(fwd_order, "f"))
        micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        fwd_wins = (
            F.col("_b__rt").isNull()
            | (
                F.col("_f__rt").isNotNull()
                & ((micros(F.col("_f__rt")) - micros(F.col(t))) < (micros(F.col(t)) - micros(F.col("_b__rt"))))
            )
        )
        picked = {
            c: F.when(fwd_wins, F.col(f"_f_{c}")).otherwise(F.col(f"_b_{c}")) for c in value_cols
        }
    return carried.filter(F.col("_is_right") == 0).select(
        *[F.col(f"_l_{f.name}").alias(f.name) for f in left.schema.fields],
        *[picked[c].alias(f"asof_{c}") for c in value_cols],
    )


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Range (interval) join: each left row (a point in time) matched to
    right rows whose ``[start_col, end_col)`` interval contains it, with
    an equi-key on top.  Spark has no native range join; the naive
    encoding — equi-key plus two inequality predicates — still shuffles
    on the key alone and compares every key-group pair (quadratic in hot
    keys, or a BroadcastNestedLoopJoin with no key at all).

    The scale form is bucketing: quantize time into ``bucket_seconds``
    buckets, explode each interval to the buckets it covers, map each
    point to its single bucket, equi-join on (key, bucket), then apply
    the exact interval predicate as a post-filter.  The join is a plain
    hash/SMJ equi-join on a composite key (shuffle keyed by
    (key, bucket) — hot keys spread over their time range); each
    matching pair meets in exactly one bucket (the point's), so no
    dedup is needed.  Pick ``bucket_seconds`` ≈ typical interval length:
    an interval then explodes to ~2 rows, and filter selectivity per
    bucket stays high."""
    lb = left.withColumn(
        "_bucket", F.expr(f"floor(unix_timestamp({point_col}) / {bucket_seconds})")
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.expr(
                f"sequence(floor(unix_timestamp({start_col}) / {bucket_seconds}), "
                f"floor(unix_timestamp({end_col}) / {bucket_seconds}))"
            )
        ),
    )
    cond = [
        lb[left_on] == rb[right_on],
        lb["_bucket"] == rb["_bucket"],
        lb[point_col] >= rb[start_col].cast("timestamp"),
        lb[point_col] < rb[end_col].cast("timestamp"),
    ]
    return lb.join(rb, on=cond).drop("_bucket")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    on: str | list[str],
    tombstone_col: str | None = None,
    action_col: str | None = None,
) -> DataFrame:
    """MERGE INTO analogue (idiomatic extension; the copy-on-write CDC
    apply the reference expresses as a full identity-reduce re-write of
    the dataset):

    - WHEN MATCHED UPDATE: matched keys take every source column
      (columns absent from the source pass through from the target);
    - WHEN NOT MATCHED INSERT: source-only keys are appended;
    - WHEN MATCHED DELETE: if ``tombstone_col`` is given, matched
      source rows with that column true remove the target row.

    ``action_col`` (optional) emits 'update' / 'insert' / 'keep' per
    surviving row for observability.

    Scale shape: ONE full-outer equi-join on the merge key — each side
    shuffles once; Catalyst broadcasts the source when it is small (the
    common CDC-batch case) and AQE splits skewed keys.  Pair with a
    partitioned or bucketed rewrite sink for table maintenance; only
    key + changed columns travel from the source side.
    """
    keys = [on] if isinstance(on, str) else list(on)
    src = source.withColumn("_m", F.lit(1))
    joined = target.alias("t").join(src.alias("s"), on=keys, how="full_outer")
    matched = F.col("_m").isNotNull()
    if tombstone_col is not None:
        joined = joined.filter(~(matched & F.coalesce(F.col(f"s.{tombstone_col}"), F.lit(False))))
    out_cols = [F.col(k) for k in keys]
    src_cols = set(source.columns)
    for c in target.columns:
        if c in keys:
            continue
        if c in src_cols:
            out_cols.append(F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}"))
    if action_col is not None:
        in_target = F.col(f"t.{keys[0]}").isNotNull()
        out_cols.append(
            F.when(matched & in_target, F.lit("update"))
            .when(~in_target, F.lit("insert"))
            .otherwise(F.lit("keep"))
            .alias(action_col)
        )
    return joined.select(*out_cols)


def scd2_collapse(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD Type-2 history build (idiomatic extension; the warehouse
    temporal-dimension op MERGE feeds): collapse each key's
    attribute timeline into validity intervals — one row per
    consecutive run of an attribute value, with [valid_from, valid_to)
    bounds and an is_current flag on the open interval.

    Gaps-and-islands: a per-key ordered window flags changes
    (lag != current), a running sum numbers the runs, one aggregate
    collapses each run, and lead() over the runs closes the
    intervals.  Everything partitions by key, so state is bounded by
    one key's history and parallelism is key-cardinality wide; ties on
    ``ts_col`` break on ``tiebreak_col``, keeping versions
    deterministic across engines."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    prev = F.lag(attr_col).over(w)
    chg = F.when(prev.isNull() | (F.col(attr_col) != prev), 1).otherwise(0)
    flagged = df.withColumn("_chg", chg).withColumn(
        "_grp", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = flagged.groupBy(key_col, "_grp").agg(
        F.min(attr_col).alias(attr_col),  # constant within a run
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w2 = Window.partitionBy(key_col).orderBy("_grp")
    return runs.select(
        F.col(key_col),
        F.col("_grp").cast("int").alias("version"),
        F.col(attr_col),
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_rows",
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block_left,
    block_right,
    max_distance: int = 2,
    pair_filter=None,
    distinct_values: bool = True,
) -> DataFrame:
    """Blocked fuzzy (edit-distance) join — the record-linkage /
    approximate-match operator (the MapReduce-era pattern: a blocking
    MR job emitting (block_key, record) then a reducer comparing pairs
    within a block; same two-phase shape as the reference's
    reduce-side tagged join, hadoop-datajoin
    .../utils/join/DataJoinReducerBase.java:92).

    ``block_left`` / ``block_right`` are Column expressions computing
    the BLOCKING KEY (e.g. a prefix, a phonetic code, a length
    bucket): the join equi-matches on the block first, then keeps
    pairs with ``levenshtein(left_col, right_col) <= max_distance``.

    Scale shape: the blocking key turns an all-pairs O(N*M) comparison
    into a shuffle-by-block equi-join with pair work bounded by
    sum(|block_l| x |block_r|) — pick blocks so the hottest key stays
    small (the same skew discipline as every equi-join here; AQE
    skew-split applies).  Levenshtein evaluates JVM-side inside the
    join filter, no Python anywhere.

    ``pair_filter`` (optional Column over the joined columns, e.g.
    ``col("left_id") < col("right_id")`` for a self-join's pair dedup)
    is applied BEFORE the edit-distance computation, as is the exact
    length-difference bound (|len(a) - len(b)| > d implies
    levenshtein(a, b) > d); the distance itself uses the THRESHOLDED
    levenshtein (banded DP, O(d·n) per pair instead of O(n²), returns
    -1 above the threshold — exact for every kept pair).  Together
    these prune/shrink the per-pair DP cost, the dominant term,
    without changing the result (measured ~2x on the registered
    query).

    ``distinct_values`` (default True — the 100 TB posture): run the
    quadratic compare over DISTINCT (block, value) pairs only, then
    expand matches back to rows with two linear equi-joins.  Pair work
    drops from sum(|block_l| x |block_r|) ROWS to distinct VALUES —
    decisive on duplicate-heavy corpora, where repeated titles
    otherwise grow cliques and the row-level compare grows
    QUADRATICALLY in the duplication factor (the round-4 sf1 spotcheck
    measured 16.7x time at 10x rows with 2x title duplication; the
    distinct form restores linear scaling).  Results are identical:
    ``pair_filter`` references row-level columns, so it applies after
    the expansion in this mode.

    ``left_col`` and ``right_col`` must be DISTINCT names (alias one
    side): equal names make every post-join column reference ambiguous
    anyway, and silently falling back to the quadratic row path would
    betray the distinct_values promise — that case fails fast."""
    if left_col == right_col:
        raise ValueError(
            f"fuzzy_join requires distinct value-column names (both sides "
            f"are {left_col!r}); alias one side, e.g. withColumnRenamed"
        )
    l = left.withColumn("_blk", block_left)
    r = right.withColumn("_blk", block_right)
    len_bound = F.abs(F.length(F.col(left_col)) - F.length(F.col(right_col))) <= max_distance
    distance = F.levenshtein(F.col(left_col), F.col(right_col), max_distance)
    # The probe side of the compare join gets an EXPLICIT repartition on
    # the value column: the per-pair banded-DP compare is CPU-bound on
    # pairs but its input is tiny in BYTES, so AQE's size-based
    # coalescing otherwise folds the exchange to ~1 partition and the
    # whole compare serializes on one core (measured 26 s -> 2.6 s at
    # the sf1 registered query, 32 threads).  The key must differ from
    # the (_blk, value) ENSURE_REQUIREMENTS exchange above it —
    # repartitioning on the same keys collapses into that exchange and
    # re-exposes it to coalescing; the explicit numPartitions
    # (REPARTITION_BY_NUM) is what AQE contracts not to coalesce.  Cost
    # at scale: one extra pass over the distinct values, bounded by the
    # distinct shuffle the plan already pays; at 100 TB the join
    # typically exceeds the broadcast threshold and SMJ's own exchange
    # takes over — AQE skew-split then handles hot blocks.
    par = left.sparkSession.sparkContext.defaultParallelism
    if distinct_values:
        dl = l.select("_blk", left_col).distinct().repartition(par, F.col(left_col))
        dr = r.select("_blk", right_col).distinct()
        cand = (
            dl.join(dr, "_blk")
            .filter(len_bound)
            .withColumn("edit_distance", distance)
            .filter(F.col("edit_distance") >= 0)
        )
        out = l.join(cand, ["_blk", left_col]).join(r, ["_blk", right_col])
        if pair_filter is not None:
            out = out.filter(pair_filter)
        return out.drop("_blk")
    pairs = l.repartition(par, F.col(left_col)).join(r, "_blk")
    if pair_filter is not None:
        pairs = pairs.filter(pair_filter)
    pairs = pairs.filter(len_bound).withColumn("edit_distance", distance)
    return pairs.filter(F.col("edit_distance") >= 0).drop("_blk")
