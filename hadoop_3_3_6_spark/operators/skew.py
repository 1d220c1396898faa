"""Skew mitigation (SURVEY.md §7.4 "100 TB posture").

The reference's answer to hot keys was "write a custom Partitioner"
(MRC/mapreduce/Partitioner.java:45); at 100 TB a single hot key still
lands on one reducer.  Two standard remedies, both pure DataFrame:

- ``salted_aggregate``: two-stage aggregation — partial agg on
  (key, salt) spreads a hot key over N tasks, then the tiny partial
  results re-aggregate.  Works for any algebraic aggregate
  (sum/count/min/max — the decomposable ones, same combiner algebra
  as MRC/mapred/MapTask.java:1639).
- ``salted_join``: replicate the small side N ways, salt the big
  side's key — a hot join key fans out over N tasks.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in
session.get_spark) handles sort-merge cases at runtime; these helpers
cover aggregations and broadcast-averse shapes AQE can't re-plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum", "min", "max", "count"}


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name -> (fn, column) with fn in
    sum/min/max/count.  Stage 1 groups by (key, random salt) — the hot
    key's rows spread across ``num_salts`` partial groups; stage 2
    merges partials (count merges by sum).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * num_salts).cast("int"))
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"{fn!r} is not decomposable; salted_aggregate supports {sorted(_MERGEABLE)}")
        partial_exprs.append(getattr(F, fn)(col).alias(f"_p_{name}"))
        merge_fn = "sum" if fn == "count" else fn
        final_exprs.append(getattr(F, merge_fn)(f"_p_{name}").alias(name))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_join(
    big: DataFrame, small: DataFrame, on: str, num_salts: int = 16, how: str = "inner"
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salt values, join on (key, salt).  Row multiplicity is
    preserved for the BIG side (each big row matches exactly its salt's
    replica), which is why only join types that never emit unmatched
    small-side rows are allowed: a right/full outer would emit each
    unmatched small-side row once per salt replica."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} — {how!r} would duplicate "
            "unmatched small-side rows across salt replicas"
        )
    big_s = big.withColumn("_salt", (F.rand(seed=42) * num_salts).cast("int"))
    small_s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    out = big_s.join(small_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def skew_profile(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Key-distribution diagnostics — the measurement half of skew
    handling (the remedies above are the treatment): the ``top_n``
    heaviest keys with their row counts, corpus share, and rank.
    Before picking num_salts / a custom partitioner at 100 TB, run
    this; a top-1 share near 1/num_partitions means no intervention is
    needed.

    Shape: one two-phase count aggregate (partial combine, so the
    shuffle carries one row per key per map partition), a TakeOrdered
    top-k (k-heap per partition, never a global sort), and the scalar
    corpus total broadcast back in-plan (no driver action)."""
    from pyspark.sql.window import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    # total derives from the key counts — one scan of the corpus, not
    # two (the counts aggregate is tiny and exchange-reusable)
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(top_n)
    w = Window.orderBy(F.col("n").desc(), F.col(key_col).asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n") / F.col("_total"), 6))
        .withColumn("rank", F.row_number().over(w))
        .select(key_col, "n", "share", "rank")
    )


def topk_per_group_salted(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str,
    num_salts: int = 16,
    ascending: bool = False,
) -> DataFrame:
    """Skew-safe exact per-group top-k in two phases.

    A single ``row_number() over (partition by group order by v)``
    sorts every row of a group in ONE task — the per-group analogue of
    the hot-reducer problem (MRC/mapreduce/Partitioner.java:45).  Here
    stage 1 ranks within (group, salt) — a hot group's rows spread
    over ``num_salts`` tasks, each keeping only its local top-k — and
    stage 2 ranks the <= k * num_salts survivors per group.  The
    result is EXACT for any salt assignment (each salt's local top-k
    is a superset of its contribution to the global top-k), provided
    (order_col, tiebreak_col) is a total order within the group; the
    salt is a deterministic hash of the tiebreak so re-runs and
    speculative retries agree row-by-row.  Adds ``rank`` (1..k)."""
    from pyspark.sql.window import Window

    direction = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [direction, F.col(tiebreak_col).asc()]
    # & mask (not abs): abs(Long.MIN_VALUE) stays negative; a negative
    # salt is harmless for partitioning but keep the range clean anyway
    salt = F.expr(f"(xxhash64(cast({tiebreak_col} as string)) & 1073741823) % {num_salts}")
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return survivors.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)
