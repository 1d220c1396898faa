"""Aggregation framework (SURVEY.md §2.5).

Reference parity targets (``MRC/`` = hadoop-mapreduce-client-core/src/
main/java/org/apache/hadoop/, under /root/reference/):

- descriptor-driven aggregate jobs  MRC/mapreduce/lib/aggregate/
  ValueAggregatorJob.java:85, ValueAggregatorBaseDescriptor.java:39-117
- LongValueSum / DoubleValueSum / LongValueMax / LongValueMin /
  StringValueMax / StringValueMin  (same package)
- UniqValueCount (capped distinct)  MRC/mapreduce/lib/aggregate/UniqValueCount.java:88-121
- ValueHistogram (per-key value histogram report)
  MRC/mapreduce/lib/aggregate/ValueHistogram.java:83-135

The reference runs these as generic mapper/combiner/reducer jobs; here
each descriptor compiles to a Catalyst aggregate, which gives partial
(map-side) aggregation + final merge for free — the exact Combiner
pattern (MRC/mapred/MapTask.java:1639) without custom code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# descriptor name -> aggregate builder, mirroring
# ValueAggregatorBaseDescriptor.java:39-53 constants.
_DESCRIPTORS = {
    "LongValueSum": lambda c: F.sum(F.col(c).cast("long")),
    "DoubleValueSum": lambda c: F.sum(F.col(c).cast("double")),
    "LongValueMax": lambda c: F.max(F.col(c).cast("long")),
    "LongValueMin": lambda c: F.min(F.col(c).cast("long")),
    "DoubleValueMax": lambda c: F.max(F.col(c).cast("double")),
    "DoubleValueMin": lambda c: F.min(F.col(c).cast("double")),
    "StringValueMax": lambda c: F.max(F.col(c).cast("string")),
    "StringValueMin": lambda c: F.min(F.col(c).cast("string")),
    "ValueCount": lambda c: F.count(F.col(c)),
}


def aggregate_job(df: DataFrame, key_cols: list[str], descriptors: dict[str, tuple[str, str]]) -> DataFrame:
    """Config-driven aggregation: ``descriptors`` maps output column ->
    (descriptor_name, value_column), e.g. ``{"qty_sum": ("DoubleValueSum",
    "l_quantity")}``.  The Spark analogue of ValueAggregatorJob.java:85.

    Descriptor names match CASE-INSENSITIVELY — the reference resolves
    types with compareToIgnoreCase (ValueAggregatorBaseDescriptor.
    generateValueAggregator :102; round-10 conformance review).  One
    documented divergence: an unparsable numeric value makes the
    reference's Long.parseLong throw and fail the task, while Spark's
    non-ANSI cast yields NULL and the aggregate skips it — the
    PERMISSIVE/SkipBadRecords disposition this engine applies
    uniformly (route through operators/counters.py's quarantine tier
    when bad records must be surfaced instead of skipped)."""
    lookup = {k.lower(): v for k, v in _DESCRIPTORS.items()}
    aggs: list[Column] = []
    for out_name, (desc, value_col) in descriptors.items():
        builder = lookup.get(desc.lower())
        if builder is None:
            raise ValueError(f"unknown aggregate descriptor {desc!r}; known: {sorted(_DESCRIPTORS)}")
        aggs.append(builder(value_col).alias(out_name))
    return df.groupBy(*key_cols).agg(*aggs)


def uniq_value_count(
    df: DataFrame, key_cols: list[str], value_col: str, max_num: int | None = None, out_col: str = "uniq_count"
) -> DataFrame:
    """Distinct-value count per key with an optional cap.

    Reference: UniqValueCount.java caps the tracked set at
    ``maxNumItems`` (addNextValue :88) so the reported count saturates
    at the cap; partials ship the distinct set (getCombinerOutput :121)
    — Spark's partial/final distinct aggregation is the same plan.
    For unbounded high-cardinality use ``approx_count_distinct`` (the
    scale path); the capped exact form is what the reference computes.
    """
    cnt = F.countDistinct(F.col(value_col))
    if max_num is not None:
        cnt = F.least(cnt, F.lit(max_num))
    return df.groupBy(*key_cols).agg(cnt.alias(out_col))


def value_histogram(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Per-key histogram report over the distinct values of ``value_col``.

    Reference report (ValueHistogram.java getReport :83): number of
    distinct values, min/median/max/average/stddev of the per-value
    counts.  The reference renders a string; we return typed columns
    (SURVEY.md §7.4).  Two-level aggregation: count per (key, value),
    then stats over the counts — both stages hash aggregates with
    map-side partials.

    Median is the reference's EXACT definition — the middle ELEMENT of
    the sorted counts array (``counts[counts.length / 2]``, the upper
    middle for even n; ValueHistogram.java:111), NOT an interpolated
    percentile (round-9 semantic-review fix: the earlier
    ``percentile(0.5)`` interpolated between the two middles for even
    n — self-consistent with its oracle but unfaithful to the cited
    report).  The per-key sorted-counts list is bounded by the key's
    distinct-value count — the same in-memory bound the reference's
    items map carries.  stddev is population (sd/count), matching
    getReport's formula."""
    per_value = df.groupBy(*key_cols, value_col).agg(F.count(F.lit(1)).alias("_vcount"))
    return per_value.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("distinct_values"),
        F.min("_vcount").alias("min_count"),
        F.expr(
            "cast(element_at(array_sort(collect_list(_vcount)), "
            "cast(count(1) div 2 as int) + 1) as double)"
        ).alias("median_count"),
        F.max("_vcount").alias("max_count"),
        F.avg("_vcount").alias("avg_count"),
        F.coalesce(F.stddev_pop("_vcount"), F.lit(0.0)).alias("stddev_count"),
    )
