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
