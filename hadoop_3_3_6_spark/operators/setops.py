"""Set operations (SURVEY.md §2.7).

- Homogeneous union: multi-path scans (FileInputFormat.addInputPath,
  MRC/mapreduce/lib/input/FileInputFormat.java:67) → ``df.union``.
- Heterogeneous union: MultipleInputs per-path mapper normalizes
  schemas (MRC/mapreduce/lib/input/MultipleInputs.java:40) →
  per-source projection to a common schema + unionByName.
- distinct / intersect / except are free in Spark; the reference
  expressed them via UniqValueCount / tagged joins.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame


def heterogeneous_union(sources: list[tuple[DataFrame, list[Column]]]) -> DataFrame:
    """MultipleInputs analogue: each (df, projection) pair is mapped to
    the common schema by its own projection (the per-path Mapper role),
    then all are unioned by name."""
    projected = [df.select(*cols) for df, cols in sources]
    return reduce(lambda a, b: a.unionByName(b), projected)
