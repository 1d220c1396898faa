"""Sorts, limits, top-k, secondary sort, key-field sort DSL
(SURVEY.md §2.6, §2.12).

Reference parity targets (paths under /root/reference/):

- total-order sort via sampling + TotalOrderPartitioner
  MRC/mapreduce/lib/partition/TotalOrderPartitioner.java:50,
  InputSampler.java:97-312 — Spark's ``orderBy`` IS this algorithm
  (RangePartitioning with reservoir sampling), so ``global_sort`` is a
  thin wrapper.
- secondary sort (values ordered within key group)
  MRX/SecondarySort.java:51-231 + grouping comparator Job.java:1026.
- Grep's top-k (single-reducer desc sort) MRX/Grep.java:82-92 —
  ``top_k`` uses orderBy+limit which Spark executes as TakeOrdered
  (per-partition heap + merge, no global shuffle).
- KeyFieldBasedComparator sort DSL (``-k pos1[,pos2][n][r]``)
  MRC/mapreduce/lib/partition/KeyFieldBasedComparator.java:38-53,
  parser KeyFieldHelper.java:296.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_sort(df: DataFrame, cols: list[str], ascending: bool = True) -> DataFrame:
    """Total-order sort: range-partitioned with sampled split points —
    built-in equivalent of TotalOrderPartitioner + InputSampler."""
    order = [F.col(c).asc() if ascending else F.col(c).desc() for c in cols]
    return df.orderBy(*order)


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """orderBy + limit → TakeOrdered physical op: each partition keeps a
    k-heap, driver merges k*partitions rows — no total sort at scale."""
    return df.orderBy(*order).limit(k)


def secondary_sort(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    reduce_fn,
    schema,
) -> DataFrame:
    """Grouped iteration with values sorted within the group.

    Reference: SecondarySort.java:51-231 — composite key sorted on
    (group, order), partitioned/grouped on group only, so the reducer
    sees values in order.  Here: ``applyInPandas`` receives the whole
    group; we sort it before handing to ``reduce_fn(pdf) -> pdf``.

    Scale note: a group must fit in one task's memory (the reference
    had the same constraint via BackupStore, MRC/mapred/BackupStore.java).
    For giant groups prefer ``repartition(group).sortWithinPartitions``
    + ``mapInPandas`` streaming over the partition.
    """

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return reduce_fn(pdf.sort_values(order_cols, kind="mergesort"))

    return df.groupBy(*group_cols).applyInPandas(apply, schema=schema)


def grouped_sorted_apply(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    apply_fn,
    schema,
    num_partitions: int | None = None,
) -> DataFrame:
    """Streamed secondary sort: repartition on the group key, sort
    within partitions on (group, order), then apply ``apply_fn(pdf)``
    to Arrow batches of COMPLETE groups — rows of a group are
    contiguous after the sort, and a carry buffer stitches groups that
    straddle batch boundaries.  Per-doc cost is one vectorized pandas
    pass per batch, not one Python call per group (the applyInPandas
    form in ``secondary_sort`` pays ~0.3 ms/group — prohibitive at
    millions of tiny groups; this form is the 100 TB path)."""
    import pandas as pd

    def run(batches) -> "Iterator[pd.DataFrame]":
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if pdf.empty:
                carry = None
                continue
            # hold back the trailing group: it may continue next batch.
            # NULL-SAFE group comparison (round-9 review fix): pandas
            # `== None` / NaN equality is elementwise False, so a null
            # group key straddling a batch boundary would otherwise be
            # emitted split in two — exactly the bug the carry exists
            # to prevent
            last = tuple(pdf[c].iloc[-1] for c in group_cols)
            tail_mask = pd.Series(True, index=pdf.index)
            for c, v in zip(group_cols, last):
                if pd.isna(v):
                    tail_mask &= pdf[c].isna()
                else:
                    tail_mask &= pdf[c] == v
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if not head.empty:
                yield apply_fn(head)
        if carry is not None and not carry.empty:
            yield apply_fn(carry)

    parts = df.repartition(num_partitions, *group_cols) if num_partitions else df.repartition(*group_cols)
    ordered = parts.sortWithinPartitions(*group_cols, *order_cols)
    return ordered.mapInPandas(run, schema=schema)


def secondary_sort_streaming(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    map_fn,
    schema,
    num_partitions: int | None = None,
) -> DataFrame:
    """Giant-group-safe variant: hash-repartition on the group key,
    sort within partitions on (group, order), then stream batches
    through ``mapInPandas``.  ``map_fn(iter_of_pdf) -> iter_of_pdf``
    sees each partition's rows in full (group, order) order — exactly
    the reference reducer's input contract without materializing a
    group in memory."""
    parts = df.repartition(num_partitions, *group_cols) if num_partitions else df.repartition(*group_cols)
    ordered = parts.sortWithinPartitions(*group_cols, *order_cols)
    return ordered.mapInPandas(map_fn, schema=schema)


# --- KeyFieldBasedComparator DSL ----------------------------------------

_KEYSPEC_RE = re.compile(r"^-k\s*(\d+)(?:\.(\d+))?(?:,(\d+)(?:\.(\d+))?)?\s*([nr]*)$")


def parse_key_field_spec(spec: str) -> list[tuple[int, bool, bool]]:
    """Parse unix-sort-style specs like ``-k2,2nr -k1,1`` to
    [(field_index_0based, numeric, reverse), ...] — the whole-field
    form.  Use ``parse_key_field_spec_full`` for char offsets."""
    return [(f, n, r) for f, _cs, _ce, n, r in parse_key_field_spec_full(spec)]


def parse_key_field_spec_full(spec: str) -> list[tuple[int, int | None, int | None, bool, bool]]:
    """Full KeyFieldBasedComparator grammar ``-k pos1[.char1][,pos2[.char2]][nr]``
    (KeyFieldBasedComparator.java:38-50, parser KeyFieldHelper.java:296).

    Returns [(field_0based, char_start_0based|None, char_end_1based|None,
    numeric, reverse)].  Only single-field keys are compiled (pos2 must
    equal pos1 when given — the form every in-tree example and
    streaming job uses); char offsets slice within that field."""
    out: list[tuple[int, int | None, int | None, bool, bool]] = []
    for piece in spec.split():
        m = _KEYSPEC_RE.match(piece)
        if not m:
            raise ValueError(f"bad key-field spec {piece!r}")
        f1, c1, f2, c2 = m.group(1), m.group(2), m.group(3), m.group(4)
        if f2 is not None and f2 != f1:
            raise ValueError(f"multi-field key ranges not supported: {piece!r}")
        flags = m.group(5) or ""
        out.append(
            (
                int(f1) - 1,  # unix sort is 1-based
                int(c1) - 1 if c1 else None,
                int(c2) if c2 else None,
                "n" in flags,
                "r" in flags,
            )
        )
    return out


def key_field_sort(df: DataFrame, text_col: str, spec: str, sep: str = "\t") -> DataFrame:
    """Sort separator-joined text records by a key-field spec
    (optionally with ``f.c`` char offsets within the field).

    ``F.split`` receives the pattern string as-is (no SQL-literal
    layer consumes backslashes), so a single ``re.escape`` is the
    correct escaping for regex-special separators like ``.`` or ``|``.
    """
    fields = F.split(F.col(text_col), re.escape(sep))
    order: list[Column] = []
    for idx, char_start, char_end, numeric, reverse in parse_key_field_spec_full(spec):
        c = F.element_at(fields, idx + 1)
        if char_start is not None or char_end is not None:
            start = (char_start or 0) + 1  # substring is 1-based
            length = (char_end - (char_start or 0)) if char_end is not None else 1_000_000
            c = F.substring(c, start, length)
        if numeric:
            # cast('double'): unparsable fields sort as NULL (first in
            # asc).  GNU sort -n would treat them as 0; the reference
            # comparator parses leading digits.  Deliberate, documented
            # divergence — the oracle mirrors cast semantics, and every
            # registered spec sorts numeric-clean fields.
            c = c.cast("double")
        order.append(c.desc() if reverse else c.asc())
    return df.orderBy(*order)
