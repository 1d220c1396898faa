"""Versioned parquet tables — a minimal time-travel layer over plain
parquet directories (the lakehouse-table-format idea reduced to its
load-bearing core: immutable version directories + an atomic latest
pointer).  Pairs with ``operators/joins.merge_upsert`` (each MERGE
result becomes the next version) and ``writers.compact_files``
(compaction rewrites a version's files, not history).

Layout:

    table/
      v=00001/part-*.parquet
      v=00002/part-*.parquet
      _latest            <- contains "2" (written atomically via rename)

Readers pin a version (audit, reproducible training runs — WHICH
corpus snapshot trained this model is exactly this pointer) or follow
``_latest``.  Writers never mutate a committed version, so concurrent
readers are never torn: the pointer flips only after the new
version's write completes (same publish-by-rename contract as
FileOutputCommitter).  ``vacuum`` drops versions older than a
retention count, never the pointed-to one.

Scale notes: the data path is ordinary distributed parquet write/scan
— this layer adds one tiny pointer file and directory naming; at
1000 executors nothing about it is different.  Version listing is
driver-side metadata, bounded by version count.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^v=(\d{5})$")


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for n in os.listdir(path):
        m = _V_RE.match(n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(path: str) -> int | None:
    """The committed version the ``_latest`` pointer names (None for a
    fresh table).  Falls back to the highest complete version dir if
    the pointer is missing (pre-crash state: data committed, pointer
    flip lost — the write is then simply not yet published)."""
    ptr = os.path.join(path, "_latest")
    if os.path.isfile(ptr):
        return int(open(ptr).read().strip())
    return None


def write_version(df: DataFrame, path: str) -> int:
    """Publish ``df`` as the table's next version: write the parquet
    under ``v=NNNNN``, then atomically flip ``_latest`` (tmp file +
    rename).  Returns the new version number."""
    os.makedirs(path, exist_ok=True)
    vs = _versions(path)
    nxt = (vs[-1] if vs else 0) + 1
    vdir = os.path.join(path, f"v={nxt:05d}")
    df.write.mode("overwrite").parquet(vdir)
    tmp = os.path.join(path, "._latest.tmp")
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, os.path.join(path, "_latest"))
    return nxt


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Scan one table version (default: the ``_latest`` pointer)."""
    v = version if version is not None else latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed version in {path}")
    vdir = os.path.join(path, f"v={v:05d}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} not present in {path}")
    return spark.read.parquet(vdir)


def vacuum(path: str, keep: int = 3) -> list[int]:
    """Drop all but the newest ``keep`` versions (never the one
    ``_latest`` points at).  Returns the versions removed."""
    cur = latest_version(path)
    vs = _versions(path)
    drop = [v for v in vs[:-keep] if v != cur] if keep > 0 else [v for v in vs if v != cur]
    for v in drop:
        shutil.rmtree(os.path.join(path, f"v={v:05d}"), ignore_errors=True)
    return drop
