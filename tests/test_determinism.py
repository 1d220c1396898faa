"""Determinism under parallelism: results must not depend on the
shuffle-partition count (the local stand-in for cluster size and for
speculative re-execution).  An under-specified window order or a
rand()-derived decision would pass the oracle at one partitioning and
drift at another; these queries are the order-sensitive ones (ranks,
packing, sampled decisions, as-of carries)."""

from __future__ import annotations

import pytest

from hadoop_3_3_6_spark.plans.queries import QUERIES

SENSITIVE = [
    "pipeline_global_shuffle",
    "pipeline_pack_sequences",
    "pipeline_sample_per_group",
    "topk_events_per_type",
    "secondarysort",
    "asof_join_events_orders",
    "window_topn_per_customer",
    "dedup_minhash",
    "sketch_cms_custkey",
    "table_diff_orders",
]


def _rows(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        a = _rows(spark, sf_dir, name)
        spark.conf.set(key, "29")
        b = _rows(spark, sf_dir, name)
    finally:
        spark.conf.set(key, prev)
    assert a == b, f"{name} drifts with partitioning"
