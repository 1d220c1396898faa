"""Sketch tier: count-min sketch and bloom pre-filter invariants
(functions/sketch.py) plus the deterministic per-group reservoir
sample (functions/sampling.reservoir_per_group).  The exact-oracle
parity of the registered queries is covered by test_oracle_parity;
these tests pin the sketch-theoretic guarantees and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_3_3_6_spark.functions.sampling import reservoir_per_group
from hadoop_3_3_6_spark.functions.sketch import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter,
    cms_lookup,
    count_min_sketch,
)
from hadoop_3_3_6_spark.session import load_table

DEPTH, WIDTH = 4, 32


def test_cms_never_underestimates_and_rows_conserve_mass(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    total = ev.count()
    cms = count_min_sketch(ev, "event_type", depth=DEPTH, width=WIDTH)
    cells = cms.collect()
    assert len(cells) <= DEPTH * WIDTH
    # each sketch row sees every input row exactly once
    per_row = {}
    for c in cells:
        per_row[c.r] = per_row.get(c.r, 0) + c.cnt
    assert per_row == {r: total for r in range(DEPTH)}
    est = cms_lookup(cms, ev, "event_type", depth=DEPTH, width=WIDTH)
    truth = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact"))
    joined = est.join(truth, "event_type").collect()
    assert len(joined) == truth.count()
    assert all(r.cms_est >= r.exact for r in joined)


def test_cms_unknown_key_estimates_from_collisions_only(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    cms = count_min_sketch(ev, "event_type", depth=DEPTH, width=WIDTH)
    ghost = spark.createDataFrame([("never_seen_event_xyz",)], "event_type string")
    [row] = cms_lookup(cms, ghost, "event_type", depth=DEPTH, width=WIDTH).collect()
    # an absent key's estimate is pure collision mass: bounded by the
    # heaviest cell, and >= 0 (0 exactly when some cell is empty)
    assert 0 <= row.cms_est <= max(c.cnt for c in cms.collect())


def test_bloom_no_false_negatives_and_deterministic(spark, sf_dir):
    supplier = load_table(spark, "supplier", sf_dir)
    build = supplier.filter(F.col("s_nationkey") < 5).select("s_suppkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_suppkey")
    passed = bloom_prefilter(li, "l_suppkey", build, "s_suppkey", num_bits=1024, num_hashes=3)
    # no false negatives: every row whose key IS in build must pass
    true_rows = li.join(build.distinct(), li.l_suppkey == build.s_suppkey, "left_semi")
    assert passed.join(
        build.distinct(), passed.l_suppkey == build.s_suppkey, "left_semi"
    ).count() == true_rows.count()
    # deterministic: same mask, same survivors on a re-run
    again = bloom_prefilter(li, "l_suppkey", build, "s_suppkey", num_bits=1024, num_hashes=3)
    assert again.count() == passed.count()


def test_bloom_probe_side_is_pure_filter(spark, sf_dir):
    """The probe table must be filtered in place: no equi-join operator
    anywhere in the plan (the only join is the 1-row mask broadcast
    cross), so the probe side contributes zero shuffle exchanges."""
    supplier = load_table(spark, "supplier", sf_dir)
    build = supplier.filter(F.col("s_nationkey") < 5).select("s_suppkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_suppkey")
    passed = bloom_prefilter(li, "l_suppkey", build, "s_suppkey", num_bits=1024, num_hashes=3)
    plan = passed._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row mask ride-along


def test_bloom_mask_width(spark, sf_dir):
    supplier = load_table(spark, "supplier", sf_dir)
    build = supplier.filter(F.col("s_nationkey") < 5).select("s_suppkey")
    [row] = bloom_build(build, "s_suppkey", num_bits=1024, num_hashes=3).collect()
    assert len(row.bloom) == 1024 // 64
    set_bits = sum(bin(w & (2**64 - 1)).count("1") for w in row.bloom)
    n_keys = build.distinct().count()
    assert 0 < set_bits <= 3 * n_keys
    # membership expression agrees with the python-side bitmask
    probe = build.crossJoin(F.broadcast(spark.createDataFrame([(row.bloom,)], "bloom array<bigint>")))
    assert probe.filter(bloom_might_contain("s_suppkey", 1024, 3)).count() == build.count()


def test_reservoir_per_group_size_and_stability(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    samp = reservoir_per_group(ev, "event_type", "event_id", n=7)
    sizes = {r.event_type: r.cnt for r in samp.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    totals = {r.event_type: r.cnt for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for g, n in sizes.items():
        assert n == min(7, totals[g])
    # group isolation: dropping every OTHER group leaves a group's
    # sample unchanged (a row's fate depends only on its own group)
    one = ev.filter(F.col("event_type") == "click")
    solo = reservoir_per_group(one, "event_type", "event_id", n=7)
    assert sorted(r.event_id for r in solo.select("event_id").collect()) == sorted(
        r.event_id for r in samp.filter(F.col("event_type") == "click").select("event_id").collect()
    )


def test_reservoir_per_group_keeps_null_group(spark):
    """NULL is a legitimate group: Window.partitionBy ranks it, so the
    join-back must be null-safe — a plain equi-join on the group column
    silently dropped the whole NULL group (round-4 regression catch)."""
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3), ("g", 4), ("g", 5)],
        "grp string, id int",
    )
    out = reservoir_per_group(df, "grp", "id", n=2)
    by_group = {}
    for r in out.collect():
        by_group.setdefault(r.grp, []).append(r.id)
    assert len(by_group.get(None, [])) == 2
    assert len(by_group.get("g", [])) == 2


def test_hll_registers_merge_and_estimate(spark, sf_dir):
    from hadoop_3_3_6_spark.functions.sketch import hll_estimate, hll_merge, hll_registers

    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        "source", F.explode(F.expr("filter(split(text, ' '), w -> w <> '')")).alias("w")
    )
    regs = hll_registers(words, "w", p=8, group_cols=["source"])
    rows = regs.collect()
    assert all(0 <= r.bucket < 256 and 1 <= r.register <= 53 for r in rows)
    # merged register = max over the per-source registers, per bucket
    merged = {r.bucket: r.register for r in hll_merge(regs).collect()}
    expect = {}
    for r in rows:
        expect[r.bucket] = max(expect.get(r.bucket, 0), r.register)
    assert merged == expect
    # the completed estimate lands within HLL's expected error band
    # (p=8 -> ~6.5% std error; allow 4 sigma)
    true_n = words.select("w").distinct().count()
    est = hll_estimate(merged, p=8)
    assert abs(est - true_n) / true_n < 0.26
    # merge-at-any-granularity: registers built per source then merged
    # equal registers built globally in one pass
    global_regs = {r.bucket: r.register for r in hll_registers(words, "w", p=8).collect()}
    assert global_regs == merged


def test_bloom_fast_path_no_false_negatives(spark, sf_dir):
    from hadoop_3_3_6_spark.plans.queries import QUERIES

    [row] = QUERIES["sketch_bloom_prefilter_fast"](spark, sf_dir).collect()
    supplier = load_table(spark, "supplier", sf_dir)
    build = supplier.filter(F.col("s_nationkey") < 5).select("s_suppkey").distinct()
    li = load_table(spark, "lineitem", sf_dir).select("l_suppkey")
    true_rows = li.join(build, li.l_suppkey == build.s_suppkey, "left_semi").count()
    assert row.true_matches == true_rows
    assert row.bloom_pass >= row.true_matches and row.false_positives >= 0


# --- seeded randomized references: the ENTIRE portable pipeline
# (md5 ring -> KM positions -> sketch state) mirrored in pure Python.

def _py_hash(key, salt):
    import hashlib

    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15]
    return int(h, 16)


def _py_km_pos(h, i, m):
    h1 = h & ((1 << 30) - 1)
    h2 = ((h >> 30) & ((1 << 30) - 1)) | 1
    return (h1 + i * h2) % m


def test_cms_randomized_python_reference(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    keys = [f"k{int(x)}" for x in rng.integers(0, 40, 300)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    cms = count_min_sketch(df, "key", depth=3, width=16)
    got = {(r.r, r.bucket): r.cnt for r in cms.collect()}
    want = {}
    for k in keys:
        h = _py_hash(k, "cms")
        for r in range(3):
            cell = (r, _py_km_pos(h, r, 16))
            want[cell] = want.get(cell, 0) + 1
    assert got == want
    est = {r.key: r.cms_est for r in cms_lookup(cms, df, "key", depth=3, width=16).collect()}
    for k in set(keys):
        h = _py_hash(k, "cms")
        assert est[k] == min(want.get((r, _py_km_pos(h, r, 16)), 0) for r in range(3))


def test_bloom_randomized_python_reference(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    build_keys = sorted({int(x) for x in rng.integers(0, 500, 60)})
    probe_keys = sorted({int(x) for x in rng.integers(0, 1000, 400)})
    build = spark.createDataFrame([(k,) for k in build_keys], "k long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    got = sorted(r.k for r in bloom_prefilter(probe, "k", build, "k", num_bits=256, num_hashes=3).collect())
    bits = set()
    for k in build_keys:
        h = _py_hash(k, "bloom")
        bits.update(_py_km_pos(h, i, 256) for i in range(3))
    want = [
        k for k in probe_keys
        if all(_py_km_pos(_py_hash(k, "bloom"), i, 256) in bits for i in range(3))
    ]
    assert got == want


def test_bloom_prefilter_tolerates_user_bloom_column(spark):
    """A probe table that legitimately owns a ``bloom`` (or ``_bh``)
    column must survive the prefilter untouched — the internals use a
    reserved ``__bloom_*`` namespace."""
    build = spark.createDataFrame([(1,), (2,)], "k long")
    probe = spark.createDataFrame(
        [(1, "keep-me", 7), (2, "and-me", 8), (99, "drop-me", 9)],
        "k long, bloom string, _bh long",
    )
    rows = {r.k: (r.bloom, r._bh) for r in bloom_prefilter(probe, "k", build, "k", num_bits=256, num_hashes=3).collect()}
    assert set(rows) >= {1, 2}  # no false negatives; 99 may false-positive
    assert rows[1] == ("keep-me", 7) and rows[2] == ("and-me", 8)
    assert set(probe.columns) == {"k", "bloom", "_bh"}


def test_hll_randomized_python_reference(spark):
    import numpy as np

    from hadoop_3_3_6_spark.functions.sketch import hll_registers

    rng = np.random.default_rng(13)
    keys = [f"w{int(x)}" for x in rng.integers(0, 5000, 800)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r.bucket: r.register for r in hll_registers(df, "key", p=8).collect()}
    want = {}
    for k in set(keys):
        h = _py_hash(k, "hll")
        bucket, w = h & 255, h >> 8
        rank = 53 - w.bit_length() if w else 53
        want[bucket] = max(want.get(bucket, 0), rank)
    assert got == want


def test_streaming_hll_register_maintenance(spark, sf_dir, tmp_path):
    """Sketch x streaming composition: per-micro-batch HLL registers
    fold into a persisted register table via foreachBatch, and the
    final state equals the one-shot batch registers EXACTLY — the
    mergeability law (max per bucket) holds under any micro-batch
    split, which is what lets a 100 TB pipeline maintain cardinality
    state incrementally instead of rescanning."""
    from hadoop_3_3_6_spark.functions.sketch import hll_merge, hll_registers

    ev = load_table(spark, "events", sf_dir).select("user_id")
    src = tmp_path / "hll_src"
    ev.repartition(3).write.parquet(str(src))
    state = str(tmp_path / "hll_state")

    def fold_batch(batch_df, batch_id):
        regs = hll_registers(batch_df, "user_id", p=6)
        import os

        if os.path.isdir(state):
            regs = spark.read.parquet(state).unionByName(regs)
        merged = hll_merge(regs).toPandas()  # <= 64 rows
        spark.createDataFrame(merged).write.mode("overwrite").parquet(state)

    q = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
        .writeStream.foreachBatch(fold_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.bucket: r.register for r in spark.read.parquet(state).collect()}
    want = {r.bucket: r.register for r in hll_registers(ev, "user_id", p=6).collect()}
    assert got == want


def test_cms_cells_are_additive_across_splits(spark, sf_dir):
    """CMS merge law: cell counts ADD — building per-split sketches
    and summing cells equals the one-shot sketch (the incremental /
    map-side form of the same bounded grid)."""
    ev = load_table(spark, "events", sf_dir)
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    cms_a = count_min_sketch(a, "event_type", depth=DEPTH, width=WIDTH)
    cms_b = count_min_sketch(b, "event_type", depth=DEPTH, width=WIDTH)
    merged = {
        (r.r, r.bucket): r.cnt
        for r in cms_a.unionByName(cms_b)
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    want = {
        (r.r, r.bucket): r.cnt
        for r in count_min_sketch(ev, "event_type", depth=DEPTH, width=WIDTH).collect()
    }
    assert merged == want


def test_bloom_masks_or_compose(spark, sf_dir):
    """Bloom merge law: the mask of a union is the bitwise OR of the
    masks — per-partition/day masks fold without re-hashing."""
    supplier = load_table(spark, "supplier", sf_dir)
    a = supplier.filter(F.col("s_suppkey") % 2 == 0).select("s_suppkey")
    b = supplier.filter(F.col("s_suppkey") % 2 == 1).select("s_suppkey")
    [ra] = bloom_build(a, "s_suppkey", num_bits=512, num_hashes=3).collect()
    [rb] = bloom_build(b, "s_suppkey", num_bits=512, num_hashes=3).collect()
    [rf] = bloom_build(supplier.select("s_suppkey"), "s_suppkey", num_bits=512, num_hashes=3).collect()
    assert [x | y for x, y in zip(ra.bloom, rb.bloom)] == list(rf.bloom)


def test_hll_estimate_both_ranges(spark):
    """hll_estimate must hold its error band in BOTH regimes: the
    small-range linear-counting path (empty buckets present) and the
    raw harmonic path (cardinality >> bucket count)."""
    from hadoop_3_3_6_spark.functions.sketch import hll_estimate, hll_registers

    for n in (150, 30_000):  # 150 << 2.5*256; 30k >> 2.5*256
        df = spark.range(n).selectExpr("concat('key', id) as k")
        regs = {r.bucket: r.register for r in hll_registers(df, "k", p=8).collect()}
        est = hll_estimate(regs, p=8)
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_alpha_published_table(spark):
    """Small-m alpha must come from the published table (0.673 / 0.697
    / 0.709 for m = 16/32/64), not the asymptotic formula — at p=4 the
    two differ ~4% and the sketch would systematically over-estimate
    (round-9 semantic-review fix).  Accuracy check: a p=4 sketch over
    5000 distinct keys lands within the ~3x-sigma band (sigma =
    1.04/sqrt(16) ~ 26%)."""
    import pytest

    from hadoop_3_3_6_spark.functions.sketch import hll_estimate, hll_registers

    df = spark.range(5000).selectExpr("cast(id as string) AS k")
    regs = {
        r.bucket: r.register
        for r in hll_registers(df, "k", p=4).collect()
    }
    est = hll_estimate(regs, p=4)
    assert abs(est - 5000) / 5000 < 0.8
    # the published-vs-asymptotic delta is material at m=16
    asymptotic = 0.7213 / (1 + 1.079 / 16)
    assert abs(asymptotic - 0.673) / 0.673 > 0.003
    with pytest.raises(ValueError, match="p must be >= 4"):
        hll_estimate(regs, p=3)
