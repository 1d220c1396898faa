"""InputSampler conformance (MRC/mapreduce/lib/partition/InputSampler.java).

Strategy: the Spark-side samplers are differential-tested against
literal python ports of the reference loops (the ports keep the Java
control flow verbatim — global counters, add-before-break, the RNG
stream order), and JavaRandom is pinned against published
java.util.Random output vectors, so any drift in the vectorized /
closed-form Spark formulations shows up as a multiset mismatch.
"""

import math

import numpy as np
import pytest

from hadoop_3_3_6_spark.operators.input_sampler import (
    JavaRandom,
    interval_sample,
    random_sample,
    split_sample,
    total_order_assign,
    total_order_split_points,
)
from pyspark.sql import functions as F


# ---------------------------------------------------------------- JavaRandom

def test_java_random_published_vectors():
    """java.util.Random's algorithm is specified normatively in its
    javadoc; these first-output values for seeds 42/0 are widely
    published and pin the scramble, the 48-bit state walk, and the
    signed 32-bit slice."""
    assert JavaRandom(42).next_int() == -1170105035
    assert JavaRandom(0).next_int() == -1155484576
    assert JavaRandom(42).next_double() == 0.7275636800328681
    r = JavaRandom(42)
    assert [r.next_int(10) for _ in range(5)] == [0, 3, 8, 4, 0]


def test_java_random_bound_paths():
    # power-of-two bound takes the high-bits shortcut; the generic
    # bound uses the rejection loop — both must stay in range and be
    # deterministic for a fixed seed
    r1, r2 = JavaRandom(7), JavaRandom(7)
    seq_pow2 = [r1.next_int(16) for _ in range(200)]
    assert all(0 <= v < 16 for v in seq_pow2)
    seq_gen = [r2.next_int(13) for _ in range(200)]
    assert all(0 <= v < 13 for v in seq_gen)
    r3 = JavaRandom(7)
    assert [r3.next_int(16) for _ in range(200)] == seq_pow2


# ------------------------------------------------------- reference loop ports

def _port_interval(records, freq):
    """Literal port of IntervalSampler.getSample (InputSampler.java:288-300):
    records is a list of (split_id, [keys...]) in split order; counters
    are global, division is double."""
    samples, rec, kept = [], 0, 0
    for _sid, keys in records:
        for k in keys:
            rec += 1
            if kept / rec < freq:
                samples.append(k)
                kept += 1
    return samples


def _port_split(records, num_samples, max_splits=None):
    """Literal port of SplitSampler.getSample (InputSampler.java:128-156):
    add-before-break, GLOBAL record counter."""
    splits_to_sample = len(records) if max_splits is None else min(max_splits, len(records))
    spp = num_samples // splits_to_sample
    samples, rec = [], 0
    for i in range(splits_to_sample):
        for k in records[i][1]:
            samples.append(k)
            rec += 1
            if (i + 1) * spp <= rec:
                break
    return samples


def _grid_records():
    # uneven split sizes incl. an empty and a singleton split so the
    # global-counter carry-over is actually exercised
    return [
        (0, [f"a{i:03d}" for i in range(17)]),
        (1, []),
        (2, ["b000"]),
        (3, [f"c{i:03d}" for i in range(29)]),
        (4, [f"d{i:03d}" for i in range(5)]),
    ]


def _as_df(spark, records):
    rows = [
        (sid, pos, key)
        for sid, keys in records
        for pos, key in enumerate(keys)
    ]
    return spark.createDataFrame(rows, "split int, pos int, key string")


@pytest.mark.parametrize("freq", [0.1, 0.25, 1 / 3, 0.05, 0.77])
def test_interval_sample_matches_reference_port(spark, freq):
    records = _grid_records()
    expected = _port_interval(records, freq)
    got = [
        r.key
        for r in interval_sample(_as_df(spark, records), "key", freq, "split", "pos")
        .orderBy("_r")
        .collect()
    ]
    assert got == expected


def test_interval_closed_form_matches_java_double_loop():
    """The Column formulation uses kept_before(r) = ceil(freq*(r-1));
    the reference evaluates kept/records < freq with double division.
    Agreement checked on a dense r grid across awkward freqs
    (including exact-boundary freq*r integers, where the strict <
    skips the record in both forms)."""
    for freq in [0.1, 0.25, 1 / 3, 0.05, 0.77, 0.5, 0.9999, 0.003]:
        kept = 0
        for r in range(1, 50001):
            ref = kept / r < freq
            closed = math.ceil(freq * (r - 1)) / r < freq
            assert ref == closed, (freq, r)
            if ref:
                kept += 1


@pytest.mark.parametrize("num_samples,max_splits", [(10, None), (7, 3), (100, None), (3, None)])
def test_split_sample_matches_reference_port(spark, num_samples, max_splits):
    records = _grid_records()
    expected = _port_split(records, num_samples, max_splits)
    got = [
        r.key
        for r in split_sample(
            _as_df(spark, records), "key", num_samples, "split", "pos", max_splits,
            splits=[sid for sid, _ in records],
        )
        .orderBy("split", "_n")
        .collect()
    ]
    # the reference emits in split-visit order; per-split head-N is the
    # same multiset and the same per-split prefix
    assert sorted(got) == sorted(expected)


def test_split_sample_short_split_rolls_budget_forward(spark):
    # 3 splits, 9 samples -> spp = 3; split0 has ONE record, so the
    # global counter is behind and split1 contributes 5 (not 3):
    # break at (i+1)*spp=6 <= records
    records = [(0, ["a"]), (1, [f"b{i}" for i in range(8)]), (2, [f"c{i}" for i in range(8)])]
    expected = _port_split(records, 9)
    assert expected == ["a", "b0", "b1", "b2", "b3", "b4", "c0", "c1", "c2"]
    got = [
        r.key
        for r in split_sample(_as_df(spark, records), "key", 9, "split", "pos")
        .orderBy("split", "_n")
        .collect()
    ]
    assert got == expected


def test_split_sample_zero_budget_still_takes_one_per_split(spark):
    # numSamples < #splits -> samplesPerSplit = 0, and the break
    # condition (i+1)*0 <= records is true right after the FIRST add —
    # so every non-empty split still contributes exactly one record
    # and the sampler returns MORE records than requested (the add
    # precedes the break, InputSampler.java:148-152)
    records = [(0, [f"a{i}" for i in range(10)]), (1, ["b0", "b1"]), (2, ["c0"])]
    expected = _port_split(records, 2)  # spp = 0
    assert expected == ["a0", "b0", "c0"]
    got = [
        r.key
        for r in split_sample(_as_df(spark, records), "key", 2, "split", "pos")
        .orderBy("split", "_n")
        .collect()
    ]
    assert got == expected


# ------------------------------------------------------------- RandomSampler

def _port_random(records, freq, num_samples, seed, max_splits=None):
    """Literal port of RandomSampler.getSample (InputSampler.java:195-243):
    ONE JavaRandom stream drives the split shuffle, acceptance,
    reservoir replacement, and freq decay."""
    rng = JavaRandom(seed)
    split_ids = [sid for sid, _ in records]
    for i in range(len(split_ids)):
        j = rng.next_int(len(split_ids))
        split_ids[i], split_ids[j] = split_ids[j], split_ids[i]
    by_split = dict(records)
    splits_to_sample = len(split_ids) if max_splits is None else min(max_splits, len(split_ids))
    samples = []
    i = 0
    while i < splits_to_sample or (i < len(split_ids) and len(samples) < num_samples):
        for key in by_split[split_ids[i]]:
            if rng.next_double() <= freq:
                if len(samples) < num_samples:
                    samples.append(key)
                else:
                    ind = rng.next_int(num_samples)
                    samples[ind] = key
                    freq *= (num_samples - 1) / num_samples
        i += 1
    return samples


def test_random_sample_matches_reference_port(spark):
    records = _grid_records()
    for seed, freq, n in [(42, 0.5, 5), (7, 0.9, 3), (123, 0.3, 50)]:
        expected = _port_random(records, freq, n, seed)
        got = random_sample(
            _as_df(spark, records), "key", freq, n, seed, "split", "pos",
            splits=[sid for sid, _ in records],
        )
        assert got == expected, (seed, freq, n)


def test_random_sample_replacement_and_decay_reachable():
    # with freq=0.9 over 52 records and num_samples=3 the reservoir
    # replacement branch (and its freq decay) must fire
    records = _grid_records()
    out = _port_random(records, 0.9, 3, 42)
    assert len(out) == 3
    total = sum(len(k) for _, k in records)
    assert total > 3  # replacement had accepted candidates to choose from


# ------------------------------------------------------ writePartitionFile

def test_split_points_plain_selection():
    samples = [f"k{i:02d}" for i in range(10)]
    # stepSize = 10/4 = 2.5f; Math.round(2.5)=3, round(5.0)=5, round(7.5)=8
    assert total_order_split_points(samples, 4) == ["k03", "k05", "k08"]


def test_split_points_sorts_by_utf8_bytes_and_keeps_duplicates():
    # unsorted input; duplicate boundary keys are emitted verbatim
    # (the equal-key skip is unreachable at stepSize >= 1 — see module
    # docstring); sort is byte-lexicographic
    samples = ["b", "a", "b", "b", "a", "b", "b", "b"]
    assert total_order_split_points(samples, 4) == ["b", "b", "b"]


def test_split_points_float32_step_size_is_reference_exact():
    # 31 samples / 14 partitions: stepSize*7 = 15.5 exactly in
    # rationals (double math rounds to 16) but 15.499999... in the
    # reference's FLOAT arithmetic -> index 15.  A double port would
    # diverge here.
    samples = [f"s{i:03d}" for i in range(31)]
    points = total_order_split_points(samples, 14)
    step32 = np.float32(31) / np.float32(14)
    k_f32 = int(np.floor(np.float32(step32 * np.float32(7)) + np.float32(0.5)))
    assert k_f32 == 15 and math.floor(31 / 14 * 7 + 0.5) == 16
    assert points[6] == "s015"


def test_split_points_fewer_samples_than_partitions_raises():
    # reference parity: stepSize < 1 cascades the equal-key skip off
    # the end of the array (AIOOBE at InputSampler.java:330)
    with pytest.raises(ValueError, match="ArrayIndexOutOfBounds"):
        total_order_split_points(["a", "b", "c"], 5)


# ------------------------------------------------- TotalOrderPartitioner

def test_total_order_assign_boundary_goes_right(spark):
    # binarySearch+1 semantics: key == boundary -> the partition to
    # the boundary's right
    df = spark.createDataFrame(
        [("a",), ("f",), ("g",), ("p",), ("z",)], "k string"
    )
    out = {
        r.k: r.p
        for r in df.select(
            "k", total_order_assign(F.col("k"), ["f", "p"]).alias("p")
        ).collect()
    }
    assert out == {"a": 0, "f": 1, "g": 1, "p": 2, "z": 2}


def test_total_order_repartition_physical_contract(spark):
    """-totalOrder placement: bucket i's rows land in OUTPUT PARTITION
    i, each partition is sorted, and concatenating partitions in index
    order is the global sort — the reference's part-file contract."""
    from hadoop_3_3_6_spark.operators.input_sampler import total_order_repartition

    rows = [(f"{(i * 131) % 211:03d}",) for i in range(211)]
    df = spark.createDataFrame(rows, "k string").repartition(6)
    points = total_order_split_points([r[0] for r in rows[::5]], 4)
    out = total_order_repartition(df, "k", points)
    parts = out.rdd.glom().collect()
    assert len(parts) == 4
    concat = []
    for i, part in enumerate(parts):
        keys = [r.k for r in part]
        assert keys == sorted(keys), f"partition {i} not sorted"
        lo = points[i - 1] if i > 0 else None
        hi = points[i] if i < len(points) else None
        for k in keys:
            assert lo is None or k >= lo
            assert hi is None or k < hi
        concat.extend(keys)
    assert concat == sorted(concat)
    assert len(concat) == 211


def test_end_to_end_partition_file_workflow(spark):
    """interval sample -> split points -> assignment: every record
    lands in a bucket, buckets respect the boundaries, and the bucket
    populations are non-trivially spread."""
    records = [(s, [f"{(s * 37 + i * 11) % 97:02d}" for i in range(40)]) for s in range(4)]
    df = _as_df(spark, records)
    sample = [r.key for r in interval_sample(df, "key", 0.25, "split", "pos").orderBy("_r").collect()]
    points = total_order_split_points(sample, 4)
    assert points == sorted(points)
    got = (
        df.select(total_order_assign(F.col("key"), points).alias("b"), "key")
        .groupBy("b")
        .count()
        .orderBy("b")
        .collect()
    )
    assert [r.b for r in got] == [0, 1, 2, 3]
    assert sum(r["count"] for r in got) == 160
