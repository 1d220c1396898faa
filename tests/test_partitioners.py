"""Reference-exact partitioner family (operators/partitioners.py).

Pins the Java hashCode algebra three ways: against the LIVE JVM
(java.util.Arrays.hashCode(byte[]) is the identical 31-based rolling
hash WritableComparator.hashBytes runs — same start value 1, same
signed bytes, same int wraparound), against a python port of each
reference loop, and against the DuckDB oracle renderers the driver
rows replay.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from hadoop_3_3_6_spark.operators.partitioners import (
    REHASH_SEED,
    binary_partition,
    duckdb_hash_bytes_sql,
    duckdb_rehash_sql,
    hash_partition,
    int_writable_hash,
    java_hash_bytes,
    long_writable_hash,
    partition_by_reference,
    rehash_partition,
    text_hash_code,
)


def _jwrap(x: int) -> int:
    return ((x + 2**31) % 2**32) - 2**31


def _py_hash_bytes(bs: bytes, off: int = 0, ln: int | None = None) -> int:
    # WritableComparator.java:242 port
    ln = len(bs) - off if ln is None else ln
    h = 1
    for b in bs[off : off + max(ln, 0)]:
        h = _jwrap(31 * h + (b - 256 if b > 127 else b))
    return h


def _py_rehash(hash_code: int, n: int) -> int:
    # RehashPartitioner.java:41-46 port (on the unsigned 32-bit image)
    h = (REHASH_SEED ^ hash_code) & 0xFFFFFFFF
    h ^= (h >> 20) ^ (h >> 12)
    h = h ^ (h >> 7) ^ (h >> 4)
    return (h & 0x7FFFFFFF) % n


_STRINGS = [
    "",
    "hello",
    "héllo",
    "Clerk#000000951",
    "日本語テキスト",
    "a" * 300,
    "\x00\x7f߿ࠀ",
]
_rng = random.Random(20260816)
_STRINGS += [
    "".join(chr(_rng.randint(1, 0x2FF)) for _ in range(_rng.randint(0, 40)))
    for _ in range(25)
]


def test_text_hash_vs_live_jvm(spark):
    """The Column expression must equal the real JVM's rolling hash
    (java.util.Arrays.hashCode over the same UTF-8 bytes) AND the
    python port — including multi-byte UTF-8, empty, and long keys."""
    df = spark.createDataFrame([(s,) for s in _STRINGS], "s string")
    rows = df.select(
        "s",
        text_hash_code(F.col("s")).alias("h"),
        hash_partition(text_hash_code(F.col("s")), 17).alias("p"),
    ).collect()
    jvm = spark.sparkContext._jvm
    for r in rows:
        bs = r.s.encode("utf-8")
        exp = _py_hash_bytes(bs)
        assert exp == jvm.java.util.Arrays.hashCode(bytearray(bs))
        assert r.h == exp, (r.s, r.h, exp)
        assert r.p == (exp & 0x7FFFFFFF) % 17


def test_raw_byte_hash_vs_live_jvm(spark):
    """Raw (non-UTF-8) byte keys through java_hash_bytes — the
    BytesWritable arm — vs the JVM and the port."""
    rng = random.Random(7)
    rows_in = [
        (bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 64))),)
        for _ in range(30)
    ]
    df = spark.createDataFrame(rows_in, "b binary")
    rows = df.select("b", java_hash_bytes(F.col("b")).alias("h")).collect()
    jvm = spark.sparkContext._jvm
    for r in rows:
        bs = bytes(r.b) if r.b is not None else b""
        exp = _py_hash_bytes(bs)
        assert exp == jvm.java.util.Arrays.hashCode(bytearray(bs))
        assert r.h == exp


def test_int_long_writable_narrowing(spark):
    """IntWritable.hashCode == value; LongWritable.hashCode ==
    (int) value — the LOW 32 bits (LongWritable.java:71), not
    java.lang.Long's xor-fold."""
    vals = [0, 1, -1, 123, -7, 2**31 - 1, -(2**31), 2**40 + 5, -(2**33) - 9]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v",
        int_writable_hash(F.col("v")).alias("ih"),
        long_writable_hash(F.col("v")).alias("lh"),
        hash_partition(long_writable_hash(F.col("v")), 16).alias("p"),
    ).collect()
    for r in rows:
        exp = _jwrap(r.v)
        assert r.ih == exp and r.lh == exp
        assert r.p == (exp & 0x7FFFFFFF) % 16
        # xor-fold would differ for wide values: prove we did NOT do it
        if abs(r.v) >= 2**32:
            assert exp != _jwrap(r.v ^ (r.v >> 32)) or (r.v >> 32) == 0


def test_rehash_partition_port_and_smoothing(spark):
    """Rehash ids match the reference-loop port exactly; and on the
    pattern RehashPartitioner exists for (keys all ≡ 0 mod n, which
    plain hashCode%n collapses onto ONE partition) the avalanche
    spreads them broadly."""
    keys = [i * 16 for i in range(512)] + [3, -5, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(k,) for k in keys], "v long")
    rows = df.select(
        "v",
        hash_partition(int_writable_hash(F.col("v")), 16).alias("plain"),
        rehash_partition(int_writable_hash(F.col("v")), 16).alias("re"),
    ).collect()
    for r in rows:
        hc = _jwrap(r.v)
        assert r.plain == (hc & 0x7FFFFFFF) % 16
        assert r.re == _py_rehash(hc & 0xFFFFFFFF, 16)
    pattern = [r for r in rows if r.v % 16 == 0 and r.v >= 0]
    assert len({r.plain for r in pattern}) == 1  # the collapse
    assert len({r.re for r in pattern}) >= 12  # the smoothing


def test_binary_partition_offsets(spark):
    """BinaryPartitioner.java:133-139: per-row python-style offset
    resolution, INCLUSIVE right end, negative offsets; an
    inverted/empty slice hashes like the reference's empty loop (1)."""
    rng = random.Random(11)
    rows_in = [
        (bytes(rng.randint(0, 255) for _ in range(rng.randint(1, 30))),)
        for _ in range(40)
    ]
    df = spark.createDataFrame(rows_in, "b binary")
    for lo, ro in [(0, -1), (2, -3), (-4, -1), (1, 1), (5, 2)]:
        rows = df.select("b", binary_partition(F.col("b"), 8, lo, ro).alias("p")).collect()
        for r in rows:
            bs = bytes(r.b)
            L = len(bs)
            li, ri = (lo + L) % L, (ro + L) % L
            exp = (_py_hash_bytes(bs, li, ri - li + 1) & 0x7FFFFFFF) % 8
            assert r.p == exp, (lo, ro, bs.hex(), r.p, exp)


def test_partition_by_reference_colocation(spark):
    """The Partitioner CONTRACT: repartitioning on the reference
    assignment co-locates every record of one reference partition in
    exactly one physical task."""
    df = spark.range(0, 2000).select(
        F.concat(F.lit("k"), (F.col("id") % 97).cast("string")).alias("key")
    )
    out = partition_by_reference(
        df, hash_partition(text_hash_code(F.col("key")), 16), 16
    )
    per = (
        out.select("part_id", F.spark_partition_id().alias("pid"))
        .groupBy("part_id")
        .agg(F.countDistinct("pid").alias("np"))
        .collect()
    )
    assert per and all(r.np == 1 for r in per)
    assert {r.part_id for r in per} <= set(range(16))


def test_duckdb_oracle_renderers_match_spark(spark):
    """The oracle renderers the driver rows use must replay the Spark
    expressions bit-for-bit: whole-blob hash, hex-sliced subrange
    hash, and the rehash mix — over adversarial strings."""
    con = duckdb.connect()
    df = spark.createDataFrame([(s,) for s in _STRINGS if s], "s string")
    got = {
        r.s: (r.h, r.hs, r.rp)
        for r in df.select(
            "s",
            text_hash_code(F.col("s")).alias("h"),
            java_hash_bytes(
                F.encode(F.col("s"), "UTF-8"),
                start=F.lit(1),
                length=F.length(F.encode(F.col("s"), "UTF-8")).cast("long") - 2,
            ).alias("hs"),
            rehash_partition(text_hash_code(F.col("s")), 13).alias("rp"),
        ).collect()
    }
    whole = duckdb_hash_bytes_sql("encode(s)")
    sliced = duckdb_hash_bytes_sql("encode(s)", "1", "octet_length(encode(s)) - 2")
    rp = duckdb_rehash_sql(whole, 13)
    for s, (h, hs, rp_spark) in got.items():
        oh, ohs, orp = con.execute(
            f"SELECT {whole}, {sliced}, {rp} FROM (SELECT ? AS s)", [s]
        ).fetchone()
        assert (oh, ohs, orp) == (h, hs, rp_spark), s


def test_hash_partition_negative_hash_mask(spark):
    """(h & Integer.MAX_VALUE) must read the LOW 31 BITS of a negative
    hashCode (two's complement), NOT abs(h) — e.g. h = -2 maps to
    Integer.MAX_VALUE - 1."""
    df = spark.createDataFrame([(-2,), (-(2**31),), (-1,)], "v long")
    rows = df.select(
        "v", hash_partition(int_writable_hash(F.col("v")), 1 << 20).alias("p")
    ).collect()
    for r in rows:
        assert r.p == (_jwrap(r.v) & 0x7FFFFFFF) % (1 << 20)
    by_v = {r.v: r.p for r in rows}
    assert by_v[-2] == (0x7FFFFFFF - 1) % (1 << 20)  # not abs(-2)
    assert by_v[-(2**31)] == 0  # sign bit masked away


def test_java_string_hash_code_vs_live_jvm(spark):
    """java.lang.String.hashCode (the KeyFieldBasedPartitioner.java:90
    no-spec fallback) over UTF-16 CODE UNITS — astral chars contribute
    both surrogates; pinned against the live JVM's own String.hashCode
    (py4j auto-converts python str to java.lang.String)."""
    strings = [s for s in _STRINGS] + ["astral \U0001F600 pair", "\U00010000"]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    from hadoop_3_3_6_spark.operators.partitioners import java_string_hash_code

    rows = df.select("s", java_string_hash_code(F.col("s")).alias("h")).collect()
    jvm = spark.sparkContext._jvm
    for r in rows:
        exp = jvm.java.util.Objects.hashCode(r.s)
        assert r.h == exp, (repr(r.s), r.h, exp)


def _ref_keyfield_partition(line: str, keys, n: int) -> int:
    """Python port of KeyFieldBasedPartitioner.getPartition
    (KeyFieldBasedPartitioner.java:85-131): byte extents per
    KeyFieldHelper's accumulators, 31-based hash seeded 0, chained
    across specs, missing-field continue, empty record -> 0."""
    data = line.encode("utf-8")
    if keys and len(data) == 0:
        return 0
    if not keys:
        h = 0
        enc = line.encode("utf-16-be")
        for i in range(0, len(enc), 2):
            h = _jwrap(31 * h + (enc[i] * 256 + enc[i + 1]))
        return (h & 0x7FFFFFFF) % n
    parts = [p.encode("utf-8") for p in line.split("\t")]
    L = len(data)

    def prefix(f: int) -> int:
        return sum(len(parts[j]) + 1 for j in range(f - 1))

    h = 0
    for bf, bc, ef, ec, _n_, _r_ in keys:
        if len(parts) < bf:
            continue
        start = prefix(bf) + bc - 1
        if start >= L:
            continue  # getStartOffset's -1 arm
        if ef == 0 or len(parts) < ef:
            end = L - 1
        else:
            pos = prefix(ef) + (len(parts[ef - 1]) if ec == 0 else 0) + ec
            end = min(pos, L) - 1
        for b in data[start : end + 1]:
            h = _jwrap(31 * h + (b - 256 if b > 127 else b))
    return (h & 0x7FFFFFFF) % n


def test_key_field_partition_differential(spark):
    """DIFFERENTIAL conformance for the byte-exact
    KeyFieldBasedPartitioner: random tab records (small alphabet with
    multi-byte UTF-8, 0-3 char fields — maximizes empty fields,
    missing fields, offsets running across separators) x a spec
    battery, every partition id must equal the python port of the
    reference loop; plus the no-spec String.hashCode fallback and the
    empty-record -> 0 rule."""
    import random

    from hadoop_3_3_6_spark.operators.sort import (
        key_field_partition,
        parse_key_field_spec_full,
    )

    rng = random.Random(23)

    def rec() -> str:
        return "\t".join(
            "".join(rng.choice("ab1é→") for _ in range(rng.randint(0, 3)))
            for _ in range(rng.randint(1, 4))
        )

    rows = [(i, rec()) for i in range(120)] + [(997, ""), (998, "\t\t"), (999, "xé")]
    df = spark.createDataFrame(rows, "i long, line string")
    specs = [
        "-k2", "-k2,2", "-k1.2,2.1", "-k1,1", "-k3.2,3.0", "-k4,4",
        "-k2,2 -k1,1", "-k1.3,1.2", "-k1.1,4.0", "-k2.2,2", "-k1,2 -k3,3",
        None,
    ]
    for spec in specs:
        keys = parse_key_field_spec_full(spec) if spec else []
        got = {
            r.i: r.p
            for r in df.select(
                "i", key_field_partition("line", spec, 13).alias("p")
            ).collect()
        }
        by_i = dict(rows)
        for i, line in rows:
            exp = _ref_keyfield_partition(line, keys, 13)
            assert got[i] == exp, (spec, repr(line), got[i], exp)


def test_binary_partition_empty_key_is_null(spark):
    """A zero-length key divides by zero in the reference
    (ArithmeticException); here the id must surface as NULL — never a
    plausible-looking id minted from the empty-fold seed (round-12
    review finding)."""
    df = spark.createDataFrame([(b"",), (b"x",)], "b binary")
    rows = {len(bytes(r.b)): r.p for r in df.select(
        "b", binary_partition(F.col("b"), 8, 0, -1).alias("p")).collect()}
    assert rows[0] is None
    assert rows[1] == (_py_hash_bytes(b"x") & 0x7FFFFFFF) % 8
