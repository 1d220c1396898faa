"""Container-format and orchestration tests (SequenceFile, bucketed
MapFile analogue, fixed-length records, XML records, JobControl)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_3_3_6_spark.plans.jobcontrol import ControlledJob, JobControl, JobState
from hadoop_3_3_6_spark.sources.containers import (
    bucketed_table,
    read_fixed_length,
    read_sequence_file,
    read_xml_records,
    write_sequence_file,
)


def test_sequence_file_roundtrip(spark, tmp_path):
    """Real Hadoop SequenceFiles through the reference's own
    Writer/Reader classes (SequenceFile.java:847,1754)."""
    df = spark.createDataFrame([("k1", "v1"), ("k2", "v2"), ("k3", "v3")], "key string, value string")
    path = str(tmp_path / "seq")
    write_sequence_file(df, path)
    back = read_sequence_file(spark, path)
    assert {(r["key"], r["value"]) for r in back.collect()} == {("k1", "v1"), ("k2", "v2"), ("k3", "v3")}


def test_sequence_file_long_keys(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "key long, value string")
    path = str(tmp_path / "seq2")
    write_sequence_file(df, path)
    assert {tuple(r) for r in read_sequence_file(spark, path).collect()} == {(1, "a"), (2, "b")}


def test_seqfile_arrow_sink_java_reader_conformance(spark, tmp_path):
    """The Arrow-batched seqfile sink (sources/seqfile.py) writes the
    public SEQ v6 format executor-side — files must come back
    bit-correct through Hadoop's own Java SequenceFile.Reader
    (sc.sequenceFile), including sync markers (files here are well past
    the 2000-byte sync interval) and typed Writables."""
    import os

    df = spark.createDataFrame(
        [(f"k{i}", f"value-{i}" * 20) for i in range(4000)], "key string, value string"
    ).repartition(4)
    out = str(tmp_path / "seqbig")
    write_sequence_file(df, out)
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert [n for n in names if n.startswith("part-")] == [f"part-{i:05d}.seq" for i in range(4)]
    got = dict(spark.sparkContext.sequenceFile(out).collect())
    assert len(got) == 4000 and got["k7"] == "value-7" * 20

    # typed: (bigint, binary) -> (LongWritable, BytesWritable)
    df2 = spark.createDataFrame([(i, bytes([i % 256, 9])) for i in range(50)], "k bigint, v binary")
    out2 = str(tmp_path / "seqtyped")
    write_sequence_file(df2, out2)
    got2 = {k: bytes(v) for k, v in spark.sparkContext.sequenceFile(out2).collect()}
    assert got2 == {i: bytes([i % 256, 9]) for i in range(50)}


def test_seqfile_as_binary_raw_wire_bytes(spark, tmp_path):
    """SequenceFileAsBinaryInputFormat surfacing: key/value come back
    as the RAW serialized Writable wire bytes (nextRawKey/nextRawValue
    BytesWritable contract) — byte-pinned against an independent
    python rendering of the public formats, including a Text value
    past 127 bytes (multi-byte Hadoop vint prefix) and the 8-byte
    big-endian LongWritable key."""
    import struct

    from hadoop_3_3_6_spark.sources.containers import (
        read_sequence_file_as_binary,
        write_sequence_file,
    )

    long_text = "x" * 300  # vint -> 2-byte length prefix (0x8e, 0x01 form)
    df = spark.createDataFrame(
        [(1, "abc"), (2, long_text), (130, "")], "k bigint, v string"
    ).coalesce(1)
    out = str(tmp_path / "seqbin")
    write_sequence_file(df, out)
    got = {
        bytes(r.key): bytes(r.value)
        for r in read_sequence_file_as_binary(spark, out).collect()
    }

    def vint(i: int) -> bytes:
        # positive form of the public WritableUtils encoding: single
        # byte through 127, else marker -112-n (two's complement) then
        # n big-endian bytes
        if i <= 127:
            return struct.pack("b", i)
        body = i.to_bytes((i.bit_length() + 7) // 8, "big")
        return bytes([256 - 112 - len(body)]) + body

    assert vint(300) == bytes([0x8E, 0x01, 0x2C])
    expect = {
        struct.pack(">q", 1): vint(3) + b"abc",
        struct.pack(">q", 2): vint(300) + long_text.encode(),
        struct.pack(">q", 130): vint(0),
    }
    assert got == expect


def test_seqfile_sink_rejects_nulls(spark, tmp_path):
    """Writables are not nullable — a null key/value must fail the
    write loudly, not serialize garbage."""
    df = spark.createDataFrame([("a", "1"), (None, "2")], "key string, value string")
    with pytest.raises(Exception, match="[Nn]ullable|null"):
        write_sequence_file(df.coalesce(1), str(tmp_path / "seqnull"))


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    """MapFile/CompositeInputFormat property: equi-join of co-bucketed
    sorted tables runs with NO Exchange in the plan."""
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    ta = bucketed_table(a, "bt_a", ["k"], num_buckets=4)
    tb = bucketed_table(b, "bt_b", ["k"], num_buckets=4)
    # disable broadcast so the planner must consider SMJ — the bucketed
    # layout then elides the shuffle entirely (big-table⋈big-table case)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ta.join(tb, "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_fixed_length_records(spark, tmp_path):
    p = tmp_path / "fixed.bin"
    p.write_bytes(b"AAAABBBBCCCCDD")  # 3 full 4-byte records + partial tail
    out = read_fixed_length(spark, str(p), 4).orderBy("record_idx").collect()
    assert [bytes(r["record"]) for r in out] == [b"AAAA", b"BBBB", b"CCCC"]


def test_xml_records(spark, tmp_path):
    p = tmp_path / "data.xml"
    p.write_text("<root><rec id='1'>alpha\nbeta</rec><other/><rec id='2'>gamma</rec></root>")
    out = sorted(r["record"] for r in read_xml_records(spark, str(p), "rec").collect())
    assert out == ["<rec id='1'>alpha\nbeta</rec>", "<rec id='2'>gamma</rec>"]


def test_xml_records_prefix_extension_tag(spark, tmp_path):
    """A wrapper tag that is a prefix-extension of the record tag
    (<recs> around <rec>) must NOT be absorbed into a record span —
    the open-tag pattern only matches the exact tag name, bare or
    attribute-bearing."""
    p = tmp_path / "wrapped.xml"
    p.write_text("<recs>\n<rec>one</rec>\n<rec a='b'>two</rec>\n</recs>")
    out = sorted(r["record"] for r in read_xml_records(spark, str(p), "rec").collect())
    assert out == ["<rec a='b'>two</rec>", "<rec>one</rec>"]


def test_jobcontrol_dag_and_failure(spark):
    jc = JobControl()
    jc.add_job(ControlledJob("gen", lambda deps: spark.range(10).count()))
    jc.add_job(ControlledJob("use", lambda deps: deps["gen"] * 2, deps=["gen"]))
    jc.add_job(ControlledJob("boom", lambda deps: 1 / 0, deps=["gen"]))
    jc.add_job(ControlledJob("after_boom", lambda deps: 1, deps=["boom"]))
    jobs = jc.run()
    assert jobs["gen"].state == JobState.SUCCESS and jobs["use"].result == 20
    assert jobs["boom"].state == JobState.FAILED
    assert jobs["after_boom"].state == JobState.DEPENDENT_FAILED


def test_jobcontrol_cycle_detection():
    jc = JobControl()
    jc.add_job(ControlledJob("a", lambda d: 1, deps=["b"]))
    jc.add_job(ControlledJob("b", lambda d: 1, deps=["a"]))
    with pytest.raises(ValueError, match="cycle"):
        jc.run()


def test_parquet_bloom_filter_write(spark, tmp_path):
    """BloomMapFile analogue (HC/io/BloomMapFile.java:54): parquet with
    a bloom filter on the key column — point lookups skip row groups
    without the key."""
    p = str(tmp_path / "bloomed")
    df = spark.range(100000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    (
        df.write.option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "100000")
        .parquet(p)
    )
    back = spark.read.parquet(p).filter(F.col("k") == 12345)
    assert back.collect()[0]["v"] == 24690
    # the bloom filter really materialized: same data without bloom is smaller
    import glob
    import os as _os

    p2 = str(tmp_path / "plain")
    df.write.parquet(p2)
    size = lambda d: sum(_os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet"))
    assert size(p) > size(p2)


def test_sequence_file_compressed(spark, tmp_path):
    """SequenceFile.Writer compression surface (SequenceFile.java:240)."""
    from hadoop_3_3_6_spark.sources.containers import read_sequence_file, write_sequence_file

    df = spark.createDataFrame([(f"k{i}", "v" * 50) for i in range(100)], "key string, value string")
    p = str(tmp_path / "seqgz")
    write_sequence_file(df, p, codec="gzip")
    back = read_sequence_file(spark, p)
    assert back.count() == 100
    assert {r["key"] for r in back.collect()} == {f"k{i}" for i in range(100)}


def test_named_outputs(spark, tmp_path):
    """MultipleOutputs named-output API: N filtered outputs from one
    cached pass (MultipleOutputs.java:321,474)."""
    from pyspark.sql import functions as FF

    from hadoop_3_3_6_spark.sources.writers import named_outputs

    df = spark.range(100).select("id", (FF.col("id") % 2 == 0).alias("even"))
    base = str(tmp_path / "named")
    named_outputs(
        df,
        {
            "evens": (FF.col("even"), ["id"]),
            "odds": (~FF.col("even"), ["id"]),
        },
        base,
    )
    assert spark.read.parquet(f"{base}/evens").count() == 50
    assert spark.read.parquet(f"{base}/odds").count() == 50


def test_multi_path_scan(spark, tmp_path):
    """FileInputFormat multi-dir scan union (addInputPath over many
    dirs): spark.read accepts N paths in one scan."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(10).write.parquet(a)
    spark.range(10, 30).write.parquet(b)
    from pyspark.sql import functions as FF

    df = spark.read.parquet(a, b)
    assert df.count() == 30
    assert df.agg(FF.max("id")).collect()[0][0] == 29


def test_columnar_and_text_format_roundtrips(spark, tmp_path):
    """Spark-native format surface beyond the reference's container
    formats: CSV (TextInputFormat's delimited successor), JSON lines,
    and ORC round-trip with schema and values intact, compression on."""
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta,comma", None), (3, None, -0.25)],
        "id long, name string, score double",
    )
    expect = {(1, "alpha", 1.5), (2, "beta,comma", None), (3, None, -0.25)}

    csv_path = str(tmp_path / "csv")
    df.write.option("header", True).option("compression", "gzip").csv(csv_path)
    back = spark.read.option("header", True).schema(df.schema).csv(csv_path)
    assert {tuple(r) for r in back.collect()} == expect

    json_path = str(tmp_path / "json")
    df.write.option("compression", "gzip").json(json_path)
    back = spark.read.schema(df.schema).json(json_path)
    assert {tuple(r) for r in back.collect()} == expect

    orc_path = str(tmp_path / "orc")
    df.write.option("compression", "zlib").orc(orc_path)
    back = spark.read.orc(orc_path)
    assert back.schema == df.schema
    assert {tuple(r) for r in back.collect()} == expect


def test_mapfile_point_lookup_prunes_to_single_bucket(spark, sf_dir):
    """MapFile.Reader.get analogue: the lookup plan must touch ONE
    bucket (SelectedBucketsCount: 1 out of N), and return exactly what
    a full-scan filter returns."""
    from hadoop_3_3_6_spark.session import load_table
    from hadoop_3_3_6_spark.sources.containers import bucketed_table, mapfile_get

    cust = load_table(spark, "customer", sf_dir)
    bucketed_table(cust, "mapfile_cust", ["c_custkey"], num_buckets=8, sort_cols=["c_custkey"])
    got = mapfile_get(spark, "mapfile_cust", "c_custkey", 42)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    expect = cust.filter(F.col("c_custkey") == 42).collect()
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in expect]


def test_write_non_empty_suppresses_empty_part_files(spark, tmp_path):
    """LazyOutputFormat behavior: zero-row partitions leave no part
    file.  Spark's writer already does this for empty TASKS (pinned
    here so a regression reopens the gap); write_non_empty closes the
    remaining case — an entirely empty DataFrame's schema-only file."""
    import os

    from hadoop_3_3_6_spark.sources.writers import write_non_empty

    # 16 partitions, 10 rows: empty tasks leave no files (built-in lazy)
    df = spark.range(10).repartition(16)
    out = str(tmp_path / "lazy_parquet")
    removed = write_non_empty(df, out, fmt="parquet")
    assert removed == 0
    parts = [n for n in os.listdir(out) if n.startswith("part-")]
    assert 0 < len(parts) < 16, parts
    back = spark.read.parquet(out)
    assert sorted(r["id"] for r in back.collect()) == list(range(10))

    # fully empty frame: the single schema-only part file is pruned
    out_empty = str(tmp_path / "lazy_empty")
    removed_empty = write_non_empty(df.filter("id < 0"), out_empty, fmt="parquet")
    assert removed_empty == 1
    assert [n for n in os.listdir(out_empty) if n.startswith("part-")] == []

    out_txt = str(tmp_path / "lazy_text")
    removed_txt = write_non_empty(
        df.filter("id < 0").selectExpr("cast(id as string) as value"), out_txt, fmt="text"
    )
    assert removed_txt == 1
    assert [n for n in os.listdir(out_txt) if n.startswith("part-")] == []


def test_compact_files_reduces_file_count_preserving_rows(spark, tmp_path):
    """Small-files compaction: a 40-part table rewrites to the computed
    ceil(bytes/target) file count with identical content."""
    import os

    from hadoop_3_3_6_spark.sources.writers import compact_files

    p = str(tmp_path / "frag")
    spark.range(20_000).selectExpr("id", "id * 2 AS v").repartition(40).write.parquet(p)
    before = sorted(r.id for r in spark.read.parquet(p).collect())
    n_parts = len([n for n in os.listdir(p) if n.startswith("part-")])
    assert n_parts == 40

    stats = compact_files(spark, p, target_file_bytes=64 * 1024)
    after_parts = len([n for n in os.listdir(p) if n.startswith("part-")])
    assert stats["files_before"] == 40
    assert after_parts == stats["files_after"] < 40
    assert sorted(r.id for r in spark.read.parquet(p).collect()) == before


def test_versioned_table_time_travel_merge_and_vacuum(spark, tmp_path):
    """Versioned tables: each MERGE publishes an immutable version,
    readers time-travel by number or follow _latest, vacuum keeps the
    newest N and never the pointed-to version."""
    from hadoop_3_3_6_spark.operators.joins import merge_upsert
    from hadoop_3_3_6_spark.sources.versions import (
        latest_version,
        read_version,
        vacuum,
        write_version,
    )

    t = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    assert write_version(base, t) == 1

    upd = spark.createDataFrame([(2, 99.0, False), (4, 40.0, False), (3, 0.0, True)],
                                "k long, v double, dead boolean")
    v2 = merge_upsert(read_version(spark, t), upd, on="k", tombstone_col="dead")
    assert write_version(v2, t) == 2
    assert write_version(read_version(spark, t).filter("k != 4"), t) == 3

    assert latest_version(t) == 3
    # time travel: v1 pristine, v2 shows the merge, latest the filter
    assert {r.k: r.v for r in read_version(spark, t, 1).collect()} == {1: 10.0, 2: 20.0, 3: 30.0}
    assert {r.k: r.v for r in read_version(spark, t, 2).collect()} == {1: 10.0, 2: 99.0, 4: 40.0}
    assert {r.k: r.v for r in read_version(spark, t).collect()} == {1: 10.0, 2: 99.0}

    assert vacuum(t, keep=1) == [1, 2]
    assert {r.k for r in read_version(spark, t).collect()} == {1, 2}
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_version(spark, t, 1)


def test_vacuum_spares_inflight_writes_sweeps_old_torn(spark, tmp_path):
    """vacuum must never delete an UNCOMMITTED dir numbered above the
    newest committed version — that is a concurrent write_version still
    landing its parquet (parquet written, _SUCCESS/pointer not flipped
    yet).  Torn dirs BELOW the newest committed version are dead
    (their writer already lost the race) and are swept."""
    import os

    from hadoop_3_3_6_spark.sources.versions import vacuum, write_version

    t = str(tmp_path / "tbl")
    write_version(spark.range(3), t)  # v1 committed
    write_version(spark.range(5), t)  # v2 committed
    write_version(spark.range(7), t)  # v3 committed...
    os.remove(os.path.join(t, "v=00003", "_SUCCESS"))  # ...then dead-torn
    write_version(spark.range(9), t)  # v4 committed, _latest=4
    inflight = os.path.join(t, "v=00005")  # concurrent writer mid-flight
    os.makedirs(inflight)
    open(os.path.join(inflight, "part-00000.parquet"), "wb").close()

    dropped = vacuum(t, keep=2)
    # v1 aged out, v3 is dead-torn below newest committed (4) -> swept;
    # v2/v4 kept; v5 (in-flight, above newest committed) untouched
    assert dropped == [1, 3]
    assert os.path.isdir(inflight)
    assert os.path.isdir(os.path.join(t, "v=00002"))
    assert os.path.isdir(os.path.join(t, "v=00004"))


def test_versioned_table_refuses_torn_writes(spark, tmp_path):
    """A version dir without Spark's _SUCCESS marker (write died
    mid-job) is never a read target, never the latest-fallback, and
    its number is never reused."""
    import os
    import shutil

    import pytest as _pytest

    from hadoop_3_3_6_spark.sources.versions import latest_version, read_version, write_version

    t = str(tmp_path / "tbl")
    write_version(spark.range(4), t)
    # simulate a torn v2: parquet files but no _SUCCESS
    write_version(spark.range(9), t)
    os.remove(os.path.join(t, "v=00002", "_SUCCESS"))

    with _pytest.raises(FileNotFoundError, match="uncommitted"):
        read_version(spark, t, 2)
    # pointer still names v2 (flip happened before we tore it) — but a
    # LOST pointer must fall back to the highest COMMITTED version
    os.remove(os.path.join(t, "_latest"))
    assert latest_version(t) == 1
    assert read_version(spark, t).count() == 4
    # the torn number is not reused
    assert write_version(spark.range(2), t) == 3


def test_bloom_indexed_write_adds_filters_and_roundtrips(spark, sf_dir, tmp_path):
    """BloomMapFile analogue (io/BloomMapFile.java:53): parquet row-group
    bloom filters on the key column.  The filter bytes must actually
    land in the files (size delta vs a plain write of identical data)
    and the data must be untouched."""
    import glob
    import os

    from hadoop_3_3_6_spark.session import load_table
    from hadoop_3_3_6_spark.sources.writers import write_bloom_indexed

    cust = load_table(spark, "customer", sf_dir).repartition(2)
    bloom_dir, plain_dir = str(tmp_path / "bloom"), str(tmp_path / "plain")
    write_bloom_indexed(cust, bloom_dir, ["c_custkey"], expected_ndv=5000)
    cust.write.mode("overwrite").parquet(plain_dir)
    bloom_bytes = sum(os.path.getsize(f) for f in glob.glob(f"{bloom_dir}/part-*"))
    plain_bytes = sum(os.path.getsize(f) for f in glob.glob(f"{plain_dir}/part-*"))
    assert bloom_bytes > plain_bytes + 1024, (bloom_bytes, plain_bytes)
    back = spark.read.parquet(bloom_dir)
    assert back.count() == cust.count()
    assert back.filter("c_custkey = 7").count() == cust.filter("c_custkey = 7").count()


def test_token_shards_format_and_roundtrip(spark, tmp_path):
    """Megatron indexed-dataset conformance: the .idx parses per the
    public field layout (magic, version, dtype code, counts, sizes,
    pointers, doc_idx), pointers are the byte-exact cumulative sizes,
    the .bin length equals sum(sizes)*itemsize — and the distributed
    read restores every (doc_id, token_ids) row exactly, including a
    zero-token document."""
    import struct

    import numpy as np

    from hadoop_3_3_6_spark.sources.tokenshards import (
        decode_idx,
        read_token_shards,
        write_token_shards,
    )

    rows = [(0, [5, 1, 3]), (1, []), (2, [7]), (3, [2, 2, 2, 2])]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    out = str(tmp_path / "shards")
    manifest = write_token_shards(df.repartition(2, "doc_id"), out, "doc_id", "token_ids").collect()
    assert sum(m.n_docs for m in manifest) == 4
    assert sum(m.n_tokens for m in manifest) == 8
    import os

    stems = sorted(p[:-4] for p in os.listdir(out) if p.endswith(".idx"))
    assert stems and all(
        os.path.exists(os.path.join(out, s + ext)) for s in stems for ext in (".bin", ".ids")
    )
    for s in stems:
        payload = open(os.path.join(out, s + ".idx"), "rb").read()
        # raw field walk per the public layout, independent of decode_idx
        assert payload[:9] == b"MMIDIDX\x00\x00"
        assert struct.unpack_from("<Q", payload, 9)[0] == 1
        assert struct.unpack_from("<B", payload, 17)[0] == 4  # int32
        n_seq = struct.unpack_from("<Q", payload, 18)[0]
        # document count sizes the public reader's doc_idx mmap:
        # len(doc_idx) = sequences + 1 (the 0..n boundary array)
        assert struct.unpack_from("<Q", payload, 26)[0] == n_seq + 1
        dtype, sizes, pointers = decode_idx(payload)
        assert dtype is np.int32 and len(sizes) == n_seq
        expect_ptrs = np.zeros(n_seq, dtype=np.int64)
        if n_seq > 1:
            expect_ptrs[1:] = np.cumsum(sizes[:-1].astype(np.int64)) * 4
        assert (pointers == expect_ptrs).all()
        bin_len = os.path.getsize(os.path.join(out, s + ".bin"))
        assert bin_len == int(sizes.astype(np.int64).sum()) * 4
        doc_idx = np.frombuffer(payload[34 + 12 * n_seq:], dtype=np.int64)
        assert (doc_idx == np.arange(n_seq + 1)).all()
    rb = read_token_shards(spark, out)
    # the read side must give exactly one task per shard triple (the
    # dense-index range partitioning; a hash on the stem collides)
    assert rb.rdd.getNumPartitions() == len(stems)
    back = {r.doc_id: list(r.token_ids) for r in rb.collect()}
    assert back == {i: ids for i, ids in rows}


def test_token_shards_int64_reads_losslessly(spark, tmp_path):
    """The reader honors the FULL public dtype registry: an
    int64-written shard with token ids above 2^31 must round-trip
    exactly — the earlier unconditional astype(int32) silently
    truncated them (round-9 ADVICE fix), so the output schema is
    array<bigint>."""
    import numpy as np

    from hadoop_3_3_6_spark.sources.tokenshards import (
        read_token_shards,
        write_token_shards,
    )

    big = 2**33 + 7
    rows = [(0, [big, 1]), (1, [2**31, 2**40])]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<long>")
    out = str(tmp_path / "shards64")
    write_token_shards(df.coalesce(1), out, "doc_id", "token_ids", dtype=np.int64).collect()
    rb = read_token_shards(spark, out)
    assert dict(rb.dtypes)["token_ids"] == "array<bigint>"
    back = {r.doc_id: list(r.token_ids) for r in rb.collect()}
    assert back == {i: ids for i, ids in rows}


def test_mmididx_float_dtype_code_fails_actionably():
    """Round-10 binary-source review: codes 6/7 (float32/float64) are
    valid MMIDIDX dtypes in the public registry but not token-id data —
    the reader must name its integer-only contract, not KeyError."""
    import struct

    import pytest

    from hadoop_3_3_6_spark.sources.tokenshards import decode_idx, encode_idx

    payload = bytearray(encode_idx([3, 2]))
    assert struct.unpack_from("<B", payload, 17)[0] == 4  # int32 written
    payload[17] = 6  # float32 per the public registry
    with pytest.raises(ValueError, match="dtype code 6"):
        decode_idx(bytes(payload))


def test_auto_input_format_magic_dispatch(spark, tmp_path):
    """AutoInputFormat (HT/hadoop-streaming/.../AutoInputFormat.java:40):
    per-file 3-byte sniff — 'SEQ' routes to the SequenceFile reader,
    everything else (including empty and shorter-than-header files,
    the reference's EOFException branch) to the text reader; output
    is the stable (fmt, key, value) string surface."""
    from hadoop_3_3_6_spark.sources.containers import read_auto

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "key long, value string"
    )
    base = tmp_path / "auto"
    base.mkdir()
    write_sequence_file(df, str(base / "seqpart"))
    (base / "lines.txt").write_text("one\ntwo\nthree\n")
    (base / "empty.dat").write_bytes(b"")
    (base / "short.dat").write_bytes(b"SE")
    out = read_auto(spark, str(base))
    rows = {(r.fmt, r.key, r.value) for r in out.collect()}
    assert rows == {
        ("seq", "1", "alpha"),
        ("seq", "2", "beta"),
        ("text", None, "one"),
        ("text", None, "two"),
        ("text", None, "three"),
        ("text", None, "SE"),
    }


def test_auto_input_format_single_file_and_empty_dir(spark, tmp_path):
    from hadoop_3_3_6_spark.sources.containers import read_auto

    one = tmp_path / "only.txt"
    one.write_text("solo\n")
    out = read_auto(spark, str(one))
    assert [(r.fmt, r.key, r.value) for r in out.collect()] == [("text", None, "solo")]
    empty = tmp_path / "nothing"
    empty.mkdir()
    assert read_auto(spark, str(empty)).count() == 0
