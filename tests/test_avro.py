"""Avro container-file codec tests (SURVEY.md §2.1 Avro row).

The killer check: files written by the pure-Python codec are read back
by the REAL Java Avro library (org.apache.avro.file.DataFileReader,
avro-1.12.1.jar on Spark's classpath) — format conformance proven
against the reference implementation, not just self-consistency.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_3_3_6_spark.session import load_table
from hadoop_3_3_6_spark.sources.avro_io import (
    avro_schema_of,
    decode_container,
    encode_container,
    read_avro,
    write_avro,
)


def test_container_bytes_roundtrip():
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("blob", T.BinaryType(), True),
        ]
    )
    rows = [
        (1, "alpha", 1.5, True, b"\x00\xff"),
        (-7, None, -2.25, False, None),
        (2**40, "utf8 éè", None, True, b""),
    ]
    a_schema = avro_schema_of(schema)
    data = encode_container(rows, a_schema, codec="null", sync_seed="t")
    got_schema, got_rows = decode_container(data)
    assert got_rows == rows
    assert [f["name"] for f in got_schema["fields"]] == ["id", "name", "score", "ok", "blob"]
    # deflate codec roundtrip
    data_z = encode_container(rows, a_schema, codec="deflate", sync_seed="t")
    assert decode_container(data_z)[1] == rows
    assert len(data_z) != len(data)
    # deterministic bytes (reproducible writes)
    assert data == encode_container(rows, a_schema, codec="null", sync_seed="t")


def test_spark_write_read_avro(spark, sf_dir, tmp_path):
    nation = load_table(spark, "nation", sf_dir)
    out = str(tmp_path / "nation_avro")
    n_files = write_avro(nation, out, codec="deflate")
    assert n_files >= 1
    back = read_avro(spark, out)
    assert [tuple(r) for r in sorted(back.collect())] == [tuple(r) for r in sorted(nation.collect())]


def test_java_avro_reads_our_files(spark, sf_dir, tmp_path):
    """Format conformance: the canonical Java Avro DataFileReader (from
    the avro jar Spark itself bundles) must parse our container files,
    for both the null and deflate codecs."""
    nation = load_table(spark, "nation", sf_dir).orderBy("n_nationkey")
    expected = [(r["n_nationkey"], r["n_name"]) for r in nation.collect()]
    for codec in ("null", "deflate"):
        out = str(tmp_path / f"avro_{codec}")
        write_avro(nation.coalesce(1), out, codec=codec)
        import glob

        (path,) = glob.glob(out + "/*.avro")
        jvm = spark.sparkContext._jvm
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.org.apache.avro.file.SeekableFileInput(jvm.java.io.File(path)),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        got = []
        while reader.hasNext():
            rec = reader.next()
            got.append((rec.get("n_nationkey"), str(rec.get("n_name"))))
        reader.close()
        assert got == expected, f"codec={codec}"


def test_avro_rejects_unsupported_types(spark):
    df = spark.createDataFrame([([1, 2],)], "xs array<int>")
    with pytest.raises(ValueError, match="unsupported Spark type"):
        avro_schema_of(df.schema)


def test_container_roundtrip_property():
    """Property test: arbitrary rows of the supported primitive surface
    survive the container roundtrip byte-exactly (both codecs)."""
    import math

    import pyspark.sql.types as T
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.DoubleType(), True),
            T.StructField("d", T.BooleanType(), False),
            T.StructField("e", T.BinaryType(), True),
        ]
    )
    a_schema = avro_schema_of(schema)
    row = st.tuples(
        st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(st.none(), st.floats(allow_nan=False)),
        st.booleans(),
        st.one_of(st.none(), st.binary(max_size=40)),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(row, max_size=12), st.sampled_from(["null", "deflate"]))
    def roundtrip(rows, codec):
        _, got = decode_container(encode_container(rows, a_schema, codec=codec, sync_seed="p"))
        assert len(got) == len(rows)
        for g, r in zip(got, rows):
            for gv, rv in zip(g, r):
                if isinstance(rv, float):
                    assert gv == rv or (math.isinf(rv) and gv == rv)
                else:
                    assert gv == rv

    roundtrip()


def test_avro_reader_splits_large_container_exactly_once(spark, tmp_path):
    """The sync-marker splitter: one large multi-block container read
    with a tiny split_size must fan out into many byte-range
    partitions and still return every record exactly once, for both
    codecs (DataFileReader.sync semantics: a split owns blocks whose
    offset falls inside [start, end))."""
    from hadoop_3_3_6_spark.sources.avro_io import read_avro, register_avro_sink, write_avro

    for codec in ("null", "deflate"):
        out = str(tmp_path / f"big_{codec}")
        df = spark.range(20000).selectExpr(
            "id", "concat('payload-', id, '-', repeat('x', 40)) AS s"
        ).coalesce(1)  # ONE container file, many Arrow-batch blocks
        write_avro(df, out, codec=codec)
        import os

        files = [n for n in os.listdir(out) if n.endswith(".avro")]
        assert len(files) == 1
        size = os.path.getsize(os.path.join(out, files[0]))
        assert size > 64 * 1024  # big enough to split meaningfully

        back = read_avro(spark, out, split_size=16 * 1024)
        n_parts = back.rdd.getNumPartitions()
        assert n_parts >= size // (16 * 1024), (n_parts, size)
        rows = back.collect()
        assert len(rows) == 20000
        ids = {r.id for r in rows}
        assert ids == set(range(20000))
        sample = next(r for r in rows if r.id == 12345)
        assert sample.s == "payload-12345-" + "x" * 40


def test_avro_reader_single_split_small_file(spark, tmp_path):
    """A file smaller than split_size gets exactly one partition (no
    degenerate empty splits) and reads identically."""
    from hadoop_3_3_6_spark.sources.avro_io import read_avro, write_avro

    out = str(tmp_path / "small")
    df = spark.range(50).selectExpr("id", "concat('v', id) AS s").coalesce(1)
    write_avro(df, out)
    back = read_avro(spark, out)  # default 32 MB split ≫ file size
    assert back.rdd.getNumPartitions() == 1
    assert {(r.id, r.s) for r in back.collect()} == {(i, f"v{i}") for i in range(50)}


def test_avro_split_ownership_at_exact_block_boundaries():
    """Round-10 binary-source review pin (DataFileReader.sync
    semantics): a split whose start lands EXACTLY on a block boundary
    (= one byte past the previous block's sync) owns the block that
    starts there; a split ending exactly there does not re-read it;
    and a start landing mid-sync resolves to the same boundary.
    Exercised by calling the reader on hand-chosen byte ranges."""
    import hashlib

    from hadoop_3_3_6_spark.sources.avro_io import (
        AvroReader,
        _AvroSplit,
        encode_container_block,
        encode_container_header,
    )

    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "id", "type": "long"}],
    }
    sync = hashlib.md5(b"spark-graft-avro:boundary-test").digest()
    header = encode_container_header(schema, "null", sync)
    blocks = [
        encode_container_block([(i,) for i in range(k * 10, k * 10 + 10)], ["long"], "null", sync)
        for k in range(3)
    ]
    import tempfile, os

    d = tempfile.mkdtemp()
    path = os.path.join(d, "b.avro")
    with open(path, "wb") as f:
        f.write(header + b"".join(blocks))
    hlen = len(header)
    e1 = hlen + len(blocks[0])
    e2 = e1 + len(blocks[1])
    e3 = e2 + len(blocks[2])

    rdr = AvroReader({"path": path})

    def ids(start, end):
        out = []
        for rb in rdr.read(_AvroSplit(path, start, end)):
            out += rb.column(0).to_pylist()
        return out

    assert ids(0, e3) == list(range(30))          # whole file
    assert ids(0, e1) == list(range(10))          # ends exactly at boundary
    assert ids(e1, e3) == list(range(10, 30))     # starts exactly at boundary
    assert ids(e1, e2) == list(range(10, 20))     # one interior block
    assert ids(e1 - 8, e2) == list(range(10, 20)) # start mid-sync -> same boundary
    assert ids(0, e1) + ids(e1, e2) + ids(e2, e3) == list(range(30))  # 3-way, exactly once
