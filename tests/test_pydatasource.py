"""The wavfiles custom Python DataSource: listing, partitioning,
executor-side decode, metadata-only column skip."""

from __future__ import annotations

import os

import numpy as np
import pytest

from hadoop_3_3_6_spark.functions.multimodal import encode_wav
from hadoop_3_3_6_spark.sources.pydatasource import register_wav_source


@pytest.fixture()
def wav_dir(tmp_path):
    for i in range(6):
        (tmp_path / f"sig{i}.wav").write_bytes(
            encode_wav(np.full(20 + i, 100 * (i + 1), dtype=np.int16), 8000 + i)
        )
    return str(tmp_path)


def test_wav_source_reads_headers_and_payloads(spark, wav_dir):
    register_wav_source(spark)
    df = spark.read.format("wavfiles").load(wav_dir)
    rows = sorted(df.collect(), key=lambda r: r.path)
    assert len(rows) == 6
    for i, r in enumerate(rows):
        assert r.sample_rate == 8000 + i
        assert r.n_samples == 20 + i
        assert r.n_channels == 1
        assert bytes(r.payload) == open(os.path.join(wav_dir, f"sig{i}.wav"), "rb").read()
    # one partition per file — the FileInputFormat split contract
    assert df.rdd.getNumPartitions() == 6


def test_wav_source_metadata_only_and_glob(spark, wav_dir):
    register_wav_source(spark)
    meta = spark.read.format("wavfiles").option("metadata_only", "true").load(wav_dir + "/*.wav")
    assert meta.count() == 6
    assert meta.filter("payload is not null").count() == 0
    assert meta.agg({"n_samples": "sum"}).collect()[0][0] == sum(20 + i for i in range(6))


def test_wav_source_filter_pushdown_prunes_partitions(spark, wav_dir):
    """`path` equality/prefix filters must be consumed by pushFilters
    and prune the file LISTING — pruned files never become partitions
    (the setInputPathFilter analogue), instead of being read and then
    row-filtered."""
    register_wav_source(spark)
    one = os.path.join(wav_dir, "sig3.wav")
    df = spark.read.format("wavfiles").load(wav_dir).filter(f"path = '{one}'")
    assert df.rdd.getNumPartitions() == 1
    rows = df.collect()
    assert len(rows) == 1 and rows[0].sample_rate == 8003

    from pyspark.sql import functions as F

    pref = spark.read.format("wavfiles").load(wav_dir).filter(
        F.col("path").startswith(os.path.join(wav_dir, "sig1"))
    )
    # startswith -> StringStartsWith -> pruned at listing time
    assert pref.rdd.getNumPartitions() == 1
    assert pref.count() == 1


def test_wav_source_missing_path_fails(spark, tmp_path):
    register_wav_source(spark)
    with pytest.raises(Exception, match="no wav files|FileNotFound"):
        spark.read.format("wavfiles").load(str(tmp_path / "empty")).collect()
