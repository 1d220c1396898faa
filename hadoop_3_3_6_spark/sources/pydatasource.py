"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API)
for WAV audio ingestion — the FileInputFormat analogue for a media
corpus (reference: mapreduce/lib/input/FileInputFormat.java:1 computes
splits on the driver and hands each to a record reader on an executor;
here ``partitions()`` lists files driver-side and ``read()`` decodes
on executors).

``spark.read.format("wavfiles").load(glob)`` yields one row per audio
file: (path, sample_rate, n_channels, n_samples, payload) with the
RIFF header parsed by the pure-numpy decoder
(functions/multimodal.decode_wav).  ``option("metadata_only", "true")``
skips shipping payload bytes (header-only scan — the column-pruned
fast path for corpus stats over millions of files).

Scale notes: file listing is a driver-side glob (like every Spark file
source's InMemoryFileIndex); each file is one InputPartition, so
parallelism = file count and a 1000-executor cluster decodes 1000
files at a time.  For many tiny files, pack multiple paths per
partition upstream (the CombineFileInputFormat move) by pointing the
glob at pre-bundled directories.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    StringStartsWith,
)


class _WavPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WavDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wavfiles source requires a path")
        self.metadata_only = str(options.get("metadata_only", "false")).lower() == "true"
        self._path_filters: list = []

    def pushFilters(self, filters):
        """Partition pruning for the custom source: `path` equality and
        prefix predicates are consumed here and applied to the file
        LISTING, so pruned files are never opened and never become
        partitions — the FileInputFormat `setInputPathFilter` analogue.
        Everything else is returned for Spark to evaluate post-scan."""
        remaining = []
        for f in filters:
            if isinstance(f, (EqualTo, StringStartsWith)) and tuple(f.attribute) == ("path",):
                self._path_filters.append(f)
            else:
                remaining.append(f)
        return remaining

    def _keep(self, p: str) -> bool:
        for f in self._path_filters:
            if isinstance(f, EqualTo) and p != f.value:
                return False
            if isinstance(f, StringStartsWith) and not p.startswith(f.value):
                return False
        return True

    def partitions(self):
        paths = sorted(_glob.glob(self.path)) if any(c in self.path for c in "*?[") else None
        if paths is None:
            paths = (
                sorted(
                    os.path.join(self.path, f)
                    for f in os.listdir(self.path)
                    if f.endswith(".wav")
                )
                if os.path.isdir(self.path)
                else [self.path]
            )
        if not paths:
            raise FileNotFoundError(f"no wav files match {self.path}")
        paths = [p for p in paths if self._keep(p)]
        return [_WavPartition(p) for p in paths]

    def read(self, partition):
        from hadoop_3_3_6_spark.functions.multimodal import decode_wav

        with open(partition.path, "rb") as f:
            payload = f.read()
        samples, rate = decode_wav(payload)
        yield (
            partition.path,
            rate,
            int(samples.shape[1]),
            int(samples.shape[0]),
            None if self.metadata_only else payload,
        )


class WavDataSource(DataSource):
    """``wavfiles`` format: distributed WAV corpus reader."""

    @classmethod
    def name(cls) -> str:
        return "wavfiles"

    def schema(self) -> str:
        return "path string, sample_rate int, n_channels int, n_samples int, payload binary"

    def reader(self, schema) -> WavDataSourceReader:
        return WavDataSourceReader(self.options)


def register_wav_source(spark) -> None:
    """Idempotently register the ``wavfiles`` format on this session
    (re-pinning the JVM active session, see session.pin_active_session)."""
    from hadoop_3_3_6_spark.session import pin_active_session

    pin_active_session(spark)
    spark.dataSource.register(WavDataSource)
