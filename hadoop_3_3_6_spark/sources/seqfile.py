"""SequenceFile SINK as a Python DataSource with Arrow batches — the
high-throughput replacement for the pickled-RDD legacy path in
``containers.write_sequence_file``.

The reference's SequenceFile.Writer (hadoop-common .../io/
SequenceFile.java:847) writes the public container format: SEQ magic +
version, key/value Writable class names, sync-marked record stream.
This sink produces the same on-disk format from a pure-Python encoder
(implementing the published format spec in SequenceFile.java's class
javadoc, not translating its code), but runs it EXECUTOR-SIDE over
Arrow record batches (``DataSourceArrowWriter``): rows never transit
the driver, never pickle through a Python RDD, and each task streams
its partition straight to one ``part-NNNNN.seq`` file.

Conformance: files written here are read back by Hadoop's own Java
SequenceFile.Reader (via ``sc.sequenceFile``) in tests/test_containers.py
— the same cross-engine oracle the Avro codec uses.

Write protocol (FileOutputCommitter-v2 analogue, same design as the
WARC batch sink): tasks write to a dot-prefixed temp file (hidden from
FileInputFormat's listing) and atomically rename to a DETERMINISTIC
``part-{pid:05d}.seq`` on task success, so a retried task overwrites
its earlier attempt instead of duplicating it; the driver's ``commit``
records the committed segment list in ``_SUCCESS``; ``abort`` removes
the failed attempt's files.

Scale: one file per partition, encode CPU fully parallel, no driver
data path.  Uncompressed records only (sync markers keep the files
splittable); for codec output hand off to the legacy converter path in
``containers.write_sequence_file`` (documented there).
"""

from __future__ import annotations

import os
import struct
import uuid

from pyspark.sql.datasource import DataSource, DataSourceArrowWriter, WriterCommitMessage

_SYNC_INTERVAL = 2000  # bytes between sync markers (100 * SYNC_SIZE, per spec)


def _vint(i: int) -> bytes:
    """Hadoop WritableUtils variable-length integer encoding (public
    format: single byte for -112..127, else a length-prefix byte)."""
    if -112 <= i <= 127:
        return struct.pack("b", i)
    ln = -112
    if i < 0:
        i ^= -1
        ln = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        ln -= 1
    out = bytearray(struct.pack("b", ln))
    ln = -(ln + 120) if ln < -120 else -(ln + 112)
    for idx in range(ln - 1, -1, -1):
        out.append((i >> (8 * idx)) & 0xFF)
    return bytes(out)


def _enc_text(v) -> bytes:
    b = str(v).encode("utf-8")
    return _vint(len(b)) + b


def _enc_bytes(v) -> bytes:
    b = bytes(v)
    return struct.pack(">i", len(b)) + b


# Spark SQL type -> (Writable class name, value serializer).  The
# serializations are the Writable wire formats (Text: vint+utf8;
# BytesWritable: int+bytes; numeric: big-endian fixed width).
_WRITABLES = {
    "string": ("org.apache.hadoop.io.Text", _enc_text),
    "binary": ("org.apache.hadoop.io.BytesWritable", _enc_bytes),
    "bigint": ("org.apache.hadoop.io.LongWritable", lambda v: struct.pack(">q", int(v))),
    "int": ("org.apache.hadoop.io.IntWritable", lambda v: struct.pack(">i", int(v))),
    "double": ("org.apache.hadoop.io.DoubleWritable", lambda v: struct.pack(">d", float(v))),
    "float": ("org.apache.hadoop.io.FloatWritable", lambda v: struct.pack(">f", float(v))),
    "boolean": ("org.apache.hadoop.io.BooleanWritable", lambda v: struct.pack(">?", bool(v))),
}


def _writable_for(sql_type: str):
    if sql_type not in _WRITABLES:
        raise ValueError(
            f"no Writable mapping for column type {sql_type!r}; cast to one of "
            f"{sorted(_WRITABLES)} first"
        )
    return _WRITABLES[sql_type]


def encode_sequence_file_header(key_cls: str, val_cls: str, sync: bytes) -> bytes:
    """SEQ v6 header for an uncompressed file (public format:
    SequenceFile.java class javadoc)."""
    out = bytearray(b"SEQ\x06")
    out += _enc_text(key_cls)
    out += _enc_text(val_cls)
    out += b"\x00\x00"  # compression? / block compression? -> no
    out += struct.pack(">i", 0)  # metadata: zero TreeMap entries
    out += sync
    return bytes(out)


class _SeqCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class SeqFileArrowWriter(DataSourceArrowWriter):
    """Arrow-batched SequenceFile writer: one ``part-{pid:05d}.seq``
    per partition, written via hidden temp + atomic rename so task
    retries overwrite rather than duplicate."""

    def __init__(self, options: dict, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("seqfile sink requires a path")
        fields = schema.fields
        if len(fields) < 2:
            raise ValueError("seqfile sink needs (key, value) columns")
        self.key_type = fields[0].dataType.simpleString()
        self.val_type = fields[1].dataType.simpleString()
        self.key_cls, self.key_enc = _writable_for(self.key_type)
        self.val_cls, self.val_enc = _writable_for(self.val_type)
        # optional header class-name overrides for Writable subclasses
        # that keep the wire format (e.g. TypedBytesWritable IS a
        # BytesWritable — TypedBytesWritable.java:32); the encoder
        # stays the one for the Spark column type
        opt = {k.lower(): v for k, v in options.items()}
        self.key_cls = opt.get("keyclass", self.key_cls)
        self.val_cls = opt.get("valueclass", self.val_cls)
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for n in os.listdir(self.path):
                if n.startswith("part-") or n == "_SUCCESS":
                    os.remove(os.path.join(self.path, n))

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(self.path, f"part-{pid:05d}.seq")
        tmp = os.path.join(self.path, f".part-{pid:05d}-{uuid.uuid4().hex[:8]}.seq.tmp")
        sync = uuid.uuid4().bytes
        n = 0
        since_sync = 0
        kenc, venc = self.key_enc, self.val_enc
        with open(tmp, "wb") as f:
            f.write(encode_sequence_file_header(self.key_cls, self.val_cls, sync))
            for batch in iterator:
                keys = batch.column(0).to_pylist()
                vals = batch.column(1).to_pylist()
                buf = bytearray()
                for k, v in zip(keys, vals):
                    if k is None or v is None:
                        raise ValueError(
                            "SequenceFile Writables are not nullable; coalesce/filter "
                            "null keys and values before writing"
                        )
                    kb, vb = kenc(k), venc(v)
                    if since_sync >= _SYNC_INTERVAL:
                        buf += b"\xff\xff\xff\xff" + sync
                        since_sync = 0
                    rec = (
                        struct.pack(">ii", len(kb) + len(vb), len(kb)) + kb + vb
                    )
                    buf += rec
                    since_sync += len(rec)
                    n += 1
                f.write(buf)
        if n == 0:
            os.remove(tmp)
            return _SeqCommit("", 0)
        os.replace(tmp, final)
        return _SeqCommit(final, n)

    def commit(self, messages):
        kept = [m.path for m in messages if m and m.n]
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("\n".join(os.path.basename(p) for p in kept))

    def abort(self, messages):
        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.remove(m.path)
        for name in os.listdir(self.path):
            if name.startswith(".part-") and name.endswith(".tmp"):
                os.remove(os.path.join(self.path, name))


class SeqFileDataSource(DataSource):
    """``seqfile`` format: Arrow-batched SequenceFile sink."""

    @classmethod
    def name(cls) -> str:
        return "seqfile"

    def writer(self, schema, overwrite: bool) -> SeqFileArrowWriter:
        return SeqFileArrowWriter(self.options, schema, overwrite)


def register_seqfile_sink(spark) -> None:
    """Idempotently register the ``seqfile`` format on this session
    (re-pinning the JVM active session, see session.pin_active_session)."""
    from hadoop_3_3_6_spark.session import pin_active_session

    pin_active_session(spark)
    spark.dataSource.register(SeqFileDataSource)
