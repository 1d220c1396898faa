"""Reference-exact partition assignment (the MRC partitioner family).

The reference's DEFAULT partitioner is HashPartitioner
(MRC/mapreduce/lib/partition/HashPartitioner.java:36):
``(key.hashCode() & Integer.MAX_VALUE) % numReduceTasks``.  Which
partition a record reaches is therefore fixed by Java ``hashCode``
arithmetic, and every Writable key type pins its own:

- ``Text`` — ``WritableComparator.hashBytes`` over the UTF-8 bytes
  (BinaryComparable.java:89 -> WritableComparator.java:242): the
  31-based rolling hash ``h = 31*h + (int) bytes[i]`` starting at 1,
  over SIGNED Java bytes, with 32-bit overflow wraparound.
- ``IntWritable`` — the value itself (IntWritable.java:71).
- ``LongWritable`` — ``(int) value``, the LOW 32 bits
  (LongWritable.java:71 — not java.lang.Long's xor-fold).

Two siblings reuse the same algebra:

- BinaryPartitioner (BinaryPartitioner.java:133) hashes a
  CONFIGURABLE subarray of the raw key bytes, with Python-style
  negative offsets resolved as ``(offset + length) % length`` and an
  INCLUSIVE right end.
- RehashPartitioner (RehashPartitioner.java:35) post-mixes the
  hashCode with a seed-xor + two avalanche rounds of unsigned-shift
  xors to smooth simple integer key patterns.

Everything here is a pure Column expression — the rolling hash is an
``aggregate`` HOF over hex-pair bytes, 32-bit Java wraparound done in
BIGINT with an explicit ``pmod`` wrap — so assignment stays inside
whole-stage codegen and the DuckDB oracle can replay it closed-form
(``list_reduce`` over the same hex pairs).  Physical co-location uses
``repartition(n, partition_col)``: Spark hashes the ASSIGNMENT id, so
equal reference partition ids land in one task (the co-location
contract a Partitioner exists for), while the id column itself is the
byte-exact reference assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: RehashPartitioner.java:38 — "prime number seed for increasing hash
#: quality".
REHASH_SEED = 1591267453

_INT_MAX = 0x7FFFFFFF
_U32 = 0x100000000


def _wrap32(x: Column) -> Column:
    """Java 32-bit signed overflow semantics on a BIGINT column."""
    return F.pmod(x + F.lit(1 << 31), F.lit(_U32)) - F.lit(1 << 31)


def java_hash_bytes(
    bin_col: Column,
    start: Column | None = None,
    length: Column | None = None,
    init: Column | int = 1,
) -> Column:
    """``WritableComparator.hashBytes(bytes, offset, length)``
    (WritableComparator.java:242): ``h = 1; h = 31*h + (int) b[i]``
    with Java int wraparound, over SIGNED bytes.

    ``start`` is a 0-based byte offset (default 0), ``length`` the
    byte count (default: to the end).  Empty input hashes to ``init``,
    like the reference's empty loop.  ``init`` defaults to
    WritableComparator's 1; pass 0 (or a prior hash Column) for the
    KeyFieldBasedPartitioner family, whose ``hashCode(b, start, end,
    currentHash)`` starts at 0 and CHAINS across key specs
    (KeyFieldBasedPartitioner.java:106,122-127).

    Shape note: the bytes are materialized as an ARRAY of hex pairs
    (one split per row) and the fold's lambda touches only its own
    element — HOF lambdas get no subexpression elimination and
    CollapseProject inlines captured columns per ELEMENT, so folding
    over an index sequence that re-derives hex(key) each step would
    be O(n²) per key (the gopher trap from SCALE.md); this form is
    O(n) and safe for document-length keys.  The signed-byte map uses
    the branch-free ``pmod(b+128,256)-128`` so each pair converts
    once.
    """
    total = F.length(bin_col).cast("long")
    start = F.lit(0).cast("long") if start is None else start.cast("long")
    length = (total - start) if length is None else length.cast("long")
    # hex pairs -> array<string>, one element per byte (the trailing
    # separator makes split emit one empty tail element; slice never
    # reaches it)
    pairs = F.split(F.regexp_replace(F.hex(bin_col), "(..)", "$1\t"), "\t")
    window = F.when(length > 0, F.slice(pairs, start + 1, length)).otherwise(
        F.array().cast("array<string>")
    )
    init_col = F.lit(init) if isinstance(init, int) else init
    return F.aggregate(
        window,
        init_col.cast("long"),
        lambda acc, p: _wrap32(
            acc * 31 + F.pmod(F.conv(p, 16, 10).cast("long") + 128, 256) - 128
        ),
    )


def java_string_hash_code(col: Column) -> Column:
    """``java.lang.String.hashCode()`` — ``h = 31*h + c`` starting at
    0 over UTF-16 CODE UNITS (not bytes, not code points: an astral
    character contributes its two surrogate units separately).  Folds
    over the UTF-16BE encoding's hex QUADS, so surrogate pairs fall
    out exactly.  This is the hashCode behind the reference's
    ``key.toString().hashCode()`` fallbacks (e.g.
    KeyFieldBasedPartitioner.java:90 when no key spec is configured).
    """
    quads = F.split(
        F.regexp_replace(F.hex(F.encode(col.cast("string"), "UTF-16BE")), "(....)", "$1\t"),
        "\t",
    )
    n_units = F.length(F.encode(col.cast("string"), "UTF-16BE")) / 2
    window = F.when(n_units > 0, F.slice(quads, 1, n_units.cast("int"))).otherwise(
        F.array().cast("array<string>")
    )
    return F.aggregate(
        window,
        F.lit(0).cast("long"),
        lambda acc, q: _wrap32(acc * 31 + F.conv(q, 16, 10).cast("long")),
    )


def text_hash_code(col: Column) -> Column:
    """``Text.hashCode()`` — hashBytes over the UTF-8 encoding
    (Text.java:380 -> BinaryComparable.java:89)."""
    return java_hash_bytes(F.encode(col.cast("string"), "UTF-8"))


def int_writable_hash(col: Column) -> Column:
    """``IntWritable.hashCode()`` == the value (IntWritable.java:71);
    wider inputs get the Java ``(int)`` narrowing cast first."""
    return _wrap32(col.cast("long"))


def long_writable_hash(col: Column) -> Column:
    """``LongWritable.hashCode()`` == ``(int) value`` — the low 32
    bits with sign (LongWritable.java:71)."""
    return _wrap32(col.cast("long"))


def hash_partition(hash_code: Column, num_partitions: int) -> Column:
    """HashPartitioner.java:36: ``(hashCode & Integer.MAX_VALUE) %
    numReduceTasks`` (the &-mask makes the dividend non-negative, so
    Java ``%`` == ``pmod``)."""
    return F.pmod(hash_code.bitwiseAND(F.lit(_INT_MAX)), F.lit(num_partitions)).cast("int")


def rehash_partition(hash_code: Column, num_partitions: int) -> Column:
    """RehashPartitioner.java:41-46: ``h = SEED ^ hashCode; h ^=
    (h >>> 20) ^ (h >>> 12); h = h ^ (h >>> 7) ^ (h >>> 4); return
    (h & Integer.MAX_VALUE) % n``.

    The mix runs on the UNSIGNED 32-bit image (xor and ``>>>`` are
    sign-blind, and BIGINT ``>>`` on the unsigned image IS ``>>>``);
    the final &-mask reads the same low 31 bits either way.
    """
    h = F.pmod(hash_code, F.lit(_U32))  # unsigned 32-bit image

    def _xor_shifts(v: Column, s1: int, s2: int) -> Column:
        return v.bitwiseXOR(F.shiftright(v, s1)).bitwiseXOR(F.shiftright(v, s2))

    h = h.bitwiseXOR(F.lit(REHASH_SEED))
    h = _xor_shifts(h, 20, 12)
    h = _xor_shifts(h, 7, 4)
    return F.pmod(h.bitwiseAND(F.lit(_INT_MAX)), F.lit(num_partitions)).cast("int")


def binary_partition(
    bin_col: Column, num_partitions: int, left_offset: int = 0, right_offset: int = -1
) -> Column:
    """BinaryPartitioner.java:133: hash a [left, right] INCLUSIVE
    subarray of the raw key bytes, negative offsets resolved
    Python-style as ``(offset + length) % length`` (both defaults —
    0, -1 — select the whole array), then the HashPartitioner mask.

    Like the reference, offsets resolve PER ROW against each key's
    own length; a zero-length key divides by zero in Java and yields
    NULL here (surfaced, not masked — the explicit guard matters:
    non-ANSI pmod-by-zero NULLs would otherwise fall into the
    empty-fold branch and mint a plausible-looking id from the seed).
    """
    length = F.length(bin_col).cast("long")
    left = F.pmod(F.lit(left_offset) + length, length)
    right = F.pmod(F.lit(right_offset) + length, length)
    h = java_hash_bytes(bin_col, start=left, length=right - left + 1)
    part = F.pmod(h.bitwiseAND(F.lit(_INT_MAX)), F.lit(num_partitions)).cast("int")
    return F.when(length > 0, part)


def partition_by_reference(
    df: DataFrame, partition_col: Column, num_partitions: int, out_col: str = "part_id"
) -> DataFrame:
    """Materialize the reference assignment and PHYSICALLY co-locate
    by it: ``repartition(n, id)`` guarantees every record with one
    reference partition id lands in one task (the Partitioner
    contract), with the byte-exact id kept as a column."""
    return df.withColumn(out_col, partition_col).repartition(num_partitions, out_col)


# --- DuckDB oracle renderers (closed-form SQL for the same algebra) ---


def duckdb_hash_bytes_sql(
    blob_expr: str,
    start_sql: str | None = None,
    len_sql: str | None = None,
    init_sql: str = "1",
) -> str:
    """Closed-form DuckDB replay of ``java_hash_bytes`` over a BLOB
    expression: list_reduce over hex pairs, same signed-byte CASE and
    the same 32-bit pmod wrap.  ``start_sql`` (0-based byte offset)
    and ``len_sql`` slice the HEX image (DuckDB 1.0 has no BLOB
    substr); both may reference ``octet_length({blob_expr})``.
    ``init_sql`` is the fold seed (1 = WritableComparator; 0 or a
    prior hash expression = the KeyFieldBasedPartitioner chain)."""
    hx = f"hex({blob_expr})"
    if start_sql is not None:
        ln = len_sql if len_sql is not None else f"octet_length({blob_expr}) - ({start_sql})"
        hx = f"substr({hx}, 2*({start_sql}) + 1, 2*greatest({ln}, 0))"
    byte = f"CAST(('0x' || substr({hx}, CAST(2*i-1 AS BIGINT), 2)) AS BIGINT)"
    return (
        f"list_reduce(list_prepend(({init_sql})::BIGINT, "
        f"list_transform(range(1, length({hx})//2 + 1), "
        f"i -> CASE WHEN {byte} > 127 THEN {byte} - 256 ELSE {byte} END)), "
        "(acc, x) -> ((31*acc + x + 2147483648) % 4294967296 + 4294967296) "
        "% 4294967296 - 2147483648)"
    )


def duckdb_rehash_sql(hash_expr: str, num_partitions: int) -> str:
    """Closed-form DuckDB replay of ``rehash_partition`` over a BIGINT
    hashCode expression (xor + masked shifts on the unsigned image)."""
    h0 = f"xor((({hash_expr}) % 4294967296 + 4294967296) % 4294967296, {REHASH_SEED})"
    h1 = f"xor(xor({h0}, ({h0}) >> 20), ({h0}) >> 12)"
    h2 = f"xor(xor({h1}, ({h1}) >> 7), ({h1}) >> 4)"
    return f"CAST((({h2}) & 2147483647) % {num_partitions} AS INTEGER)"
