"""Custom Python STREAMING source (Spark 4
``SimpleDataSourceStreamReader``) — the micro-batch analogue of the
wavfiles/warc batch sources: a deterministic bounded replay generator
(``rangestream``), the streaming twin of TeraGen's RangeInputFormat
(reference: examples/terasort/TeraGen.java RangeInputFormat — driver
hands out row ranges; here each micro-batch IS a row range).

Offsets are row counters, so the source is exactly-once by
construction: ``read(start)`` returns the next ``batch_size`` rows
and the advanced offset; ``readBetweenOffsets`` deterministically
replays any committed span after restart (the recovery contract a
file/Kafka source implements with file lists / partition offsets).
``max_rows`` bounds the stream — past it the source reports no new
data, which lets tests drain it and lets ``availableNow`` terminate.

Scale notes: the reader runs on the driver (SimpleDataSourceStream-
Reader contract) and materializes one micro-batch at a time into the
prefetch cache (the contract pickles each batch), so memory is
bounded by batch_size. For a production high-throughput source the
partition-planning variant (DataSourceStreamReader + InputPartitions
per batch) distributes record generation the way the batch sources
distribute files — this simple form exists to pin the
offset/commit/replay semantics.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class RangeStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", "1000"))
        self.max_rows = int(options.get("max_rows", "10000"))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int):
        # a LIST ITERATOR: the runner both advances it (next()) and
        # pickles it into the prefetch cache — a bare list fails the
        # former, a generator the latter; iter(list) satisfies both
        return iter([(n, n * n % 997, f"v{n}") for n in range(start, end)])

    def read(self, start: dict):
        i = int(start["offset"])
        if i >= self.max_rows:
            return iter([]), start
        end = min(i + self.batch_size, self.max_rows)
        return self._rows(i, end), {"offset": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a committed span (restart recovery)
        return self._rows(int(start["offset"]), int(end["offset"]))

    def commit(self, end: dict) -> None:
        pass  # counters need no cleanup; a real source would GC here


class RangeStreamDataSource(DataSource):
    """``rangestream`` format: bounded deterministic replay stream."""

    @classmethod
    def name(cls) -> str:
        return "rangestream"

    def schema(self) -> str:
        return "n bigint, h bigint, value string"

    def simpleStreamReader(self, schema) -> RangeStreamReader:
        return RangeStreamReader(self.options)


def register_range_stream(spark) -> None:
    """Idempotently register the ``rangestream`` format (re-pinning the
    JVM active session, see session.pin_active_session)."""
    from hadoop_3_3_6_spark.session import pin_active_session

    pin_active_session(spark)
    spark.dataSource.register(RangeStreamDataSource)
