"""hadoop_3_3_6_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Apache Hadoop 3.3.6 MapReduce
(reference: OrderLab/hadoop-3.3.6), re-expressed Spark-first.

The reference's data model is a distributed stream of (key, value)
records flowing through map → shuffle(sort/partition) → reduce
(reference: hadoop-mapreduce-client-core .../mapreduce/Mapper.java:101,
Reducer.java:124).  This engine's carrier is the Spark DataFrame with
explicit schemas; every operator is a pure ``DataFrame -> DataFrame``
combinator that leaves planning to Catalyst.

Subpackages
-----------
operators/   map-side transforms, aggregation framework, joins, sorts,
             set operations (SURVEY.md §2.3-2.7)
sources/     readers (text/KV-text/parquet/JDBC/sampling filters) and
             sinks (multi-output routing, terasort pipeline) (§2.1-2.2)
functions/   scalar/text/dedup/similarity function surface (§2.3 note,
             north-star LLM-pipeline ops)
plans/       the query corpus wired for the driver contract (§2.13)
streaming/   Structured Streaming extension over the events table (§2.9)
"""

from hadoop_3_3_6_spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
