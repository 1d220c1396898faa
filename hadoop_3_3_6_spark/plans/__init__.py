from hadoop_3_3_6_spark.plans.queries import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
