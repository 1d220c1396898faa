"""Z-order clustered writes must shrink per-file min/max ranges on BOTH
dimensions (that's the entire point — parquet stats-based skipping for
two access paths at once)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from hadoop_3_3_6_spark.session import load_table
from hadoop_3_3_6_spark.sources.writers import write_zordered, zorder_expr


def _avg_file_coverage(path, col, lo, hi):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            spans.append((max(maxs) - min(mins)) / (hi - lo))
    assert spans, f"no stats found for {col}"
    return sum(spans) / len(spans)


def test_zorder_expr_interleaves(spark):
    # z(0b11, 0b00) = 0b0101 = 5; z(0b00, 0b11) = 0b1010 = 10
    rows = spark.createDataFrame([(3, 0), (0, 3), (2, 1)], "a long, b long").select(
        zorder_expr("a", "b", bits=4).alias("z")
    )
    assert [r.z for r in rows.collect()] == [5, 10, 6]


def test_zordered_write_constant_column_degenerate(spark, tmp_path):
    """A constant dimension (max == min) must not divide by zero and
    must not perturb the other dimension's clustering."""
    df = spark.range(1000).selectExpr("id AS a", "42 AS b")
    path = str(tmp_path / "zconst")
    write_zordered(df, path, "a", "b", bits=10, num_files=4)
    import pyspark.sql.functions as F

    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("a")).collect()[0][0] == 999 * 1000 // 2
    cov = _avg_file_coverage(path, "a", 0, 999)
    assert cov < 0.5, cov  # constant b leaves a's ordering intact


def test_zordered_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey", "l_quantity")
    lo_o = li.agg({"l_orderkey": "min"}).collect()[0][0]
    hi_o = li.agg({"l_orderkey": "max"}).collect()[0][0]
    lo_p = li.agg({"l_partkey": "min"}).collect()[0][0]
    hi_p = li.agg({"l_partkey": "max"}).collect()[0][0]

    naive = str(tmp_path / "naive")
    li.orderBy("l_orderkey").repartitionByRange(8, "l_orderkey").write.parquet(naive)
    zpath = str(tmp_path / "zorder")
    write_zordered(li, zpath, "l_orderkey", "l_partkey", bits=20, num_files=8)

    # single-key layout: near-total coverage of the OTHER dimension
    naive_part = _avg_file_coverage(naive, "l_partkey", lo_p, hi_p)
    z_order_o = _avg_file_coverage(zpath, "l_orderkey", lo_o, hi_o)
    z_order_p = _avg_file_coverage(zpath, "l_partkey", lo_p, hi_p)
    assert naive_part > 0.9, naive_part
    # z-order: materially narrower than total coverage on BOTH axes
    assert z_order_o < 0.75, z_order_o
    assert z_order_p < 0.75, z_order_p

    # and the data survives the trip
    import pyspark.sql.functions as F

    assert spark.read.parquet(zpath).agg(F.sum("l_quantity")).collect() == li.agg(
        F.sum("l_quantity")
    ).collect()