"""The main correctness gate, mirroring the driver: every query with a
SQL oracle must match DuckDB exactly (row count + columns + values,
order-insensitive); oracle-less queries must run and return a stable
schema with >= 0 rows."""

from __future__ import annotations

import pytest

from hadoop_3_3_6_spark.plans.queries import ORACLES, QUERIES
from tests.util import assert_frames_match

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, duck, sf_dir, name):
    if name in ("storage_file_profile", "tokenizer_bpe_apply") and not sf_dir.rstrip(
        "/"
    ).endswith("sf0.01"):
        # These oracles are pinned to the driver's sf0.01 comparison
        # tier: storage_file_profile's must name a physical path
        # (DuckDB filename-aware scan, no view involved), and
        # tokenizer_bpe_apply's merge literals are derived from the
        # sf0.01 corpus at registration time.  At any other SF the
        # comparison is meaningless, not broken.
        pytest.skip(f"{name} oracle is pinned to the driver's sf0.01")
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
