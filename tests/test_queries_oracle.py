"""Run every registered query against its duckdb oracle — the local mirror
of the driver's t2 correctness gate."""

import pytest

from beam_spark import queries as q
from tests.oracle import compare_spark_duckdb

NAMES = sorted(q.queries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    fn = q.queries()[name]
    oracles = q.oracle_sql()
    df = fn(spark, sf_dir)
    if name in oracles:
        compare_spark_duckdb(df, duck, oracles[name])
    else:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
