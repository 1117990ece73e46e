"""Run every registered query against its duckdb oracle — the local mirror
of the driver's t2 correctness gate."""

import pytest

from beam_spark import gates as g
from tests.oracle import compare_spark_duckdb

NAMES = sorted(g.queries())


def test_exactly_fifty_gates():
    """The driver checks only the FIRST 50 dict entries — the registry
    must stay at exactly 50 with at most one oracle-less gate."""
    assert len(g.queries()) == 50
    assert len(g.oracle_sql()) >= 49


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    fn = g.queries()[name]
    oracles = g.oracle_sql()
    df = fn(spark, sf_dir)
    if name in oracles:
        compare_spark_duckdb(df, duck, oracles[name])
    else:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0


def test_gate_outputs_are_scalar_only(spark):
    """The driver's canonicalizer cannot hash arrays/maps/structs
    (round-1 'unhashable list' errors) — every gate output column must
    be scalar. Schemas only; no data is executed."""
    from pyspark.sql import types as T

    sf = "/root/testdata/sf0.001"
    for name, fn in g.queries().items():
        df = fn(spark, sf)
        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)), (
                f"{name}.{f.name} is {f.dataType.simpleString()}")
