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


@pytest.fixture(scope="module")
def gate_outcomes(spark, duck, sf_dir):
    """Precompute every gate-vs-oracle comparison on a thread pool
    (the test_components_oracle posture — VERDICT r15 #1: the serial
    sweep was a large block of the suite's wall time). Each thread
    uses its own DuckDB cursor; outcomes are stored and re-raised per
    gate, so reporting is identical to the serial version."""
    from concurrent.futures import ThreadPoolExecutor

    oracles = g.oracle_sql()

    def one(name):
        try:
            df = g.queries()[name](spark, sf_dir)
            if name in oracles:
                compare_spark_duckdb(df, duck.cursor(), oracles[name])
            else:
                # rows-only check for non-SQL-expressible ops
                assert df.count() >= 0
            return None
        except BaseException as e:  # stored, re-raised in the test
            return e

    with ThreadPoolExecutor(12) as ex:
        futs = {n: ex.submit(one, n) for n in NAMES}
        return {n: f.result() for n, f in futs.items()}


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, gate_outcomes):
    err = gate_outcomes[name]
    if err is not None:
        raise err


def test_gate_outputs_are_scalar_only(spark):
    """The driver's canonicalizer cannot hash arrays/maps/structs
    (round-1 'unhashable list' errors) — every gate output column must
    be scalar. Schemas only; no data is executed."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import types as T

    sf = "/root/testdata/sf0.001"

    def schema_of(item):
        name, fn = item
        return name, fn(spark, sf).schema

    with ThreadPoolExecutor(12) as ex:
        schemas = list(ex.map(schema_of, g.queries().items()))
    for name, schema in schemas:
        for f in schema.fields:
            assert not isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)), (
                f"{name}.{f.name} is {f.dataType.simpleString()}")
