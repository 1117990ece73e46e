"""Per-COMPONENT oracle checks: every member of the consolidated gate
suites (TPC-H q2..q22, set ops, CEP variants, nexmark analogs, ...)
verified individually against DuckDB — the driver sees the 50 composite
gates; this keeps member-level evidence in pytest."""

import pytest

from beam_spark import gates as g
from beam_spark import queries as q
from tests.oracle import compare_spark_duckdb

# components that are NOT themselves gates (suite members + extras)
GATE_NAMES = set(g.queries())
COMPONENT_NAMES = sorted(n for n in q.queries()
                         if n not in GATE_NAMES and q.oracle_sql().get(n))


def test_component_inventory_nonempty():
    assert len(COMPONENT_NAMES) >= 35, COMPONENT_NAMES


@pytest.mark.parametrize("name", COMPONENT_NAMES)
def test_component_matches_oracle(name, spark, duck, sf_dir):
    compare_spark_duckdb(q.queries()[name](spark, sf_dir), duck,
                         q.oracle_sql()[name])
