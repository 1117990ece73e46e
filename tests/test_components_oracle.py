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


@pytest.fixture(scope="module")
def component_outcomes(spark, duck, sf_dir):
    """Precompute every component-vs-oracle comparison on a thread
    pool: Spark job submission is thread-safe and the ~250 serial
    build+collect+DuckDB rounds were the suite's largest block
    (VERDICT r15 #1 — the driver's pytest run cannot finish its time
    window). Each thread compares ONE component with its own DuckDB
    cursor (cursors share the in-memory catalog/views); the
    per-component tests below re-raise the stored outcome, so
    reporting is identical to the serial version."""
    from concurrent.futures import ThreadPoolExecutor

    def one(name):
        try:
            compare_spark_duckdb(q.queries()[name](spark, sf_dir),
                                 duck.cursor(), q.oracle_sql()[name])
            return None
        except BaseException as e:  # stored, re-raised in the test
            return e

    with ThreadPoolExecutor(12) as ex:
        futs = {n: ex.submit(one, n) for n in COMPONENT_NAMES}
        return {n: f.result() for n, f in futs.items()}


@pytest.mark.parametrize("name", COMPONENT_NAMES)
def test_component_matches_oracle(name, component_outcomes):
    err = component_outcomes[name]
    if err is not None:
        raise err
