import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from beam_spark.session import get_spark

    # local[8]: the suite's wall time is dominated by thread-pooled
    # oracle sweeps whose Spark jobs were executor-bound at local[4]
    # (VERDICT r15 #1 — the driver's pytest window); shuffle
    # parallelism stays at 8 so plan shapes are unchanged
    spark = get_spark("beam_spark-tests", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the TESTDATA tables registered as views,
    mirroring the driver's oracle setup."""
    import duckdb

    con = duckdb.connect()
    from beam_spark.sources.io import TABLES

    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
