"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``beam_spark.gates`` — EXACTLY 50 gate queries (the
driver checks the first 50 dict entries; see gates.py for how the full
component inventory in ``beam_spark.queries`` consolidates into them).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from beam_spark import gates as _g


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _g.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _g.queries()


def oracle_sql() -> dict[str, str]:
    return _g.oracle_sql()
