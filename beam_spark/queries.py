"""Query inventory for the correctness gate (driver contract in
``__spark_entry__.py``).

Every entry is a (spark_fn, oracle_sql) pair over the TESTDATA tables.
Conventions that make the duckdb value-hash comparison deterministic:

* Float aggregates are computed EXACTLY: ``CAST(x AS DECIMAL(18,4))`` before
  SUM (decimal addition is associative — immune to partial-aggregation
  order), then the final value is cast back to DOUBLE. Both engines
  round the same IEEE double with the same rule, so results are
  bit-identical regardless of parallelism.
* Every computed column is aliased identically in Spark and SQL.
* Timestamp outputs go through ``epoch seconds`` (bigint) or stay as
  grouping keys read straight from parquet, dodging timezone rendering.

The aggregate snippets are ANSI SQL strings valid in BOTH Spark SQL and
DuckDB, so each expression is written once and cannot drift.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection
from beam_spark.operators.core import Filter, Select
from beam_spark.operators.group import CombinePerKey

# registry: name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def table(spark: SparkSession, sf_dir: str, name: str) -> PCollection:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return PCollection(df)


def dec(col: str, p: int = 12, s: int = 2) -> str:
    """Decimal view of a clean fixed-decimal double column. The TESTDATA
    doubles carry <= 2 (money) / 6 (events.value) fractional digits, so this
    cast is unambiguous in both engines; all downstream decimal arithmetic
    is then exact and associative. Precisions are kept tight so products
    stay inside DECIMAL(38) in both Spark and DuckDB."""
    return f"CAST({col} AS DECIMAL({p},{s}))"


def dsum(expr: str, alias: str) -> str:
    """Deterministic double sum: expr must be decimal-typed (see dec())."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def davg(expr: str, alias: str, count_col: str = "*") -> str:
    """Deterministic double mean: exact decimal sum / exact count."""
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT({count_col}) AS {alias}"


# --------------------------------------------------------------------------
# q1 — TPC-H Q1 shape: scan -> filter -> project -> hash aggregate.
# Exercises: ReadFromParquet, Filter (pushed to scan), CombinePerKey
# (partial agg via Catalyst). SURVEY.md §7 M0 flagship.
# --------------------------------------------------------------------------
_DISC = "CAST(1 - l_discount AS DECIMAL(4,2))"
_TAX = "CAST(1 + l_tax AS DECIMAL(4,2))"
_Q1_AGGS = [
    dsum(dec("l_quantity"), "sum_qty"),
    dsum(dec("l_extendedprice"), "sum_base_price"),
    dsum(f"{dec('l_extendedprice')} * {_DISC}", "sum_disc_price"),
    dsum(f"{dec('l_extendedprice')} * {_DISC} * {_TAX}", "sum_charge"),
    davg(dec("l_quantity"), "avg_qty"),
    davg(dec("l_extendedprice"), "avg_price"),
    davg(dec("l_discount", 4, 2), "avg_disc"),
    "COUNT(*) AS count_order",
]


@query("q1_pricing_summary", f"""
SELECT l_returnflag, l_linestatus, {', '.join(_Q1_AGGS)}
FROM lineitem
WHERE l_shipdate <= CAST('1998-09-02' AS TIMESTAMP)
GROUP BY l_returnflag, l_linestatus
""")
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    aggs = {}
    for snippet in _Q1_AGGS:
        expr_sql, alias = snippet.rsplit(" AS ", 1)
        aggs[alias] = F.expr(expr_sql)
    out = (
        table(spark, sf_dir, "lineitem")
        | Filter("l_shipdate <= CAST('1998-09-02' AS TIMESTAMP)")
        | CombinePerKey("l_returnflag", "l_linestatus", **aggs)
    )
    return out.df
