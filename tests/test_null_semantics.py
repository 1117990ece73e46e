"""NULL-handling semantics (reference model:
BeamSqlDslAggregationNullableTest): aggregates drop NULLs, count(*)
doesn't, joins on NULL keys don't match, null-safe equality does."""

from pyspark.sql import functions as F

from beam_spark.pcollection import Pipeline
from beam_spark.operators.core import Create, Distinct
from beam_spark.operators.group import CombineGlobally, CombinePerKey
from beam_spark.operators.join import Join


ROWS = [{"k": "a", "v": 1}, {"k": "a", "v": None},
        {"k": "b", "v": None}, {"k": None, "v": 4}]
SCHEMA = "k string, v long"


def test_aggregates_drop_nulls(spark):
    out = (Pipeline(spark) | Create(ROWS, schema=SCHEMA)
           | CombineGlobally(s="sum(v)", n_v="count(v)", n_all="count(*)",
                             avg_v="avg(v)", mn="min(v)"))
    r = out.collect()[0]
    assert r["s"] == 5 and r["n_v"] == 2 and r["n_all"] == 4
    assert r["avg_v"] == 2.5 and r["mn"] == 1


def test_null_group_key_is_a_group(spark):
    out = (Pipeline(spark) | Create(ROWS, schema=SCHEMA)
           | CombinePerKey("k", n="count(*)"))
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {"a": 2, "b": 1, None: 1}


def test_join_null_keys_dont_match(spark):
    left = Pipeline(spark) | Create(ROWS, schema=SCHEMA)
    right = Pipeline(spark) | Create([{"k": None, "w": 9}, {"k": "a", "w": 1}],
                                     schema="k string, w long")
    inner = left | Join(right.df, on="k")
    assert all(r["k"] == "a" for r in inner.collect())
    # null-safe equality (<=>) does match NULLs
    nsafe = left | Join(right.df.withColumnRenamed("k", "k2"),
                        condition=F.col("k").eqNullSafe(F.col("k2")))
    assert sum(1 for r in nsafe.collect() if r["k"] is None) == 1


def test_distinct_keeps_one_null(spark):
    out = (Pipeline(spark)
           | Create([{"x": None}, {"x": None}, {"x": 1}], schema="x long")
           | Distinct())
    vals = sorted((r["x"] is None, r["x"]) for r in out.collect())
    assert len(vals) == 2
