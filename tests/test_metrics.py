"""Metrics surface: accumulator counters/distributions updated inside
DoFn code, and declarative observe() metrics."""

from pyspark.sql import functions as F

from beam_spark.metrics import MetricsRegistry, observed
from beam_spark.pcollection import Pipeline
from beam_spark.operators.core import Create
from beam_spark.operators.pardo import DoFn, ParDo


def test_counter_and_distribution_in_dofn(spark):
    reg = MetricsRegistry(spark)
    seen = reg.counter("test", "elements")
    sizes = reg.distribution("test", "value_dist")

    class CountingFn(DoFn):
        def process(self, el):
            seen.inc()
            sizes.update(el["v"])
            yield {"v": el["v"] * 10}

    pc = (Pipeline(spark) | Create([{"v": i} for i in range(1, 6)])
          | ParDo(CountingFn(), output_schema="v long"))
    assert sorted(r["v"] for r in pc.collect()) == [10, 20, 30, 40, 50]

    m = reg.query()
    assert m["counters"]["test/elements"] == 5
    d = m["distributions"]["test/value_dist"]
    assert (d.count, d.sum, d.min, d.max) == (5, 15.0, 1.0, 5.0)
    assert d.mean == 3.0


def test_observed_plan_metrics(spark):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    df2, obs = observed(df, "stage1",
                        F.count("*").alias("n"), F.sum("v").alias("total"))
    df2.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n"] == 10 and got["total"] == 90
