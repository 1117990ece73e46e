"""User metrics (SURVEY.md §2 — Beam metrics surface).

Beam reference: metrics/metric.py — Metrics.counter (:77),
Metrics.distribution (:95), Metrics.gauge; MetricResults querying.

Spark design: two complementary mechanisms —

* **Accumulator-backed counters/distributions** for imperative DoFn
  code: ``MetricsRegistry`` creates them DRIVER-side (Spark requires
  accumulators to originate on the driver); the returned handles are
  picklable into UDF closures and updated worker-side, merged by Spark
  on task completion (at-least-once on task retries, exactly like
  Beam's committed-vs-attempted caveat for most runners).
* **``observed(df, name, *exprs)``** for declarative plan-level
  metrics: wraps ``DataFrame.observe`` (Catalyst collects the
  aggregates during the job with zero extra passes); results are read
  back from the returned Observation.

Distributions track (count, sum, min, max) — Beam's DistributionResult
fields — via a tuple-merging AccumulatorParam.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession


class _DistParam(AccumulatorParam):
    """(count, sum, min, max) merge."""

    def zero(self, value):
        return (0, 0.0, float("inf"), float("-inf"))

    def addInPlace(self, a, b):
        return (a[0] + b[0], a[1] + b[1], min(a[2], b[2]), max(a[3], b[3]))


class Counter:
    """Metrics.counter handle (metric.py:77): ``inc`` worker-side."""

    def __init__(self, acc):
        self._acc = acc

    def inc(self, n: int = 1) -> None:
        self._acc.add(n)

    @property
    def value(self) -> int:  # driver-side read
        return self._acc.value


class Distribution:
    """Metrics.distribution handle (metric.py:95): ``update`` worker-side;
    result exposes count/sum/min/max/mean like DistributionResult."""

    def __init__(self, acc):
        self._acc = acc

    def update(self, v: float) -> None:
        self._acc.add((1, float(v), float(v), float(v)))

    @property
    def result(self) -> "DistributionResult":
        c, s, lo, hi = self._acc.value
        return DistributionResult(c, s, lo if c else None, hi if c else None)


@dataclass
class DistributionResult:
    count: int
    sum: float
    min: float | None
    max: float | None

    @property
    def mean(self) -> float | None:
        return self.sum / self.count if self.count else None


class MetricsRegistry:
    """Driver-side factory + query surface (Beam MetricResults analog).

    ``registry.counter('ns', 'name')`` / ``registry.distribution(...)``;
    handles close over the accumulator and work inside any UDF. Query
    with ``registry.query()`` after an action has run.
    """

    def __init__(self, spark: SparkSession):
        self._sc = spark.sparkContext
        self._counters: dict[str, Counter] = {}
        self._dists: dict[str, Distribution] = {}

    @staticmethod
    def _key(namespace: str, name: str) -> str:
        return f"{namespace}/{name}"

    def counter(self, namespace: str, name: str) -> Counter:
        k = self._key(namespace, name)
        if k not in self._counters:
            self._counters[k] = Counter(self._sc.accumulator(0))
        return self._counters[k]

    def distribution(self, namespace: str, name: str) -> Distribution:
        k = self._key(namespace, name)
        if k not in self._dists:
            self._dists[k] = Distribution(
                self._sc.accumulator((0, 0.0, float("inf"), float("-inf")),
                                     _DistParam()))
        return self._dists[k]

    def query(self) -> dict:
        return {
            "counters": {k: c.value for k, c in self._counters.items()},
            "distributions": {k: d.result for k, d in self._dists.items()},
        }


def observed(df: DataFrame, name: str, *exprs):
    """Declarative plan metrics: ``df2, obs = observed(df, 'stage',exprs)``
    — read ``obs.get`` after an action. Zero extra scan (Catalyst
    CollectMetrics)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *exprs), obs
