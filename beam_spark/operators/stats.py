"""Approximate & exact statistics (SURVEY.md §2.3 stats rows).

Beam reference: transforms/stats.py — ApproximateUnique (:89-282,
smallest-hashes sketch), ApproximateQuantiles (:283-993, Munro-Paterson);
Java sketching extension (HLL++, count-min, t-digest,
sdks/java/extensions/sketching + zetasketch HllCount.java).

Spark: all native sketches — approx_count_distinct (HLL++),
percentile_approx (KLL-ish), hll_sketch_agg/hll_union (DataSketches,
reusable sketch column like Beam's HllCount init/merge/extract),
count_min_sketch. Exact percentile / variance / covariance also exposed,
with a deterministic moments-based formulation for cross-engine oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from beam_spark.operators.group import CombineGlobally, CombinePerKey
from beam_spark.pcollection import PTransform


class ApproximateUnique:
    """stats.py:89-282 -> approx_count_distinct (HLL++)."""

    @staticmethod
    def Globally(col: str, rsd: float = 0.05, label=None) -> PTransform:
        return CombineGlobally(approx_unique=F.approx_count_distinct(col, rsd),
                               label=label)

    @staticmethod
    def PerKey(keys, col: str, rsd: float = 0.05, label=None) -> PTransform:
        ks = [keys] if isinstance(keys, str) else list(keys)
        return CombinePerKey(*ks, approx_unique=F.approx_count_distinct(col, rsd),
                             label=label)


class ApproximateQuantiles:
    """stats.py:283-993 -> percentile_approx."""

    @staticmethod
    def Globally(col: str, quantiles: list[float], accuracy: int = 10000,
                 label=None) -> PTransform:
        return CombineGlobally(
            quantiles=F.percentile_approx(col, F.array(*[F.lit(q) for q in quantiles]),
                                          accuracy),
            label=label)

    @staticmethod
    def PerKey(keys, col: str, quantiles: list[float], accuracy: int = 10000,
               label=None) -> PTransform:
        ks = [keys] if isinstance(keys, str) else list(keys)
        return CombinePerKey(
            *ks,
            quantiles=F.percentile_approx(col, F.array(*[F.lit(q) for q in quantiles]),
                                          accuracy),
            label=label)


def hll_sketch(col: str) -> Column:
    """HllCount.Init (zetasketch HllCount.java) -> DataSketches HLL."""
    return F.hll_sketch_agg(col)


def hll_union(col: str) -> Column:
    """HllCount.MergePartial."""
    return F.hll_union_agg(col)


def hll_estimate(col: str | Column) -> Column:
    """HllCount.Extract."""
    return F.hll_sketch_estimate(col)


def exact_percentile(col: str, quantiles: list[float]) -> Column:
    """Exact interpolated percentile (Spark `percentile`), the oracle-able
    counterpart of ApproximateQuantiles."""
    qs = ", ".join(str(q) for q in quantiles)
    return F.expr(f"percentile({col}, array({qs}))")


def moments_var_samp_sql(dec_expr: str) -> str:
    """Deterministic VAR_SAMP from exact decimal moments:
    (S2 - S1^2/n) / (n-1) computed in double from exact sums — identical
    in Spark and DuckDB regardless of accumulation order. ``dec_expr``
    must be a decimal-cast column snippet (queries.dec)."""
    s1 = f"CAST(SUM({dec_expr}) AS DOUBLE)"
    s2 = f"CAST(SUM({dec_expr} * {dec_expr}) AS DOUBLE)"
    n = f"COUNT({dec_expr})"
    return f"(({s2}) - ({s1}) * ({s1}) / {n}) / ({n} - 1)"


def moments_covar_samp_sql(dec_x: str, dec_y: str) -> str:
    """Deterministic COVAR_SAMP from exact decimal cross-moments."""
    sx = f"CAST(SUM({dec_x}) AS DOUBLE)"
    sy = f"CAST(SUM({dec_y}) AS DOUBLE)"
    sxy = f"CAST(SUM({dec_x} * {dec_y}) AS DOUBLE)"
    n = f"COUNT(*)"
    return f"(({sxy}) - ({sx}) * ({sy}) / {n}) / ({n} - 1)"


class CountMinSketch:
    """SketchFrequencies (sdks/java/extensions/sketching/
    SketchFrequencies.java) -> Spark's native count-min sketch.

    ``fit`` builds the sketch over a column (driver-held, mergeable via
    the JVM CountMinSketch object); ``estimate`` queries item counts.
    For a fully-distributed variant keep sketches per group with
    ``count_min_sketch`` SQL aggregate (returns sketch bytes).
    """

    def __init__(self, eps: float = 0.001, confidence: float = 0.99,
                 seed: int = 42):
        self.eps, self.confidence, self.seed = eps, confidence, seed
        self._sketch = None

    def fit(self, df, col: str) -> "CountMinSketch":
        # PySpark 4 dropped df.stat.countMinSketch; aggregate the sketch
        # bytes with the SQL function (distributed, mergeable) and
        # rehydrate the JVM CountMinSketch for point queries.
        raw = df.agg(self.agg_column(col, self.eps, self.confidence,
                                     self.seed).alias("s")).first()["s"]
        jvm = df.sparkSession._jvm
        bis = jvm.java.io.ByteArrayInputStream(bytes(raw))
        self._sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
        return self

    def estimate(self, item) -> int:
        return self._sketch.estimateCount(item)

    @staticmethod
    def agg_column(col: str, eps: float = 0.001, confidence: float = 0.99,
                   seed: int = 42):
        """Mergeable sketch bytes as an aggregate column (per group)."""
        return F.expr(f"count_min_sketch({col}, {eps}d, {confidence}d, {seed})")
