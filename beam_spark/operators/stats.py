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


class AmsF2Sketch(PTransform):
    """Second frequency moment F2 = sum_v f_v^2 estimator (Alon,
    Matias & Szegedy, STOC'96 — the original streaming-sketch
    paper): the self-join / repeat-rate size signal a planner wants
    without holding per-value counts. Each of ``counters`` cells
    keeps Z_j = sum over rows of s_j(value) where s_j(v) = +-1;
    E[Z_j^2] = F2, and the estimate averages the k cells
    (std ~ sqrt(2/k) * F2 — k=64 gives ~18%; this is a coarse
    planner signal, not a quantile sketch).

    Spark design: one explode(k) into a MAP-SIDE partial sum — the
    shuffled state is (keys x k) integer cells, never per-value
    counts; cells ADD, so partial aggregation and any partitioning
    give the identical sketch. The sign is a pure function of
    md5(j:value) (replayable in the oracle engine — the FeatureHasher
    convention), so the estimate is DETERMINISTIC: the oracle checks
    it for exact equality (integer cell sums / k), and the accuracy
    band is a verdict row in the gate, like the other sketches.

    Output: (keys..., f2_estimate double, n long).
    """

    def __init__(self, col: str, counters: int = 64, keys=(),
                 label=None):
        super().__init__(label)
        self.col = col
        self.counters = int(counters)
        if not 4 <= self.counters <= 1024:
            raise ValueError(f"counters {counters} outside [4, 1024]")
        self.keys = [keys] if isinstance(keys, str) else list(keys)

    def expand(self, pcoll):
        c, ks, k = self.col, self.keys, self.counters
        base = pcoll.df.where(F.col(c).isNotNull()).select(
            *ks, F.col(c).cast("string").alias("__v"))
        # Per-(keys, value) frequencies FIRST: the ±1 sign is a pure
        # function of (j, value), so Z_j = sum_v f_v * s_j(v) — the
        # identical integer cells, but the md5 sign derivation runs
        # once per DISTINCT value per cell instead of once per ROW
        # per cell (k x fewer hashes than rows when values repeat,
        # measured 3.5s -> 0.6s on the sf0.1 events member). The
        # frequency pass partially aggregates map-side, so the first
        # shuffle carries (keys x distinct-values) count cells and
        # the second the (keys x k) integer cells — never raw rows.
        freq = base.groupBy(*ks, "__v").agg(
            F.count(F.lit(1)).cast("long").alias("__f"))
        ex = freq.select(
            *ks, "__v", "__f",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__j"))
        sign = (F.lit(1) - F.lit(2)
                * (F.conv(F.substring(
                    F.md5(F.concat(F.col("__j").cast("string"),
                                   F.lit(":"), F.col("__v"))),
                    1, 1), 16, 10).cast("bigint") % F.lit(2)))
        cells = (ex.groupBy(*ks, "__j")
                 .agg(F.sum(sign * F.col("__f")).cast("long")
                      .alias("__z"),
                      F.sum("__f").cast("long").alias("__n")))
        out = (cells.groupBy(*ks)
               .agg((F.sum(F.col("__z") * F.col("__z"))
                     .cast("double") / F.lit(float(k)))
                    .alias("f2_estimate"),
                    F.max("__n").cast("long").alias("n")))
        return pcoll.with_df(out)


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


# ----------------------------------------------------------------------
# TDigestQuantiles (reference sdks/java/extensions/sketching/
# TDigestQuantiles.java — t-digest centroid sketches, mergeable across
# partitions). Semantics rebuilt from the public t-digest construction
# (Dunning's k1 scale bound: centroid weight <= 4*n*q*(1-q)/delta).
# ----------------------------------------------------------------------
def _tdigest_compress(means, weights, delta: float):
    """Merge sorted (mean, weight) centroids under the k1 size bound."""
    import numpy as np

    order = np.argsort(means, kind="mergesort")
    m, w = np.asarray(means, float)[order], np.asarray(weights, float)[order]
    total = w.sum()
    out_m: list = []
    out_w: list = []
    cur_m, cur_w, done_w = m[0], w[0], 0.0
    for i in range(1, len(m)):
        q = (done_w + cur_w / 2.0) / total
        limit = max(4.0 * total * q * (1.0 - q) / delta, 1.0)
        if cur_w + w[i] <= limit:
            cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
            cur_w += w[i]
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            done_w += cur_w
            cur_m, cur_w = m[i], w[i]
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def _tdigest_quantile(means, weights, q: float) -> float:
    """Interpolated quantile from centroid (mean, weight) pairs."""
    import numpy as np

    m, w = np.asarray(means, float), np.asarray(weights, float)
    order = np.argsort(m, kind="mergesort")
    m, w = m[order], w[order]
    total = w.sum()
    target = q * total
    # centroid centers sit at cumulative weight (prefix + w/2)
    centers = np.cumsum(w) - w / 2.0
    if target <= centers[0]:
        return float(m[0])
    if target >= centers[-1]:
        return float(m[-1])
    i = int(np.searchsorted(centers, target)) - 1
    span = centers[i + 1] - centers[i]
    frac = (target - centers[i]) / span if span > 0 else 0.0
    return float(m[i] + frac * (m[i + 1] - m[i]))


class DdSketchQuantiles(PTransform):
    """DDSketch quantiles (Masson, Rim & Lee, VLDB 2019) — the
    RELATIVE-error mergeable quantile sketch (t-digest bounds rank
    error; DDSketch guarantees |est - true| <= alpha * true, which is
    what latency/price distributions want). The sketch is just a
    log-bucket histogram, so in Spark it degenerates to one groupBy:

        gamma  = (1 + alpha) / (1 - alpha)
        bucket = ceil(ln(x) / ln(gamma))          (x > 0)
        est(q) = 2 * gamma^b / (gamma + 1),  b = first bucket whose
                 cumulative count > floor(q * (n - 1))

    Merge-safety is inherent (bucket counts add), so partial
    aggregation and any partitioning give identical sketches.
    ln(gamma) is precomputed DRIVER-side and shipped as a literal —
    both engines then divide by the identical double instead of each
    taking libm ln of gamma. Rows with x <= 0 are excluded from the
    sketch (DDSketch stores them out-of-band) and reported in
    ``n_nonpos``.

    Output: (keys..., q, estimate round 6, n, n_nonpos) — one row
    per key per requested quantile.
    """

    def __init__(self, col: str, quantiles=(0.5, 0.95, 0.99),
                 alpha: float = 0.01, keys=(), label=None):
        super().__init__(label)
        self.col = col
        self.quantiles = [float(q) for q in quantiles]
        if not self.quantiles or not all(
                0.0 < q < 1.0 for q in self.quantiles):
            raise ValueError("quantiles must be in (0, 1)")
        self.alpha = float(alpha)
        if not 0.0 < self.alpha < 1.0:
            raise ValueError(f"alpha {alpha} outside (0, 1)")
        self.keys = [keys] if isinstance(keys, str) else list(keys)

    def expand(self, pcoll):
        import math

        from pyspark.sql import Window

        c, ks = self.col, self.keys
        gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        lgam = math.log(gamma)
        g1 = gamma + 1.0
        base = pcoll.df.where(F.col(c).isNotNull()).select(
            *ks, F.col(c).cast("double").alias("__x"))
        nonpos = (base.groupBy(*ks)
                  .agg(F.sum(F.when(F.col("__x") <= 0.0, 1)
                             .otherwise(0)).cast("long")
                       .alias("n_nonpos")))
        counts = (base.where(F.col("__x") > 0.0)
                  .groupBy(*ks,
                           F.ceil(F.log("__x") / F.lit(lgam))
                           .cast("long").alias("__b"))
                  .agg(F.count(F.lit(1)).cast("long").alias("__c")))
        w_cum = (Window.partitionBy(*ks).orderBy("__b")
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
        w_tot = Window.partitionBy(*ks)
        cum = counts.select(
            *ks, "__b",
            F.sum("__c").over(w_cum).alias("__cum"),
            F.sum("__c").over(w_tot).alias("__n"))
        qs = F.explode(F.array(*[F.lit(q) for q in self.quantiles]))
        cand = (cum.select(*ks, "__b", "__cum", "__n",
                           qs.alias("q"))
                .where(F.col("__cum").cast("double")
                       > F.floor(F.col("q")
                                 * (F.col("__n") - 1).cast("double"))
                       .cast("double"))
                .groupBy(*ks, "q")
                .agg(F.min("__b").alias("__bs"),
                     F.max("__n").alias("n")))
        est = (F.lit(2.0) * F.pow(F.lit(gamma), F.col("__bs"))
               / F.lit(g1))
        sel = cand.select(*ks, "q", F.round(est, 6).alias("estimate"),
                          F.col("n").cast("long").alias("n"))
        out = (sel.join(nonpos, ks) if ks
               else sel.crossJoin(nonpos))
        return pcoll.with_df(out.select(
            *ks, "q", "estimate", "n", "n_nonpos"))


class TDigestQuantiles(PTransform):
    """Distributed, mergeable t-digest quantiles.

    Two-level sketch: each input PARTITION folds its rows into a local
    digest inside one Arrow pass (per key when keyed), then the per-key
    reduce merges the partial digests' centroids — the shuffle carries
    O(delta) centroids per (key, partition), never the rows. That is the
    property percentile_approx also has; this class exists for parity
    with the reference's explicit TDigest contract (tunable ``delta``,
    digest merge semantics) and as the documented custom-sketch pattern.

    Output: key cols + one DOUBLE column per requested quantile, named
    ``q_<percent>`` (q_50, q_99_9).
    """

    def __init__(self, col: str, quantiles, keys=None, delta: float = 100.0,
                 label=None):
        super().__init__(label)
        self.col, self.quantiles = col, list(quantiles)
        self.keys = [keys] if isinstance(keys, str) else list(keys or [])
        self.delta = delta

    @staticmethod
    def _qname(q: float) -> str:
        return ("q_" + f"{q * 100:g}".replace(".", "_"))

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        col, keys, delta, qs = self.col, self.keys, self.delta, self.quantiles
        key_schema = ", ".join(
            f"{k} {pcoll.df.schema[k].dataType.simpleString()}" for k in keys)
        mid_schema = (key_schema + ", " if keys else "") + \
            "means array<double>, weights array<double>"

        def partial(batches):
            for pdf in batches:
                groups = pdf.groupby(keys) if keys else [((), pdf)]
                rows = []
                for gkey, gdf in groups:
                    vals = gdf[col].dropna().to_numpy(dtype=float)
                    if not len(vals):
                        continue
                    m, w = _tdigest_compress(vals, [1.0] * len(vals), delta)
                    gkey = gkey if isinstance(gkey, tuple) else (gkey,)
                    rows.append({**dict(zip(keys, gkey)),
                                 "means": m, "weights": w})
                if rows:
                    yield pd.DataFrame(rows)

        partials = pcoll.df.select(*(keys + [col])).mapInPandas(
            partial, schema=mid_schema)

        out_schema = (key_schema + ", " if keys else "") + ", ".join(
            f"{self._qname(q)} double" for q in qs)

        def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
            means = [x for arr in pdf["means"] for x in arr]
            weights = [x for arr in pdf["weights"] for x in arr]
            m, w = _tdigest_compress(means, weights, delta)
            row = {k: pdf[k].iloc[0] for k in keys}
            for q in qs:
                row[self._qname(q)] = _tdigest_quantile(m, w, q)
            return pd.DataFrame([row])

        if keys:
            out = partials.groupBy(*keys).applyInPandas(merge, schema=out_schema)
        else:
            out = (partials.withColumn("__g", F.lit(1)).groupBy("__g")
                   .applyInPandas(lambda pdf: merge(pdf), schema=out_schema))
        return pcoll.with_df(out)


class Ewma(PTransform):
    """Per-key exponential moving average in event order:
    ``y_i = alpha * x_i + (1 - alpha) * y_{i-1}`` (pandas
    ``ewm(alpha=..., adjust=False).mean()`` semantics; NULL inputs
    carry the previous smoothed value forward unchanged).

    The recurrence has no shuffle-free Spark-SQL form: the closed-form
    prefix trick multiplies by ``(1-alpha)^-i``, which overflows for
    any real partition length, so this runs the recurrence inside an
    Arrow-batched ``applyInPandas`` per key — the documented
    Python-for-a-reason posture (same as TDigest's fold). A
    ``frompyfunc.accumulate`` keeps the loop in C over the whole
    group. One key shuffle; per-key state is O(1).

    Output: input columns + ``out_col`` (double).
    """

    def __init__(self, col: str, alpha: float, keys,
                 order_by, out_col: str = "ewma", label=None):
        super().__init__(label)
        if not 0.0 < float(alpha) <= 1.0:
            raise ValueError(f"alpha {alpha} outside (0, 1]")
        self.col, self.alpha = col, float(alpha)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.out_col = out_col

    def expand(self, pcoll):
        import numpy as np

        col, a, ob, oc = self.col, self.alpha, self.order_by, self.out_col
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in pcoll.df.schema.fields) + f", {oc} double"

        def fn(pdf):
            pdf = pdf.sort_values(ob, kind="mergesort")
            x = pdf[col].to_numpy(dtype=object)
            # acc != acc catches a NaN seed: accumulate's first output
            # is the RAW first element (never passed through this fn),
            # so a leading NULL arrives as NaN and must still count as
            # "unseeded" — pandas adjust=False seeds at first non-NULL
            step = np.frompyfunc(
                lambda acc, v: acc if v is None or v != v
                else (float(v) if acc is None or acc != acc
                      else a * float(v) + (1.0 - a) * acc), 2, 1)
            y = step.accumulate(x, dtype=object)
            pdf[oc] = [None if v is None or v != v else float(v)
                       for v in y]
            return pdf

        out = pcoll.df.groupBy(*self.keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class HoltLinear(PTransform):
    """Per-key Holt linear-trend double exponential smoothing in
    event order (Holt 1957 — the level+trend extension of Ewma for
    series that drift):

        l_i = alpha * x_i + (1 - alpha) * (l_{i-1} + b_{i-1})
        b_i = beta * (l_i - l_{i-1}) + (1 - beta) * b_{i-1}

    Seeding follows the Ewma posture: output stays NULL until the
    first non-NULL value, which seeds l = x, b = 0; NULL inputs carry
    both states forward unchanged. The one-step-ahead forecast is
    ``level + trend`` (left to the caller — it is a pure projection).

    Like Ewma, the recurrence has no shuffle-free Spark-SQL form, so
    it runs inside an Arrow-batched ``applyInPandas`` per key with a
    ``frompyfunc.accumulate`` keeping the fold in C over the whole
    group. One key shuffle; per-key state is O(1). With binary-exact
    coefficients the op sequence is engine-replayable bit-for-bit
    (the q_ts_holt recursive-CTE oracle compares UNROUNDED).

    Output: input columns + ``level`` and ``trend`` (double).
    """

    def __init__(self, col: str, alpha: float, beta: float, keys,
                 order_by, level_col: str = "level",
                 trend_col: str = "trend", label=None):
        super().__init__(label)
        if not 0.0 < float(alpha) <= 1.0:
            raise ValueError(f"alpha {alpha} outside (0, 1]")
        if not 0.0 <= float(beta) <= 1.0:
            raise ValueError(f"beta {beta} outside [0, 1]")
        self.col = col
        self.alpha, self.beta = float(alpha), float(beta)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.level_col, self.trend_col = level_col, trend_col

    def expand(self, pcoll):
        import numpy as np

        col, a, be = self.col, self.alpha, self.beta
        ob, lc, tc = self.order_by, self.level_col, self.trend_col
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in pcoll.df.schema.fields) + f", {lc} double, {tc} double"

        def fn(pdf):
            pdf = pdf.sort_values(ob, kind="mergesort")
            x = pdf[col].to_numpy(dtype=object)

            def step(acc, v):
                # accumulate's first output is the RAW first element:
                # normalize a scalar seed (or NULL) into state form
                if not isinstance(acc, tuple):
                    acc = (None if acc is None or acc != acc
                           else (float(acc), 0.0))
                if v is None or v != v:
                    return acc                      # carry state
                if acc is None:
                    return (float(v), 0.0)           # seed
                l, b = acc
                l_new = a * float(v) + (1.0 - a) * (l + b)
                return (l_new, be * (l_new - l) + (1.0 - be) * b)

            y = np.frompyfunc(step, 2, 1).accumulate(x, dtype=object)

            def unpack(v):
                if isinstance(v, tuple):
                    return v
                return ((None, None) if v is None or v != v
                        else (float(v), 0.0))

            pairs = [unpack(v) for v in y]
            pdf[lc] = [p[0] for p in pairs]
            pdf[tc] = [p[1] for p in pairs]
            return pdf

        out = pcoll.df.groupBy(*self.keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class CusumDetect(PTransform):
    """Per-key one-sided CUSUM changepoint scores (Page 1954): in
    event order,

        s_hi_i = max(0, s_hi_{i-1} + (x_i - target) - slack)
        s_lo_i = max(0, s_lo_{i-1} - (x_i - target) - slack)
        alarm_i = s_hi_i > threshold OR s_lo_i > threshold

    — the classic mean-shift monitor for pipeline telemetry (did this
    feed's quality score drift up/down). ``target`` is the in-control
    mean, ``slack`` the half-band of ignorable drift, ``threshold``
    the alarm level. NULL inputs carry state unchanged.

    Like ``Ewma``, the max(0, ...) recurrence has no shuffle-free SQL
    form, so it runs as an Arrow-batched applyInPandas recurrence per
    key (frompyfunc C-loop). One key shuffle, O(1) per-key state.

    Output: input columns + s_hi, s_lo (double), alarm (boolean).
    """

    def __init__(self, col: str, target: float, keys, order_by,
                 slack: float = 0.0, threshold: float = 5.0,
                 label=None):
        super().__init__(label)
        self.col, self.target = col, float(target)
        self.slack, self.threshold = float(slack), float(threshold)
        if self.slack < 0 or self.threshold <= 0:
            raise ValueError("need slack >= 0 and threshold > 0")
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll):
        import numpy as np

        col, ob = self.col, self.order_by
        tgt, slack, thr = self.target, self.slack, self.threshold
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in pcoll.df.schema.fields) \
            + ", s_hi double, s_lo double, alarm boolean"

        def fn(pdf):
            pdf = pdf.sort_values(ob, kind="mergesort")
            x = pdf[col].to_numpy(dtype=object)

            def step_hi(acc, v):
                if v is None or v != v:
                    return acc
                return max(0.0, acc + (float(v) - tgt) - slack)

            def step_lo(acc, v):
                if v is None or v != v:
                    return acc
                return max(0.0, acc - (float(v) - tgt) - slack)

            if len(x):
                # seed the in-control 0-state so row 0 runs the step
                seeded = np.concatenate(([0.0], x))
                hi = np.frompyfunc(step_hi, 2, 1).accumulate(
                    seeded, dtype=object)[1:]
                lo = np.frompyfunc(step_lo, 2, 1).accumulate(
                    seeded, dtype=object)[1:]
            else:
                hi = lo = x
            pdf["s_hi"] = [float(v) for v in hi]
            pdf["s_lo"] = [float(v) for v in lo]
            pdf["alarm"] = [bool(h > thr or l > thr)
                            for h, l in zip(pdf["s_hi"], pdf["s_lo"])]
            return pdf

        out = pcoll.df.groupBy(*self.keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class MisraGries(PTransform):
    """Distributed Misra-Gries heavy-hitters summary (Misra & Gries
    1982; mergeable per Agarwal et al. 2012): at most ``k`` counters
    survive per partition, yet EVERY item with true frequency
    > n/(k+1) is guaranteed present in the output with an estimate in
    ``[true - n/(k+1), true]`` — the deterministic counterpart of
    count-min for "which items are hot" questions at 100 TB, where an
    exact groupBy-count of a high-cardinality column would shuffle
    the full key space just to find twenty winners.

    Plan: one ``mapInPandas`` pass folds each partition's batches into
    a capped counter dict (vectorized value_counts per batch; the cap
    applies the mergeable-summaries decrement — subtract the (k+1)-th
    largest count, drop <= 0), emitting <= k rows per partition; one
    item-keyed sum merges the partial summaries (union without a
    final decrement only tightens the estimate — total decrement
    across partitions stays <= n/(k+1)). Shuffle volume is
    <= k * num_partitions ROWS, independent of data size or key
    cardinality. NULL items are ignored.

    Output: (``col``, ``est``) — at most k * num_partitions rows,
    est = lower-bound count.
    """

    def __init__(self, col: str, k: int = 50, label=None):
        super().__init__(label)
        if k < 1:
            raise ValueError("k must be >= 1")
        self.col, self.k = col, int(k)

    def expand(self, pcoll: PCollection) -> PCollection:
        col, k = self.col, self.k

        def sketch(batches):
            import pandas as pd

            cnt = {}
            for pdf in batches:
                vc = pdf[col].dropna().value_counts()
                for item, c in vc.items():
                    cnt[item] = cnt.get(item, 0) + int(c)
                if len(cnt) > k:
                    # mergeable-summaries decrement: removing the
                    # (k+1)-th largest count from everyone charges
                    # each survivor at most its share of n/(k+1)
                    t = sorted(cnt.values(), reverse=True)[k]
                    cnt = {i: c - t for i, c in cnt.items() if c > t}
            if cnt:
                yield pd.DataFrame(
                    {col: list(cnt), "est": list(cnt.values())})

        field = pcoll.df.schema[col]
        partials = pcoll.df.select(col).mapInPandas(
            sketch, f"{col} {field.dataType.simpleString()}, est long")
        out = partials.groupBy(col).agg(F.sum("est").alias("est"))
        return pcoll.with_df(out)


class SeasonalDecompose(PTransform):
    """Classical additive seasonal decomposition per key (the
    moving-average method underlying STL, Cleveland et al. 1990 —
    statsmodels ``seasonal_decompose(model='additive')`` semantics):

        trend_t    = centered moving average of width ``period``
                     (the 2xMA with half-weight endpoints when the
                     period is even — the standard correction)
        seasonal_p = mean of (x - trend) at phase p = t mod period,
                     centered so the seasonal component sums to ~0
        remainder  = x - trend - seasonal

    Rows whose centered window is incomplete (the first/last
    period/2 rows per key) get NULL trend and remainder — exactly
    statsmodels' edge behavior. Phases are positional (row number in
    event order mod period), so the series should be gap-free at the
    period's cadence (run GapFill first for sparse series).

    ``robust=True`` (the STL robustness goal without LOESS,
    Cleveland et al. 1990 §3's outlier concern): the trend becomes a
    centered RUNNING MEDIAN over the same window (which is always
    ODD width — period, or period+1 when even — so the median is an
    exact order statistic, no interpolation) and the per-phase
    seasonal effect becomes the MEDIAN of the detrended values at
    that phase; centering (so seasonal sums to ~0) stays a mean. A
    single spike then perturbs neither the trend near it nor its
    phase's seasonal — the breakdown-point argument that LOESS-with-
    robustness-weights buys, at one window pass instead of iterated
    local regressions.

    Scale: one key-partitioned frame window for the trend, one
    (key, phase) aggregation + one key aggregation for the seasonal
    means, joined back — all JVM-side, shuffles keyed on the key.
    Outputs round to 6 dp (group-mean accumulation order is
    engine-dependent; the repo-wide float-score pattern).

    Output: input columns + trend, seasonal, remainder (double).
    """

    def __init__(self, col: str, period: int, keys,
                 order_by, robust: bool = False, label=None):
        super().__init__(label)
        if period < 2:
            raise ValueError("period must be >= 2")
        self.col, self.period = col, int(period)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.robust = bool(robust)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        p, keys, ob = self.period, self.keys, self.order_by
        v = F.col(self.col).cast("double")
        w = Window.partitionBy(*keys).orderBy(*ob)
        half = p // 2
        frame = w.rowsBetween(-half, half)
        need = p + 1 if p % 2 == 0 else p   # window width (always odd)
        if self.robust:
            # running median over the same centered window — exact
            # middle order statistic (odd width), no interpolation.
            # percentile(0.5), not median(): Spark rejects median
            # over a framed window spec
            trend = F.when(
                F.count(v).over(frame) == need,
                F.expr(f"percentile(CAST({self.col} AS DOUBLE), 0.5)")
                .over(frame))
        elif p % 2 == 0:
            # 2xMA: half-weight endpoints
            trend = F.when(
                F.count(v).over(frame) == p + 1,
                (F.sum(v).over(frame)
                 - 0.5 * F.lag(v, half).over(w)
                 - 0.5 * F.lead(v, half).over(w)) / p)
        else:
            trend = F.when(F.count(v).over(frame) == p,
                           F.sum(v).over(frame) / p)
        df = (pcoll.df
              .withColumn("__phase",
                          (F.row_number().over(w) - 1) % p)
              .withColumn("__trend", trend)
              .withColumn("__detr", v - F.col("__trend")))
        ph_stat = (F.median("__detr") if self.robust
                   else F.avg("__detr"))
        ph = (df.groupBy(*keys, "__phase")
              .agg(ph_stat.alias("__s_raw")))
        ctr = (ph.groupBy(*keys)
               .agg(F.avg("__s_raw").alias("__s_mean")))
        out = (df.join(ph, on=[*keys, "__phase"])
               .join(ctr, on=keys)
               .withColumn("seasonal",
                           F.round(F.col("__s_raw")
                                   - F.col("__s_mean"), 6))
               .withColumn("trend", F.round("__trend", 6))
               .withColumn("remainder",
                           F.round(v - F.col("__trend")
                                   - (F.col("__s_raw")
                                      - F.col("__s_mean")), 6))
               .drop("__phase", "__trend", "__detr", "__s_raw",
                     "__s_mean"))
        return pcoll.with_df(out)


class HoltWinters(PTransform):
    """Per-key Holt-Winters TRIPLE exponential smoothing
    (level + trend + seasonal; Winters 1960) in event order.

    ``mode='additive'`` (default):

        l_t = alpha * (x_t - s_{t-m}) + (1-alpha) * (l_{t-1} + b_{t-1})
        b_t = beta  * (l_t - l_{t-1}) + (1-beta)  * b_{t-1}
        s_t = gamma * (x_t - l_t)     + (1-gamma) * s_{t-m}

    ``mode='multiplicative'`` (seasonal swing proportional to level —
    the right model when amplitude grows with the series):

        l_t = alpha * (x_t / s_{t-m}) + (1-alpha) * (l_{t-1} + b_{t-1})
        b_t = beta  * (l_t - l_{t-1}) + (1-beta)  * b_{t-1}
        s_t = gamma * (x_t / l_t)     + (1-gamma) * s_{t-m}

    Deterministic initialization (documented; the first ``period``
    rows emit NULL and seed the state): l = running mean of the first
    period's values (accumulated left-to-right), b = 0,
    s_i = x_i - l (additive) or x_i / l (multiplicative) for each
    phase i. Keys with fewer than ``period`` rows emit all NULLs.
    NULL inputs are REJECTED (ValueError) — run GapFill/filters
    first; a seasonal recurrence cannot carry a hole without
    corrupting the phase alignment. Multiplicative mode additionally
    REJECTS values <= 0 (the ratios divide by level and season;
    classical Winters is defined for strictly positive series).

    Like Ewma/HoltLinear the recurrence runs in an Arrow-batched
    ``applyInPandas`` per key; with binary-exact coefficients every
    arithmetic step is engine-replayable — the q_ts_holt_winters
    oracle replays it in a DuckDB recursive CTE carrying the seasonal
    RING BUFFER as a list column, compared UNROUNDED.

    Output: input columns + level, trend, season (all double; NULL
    for the first period rows). ``emit_forecast=True`` adds
    ``forecast_next`` — the one-step-ahead in-sample prediction
    x̂_{t+1|t} = l_t + b_t + s_{t+1-m} (multiplicative:
    (l_t + b_t) * s_{t+1-m}) — the backtest column: join it against
    the NEXT row's actual for residual diagnostics, or read the last
    row's value as the 1-step operational forecast.

    ``forecast_horizons=[h1, h2, ...]`` adds a ``forecast_h{h}``
    column per horizon — the classical h-step-ahead prediction from
    the state at t: x̂_{t+h|t} = l_t + h*b_t + s[(t+h) mod m]
    (multiplicative: (l_t + h*b_t) * s[(t+h) mod m]); the seasonal
    is the ring buffer's LATEST estimate for the target phase, which
    for any h — including h > period — is exactly the
    s_{t+h-m(⌊(h-1)/m⌋+1)} of the textbook formula. ``forecast_h1``
    is bit-equal to ``forecast_next`` (1*b == b in IEEE). Horizons
    add columns, not passes: the recurrence runs once.
    """

    def __init__(self, col: str, alpha: float, beta: float,
                 gamma: float, period: int, keys, order_by,
                 mode: str = "additive", emit_forecast: bool = False,
                 forecast_horizons=None, label=None):
        super().__init__(label)
        if not 0.0 < float(alpha) <= 1.0:
            raise ValueError(f"alpha {alpha} outside (0, 1]")
        if not 0.0 <= float(beta) <= 1.0:
            raise ValueError(f"beta {beta} outside [0, 1]")
        if not 0.0 <= float(gamma) <= 1.0:
            raise ValueError(f"gamma {gamma} outside [0, 1]")
        if int(period) < 2:
            raise ValueError("period must be >= 2")
        if mode not in ("additive", "multiplicative"):
            raise ValueError(
                f"mode {mode!r}: 'additive' or 'multiplicative'")
        self.col = col
        self.alpha, self.beta, self.gamma = (float(alpha), float(beta),
                                             float(gamma))
        self.period = int(period)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.mode = mode
        self.emit_forecast = bool(emit_forecast)
        self.forecast_horizons = None
        if forecast_horizons is not None:
            hs = sorted({int(h) for h in forecast_horizons})
            if not hs or hs[0] < 1:
                raise ValueError(
                    f"forecast_horizons {forecast_horizons!r}: "
                    "need >= 1 integer horizons")
            self.forecast_horizons = hs

    def expand(self, pcoll):
        col, m = self.col, self.period
        a, be, g = self.alpha, self.beta, self.gamma
        ob = self.order_by
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in pcoll.df.schema.fields) \
            + ", level double, trend double, season double"
        emit_fc = self.emit_forecast
        if emit_fc:
            schema += ", forecast_next double"
        horizons = self.forecast_horizons or []
        for h in horizons:
            schema += f", forecast_h{h} double"

        mul = self.mode == "multiplicative"

        def fn(pdf):
            pdf = pdf.sort_values(ob, kind="mergesort")
            if pdf[col].isna().any():
                raise ValueError(
                    "HoltWinters: NULL input values — gap-fill or "
                    "filter upstream (seasonal phase cannot skip)")
            x = pdf[col].astype(float).to_list()
            if mul and any(v <= 0.0 for v in x):
                raise ValueError(
                    "HoltWinters(mode='multiplicative'): values must "
                    "be > 0 (the seasonal ratio divides by level and "
                    "season) — filter or shift upstream")
            n = len(x)
            out_l = [None] * n
            out_b = [None] * n
            out_s = [None] * n
            out_f = [None] * n
            out_h = {h: [None] * n for h in horizons}
            if n >= m:
                tot = 0.0
                for i in range(m):
                    tot += x[i]
                lv = tot / m
                s = ([x[i] / lv for i in range(m)] if mul
                     else [x[i] - lv for i in range(m)])
                bb = 0.0
                for t in range(m, n):
                    j = t % m
                    if mul:
                        l_new = (a * (x[t] / s[j])
                                 + (1.0 - a) * (lv + bb))
                        b_new = be * (l_new - lv) + (1.0 - be) * bb
                        s_new = g * (x[t] / l_new) + (1.0 - g) * s[j]
                    else:
                        l_new = (a * (x[t] - s[j])
                                 + (1.0 - a) * (lv + bb))
                        b_new = be * (l_new - lv) + (1.0 - be) * bb
                        s_new = g * (x[t] - l_new) + (1.0 - g) * s[j]
                    s[j] = s_new
                    lv, bb = l_new, b_new
                    out_l[t], out_b[t], out_s[t] = lv, bb, s_new
                    if emit_fc:
                        # s[(t+1) % m] was last written at t+1-m: the
                        # seasonal the NEXT step consumes
                        out_f[t] = ((lv + bb) * s[(t + 1) % m] if mul
                                    else lv + bb + s[(t + 1) % m])
                    for h in horizons:
                        out_h[h][t] = (
                            (lv + h * bb) * s[(t + h) % m] if mul
                            else lv + h * bb + s[(t + h) % m])
            pdf["level"] = out_l
            pdf["trend"] = out_b
            pdf["season"] = out_s
            if emit_fc:
                pdf["forecast_next"] = out_f
            for h in horizons:
                pdf[f"forecast_h{h}"] = out_h[h]
            return pdf

        out = pcoll.df.groupBy(*self.keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class Acf(PTransform):
    """Per-key sample autocorrelation function at lags 1..``lags``
    (the standard biased estimator, Box & Jenkins):

        r_l = sum_{t>l} (x_t - mean)(x_{t-l} - mean)
              / sum_t (x_t - mean)^2

    — seasonality/memory detection for event-value series (pick the
    Holt-Winters / SeasonalDecompose period from the ACF peaks).
    NULL values are dropped before ordering (the series should be
    gap-free at its cadence; GapFill first for strict-lag semantics).
    Constant series (zero denominator) yield NULL acf.

    Scale: one per-key mean aggregation joined back, one window pass
    producing all ``lags`` shifted columns, one aggregation computing
    the denominator and every numerator together — two shuffles total
    regardless of the lag count, all JVM expressions.

    Output: one row per (key, lag): keys + (lag int, acf double
    rounded 6).
    """

    def __init__(self, col: str, lags: int, keys, order_by, label=None):
        super().__init__(label)
        if int(lags) < 1:
            raise ValueError("lags must be >= 1")
        self.col, self.lags = col, int(lags)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        keys, ob, L = self.keys, self.order_by, self.lags
        v = F.col(self.col).cast("double")
        base = pcoll.df.where(F.col(self.col).isNotNull())
        mu = base.groupBy(*keys).agg(F.avg(v).alias("__mu"))
        w = Window.partitionBy(*keys).orderBy(*ob)
        d = base.join(mu, on=keys)
        for lag in range(1, L + 1):
            d = d.withColumn(f"__l{lag}", F.lag(v, lag).over(w))
        aggs = [F.sum((v - F.col("__mu")) * (v - F.col("__mu")))
                .alias("__den")]
        for lag in range(1, L + 1):
            aggs.append(F.sum((v - F.col("__mu"))
                              * (F.col(f"__l{lag}") - F.col("__mu")))
                        .alias(f"__n{lag}"))
        g = d.groupBy(*keys).agg(*aggs)
        pairs = ", ".join(
            f"{lag}, CASE WHEN __den <> 0 THEN round(__n{lag} / __den, 6)"
            f" END" for lag in range(1, L + 1))
        out = (g.select(*keys, F.expr(
            f"stack({L}, {pairs}) AS (lag, acf)")))
        return pcoll.with_df(out)


class Pacf(PTransform):
    """Per-key PARTIAL autocorrelation at lags 1..``lags`` via the
    Durbin-Levinson recursion over the sample ACF (Box & Jenkins) —
    the AR-order identification companion to :class:`Acf`: pacf[k]
    is the lag-k coefficient of the best AR(k) fit, so it cuts off
    sharply at the true AR order where the ACF only decays.

    Scale: the heavy part is identical to Acf (mean join + one
    multi-lag aggregation -> ONE ROW PER KEY of moment sums); the
    recursion then runs VECTORIZED across all keys at once in an
    Arrow-batched mapInPandas (numpy arrays shaped (lags, batch) —
    no per-key Python loop). Keys with a zero denominator (constant
    series) are dropped; a degenerate step (innovation variance hits
    0, i.e. the series is perfectly predictable at order k) yields
    NULL from that lag on.

    Output: keys + (lag int, pacf double, UNROUNDED — apply the
    engine's round() downstream; numpy's half-even rule differs from
    Spark/DuckDB at half boundaries).
    """

    def __init__(self, col: str, lags: int, keys, order_by, label=None):
        super().__init__(label)
        if int(lags) < 1:
            raise ValueError("lags must be >= 1")
        self.col, self.lags = col, int(lags)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        keys, ob, L = self.keys, self.order_by, self.lags
        v = F.col(self.col).cast("double")
        base = pcoll.df.where(F.col(self.col).isNotNull())
        mu = base.groupBy(*keys).agg(F.avg(v).alias("__mu"))
        w = Window.partitionBy(*keys).orderBy(*ob)
        d = base.join(mu, on=keys)
        for lag in range(1, L + 1):
            d = d.withColumn(f"__l{lag}", F.lag(v, lag).over(w))
        aggs = [F.sum((v - F.col("__mu")) * (v - F.col("__mu")))
                .alias("__den")]
        for lag in range(1, L + 1):
            aggs.append(F.sum((v - F.col("__mu"))
                              * (F.col(f"__l{lag}") - F.col("__mu")))
                        .alias(f"__n{lag}"))
        g = (d.groupBy(*keys).agg(*aggs)
             .where(F.col("__den") != 0))
        for lag in range(1, L + 1):
            g = g.withColumn(f"__n{lag}",
                             F.coalesce(f"__n{lag}", F.lit(0.0)))

        key_fields = [(k, pcoll.df.schema[k].dataType.simpleString())
                      for k in keys]
        out_schema = (", ".join(f"{k} {t}" for k, t in key_fields)
                      + ", lag int, pacf double")

        def gen(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                den = pdf["__den"].to_numpy(dtype=np.float64)
                r = np.stack([pdf[f"__n{lag}"].to_numpy(np.float64) / den
                              for lag in range(1, L + 1)])
                pacf = np.full((L, n), np.nan)
                phi = np.zeros((L, n))
                pacf[0] = r[0]
                phi[0] = r[0]
                var = 1.0 - r[0] * r[0]
                for k in range(2, L + 1):
                    num = r[k - 1].copy()
                    for j in range(1, k):        # fixed order, like SQL
                        num = num - phi[j - 1] * r[k - 1 - j]
                    ok = var > 0
                    with np.errstate(divide="ignore", invalid="ignore"):
                        phik = np.where(ok, num / np.where(ok, var, 1.0),
                                        np.nan)
                    newphi = phi.copy()
                    for j in range(1, k):
                        newphi[j - 1] = phi[j - 1] - phik * phi[k - 1 - j]
                    newphi[k - 1] = phik
                    phi = newphi
                    pacf[k - 1] = phik
                    var = var * (1.0 - phik * phik)
                rows = {k: np.repeat(pdf[k].to_numpy(), L)
                        for k, _ in key_fields}
                rows["lag"] = np.tile(np.arange(1, L + 1), n)
                # raw doubles out — consumers round (numpy's banker
                # rounding differs from Spark/DuckDB round() at the
                # half boundary, the repo-wide rounding gotcha)
                rows["pacf"] = pacf.T.reshape(-1)
                out = pd.DataFrame(rows)
                out["pacf"] = out["pacf"].where(~np.isnan(out["pacf"]),
                                                None)
                yield out

        return pcoll.with_df(g.mapInPandas(gen, schema=out_schema))


class ArForecast(PTransform):
    """Per-key AR(p) h-step forecast fitted by Yule-Walker — the
    autoregressive sibling of Holt/Theta/Croston and the consumer of
    :class:`Pacf`'s order identification: run the same Durbin-Levinson
    recursion over the sample ACF to order ``p``; the final phi vector
    IS the Yule-Walker AR(p) coefficient estimate, and the forecast
    iterates the fitted recurrence on mean deviations:

        f_j = phi_1 * f_{j-1} + ... + phi_p * f_{j-p}
        (f_0 = x_n - mu, f_{-1} = x_{n-1} - mu, ...)
        forecast_h = mu + f_h

    Stationarity is NOT enforced: a phi outside the stationary region
    produces (correctly) diverging forecasts — fix the order with
    Pacf first. Keys with a constant series (zero ACF denominator) or
    fewer than p + 1 rows are dropped; a degenerate Durbin-Levinson
    step (innovation variance 0) yields NULL forecasts for the key.
    NULL values are dropped before ordering (GapFill upstream for
    strict-lag semantics — same contract as Acf).

    Scale: identical envelope to Pacf — one per-key mean join, one
    window pass for the p lag columns (the last row's lags double as
    the forecast's starting deviations via max_by), ONE aggregation to
    moment sums; the recursion + forecast then run vectorized across
    keys in an Arrow-batched mapInPandas on one row per key.

    Output: one row per (key, h): keys + (h int, forecast double,
    phi_1..phi_p double — UNROUNDED, consumers round; numpy's
    half-even rounding differs from the engines' round())."""

    def __init__(self, col: str, keys, order_by, p: int = 2,
                 horizons=(1,), label=None):
        super().__init__(label)
        if not 1 <= int(p) <= 8:
            raise ValueError(f"p {p} outside [1, 8]")
        hs = sorted({int(h) for h in horizons})
        if not hs or hs[0] < 1:
            raise ValueError(
                f"horizons {horizons!r}: need >= 1 integer horizons")
        self.col, self.p, self.horizons = col, int(p), hs
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        keys, ob, P = self.keys, self.order_by, self.p
        hs = self.horizons
        v = F.col(self.col).cast("double")
        base = pcoll.df.where(F.col(self.col).isNotNull())
        mu = base.groupBy(*keys).agg(F.avg(v).alias("__mu"))
        w = Window.partitionBy(*keys).orderBy(*ob)
        d = base.join(mu, on=keys)
        for lag in range(1, P + 1):
            d = d.withColumn(f"__l{lag}", F.lag(v, lag).over(w))
        # the last row (by order) carries the forecast's seed
        # deviations: its value is x_n and its lag columns are
        # x_{n-1}..x_{n-p+1}
        last = F.max_by(
            F.struct(v.alias("x0"),
                     *[F.col(f"__l{i}").alias(f"x{i}")
                       for i in range(1, P)]),
            F.struct(*[F.col(c) for c in ob]))
        aggs = [F.sum((v - F.col("__mu")) * (v - F.col("__mu")))
                .alias("__den"),
                F.count(F.lit(1)).alias("__n"),
                F.first("__mu").alias("__mu"),
                last.alias("__last")]
        for lag in range(1, P + 1):
            aggs.append(F.sum((v - F.col("__mu"))
                              * (F.col(f"__l{lag}") - F.col("__mu")))
                        .alias(f"__r{lag}"))
        g = (d.groupBy(*keys).agg(*aggs)
             .where((F.col("__den") != 0) & (F.col("__n") >= P + 1)))
        for lag in range(1, P + 1):
            g = g.withColumn(f"__r{lag}",
                             F.coalesce(f"__r{lag}", F.lit(0.0)))
        g = g.select(*keys, "__den", "__mu",
                     *[f"__r{lag}" for lag in range(1, P + 1)],
                     *[F.col(f"__last.x{i}").alias(f"__x{i}")
                       for i in range(P)])

        key_fields = [(k, pcoll.df.schema[k].dataType.simpleString())
                      for k in keys]
        out_schema = (", ".join(f"{k} {t}" for k, t in key_fields)
                      + ", h int, forecast double, "
                      + ", ".join(f"phi{i} double"
                                  for i in range(1, P + 1)))

        def gen(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                den = pdf["__den"].to_numpy(np.float64)
                r = np.stack([pdf[f"__r{k}"].to_numpy(np.float64) / den
                              for k in range(1, P + 1)])
                # Durbin-Levinson to order P (the Pacf recursion —
                # identical nesting so the oracle replays both)
                phi = np.zeros((P, n))
                phi[0] = r[0]
                var = 1.0 - r[0] * r[0]
                for k in range(2, P + 1):
                    num = r[k - 1].copy()
                    for j in range(1, k):
                        num = num - phi[j - 1] * r[k - 1 - j]
                    ok = var > 0
                    with np.errstate(divide="ignore",
                                     invalid="ignore"):
                        phik = np.where(ok,
                                        num / np.where(ok, var, 1.0),
                                        np.nan)
                    newphi = phi.copy()
                    for j in range(1, k):
                        newphi[j - 1] = phi[j - 1] - phik * phi[k - 1 - j]
                    newphi[k - 1] = phik
                    phi = newphi
                    var = var * (1.0 - phik * phik)
                mu_a = pdf["__mu"].to_numpy(np.float64)
                # deviation history, most recent first
                hist = [pdf[f"__x{i}"].to_numpy(np.float64) - mu_a
                        for i in range(P)]
                H = hs[-1]
                fc = np.full((H, n), np.nan)
                for j in range(H):
                    f = phi[0] * hist[0]
                    for i in range(1, P):
                        f = f + phi[i] * hist[i]
                    fc[j] = f
                    hist = [f] + hist[:-1]
                rows = {k: np.repeat(pdf[k].to_numpy(), len(hs))
                        for k, _ in key_fields}
                rows["h"] = np.tile(np.array(hs), n)
                sel = np.array([h - 1 for h in hs])
                rows["forecast"] = (mu_a[:, None]
                                    + fc[sel].T).reshape(-1)
                for i in range(1, P + 1):
                    rows[f"phi{i}"] = np.repeat(phi[i - 1], len(hs))
                out = pd.DataFrame(rows)
                for c in ("forecast",
                          *[f"phi{i}" for i in range(1, P + 1)]):
                    out[c] = out[c].where(~np.isnan(out[c]), None)
                yield out

        return pcoll.with_df(g.mapInPandas(gen, schema=out_schema))


class ForecastBacktest(PTransform):
    """Hold-out evaluation for per-key forecasts — the forecasting
    family's missing eval member (the quality module scores
    classifiers/rankers but nothing scored the Holt/Theta/AR outputs):
    the last ``holdout`` rows of each key are withheld, an AR(p)
    Yule-Walker fit (:class:`ArForecast`) runs on the train prefix,
    and each horizon's forecast is scored against the actual it
    predicts with

        abs_err  = |forecast - actual|
        scaled   = abs_err / mean(|x_t - x_{t-1}|)  over the train
                   prefix (the MASE denominator, Hyndman & Koehler
                   2006 — per-horizon MASE contributions; > 1 means
                   worse than the naive one-step carry-forward)

    Keys whose train prefix is shorter than p + 1 rows (or constant)
    are dropped by the underlying fit; a zero naive denominator
    (constant train series would already be dropped, but ties can
    zero it) yields NULL scaled error.

    Scale: the holdout split is one descending row_number window over
    the key partition (same shuffle ArForecast's lag pass needs), the
    naive denominator one extra keyed aggregation of the lag-1
    differences the fit already materializes. Output: one row per
    (key, h): keys + (h int, forecast, actual, abs_err, mase —
    round 6).
    """

    def __init__(self, col: str, keys, order_by, p: int = 2,
                 holdout: int = 3, label=None):
        super().__init__(label)
        if int(holdout) < 1:
            raise ValueError("holdout must be >= 1")
        self.col, self.p = col, int(p)
        self.holdout = int(holdout)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        keys, ob, H = self.keys, self.order_by, self.holdout
        v = F.col(self.col).cast("double")
        base = pcoll.df.where(F.col(self.col).isNotNull())
        wdesc = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in ob])
        split = base.withColumn("__rd", F.row_number().over(wdesc))
        train = split.where(F.col("__rd") > H).drop("__rd")
        test = (split.where(F.col("__rd") <= H)
                .select(*keys, (F.lit(H + 1) - F.col("__rd"))
                        .cast("int").alias("h"),
                        v.alias("actual")))
        fc = (pcoll.with_df(train)
              | ArForecast(self.col, keys=self.keys,
                           order_by=self.order_by, p=self.p,
                           horizons=tuple(range(1, H + 1)))).df
        wasc = Window.partitionBy(*keys).orderBy(*ob)
        naive = (train
                 .withColumn("__l1", F.lag(v, 1).over(wasc))
                 .groupBy(*keys)
                 .agg(F.avg(F.abs(v - F.col("__l1")))
                      .alias("__naive")))
        # errors score the ROUND-6 forecast (the value a consumer
        # actually reads — and the grid the oracle replays on)
        f6 = F.round("forecast", 6)
        out = (fc.join(test, on=[*keys, "h"])
               .join(naive, on=keys)
               .select(
                   *keys, "h",
                   f6.alias("forecast"),
                   F.round("actual", 6).alias("actual"),
                   F.round(F.abs(f6 - F.col("actual")), 6)
                   .alias("abs_err"),
                   F.round(F.when(
                       F.col("__naive") != 0,
                       F.abs(f6 - F.col("actual"))
                       / F.col("__naive")), 6).alias("mase")))
        return pcoll.with_df(out)


class RollingCorr(PTransform):
    """Rolling Pearson correlation of two columns over a fixed
    ``window`` of rows per key (current row + window-1 preceding) —
    co-movement drift between two signals (price/quantity,
    value/latency) as a per-row column.

    Computed EXPLICITLY from window moment sums,
    (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)),
    not the engine's corr() aggregate — native corr differs across
    engines in its zero-variance result (Spark NaN vs SQL NULL) and
    its incremental update order; the explicit form is
    expression-identical everywhere. Rows whose window is not yet
    full, whose window contains a NULL in either column (sum() would
    silently skip it and the fixed-n formula would miscount), or
    where either column has zero variance in the window, yield NULL.

    Scale: one window pass, five frame sums, pure JVM expressions.

    Output: input columns + ``corr_col`` (double, rounded 6).
    """

    def __init__(self, x_col: str, y_col: str, window: int, keys,
                 order_by, corr_col: str = "rolling_corr", label=None):
        super().__init__(label)
        if int(window) < 2:
            raise ValueError("window must be >= 2")
        self.x_col, self.y_col = x_col, y_col
        self.window = int(window)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.corr_col = corr_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        W = self.window
        x = F.col(self.x_col).cast("double")
        y = F.col(self.y_col).cast("double")
        w = (Window.partitionBy(*self.keys).orderBy(*self.order_by)
             .rowsBetween(-(W - 1), 0))
        n = F.count(F.lit(1)).over(w)
        # count of rows where BOTH are non-null: x+y is null if either
        n_pair = F.count(x + y).over(w)
        sx, sy = F.sum(x).over(w), F.sum(y).over(w)
        sxx = F.sum(x * x).over(w)
        syy = F.sum(y * y).over(w)
        sxy = F.sum(x * y).over(w)
        vx = W * sxx - sx * sx
        vy = W * syy - sy * sy
        corr = F.when(
            (n == W) & (n_pair == W) & (vx > 0) & (vy > 0),
            F.round((W * sxy - sx * sy) / F.sqrt(vx * vy), 6))
        out = pcoll.df.withColumn(self.corr_col, corr)
        return pcoll.with_df(out)


class ChangepointMeanShift(PTransform):
    """Mean-shift changepoint detection per key by BINARY SEGMENTATION
    (Scott & Knott 1974 lineage; the fixed-depth cousin of PELT) —
    level-change discovery for monitoring/series-segmentation: split
    a segment where the SSE reduction

        gain(s) = SSE(a, b) - (SSE(a, s) + SSE(s, b))

    is maximal (SSE from prefix sums: (C2 - C1^2/len)); accept when
    gain > ``penalty``; recurse ``levels`` times over every accepted
    segment. Fixed levels (not to-convergence) keep the procedure
    deterministic-replayable — the DuckDB oracle chains one
    (candidate, argmax, accept) CTE trio per level with the identical
    prefix sums and tie-break (max gain, then smallest split).

    NULL values are dropped before ordering. ``min_segment`` bounds
    both sides of any split.

    Scale: the moment work is one sort+cumsum per key inside an
    Arrow-batched applyInPandas; candidate gains per segment are
    vectorized numpy over the split range (no per-row Python), and
    segment count is <= 2^levels. The per-key sequential posture is
    the Ewma/HoltWinters one.

    Output: one row per detected changepoint — keys + (cp_pos bigint:
    0-based row index where the new segment STARTS, level int, gain
    double UNROUNDED — round downstream).
    """

    def __init__(self, col: str, keys, order_by, penalty: float,
                 levels: int = 3, min_segment: int = 5, label=None):
        super().__init__(label)
        if float(penalty) < 0:
            raise ValueError("penalty must be >= 0")
        if int(levels) < 1:
            raise ValueError("levels must be >= 1")
        if int(min_segment) < 1:
            raise ValueError("min_segment must be >= 1")
        self.col = col
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.penalty = float(penalty)
        self.levels = int(levels)
        self.min_segment = int(min_segment)

    def expand(self, pcoll: PCollection) -> PCollection:
        col, ob = self.col, self.order_by
        pen, L, ms = self.penalty, self.levels, self.min_segment
        keys = self.keys
        key_ddl = ", ".join(
            f"{k} {pcoll.df.schema[k].dataType.simpleString()}"
            for k in keys)
        schema = f"{key_ddl}, cp_pos bigint, level int, gain double"

        def fn(pdf):
            import numpy as np
            import pandas as pd

            pdf = pdf.sort_values(ob, kind="mergesort")
            x = pdf[col].astype(float).to_numpy()
            n = len(x)
            p1 = np.concatenate(([0.0], np.cumsum(x)))
            p2 = np.concatenate(([0.0], np.cumsum(x * x)))

            def sse(a, b):
                if b <= a:
                    return 0.0
                c1 = p1[b] - p1[a]
                return (p2[b] - p2[a]) - c1 * c1 / (b - a)

            segs = [(0, n)]
            out = []
            for level in range(1, L + 1):
                nxt = []
                for a, b in segs:
                    lo, hi = a + ms, b - ms
                    if hi < lo:
                        nxt.append((a, b))
                        continue
                    s = np.arange(lo, hi + 1)
                    c1l = p1[s] - p1[a]
                    c1r = p1[b] - p1[s]
                    ssl = (p2[s] - p2[a]) - c1l * c1l / (s - a)
                    ssr = (p2[b] - p2[s]) - c1r * c1r / (b - s)
                    gains = sse(a, b) - (ssl + ssr)
                    i = int(np.argmax(gains))   # first max: ties -> smallest s
                    if gains[i] > pen:
                        sp = int(s[i])
                        out.append((sp, level, float(gains[i])))
                        nxt.extend([(a, sp), (sp, b)])
                    else:
                        nxt.append((a, b))
                segs = nxt
            kv = {k: pdf[k].iloc[0] for k in keys}
            return pd.DataFrame(
                [{**kv, "cp_pos": sp, "level": lv, "gain": g}
                 for sp, lv, g in out],
                columns=[*keys, "cp_pos", "level", "gain"])

        base = pcoll.df.where(F.col(col).isNotNull())
        out = base.groupBy(*keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class BootstrapCI(PTransform):
    """Percentile bootstrap confidence interval for a mean via the
    POISSON bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012) — the only bootstrap that
    works on distributed data: resample b gives each row weight
    w ~ Poisson(1) instead of drawing n-with-replacement (which
    needs global coordination), and the weight is a pure function of
    ``md5(id:b)``, so the resampling is deterministic across
    engines, retries, and partitionings (the HashSample posture).

    The inverse-CDF thresholds are INTEGER constants on a 1e6 grid
    (floor of the Poisson(1) CDF — part of the algorithm definition,
    so the draw is integer-exact, no float compare): weights 0..9.

    Per resample: mean_b = exact decimal sum of w*x over the rows
    (scale-6-quantized before the double cast — the boosted-stumps
    2^53 guard) / integer weight total. CI = exact order statistics
    of the B means: lo = m_(floor(alpha/2*B)+1), hi =
    m_(ceil((1-alpha/2)*B)), ties broken by resample index.

    Scale: the explode is B rows per input row into a MAP-SIDE
    partial aggregate — the shuffled state is (keys x B) cells, not
    B copies of the data; keep B in the hundreds.

    Output per key: (keys..., mean round 9, ci_lo round 9,
    ci_hi round 9, n, b_resamples) — mean is the full-sample mean.
    """

    # floor(1e6 * CDF_Poisson(1)(k)) for k = 0..8; u >= t8 -> w = 9
    _THRESH = (367879, 735758, 919698, 981011, 996340,
               999405, 999916, 999989, 999998)

    def __init__(self, col: str, id_col: str, b: int = 200,
                 alpha: float = 0.05, keys=(), label=None):
        super().__init__(label)
        self.col, self.id_col = col, id_col
        self.b = int(b)
        if not 10 <= self.b <= 10_000:
            raise ValueError(f"b {b} outside [10, 10000]")
        self.alpha = float(alpha)
        if not 0.0 < self.alpha < 1.0:
            raise ValueError(f"alpha {alpha} outside (0, 1)")
        self.keys = [keys] if isinstance(keys, str) else list(keys)

    def expand(self, pcoll):
        import math

        from pyspark.sql import Window

        c, idc, ks, B = self.col, self.id_col, self.keys, self.b
        lo_rank = int(math.floor(self.alpha / 2 * B)) + 1
        hi_rank = int(math.ceil((1 - self.alpha / 2) * B))
        base = pcoll.df.where(F.col(c).isNotNull()).select(
            *ks, F.col(idc).alias("__id"),
            F.col(c).cast("double").try_cast("decimal(16,9)")
            .alias("__xd"))
        u = F.expr(
            "CAST(conv(substring(md5(CAST(__id AS STRING) || ':' || "
            "CAST(__b AS STRING)), 1, 8), 16, 10) AS BIGINT) "
            "% 1000000")
        w = F.lit(9)
        for k in range(len(self._THRESH) - 1, -1, -1):
            w = F.when(F.col("__u") < self._THRESH[k], F.lit(k)) \
                 .otherwise(w)
        rs = (base
              .select(*ks, "__id", "__xd",
                      F.explode(F.sequence(
                          F.lit(0), F.lit(B - 1))).alias("__b"))
              .withColumn("__u", u)
              .withColumn("__w", w)
              .groupBy(*ks, "__b")
              .agg(F.sum(F.col("__xd") * F.col("__w")).alias("__s"),
                   F.sum("__w").cast("long").alias("__n")))
        mean_b = (F.col("__s").cast("decimal(28,6)").cast("double")
                  / F.col("__n").cast("double"))
        wr = Window.partitionBy(*ks).orderBy(
            F.col("__m"), F.col("__b"))
        ranked = (rs.where(F.col("__n") > 0)
                  .withColumn("__m", mean_b)
                  .withColumn("__r", F.row_number().over(wr)))
        ci = (ranked.groupBy(*ks)
              .agg(F.max(F.when(F.col("__r") == lo_rank,
                                F.col("__m"))).alias("__lo"),
                   F.max(F.when(F.col("__r") == hi_rank,
                                F.col("__m"))).alias("__hi")))
        full = (base.groupBy(*ks)
                .agg((F.sum("__xd").cast("decimal(28,6)")
                      .cast("double")
                      / F.count(F.lit(1)).cast("double"))
                     .alias("__mean"),
                     F.count(F.lit(1)).cast("long").alias("n"),
                     F.count("__xd").cast("long").alias("__nx")))
        # fail-loud overflow guard (the GBM/LogisticFit posture): a
        # value with |x| >= 1e7 try_casts to NULL __xd, which would
        # silently drop out of the sums while still inflating the
        # weight/count denominators — bias, not an error. Compare
        # count(__xd) to count(1) per key inside the plan; both the
        # resample and full paths read the same base, so one guard
        # covers both. assert_true returns NULL on success.
        guard = F.assert_true(
            F.col("__nx") == F.col("n"),
            F.lit("BootstrapCI: value overflowed decimal(16,9) — "
                  "scale it down (|x| must stay well under 1e7)"))
        out = ((full.join(ci, ks) if ks else full.crossJoin(ci))
               .select(*ks,
                       F.when(guard.isNull(),
                              F.round("__mean", 9)).alias("mean"),
                       F.round("__lo", 9).alias("ci_lo"),
                       F.round("__hi", 9).alias("ci_hi"),
                       "n", F.lit(B).alias("b_resamples")))
        return pcoll.with_df(out)


class ChangepointBinSeg(PTransform):
    """Mean-shift changepoint detection by binary segmentation
    (Scott & Knott 1974; the CUSUM-location complement — CUSUM says
    WHETHER a key drifted, this says WHERE): per key, repeatedly
    split the series at the position maximizing the SSE reduction

        gain(p) = SL^2/nL + SR^2/nR - S^2/n      (the sum-of-squares
                  identity — the quadratic terms cancel, so only
                  segment SUMS and COUNTS are needed)

    one changepoint per key per round, up to ``k`` rounds; a key
    stops when no candidate has gain > 0 (or min_size forbids all
    splits). Segments are labeled by their START position, so ids
    stay stable across rounds.

    Spark design: each round is ONE pass — per-(key, segment)
    cumulative decimal sums via window, gains as fixed-order doubles,
    per-key argmax on (round-6 gain DESC, position ASC), then a
    key-keyed join updates segment labels; the frame checkpoints per
    round (the PageRank posture), so cost is k scans regardless of
    key count. Gains quantize prefix sums to decimal scale 6 before
    the double cast (the GBM convention — keeps decimal->double
    single-rounded in both engines at any segment size). NULL values
    are excluded BEFORE positions are assigned.

    Output: (keys..., cp_round, position, gain) — position is the
    1-based in-key row number (over ``order_by``, NULLs dropped)
    of the LAST row of the left segment; gain round 6.
    """

    def __init__(self, col: str, keys, order_by, k: int = 3,
                 min_size: int = 2, label=None):
        super().__init__(label)
        self.col = col
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.k = int(k)
        if self.k < 1:
            raise ValueError("k must be >= 1")
        self.min_size = int(min_size)
        if self.min_size < 1:
            raise ValueError("min_size must be >= 1")

    def expand(self, pcoll):
        from pyspark.sql import Window

        ks, ms = self.keys, self.min_size
        w_rn = Window.partitionBy(*ks).orderBy(
            *[F.col(c) for c in self.order_by])
        rows = (pcoll.df.where(F.col(self.col).isNotNull())
                .select(*ks,
                        F.col(self.col).cast("double")
                        .try_cast("decimal(16,9)").alias("__xd"),
                        F.row_number().over(w_rn).alias("__rn"))
                .withColumn("__seg", F.lit(0).cast("long")))
        bad = rows.where(F.col("__xd").isNull()).limit(1).count()
        if bad:
            raise ValueError(
                "ChangepointBinSeg: value overflowed decimal(16,9) — "
                "scale it down (|x| must stay well under 1e7)")
        # non-eager: round 1's convergence count is the sole first
        # consumer and materializes the base rows in the same job
        rows = rows.localCheckpoint(eager=False)

        def d6(c):
            return c.cast("decimal(28,6)").cast("double")

        spark = pcoll.df.sparkSession
        cps = None
        for rnd in range(1, self.k + 1):
            w_seg = (Window.partitionBy(*ks, "__seg").orderBy("__rn")
                     .rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow))
            w_tot = Window.partitionBy(*ks, "__seg")
            cand = rows.select(
                *ks, "__rn", "__seg",
                F.sum("__xd").over(w_seg).alias("__cs"),
                F.count(F.lit(1)).over(w_seg).alias("__cn"),
                F.sum("__xd").over(w_tot).alias("__ts"),
                F.count(F.lit(1)).over(w_tot).alias("__tn"))
            sl, st = d6(F.col("__cs")), d6(F.col("__ts"))
            sr = d6(F.col("__ts") - F.col("__cs"))
            nl = F.col("__cn").cast("double")
            nr = (F.col("__tn") - F.col("__cn")).cast("double")
            nt = F.col("__tn").cast("double")
            gain = sl * sl / nl + sr * sr / nr - st * st / nt
            cand = (cand.where((F.col("__cn") >= ms)
                               & (F.col("__tn") - F.col("__cn") >= ms))
                    .withColumn("__g", F.round(gain, 6))
                    .where(F.col("__g") > 0.0))
            w_best = Window.partitionBy(*ks).orderBy(
                F.col("__g").desc(), F.col("__rn"))
            # ONE driver job per round (guide §1.2): best is a
            # non-eager checkpoint materialized by the full count
            # below (a full count, not limit(1) — a limit can stop
            # consuming a partition mid-cache; best is key-bounded,
            # so the count is as cheap), and the PREVIOUS round's
            # relabeled rows checkpoint rides the same job (best's
            # plan consumes rows exactly once, through cand). The
            # final round's rows update is then never materialized
            # at all — nothing downstream reads it.
            best = (cand.withColumn("__b", F.row_number().over(w_best))
                    .where("__b = 1")
                    .select(*ks,
                            F.col("__rn").cast("long").alias("position"),
                            F.col("__seg").alias("__bs"),
                            F.col("__g").alias("gain"))
                    .localCheckpoint(eager=False))
            found = (best.select(*ks, F.lit(rnd).alias("cp_round"),
                                 "position", "gain"))
            cps = found if cps is None else cps.unionByName(found)
            if best.count() == 0:
                break
            upd = best.select(
                *ks, F.col("position").alias("__p"),
                F.col("__bs").alias("__us"))
            rows = (rows.join(upd, ks, "left")
                    .withColumn(
                        "__seg",
                        F.when(F.col("__us").isNotNull()
                               & (F.col("__seg") == F.col("__us"))
                               & (F.col("__rn") > F.col("__p")),
                               F.col("__p"))
                        .otherwise(F.col("__seg")))
                    .drop("__p", "__us")
                    .localCheckpoint(eager=False))
        out = cps.select(*ks, "cp_round", "position", "gain")
        return pcoll.with_df(out)


class KalmanLocalLevel(PTransform):
    """Per-key local-level Kalman filter in event order (the
    random-walk-plus-noise state-space model — Ewma's principled
    cousin where the smoothing gain ADAPTS from the variance
    recursion instead of being a fixed alpha):

        Pp_i = P_{i-1} + q                    (predict)
        K_i  = Pp_i / (Pp_i + r)              (gain)
        m_i  = m_{i-1} + K_i * (x_i - m_{i-1})
        P_i  = (1 - K_i) * Pp_i

    ``q`` is the process (level-drift) variance, ``r`` the
    observation variance — dyadic values keep the replay bit-stable.
    Seeding follows the Ewma posture: outputs stay NULL until the
    first non-NULL value, which seeds m = x, P = r; NULL inputs are
    missing observations — the state predicts through them
    (P += q, m unchanged, gain NULL), the textbook treatment.

    Like Ewma/Holt, the recurrence has no shuffle-free Spark-SQL
    form, so it runs inside an Arrow-batched ``applyInPandas`` per
    key with a ``frompyfunc.accumulate`` C loop; the DuckDB oracle
    replays the IDENTICAL IEEE sequence via a recursive CTE, so
    outputs compare UNROUNDED. One key shuffle; per-key state O(1).

    Output: input columns + (level, pvar, kgain) doubles — kgain
    NULL on seed/missing rows.
    """

    def __init__(self, col: str, keys, order_by, q: float = 0.25,
                 r: float = 1.0, level_col: str = "level",
                 var_col: str = "pvar", gain_col: str = "kgain",
                 label=None):
        super().__init__(label)
        self.col = col
        self.q, self.r = float(q), float(r)
        if self.q < 0 or self.r <= 0:
            raise ValueError("need q >= 0 and r > 0")
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.level_col, self.var_col = level_col, var_col
        self.gain_col = gain_col

    def expand(self, pcoll):
        import numpy as np

        col, q_, r_ = self.col, self.q, self.r
        ob = self.order_by
        lc, vc, gc = self.level_col, self.var_col, self.gain_col
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in pcoll.df.schema.fields
        ) + f", {lc} double, {vc} double, {gc} double"

        def fn(pdf):
            pdf = pdf.sort_values(ob, kind="mergesort")
            x = pdf[col].to_numpy(dtype=object)

            def step(acc, v):
                # accumulate's first output is the RAW first element:
                # normalize a scalar seed (or NULL) into state form
                if not isinstance(acc, tuple):
                    acc = (None if acc is None or acc != acc
                           else (float(acc), r_, None))
                if acc is None:
                    if v is None or v != v:
                        return None               # still unseeded
                    return (float(v), r_, None)   # seed
                m, p, _ = acc
                if v is None or v != v:
                    return (m, p + q_, None)      # predict through
                pp = p + q_
                k = pp / (pp + r_)
                return (m + k * (float(v) - m), (1.0 - k) * pp, k)

            y = np.frompyfunc(step, 2, 1).accumulate(x, dtype=object)

            def unpack(v):
                if isinstance(v, tuple):
                    return v
                return ((None, None, None) if v is None or v != v
                        else (float(v), r_, None))

            trips = [unpack(v) for v in y]
            pdf[lc] = [t[0] for t in trips]
            pdf[vc] = [t[1] for t in trips]
            pdf[gc] = [t[2] for t in trips]
            return pdf

        out = pcoll.df.groupBy(*self.keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class ThetaForecast(PTransform):
    """Per-key Theta-method h-step forecast (Assimakopoulos &
    Nikolopoulos 2000 — the M3-competition winner and the standard
    strong-baseline next to Holt): decompose the series into the
    theta=0 line (the OLS linear trend) and the theta=2 line
    (2*x_t - trend_t, doubled curvature), extrapolate the first
    linearly and the second by simple exponential smoothing (flat at
    its final level), and average them:

        ŷ_{n+h} = 0.5 * (a + b*(n+h)) + 0.5 * l_n

    where (a, b) is the least-squares line over (t, x_t), t = 1..n in
    event order, and l is SES over z_t = 2*x_t - (a + b*t) seeded
    l_1 = z_1.

    Deterministic and engine-replayable BY CONSTRUCTION: the OLS
    moment sums accumulate LEFT-TO-RIGHT inside the per-key pass
    (not via a distributed agg whose partial order floats), so a
    recursive-CTE oracle chains the identical IEEE sequence — sums,
    slope/intercept, SES recurrence, forecast — and compares
    UNROUNDED. ``alpha`` defaults to the binary-exact 0.5.

    Keys with fewer than 2 rows are dropped (no line to fit); NULL
    inputs are rejected (ValueError) — filter or gap-fill upstream.

    ``damping`` (phi in (0, 1]) enables the DRIFT-DAMPED variant
    (the "optimized theta" family, Fiorucci et al. 2016): the linear
    term extrapolates by the damped step sum S_h = phi*(1-phi^h)/
    (1-phi) instead of h, so long-horizon forecasts flatten toward
    ic + b*(n + phi/(1-phi)) rather than growing without bound:

        ŷ_{n+h} = 0.5 * (a + b*(n + S_h)) + 0.5 * l_n

    phi = 1 (the default) recovers the classic theta method exactly
    (S_h = h). With a binary-exact phi (0.5, 0.75) S_h is a dyadic
    closed form, so the damped forecast still compares UNROUNDED
    against a SQL replay.

    Scale: the same per-key applyInPandas posture as Ewma/Holt —
    linear per key, one shuffle on the grouping keys; the recurrence
    is inherently sequential per key but keys process in parallel.

    Output: one row per (key, h): keys + (h int, slope, intercept,
    level, forecast — raw doubles).
    """

    def __init__(self, col: str, keys, order_by, alpha: float = 0.5,
                 horizons=(1,), damping: float = 1.0, label=None):
        super().__init__(label)
        if not 0.0 < float(alpha) <= 1.0:
            raise ValueError(f"alpha {alpha} outside (0, 1]")
        if not 0.0 < float(damping) <= 1.0:
            raise ValueError(f"damping {damping} outside (0, 1]")
        hs = sorted({int(h) for h in horizons})
        if not hs or hs[0] < 1:
            raise ValueError(
                f"horizons {horizons!r}: need >= 1 integer horizons")
        self.col, self.alpha, self.horizons = col, float(alpha), hs
        self.damping = float(damping)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        col, al, hs, ob = self.col, self.alpha, self.horizons, self.order_by
        phi = self.damping
        kf = [f for f in pcoll.df.schema.fields if f.name in self.keys]
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in kf) \
            + (", h int, slope double, intercept double, "
               "level double, forecast double")

        def fn(pdf):
            import pandas as pd

            pdf = pdf.sort_values(ob, kind="mergesort")
            if pdf[col].isna().any():
                raise ValueError(
                    "ThetaForecast: NULL input values — filter or "
                    "gap-fill upstream")
            x = pdf[col].astype(float).to_list()
            n = len(x)
            head = pdf.iloc[:1]
            if n < 2:
                return pd.DataFrame(
                    {**{f.name: [] for f in kf}, "h": [],
                     "slope": [], "intercept": [], "level": [],
                     "forecast": []})
            st = sy = stt = sty = 0.0
            for t in range(1, n + 1):
                tf = float(t)
                st += tf
                sy += x[t - 1]
                stt += tf * tf
                sty += tf * x[t - 1]
            nn = float(n)
            b = (nn * sty - st * sy) / (nn * stt - st * st)
            ic = (sy - b * st) / nn
            lv = 2.0 * x[0] - (ic + b * 1.0)
            for t in range(2, n + 1):
                z = 2.0 * x[t - 1] - (ic + b * float(t))
                lv = al * z + (1.0 - al) * lv
            rows = []
            for h in hs:
                if phi == 1.0:
                    step = float(h)
                else:
                    step = phi * (1.0 - phi ** h) / (1.0 - phi)
                fc = 0.5 * (ic + b * (nn + step)) + 0.5 * lv
                rows.append({**{f.name: head.iloc[0][f.name]
                                for f in kf},
                             "h": h, "slope": b, "intercept": ic,
                             "level": lv, "forecast": fc})
            return pd.DataFrame(rows)

        out = pcoll.df.groupBy(*self.keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class CrostonForecast(PTransform):
    """Per-key Croston's method (Croston 1972) for INTERMITTENT
    series — sparse demand among many zero periods, where SES/Holt on
    the raw series decays toward zero between demands. Two coupled
    SES recurrences over the DEMAND events only:

        z_t = alpha * d_t + (1-alpha) * z     (nonzero demand size)
        p_t = alpha * q_t + (1-alpha) * p     (inter-demand interval)

    seeded z = first demand, p = the first demand's 1-based position;
    forecast = z / p (demand rate per period) and the Syntetos-Boylan
    approximation sba = (1 - alpha/2) * (z / p), the bias-corrected
    variant that won the follow-up literature.

    A period's demand is ``col`` where ``demand_if`` holds, else 0
    (e.g. purchase events among views) — the zero periods advance the
    interval counter only. Keys with no demand are dropped; keys with
    one demand emit the seeds. ``alpha`` defaults to the binary-exact
    0.5, so a recursive-CTE oracle replays the recurrences bit-exactly
    (compared UNROUNDED, the Ewma/Holt convention).

    Scale: the Ewma per-key applyInPandas posture — one shuffle on the
    keys, linear per key, keys parallel.

    Output: keys + (demands bigint, z, p, forecast, sba — raw
    doubles).
    """

    def __init__(self, col: str, keys, order_by, demand_if=None,
                 alpha: float = 0.5, label=None):
        super().__init__(label)
        if not 0.0 < float(alpha) <= 1.0:
            raise ValueError(f"alpha {alpha} outside (0, 1]")
        self.col, self.alpha = col, float(alpha)
        self.demand_if = demand_if
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        col, al, ob = self.col, self.alpha, self.order_by
        kf = [f for f in pcoll.df.schema.fields if f.name in self.keys]
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in kf) \
            + (", demands bigint, z double, p double, "
               "forecast double, sba double")
        df = pcoll.df
        if self.demand_if is not None:
            cond = (F.expr(self.demand_if)
                    if isinstance(self.demand_if, str) else self.demand_if)
            df = df.withColumn(
                "__d", F.when(cond, F.col(col).cast("double"))
                .otherwise(F.lit(0.0)))
        else:
            df = df.withColumn("__d", F.col(col).cast("double"))

        def fn(pdf):
            import pandas as pd

            pdf = pdf.sort_values(ob, kind="mergesort")
            d = pdf["__d"].fillna(0.0).astype(float).to_list()
            z = p = None
            last_idx = 0
            n_dem = 0
            for i, v in enumerate(d, 1):
                if v == 0.0:
                    continue
                n_dem += 1
                if z is None:
                    z, p = v, float(i)
                else:
                    z = al * v + (1.0 - al) * z
                    p = al * float(i - last_idx) + (1.0 - al) * p
                last_idx = i
            if z is None:
                return pd.DataFrame(
                    {**{f.name: [] for f in kf}, "demands": [],
                     "z": [], "p": [], "forecast": [], "sba": []})
            rate = z / p
            head = pdf.iloc[0]
            return pd.DataFrame([{
                **{f.name: head[f.name] for f in kf},
                "demands": n_dem, "z": z, "p": p, "forecast": rate,
                "sba": (1.0 - al / 2.0) * rate}])

        out = df.groupBy(*self.keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class TsbForecast(PTransform):
    """Per-key TSB (Teunter-Syntetos-Babai 2011) intermittent-demand
    forecast — the Croston successor that updates the demand
    PROBABILITY every period (so the forecast decays during long
    zero runs and handles obsolescence, Croston's blind spot):

        p_t = beta * 1{d_t > 0} + (1-beta) * p      (every period)
        z_t = alpha * d_t + (1-alpha) * z           (demand periods)
        forecast = p * z

    seeded p = first period's indicator, z = first nonzero demand.
    Keys with no demand are dropped. ``alpha``/``beta`` default to
    the binary-exact 0.5 / 0.25, so the recursive-CTE oracle replays
    every period's update bit-exactly (compared UNROUNDED).

    Same demand convention and scale posture as
    :class:`CrostonForecast` (``demand_if`` + Ewma-style per-key
    applyInPandas).

    Output: keys + (periods bigint, demands bigint, z, p, forecast —
    raw doubles).
    """

    def __init__(self, col: str, keys, order_by, demand_if=None,
                 alpha: float = 0.5, beta: float = 0.25, label=None):
        super().__init__(label)
        if not 0.0 < float(alpha) <= 1.0:
            raise ValueError(f"alpha {alpha} outside (0, 1]")
        if not 0.0 < float(beta) <= 1.0:
            raise ValueError(f"beta {beta} outside (0, 1]")
        self.col = col
        self.alpha, self.beta = float(alpha), float(beta)
        self.demand_if = demand_if
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        col, al, be, ob = self.col, self.alpha, self.beta, self.order_by
        kf = [f for f in pcoll.df.schema.fields if f.name in self.keys]
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in kf) \
            + (", periods bigint, demands bigint, z double, p double, "
               "forecast double")
        df = pcoll.df
        if self.demand_if is not None:
            cond = (F.expr(self.demand_if)
                    if isinstance(self.demand_if, str) else self.demand_if)
            df = df.withColumn(
                "__d", F.when(cond, F.col(col).cast("double"))
                .otherwise(F.lit(0.0)))
        else:
            df = df.withColumn("__d", F.col(col).cast("double"))

        def fn(pdf):
            import pandas as pd

            pdf = pdf.sort_values(ob, kind="mergesort")
            d = pdf["__d"].fillna(0.0).astype(float).to_list()
            z = p = None
            n_dem = 0
            for v in d:
                ind = 1.0 if v != 0.0 else 0.0
                p = ind if p is None else be * ind + (1.0 - be) * p
                if v != 0.0:
                    n_dem += 1
                    z = v if z is None else al * v + (1.0 - al) * z
            if z is None:
                return pd.DataFrame(
                    {**{f.name: [] for f in kf}, "periods": [],
                     "demands": [], "z": [], "p": [], "forecast": []})
            head = pdf.iloc[0]
            return pd.DataFrame([{
                **{f.name: head[f.name] for f in kf},
                "periods": len(d), "demands": n_dem,
                "z": z, "p": p, "forecast": p * z}])

        out = df.groupBy(*self.keys).applyInPandas(fn, schema)
        return pcoll.with_df(out)


class ForecastEval(PTransform):
    """Per-key forecast-accuracy report — the backtest companion to
    the HoltWinters/Theta/Croston emitters: rows carry an actual and
    a forecast for the same period (shift upstream if the forecast
    column is one-step-ahead), and the output is one row per key:

        n     scored rows (both columns non-NULL)
        mae   mean |err|            rmse  sqrt(mean err^2)
        mape  mean |err/actual| over actual != 0 rows
        bias  mean err (signed — systematic over/under-forecast)
        mase  mae / naive_mae, naive_mae = mean |actual_t -
              actual_{t-1}| over the key's ordered actual series
              (Hyndman & Koehler 2006 — scale-free, the M-competition
              standard; NULL when the naive denominator is 0)

    All ratios rounded 6 (per-key averages accumulate in engine-
    specific order; the quantities are O(1e2-1e6) so 6 dp absorbs
    the 1e-13 noise).

    Scale: one lag window + one aggregation per key — a single
    shuffle on the grouping keys, all JVM expressions.
    """

    def __init__(self, actual_col: str, forecast_col: str, keys,
                 order_by, label=None):
        super().__init__(label)
        self.actual_col, self.forecast_col = actual_col, forecast_col
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        a = F.col(self.actual_col).cast("double")
        f = F.col(self.forecast_col).cast("double")
        w = Window.partitionBy(*self.keys).orderBy(*self.order_by)
        err = F.when(a.isNotNull() & f.isNotNull(), a - f)
        d = (pcoll.df
             .withColumn("__e", err)
             .withColumn("__ne", a - F.lag(a).over(w)))
        out = (d.groupBy(*self.keys)
               .agg(F.count("__e").alias("n"),
                    F.avg(F.abs(F.col("__e"))).alias("__mae"),
                    F.sqrt(F.avg(F.col("__e") * F.col("__e")))
                    .alias("__rmse"),
                    F.avg(F.when(a != 0.0,
                                 F.abs(F.col("__e") / a)))
                    .alias("__mape"),
                    F.avg(F.col("__e")).alias("__bias"),
                    F.avg(F.abs(F.col("__ne"))).alias("__nmae"))
               .select(*self.keys, "n",
                       F.round("__mae", 6).alias("mae"),
                       F.round("__rmse", 6).alias("rmse"),
                       F.round("__mape", 6).alias("mape"),
                       F.round("__bias", 6).alias("bias"),
                       F.round(F.when(F.col("__nmae") != 0.0,
                                      F.col("__mae") / F.col("__nmae")),
                               6).alias("mase")))
        return pcoll.with_df(out)


class KaplanMeier(PTransform):
    """Kaplan-Meier survival estimator with right censoring — the
    retention/churn curve ("what fraction survives past t") computed
    from (duration, event) pairs where event=1 is an observed event
    (churn, conversion) and event=0 a censored subject (still active
    at last observation):

        S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

    d_i = events at t_i, n_i = subjects at risk just before t_i
    (N minus everything that left earlier; ties leave AFTER t_i per
    the standard convention — censored-at-t_i subjects still count at
    risk for t_i's factor).

    Determinism: d_i / n_i are exact integer ratios; the cumulative
    product runs as exp of a TIME-ORDERED cumulative sum of round-12
    decimal ln factors — decimal addition is exact, so both engines
    exponentiate the identical double; survival rounds 6.

    Scale: one groupBy(duration) count + ordered windows over the
    DISTINCT-DURATION frame (cardinality-bounded, the AUC-cumsum
    posture — quantize durations upstream if they are continuous).

    Output: one row per distinct EVENT time — (t, n_risk, d_events,
    c_censored, survival), ascending t.
    """

    def __init__(self, duration_col: str, event_col: str, label=None):
        super().__init__(label)
        self.duration_col, self.event_col = duration_col, event_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        dc, ec = self.duration_col, self.event_col
        base = pcoll.df.where(
            F.col(dc).isNotNull() & F.col(ec).isNotNull()).select(
            F.col(dc).cast("double").alias("t"),
            F.col(ec).cast("int").alias("__e"))
        per = base.groupBy("t").agg(
            F.sum("__e").cast("long").alias("d_events"),
            F.sum(1 - F.col("__e")).cast("long").alias("c_censored"))
        w_all = Window.partitionBy()
        w_prev = (Window.orderBy("t")
                  .rowsBetween(Window.unboundedPreceding, -1))
        at_risk = (per
                   .withColumn("__N", F.sum(F.col("d_events")
                                            + F.col("c_censored"))
                               .over(w_all))
                   .withColumn("__left", F.coalesce(
                       F.sum(F.col("d_events") + F.col("c_censored"))
                       .over(w_prev), F.lit(0)))
                   .withColumn("n_risk",
                               (F.col("__N") - F.col("__left"))
                               .cast("long")))
        lnf = F.log(F.lit(1.0)
                    - F.col("d_events").cast("double")
                    / F.col("n_risk").cast("double"))
        w_cum = (Window.orderBy("t")
                 .rowsBetween(Window.unboundedPreceding, 0))
        # a time where EVERYONE at risk dies has factor 0 (ln = -inf,
        # which a decimal cast would swallow): track it as a
        # cumulative flag and pin survival to exactly 0 from there on
        out = (at_risk
               .withColumn("__lnS",
                           F.sum(F.when((F.col("d_events") > 0)
                                        & (F.col("d_events")
                                           < F.col("n_risk")),
                                        lnf.cast("decimal(28,12)"))
                                 .otherwise(F.lit(0)
                                            .cast("decimal(28,12)")))
                           .over(w_cum))
               .withColumn("__dead",
                           F.max(F.when(F.col("d_events")
                                        == F.col("n_risk"), 1)
                                 .otherwise(0)).over(w_cum))
               .where(F.col("d_events") > 0)
               .select("t", "n_risk", "d_events", "c_censored",
                       F.when(F.col("__dead") == 1, F.lit(0.0))
                       .otherwise(F.round(
                           F.exp(F.col("__lnS").cast("double")), 6))
                       .alias("survival")))
        return pcoll.with_df(out)


class KmvOverlap(PTransform):
    """Set-overlap estimation between two frames via K-minimum-values
    sketches (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07) —
    the scale answer to "how much do these two corpora overlap?"
    (train/eval contamination, source dedup) when the exact distinct
    intersection would shuffle both full sets: each side keeps only
    its k smallest 60-bit hashes.

      est(|S|)  = (k - 1) / h_(k)            (h in (0,1); exact |S|
                                              when fewer than k)
      est(|A∩B|) = (|both among union's k smallest| / k) * est(|A∪B|)

    Engine-portable determinism: the hash is the first 60 bits of
    md5(CAST(value AS STRING)) — bit-identical in any engine (the
    SimHash md5 convention), so every output is a pure function of
    the value set: k-th minima are exact integers, estimates are one
    or two double divisions in fixed order. No RNG, no sampling
    nondeterminism — fully value-oracle-able. Caveat: for FLOAT
    columns the CAST-to-string rendering is engine-specific, so
    cross-engine oracles should stick to integer/string/date keys
    (within Spark the sketch is deterministic for any type).

    Scale: per side, one DISTINCT on the hash (the only shuffle) and
    a TakeOrderedAndProject (orderBy h LIMIT k — top-k merge, never a
    global sort); the union sketch reuses the two distinct frames.
    Driver holds three 1-row aggregates.

    Output (ONE row): k, ku_a/ku_b/ku_u (k_used per sketch),
    est_a, est_b, est_union, est_intersection, jaccard_est —
    intersection/jaccard clamp at >= 0; all exact when both sides
    fit inside k.
    """

    def __init__(self, other, col: str, other_col: str | None = None,
                 k: int = 256, label=None):
        super().__init__(label)
        from beam_spark.pcollection import PCollection as _PC

        self.other = other.df if isinstance(other, _PC) else other
        self.col, self.other_col = col, other_col or col
        if int(k) < 2:
            raise ValueError(f"k {k}: need >= 2")
        self.k = int(k)

    @staticmethod
    def _hashes(df, col):
        return (df.where(F.col(col).isNotNull())
                .select(F.expr(
                    f"CAST(conv(substring(md5(CAST({col} AS STRING)), "
                    "1, 15), 16, 10) AS BIGINT)").alias("h"))
                .distinct())

    def expand(self, pcoll: PCollection) -> PCollection:
        k = self.k
        scale = float(1 << 60)
        ha = self._hashes(pcoll.df, self.col)
        hb = self._hashes(self.other, self.other_col)

        def est(ku, hk):
            return (F.when(ku < k, ku.cast("double"))
                    .otherwise((ku - 1).cast("double")
                               / (hk.cast("double") / scale)))

        def sk(dfh, tag):
            top = dfh.orderBy("h").limit(k)
            return top.agg(
                F.count(F.lit(1)).alias(f"ku_{tag}"),
                F.max("h").alias(f"hk_{tag}"))

        u = (ha.withColumn("ia", F.lit(1)).withColumn("ib", F.lit(0))
             .unionByName(hb.withColumn("ia", F.lit(0))
                          .withColumn("ib", F.lit(1)))
             .groupBy("h")
             .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib")))
        tu = (u.orderBy("h").limit(k)
              .agg(F.count(F.lit(1)).alias("ku_u"),
                   F.max("h").alias("hk_u"),
                   F.sum(F.when((F.col("ia") == 1) & (F.col("ib") == 1),
                                1).otherwise(0)).alias("nb")))
        row = (sk(ha, "a").crossJoin(sk(hb, "b")).crossJoin(tu))
        ea = est(F.col("ku_a"), F.col("hk_a"))
        eb = est(F.col("ku_b"), F.col("hk_b"))
        eu = est(F.col("ku_u"), F.col("hk_u"))
        ei = (F.when(F.col("ku_u") < k, F.col("nb").cast("double"))
              .otherwise(F.col("nb").cast("double")
                         / F.col("ku_u").cast("double") * eu))
        out = row.select(
            F.lit(k).alias("k"), "ku_a", "ku_b", "ku_u",
            F.round(ea, 6).alias("est_a"),
            F.round(eb, 6).alias("est_b"),
            F.round(eu, 6).alias("est_union"),
            F.round(ei, 6).alias("est_intersection"),
            F.round(F.when(eu > 0, ei / eu).otherwise(F.lit(0.0)), 6)
            .alias("jaccard_est"))
        return pcoll.with_df(out)


class LinearFit(PTransform):
    """Per-key simple linear regression y = a*x + b by one partial-agg
    pass — the per-entity trend extractor (spend vs quantity, value
    vs time) that at warehouse scale must be a single groupBy, never
    a per-key model loop:

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy - slope*Sx) / n
        r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    The five moment sums accumulate as EXACT decimals (inputs cast to
    ``cast_to``, default decimal(18,6) — exact for decimal/int inputs;
    pre-quantize double columns upstream if bit-stable output matters),
    so the sums are order-free; the closed forms are then evaluated in
    double in a fixed operation order. slope/intercept NULL when x is
    constant; r2 NULL when either variable is constant. Rows where x
    or y IS NULL are excluded (SQL regr_* convention).

    Scale: one map-side-combinable groupBy — five sums and a count;
    output is one row per key. No joins, no windows, no Python.

    Output: keys + (n, slope, intercept, r2), floats rounded 9.
    """

    def __init__(self, x: str, y: str, keys=None,
                 cast_to: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.x, self.y = x, y
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.cast_to = cast_to

    def expand(self, pcoll: PCollection) -> PCollection:
        ks = self.keys
        xv = F.col(self.x).cast(self.cast_to)
        yv = F.col(self.y).cast(self.cast_to)
        base = (pcoll.df
                .where(F.col(self.x).isNotNull()
                       & F.col(self.y).isNotNull())
                .select(*ks, xv.alias("__x"), yv.alias("__y")))
        agg = base.groupBy(*ks).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__x").alias("__sx"),
            F.sum("__y").alias("__sy"),
            F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
            F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
            F.sum(F.col("__y") * F.col("__y")).alias("__syy"))
        n = F.col("n").cast("double")
        sx = F.col("__sx").cast("double")
        sy = F.col("__sy").cast("double")
        sxx = F.col("__sxx").cast("double")
        sxy = F.col("__sxy").cast("double")
        syy = F.col("__syy").cast("double")
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        slope = F.when(dx != 0.0, num / dx)
        out = agg.select(
            *ks, "n",
            F.round(slope, 9).alias("slope"),
            F.round(F.when(dx != 0.0, (sy - slope * sx) / n), 9)
            .alias("intercept"),
            F.round(F.when((dx != 0.0) & (dy != 0.0),
                           (num * num) / (dx * dy)), 9).alias("r2"))
        return pcoll.with_df(out)


class KmvOverlapMatrix(PTransform):
    """Pairwise set-overlap matrix across the GROUPS of one frame via
    K-minimum-values sketches — "how much vocabulary / how many users
    do every two sources share?" as one job instead of g^2 KmvOverlap
    runs. Same md5-60-bit determinism, estimators, and exact-below-k
    behavior as KmvOverlap (see its docstring for the math and the
    float-column caveat).

    Construction: one (group, hash) DISTINCT, a rank-window per group
    keeps each group's k smallest hashes (the sketch frame: at most
    g*k rows), then a hash-equijoin of the sketch frame with itself
    builds every unordered group pair's union sketch — merge, re-rank,
    keep k smallest, count hashes present in both sides.

    Scale: the only full-data shuffle is the (group, hash) DISTINCT;
    everything after runs on the g*k-row sketch frame (broadcast-sized
    for any reasonable group count). The pair blow-up is g^2 * k rows
    of SKETCH data, never raw data.

    Output: one row per unordered pair (group_a < group_b): k, ku_a,
    ku_b, ku_u, est_a, est_b, est_union, est_intersection,
    jaccard_est — same column conventions as KmvOverlap.
    """

    def __init__(self, col: str, group: str, k: int = 256,
                 label=None):
        super().__init__(label)
        self.col, self.group = col, group
        if int(k) < 2:
            raise ValueError(f"k {k}: need >= 2")
        self.k = int(k)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        c, g, k = self.col, self.group, self.k
        scale = float(1 << 60)
        dh = (pcoll.df
              .where(F.col(c).isNotNull() & F.col(g).isNotNull())
              .select(F.col(g).alias("g"),
                      F.expr(f"CAST(conv(substring(md5(CAST({c} AS "
                             "STRING)), 1, 15), 16, 10) AS BIGINT)")
                      .alias("h"))
              .distinct())
        w = Window.partitionBy("g").orderBy("h")
        sk = (dh.withColumn("__r", F.row_number().over(w))
              .where(F.col("__r") <= k).drop("__r"))
        per_g = sk.groupBy("g").agg(
            F.count(F.lit(1)).alias("ku"), F.max("h").alias("hk"))
        a = sk.select(F.col("g").alias("ga"), "h")
        b = sk.select(F.col("g").alias("gb"), "h")
        # union sketch per pair: full outer on h within each pair via
        # a grouped merge — tag membership, merge duplicates
        pairs_g = (per_g.select(F.col("g").alias("ga"))
                   .crossJoin(per_g.select(F.col("g").alias("gb")))
                   .where(F.col("ga") < F.col("gb")))
        merged = (pairs_g
                  .join(a.withColumn("ia", F.lit(1))
                        .withColumn("ib", F.lit(0)), "ga")
                  .unionByName(
                      pairs_g.join(b.withColumn("ia", F.lit(0))
                                   .withColumn("ib", F.lit(1)), "gb")
                      .select("ga", "gb", "h", "ia", "ib"))
                  .groupBy("ga", "gb", "h")
                  .agg(F.max("ia").alias("ia"),
                       F.max("ib").alias("ib")))
        wp = Window.partitionBy("ga", "gb").orderBy("h")
        tu = (merged.withColumn("__r", F.row_number().over(wp))
              .where(F.col("__r") <= k)
              .groupBy("ga", "gb")
              .agg(F.count(F.lit(1)).alias("ku_u"),
                   F.max("h").alias("hk_u"),
                   F.sum(F.when((F.col("ia") == 1)
                                & (F.col("ib") == 1), 1)
                         .otherwise(0)).alias("nb")))
        pa = per_g.select(F.col("g").alias("ga"),
                          F.col("ku").alias("ku_a"),
                          F.col("hk").alias("hk_a"))
        pb = per_g.select(F.col("g").alias("gb"),
                          F.col("ku").alias("ku_b"),
                          F.col("hk").alias("hk_b"))
        row = tu.join(pa, "ga").join(pb, "gb")

        def est(ku, hk):
            return (F.when(ku < k, ku.cast("double"))
                    .otherwise((ku - 1).cast("double")
                               / (hk.cast("double") / scale)))

        ea = est(F.col("ku_a"), F.col("hk_a"))
        eb = est(F.col("ku_b"), F.col("hk_b"))
        eu = est(F.col("ku_u"), F.col("hk_u"))
        ei = (F.when(F.col("ku_u") < k, F.col("nb").cast("double"))
              .otherwise(F.col("nb").cast("double")
                         / F.col("ku_u").cast("double") * eu))
        out = row.select(
            F.col("ga").alias("group_a"), F.col("gb").alias("group_b"),
            F.lit(k).alias("k"), "ku_a", "ku_b", "ku_u",
            F.round(ea, 6).alias("est_a"),
            F.round(eb, 6).alias("est_b"),
            F.round(eu, 6).alias("est_union"),
            F.round(ei, 6).alias("est_intersection"),
            F.round(F.when(eu > 0, ei / eu).otherwise(F.lit(0.0)), 6)
            .alias("jaccard_est"))
        return pcoll.with_df(out)


class LagFeatures(PTransform):
    """Supervised-learning feature block for a keyed, ordered series —
    the lag/rolling matrix every forecasting or uplift pipeline
    materializes before model training:

        lag_1..lag_L           previous values (NULL-padded starts)
        roll_mean_W/roll_std_W trailing-window mean / sample std over
                               the PREVIOUS W rows (excludes the
                               current row — no target leakage)
        delta                  value - lag_1
        pct_change             delta / lag_1 (NULL when lag_1 = 0)

    Rolling sums and sums-of-squares accumulate as exact decimals
    (``cast_to``, the LinearFit convention) so window results are
    order-free; mean/std/pct go to double in a fixed operation order.

    Scale: everything is ROWS-frame window functions over
    (key, order) — one shuffle on the key, one sort per partition,
    no joins, no Python. Leakage posture: every feature is strictly
    historical (frames end at 1 PRECEDING except the lags' offsets).

    Output: input columns + the feature columns (floats round 9).
    """

    def __init__(self, value: str, order_by: str, keys=None,
                 lags: int = 3, window: int = 7,
                 cast_to: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.value, self.order_by = value, order_by
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.lags, self.window = int(lags), int(window)
        if self.lags < 1 or self.window < 2:
            raise ValueError("need lags >= 1 and window >= 2")
        self.cast_to = cast_to

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        v, ks, L, W = self.value, self.keys, self.lags, self.window
        base = (Window.partitionBy(*ks) if ks else Window.partitionBy())
        w = base.orderBy(self.order_by)
        trail = w.rowsBetween(-W, -1)
        xd = F.col(v).cast(self.cast_to)
        out = pcoll.df.withColumn("__xd", xd)
        for i in range(1, L + 1):
            out = out.withColumn(
                f"lag_{i}",
                F.lag(F.col(v).cast("double"), i).over(w))
        cnt = F.count("__xd").over(trail).cast("double")
        s = F.sum("__xd").over(trail).cast("double")
        ss = F.sum(F.col("__xd") * F.col("__xd")).over(trail) \
            .cast("double")
        mean = F.when(cnt >= 1.0, s / cnt)
        std = F.when(cnt >= 2.0,
                     F.sqrt((ss - s * s / cnt) / (cnt - 1.0)))
        vdbl = F.col(v).cast("double")
        l1 = F.col("lag_1")
        out = (out
               .withColumn(f"roll_mean_{W}", F.round(mean, 9))
               .withColumn(f"roll_std_{W}", F.round(std, 9))
               .withColumn("delta", F.round(vdbl - l1, 9))
               .withColumn("pct_change",
                           F.round(F.when(l1 != 0.0,
                                          (vdbl - l1) / l1), 9))
               .drop("__xd"))
        return pcoll.with_df(out)


class CrossCorrelation(PTransform):
    """Sample cross-correlation between two columns of a keyed,
    ordered series at every lag in [-max_lag, +max_lag] — the
    lead-lag discovery pass ("do views lead purchases by 2 periods?")
    that seeds transfer-function / causality work:

        r(l) = corr(x_t, y_{t+l})   over the overlap rows, so
        r at POSITIVE lag > 0 means x correlates with FUTURE y
        (x leads y by l periods).

    Construction: per row, an array of (lag, y shifted by lag) structs
    from lead/lag windows, exploded to (keys, lag, x, y') — one
    ordered window pass + one explode (factor 2*max_lag+1) + one
    (keys, lag) decimal-moment aggregation. Pearson r evaluates in
    double in a fixed operation order; NULL when the overlap has
    n < 2 or either side is constant. r rounds 9 (|r| <= 1: the safe
    magnitude zone for cross-engine round).

    ``cast_to_x`` / ``cast_to_y``: decimal casts for the moment sums
    (exact for decimal/int inputs — keep unscaled products under 2^53,
    see LinearFit / the verify-skill hazard note).

    Scale: the window needs one shuffle on the keys; the moment
    aggregation is map-side combinable; output is (2L+1) rows per key.

    Output: keys + (lag, n, r).
    """

    def __init__(self, x: str, y: str, order_by: str, keys=None,
                 max_lag: int = 5, cast_to_x: str = "decimal(18,6)",
                 cast_to_y: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.x, self.y, self.order_by = x, y, order_by
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.max_lag = int(max_lag)
        if self.max_lag < 1:
            raise ValueError("max_lag must be >= 1")
        self.cast_to_x, self.cast_to_y = cast_to_x, cast_to_y

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        ks, L = self.keys, self.max_lag
        base = Window.partitionBy(*ks) if ks else Window.partitionBy()
        w = base.orderBy(self.order_by)
        xv = F.col(self.x).cast(self.cast_to_x)
        yv = F.col(self.y).cast(self.cast_to_y)
        df = pcoll.df.withColumn("__x", xv).withColumn("__y", yv)
        # window columns first (generators cannot embed window
        # expressions), then the lag array explodes plain columns
        for l in range(-L, L + 1):
            shifted = (F.lead("__y", l).over(w) if l >= 0
                       else F.lag("__y", -l).over(w))
            df = df.withColumn(f"__yl_{l + L}", shifted)
        pairs = F.array(*[
            F.struct(F.lit(l).alias("lag"),
                     F.col(f"__yl_{l + L}").alias("yl"))
            for l in range(-L, L + 1)])
        ex = (df.select(*ks, "__x", F.explode(pairs).alias("p"))
              .select(*ks, F.col("p.lag").alias("lag"), "__x",
                      F.col("p.yl").alias("__yl"))
              .where(F.col("__x").isNotNull()
                     & F.col("__yl").isNotNull()))
        agg = ex.groupBy(*ks, "lag").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__x").alias("__sx"),
            F.sum("__yl").alias("__sy"),
            F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
            F.sum(F.col("__yl") * F.col("__yl")).alias("__syy"),
            F.sum(F.col("__x") * F.col("__yl")).alias("__sxy"))
        n = F.col("n").cast("double")
        sx = F.col("__sx").cast("double")
        sy = F.col("__sy").cast("double")
        sxx = F.col("__sxx").cast("double")
        syy = F.col("__syy").cast("double")
        sxy = F.col("__sxy").cast("double")
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        r = F.when((F.col("n") >= 2) & (dx > 0.0) & (dy > 0.0),
                   (n * sxy - sx * sy)
                   / (F.sqrt(dx) * F.sqrt(dy)))
        out = agg.select(*ks, "lag", "n", F.round(r, 9).alias("r"))
        return pcoll.with_df(out)


class NelsonAalen(PTransform):
    """Nelson-Aalen cumulative hazard estimator — KaplanMeier's
    sibling for the HAZARD scale (preferred for small risk sets and
    for comparing hazard ratios):

        H(t) = sum over event times t_i <= t of d_i / n_i
        S_fh(t) = exp(-H(t))        (the Fleming-Harrington survival)

    Same at-risk construction and tie convention as KaplanMeier (see
    its docstring); each d_i/n_i ratio is a double of exact integers
    cast to decimal(28,12) before the TIME-ORDERED cumulative sum, so
    H is an exact decimal both engines agree on; H and S_fh round 6.

    Scale: identical to KaplanMeier — one groupBy(duration) + ordered
    windows over the distinct-duration frame.

    Output: one row per distinct event time — (t, n_risk, d_events,
    c_censored, cum_hazard, survival_fh), ascending t.
    """

    def __init__(self, duration_col: str, event_col: str, label=None):
        super().__init__(label)
        self.duration_col, self.event_col = duration_col, event_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        dc, ec = self.duration_col, self.event_col
        base = pcoll.df.where(
            F.col(dc).isNotNull() & F.col(ec).isNotNull()).select(
            F.col(dc).cast("double").alias("t"),
            F.col(ec).cast("int").alias("__e"))
        per = base.groupBy("t").agg(
            F.sum("__e").cast("long").alias("d_events"),
            F.sum(1 - F.col("__e")).cast("long").alias("c_censored"))
        w_all = Window.partitionBy()
        w_prev = (Window.orderBy("t")
                  .rowsBetween(Window.unboundedPreceding, -1))
        at_risk = (per
                   .withColumn("__N", F.sum(F.col("d_events")
                                            + F.col("c_censored"))
                               .over(w_all))
                   .withColumn("__left", F.coalesce(
                       F.sum(F.col("d_events") + F.col("c_censored"))
                       .over(w_prev), F.lit(0)))
                   .withColumn("n_risk",
                               (F.col("__N") - F.col("__left"))
                               .cast("long")))
        ratio = (F.col("d_events").cast("double")
                 / F.col("n_risk").cast("double"))
        w_cum = (Window.orderBy("t")
                 .rowsBetween(Window.unboundedPreceding, 0))
        out = (at_risk
               .withColumn("__H",
                           F.sum(ratio.cast("decimal(28,12)"))
                           .over(w_cum))
               .where(F.col("d_events") > 0)
               .select("t", "n_risk", "d_events", "c_censored",
                       F.round(F.col("__H").cast("double"), 6)
                       .alias("cum_hazard"),
                       F.round(F.exp(-F.col("__H").cast("double")), 6)
                       .alias("survival_fh")))
        return pcoll.with_df(out)


class LogRankTest(PTransform):
    """Two-group log-rank test (Mantel-Cox) — "do these two cohorts
    churn at the same rate?", the inferential companion to
    KaplanMeier / NelsonAalen:

      at each distinct event time t (pooled), with n_1/n at risk and
      d_1/d observed events:
        O-E term   d_1 - d * n_1 / n
        V term     d * (n_1/n) * (1 - n_1/n) * (n - d) / (n - 1)
                   (0 when n = 1)
      z = sum(O-E) / sqrt(sum V),  chi2 = z^2   (df = 1)

    Counts are exact integers from one per-time conditional
    aggregation + cumulative at-risk windows (the KaplanMeier
    construction, per group via conditional sums); each time's O-E
    and V term is a fixed-order double cast to decimal(28,12) before
    the sum (order-free — the decimal ln-sum convention). z/chi2
    round 9; NULL when sum V = 0.

    Scale: one groupBy(duration) + ordered windows over the
    distinct-duration frame + a 1-row reduce.

    Output (ONE row): n_a, n_b, events_a, events_b, z, chi2.
    """

    def __init__(self, duration_col: str, event_col: str,
                 group_col: str, group_a, label=None):
        super().__init__(label)
        self.duration_col, self.event_col = duration_col, event_col
        self.group_col, self.group_a = group_col, group_a

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        dc, ec, gc = self.duration_col, self.event_col, self.group_col
        base = (pcoll.df
                .where(F.col(dc).isNotNull() & F.col(ec).isNotNull()
                       & F.col(gc).isNotNull())
                .select(F.col(dc).cast("double").alias("t"),
                        F.col(ec).cast("int").alias("__e"),
                        (F.col(gc) == F.lit(self.group_a))
                        .cast("int").alias("__a")))
        per = base.groupBy("t").agg(
            F.sum(F.col("__e") * F.col("__a")).cast("long")
            .alias("d1"),
            F.sum("__e").cast("long").alias("d"),
            F.sum(F.col("__a")).cast("long").alias("m1"),
            F.count(F.lit(1)).cast("long").alias("m"))
        w_all = Window.partitionBy()
        w_prev = (Window.orderBy("t")
                  .rowsBetween(Window.unboundedPreceding, -1))
        ar = (per
              .withColumn("__N1", F.sum("m1").over(w_all))
              .withColumn("__N", F.sum("m").over(w_all))
              .withColumn("__l1", F.coalesce(
                  F.sum("m1").over(w_prev), F.lit(0)))
              .withColumn("__l", F.coalesce(
                  F.sum("m").over(w_prev), F.lit(0)))
              .withColumn("n1", (F.col("__N1") - F.col("__l1"))
                          .cast("long"))
              .withColumn("n", (F.col("__N") - F.col("__l"))
                          .cast("long"))
              .where(F.col("d") > 0))
        n1 = F.col("n1").cast("double")
        n = F.col("n").cast("double")
        d = F.col("d").cast("double")
        d1 = F.col("d1").cast("double")
        oe = d1 - d * n1 / n
        vterm = F.when(F.col("n") > 1,
                       d * (n1 / n) * (1.0 - n1 / n)
                       * (n - d) / (n - 1.0)).otherwise(F.lit(0.0))
        tot = ar.agg(
            F.sum(oe.cast("decimal(28,12)")).alias("__oe"),
            F.sum(vterm.cast("decimal(28,12)")).alias("__v"),
            F.sum("d1").cast("long").alias("events_a"),
            (F.sum("d") - F.sum("d1")).cast("long").alias("events_b"))
        sizes = base.agg(
            F.sum("__a").cast("long").alias("n_a"),
            F.sum(1 - F.col("__a")).cast("long").alias("n_b"))
        oed = F.col("__oe").cast("double")
        vd = F.col("__v").cast("double")
        out = (sizes.crossJoin(F.broadcast(tot))
               .select("n_a", "n_b", "events_a", "events_b",
                       F.round(F.when(vd > 0.0, oed / F.sqrt(vd)), 9)
                       .alias("z"),
                       F.round(F.when(vd > 0.0, (oed * oed) / vd), 9)
                       .alias("chi2")))
        return pcoll.with_df(out)
