"""Data-quality operators: column profiling and constraint checking —
the Deequ/TFDV-style validation layer a production pipeline runs before
and after every materialization. No reference counterpart (Beam users
bolt on Deequ or hand-rolled asserts); here both are single-pass
DataFrame aggregations.

Scale design: ProfileColumns is ONE global aggregation over the input
(count/null/min/max/sum fold per column; distincts default to HLL++
sketches so the plan stays a single partial+final agg — exact
multi-distinct is opt-in and goes through the Expand plan), then a
constant-size unpivot. CheckConstraints is one global aggregation evaluating every
check expression. Neither grows with column cardinality beyond the
aggregation state itself.

Cross-engine determinism: numeric means go through an exact decimal SUM
(associative — immune to partial-agg order) divided once in double, the
repo's standard dec() pattern; min/max/counts are exact by nature.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from beam_spark.pcollection import PCollection, PTransform

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


class ProfileColumns(PTransform):
    """Per-column profile: one output row per profiled column with
    ``column, dtype, n, n_null, n_distinct, min_value, max_value,
    mean`` (mean is NULL for non-numeric columns; min/max are rendered
    as strings so the output schema is column-type-independent).

    ``mean_scale``: decimal scale used for the exact mean sum — inputs
    with more fractional digits than this are profiled approximately
    (documented; the TESTDATA money columns carry <= 2).

    ``approx_distinct`` (default True): n_distinct via
    ``approx_count_distinct`` (HLL++, relative error ``rsd``) — one
    mergeable sketch per column, so the plan stays a single
    partial+final aggregation. ``approx_distinct=False`` opts into
    EXACT multi-distinct, which plans through Spark's Expand operator:
    input rows are replicated once per distinct aggregate — a
    ``len(columns)``-times scan amplification that is the wrong default
    for wide tables at scale.
    """

    def __init__(self, columns=None, mean_scale: int = 6,
                 approx_distinct: bool = True, rsd: float = 0.05,
                 label=None):
        super().__init__(label)
        self.columns = list(columns) if columns else None
        self.mean_scale = mean_scale
        self.approx_distinct, self.rsd = approx_distinct, rsd

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        cols = self.columns or [f.name for f in df.schema.fields]
        aggs, per_col = [], []
        for c in cols:
            dt = df.schema[c].dataType
            is_num = isinstance(dt, _NUMERIC)
            ndist = (F.approx_count_distinct(F.col(c), self.rsd)
                     if self.approx_distinct
                     else F.count_distinct(F.col(c)))
            aggs += [
                F.count(F.lit(1)).alias(f"{c}__n"),
                F.count_if(F.col(c).isNull()).alias(f"{c}__nnull"),
                ndist.alias(f"{c}__ndist"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
            if is_num:
                dec = F.col(c).cast(f"decimal(28,{self.mean_scale})")
                aggs.append(
                    (F.sum(dec).cast("double")
                     / F.count(F.col(c))).alias(f"{c}__mean"))
            else:
                aggs.append(F.lit(None).cast("double").alias(f"{c}__mean"))
            per_col.append((c, dt.simpleString()))
        one = df.agg(*aggs)
        # unpivot the single stats row into one output row per column
        structs = F.array(*[
            F.struct(F.lit(c).alias("column"), F.lit(t).alias("dtype"),
                     F.col(f"{c}__n").alias("n"),
                     F.col(f"{c}__nnull").alias("n_null"),
                     F.col(f"{c}__ndist").alias("n_distinct"),
                     F.col(f"{c}__min").alias("min_value"),
                     F.col(f"{c}__max").alias("max_value"),
                     F.col(f"{c}__mean").alias("mean"))
            for c, t in per_col])
        out = (one.select(F.explode(structs).alias("p")).select("p.*"))
        return pcoll.with_df(out)


class CheckConstraints(PTransform):
    """Deequ-style constraint suite in one aggregation pass.

    ``checks``: {name: aggregate SQL boolean expression}, e.g.
    ``{"pk_unique": "count(DISTINCT id) = count(*)",
       "price_nonneg": "min(price) >= 0",
       "complete_cust": "count_if(cust IS NULL) = 0"}``.

    Output: one row per check — (check, passed). Compose with a
    fail-fast: ``assert out.filter("passed = 0").count() == 0``.
    """

    def __init__(self, checks: dict, label=None):
        super().__init__(label)
        if not checks:
            raise ValueError("CheckConstraints needs at least one check")
        self.checks = dict(checks)

    def expand(self, pcoll: PCollection) -> PCollection:
        aggs = [F.expr(expr).cast("int").alias(name)
                for name, expr in self.checks.items()]
        one = pcoll.df.agg(*aggs)
        structs = F.array(*[
            F.struct(F.lit(name).alias("check"),
                     F.col(name).alias("passed"))
            for name in self.checks])
        out = one.select(F.explode(structs).alias("c")).select("c.*")
        return pcoll.with_df(out)


class DistributionDrift(PTransform):
    """Population-stability-index (PSI) drift between a REFERENCE frame
    and the current input, per numeric column — the standard
    "did yesterday's corpus shift" monitor (TFDV's drift comparator,
    credit-risk PSI). PSI = sum over bins of (p - q) * ln(p / q), with
    p/q the reference/current bin fractions clamped at ``eps``;
    conventional reading: < 0.1 stable, 0.1-0.25 moderate, > 0.25
    drifted.

    Bins — numeric columns: ``n_bins`` fixed-width intervals over the
    REFERENCE min/max (out-of-range current values clamp into the edge
    bins, so new mass outside the reference range is visible as edge-bin
    drift). String columns: the reference's ``max_categories`` most
    frequent values (count-desc, value tie-break), everything else in
    an OTHER bucket — so novel categories in the current frame surface
    as OTHER-bucket drift.

    ``metric='jsd'`` swaps the per-bin term for the Jensen-Shannon
    divergence (base-2: JSD = 0.5*sum p*log2(2p/(p+q)) + 0.5*sum
    q*log2(2q/(p+q))) — symmetric, BOUNDED in [0, 1], and finite for
    empty bins without any eps clamping (a 0-count bin's own term is
    exactly 0), which makes it the better score when novel categories
    or out-of-range mass would saturate PSI's unbounded log-ratio.
    Conventional reading: < 0.05 stable, > 0.1 drifted (default
    threshold 0.1 in jsd mode).

    Output: one row per column — (column, <metric>, n_ref, n_cur,
    drifted), the divergence column named 'psi' or 'jsd'.

    Scale: per column, one aggregation over each frame (bin counts) and
    a bins-sized (constant) join; the reference min/max (or top-N
    category list) ride in a broadcast bounded frame. Everything stays
    distributed.
    """

    def __init__(self, reference, columns, n_bins: int = 10,
                 max_categories: int = 20, threshold: float | None = None,
                 eps: float = 1e-6, metric: str = "psi", label=None):
        super().__init__(label)
        if metric not in ("psi", "jsd"):
            raise ValueError(f"metric {metric!r}: 'psi' or 'jsd'")
        self.reference = (reference.df if isinstance(reference, PCollection)
                          else reference)
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.n_bins, self.eps = n_bins, eps
        self.metric = metric
        self.threshold = (threshold if threshold is not None
                          else (0.25 if metric == "psi" else 0.1))
        self.max_categories = max_categories

    def _bin_counts(self, df, c, stats, tag):
        nb = self.n_bins
        width = (F.col("__mx") - F.col("__mn")) / nb
        raw = F.floor((F.col(c) - F.col("__mn")) / width)
        bin_id = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
            F.least(F.lit(nb - 1), F.greatest(F.lit(0), raw))).cast("int")
        return (df.select(c).where(F.col(c).isNotNull())
                .crossJoin(F.broadcast(stats))
                .groupBy(bin_id.alias("bin"))
                .agg(F.count(F.lit(1)).alias(f"n_{tag}")))

    def _cat_counts(self, df, c, cats, tag):
        """Counts per category bucket: top-N reference values are their
        own bucket; everything else folds into OTHER."""
        return (df.select(F.col(c).alias("__v"))
                .where(F.col("__v").isNotNull())
                .join(F.broadcast(cats), on="__v", how="left")
                .groupBy(F.coalesce("__cat", F.lit("OTHER")).alias("bin"))
                .agg(F.count(F.lit(1)).alias(f"n_{tag}")))

    def expand(self, pcoll: PCollection) -> PCollection:
        eps = self.eps
        outs = []
        for c in self.columns:
            if isinstance(pcoll.df.schema[c].dataType, T.StringType):
                # top-N via orderBy+limit: TakeOrdered, no global sort
                cats = (self.reference
                        .select(F.col(c).alias("__v"))
                        .where(F.col("__v").isNotNull())
                        .groupBy("__v").agg(F.count(F.lit(1)).alias("__n"))
                        .orderBy(F.col("__n").desc(), F.col("__v"))
                        .limit(self.max_categories)
                        .select("__v", F.col("__v").alias("__cat")))
                ref = self._cat_counts(self.reference, c, cats, "ref")
                cur = self._cat_counts(pcoll.df, c, cats, "cur")
            else:
                stats = self.reference.agg(
                    F.min(F.col(c).cast("double")).alias("__mn"),
                    F.max(F.col(c).cast("double")).alias("__mx"))
                ref = self._bin_counts(self.reference, c, stats, "ref")
                cur = self._bin_counts(pcoll.df, c, stats, "cur")
            joined = (ref.join(cur, on="bin", how="full")
                      .select(F.coalesce("n_ref", F.lit(0)).alias("nr"),
                              F.coalesce("n_cur", F.lit(0)).alias("nc")))
            # totals via a broadcast 1-row agg (not a partitionless
            # window — the bins frame is tiny but the global-window
            # plan is noisy and single-partition by construction)
            totals = joined.agg(F.sum("nr").alias("__tr"),
                                F.sum("nc").alias("__tc"))
            joined = joined.crossJoin(F.broadcast(totals))
            if self.metric == "jsd":
                p = F.col("nr") / F.col("__tr")
                q = F.col("nc") / F.col("__tc")
                two = F.lit(2.0)
                term = (
                    F.when(F.col("nr") > 0,
                           F.lit(0.5) * p * F.log2(two * p / (p + q)))
                    .otherwise(F.lit(0.0))
                    + F.when(F.col("nc") > 0,
                             F.lit(0.5) * q * F.log2(two * q / (p + q)))
                    .otherwise(F.lit(0.0)))
            else:
                p = F.greatest(F.col("nr") / F.col("__tr"), F.lit(eps))
                q = F.greatest(F.col("nc") / F.col("__tc"), F.lit(eps))
                term = (p - q) * F.log(p / q)
            per_bin = joined.select(term.alias("term"), "nr", "nc")
            outs.append(per_bin.agg(
                F.lit(c).alias("column"),
                F.round(F.sum("term"), 6).alias(self.metric),
                F.sum("nr").alias("n_ref"), F.sum("nc").alias("n_cur"))
                .withColumn("drifted",
                            (F.col(self.metric) > self.threshold)
                            .cast("int")))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return pcoll.with_df(out)


class Histogram(PTransform):
    """Fixed-width histogram of a numeric column: ``n_bins`` equal
    intervals over [lo, hi] (observed min/max by default, one extra
    aggregation pass; pass explicit bounds to skip it — out-of-range
    values clamp into the edge bins so mass is never dropped).

    Output: one row per NON-EMPTY bin — (bin, bin_lo, bin_hi, n).
    Dense-spine output (empty bins as zero rows) composes with
    ``GapFill``-style sequence explode downstream if needed.

    Scale: the bin id is a zero-shuffle expression; the count is one
    groupBy over at most n_bins keys — the same shape at 1000
    executors.
    """

    def __init__(self, col: str, n_bins: int = 20,
                 lo: float | None = None, hi: float | None = None,
                 label=None):
        super().__init__(label)
        self.col, self.n_bins = col, int(n_bins)
        if self.n_bins < 1:
            raise ValueError("n_bins must be >= 1")
        if (lo is None) != (hi is None):
            raise ValueError("pass both lo and hi, or neither")
        self.lo, self.hi = lo, hi

    def expand(self, pcoll: PCollection) -> PCollection:
        nb = self.n_bins
        x = (pcoll.df.select(F.col(self.col).cast("double").alias("__x"))
             .where(F.col("__x").isNotNull()))
        if self.lo is not None:
            stats = pcoll.df.sparkSession.range(1).select(
                F.lit(float(self.lo)).alias("__mn"),
                F.lit(float(self.hi)).alias("__mx"))
        else:
            stats = x.agg(F.min("__x").alias("__mn"),
                          F.max("__x").alias("__mx"))
        width = (F.col("__mx") - F.col("__mn")) / nb
        raw = F.floor((F.col("__x") - F.col("__mn")) / width)
        bin_id = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)) \
            .otherwise(F.least(F.lit(nb - 1),
                               F.greatest(F.lit(0), raw))).cast("int")
        out = (x.crossJoin(F.broadcast(stats))
               .groupBy(bin_id.alias("bin"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.first("__mn").alias("__mn"),
                    F.first("__mx").alias("__mx"))
               .select("bin",
                       (F.col("__mn") + F.col("bin")
                        * (F.col("__mx") - F.col("__mn")) / nb)
                       .alias("bin_lo"),
                       (F.col("__mn") + (F.col("bin") + 1)
                        * (F.col("__mx") - F.col("__mn")) / nb)
                       .alias("bin_hi"),
                       "n"))
        return pcoll.with_df(out)


class KsDrift(PTransform):
    """Two-sample Kolmogorov–Smirnov drift test between a REFERENCE
    frame and the current input on one numeric column: D = sup over x
    of |ECDF_ref(x) - ECDF_cur(x)|, plus the asymptotic two-sided
    p-value (Smirnov's series, 20 terms). The distribution-free
    companion to PSI (``DistributionDrift``): no binning choices, a
    proper significance level — the standard "did this feature shift"
    test.

    Modes:
      exact (default): both sides aggregate to (value, n_ref, n_cur)
      counts first; the cumulative window then runs over the DISTINCT
      observed values only. Exact, and cheap when the column's
      distinct cardinality is bounded (discrete features, scores at
      fixed precision). Because a no-partition cumulative window
      funnels through one task, the ``max_distinct`` guard (default
      1e6) counts the aggregated frame first and fails fast with an
      actionable message when a continuous column would blow it up.
      bins=B: histogram KS over B fixed-width bins of the combined
      min/max — every heavy step is a groupBy on the bin id and the
      window runs over exactly B rows; D_binned is a lower bound of D
      converging as B grows. The unbounded-cardinality scale path.

    Output: ONE row — (ks_stat, p_value, n_ref, n_cur), both floats
    rounded to 6 dp (deterministic across engines).
    """

    def __init__(self, reference, col: str, ref_col: str | None = None,
                 bins: int | None = None,
                 max_distinct: int | None = 1_000_000, label=None):
        super().__init__(label)
        self.reference = (reference.df
                          if isinstance(reference, PCollection)
                          else reference)
        self.col, self.ref_col = col, ref_col or col
        self.bins = int(bins) if bins else None
        self.max_distinct = max_distinct

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        a = (self.reference
             .select(F.col(self.ref_col).cast("double").alias("__x"))
             .where(F.col("__x").isNotNull())
             .withColumn("__s", F.lit(0)))
        b = (pcoll.df
             .select(F.col(self.col).cast("double").alias("__x"))
             .where(F.col("__x").isNotNull())
             .withColumn("__s", F.lit(1)))
        u = a.unionByName(b)
        if self.bins:
            nb = self.bins
            stats = u.agg(F.min("__x").alias("__mn"),
                          F.max("__x").alias("__mx"))
            width = (F.col("__mx") - F.col("__mn")) / nb
            raw = F.floor((F.col("__x") - F.col("__mn")) / width)
            v = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
                F.least(F.lit(nb - 1), raw)).cast("bigint")
            u = u.crossJoin(F.broadcast(stats))
        else:
            v = F.col("__x")
        counts = (u.groupBy(v.alias("__v"))
                  .agg(F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
                       .alias("__n1"),
                       F.sum(F.when(F.col("__s") == 1, 1).otherwise(0))
                       .alias("__n2")))
        if self.bins is None and self.max_distinct is not None:
            nd = counts.count()
            if nd > self.max_distinct:
                raise ValueError(
                    f"KsDrift exact mode: column has {nd} distinct "
                    f"values (> max_distinct={self.max_distinct}); the "
                    "cumulative window would funnel them through one "
                    "task. Pass bins= for the histogram scale path, or "
                    "raise max_distinct explicitly.")
        # cumulative over the AGGREGATED frame only: distinct values in
        # exact mode (guarded above), exactly `bins` rows in bin mode
        w = Window.orderBy("__v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        cum = (counts
               .withColumn("__c1", F.sum("__n1").over(w))
               .withColumn("__c2", F.sum("__n2").over(w)))
        # totals from the AGGREGATED counts, not a raw re-scan
        tot = counts.agg(F.sum("__n1").alias("na"),
                         F.sum("__n2").alias("nb"))
        d = (cum.crossJoin(F.broadcast(tot))
             .agg(F.max(F.abs(F.col("__c1") / F.col("na")
                              - F.col("__c2") / F.col("nb")))
                  .alias("__d"),
                  F.first("na").alias("n_ref"),
                  F.first("nb").alias("n_cur")))
        # asymptotic two-sided p (Smirnov), 20 terms, deterministic
        # left-to-right accumulation in both engines
        ne = (F.col("n_ref").cast("double") * F.col("n_cur")
              / (F.col("n_ref") + F.col("n_cur")))
        lam = (F.sqrt(ne) + 0.12 + 0.11 / F.sqrt(ne)) * F.col("__d")
        series = F.aggregate(
            F.sequence(F.lit(1), F.lit(20)),
            F.lit(0.0).cast("double"),
            lambda acc, j: acc + F.when(j % 2 == 1, 1.0).otherwise(-1.0)
            * F.exp(-2.0 * (j * lam).cast("double") * j * lam))
        # the alternating series stops decaying as lam -> 0 (the formal
        # sum at lam=0 is 1-1+1-...): below 0.3 the true Q(lam) is
        # > 0.9995, so clamp to 1 there (Numerical Recipes posture)
        p = F.when(lam < 0.3, F.lit(1.0)).otherwise(
            F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2.0 * series)))
        out = d.select(F.round("__d", 6).alias("ks_stat"),
                       F.round(p, 6).alias("p_value"),
                       "n_ref", "n_cur")
        return pcoll.with_df(out)


class SchemaDiff(PTransform):
    """Schema drift vs a reference frame: one row per column that was
    ADDED, REMOVED, or TYPE_CHANGED relative to the reference —
    the pre-flight check before appending a new batch to a lake table.
    Output: (column, status, ref_type, cur_type); empty means the
    schemas agree. Pure metadata — no data is read."""

    def __init__(self, reference, label=None):
        super().__init__(label)
        self.reference = (reference.df if isinstance(reference, PCollection)
                          else reference)

    def expand(self, pcoll: PCollection) -> PCollection:
        ref = {f.name: f.dataType.simpleString()
               for f in self.reference.schema.fields}
        cur = {f.name: f.dataType.simpleString()
               for f in pcoll.df.schema.fields}
        rows = []
        for name in sorted(set(ref) | set(cur)):
            if name not in cur:
                rows.append((name, "REMOVED", ref[name], None))
            elif name not in ref:
                rows.append((name, "ADDED", None, cur[name]))
            elif ref[name] != cur[name]:
                rows.append((name, "TYPE_CHANGED", ref[name], cur[name]))
        spark = pcoll.df.sparkSession
        out = spark.createDataFrame(
            rows, "column string, status string, ref_type string, "
                  "cur_type string")
        return pcoll.with_df(out)


class FlagOutliers(PTransform):
    """Tukey-fence outlier flags per numeric column: a row is an
    outlier in ``c`` when it falls outside
    [Q1 - k*IQR, Q3 + k*IQR] (k=1.5 default). Appends one int flag
    column ``<c>_outlier`` per input column plus ``n_outlier_cols``.

    Scale: quartiles come from ONE exact-percentile aggregation pass
    (Spark's `percentile`, interpolated — cross-engine exact, as the
    percentile gates prove); flags are a zero-shuffle projection
    against the broadcast 1-row bounds frame.
    """

    def __init__(self, columns, k: float = 1.5, label=None):
        super().__init__(label)
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.k = float(k)

    def expand(self, pcoll: PCollection) -> PCollection:
        k = self.k
        aggs = []
        for c in self.columns:
            aggs += [F.expr(f"percentile({c}, 0.25)").alias(f"{c}__q1"),
                     F.expr(f"percentile({c}, 0.75)").alias(f"{c}__q3")]
        bounds = pcoll.df.agg(*aggs)
        out = pcoll.df.crossJoin(F.broadcast(bounds))
        flags = []
        for c in self.columns:
            iqr = F.col(f"{c}__q3") - F.col(f"{c}__q1")
            lo = F.col(f"{c}__q1") - k * iqr
            hi = F.col(f"{c}__q3") + k * iqr
            flag = ((F.col(c) < lo) | (F.col(c) > hi)).cast("int")
            out = out.withColumn(f"{c}_outlier", F.coalesce(flag, F.lit(0)))
            flags.append(F.col(f"{c}_outlier"))
        total = flags[0]
        for f in flags[1:]:
            total = total + f
        out = out.withColumn("n_outlier_cols", total)
        return pcoll.with_df(out.drop(
            *[f"{c}__q1" for c in self.columns],
            *[f"{c}__q3" for c in self.columns]))


class CurriculumBuckets(PTransform):
    """Curriculum ordering for training: rows ranked by a quality score
    into ``n_buckets`` near-equal tiers. Train easy->hard by consuming
    buckets in order.

    Default plan (``exact=False``) — boundaries-then-assign: ONE exact
    interpolated-percentile aggregation computes the n-1 score cutoffs,
    then bucket assignment is a zero-shuffle expression against the
    broadcast 1-row boundaries frame. No window, no global sort, no
    single-partition stage — the plan is a scan + one 1-row agg +
    a projection, which survives any scale.

    Divergence vs exact ``ntile`` (documented): rows with EQUAL scores
    always land in the same bucket (no id tie-break splits a run of
    ties across a boundary), so tier sizes are equal only up to score
    ties; with distinct scores sizes differ by at most one (first tier
    takes the remainder). Rows with NULL score go to the last bucket.

    ``boundary_accuracy``: None (default) computes EXACT interpolated
    percentiles — the aggregation buffer is a value->count histogram,
    fine for bounded-granularity scores (quality scores, token counts);
    for continuous scores at extreme scale pass an int (e.g. 10000) to
    switch the boundary pass to ``approx_percentile`` with that
    accuracy — a fixed-size mergeable sketch.

    ``exact=True`` opts into the exact equal-size ``ntile`` with the id
    tie-break — a PARTITIONLESS window, i.e. the entire input flows
    through ONE task. Bounded/driver-scale data only; the default
    refuses nothing but the docstring caveat is the contract.
    """

    def __init__(self, score_col: str, id_col: str, n_buckets: int = 10,
                 ascending: bool = False, out_col: str = "bucket",
                 exact: bool = False, boundary_accuracy: int | None = None,
                 label=None):
        super().__init__(label)
        self.score_col, self.id_col = score_col, id_col
        self.n_buckets, self.ascending = int(n_buckets), ascending
        self.out_col, self.exact = out_col, exact
        self.boundary_accuracy = boundary_accuracy

    def expand(self, pcoll: PCollection) -> PCollection:
        n = self.n_buckets
        if self.exact:
            from pyspark.sql import Window

            order = (F.col(self.score_col).asc() if self.ascending
                     else F.col(self.score_col).desc())
            w = Window.orderBy(order, F.col(self.id_col))
            return pcoll.with_df(pcoll.df.withColumn(
                self.out_col, F.ntile(n).over(w)))
        if n == 1:
            return pcoll.with_df(
                pcoll.df.withColumn(self.out_col, F.lit(1)))
        # rank on s = score (asc) / -score (desc): bucket of a row is
        # 1 + (number of interior quantile cutoffs strictly below s)
        s = F.col(self.score_col).cast("double")
        if not self.ascending:
            s = -s
        fracs = ", ".join(repr(i / n) for i in range(1, n))
        pfn = ("percentile(__s, array({f}))"
               if self.boundary_accuracy is None else
               f"approx_percentile(__s, array({{f}}), "
               f"{int(self.boundary_accuracy)})")
        bounds = (pcoll.df.select(s.alias("__s"))
                  .agg(F.expr(pfn.format(f=fracs)).alias("__cb")))
        out = pcoll.df.crossJoin(F.broadcast(bounds))
        # bucket = 1 + |cutoffs strictly below s| — one array filter,
        # O(1) expression size however many buckets (a chain of n
        # WHENs would blow the expression tree up at large n)
        bucket = (F.lit(1)
                  + F.size(F.filter(F.col("__cb"), lambda b: s > b)))
        bucket = F.when(F.col(self.score_col).isNull(),
                        F.lit(n)).otherwise(bucket)
        return pcoll.with_df(
            out.withColumn(self.out_col, bucket).drop("__cb"))


class BenfordProfile(PTransform):
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/synthetic-data smell test for financial or
    naturally-scaled columns (Nigrini 2012). Real multi-magnitude
    data follows P(d) = log10(1 + 1/d); generator artifacts (uniform
    sampling, truncation, copy-paste) show up as flat or spiked digit
    histograms.

    The first digit is the first [1-9] character of the DOUBLE's
    round-trip string form of |x| — not floor(x / 10^floor(log10 x)),
    whose log10 lands on 2.999... at exact powers of ten and yields
    digit 10. The shortest round-trip representation covers the full
    double range (scientific notation for tiny/huge magnitudes —
    no decimal-cast overflow to NULL at |x| >= 1e22, no rounding of
    |x| < 5e-7 to zero, no half-up carry shifting the leading digit
    at the 6th decimal). Zero/NULL/NaN/Infinity rows are excluded
    (no first significant digit).

    Output: one row per digit 1..9 — (digit, n, freq, expected,
    chi2_term) with chi2_term = n_total * (freq - expected)^2 /
    expected (sum the column for the Pearson statistic; > ~20 on 8
    degrees of freedom is a strong deviation). Digits with zero rows
    still appear (n = 0).

    Scale: one scan + one 9-group aggregation; pure expressions.
    """

    def __init__(self, col: str, label=None):
        super().__init__(label)
        self.col = col

    def expand(self, pcoll: PCollection) -> PCollection:
        import math

        c = self.col
        spark = pcoll.df.sparkSession
        digit = F.regexp_extract(
            F.abs(F.col(c).cast("double")).cast("string"),
            "[1-9]", 0)
        counted = (pcoll.df
                   .where(F.col(c).isNotNull())
                   .select(digit.alias("d"))
                   .where(F.col("d") != "")
                   .groupBy("d")
                   .agg(F.count(F.lit(1)).alias("n")))
        digits = spark.range(1, 10).select(
            F.col("id").cast("string").alias("d"))
        full = (digits.join(counted, "d", "left")
                .select(F.col("d").cast("int").alias("digit"),
                        F.coalesce("n", F.lit(0)).alias("n")))
        tot = full.agg(F.sum("n").alias("__t"))
        exp_expr = F.log10(1.0 + 1.0 / F.col("digit"))
        out = (full.crossJoin(F.broadcast(tot))
               .select(
                   "digit",
                   F.col("n").cast("long").alias("n"),
                   F.round(F.col("n") / F.col("__t"), 6).alias("freq"),
                   F.round(exp_expr, 6).alias("expected"),
                   F.round(F.col("__t")
                           * F.pow(F.col("n") / F.col("__t") - exp_expr, 2)
                           / exp_expr, 6).alias("chi2_term")))
        return pcoll.with_df(out)


class Winsorize(PTransform):
    """Clip a numeric column at exact global percentiles — the
    standard heavy-tail guard before scaling/aggregating training
    features (a 1e9 outlier in a price column otherwise dominates
    any mean-based normalizer). Bounds use Spark's EXACT interpolated
    ``percentile`` (the oracle-able counterpart of percentile_approx;
    swap ``approx=True`` for the sketch path on huge columns where a
    1-ulp-exact bound is not worth a full sort).

    Output: the input frame + ``<col>_wins`` (clipped value, rounded
    6 — the interpolated bound itself differs at 1 ulp between
    engines' interpolation formulas) + ``<col>_clipped`` (-1 low
    clip, 1 high clip, 0 untouched).

    Scale: exact mode costs one percentile aggregation (a sort-based
    agg — the documented price of exactness); the bounds ride a
    broadcast 1-row frame into a zero-shuffle projection.
    """

    def __init__(self, col: str, lower: float = 0.01,
                 upper: float = 0.99, approx: bool = False,
                 accuracy: int = 10000, label=None):
        super().__init__(label)
        if not 0.0 <= float(lower) < float(upper) <= 1.0:
            raise ValueError(
                f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
        self.col, self.lower, self.upper = col, float(lower), float(upper)
        self.approx, self.accuracy = bool(approx), int(accuracy)

    def expand(self, pcoll: PCollection) -> PCollection:
        c = F.col(self.col).cast("double")
        if self.approx:
            bounds = pcoll.df.agg(
                F.percentile_approx(
                    c, F.array(F.lit(self.lower), F.lit(self.upper)),
                    self.accuracy).alias("__b"))
        else:
            bounds = pcoll.df.agg(F.expr(
                f"percentile(CAST({self.col} AS DOUBLE), "
                f"array({self.lower}, {self.upper}))").alias("__b"))
        bounds = bounds.select(F.col("__b")[0].alias("__lo"),
                               F.col("__b")[1].alias("__hi"))
        out = (pcoll.df.crossJoin(F.broadcast(bounds))
               .withColumn(f"{self.col}_wins",
                           F.round(F.least(F.greatest(c, F.col("__lo")),
                                           F.col("__hi")), 6))
               .withColumn(f"{self.col}_clipped",
                           F.when(c < F.col("__lo"), F.lit(-1))
                           .when(c > F.col("__hi"), F.lit(1))
                           .otherwise(F.lit(0)).cast("int"))
               .drop("__lo", "__hi"))
        return pcoll.with_df(out)


class RobustScale(PTransform):
    """Median/IQR standardization (sklearn RobustScaler semantics):
    ``(x - median) / (p_upper - p_lower)`` — the outlier-immune
    alternative to z-scoring for heavy-tailed feature columns (mean
    and stddev are both dominated by the tail Winsorize clips; median
    and IQR are not). NULL where the IQR is 0 (constant column).

    Exact interpolated percentiles by default (``approx=True`` for
    the sketch path). Output: input + ``<col>_scaled`` rounded 6.

    Scale: one percentile aggregation, bounds broadcast into a
    zero-shuffle projection — the Winsorize shape.
    """

    def __init__(self, col: str, lower: float = 0.25,
                 upper: float = 0.75, approx: bool = False,
                 accuracy: int = 10000, label=None):
        super().__init__(label)
        if not 0.0 <= float(lower) < float(upper) <= 1.0:
            raise ValueError(
                f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
        self.col, self.lower, self.upper = col, float(lower), float(upper)
        self.approx, self.accuracy = bool(approx), int(accuracy)

    def expand(self, pcoll: PCollection) -> PCollection:
        c = F.col(self.col).cast("double")
        fr = f"array({self.lower}, 0.5, {self.upper})"
        if self.approx:
            bounds = pcoll.df.agg(F.percentile_approx(
                c, F.array(F.lit(self.lower), F.lit(0.5),
                           F.lit(self.upper)),
                self.accuracy).alias("__b"))
        else:
            bounds = pcoll.df.agg(F.expr(
                f"percentile(CAST({self.col} AS DOUBLE), {fr})")
                .alias("__b"))
        bounds = bounds.select(F.col("__b")[0].alias("__lo"),
                               F.col("__b")[1].alias("__med"),
                               F.col("__b")[2].alias("__hi"))
        iqr = F.col("__hi") - F.col("__lo")
        out = (pcoll.df.crossJoin(F.broadcast(bounds))
               .withColumn(f"{self.col}_scaled",
                           F.round(F.when(iqr != 0.0,
                                          (c - F.col("__med")) / iqr),
                                   6))
               .drop("__lo", "__med", "__hi"))
        return pcoll.with_df(out)


class BinaryClassifierMetrics(PTransform):
    """Evaluation report for a binary classifier's scores — the gate a
    training-data pipeline runs on its quality/toxicity/langid filter
    model before trusting it to prune a corpus. One compact row:
    ranking quality (AUC), probabilistic calibration (log-loss, Brier),
    and thresholded confusion counts with precision/recall/F1.

    AUC is the Mann-Whitney statistic with midrank tie correction,
    computed ENTIRELY in integers until one final division:
    per distinct score, 2*midrank = 2*(count below) + count(eq) + 1,
    rank-sum doubled = sum(pos * that), and

        AUC = (rs2 - n_pos*(n_pos+1)) / (2 * n_pos * n_neg)

    so the result is bit-exact across engines. Log-loss and Brier go
    through the repo's exact-decimal-sum pattern (associative, immune
    to partial-agg order) and are rounded to 6 dp; scores are clipped
    to [eps, 1-eps] for the logarithm. Precision/recall/F1 are single
    divisions of exact counts (F1 = 2tp / (2tp + fp + fn)).

    Scale: one groupBy(score) aggregation (partial agg), then a
    cumulative count over the DISTINCT-SCORE frame — cardinality is
    the number of distinct scores, not rows, but the running sum is a
    single-partition window: for continuous scores at extreme
    cardinality, quantize upstream (e.g. round(score, 6)) to bound it.
    The confusion counts are one more global aggregation; everything
    meets in a 1-row report.

    Output: (n, n_pos, n_neg, auc, logloss, brier, tp, fp, tn, fn,
    precision, recall, f1). AUC/precision/recall/f1 are NULL when a
    denominator class is empty. Rows with NULL score or label are
    dropped.
    """

    def __init__(self, score_col: str, label_col: str,
                 threshold: float = 0.5, eps: float = 1e-15,
                 label=None):
        super().__init__(label)
        if not 0.0 < float(eps) < 0.5:
            raise ValueError(f"eps {eps} outside (0, 0.5)")
        self.score_col, self.label_col = score_col, label_col
        self.threshold, self.eps = float(threshold), float(eps)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        s, y = self.score_col, self.label_col
        th, eps = self.threshold, self.eps
        base = pcoll.df.where(
            F.col(s).isNotNull() & F.col(y).isNotNull()).select(
            F.col(s).cast("double").alias("__s"),
            F.col(y).cast("long").alias("__y"))
        per = base.groupBy("__s").agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__y").alias("__pos"))
        w = (Window.orderBy("__s")
             .rowsBetween(Window.unboundedPreceding, -1))
        ranked = per.withColumn(
            "__below", F.coalesce(F.sum("__cnt").over(w), F.lit(0)))
        rs2 = ranked.agg(
            F.sum(F.col("__pos")
                  * (2 * F.col("__below") + F.col("__cnt") + 1))
            .alias("__rs2"))
        p = F.least(F.greatest(F.col("__s"), F.lit(eps)),
                    F.lit(1.0 - eps))
        ll_term = F.when(F.col("__y") == 1, -F.log(p)) \
                   .otherwise(-F.log(1.0 - p))
        d = p - F.col("__y").cast("double")
        br_term = d * d
        tot = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("n_pos"),
            F.sum(ll_term.cast("decimal(28,12)")).alias("__ll"),
            F.sum(br_term.cast("decimal(28,12)")).alias("__br"),
            F.sum(F.when((F.col("__s") >= th) & (F.col("__y") == 1), 1)
                  .otherwise(0)).alias("tp"),
            F.sum(F.when((F.col("__s") >= th) & (F.col("__y") == 0), 1)
                  .otherwise(0)).alias("fp"),
            F.sum(F.when((F.col("__s") < th) & (F.col("__y") == 0), 1)
                  .otherwise(0)).alias("tn"),
            F.sum(F.when((F.col("__s") < th) & (F.col("__y") == 1), 1)
                  .otherwise(0)).alias("fn"))
        npos, nneg = F.col("n_pos"), F.col("n") - F.col("n_pos")
        out = (tot.crossJoin(F.broadcast(rs2)).select(
            F.col("n").cast("long").alias("n"),
            npos.cast("long").alias("n_pos"),
            nneg.cast("long").alias("n_neg"),
            F.when((npos > 0) & (nneg > 0),
                   (F.col("__rs2") - npos * (npos + 1)).cast("double")
                   / (2 * npos * nneg).cast("double")).alias("auc"),
            F.round(F.col("__ll").cast("double") / F.col("n"), 6)
            .alias("logloss"),
            F.round(F.col("__br").cast("double") / F.col("n"), 6)
            .alias("brier"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.col("tn").cast("long").alias("tn"),
            F.col("fn").cast("long").alias("fn"),
            F.when(F.col("tp") + F.col("fp") > 0,
                   F.col("tp").cast("double")
                   / (F.col("tp") + F.col("fp")).cast("double"))
            .alias("precision"),
            F.when(npos > 0, F.col("tp").cast("double")
                   / npos.cast("double")).alias("recall"),
            F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                   (2 * F.col("tp")).cast("double")
                   / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
                   .cast("double")).alias("f1")))
        return pcoll.with_df(out)


class CohensKappa(PTransform):
    """Inter-rater agreement (Cohen's kappa) between two categorical
    label columns — the accept/reject statistic for LLM-judge or
    human-annotation pipelines (how much two labelers agree beyond
    chance). With N double-labeled rows, ``agree`` exact matches, and
    per-category marginal counts a_k / b_k:

        p_o   = agree / N
        p_e   = sum_k(a_k * b_k) / N^2
        kappa = (agree*N - sum_k a_k b_k) / (N^2 - sum_k a_k b_k)

    Every quantity is an exact integer until ONE double division, so
    all three statistics compare bit-exactly across engines (no
    float-accumulation rounding at all). kappa is NULL when p_e = 1
    (a single shared category — chance explains everything).

    Rows with NULL in either label are dropped (label what you can
    score). Scale: two category-keyed counts plus one global
    aggregate; the marginal join is category-cardinality (tiny) and
    broadcast; nothing grows with N beyond the scans.

    Output: one row — (n, agree, n_categories, p_o, p_e, kappa).
    """

    def __init__(self, col_a: str, col_b: str, label=None):
        super().__init__(label)
        self.col_a, self.col_b = col_a, col_b

    def expand(self, pcoll: PCollection) -> PCollection:
        a, b = F.col(self.col_a), F.col(self.col_b)
        base = (pcoll.df.where(a.isNotNull() & b.isNotNull())
                .select(a.alias("__a"), b.alias("__b")))
        tot = base.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("__a") == F.col("__b"), 1).otherwise(0))
            .cast("long").alias("agree"))
        ca = base.groupBy(F.col("__a").alias("cat")).agg(
            F.count(F.lit(1)).cast("long").alias("ca"))
        cb = base.groupBy(F.col("__b").alias("cat")).agg(
            F.count(F.lit(1)).cast("long").alias("cb"))
        pe = (ca.join(cb, "cat")
              .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")),
                              F.lit(0)).cast("long").alias("__s")))
        ncat = (ca.select("cat").unionAll(cb.select("cat")).distinct()
                .agg(F.count(F.lit(1)).cast("long")
                     .alias("n_categories")))
        nn = F.col("n") * F.col("n")
        out = (tot.crossJoin(F.broadcast(pe))
               .crossJoin(F.broadcast(ncat))
               .select(
                   "n", "agree", "n_categories",
                   (F.col("agree").cast("double")
                    / F.col("n").cast("double")).alias("p_o"),
                   (F.col("__s").cast("double")
                    / nn.cast("double")).alias("p_e"),
                   F.when(nn != F.col("__s"),
                          (F.col("agree") * F.col("n")
                           - F.col("__s")).cast("double")
                          / (nn - F.col("__s")).cast("double"))
                   .alias("kappa")))
        return pcoll.with_df(out)


class RankingMetrics(PTransform):
    """Per-query ranked-retrieval evaluation: DCG@k / IDCG@k / NDCG@k,
    MRR and precision@k — the offline gate for a retrieval or rerank
    stack (BM25, ANN, MMR) against graded relevance labels.

    The predicted order ranks on round-6 score descending with a
    doc-id tie-break (the ANN-suite determinism convention); the ideal
    order ranks on relevance descending with the same tie-break.
    DCG uses the standard exponential gain (2^rel - 1) / log2(rank+1);
    per-term doubles go through the exact-decimal-sum pattern
    (associative — partial-agg-order-immune), so dcg/idcg/ndcg are
    reproducible across engines; MRR (1 / first relevant predicted
    rank, 0.0 when nothing relevant) and precision@k are exact
    integers with one division. AP@k (the MAP numerator) is the mean
    over relevant hits in the top k of precision@hit-rank —
    cumulative-relevant counts are exact integers, each precision one
    division, the sum decimal-exact, normalized by min(n_rel, k).

    Scale: two window ranks over (query)-partitioned frames plus one
    groupBy(query) aggregation — all partial-agg, one shuffle each on
    the query key; output is one row per query.

    Output: (query_col, n_docs, dcg, idcg, ndcg, mrr,
    precision_at_k, ap) — ndcg and ap NULL when the query has no
    relevant docs. Rows with NULL score or relevance are dropped.
    """

    def __init__(self, k: int = 10, query_col: str = "query_id",
                 doc_col: str = "doc_id", score_col: str = "score",
                 rel_col: str = "rel", label=None):
        super().__init__(label)
        if int(k) < 1:
            raise ValueError(f"k {k}: need >= 1")
        self.k = int(k)
        self.query_col, self.doc_col = query_col, doc_col
        self.score_col, self.rel_col = score_col, rel_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        qc, dc = self.query_col, self.doc_col
        sc, rc, k = self.score_col, self.rel_col, self.k
        base = pcoll.df.where(
            F.col(sc).isNotNull() & F.col(rc).isNotNull()).select(
            qc, dc,
            F.round(F.col(sc).cast("double"), 6).alias("__s"),
            F.col(rc).cast("double").alias("__r"))
        wp = Window.partitionBy(qc).orderBy(F.col("__s").desc(),
                                            F.col(dc))
        wi = Window.partitionBy(qc).orderBy(F.col("__r").desc(),
                                            F.col(dc))
        wc = wp.rowsBetween(Window.unboundedPreceding, 0)
        rel = F.when(F.col("__r") > 0, 1).otherwise(0)
        ranked = (base
                  .withColumn("__pr", F.row_number().over(wp))
                  .withColumn("__ir", F.row_number().over(wi))
                  .withColumn("__cum", F.sum(rel).over(wc)))
        gain = F.pow(F.lit(2.0), F.col("__r")) - F.lit(1.0)
        dterm = F.when(F.col("__pr") <= k,
                       gain / F.log2(F.col("__pr") + 1)) \
                 .otherwise(F.lit(0.0))
        iterm = F.when(F.col("__ir") <= k,
                       gain / F.log2(F.col("__ir") + 1)) \
                 .otherwise(F.lit(0.0))
        agg = (ranked.groupBy(qc).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dterm.cast("decimal(28,12)")).alias("__dcg"),
            F.sum(iterm.cast("decimal(28,12)")).alias("__idcg"),
            F.min(F.when(F.col("__r") > 0, F.col("__pr")))
            .alias("__frel"),
            F.sum(F.when((F.col("__r") > 0) & (F.col("__pr") <= k), 1)
                  .otherwise(0)).cast("long").alias("__hits"),
            F.sum(F.when((F.col("__r") > 0) & (F.col("__pr") <= k),
                         (F.col("__cum").cast("double")
                          / F.col("__pr").cast("double"))
                         .cast("decimal(28,12)"))
                  .otherwise(F.lit(0).cast("decimal(28,12)")))
            .alias("__apsum"),
            F.sum(F.when(F.col("__r") > 0, 1).otherwise(0))
            .cast("long").alias("__nrel")))
        out = agg.select(
            qc, "n_docs",
            F.round(F.col("__dcg").cast("double"), 6).alias("dcg"),
            F.round(F.col("__idcg").cast("double"), 6).alias("idcg"),
            F.when(F.col("__idcg") > 0,
                   F.round(F.col("__dcg").cast("double")
                           / F.col("__idcg").cast("double"), 6))
            .alias("ndcg"),
            F.coalesce(F.lit(1.0) / F.col("__frel").cast("double"),
                       F.lit(0.0)).alias("mrr"),
            (F.col("__hits").cast("double")
             / F.lit(float(k))).alias("precision_at_k"),
            F.when(F.col("__nrel") > 0,
                   F.round(F.col("__apsum").cast("double")
                           / F.least(F.col("__nrel"), F.lit(k))
                           .cast("double"), 6)).alias("ap"))
        return pcoll.with_df(out)


class FleissKappa(PTransform):
    """Multi-rater chance-corrected agreement (Fleiss 1971): each input
    row is one rating (item, category); every item must carry exactly
    ``n_ratings`` ratings — items with any other count are dropped
    (rate-complete items only; mirror the filter upstream if you need
    to know which). The LLM-labeling use case: k judge models each
    label the same corpus sample, how far beyond chance do they agree?

    With N complete items, n = n_ratings, n_ij the item x category
    counts, c_j the category totals, S2 = sum n_ij^2, T = sum c_j^2,
    M = (N*n)^2 and D1 = N*n*(n-1):

        P_bar  = (S2 - N*n) / D1
        P_e    = T / M
        kappa  = (M*(S2 - N*n) - D1*T) / (D1 * (M - T))

    — every operand an exact integer, each statistic ONE double
    division, so all three compare bit-exactly across engines. kappa
    is NULL when chance explains everything (T = M: a single used
    category) or n_ratings = 1 (D1 = 0). Integer magnitudes: exact
    while N*n < ~3e9 ((N*n)^2 must fit a BIGINT) — beyond that,
    aggregate per stratum and average.

    Scale: one (item, category) count, two tiny reaggregations
    (item-cardinality and category-cardinality), 1-row report.

    Output: (n_items, n_ratings, n_categories, p_bar, p_e, kappa).
    """

    def __init__(self, item_col: str, label_col: str, n_ratings: int,
                 label=None):
        super().__init__(label)
        if int(n_ratings) < 1:
            raise ValueError(f"n_ratings {n_ratings}: need >= 1")
        self.item_col, self.label_col = item_col, label_col
        self.n_ratings = int(n_ratings)

    def expand(self, pcoll: PCollection) -> PCollection:
        it, lc, n = self.item_col, self.label_col, self.n_ratings
        base = (pcoll.df
                .where(F.col(it).isNotNull() & F.col(lc).isNotNull())
                .select(F.col(it).alias("__i"), F.col(lc).alias("__l")))
        complete = (base.groupBy("__i")
                    .agg(F.count(F.lit(1)).alias("__cnt"))
                    .where(F.col("__cnt") == n).select("__i"))
        bb = base.join(complete, "__i", "left_semi")
        nij = bb.groupBy("__i", "__l").agg(
            F.count(F.lit(1)).cast("long").alias("c"))
        s2 = nij.agg(
            F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0))
            .cast("long").alias("__s2"),
            F.count_distinct(F.col("__i")).cast("long")
            .alias("n_items"))
        cj = nij.groupBy("__l").agg(F.sum("c").cast("long").alias("cj"))
        tt = cj.agg(
            F.coalesce(F.sum(F.col("cj") * F.col("cj")), F.lit(0))
            .cast("long").alias("__t"),
            F.count(F.lit(1)).cast("long").alias("n_categories"))
        Nn = F.col("n_items") * n
        M = Nn * Nn
        D1 = F.col("n_items") * n * (n - 1)
        out = (s2.crossJoin(F.broadcast(tt)).select(
            "n_items", F.lit(n).cast("long").alias("n_ratings"),
            "n_categories",
            F.when(D1 > 0, (F.col("__s2") - Nn).cast("double")
                   / D1.cast("double")).alias("p_bar"),
            F.when(M > 0, F.col("__t").cast("double")
                   / M.cast("double")).alias("p_e"),
            F.when((D1 > 0) & (M != F.col("__t")),
                   (M * (F.col("__s2") - Nn)
                    - D1 * F.col("__t")).cast("double")
                   / (D1 * (M - F.col("__t"))).cast("double"))
            .alias("kappa")))
        return pcoll.with_df(out)


class SkewProfile(PTransform):
    """Key-distribution diagnostics for a prospective join/groupBy key
    — the pre-flight check that decides whether a 100 TB shuffle needs
    salting or AQE skew handling BEFORE it runs. One row:

      n_rows, n_keys, max_key_n   exact counts
      top1_share / topk_share     heaviest-key / top-``top_k`` mass
      skew_ratio                  max key count / mean key count
      gini                        Gini coefficient of key counts
      cv                          coefficient of variation of counts

    Everything is computed from exact integers: with counts c_i sorted
    ascending (count, then key-string tie-break), rank i = 1..K,

        gini = (2*sum(i*c_i) - (K+1)*n) / (K*n)
        cv   = sqrt(K*sum(c^2) - n^2) / n      (population std / mean)

    — each statistic ONE double division (cv one sqrt of an exact
    integer expression), so all compare bit-exactly across engines.
    Reading: gini ~0 / skew_ratio ~1 = uniform; top1_share near 1 or
    skew_ratio >> 10 = salt this key.

    Scale: one groupBy(key) count (partial agg), then windows over
    the DISTINCT-KEY frame (cardinality-bounded, the AUC-cumsum
    posture) and a 1-row report. NULL key components participate as
    the string 'NULL' bucket (NULLs hash together in a real shuffle —
    that is exactly the hot key you want to see).

    Output: (n_rows, n_keys, max_key_n, top1_share, topk_share,
    skew_ratio, gini, cv).
    """

    def __init__(self, keys, top_k: int = 10, label=None):
        super().__init__(label)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        if int(top_k) < 1:
            raise ValueError(f"top_k {top_k}: need >= 1")
        self.top_k = int(top_k)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        k = self.top_k
        keyexpr = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
                      for c in self.keys])
        counts = (pcoll.df.select(keyexpr.alias("__k"))
                  .groupBy("__k")
                  .agg(F.count(F.lit(1)).cast("long").alias("c")))
        wa = Window.orderBy(F.col("c").asc(), F.col("__k"))
        wd = Window.orderBy(F.col("c").desc(), F.col("__k"))
        ranked = (counts
                  .withColumn("__ra", F.row_number().over(wa))
                  .withColumn("__rd", F.row_number().over(wd)))
        agg = ranked.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_key_n"),
            F.sum(F.col("__ra") * F.col("c")).cast("long").alias("__ic"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("__c2"),
            F.sum(F.when(F.col("__rd") <= k, F.col("c")).otherwise(0))
            .cast("long").alias("__topk"))
        n, K = F.col("n_rows"), F.col("n_keys")
        out = agg.select(
            "n_rows", "n_keys", "max_key_n",
            (F.col("max_key_n").cast("double") / n.cast("double"))
            .alias("top1_share"),
            (F.col("__topk").cast("double") / n.cast("double"))
            .alias("topk_share"),
            ((F.col("max_key_n") * K).cast("double") / n.cast("double"))
            .alias("skew_ratio"),
            ((2 * F.col("__ic") - (K + 1) * n).cast("double")
             / (K * n).cast("double")).alias("gini"),
            (F.sqrt((K * F.col("__c2") - n * n).cast("double"))
             / n.cast("double")).alias("cv"))
        return pcoll.with_df(out)


class GroupFairnessMetrics(PTransform):
    """Per-group classifier fairness report — demographic-parity and
    equalized-odds inputs for auditing a quality/toxicity filter
    before it prunes a corpus: does the threshold remove one slice
    (language, source) disproportionately?

    Per group g at ``threshold``: exact confusion counts, then
        tpr = tp / n_pos          (recall within the group)
        fpr = fp / n_neg
        ppr = (tp + fp) / n       (predicted-positive rate)
    and each rate's RATIO to the all-data rate (tpr_ratio etc. — the
    "80% rule" reads ppr_ratio < 0.8 as disparate impact). Rates are
    single divisions of exact integers; ratios one further division
    of those identical doubles — bit-exact cross-engine. NULL where a
    denominator class is empty.

    Scale: one groupBy(group) aggregation + a broadcast 1-row global;
    output is group-cardinality rows.

    Output: (group, n, n_pos, tp, fp, tn, fn, tpr, fpr, ppr,
    tpr_ratio, fpr_ratio, ppr_ratio).
    """

    def __init__(self, score_col: str, label_col: str, group_col: str,
                 threshold: float = 0.5, label=None):
        super().__init__(label)
        self.score_col, self.label_col = score_col, label_col
        self.group_col, self.threshold = group_col, float(threshold)

    def expand(self, pcoll: PCollection) -> PCollection:
        s = F.col(self.score_col).cast("double")
        y = F.col(self.label_col).cast("long")
        th = self.threshold
        base = (pcoll.df
                .where(s.isNotNull() & y.isNotNull()
                       & F.col(self.group_col).isNotNull())
                .select(F.col(self.group_col).alias("group"),
                        s.alias("__s"), y.alias("__y")))

        def conf(df, grouped):
            g = df.groupBy("group") if grouped else df.groupBy()
            return g.agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("__y").cast("long").alias("n_pos"),
                F.sum(F.when((F.col("__s") >= th) & (F.col("__y") == 1),
                             1).otherwise(0)).cast("long").alias("tp"),
                F.sum(F.when((F.col("__s") >= th) & (F.col("__y") == 0),
                             1).otherwise(0)).cast("long").alias("fp"),
                F.sum(F.when((F.col("__s") < th) & (F.col("__y") == 0),
                             1).otherwise(0)).cast("long").alias("tn"),
                F.sum(F.when((F.col("__s") < th) & (F.col("__y") == 1),
                             1).otherwise(0)).cast("long").alias("fn"))

        def rates(prefix=""):
            npos, nneg = F.col("n_pos"), F.col("n") - F.col("n_pos")
            return [
                F.when(npos > 0, F.col("tp").cast("double")
                       / npos.cast("double")).alias(f"{prefix}tpr"),
                F.when(nneg > 0, F.col("fp").cast("double")
                       / nneg.cast("double")).alias(f"{prefix}fpr"),
                (((F.col("tp") + F.col("fp")).cast("double"))
                 / F.col("n").cast("double")).alias(f"{prefix}ppr"),
            ]

        per = conf(base, True).select("group", "n", "n_pos", "tp",
                                      "fp", "tn", "fn", *rates())
        glob = conf(base, False).select(*rates("g_"))
        out = per.crossJoin(F.broadcast(glob)).select(
            "group", "n", "n_pos", "tp", "fp", "tn", "fn",
            "tpr", "fpr", "ppr",
            F.when(F.col("g_tpr") > 0, F.col("tpr") / F.col("g_tpr"))
            .alias("tpr_ratio"),
            F.when(F.col("g_fpr") > 0, F.col("fpr") / F.col("g_fpr"))
            .alias("fpr_ratio"),
            F.when(F.col("g_ppr") > 0, F.col("ppr") / F.col("g_ppr"))
            .alias("ppr_ratio"))
        return pcoll.with_df(out)


class CalibrationReport(PTransform):
    """Reliability diagram + expected calibration error (ECE) for a
    probabilistic classifier: scores bucket into ``n_bins`` equal-width
    bins over [0, 1]; each bin reports its mean predicted confidence
    against its empirical positive rate, and

        ECE = sum_b (n_b / N) * |frac_pos_b - mean_conf_b|

    The decision input for "can I trust this filter's probabilities
    as sampling weights" (vs needing a recalibration pass).

    Determinism: bin = clamp(floor(s * n_bins), 0, n_bins - 1)
    (identical float multiply + floor in both engines; out-of-[0,1]
    scores clamp into the edge bins); mean_conf goes through
    the exact decimal sum and rounds 6; frac_pos is an exact single
    division; the gap and ECE terms then run on identical doubles,
    ECE summing over <= n_bins values (rounded 6).

    Scale: one groupBy(bin) aggregation (partial agg); the ECE is a
    window sum over the BINS frame (constant size). Empty bins are
    simply absent (they contribute 0 to ECE either way).

    Output: one row per non-empty bin — (bin, n, mean_conf, frac_pos,
    abs_gap, ece) with ece repeated on every row.
    """

    def __init__(self, score_col: str, label_col: str,
                 n_bins: int = 10, label=None):
        super().__init__(label)
        if int(n_bins) < 1:
            raise ValueError(f"n_bins {n_bins}: need >= 1")
        self.score_col, self.label_col = score_col, label_col
        self.n_bins = int(n_bins)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        b = self.n_bins
        s = F.col(self.score_col).cast("double")
        y = F.col(self.label_col).cast("long")
        base = (pcoll.df.where(s.isNotNull() & y.isNotNull())
                .select(F.greatest(
                    F.least(F.floor(s * b), F.lit(b - 1)),
                    F.lit(0)).cast("int").alias("bin"),
                        s.alias("__s"), y.alias("__y")))
        per = base.groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum(F.col("__s").cast("decimal(28,12)"))
                    .cast("double") / F.count(F.lit(1)), 6)
            .alias("mean_conf"),
            (F.sum("__y").cast("double")
             / F.count(F.lit(1)).cast("double")).alias("frac_pos"))
        gap = F.abs(F.col("frac_pos") - F.col("mean_conf"))
        w = Window.partitionBy()
        out = (per.withColumn("abs_gap", gap)
               .withColumn("ece", F.round(
                   F.sum(F.col("n").cast("double") * gap).over(w)
                   / F.sum(F.col("n").cast("double")).over(w), 6)))
        return pcoll.with_df(out.select("bin", "n", "mean_conf",
                                        "frac_pos", "abs_gap", "ece"))


class IsotonicCalibration(PTransform):
    """Isotonic-regression calibration map (pool-adjacent-violators,
    Barlow et al. 1972 / Zadrozny & Elkan KDD'02) for a probabilistic
    classifier — the non-parametric recalibration pass CalibrationReport
    motivates: fit the monotone-non-decreasing step function mapping
    raw score -> P(y=1) that minimizes squared error.

    Plan shape: ONE groupBy(score) aggregation reduces the input to the
    distinct-score reliability frame (cardinality-bounded — raw scores
    from a real model are quantized by the feature space; cap checked
    via ``max_distinct``), then PAVA runs per key group in
    applyInPandas over that frame, NOT over the raw rows. The merge
    loop is integer-exact: blocks pool on a cross-multiplied violation
    test (pos_a * n_b > pos_b * n_a — no float compare), and the
    calibrated value is ONE division of exact integer sums, so the
    output is bit-reproducible across engines and partial-agg orders.

    Monotone-ties note: equal adjacent means are NOT pooled (strict
    violation test) — fitted values are identical either way and block
    boundaries stay deterministic.

    Oracle (used by q_isotonic_calibration): the minimax
    characterization fitted[k] = max_{i<=k} min_{j>=k} mean(y[i..j]).
    Correctly-rounded division makes equal rationals equal doubles, so
    the SQL replay is bit-equal to PAVA's pooled block value.

    Scale: the applyInPandas frame has one row per (keys, distinct
    score) — the groupBy crushes N rows to that frame map-side; PAVA
    itself is O(m) per key. ``max_distinct`` fails fast when a
    continuous un-quantized score column would make the per-key frame
    unbounded (round the score upstream instead).

    Output: (keys..., score, n, n_pos, calibrated) — the step
    function's knots; join-apply it to new scores with a range lookup.
    """

    def __init__(self, score_col: str, label_col: str,
                 keys=(), max_distinct: int = 100_000, label=None):
        super().__init__(label)
        self.score_col, self.label_col = score_col, label_col
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.max_distinct = int(max_distinct)

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        ks = self.keys
        s = F.col(self.score_col).cast("double")
        y = F.col(self.label_col).cast("long")
        agg = (pcoll.df.where(s.isNotNull() & y.isNotNull())
               .groupBy(*ks, s.alias("score"))
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum(y).cast("long").alias("n_pos")))
        md = self.max_distinct
        key_fields = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in agg.schema.fields if f.name in ks)
        schema = ((key_fields + ", ") if key_fields else "") + \
            "score double, n bigint, n_pos bigint, calibrated double"

        def fit(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) > md:
                raise ValueError(
                    f"IsotonicCalibration: {len(pdf)} distinct scores "
                    f"in one group exceeds max_distinct={md} — round "
                    "the score upstream or raise the cap deliberately")
            pdf = pdf.sort_values("score", kind="mergesort")
            blocks: list[list[int]] = []   # [pos_sum, n_sum, rows]
            for pos, n in zip(pdf["n_pos"].astype(int),
                              pdf["n"].astype(int)):
                blocks.append([int(pos), int(n), 1])
                while (len(blocks) >= 2
                       and blocks[-2][0] * blocks[-1][1]
                       > blocks[-1][0] * blocks[-2][1]):
                    b = blocks.pop()
                    blocks[-1][0] += b[0]
                    blocks[-1][1] += b[1]
                    blocks[-1][2] += b[2]
            fitted = []
            for pos, n, rows in blocks:
                fitted.extend([pos / n] * rows)
            out = pdf.copy()
            out["calibrated"] = fitted
            return out

        if ks:
            out = agg.groupBy(*ks).applyInPandas(fit, schema)
        else:
            out = agg.groupBy().applyInPandas(fit, schema)
        return pcoll.with_df(out)


class RboOverlap(PTransform):
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    per-query rankings of the same documents — the A/B statistic for
    retrieval-stack changes ("how much did the reranker actually move
    the top?"), top-weighted unlike Kendall's tau:

        RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |L_d intersect R_d| / d

    Both rankings are derived from the two score columns with the
    repo's determinism convention (round-6 score desc, doc-id
    tie-break). A doc pair enters every depth d >= max(l_rank,
    r_rank), so the overlap series is one sequence-explode +
    count, no per-depth scan. With the binary-exact default p = 0.5,
    p^(d-1) is dyadic, |overlap|/d is a single division of exact
    integers, the depth sum goes through the exact decimal pattern,
    and RBO rounds 6.

    Scale: two query-partitioned window ranks, one bounded explode
    (<= k rows per matched doc), one (query, depth) count, one
    groupBy(query) — all partial-agg; queries with zero overlap
    report rbo = 0 via a left join from the distinct-query frame.

    Output: (query_col, overlap_at_k, rbo, rbo_ext) — rbo_ext is
    Webber's point extrapolation RBO@k + (A_k / k) * p^k (assumes the
    depth-k agreement persists), an upper-anchor next to the
    truncated rbo.
    """

    def __init__(self, k: int = 10, p: float = 0.5,
                 query_col: str = "query_id", doc_col: str = "doc_id",
                 left_score: str = "score_left",
                 right_score: str = "score_right", label=None):
        super().__init__(label)
        if int(k) < 1:
            raise ValueError(f"k {k}: need >= 1")
        if not 0.0 < float(p) < 1.0:
            raise ValueError(f"p {p} outside (0, 1)")
        self.k, self.p = int(k), float(p)
        self.query_col, self.doc_col = query_col, doc_col
        self.left_score, self.right_score = left_score, right_score

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        qc, dc, k, p = self.query_col, self.doc_col, self.k, self.p
        base = pcoll.df.where(
            F.col(self.left_score).isNotNull()
            & F.col(self.right_score).isNotNull()).select(
            qc, dc,
            F.round(F.col(self.left_score).cast("double"), 6)
            .alias("__sl"),
            F.round(F.col(self.right_score).cast("double"), 6)
            .alias("__sr"))
        wl = Window.partitionBy(qc).orderBy(F.col("__sl").desc(),
                                            F.col(dc))
        wr = Window.partitionBy(qc).orderBy(F.col("__sr").desc(),
                                            F.col(dc))
        ranked = (base
                  .withColumn("__lr", F.row_number().over(wl))
                  .withColumn("__rr", F.row_number().over(wr))
                  .withColumn("__m", F.greatest("__lr", "__rr"))
                  .where(F.col("__m") <= k))
        depths = (ranked
                  .select(qc, F.explode(
                      F.sequence(F.col("__m"), F.lit(k))).alias("__d"))
                  .groupBy(qc, "__d")
                  .agg(F.count(F.lit(1)).cast("long").alias("__a")))
        term = (F.pow(F.lit(p), F.col("__d") - 1)
                * (F.col("__a").cast("double")
                   / F.col("__d").cast("double")))
        ssum = F.sum(term.cast("decimal(28,12)")).cast("double")
        ak = F.max(F.when(F.col("__d") == k, F.col("__a")))
        per = depths.groupBy(qc).agg(
            F.round(F.lit(1.0 - p) * ssum, 6).alias("rbo"),
            F.round(F.lit(1.0 - p) * ssum
                    + (ak.cast("double") / F.lit(float(k)))
                    * F.lit(float(p) ** k), 6).alias("rbo_ext"),
            ak.cast("long").alias("overlap_at_k"))
        qs = base.select(qc).distinct()
        out = (qs.join(per, qc, "left")
               .select(qc,
                       F.coalesce("overlap_at_k", F.lit(0))
                       .cast("long").alias("overlap_at_k"),
                       F.coalesce("rbo", F.lit(0.0)).alias("rbo"),
                       F.coalesce("rbo_ext", F.lit(0.0))
                       .alias("rbo_ext")))
        return pcoll.with_df(out)


class CategoryEntropy(PTransform):
    """Shannon entropy of a categorical column's distribution, per key
    (or globally with ``keys=None``) — the mixture-diversity statistic
    a corpus pipeline tracks per shard/source/user ("did this slice
    collapse to one category?"):

        H = -sum_i (c_i/n) * log2(c_i/n)        [bits]
        entropy_norm = H / log2(n_categories)   [0..1, NULL when k=1]

    Counts and the c/n ratios are exact; each per-category term goes
    through the exact-decimal-sum pattern (round-12 terms, associative
    sum), H and the normalized form round 6.

    Scale: one (keys, category) count + one keys reaggregation — two
    partial-agg shuffles, report one row per key.

    Output: keys + (n, n_categories, entropy, entropy_norm).
    """

    def __init__(self, col: str, keys=None, label=None):
        super().__init__(label)
        self.col = col
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        c, ks = self.col, self.keys
        base = pcoll.df.where(F.col(c).isNotNull())
        cnt = (base.groupBy(*ks, c)
               .agg(F.count(F.lit(1)).cast("long").alias("__c")))
        w = (Window.partitionBy(*ks) if ks
             else Window.partitionBy())
        cnt = cnt.withColumn("__n", F.sum("__c").over(w))
        p = F.col("__c").cast("double") / F.col("__n").cast("double")
        term = (-(p * F.log2(p))).cast("decimal(28,12)")
        agg = (cnt.groupBy(*ks).agg(
            F.max("__n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_categories"),
            F.sum(term).alias("__h")))
        h = F.col("__h").cast("double")
        out = agg.select(
            *ks, "n", "n_categories",
            F.round(h, 6).alias("entropy"),
            F.when(F.col("n_categories") >= 2,
                   F.round(h / F.log2(F.col("n_categories")
                                      .cast("double")), 6))
            .alias("entropy_norm"))
        return pcoll.with_df(out)


class MutualInformationRank(PTransform):
    """Per-feature mutual information with a label column, in bits —
    the one-pass feature-selection screen (sklearn's
    mutual_info_classif for the discrete case): which metadata
    columns carry signal about the label, ranked. ColumnDependence
    reports ONE pair in depth; this scores MANY features in a single
    melt pass:

        melt (stack) -> ONE (feature, x, y) joint count ->
        per-feature H(X), H(Y), H(X,Y) from exact counts
        MI = H(X) + H(Y) - H(X,Y)

    Rows where the label is NULL are dropped; a NULL feature value
    within a kept row is dropped for THAT feature only (features are
    scored on their own non-NULL support — n is per-feature).
    Entropy terms quantize to decimal(28,12) before the sum (the
    ColumnDependence convention) so partial-agg order can't drift.

    Scale: the shuffled state is (feature x categories) joint
    counts — the melt multiplies rows by |features| but feeds a
    map-side partial agg, never a row-level shuffle.

    Output: (feature, n, h_feature, h_label, mi) — entropies and mi
    round 9, one row per feature.
    """

    def __init__(self, features, label_col: str, label=None):
        super().__init__(label)
        self.features = ([features] if isinstance(features, str)
                         else list(features))
        if not self.features:
            raise ValueError("need at least one feature column")
        self.label_col = label_col

    def expand(self, pcoll: PCollection) -> PCollection:
        fs, yc = self.features, self.label_col
        stack_args = ", ".join(
            f"'{f}', CAST(`{f.replace(chr(96), chr(96) * 2)}` "
            f"AS STRING)" for f in fs)
        melt = (pcoll.df.where(F.col(yc).isNotNull())
                .selectExpr(
                    f"stack({len(fs)}, {stack_args}) "
                    "AS (feature, __x)",
                    f"CAST(`{yc}` AS STRING) AS __y")
                .where(F.col("__x").isNotNull()))
        # the joint-count frame (feature x categories — summary-sized)
        # feeds the total, all three entropy reaggregations and the
        # final join; unmaterialized, the melt+count pipeline is
        # planned and executed once per reference (~7 copies). One
        # eager localCheckpoint keeps the plan linear; every
        # downstream sum is an exact integer or decimal(28,12).
        joint = (melt.groupBy("feature", "__x", "__y").agg(
            F.count(F.lit(1)).cast("long").alias("c"))
            .localCheckpoint(eager=True))
        tot = joint.groupBy("feature").agg(
            F.sum("c").cast("long").alias("n"))

        def ent(keys, alias):
            cnt = joint.groupBy("feature", *keys).agg(
                F.sum("c").cast("long").alias("cc"))
            p = (F.col("cc").cast("double")
                 / F.col("n").cast("double"))
            term = (-(p * F.log2(p))).cast("decimal(28,12)")
            return (cnt.join(tot, "feature")
                    .groupBy("feature")
                    .agg(F.sum(term).cast("double").alias(alias)))

        hx = ent(["__x"], "__hx")
        hy = ent(["__y"], "__hy")
        hxy = ent(["__x", "__y"], "__hxy")
        out = (tot.join(hx, "feature").join(hy, "feature")
               .join(hxy, "feature")
               .select("feature", "n",
                       F.round("__hx", 9).alias("h_feature"),
                       F.round("__hy", 9).alias("h_label"),
                       F.round(F.col("__hx") + F.col("__hy")
                               - F.col("__hxy"), 9).alias("mi")))
        return pcoll.with_df(out)


class ColumnDependence(PTransform):
    """Dependence report between two categorical columns — mutual
    information and Theil's uncertainty coefficients, the leakage /
    redundancy check a feature or metadata pipeline runs ("does
    source already determine lang?"):

        H(X), H(Y), H(X,Y)  from exact counts (decimal term sums)
        MI  = H(X) + H(Y) - H(X,Y)            [bits]
        U(X|Y) = MI / H(X),  U(Y|X) = MI / H(Y)   [0..1]
        chi2 = sum_cells (o - e)^2 / e,  e = c_x*c_y/n
             (zero cells contribute e: computed as the observed-cell
              sum plus n - sum_obs e — no dense cell expansion)
        cramers_v = sqrt(chi2 / (n * (min(kx, ky) - 1)))

    U = 1 means the other column fully determines this one; NULL when
    the column is constant (H = 0, exact >= 2-distinct guard). Rows
    with NULL in either column are dropped.

    Scale: ONE (x, y) joint count (partial agg); marginals reaggregate
    from the joint frame (category-cardinality), report is 1 row.

    Output: (n, nx, ny, h_x, h_y, h_xy, mi, u_x_given_y,
    u_y_given_x, chi2, cramers_v) — cramers_v NULL when either column
    is constant.
    """

    def __init__(self, col_x: str, col_y: str, label=None):
        super().__init__(label)
        self.col_x, self.col_y = col_x, col_y

    def expand(self, pcoll: PCollection) -> PCollection:
        x, y = F.col(self.col_x), F.col(self.col_y)
        base = (pcoll.df.where(x.isNotNull() & y.isNotNull())
                .select(x.alias("__x"), y.alias("__y")))
        # the joint-count frame (category-cardinality) feeds all
        # three entropy reaggregations and the chi2 marginal windows;
        # unmaterialized, the row-level count pipeline replays per
        # reference (~40-Exchange plan). One eager localCheckpoint
        # keeps it linear; downstream sums are integers/decimals.
        joint = (base.groupBy("__x", "__y").agg(
            F.count(F.lit(1)).cast("long").alias("c"))
            .localCheckpoint(eager=True))

        def ent(df, keys, alias):
            cnt = df.groupBy(*keys).agg(F.sum("c").cast("long")
                                        .alias("cc"))
            tot = cnt.agg(F.sum("cc").cast("long").alias("n"),
                          F.count(F.lit(1)).cast("long")
                          .alias(f"k_{alias}"))
            p = F.col("cc").cast("double") / F.col("n").cast("double")
            term = (-(p * F.log2(p))).cast("decimal(28,12)")
            return (cnt.crossJoin(F.broadcast(tot))
                    .agg(F.max("n").cast("long").alias(f"n_{alias}"),
                         F.max(f"k_{alias}").cast("long")
                         .alias(f"k_{alias}"),
                         F.sum(term).cast("double").alias(alias)))

        hx = ent(joint, ["__x"], "h_x")
        hy = ent(joint, ["__y"], "h_y")
        hxy = ent(joint, ["__x", "__y"], "h_xy")
        from pyspark.sql import Window

        wx = Window.partitionBy("__x")
        wy = Window.partitionBy("__y")
        wall = Window.partitionBy()
        marg = (joint
                .withColumn("__cx", F.sum("c").over(wx))
                .withColumn("__cy", F.sum("c").over(wy))
                .withColumn("__n", F.sum("c").over(wall)))
        e = (F.col("__cx").cast("double") * F.col("__cy").cast("double")
             / F.col("__n").cast("double"))
        o = F.col("c").cast("double")
        chi = marg.agg(
            F.sum(((o - e) * (o - e) / e).cast("decimal(28,12)"))
            .cast("double").alias("__obs"),
            F.sum(e.cast("decimal(28,12)")).cast("double")
            .alias("__esum"),
            F.max("__n").cast("double").alias("__nn"))
        chi2 = (F.col("__obs")
                + (F.col("__nn") - F.col("__esum")))
        mi = F.col("h_x") + F.col("h_y") - F.col("h_xy")
        kmin = F.least(F.col("k_h_x"), F.col("k_h_y"))
        out = (hx.crossJoin(F.broadcast(hy))
               .crossJoin(F.broadcast(hxy))
               .crossJoin(F.broadcast(chi))
               .select(
                   F.col("n_h_x").alias("n"),
                   F.col("k_h_x").alias("nx"),
                   F.col("k_h_y").alias("ny"),
                   F.round("h_x", 6).alias("h_x"),
                   F.round("h_y", 6).alias("h_y"),
                   F.round("h_xy", 6).alias("h_xy"),
                   F.round(mi, 6).alias("mi"),
                   F.when(F.col("k_h_x") >= 2,
                          F.round(mi / F.col("h_x"), 6))
                   .alias("u_x_given_y"),
                   F.when(F.col("k_h_y") >= 2,
                          F.round(mi / F.col("h_y"), 6))
                   .alias("u_y_given_x"),
                   F.round(chi2, 6).alias("chi2"),
                   F.when(kmin >= 2,
                          F.round(F.sqrt(
                              chi2 / (F.col("__nn")
                                      * (kmin - 1).cast("double"))),
                              6)).alias("cramers_v")))
        return pcoll.with_df(out)


class KAnonymity(PTransform):
    """Privacy-risk report for a release candidate: k-anonymity and
    distinct l-diversity over a set of quasi-identifier columns
    (Sweeney 2002; Machanavajjhala et al. 2007) — the re-identification
    audit a training-data pipeline runs before shipping a slice that
    carries user attributes.

    Every row's equivalence class is its exact quasi-identifier value
    combination (NULLs group together, the standard audit posture).

    ``mode='groups'``: one row per equivalence class —
        quasi cols + (class_size, distinct_sensitive*, meets_k)
    ``mode='report'``: one global row —
        (n_rows, n_classes, k_anonymity, classes_below_k,
         rows_below_k, pct_rows_below_k, l_diversity*)
    (*sensitive columns only when ``sensitive`` is given; l-diversity
    is the min over classes of the count of distinct non-NULL
    sensitive values).

    Scale: one partial-agg groupBy on the quasi columns, then (report
    mode) one 1-row reaggregation — no joins, no windows; class count
    is bounded by the quasi-identifier domain, not by n.

    Output floats: pct_rows_below_k is an exact-integer ratio cast to
    double (order-free), round 9.
    """

    def __init__(self, quasi, sensitive: str | None = None,
                 k: int = 5, mode: str = "report", label=None):
        super().__init__(label)
        self.quasi = [quasi] if isinstance(quasi, str) else list(quasi)
        if not self.quasi:
            raise ValueError("KAnonymity: need >= 1 quasi column")
        self.sensitive = sensitive
        self.k = int(k)
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if mode not in ("report", "groups"):
            raise ValueError("mode must be 'report' or 'groups'")
        self.mode = mode

    def expand(self, pcoll: PCollection) -> PCollection:
        qs, s, k = self.quasi, self.sensitive, self.k
        aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
        if s is not None:
            aggs.append(F.countDistinct(F.col(s)).cast("long")
                        .alias("distinct_sensitive"))
        classes = pcoll.df.groupBy(*qs).agg(*aggs)
        if self.mode == "groups":
            out = classes.withColumn(
                "meets_k", F.col("class_size") >= F.lit(k))
            return pcoll.with_df(out)
        below = F.when(F.col("class_size") < k, F.col("class_size"))
        aggs2 = [
            F.sum("class_size").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("class_size").cast("long").alias("k_anonymity"),
            F.count(below).cast("long").alias("classes_below_k"),
            F.coalesce(F.sum(below), F.lit(0)).cast("long")
            .alias("rows_below_k"),
        ]
        if s is not None:
            aggs2.append(F.min("distinct_sensitive").cast("long")
                         .alias("l_diversity"))
        rep = (classes.agg(*aggs2)
               .withColumn("k_threshold", F.lit(k).cast("int"))
               .withColumn(
                   "pct_rows_below_k",
                   F.round(F.col("rows_below_k").cast("double")
                           / F.col("n_rows").cast("double"), 9)))
        cols = ["k_threshold", "n_rows", "n_classes", "k_anonymity",
                "classes_below_k", "rows_below_k", "pct_rows_below_k"]
        if s is not None:
            cols.append("l_diversity")
        return pcoll.with_df(rep.select(*cols))


class MannWhitneyU(PTransform):
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test per key —
    the nonparametric A/B location test a metrics pipeline runs when
    values are skewed or heavy-tailed (latency, spend, token counts)
    and a t-test's normality assumption is indefensible.

    Integer-exact construction over the DISTINCT-VALUE frame (the
    BinaryClassifierMetrics midrank trick): with t(v) total ties at
    value v and cum(v) the count of strictly smaller values, doubled
    midrank r2(v) = 2*cum(v) + t(v) + 1 is an exact integer, so

        2*Ra = sum_v ca(v) * r2(v)        (exact integer)
        2*Ua = 2*Ra - na*(na+1)           (exact integer)
        Ub   = na*nb - Ua

    Normal approximation with the tie correction (no continuity
    correction — document the convention, don't hide it):

        mu = na*nb/2
        sigma^2 = na*nb/12 * ((n+1) - sum_v(t^3 - t)/(n*(n-1)))
        z = (Ua - mu) / sigma       (NULL when sigma = 0)

    plus the common-language effect size auc = Ua/(na*nb) (the
    probability a random A value exceeds a random B value, ties
    counting half — identical to ROC-AUC of the group indicator).

    Values are only COMPARED, never summed, so float inputs stay
    exact; all sums are over integers. z/auc computed in double from
    exact integer parts, fixed operation order, round 9.

    Scale: one (keys, value) count + one cardinality-bounded window
    over distinct values per key + one reaggregation — the
    distinct-value frame is bounded by value cardinality, not n.

    Output: keys + (na, nb, u_a, u_b, auc_a, z).
    """

    def __init__(self, value: str, group: str, group_a,
                 group_b=None, keys=None, label=None):
        super().__init__(label)
        self.value, self.group = value, group
        self.group_a, self.group_b = group_a, group_b
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        v, g, ks = self.value, self.group, self.keys
        df = pcoll.df.where(F.col(v).isNotNull())
        if self.group_b is None:
            df = df.where(F.col(g).isNotNull())
        else:
            df = df.where(F.col(g).isin([self.group_a, self.group_b]))
        is_a = (F.col(g) == F.lit(self.group_a)).cast("long")
        cnt = (df.groupBy(*ks, F.col(v).alias("__v"))
               .agg(F.sum(is_a).alias("__ca"),
                    F.sum(F.lit(1) - is_a).alias("__cb")))
        t = F.col("__ca") + F.col("__cb")
        w = (Window.partitionBy(*ks) if ks else Window.partitionBy())
        w = w.orderBy("__v").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
        cnt = (cnt.withColumn("__t", t)
               .withColumn("__cum", F.sum("__t").over(w) - F.col("__t")))
        r2 = 2 * F.col("__cum") + F.col("__t") + 1
        agg = cnt.groupBy(*ks).agg(
            F.sum("__ca").cast("long").alias("na"),
            F.sum("__cb").cast("long").alias("nb"),
            F.sum(F.col("__ca") * r2).cast("long").alias("__ra2"),
            F.sum(F.col("__t") * F.col("__t") * F.col("__t")
                  - F.col("__t")).cast("long").alias("__ties"))
        na = F.col("na").cast("double")
        nb = F.col("nb").cast("double")
        n = na + nb
        ua = (F.col("__ra2").cast("double")
              - F.col("na").cast("double")
              * (F.col("na") + F.lit(1)).cast("double")) / 2.0
        mu = na * nb / 2.0
        sig2 = (F.when(n >= 2.0,
                       na * nb / 12.0
                       * ((n + 1.0) - F.col("__ties").cast("double")
                          / (n * (n - 1.0))))
                .otherwise(F.lit(0.0)))
        out = agg.select(
            *ks, "na", "nb",
            F.round(ua, 9).alias("u_a"),
            F.round(na * nb - ua, 9).alias("u_b"),
            F.round(F.when((F.col("na") > 0) & (F.col("nb") > 0),
                           ua / (na * nb)), 9).alias("auc_a"),
            F.round(F.when(sig2 > 0.0,
                           (ua - mu) / F.sqrt(sig2)), 9).alias("z"))
        return pcoll.with_df(out)


class MultipleTestCorrection(PTransform):
    """Multiple-hypothesis correction over a frame of p-values — the
    mandatory follow-up when MannWhitneyU / KsDrift / chi-square runs
    once per key and someone is about to act on "significant" slices
    (m tests at alpha produce ~m*alpha false flags uncorrected).

    Methods (any subset, each adds a column; statsmodels semantics,
    all clipped to <= 1):

        bonferroni   p_bonf = m * p
        holm         p_holm_(i) = running MAX of (m - i + 1) * p_(i)
                     over ascending p-rank (step-down)
        bh           p_bh_(i) = running MIN of m * p_(i) / i over
                     DESCENDING p-rank (Benjamini-Hochberg step-up)

    Ranks come from row_number over (p, tie-break columns) — the
    tie-break changes nothing about tied p-values' adjusted value
    (running min/max equalizes them) but makes the plan fully
    deterministic and replayable. ``keys`` scopes the family (m and
    the ranks) per key instead of globally. Rows with NULL p are
    dropped (they are not hypotheses; m counts only real tests).

    Scale: one or two cardinality-bounded windows over the TEST frame
    (one row per hypothesis — already aggregated), never over raw
    data; m joins in via a 1-row-per-key broadcastable count frame.

    Output: input columns + requested p_* columns (round 9) +
    reject_<method> booleans at ``alpha``.
    """

    METHODS = ("bonferroni", "holm", "bh")

    def __init__(self, p_col: str, methods=("bh",), alpha: float = 0.05,
                 keys=None, tie_break=None, label=None):
        super().__init__(label)
        self.p_col = p_col
        self.methods = ([methods] if isinstance(methods, str)
                        else list(methods))
        bad = [m for m in self.methods if m not in self.METHODS]
        if bad or not self.methods:
            raise ValueError(f"methods {self.methods}: "
                             f"choose from {self.METHODS}")
        self.alpha = float(alpha)
        if not 0.0 < self.alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.tie_break = ([tie_break] if isinstance(tie_break, str)
                          else list(tie_break) if tie_break else [])

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        p, ks = self.p_col, self.keys
        in_cols = pcoll.df.columns
        df = pcoll.df.where(F.col(p).isNotNull())
        order = [F.col(p)] + [F.col(c) for c in self.tie_break]
        wkey = Window.partitionBy(*ks) if ks else Window.partitionBy()
        df = (df.withColumn("__m", F.count(F.lit(1)).over(wkey))
              .withColumn("__r", F.row_number().over(
                  wkey.orderBy(*order))))
        m = F.col("__m").cast("double")
        r = F.col("__r").cast("double")
        pv = F.col(p).cast("double")
        out = df
        if "bonferroni" in self.methods:
            out = out.withColumn(
                "__raw_bonferroni", F.least(m * pv, F.lit(1.0)))
        if "holm" in self.methods:
            wup = (wkey.orderBy(F.col("__r"))
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
            out = out.withColumn(
                "__raw_holm",
                F.least(F.max((m - r + 1.0) * pv).over(wup),
                        F.lit(1.0)))
        if "bh" in self.methods:
            wdn = (wkey.orderBy(F.desc("__r"))
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
            out = out.withColumn(
                "__raw_bh",
                F.least(F.min(m * pv / r).over(wdn), F.lit(1.0)))
        # reject compares the UNROUNDED adjusted p; round 9 is only
        # the reported column
        for meth in self.methods:
            out = (out.withColumn(
                       f"p_{meth}", F.round(F.col(f"__raw_{meth}"), 9))
                   .withColumn(
                       f"reject_{meth}",
                       F.col(f"__raw_{meth}") <= F.lit(self.alpha)))
        keep = in_cols + [c for c in out.columns
                          if c.startswith(("p_", "reject_"))
                          and c not in in_cols]
        return pcoll.with_df(out.select(*keep))


class TwoSampleTTest(PTransform):
    """Welch's two-sample t-test per key — the parametric companion
    to MannWhitneyU for A/B mean comparison, one partial-agg pass:

        t  = (mean_a - mean_b) / sqrt(va/na + vb/nb)
        df = (va/na + vb/nb)^2
             / ((va/na)^2/(na-1) + (vb/nb)^2/(nb-1))   (Welch 1947)
        cohens_d = (mean_a - mean_b) / s_pooled          (effect size)

    Count / sum / sum-of-squares accumulate per group as EXACT
    decimals (``cast_to`` as in LinearFit — exact for decimal/int
    inputs), so the only floats are the closed forms, evaluated in a
    fixed operation order. t/df are NULL when either group has < 2
    rows or both variances are 0. p-values are deliberately not
    emitted (no closed-form t CDF in either engine); feed |t| with
    large df to a normal approximation downstream, or the t/df pair
    to scipy at the edge.

    Scale: one conditional-aggregation groupBy — six sums and two
    counts per key; no joins, no windows.

    Output: keys + (na, nb, mean_a, mean_b, mean_diff, t, df,
    cohens_d), floats round 9.
    """

    def __init__(self, value: str, group: str, group_a, group_b=None,
                 keys=None, cast_to: str = "decimal(18,6)",
                 label=None):
        super().__init__(label)
        self.value, self.group = value, group
        self.group_a, self.group_b = group_a, group_b
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.cast_to = cast_to

    def expand(self, pcoll: PCollection) -> PCollection:
        v, g, ks = self.value, self.group, self.keys
        df = pcoll.df.where(F.col(v).isNotNull())
        if self.group_b is None:
            df = df.where(F.col(g).isNotNull())
        else:
            df = df.where(F.col(g).isin([self.group_a, self.group_b]))
        xa = F.when(F.col(g) == F.lit(self.group_a),
                    F.col(v).cast(self.cast_to))
        xb = F.when(F.col(g) != F.lit(self.group_a),
                    F.col(v).cast(self.cast_to))
        agg = df.groupBy(*ks).agg(
            F.count(xa).cast("long").alias("na"),
            F.count(xb).cast("long").alias("nb"),
            F.sum(xa).alias("__sa"),
            F.sum(xb).alias("__sb"),
            F.sum(xa * xa).alias("__ssa"),
            F.sum(xb * xb).alias("__ssb"))
        na = F.col("na").cast("double")
        nb = F.col("nb").cast("double")
        sa = F.col("__sa").cast("double")
        sb = F.col("__sb").cast("double")
        ssa = F.col("__ssa").cast("double")
        ssb = F.col("__ssb").cast("double")
        ma, mb = sa / na, sb / nb
        va = F.when(F.col("na") >= 2,
                    (ssa - sa * sa / na) / (na - 1.0))
        vb = F.when(F.col("nb") >= 2,
                    (ssb - sb * sb / nb) / (nb - 1.0))
        se2 = va / na + vb / nb
        t = F.when(se2 > 0.0, (ma - mb) / F.sqrt(se2))
        dfree = F.when(se2 > 0.0,
                       (se2 * se2)
                       / ((va / na) * (va / na) / (na - 1.0)
                          + (vb / nb) * (vb / nb) / (nb - 1.0)))
        sp2 = ((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0)
        d = F.when(sp2 > 0.0, (ma - mb) / F.sqrt(sp2))
        out = agg.select(
            *ks, "na", "nb",
            F.round(F.when(F.col("na") >= 1, ma), 9).alias("mean_a"),
            F.round(F.when(F.col("nb") >= 1, mb), 9).alias("mean_b"),
            F.round(F.when((F.col("na") >= 1) & (F.col("nb") >= 1),
                           ma - mb), 9).alias("mean_diff"),
            F.round(t, 9).alias("t"),
            F.round(dfree, 9).alias("df"),
            F.round(d, 9).alias("cohens_d"))
        return pcoll.with_df(out)


class MahalanobisOutliers(PTransform):
    """Multivariate outlier scoring by squared Mahalanobis distance
    over a vector column — FlagOutliers' multivariate sibling, the
    embedding/feature-space anomaly score that respects correlations
    (a point 2 sigma out along a correlated direction is much rarer
    than its per-coordinate z-scores suggest):

        d^2(x) = (x - mean)' Sigma^-1 (x - mean)

    Fit: one partial-Gram scan (the CovarianceMatrix batch pass);
    the driver inverts the d x d covariance (ridge-regularized by
    ``eps`` * I so near-singular fits fail soft, and a genuinely
    singular matrix raises with the offending condition number).
    Score: one Arrow-batched pass — numpy quadratic form per batch.
    Under a multivariate-normal null d^2 ~ chi-square(d); pass the
    chi-square quantile as ``threshold`` to get the flag column.

    Scale: fit shuffles (#batches) * d^2 summary cells; score is a
    single scan; driver memory is d^2 doubles.

    Output: (id_col, mahalanobis_sq) + is_outlier when ``threshold``
    is set. mahalanobis_sq round 6 (driver-inverse path differs from
    any replay's inverse by float-factorization noise ~1e-12).
    """

    MAX_COND = 1e12

    def __init__(self, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 threshold: float | None = None, eps: float = 0.0,
                 label=None):
        super().__init__(label)
        self.id_col, self.vec_col = id_col, vec_col
        self.threshold = (None if threshold is None
                          else float(threshold))
        self.eps = float(eps)

    def expand(self, pcoll: PCollection) -> PCollection:
        import numpy as np

        from beam_spark.operators.similarity import CovarianceMatrix

        idc, vc = self.id_col, self.vec_col
        src = pcoll.df.where(F.col(vc).isNotNull())
        parts = src.select(vc).mapInPandas(
            CovarianceMatrix._partial_gram(vc),
            schema="n long, s array<double>, g array<double>").collect()
        if not parts:
            raise ValueError("MahalanobisOutliers: empty input")
        dims = {len(r["s"]) for r in parts}
        if len(dims) != 1:
            raise ValueError(
                f"MahalanobisOutliers: ragged vector column {vc!r} "
                f"— batch dims {sorted(dims)}")
        d = len(parts[0]["s"])
        n = sum(r["n"] for r in parts)
        if n < d + 1:
            raise ValueError(
                f"MahalanobisOutliers: n {n} <= dim {d} — covariance "
                "is singular by construction")
        s = np.sum([r["s"] for r in parts], axis=0)
        g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts],
                   axis=0)
        mean = s / n
        cov = (g - np.outer(s, s) / n) / (n - 1)
        if self.eps:
            cov = cov + self.eps * np.eye(d)
        cond = float(np.linalg.cond(cov))
        if not np.isfinite(cond) or cond > self.MAX_COND:
            raise ValueError(
                f"covariance condition number {cond:.3g} > "
                f"{self.MAX_COND:.0e}: regularize with eps or reduce "
                "dimensions (PcaProject)")
        prec = np.linalg.inv(cov)
        mean_b, prec_b = mean, prec
        thr = self.threshold

        def score(it):
            import pandas as pd

            for pdf in it:
                pdf = pdf[pdf[vc].notna()]
                if not len(pdf):
                    continue
                X = np.stack([np.asarray(v, dtype=np.float64)
                              for v in pdf[vc]]) - mean_b
                d2 = np.einsum("ij,jk,ik->i", X, prec_b, X)
                out = {idc: pdf[idc].values,
                       "mahalanobis_sq": np.round(d2, 6)}
                if thr is not None:
                    out["is_outlier"] = d2 > thr
                yield pd.DataFrame(out)

        id_type = dict(src.dtypes)[idc]
        schema = f"{idc} {id_type}, mahalanobis_sq double"
        if thr is not None:
            schema += ", is_outlier boolean"
        out = src.select(idc, vc).mapInPandas(score, schema=schema)
        return pcoll.with_df(out)


class ConcentrationReport(PTransform):
    """Concentration / inequality report over non-negative
    contributions (one row per unit: a supplier's volume, a source's
    token count, a user's event count) — the data-mixture diagnostic
    that answers "is this corpus slice dominated by a few
    contributors?":

        gini       (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x))
                   over ascending-sorted x with 1-based rank i
        hhi        sum((x/total)^2)    (Herfindahl-Hirschman, 1/n..1)
        top_share  max(x) / total

    Ranks come from row_number over (value, input order) — tied
    values make sum(i * x_i) invariant under tie order, so the output
    is value-deterministic without a tie-break column. x sums
    accumulate as exact decimals (``cast_to``; keep unscaled ints
    under 2^53 for cross-engine replay); ratios are double in fixed
    order. Rows with x < 0 (meaningless for concentration) are
    excluded from the statistics but counted in ``n_negative`` so the
    exclusion is visible, not silent.

    Scale: one rank window + one agg over the UNIT frame (one row per
    contributor — already aggregated upstream), never over raw data.

    Output: keys + (n, n_negative, total, gini, hhi, top_share);
    gini/hhi/top_share NULL when total = 0; floats round 9.
    """

    def __init__(self, value: str, keys=None,
                 cast_to: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.value = value
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.cast_to = cast_to

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        v, ks = self.value, self.keys
        df = pcoll.df.where(F.col(v).isNotNull())
        neg = (df.groupBy(*ks)
               .agg(F.sum(F.when(F.col(v) < 0, 1).otherwise(0))
                    .cast("long").alias("n_negative")))
        pos = df.where(F.col(v) >= 0)
        xd = F.col(v).cast(self.cast_to)
        wkey = Window.partitionBy(*ks) if ks else Window.partitionBy()
        ranked = pos.select(
            *ks, xd.alias("__x"),
            F.row_number().over(wkey.orderBy(F.col(v))).alias("__i"))
        agg = ranked.groupBy(*ks).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__x").alias("__sx"),
            F.sum(F.col("__i") * F.col("__x")).alias("__six"),
            F.max("__x").alias("__mx"),
            F.sum(F.col("__x").cast("double")
                  * F.col("__x").cast("double")).alias("__sxx"))
        n = F.col("n").cast("double")
        sx = F.col("__sx").cast("double")
        six = F.col("__six").cast("double")
        mx = F.col("__mx").cast("double")
        nz = sx > 0.0
        out = agg.select(
            *ks, "n",
            F.round(F.when(nz, (2.0 * six - (n + 1.0) * sx)
                           / (n * sx)), 9).alias("gini"),
            F.round(F.when(nz, F.col("__sxx") / (sx * sx)), 9)
            .alias("hhi"),
            F.round(F.when(nz, mx / sx), 9).alias("top_share"),
            F.col("__sx").cast("double").alias("total"))
        out = (out.join(F.broadcast(neg), ks, "left") if ks
               else out.crossJoin(F.broadcast(neg)))
        out = out.withColumn(
            "n_negative",
            F.coalesce(F.col("n_negative"), F.lit(0)).cast("long"))
        return pcoll.with_df(out.select(
            *ks, "n", "n_negative", "total", "gini", "hhi",
            "top_share"))


class OneWayAnova(PTransform):
    """One-way ANOVA per key — the k-group generalization of
    TwoSampleTTest ("does ANY of these cohorts differ in mean?"),
    one conditional-aggregation pass:

        SSB = sum_g n_g * (mean_g - grand_mean)^2
            = sum_g S_g^2 / n_g - S^2 / n      (computed this way)
        SSW = SS_total - S^2/n - SSB
        F   = (SSB / (k-1)) / (SSW / (n-k))
        eta_sq = SSB / (SSB + SSW)             (effect size)

    Group sums / sums-of-squares accumulate as exact decimals
    (``cast_to``); the sum-of-squares identities are evaluated in
    double with a fixed order of the per-group terms (groups are
    reduced with sum() over the per-group frame — per-key group
    counts are vocabulary-bounded, so the float-sum order across
    groups is the only cross-engine wiggle; round 9 absorbs it).
    F is NULL when k < 2, n <= k, or SSW = 0.

    Scale: one (keys, group) partial-agg groupBy + one keys reagg —
    the same two-level shape as KAnonymity; no joins, no windows.

    Output: keys + (n, n_groups, f_stat, df_between, df_within,
    eta_sq), floats round 9.
    """

    def __init__(self, value: str, group: str, keys=None,
                 cast_to: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.value, self.group = value, group
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.cast_to = cast_to

    def expand(self, pcoll: PCollection) -> PCollection:
        v, g, ks = self.value, self.group, self.keys
        xd = F.col(v).cast(self.cast_to)
        per = (pcoll.df
               .where(F.col(v).isNotNull() & F.col(g).isNotNull())
               .groupBy(*ks, g)
               .agg(F.count(F.lit(1)).cast("long").alias("__n"),
                    F.sum(xd).alias("__s"),
                    F.sum(xd * xd).alias("__ss")))
        sd = F.col("__s").cast("double")
        nd = F.col("__n").cast("double")
        agg = per.groupBy(*ks).agg(
            F.sum("__n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(sd * sd / nd).alias("__sgs"),
            F.sum("__s").alias("__stot"),
            F.sum("__ss").alias("__sstot"))
        n = F.col("n").cast("double")
        k = F.col("n_groups").cast("double")
        corr = (F.col("__stot").cast("double")
                * F.col("__stot").cast("double") / n)
        ssb = F.col("__sgs") - corr
        ssw = F.col("__sstot").cast("double") - corr - ssb
        ok = (F.col("n_groups") >= 2) & (n > k) & (ssw > 0.0)
        fstat = F.when(ok, (ssb / (k - 1.0)) / (ssw / (n - k)))
        out = agg.select(
            *ks, "n", "n_groups",
            F.round(fstat, 9).alias("f_stat"),
            (F.col("n_groups") - 1).cast("long").alias("df_between"),
            (F.col("n") - F.col("n_groups")).cast("long")
            .alias("df_within"),
            F.round(F.when((ssb + ssw) > 0.0, ssb / (ssb + ssw)), 9)
            .alias("eta_sq"))
        return pcoll.with_df(out)


class ProportionsZTest(PTransform):
    """Two-sample proportion z-test per key (pooled standard error) +
    the sample-ratio-mismatch (SRM) chi-square every experimentation
    platform runs before trusting a split:

        z   = (p_a - p_b) / sqrt(p*(1-p) * (1/n_a + 1/n_b))
              (p = pooled rate; NULL when p is 0 or 1, or a group
               is empty)
        srm_chi2 = (n_a - e)^2/e + (n_b - e')^2/e'  against the
              expected split ``ratio_a`` (default 0.5), df = 1

    Everything before the closed forms is exact integer counting; the
    z / chi-square are fixed-order double expressions, round 9.

    Scale: one conditional-count groupBy per key; no joins/windows.

    Output: keys + (n_a, n_b, pos_a, pos_b, p_a, p_b, z, srm_chi2).
    """

    def __init__(self, success: str, group: str, group_a,
                 keys=None, ratio_a: float = 0.5, label=None):
        super().__init__(label)
        self.success, self.group, self.group_a = success, group, group_a
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.ratio_a = float(ratio_a)
        if not 0.0 < self.ratio_a < 1.0:
            raise ValueError("ratio_a must be in (0, 1)")

    def expand(self, pcoll: PCollection) -> PCollection:
        s, g, ks = self.success, self.group, self.keys
        df = pcoll.df.where(F.col(g).isNotNull()
                            & F.col(s).isNotNull())
        is_a = (F.col(g) == F.lit(self.group_a))
        suc = F.col(s).cast("boolean").cast("long")
        agg = df.groupBy(*ks).agg(
            F.sum(F.when(is_a, 1).otherwise(0)).cast("long")
            .alias("n_a"),
            F.sum(F.when(~is_a, 1).otherwise(0)).cast("long")
            .alias("n_b"),
            F.sum(F.when(is_a, suc).otherwise(0)).cast("long")
            .alias("pos_a"),
            F.sum(F.when(~is_a, suc).otherwise(0)).cast("long")
            .alias("pos_b"))
        na = F.col("n_a").cast("double")
        nb = F.col("n_b").cast("double")
        pa = F.col("pos_a").cast("double") / na
        pb = F.col("pos_b").cast("double") / nb
        pool = ((F.col("pos_a") + F.col("pos_b")).cast("double")
                / (na + nb))
        se2 = pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)
        nonempty = (F.col("n_a") > 0) & (F.col("n_b") > 0)
        ra = F.lit(self.ratio_a)
        ea = (na + nb) * ra
        eb = (na + nb) * (1.0 - ra)
        srm = ((na - ea) * (na - ea) / ea
               + (nb - eb) * (nb - eb) / eb)
        out = agg.select(
            *ks, "n_a", "n_b", "pos_a", "pos_b",
            F.round(F.when(F.col("n_a") > 0, pa), 9).alias("p_a"),
            F.round(F.when(F.col("n_b") > 0, pb), 9).alias("p_b"),
            F.round(F.when(nonempty & (se2 > 0.0),
                           (pa - pb) / F.sqrt(se2)), 9).alias("z"),
            F.round(F.when(nonempty, srm), 9).alias("srm_chi2"))
        return pcoll.with_df(out)


class ConformalInterval(PTransform):
    """Split conformal prediction intervals (Vovk et al.; Lei et al.
    JASA 2018) — distribution-free uncertainty bands for ANY point
    predictor: given a CALIBRATION frame of (prediction, actual), the
    (1-alpha) interval for a new prediction p is

        p ± q,   q = the ceil((n + 1) * (1 - alpha))-th smallest
                     absolute residual |actual - prediction|
                     (+inf when the rank exceeds n — not enough
                      calibration data for this alpha: NULL bounds)

    guaranteeing >= 1-alpha marginal coverage for exchangeable data.
    The quantile is an EXACT order statistic (row_number over the
    residual frame with a deterministic tie-break on the residual
    value itself), not an approximate percentile — fully replayable.

    Scale: one window over the CALIBRATION frame (sized by holdout
    policy, not corpus), one 1-row broadcast join to the scored
    frame; tie-break note: ranks beyond ties pick the same residual
    VALUE whatever the tie order, so ordering by value alone is
    enough.

    Output: the piped (scoring) frame + (lower, upper) around
    ``pred_col``, both NULL when calibration is insufficient.
    """

    def __init__(self, calibration, pred_col: str, actual_col: str,
                 alpha: float = 0.1, label=None):
        super().__init__(label)
        from beam_spark.pcollection import PCollection as _PC

        self.calibration = (calibration.df
                            if isinstance(calibration, _PC)
                            else calibration)
        self.pred_col, self.actual_col = pred_col, actual_col
        self.alpha = float(alpha)
        if not 0.0 < self.alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        pc, ac = self.pred_col, self.actual_col
        cal = (self.calibration
               .where(F.col(pc).isNotNull() & F.col(ac).isNotNull())
               .select(F.abs(F.col(ac).cast("double")
                             - F.col(pc).cast("double"))
                       .alias("__res")))
        w = Window.partitionBy().orderBy("__res")
        ranked = (cal.withColumn("__r", F.row_number().over(w))
                  .withColumn("__n", F.count(F.lit(1)).over(
                      Window.partitionBy())))
        # rank = ceil((n + 1) * (1 - alpha)); exact integer arithmetic
        # when alpha is expressible, double ceil otherwise (both
        # engines evaluate the identical expression)
        need = F.ceil((F.col("__n") + 1).cast("double")
                      * F.lit(1.0 - self.alpha))
        q = (ranked.where(F.col("__r") == need)
             .select(F.col("__res").alias("__q")))
        out = (pcoll.df.join(F.broadcast(q), how="left")
               .withColumn("lower",
                           F.col(pc).cast("double") - F.col("__q"))
               .withColumn("upper",
                           F.col(pc).cast("double") + F.col("__q"))
               .drop("__q"))
        return pcoll.with_df(out)


class Cuped(PTransform):
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM
    2013) — the standard experimentation-platform adjustment: shrink
    a metric's variance with a pre-experiment covariate before
    running the t-test, cutting required sample sizes by 1 - rho^2:

        theta = cov(X, Y) / var(X)
        y_adj = y - theta * (x - mean(X))     [same mean, less noise]

    theta / means come from one decimal-exact moment pass (``cast_to_
    x/y``; keep unscaled products under 2^53 at your comparison SF —
    the verify-skill hazard); y_adj is then fixed-order double per
    row. ``keys`` fits theta per stratum. theta is 0 when var(X) = 0
    (no covariate signal -> adjustment is a no-op, not a NULL — the
    downstream test still runs).

    Scale: one partial-agg moment pass + one broadcast join of the
    1-row-per-key theta frame back onto the data; no windows.

    Output: input columns + (y_adj round 6 — metric-magnitude
    doubles sit where engines' round(x, 9) grids disagree, see the
    verify-skill hazard notes — and theta round 9).
    """

    def __init__(self, metric: str, covariate: str, keys=None,
                 cast_to_x: str = "decimal(18,6)",
                 cast_to_y: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.metric, self.covariate = metric, covariate
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.cast_to_x, self.cast_to_y = cast_to_x, cast_to_y

    def expand(self, pcoll: PCollection) -> PCollection:
        y, x, ks = self.metric, self.covariate, self.keys
        xd = F.col(x).cast(self.cast_to_x)
        yd = F.col(y).cast(self.cast_to_y)
        base = pcoll.df.where(F.col(x).isNotNull()
                              & F.col(y).isNotNull())
        mom = base.groupBy(*ks).agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(xd).alias("__sx"),
            F.sum(yd).alias("__sy"),
            F.sum(xd * xd).alias("__sxx"),
            F.sum(xd * yd).alias("__sxy"))
        n = F.col("__n").cast("double")
        sx = F.col("__sx").cast("double")
        sy = F.col("__sy").cast("double")
        sxx = F.col("__sxx").cast("double")
        sxy = F.col("__sxy").cast("double")
        dx = n * sxx - sx * sx
        theta = F.when(dx != 0.0,
                       (n * sxy - sx * sy) / dx).otherwise(F.lit(0.0))
        stats = mom.select(*ks, theta.alias("__theta"),
                           (sx / n).alias("__xbar"))
        joined = (base.join(F.broadcast(stats), ks) if ks
                  else base.crossJoin(F.broadcast(stats)))
        out = (joined.withColumn(
                   "y_adj",
                   F.round(F.col(y).cast("double")
                           - F.col("__theta")
                           * (F.col(x).cast("double")
                              - F.col("__xbar")), 6))
               .withColumn("theta", F.round("__theta", 9))
               .drop("__theta", "__xbar"))
        return pcoll.with_df(out)


class RobustLocation(PTransform):
    """Robust location/spread report per key — exact trimmed mean,
    median, and MAD (median absolute deviation), the outlier-immune
    summary a metrics pipeline reports next to mean/stddev when the
    data has heavy tails:

        trimmed_mean   mean after dropping floor(n * trim) rows from
                       EACH end (by exact rank, value+rank tie-break)
        median         exact: middle value (odd n) or the mean of the
                       two middle values (even n)
        mad            median of |x - median|, same exact construction

    All three come from exact rank windows and decimal sums
    (``cast_to``) — no approx percentiles; the only doubles are the
    final single divisions (round 9; inputs at metric magnitude
    should be pre-scaled or compared at round 6 — see the round-grid
    hazard note in the verify skill).

    Scale: two rank-window passes over the data (one for the median,
    one for |x - median|) + one broadcast join of the 1-row-per-key
    median frame — rank windows shuffle on the keys and sort per
    partition; for keyless use at extreme n, pre-aggregate to a
    value-count frame upstream.

    Output: keys + (n, mean, trimmed_mean, median, mad).
    """

    def __init__(self, value: str, keys=None, trim: float = 0.1,
                 cast_to: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.value = value
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.trim = float(trim)
        if not 0.0 <= self.trim < 0.5:
            raise ValueError("trim must be in [0, 0.5)")
        self.cast_to = cast_to

    def _median(self, df, val_col, ks):
        """Exact per-key median of ``val_col`` via rank windows."""
        from pyspark.sql import Window

        wkey = Window.partitionBy(*ks) if ks else Window.partitionBy()
        w = wkey.orderBy(F.col(val_col))
        r = (df.withColumn("__r", F.row_number().over(w))
             .withColumn("__n", F.count(F.lit(1)).over(wkey)))
        lo = (F.col("__n") + 1) / 2
        hi = (F.col("__n") + 2) / 2
        mid = r.where((F.col("__r") == F.floor(lo))
                      | (F.col("__r") == F.floor(hi)))
        return mid.groupBy(*ks).agg(
            (F.sum(F.col(val_col).cast(self.cast_to)).cast("double")
             / F.count(F.lit(1)).cast("double")).alias("__med"))

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        v, ks, trim = self.value, self.keys, self.trim
        df = pcoll.df.where(F.col(v).isNotNull())
        xd = F.col(v).cast(self.cast_to)
        wkey = Window.partitionBy(*ks) if ks else Window.partitionBy()
        w = wkey.orderBy(F.col(v))
        ranked = (df.withColumn("__r", F.row_number().over(w))
                  .withColumn("__n", F.count(F.lit(1)).over(wkey))
                  .withColumn("__xd", xd))
        drop = F.floor(F.col("__n").cast("double") * F.lit(trim))
        keep = ((F.col("__r") > drop)
                & (F.col("__r") <= F.col("__n") - drop))
        agg = ranked.groupBy(*ks).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__xd").alias("__sx"),
            F.sum(F.when(keep, F.col("__xd"))).alias("__stx"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long")
            .alias("__tn"))
        med = self._median(df.select(*ks, v), v, ks)
        joined = (df.join(F.broadcast(med), ks) if ks
                  else df.crossJoin(F.broadcast(med)))
        dev = joined.select(
            *ks, F.abs(F.col(v).cast("double") - F.col("__med"))
            .alias("__dev"))
        mad = (self._median(dev, "__dev", ks)
               .withColumnRenamed("__med", "__mad"))
        stats = (agg.join(med, ks) if ks else agg.crossJoin(med))
        stats = (stats.join(mad, ks) if ks else stats.crossJoin(mad))
        out = stats.select(
            *ks, "n",
            F.round(F.col("__sx").cast("double")
                    / F.col("n").cast("double"), 9).alias("mean"),
            F.round(F.when(F.col("__tn") > 0,
                           F.col("__stx").cast("double")
                           / F.col("__tn").cast("double")), 9)
            .alias("trimmed_mean"),
            F.round("__med", 9).alias("median"),
            F.round("__mad", 9).alias("mad"))
        return pcoll.with_df(out)


class DiffInDiff(PTransform):
    """2x2 difference-in-differences estimate per key — the canonical
    natural-experiment readout (Card & Krueger 1994 onward):

        did = (mean[treat, post] - mean[treat, pre])
            - (mean[control, post] - mean[control, pre])

    from ONE conditional decimal-sum pass over (metric, treat flag,
    post flag). Parallel-trends is the caller's design assumption;
    this gives the point estimate and the four cell means/counts to
    sanity-check it. A cell with n = 0 yields NULL did (a missing
    quadrant is a design error worth surfacing, not a zero).

    Scale: one map-side-combinable groupBy; no joins, no windows.

    Output: keys + (n_tpre, n_tpost, n_cpre, n_cpost, mean_tpre,
    mean_tpost, mean_cpre, mean_cpost, did) — means/did round 6
    (metric magnitude: the cross-engine round-9 grid hazard).
    """

    def __init__(self, metric: str, treat: str, post: str, keys=None,
                 cast_to: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.metric, self.treat, self.post = metric, treat, post
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.cast_to = cast_to

    def expand(self, pcoll: PCollection) -> PCollection:
        m, tr, po, ks = self.metric, self.treat, self.post, self.keys
        df = pcoll.df.where(F.col(m).isNotNull()
                            & F.col(tr).isNotNull()
                            & F.col(po).isNotNull())
        md = F.col(m).cast(self.cast_to)
        t = F.col(tr).cast("boolean")
        p = F.col(po).cast("boolean")
        cells = {"tpre": t & ~p, "tpost": t & p,
                 "cpre": ~t & ~p, "cpost": ~t & p}
        aggs = []
        for name, cond in cells.items():
            aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                        .cast("long").alias(f"n_{name}"))
            aggs.append(F.sum(F.when(cond, md)).alias(f"__s_{name}"))
        agg = df.groupBy(*ks).agg(*aggs)
        means = {name: F.col(f"__s_{name}").cast("double")
                 / F.col(f"n_{name}").cast("double")
                 for name in cells}
        all_present = None
        for name in cells:
            c = F.col(f"n_{name}") > 0
            all_present = c if all_present is None else all_present & c
        did = F.when(all_present,
                     (means["tpost"] - means["tpre"])
                     - (means["cpost"] - means["cpre"]))
        out = agg.select(
            *ks,
            "n_tpre", "n_tpost", "n_cpre", "n_cpost",
            *[F.round(F.when(F.col(f"n_{name}") > 0, means[name]), 6)
              .alias(f"mean_{name}") for name in
              ("tpre", "tpost", "cpre", "cpost")],
            F.round(did, 6).alias("did"))
        return pcoll.with_df(out)


# two-sided alpha / power z-quantiles as fixed double literals — the
# operator takes z values (not alpha) so the contract is explicit and
# engine-replayable; these are the conventional lookups
Z_ALPHA_05 = 1.959963984540054      # Phi^-1(0.975)
Z_POWER_80 = 0.8416212335729143     # Phi^-1(0.80)
Z_POWER_90 = 1.2815515655446004     # Phi^-1(0.90)


class PowerAnalysis(PTransform):
    """Minimum detectable effect / required sample size per key for a
    two-arm mean test — the pre-experiment sizing report every A/B
    platform runs (and the post-CUPED "how much runtime did variance
    reduction buy" readout):

        mde_abs    = (z_a + z_b) * sqrt(2 * var / n_per_arm)
        mde_rel    = mde_abs / |mean|            (NULL when mean = 0)
        n_per_arm_required(effect) = ceil((z_a + z_b)^2 * 2 * var
                                          / effect^2)

    Variance/mean come from one decimal-moment pass (``cast_to``).
    ``n_per_arm`` defaults to half the key's rows (a 50/50 split of
    the observed data); ``target_effect`` (absolute units) adds the
    required-n column. z defaults: two-sided alpha 0.05 / power 0.80
    — pass other quantiles explicitly (the operator is deliberately
    quantile-in, not alpha-in: no erf-inverse in either engine).

    Scale: one groupBy; one row per key.

    Output: keys + (n, mean round 6, var round 6, mde_abs round 6,
    mde_rel round 9 [, n_per_arm_required]).
    """

    def __init__(self, value: str, keys=None,
                 z_alpha: float = Z_ALPHA_05,
                 z_power: float = Z_POWER_80,
                 target_effect: float | None = None,
                 cast_to: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.value = value
        self.keys = ([keys] if isinstance(keys, str)
                     else list(keys) if keys else [])
        self.z_alpha, self.z_power = float(z_alpha), float(z_power)
        self.target_effect = (None if target_effect is None
                              else float(target_effect))
        if self.target_effect is not None and self.target_effect <= 0:
            raise ValueError("target_effect must be > 0")
        self.cast_to = cast_to

    def expand(self, pcoll: PCollection) -> PCollection:
        v, ks = self.value, self.keys
        xd = F.col(v).cast(self.cast_to)
        agg = (pcoll.df.where(F.col(v).isNotNull())
               .groupBy(*ks)
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum(xd).alias("__s"),
                    F.sum(xd * xd).alias("__ss")))
        n = F.col("n").cast("double")
        s = F.col("__s").cast("double")
        ss = F.col("__ss").cast("double")
        mean = s / n
        var = F.when(F.col("n") >= 2, (ss - s * s / n) / (n - 1.0))
        zsum = F.lit(self.z_alpha + self.z_power)
        n_arm = n / 2.0
        mde = F.when(var >= 0.0,
                     zsum * F.sqrt(2.0 * var / n_arm))
        cols = [
            *ks, "n",
            F.round(mean, 6).alias("mean"),
            F.round(var, 6).alias("var"),
            F.round(mde, 6).alias("mde_abs"),
            F.round(F.when(mean != 0.0, mde / F.abs(mean)), 9)
            .alias("mde_rel")]
        if self.target_effect is not None:
            eff = F.lit(self.target_effect)
            cols.append(
                F.ceil(zsum * zsum * 2.0 * var / (eff * eff))
                .cast("long").alias("n_per_arm_required"))
        return pcoll.with_df(agg.select(*cols))
