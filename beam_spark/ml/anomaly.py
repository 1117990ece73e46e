"""Anomaly detection (SURVEY.md §2.12).

Beam reference: ml/anomaly/transforms.py:53-561 (AnomalyDetection with
ensemble detectors), detectors ml/anomaly/detectors/ (z-score, IQR, MAD).

Batch implementations score against group statistics computed in one
aggregation (exact decimal moments -> deterministic, cross-engine
checkable); the streaming variant would carry the same statistics in
transformWithState state and update online (round 2+).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform


class ZScoreDetector(PTransform):
    """|x - mean| / stddev > threshold per group (detectors/zscore.py).

    Moments are computed with exact decimal sums (see stats.moments_*)
    so scores are identical across partitionings and engines.
    """

    def __init__(self, value_col: str, group_cols=None, threshold: float = 3.0,
                 dec_expr: str | None = None, label=None):
        super().__init__(label)
        self.value_col = value_col
        self.group_cols = ([group_cols] if isinstance(group_cols, str)
                           else list(group_cols or []))
        self.threshold = threshold
        self.dec_expr = dec_expr or f"CAST({value_col} AS DECIMAL(18,6))"

    def expand(self, pcoll: PCollection) -> PCollection:
        d = self.dec_expr
        s1 = f"CAST(SUM({d}) AS DOUBLE)"
        s2 = f"CAST(SUM({d} * {d}) AS DOUBLE)"
        n = f"COUNT({d})"
        # expression SHAPE matters for cross-engine bit-equality: compute
        # mean once and square it (mirrors the oracle SQL exactly), never
        # an algebraically-equal-but-differently-rounded variant
        mean = f"{s1} / {n}"
        stats_agg = [
            F.expr(mean).alias("__mean"),
            F.expr(f"sqrt(({s2}) / {n} - ({mean}) * ({mean}))").alias("__std"),
        ]
        df = pcoll.df
        if self.group_cols:
            stats = df.groupBy(*self.group_cols).agg(*stats_agg)
            scored = df.join(F.broadcast(stats), on=self.group_cols)
        else:
            m, s = df.agg(*stats_agg).first()
            scored = df.withColumn("__mean", F.lit(m)).withColumn("__std", F.lit(s))
        out = (scored
               .withColumn("zscore", (F.col(self.value_col) - F.col("__mean"))
                           / F.col("__std"))
               .withColumn("is_anomaly", F.abs(F.col("zscore")) > self.threshold)
               .drop("__mean", "__std"))
        return pcoll.with_df(out)


class IQRDetector(PTransform):
    """Interquartile-range outliers (detectors/iqr.py): outside
    [q1 - k*iqr, q3 + k*iqr]. Quantiles via exact percentile (group stats
    broadcast back)."""

    def __init__(self, value_col: str, group_cols=None, k: float = 1.5, label=None):
        super().__init__(label)
        self.value_col = value_col
        self.group_cols = ([group_cols] if isinstance(group_cols, str)
                           else list(group_cols or []))
        self.k = k

    def expand(self, pcoll: PCollection) -> PCollection:
        v = self.value_col
        agg = F.expr(f"percentile({v}, array(0.25, 0.75))").alias("__q")
        df = pcoll.df
        if self.group_cols:
            stats = df.groupBy(*self.group_cols).agg(agg)
            scored = df.join(F.broadcast(stats), on=self.group_cols)
        else:
            q = df.agg(agg).first()[0]
            scored = df.withColumn("__q", F.array(F.lit(q[0]), F.lit(q[1])))
        out = (scored
               .withColumn("__iqr", F.col("__q")[1] - F.col("__q")[0])
               .withColumn("is_anomaly",
                           (F.col(v) < F.col("__q")[0] - self.k * F.col("__iqr"))
                           | (F.col(v) > F.col("__q")[1] + self.k * F.col("__iqr")))
               .drop("__q", "__iqr"))
        return pcoll.with_df(out)


class RobustZScoreDetector(PTransform):
    """Robust (modified) z-score (detectors/robust_zscore.py:31):
    score = |0.6745 * (x - median) / MAD|, MAD = median(|x - median|)
    — the outlier-insensitive alternative to the moment z-score (one
    wild value shifts mean AND stddev, masking itself; the median and
    MAD barely move). 0.6745 = Phi^-1(0.75) makes the score
    sigma-comparable under normality, so the default threshold stays
    3. The reference floors MAD at EPSILON = 1e-9
    (univariate/base.py:22) so a constant-but-for-outliers group
    still flags the outliers; mirrored here.

    Batch-exact: interpolated medians (the reference notes its
    STREAMING tracker only approximates this batch definition).
    Two aggregation passes (median, then MAD over |x - median|),
    group stats broadcast back.
    """

    def __init__(self, value_col: str, group_cols=None,
                 threshold: float = 3.0, label=None):
        super().__init__(label)
        self.value_col = value_col
        self.group_cols = ([group_cols] if isinstance(group_cols, str)
                           else list(group_cols or []))
        self.threshold = float(threshold)

    def expand(self, pcoll: PCollection) -> PCollection:
        v, gs = self.value_col, self.group_cols
        df = pcoll.df
        med_agg = F.expr(f"percentile({v}, 0.5)").alias("__med")
        if gs:
            med = df.groupBy(*gs).agg(med_agg)
            with_med = df.join(F.broadcast(med), on=gs)
            mad = (with_med
                   .groupBy(*gs)
                   .agg(F.expr(f"percentile(abs({v} - __med), 0.5)")
                        .alias("__mad")))
            scored = with_med.join(F.broadcast(mad), on=gs)
        else:
            m = df.agg(med_agg).first()[0]
            with_med = df.withColumn("__med", F.lit(m))
            md = with_med.agg(
                F.expr(f"percentile(abs({v} - __med), 0.5)")).first()[0]
            scored = with_med.withColumn("__mad", F.lit(md))
        score = F.abs(F.lit(0.6745) * (F.col(v) - F.col("__med"))
                      / F.greatest(F.col("__mad"), F.lit(1.0e-9)))
        out = (scored
               .withColumn("robust_zscore", score)
               .withColumn("is_anomaly",
                           F.col("robust_zscore") > self.threshold)
               .drop("__med", "__mad"))
        return pcoll.with_df(out)


class AnomalyVote(PTransform):
    """Label aggregation across detector flags
    (ml/anomaly/aggregations.py MajorityVote:195 / AllVote:236 /
    AnyVote:267): combine boolean is-anomaly columns from several
    detectors into one ensemble flag. Pure expression — zero
    shuffle. NULL flags count as normal votes (the reference's
    missing-prediction handling under its defaults).
    """

    RULES = ("majority", "any", "all")

    def __init__(self, flag_cols, out_col: str = "is_anomaly",
                 rule: str = "majority", label=None):
        super().__init__(label)
        self.flag_cols = ([flag_cols] if isinstance(flag_cols, str)
                          else list(flag_cols))
        if len(self.flag_cols) < 1:
            raise ValueError("need at least one flag column")
        if rule not in self.RULES:
            raise ValueError(f"rule {rule!r}: one of {self.RULES}")
        self.rule, self.out_col = rule, out_col

    def expand(self, pcoll: PCollection) -> PCollection:
        votes = [F.coalesce(F.col(c).cast("int"), F.lit(0))
                 for c in self.flag_cols]
        total = votes[0]
        for vv in votes[1:]:
            total = total + vv
        k = len(votes)
        if self.rule == "majority":
            flag = total * 2 > F.lit(k)
        elif self.rule == "any":
            flag = total > F.lit(0)
        else:
            flag = total == F.lit(k)
        return pcoll.with_df(
            pcoll.df.withColumn(self.out_col, flag))


class OnlineZScoreDetector(PTransform):
    """Streaming score-and-learn z-score detector (the reference's
    stateful AnomalyDetection mode, ml/anomaly/transforms.py:53): per-key
    running count/mean/M2 (Welford) kept in state; each element is scored
    against the statistics BEFORE it updates them, so scores are
    prefix-deterministic for a given arrival order.

    Built on streaming.StatefulParDo (pickled-blob state). Bounded inputs
    process the whole group in arrival order — same contract.
    """

    def __init__(self, key_cols, value_col: str, threshold: float = 3.0,
                 min_samples: int = 5, label=None):
        super().__init__(label)
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.value_col, self.threshold = value_col, threshold
        self.min_samples = min_samples

    def expand(self, pcoll: PCollection) -> PCollection:
        import math

        from beam_spark.streaming.state import StatefulDoFn, StatefulParDo

        vcol, thr, min_n = self.value_col, self.threshold, self.min_samples
        keys = self.key_cols
        key_types = ", ".join(
            f"{k} {pcoll.df.schema[k].dataType.simpleString()}" for k in keys)
        out_schema = (f"{key_types}, value double, zscore double, "
                      f"is_anomaly boolean")

        class Detector(StatefulDoFn):
            def process(self, key, rows, state):
                n = state.get("n", 0)
                mean = state.get("mean", 0.0)
                m2 = state.get("m2", 0.0)
                for r in rows:
                    v = float(r[vcol])
                    if n >= min_n and m2 > 0:
                        std = math.sqrt(m2 / n)
                        z = (v - mean) / std
                    else:
                        z = 0.0
                    yield {**{k: r[k] for k in keys}, "value": v,
                           "zscore": z, "is_anomaly": abs(z) > thr}
                    # Welford update AFTER scoring (score-then-learn)
                    n += 1
                    d = v - mean
                    mean += d / n
                    m2 += d * (v - mean)
                state.set("n", n)
                state.set("mean", mean)
                state.set("m2", m2)

        return pcoll | StatefulParDo(keys, Detector(), out_schema)
