"""Logistic regression trained INSIDE Spark — full-batch gradient
descent where each iteration is one partial-agg pass, so training a
quality/routing classifier on 100 TB is T scans with a (d+1)-cell
reduce, no parameter server, no driver-side data.

Reference parity: Beam has no trainer; its ML story is RunInference
(ml/inference.py mirrors that). This is the trainable counterpart for
the common "small-d, huge-n" corpus-scoring case (fastText-style
quality classifiers, sample-weight heads).

Update rule (iteration t, learning rate lr, x_0 = 1 intercept):

    p_i   = sigmoid(w_t . x_i)
    g_j   = sum_i quant((p_i - y_i) * x_ij / n)     [exact decimal sum]
    w_j   = w_j - lr * g_j                          [plain double]

Determinism / oracle replay (the PageRank chained-CTE convention):
every per-row gradient term is quantized to decimal(16,9) BEFORE the
sum — the sum is order-free and exact, partitioning cannot change it;
dividing by n inside the term keeps the sum's unscaled integer under
2^53 at any row count (the decimal->double cast hazard); weights stay
FULL-PRECISION doubles — with a dyadic lr, `w - lr*g` is the same
IEEE sequence in every engine, and crucially weights are NEVER
rounded mid-training (rounding a 0.5*scale-9-decimal product to 9 dp
lands on an exact half tie almost every step, where engines'
rounding modes differ — found designing this). Display rounds 9 at
the very end, where the value is a generic double. The quantization
of gradient TERMS is part of the algorithm definition, not an
approximation afterthought — 1e-9 gradient noise is far below any
sane lr's step.

Scale: T sequential jobs, each one scan + one (d+1)-sum aggregate;
driver holds d+1 doubles. d is capped (weights ride in expressions).

Output: (term, weight) — 'intercept' plus one row per feature.
After expand, ``weights_`` holds the fitted dict driver-side, and
``decision_column(df)`` returns a sigmoid-score Column for scoring
any frame with the same feature columns. NULL rows are excluded; NaN
feature values are NOT (they would poison the gradient exactly as in
any GD trainer) — clean upstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform

_DEC_G = "decimal(16,9)"
MAX_FEATURES = 256


class LogisticFit(PTransform):
    """Fit w on the piped frame's numeric ``features`` against binary
    ``label`` (0/1 or boolean); NULL rows (any feature or the label)
    are excluded. lr should be dyadic (0.5, 0.25, ...) for bit-stable
    replay; iterations is fixed (no convergence test — the
    value-oracle posture of PageRank/KMeans)."""

    def __init__(self, features, label: str, iterations: int = 5,
                 lr: float = 0.5, label_=None):
        super().__init__(label_)
        self.features = ([features] if isinstance(features, str)
                         else list(features))
        if not 1 <= len(self.features) <= MAX_FEATURES:
            raise ValueError(
                f"need 1..{MAX_FEATURES} features, got "
                f"{len(self.features)}")
        self.label = label
        self.iterations = int(iterations)
        if self.iterations < 1:
            raise ValueError("iterations must be >= 1")
        self.lr = float(lr)
        if self.lr <= 0:
            raise ValueError("lr must be > 0")
        self.weights_ = None

    def _x(self, j: int) -> Column:
        return (F.lit(1.0) if j == 0
                else F.col(self.features[j - 1]).cast("double"))

    def decision_column(self, w=None) -> Column:
        """sigmoid(w . x) as a Column over the feature columns."""
        ws = w or self.weights_
        if ws is None:
            raise ValueError("fit first (run expand)")
        z = F.lit(ws["intercept"])
        for f in self.features:
            z = z + F.lit(ws[f]) * F.col(f).cast("double")
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def expand(self, pcoll: PCollection) -> PCollection:
        fs, lc = self.features, self.label
        cond = F.col(lc).isNotNull()
        for f in fs:
            cond = cond & F.col(f).isNotNull()
        df = (pcoll.df.where(cond)
              .select(F.col(lc).cast("boolean").cast("double")
                      .alias("__y"),
                      *[F.col(f).cast("double").alias(f) for f in fs]))
        # spread the T scans: a small parquet source may arrive in 1-2
        # partitions, serializing every gradient pass — repartition to
        # the cluster's parallelism before checkpointing (gradients
        # are order-free decimal sums, so this cannot change values)
        par = pcoll.df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
        df = df.localCheckpoint(eager=True)   # T scans, one lineage
        n = df.count()
        if n == 0:
            raise ValueError("LogisticFit: empty input after NULL "
                             "filtering")
        names = ["intercept"] + fs
        w = [0.0] * len(names)
        for _ in range(self.iterations):
            z = F.lit(w[0])
            for j, f in enumerate(fs, start=1):
                z = z + F.lit(w[j]) * F.col(f).cast("double")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            terms = [
                F.sum(((p - F.col("__y")) * self._x(j)
                       / F.lit(float(n))).cast(_DEC_G))
                .alias(f"g{j}")
                for j in range(len(names))]
            row = df.agg(*terms).first()
            w = [w[j] - self.lr * float(row[f"g{j}"])
                 for j in range(len(names))]
        self.weights_ = dict(zip(names, w))
        spark = df.sparkSession
        out = spark.createDataFrame(
            list(zip(names, w)), "term string, weight double")
        return pcoll.with_df(out)
