"""Multinomial Naive Bayes over token counts — the classic fast text
classifier a corpus pipeline trains for language / source / quality
routing (fastText's ancestor; cheap enough to rerun per snapshot).

Reference parity: Beam has no classifier library; RunInference wraps
external models (ml/inference.py mirrors that). This is the
complementary TRAINABLE path: both fit and predict are pure
aggregations, so the whole lifecycle runs as one Spark job chain with
no driver-side data, and — because every probability is a ratio of
exact integers pushed through ln once — the scores are replayable in
an independent SQL engine (the KaplanMeier decimal-ln-sum pattern).

Math (alpha-smoothed, vocab V = all training tokens):

    ln P(c)    = ln(n_c / n)
    ln P(w|c)  = ln((cnt(w, c) + alpha) / (tok_c + alpha * |V|))
    score(d,c) = ln P(c) + sum over tokens w of count_d(w) * ln P(w|c)

Out-of-vocabulary tokens at predict time are dropped (the standard
convention — they carry no class signal under this model).

Scale posture:
  - fit: two partial-agg groupBys — (class, token) counts and class
    totals; the model frame is |V| * |C| rows, vocabulary-bounded.
  - predict: explode doc tokens -> (doc, token) counts -> one join
    against the model (broadcast when the model is small, shuffled
    hash join above the threshold — both correct) -> per-(doc, class)
    decimal ln-sum -> per-doc argmax window over |C| rows per doc.
  - per-term ln values are doubles cast to decimal(16,9) BEFORE the
    per-document sum, so token order / partitioning cannot change a
    score (order-free exact sums); the final score rounds 9. Rows
    whose text has no in-vocabulary token are absent from the output
    (no evidence, no claim — the standard OOV-drop convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beam_spark.operators.text import tokens
from beam_spark.pcollection import PCollection, PTransform

# lp at scale 9 with 7 integer digits: products with integer counts
# (decimal(9,0)) are exact at (25,9); per-doc sums stay under 2^53
# unscaled even for 10k-token docs, so the decimal -> double cast is
# single-rounded in BOTH engines (the 2^53 hazard, see verify skill)
_DEC_LP = "decimal(16,9)"
_DEC_CNT = "decimal(9,0)"


def _token_counts(df: DataFrame, text_col: str, keep: list):
    """(keep..., token, cnt) frame from whitespace tokens; ``keep``
    names columns already present on ``df``."""
    toks = F.filter(tokens(text_col), lambda x: x != "")
    return (df.where(F.col(text_col).isNotNull())
            .select(*keep, F.explode(toks).alias("token"))
            .groupBy(*keep, "token")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


class NaiveBayesClassify(PTransform):
    """Fit multinomial NB on ``train`` (label_col + text_col), then
    classify the piped frame's ``text_col``: output one row per input
    row — (id_col, predicted label, round-9 score, n_known_tokens).

    Deterministic by construction: alpha defaults to 1.0 (dyadic),
    every count is exact, ties on the rounded score break to the
    lexicographically smallest label.
    """

    def __init__(self, train, label_col: str, id_col: str,
                 text_col: str = "text", alpha: float = 1.0,
                 label=None):
        super().__init__(label)
        from beam_spark.pcollection import PCollection as _PC

        self.train = train.df if isinstance(train, _PC) else train
        self.label_col, self.id_col = label_col, id_col
        self.text_col = text_col
        self.alpha = float(alpha)
        if self.alpha <= 0:
            raise ValueError("alpha must be > 0")

    def fit_model(self) -> DataFrame:
        """(label, token, lp decimal) — ln P(w|c) for the FULL
        vocab x class grid (zero counts get the alpha floor)."""
        lc, tc, a = self.label_col, self.text_col, self.alpha
        train = (self.train.where(F.col(lc).isNotNull())
                 .select(F.col(lc).alias("label"), F.col(tc)))
        wc = _token_counts(train, tc, ["label"])
        vocab = wc.select("token").distinct()
        v_size = vocab.count()
        if v_size == 0:
            raise ValueError(
                "NaiveBayesClassify: empty training vocabulary "
                "(no labeled rows with non-empty text)")
        totals = wc.groupBy("label").agg(
            F.sum("cnt").cast("long").alias("tok_c"))
        grid = (totals.crossJoin(vocab)
                .join(wc, ["label", "token"], "left")
                .select(
                    "label", "token",
                    F.log((F.coalesce(F.col("cnt"), F.lit(0))
                           .cast("double") + F.lit(a))
                          / (F.col("tok_c").cast("double")
                             + F.lit(a) * F.lit(float(v_size))))
                    .cast(_DEC_LP).alias("lp")))
        return grid

    def fit_priors(self) -> DataFrame:
        """(label, lprior decimal) — ln P(c) from doc counts (same
        row filter as fit_model: labeled AND non-null text, so a
        text-less row contributes to neither priors nor counts)."""
        lc = self.label_col
        train = self.train.where(
            F.col(lc).isNotNull()
            & F.col(self.text_col).isNotNull())
        per = train.groupBy(F.col(lc).alias("label")).agg(
            F.count(F.lit(1)).cast("long").alias("n_c"))
        tot = per.agg(F.sum("n_c").cast("long").alias("n"))
        return (per.crossJoin(F.broadcast(tot))
                .select("label",
                        F.log(F.col("n_c").cast("double")
                              / F.col("n").cast("double"))
                        .cast(_DEC_LP).alias("lprior")))

    def expand(self, pcoll: PCollection) -> PCollection:
        idc, tc = self.id_col, self.text_col
        model = self.fit_model()
        priors = self.fit_priors()
        docs = _token_counts(pcoll.df, tc, [idc])
        scored = (docs.join(model, "token")     # inner: OOV dropped
                  .groupBy(idc, "label")
                  .agg(F.sum(F.col("cnt").cast(_DEC_CNT) * F.col("lp"))
                       .alias("__s"),
                       F.sum("cnt").cast("long").alias("__known")))
        scored = (scored.join(F.broadcast(priors), "label")
                  .select(idc, "label",
                          F.round((F.col("__s") + F.col("lprior"))
                                  .cast("double"), 9).alias("score"),
                          F.col("__known").alias("n_known_tokens")))
        from pyspark.sql import Window

        w = Window.partitionBy(idc).orderBy(F.desc("score"), "label")
        out = (scored.withColumn("__r", F.row_number().over(w))
               .where(F.col("__r") == 1)
               .select(idc, F.col("label").alias("predicted"),
                       "score", "n_known_tokens"))
        return pcoll.with_df(out)
