"""MLTransform feature ops (SURVEY.md §2.12).

Beam reference: ml/transforms/tft.py:148-728 — ComputeAndApplyVocabulary,
ScaleToZScore, ScaleTo01, ApplyBuckets, Bucketize, TFIDF, ScaleByMinMax,
NGrams, BagOfWords, HashStrings; artifacts (fitted params persisted for
train/serve consistency, ml/transforms/base.py:298).

Spark design: fit = one aggregation producing a small params DataFrame
(persistable as the artifact — parquet round-trip); apply = broadcast
join or literal fold. The fit params are exact (decimal moments where
relevant), so train/serve and re-runs are bit-identical.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform
from beam_spark.operators.text import tokens


class ScaleTo01(PTransform):
    """tft.ScaleTo01: (x - min) / (max - min). Fit+apply in one pass via
    window-free global agg broadcast (two Spark jobs, no shuffle of the
    data itself)."""

    def __init__(self, col: str, out_col: str | None = None, label=None):
        super().__init__(label)
        self.col, self.out_col = col, out_col or f"{col}_scaled"

    def expand(self, pcoll: PCollection) -> PCollection:
        lo, hi = pcoll.df.agg(F.min(self.col), F.max(self.col)).first()
        rng = (hi - lo) or 1.0
        out = pcoll.df.withColumn(
            self.out_col, (F.col(self.col) - F.lit(lo)) / F.lit(rng))
        return pcoll.with_df(out)

    def fit_params(self, pcoll: PCollection) -> dict:
        lo, hi = pcoll.df.agg(F.min(self.col), F.max(self.col)).first()
        return {"min": lo, "max": hi}


class ScaleToZScore(PTransform):
    """tft.ScaleToZScore: (x - mean) / stddev_pop."""

    def __init__(self, col: str, out_col: str | None = None, label=None):
        super().__init__(label)
        self.col, self.out_col = col, out_col or f"{col}_z"

    def expand(self, pcoll: PCollection) -> PCollection:
        mean, std = pcoll.df.agg(F.avg(self.col), F.stddev_pop(self.col)).first()
        out = pcoll.df.withColumn(
            self.out_col, (F.col(self.col) - F.lit(mean)) / F.lit(std or 1.0))
        return pcoll.with_df(out)


class ApplyBuckets(PTransform):
    """tft.ApplyBuckets: bucket index by explicit boundaries (0..n)."""

    def __init__(self, col: str, boundaries: list[float],
                 out_col: str | None = None, label=None):
        super().__init__(label)
        self.col, self.boundaries = col, sorted(boundaries)
        self.out_col = out_col or f"{col}_bucket"

    def expand(self, pcoll: PCollection) -> PCollection:
        c = F.col(self.col)
        expr = F.lit(0)
        for b in self.boundaries:
            expr = expr + F.when(c >= F.lit(b), 1).otherwise(0)
        return pcoll.with_df(pcoll.df.withColumn(self.out_col, expr))


class ApplyBucketsWithInterpolation(PTransform):
    """tft.ApplyBucketsWithInterpolation (reference ml/transforms/tft.py
    apply_buckets_with_interpolation): map x to a float in [0, 1] by
    piecewise-linear interpolation between the bucket boundaries —
    below the first boundary -> 0, above the last -> 1, else
    (i + (x - b_i) / (b_{i+1} - b_i)) / (n - 1). Pure codegen
    expressions over a literal boundary array (boundaries are a small
    fitted artifact, like TFT's)."""

    def __init__(self, col: str, boundaries: list[float],
                 out_col: str | None = None, label=None):
        super().__init__(label)
        if len(boundaries) < 2:
            raise ValueError("need >= 2 boundaries to interpolate")
        self.col = col
        self.boundaries = sorted(float(b) for b in boundaries)
        self.out_col = out_col or f"{col}_interp"

    def expand(self, pcoll: PCollection) -> PCollection:
        bs = self.boundaries
        n = len(bs)
        c = F.col(self.col).cast("double")
        # bucket index i in [0, n-2]: number of interior boundaries <= x,
        # clamped so the top segment absorbs x == last boundary
        idx = F.lit(0)
        for b in bs[1:-1]:
            idx = idx + F.when(c >= F.lit(b), 1).otherwise(0)
        arr = F.array(*[F.lit(b) for b in bs])
        lo = F.element_at(arr, idx + 1)
        hi = F.element_at(arr, idx + 2)
        seg = F.when(hi > lo, (c - lo) / (hi - lo)).otherwise(F.lit(0.0))
        interp = (idx.cast("double") + seg) / F.lit(float(n - 1))
        out = (F.when(c <= F.lit(bs[0]), 0.0)
               .when(c >= F.lit(bs[-1]), 1.0)
               .otherwise(interp))
        return pcoll.with_df(pcoll.df.withColumn(self.out_col, out))


class ScaleToGaussian(PTransform):
    """tft.ScaleToGaussian (reference ml/transforms/tft.py:148): rescale a
    column to approximately standard normal.

    Implementation: empirical-CDF fit (quantile boundaries via
    percentile_approx — the mergeable sketch, so the fit is one pass at
    any scale) -> piecewise-linear CDF application (the
    ApplyBucketsWithInterpolation machinery) -> probit via Acklam's
    rational approximation (public-domain constants), evaluated in an
    Arrow-batched pandas UDF (numpy has no vectorized erfinv).
    Divergence note: the reference fits a parametric Tukey-HH transform;
    the rank-Gaussian map here achieves the same contract (output
    ~N(0,1) for any continuous input) with a quantile artifact instead
    of Tukey parameters.

    ``boundaries`` (the fitted artifact) round-trips via
    fit_params/from params like the other fitted transforms.
    """

    def __init__(self, col: str, out_col: str | None = None,
                 n_quantiles: int = 64, boundaries: list[float] | None = None,
                 label=None):
        super().__init__(label)
        self.col = col
        self.out_col = out_col or f"{col}_gauss"
        self.n_quantiles = n_quantiles
        self.boundaries = boundaries

    def fit_params(self, pcoll: PCollection) -> dict:
        qs = [i / self.n_quantiles for i in range(self.n_quantiles + 1)]
        bounds = pcoll.df.agg(F.percentile_approx(
            self.col, F.array(*[F.lit(q) for q in qs]), 10000)).first()[0]
        # strictly increasing (drop ties so interpolation is well-defined)
        uniq = []
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(float(b))
        return {"boundaries": uniq}

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql.functions import pandas_udf

        bounds = self.boundaries or self.fit_params(pcoll)["boundaries"]
        cdf_col = "__bs_cdf"
        pc = pcoll | ApplyBucketsWithInterpolation(self.col, bounds, cdf_col)

        @pandas_udf("double")
        def probit(u: pd.Series) -> pd.Series:
            import numpy as np

            # Acklam inverse-normal-CDF rational approximation
            # (peter.acklam's public-domain algorithm; |rel err| < 1.2e-9)
            a = [-3.969683028665376e+01, 2.209460984245205e+02,
                 -2.759285104469687e+02, 1.383577518672690e+02,
                 -3.066479806614716e+01, 2.506628277459239e+00]
            b = [-5.447609879822406e+01, 1.615858368580409e+02,
                 -1.556989798598866e+02, 6.680131188771972e+01,
                 -1.328068155288572e+01]
            c = [-7.784894002430293e-03, -3.223964580411365e-01,
                 -2.400758277161838e+00, -2.549732539343734e+00,
                 4.374664141464968e+00, 2.938163982698783e+00]
            d = [7.784695709041462e-03, 3.224671290700398e-01,
                 2.445134137142996e+00, 3.754408661907416e+00]
            # clamp away from 0/1 (min/max of the fit map there)
            p = np.clip(u.to_numpy(dtype=np.float64), 1e-6, 1 - 1e-6)
            out = np.empty_like(p)
            lo, hi = 0.02425, 1 - 0.02425
            m = p < lo
            q = np.sqrt(-2 * np.log(p[m]))
            out[m] = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q
                        + c[4]) * q + c[5])
                      / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
            m = p > hi
            q = np.sqrt(-2 * np.log(1 - p[m]))
            out[m] = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q
                         + c[4]) * q + c[5])
                       / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
            m = (p >= lo) & (p <= hi)
            q = p[m] - 0.5
            r = q * q
            out[m] = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r
                        + a[4]) * r + a[5]) * q
                      / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                          + b[4]) * r + 1))
            return pd.Series(out)

        out = pc.df.withColumn(self.out_col, probit(F.col(cdf_col))).drop(cdf_col)
        return pcoll.with_df(out)


class DeduplicateTensorPerRow(PTransform):
    """tft DeduplicateTensorPerRow (reference ml/transforms/tft.py:700ish):
    drop duplicate values within each row's array, keeping first
    occurrence order (array_distinct preserves it)."""

    def __init__(self, col: str, out_col: str | None = None, label=None):
        super().__init__(label)
        self.col, self.out_col = col, out_col or col

    def expand(self, pcoll: PCollection) -> PCollection:
        return pcoll.with_df(pcoll.df.withColumn(
            self.out_col, F.array_distinct(self.col)))


class Bucketize(PTransform):
    """tft.Bucketize: quantile buckets — fit boundaries with
    percentile_approx, then ApplyBuckets."""

    def __init__(self, col: str, n_buckets: int, out_col: str | None = None,
                 label=None):
        super().__init__(label)
        self.col, self.n = col, n_buckets
        self.out_col = out_col

    def expand(self, pcoll: PCollection) -> PCollection:
        qs = [i / self.n for i in range(1, self.n)]
        bounds = pcoll.df.agg(F.percentile_approx(
            self.col, F.array(*[F.lit(q) for q in qs]), 10000)).first()[0]
        return pcoll | ApplyBuckets(self.col, list(bounds), self.out_col)


class NGrams(PTransform):
    """tft.NGrams over a text column -> array of word n-grams (ordered,
    with duplicates — unlike dedup shingles)."""

    def __init__(self, text_col: str = "text", n: int = 2,
                 out_col: str = "ngrams", label=None):
        super().__init__(label)
        self.text_col, self.n, self.out_col = text_col, n, out_col

    def expand(self, pcoll: PCollection) -> PCollection:
        n = self.n
        tok = pcoll.df.withColumn("__w", tokens(self.text_col))
        parts = ", ".join(f"__w[i-1+{j}]" if j else "__w[i-1]" for j in range(n))
        out = tok.withColumn(self.out_col, F.expr(
            f"CASE WHEN size(__w) >= {n} THEN "
            f"transform(sequence(1, size(__w) - {n - 1}), i -> concat_ws(' ', {parts})) "
            f"ELSE array() END")).drop("__w")
        return pcoll.with_df(out)


class BagOfWords(PTransform):
    """tft.BagOfWords: map token -> count per document."""

    def __init__(self, text_col: str = "text", out_col: str = "bow", label=None):
        super().__init__(label)
        self.text_col, self.out_col = text_col, out_col

    def expand(self, pcoll: PCollection) -> PCollection:
        # token -> count map without UDFs: distinct tokens, then count
        # occurrences with a filtered-size per token (tokens projected
        # once — HOF-CSE trap).
        out = pcoll.df.withColumn("__w", tokens(self.text_col))
        out = out.withColumn(
            self.out_col,
            F.map_from_entries(F.expr(
                "transform(array_distinct(__w), "
                "t -> struct(t, size(filter(__w, x -> x = t))))")))
        return pcoll.with_df(out.drop("__w"))


class HashStrings(PTransform):
    """tft.HashStrings: stable bucket hash of a string column."""

    def __init__(self, col: str, n_buckets: int = 1024,
                 out_col: str | None = None, label=None):
        super().__init__(label)
        self.col, self.n = col, n_buckets
        self.out_col = out_col or f"{col}_hash"

    def expand(self, pcoll: PCollection) -> PCollection:
        return pcoll.with_df(pcoll.df.withColumn(
            self.out_col, F.pmod(F.xxhash64(self.col), F.lit(self.n))))


class FeatureHasher(PTransform):
    """The hashing trick (Weinberger et al., ICML 2009) — project
    arbitrary categorical feature columns into a FIXED-dimension
    signed count vector without a vocabulary pass (the
    dictionary-free featurizer sklearn ships as FeatureHasher and
    Vowpal Wabbit is built on):

        for each column c with non-NULL value v:
            h    = md5(c || '=' || v)
            idx  = int(h[0:8])  % n_features
            sign = 1 - 2 * (int(h[8]) % 2)
        vector[i] = sum of sign over features hashing to i

    The signed sum keeps collisions unbiased (E[dot] preserved — the
    paper's point). md5, not xxhash: the hash must be replayable in
    the oracle engine. Zero-shuffle: idx/sign are projected once per
    column, the vector is a pure expression — ``n_features`` is
    capped because each output cell is one expression term.

    Output: input columns + ``out_col`` array<double> of length
    ``n_features``.
    """

    MAX_FEATURES = 256

    def __init__(self, cols, n_features: int = 32,
                 out_col: str = "hashed", label=None):
        super().__init__(label)
        self.cols = [cols] if isinstance(cols, str) else list(cols)
        if not self.cols:
            raise ValueError("need at least one column")
        self.n_features = int(n_features)
        if not 2 <= self.n_features <= self.MAX_FEATURES:
            raise ValueError(
                f"n_features {n_features} outside "
                f"[2, {self.MAX_FEATURES}]")
        self.out_col = out_col

    def expand(self, pcoll: PCollection) -> PCollection:
        d = self.n_features
        tmp = pcoll.df
        idx_cols, sign_cols = [], []
        for j, c in enumerate(self.cols):
            # backtick-quote so a literal dot in the name is part of
            # the NAME (bare F.col / df[c] both parse dots as
            # struct-field access); internal backticks escape by
            # doubling, per SQL identifier quoting
            quoted = F.col("`" + c.replace("`", "``") + "`")
            key = F.md5(F.concat(F.lit(c + "="),
                                 quoted.cast("string")))
            idx = F.conv(F.substring(key, 1, 8), 16, 10) \
                   .cast("bigint") % F.lit(d)
            sign = (F.lit(1) - F.lit(2)
                    * (F.conv(F.substring(key, 9, 1), 16, 10)
                       .cast("bigint") % F.lit(2)))
            ic, sc = f"__fh_i{j}", f"__fh_s{j}"
            tmp = (tmp.withColumn(ic, idx)
                   .withColumn(sc, sign))
            idx_cols.append(ic)
            sign_cols.append(sc)
        cells = []
        for i in range(d):
            term = None
            for ic, sc in zip(idx_cols, sign_cols):
                t = F.when(F.col(ic) == i,
                           F.col(sc)).otherwise(F.lit(0))
                t = F.coalesce(t, F.lit(0))      # NULL value -> 0
                term = t if term is None else term + t
            cells.append(term.cast("double"))
        out = (tmp.withColumn(self.out_col, F.array(*cells))
               .drop(*idx_cols, *sign_cols))
        return pcoll.with_df(out)


class TFIDF(PTransform):
    """tft.TFIDF: per (doc, term) tf-idf scores.

    Output: exploded rows (id, term, tf, df, tfidf). Two shuffles: one
    per-term document-frequency agg (broadcast back), one nothing — the
    per-doc tf is computed in place. idf = ln((1 + N) / (1 + df)) + 1
    (smooth, sklearn-style).
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", label=None):
        super().__init__(label)
        self.text_col, self.id_col = text_col, id_col

    def expand(self, pcoll: PCollection) -> PCollection:
        idc = self.id_col
        tok = (pcoll.df.select(F.col(idc), tokens(self.text_col).alias("__w"))
               .withColumn("n_tokens", F.size("__w")))
        terms = (tok.select(idc, "n_tokens", F.explode("__w").alias("term"))
                 .groupBy(idc, "n_tokens", "term")
                 .agg(F.count("*").alias("tf_count")))
        n_docs = pcoll.df.count()
        docfreq = (terms.groupBy("term")
                   .agg(F.count_distinct(idc).alias("df")))
        out = (terms.join(F.broadcast(docfreq), on="term")
               .withColumn("tf", F.col("tf_count") / F.col("n_tokens"))
               .withColumn("idf", F.log((F.lit(1.0) + n_docs)
                                        / (F.lit(1.0) + F.col("df"))) + 1.0)
               .withColumn("tfidf", F.col("tf") * F.col("idf"))
               .select(idc, "term", "tf_count", "df", "tfidf"))
        return pcoll.with_df(out)


class ComputeAndApplyVocabulary(PTransform):
    """tft.ComputeAndApplyVocabulary (tft.py:148): fit a frequency-ranked
    vocabulary over a text column, map tokens to indices (OOV -> -1).

    The fitted vocabulary is the ARTIFACT (ml/transforms/base.py:298
    artifact contract): persist with ``save_artifact`` and re-apply at
    serving time with ``VocabularyArtifact.load`` — train/serve skew-free
    because the mapping rides as a broadcast table, not a refit.
    Ranking is deterministic: (-count, token) order.

    Scale: with ``top_k`` (recommended) the vocabulary is truncated by
    a distributed TakeOrdered BEFORE dense ids are assigned, so the
    partitionless numbering window only sees the bounded artifact.
    ``top_k=None`` assigns ids to EVERY distinct token — a full-vocab
    single-task sort, only sane for bounded vocabularies.
    """

    def __init__(self, text_col: str = "text", out_col: str = "token_ids",
                 top_k: int | None = None, label=None):
        super().__init__(label)
        self.text_col, self.out_col, self.top_k = text_col, out_col, top_k
        self.vocab_df = None  # set on expand (the artifact)

    def fit(self, pcoll: PCollection):
        from beam_spark.operators.text import tokens as _tokens

        vocab = (pcoll.df
                 .select(F.explode(_tokens(self.text_col)).alias("token"))
                 .groupBy("token").agg(F.count("*").alias("cnt")))
        from pyspark.sql import Window

        # TRUNCATE FIRST: orderBy().limit(k) is a distributed
        # TakeOrdered, so the partitionless numbering window below only
        # ever sees the bounded top-k artifact — never the full corpus
        # vocabulary (billions of distinct tokens at web scale; the
        # old filter-after-numbering shape pushed ALL of them through
        # one task)
        if self.top_k:
            vocab = (vocab.orderBy(F.col("cnt").desc(), F.col("token"))
                     .limit(self.top_k))
        w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
        vocab = vocab.withColumn("token_id", F.row_number().over(w) - 1)
        return vocab.select("token", "token_id", "cnt")

    def expand(self, pcoll: PCollection) -> PCollection:
        self.vocab_df = self.fit(pcoll)
        return apply_vocabulary(pcoll, self.vocab_df, self.text_col, self.out_col)

    def save_artifact(self, path: str) -> None:
        self.vocab_df.coalesce(1).write.mode("overwrite").parquet(path)


def apply_vocabulary(pcoll: PCollection, vocab_df, text_col: str = "text",
                     out_col: str = "token_ids", id_col: str | None = None,
                     literal_max: int = 10_000) -> PCollection:
    """Apply a fitted vocabulary (OOV -> -1), preserving token order.

    Small vocabularies (<= ``literal_max`` entries) inline as a literal
    ``create_map`` — pure whole-stage-codegen lookup, no shuffle. Larger
    vocabularies go through posexplode -> broadcast-hash-join ->
    positional re-aggregation: the vocab ships as a broadcast TABLE
    (tens of MB at 1M tokens), never as a Catalyst literal (a 1M-entry
    literal map is a multi-hundred-MB plan / driver OOM).

    ``id_col`` names a unique row id used to re-assemble token arrays in
    the join path; when absent a monotonic id is stamped and the input
    persisted (monotonically_increasing_id is nondeterministic across
    recomputation, so the self-join must not recompute it).
    """
    from beam_spark.operators.text import tokens as _tokens

    n_vocab = vocab_df.limit(literal_max + 1).count()
    if n_vocab <= literal_max:
        rows = vocab_df.select("token", "token_id").collect()
        mapping = F.create_map(
            *[x for r in rows for x in (F.lit(r["token"]), F.lit(r["token_id"]))])
        ids = F.transform(_tokens(text_col),
                          lambda t: F.coalesce(mapping[t], F.lit(-1)).cast("int"))
        return pcoll.with_df(pcoll.df.withColumn(out_col, ids))

    df = pcoll.df
    uid = id_col or "__bs_vocab_uid"
    if id_col is None:
        df = df.withColumn(uid, F.monotonically_increasing_id())
        df.persist()
    toks = (df.select(uid, F.posexplode(_tokens(text_col))
                      .alias("__bs_pos", "token")))
    joined = toks.join(F.broadcast(vocab_df.select("token", "token_id")),
                       on="token", how="left")
    ids = (joined.groupBy(uid)
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("__bs_pos").alias("pos"),
               F.coalesce("token_id", F.lit(-1)).cast("int").alias("id"))))
               .alias("__bs_arr"))
           .select(uid, F.transform("__bs_arr", lambda s: s["id"]).alias(out_col)))
    out = (df.join(ids, on=uid, how="left")
           .withColumn(out_col, F.coalesce(out_col, F.array().cast("array<int>"))))
    if id_col is None:
        out = out.drop(uid)
    return pcoll.with_df(out)


class VocabularyArtifact:
    @staticmethod
    def load(spark, path: str):
        return spark.read.parquet(path)


class QuantileTransform(PTransform):
    """Quantile mapping onto a REFERENCE distribution (the sklearn
    QuantileTransformer / quantile-normalization idea): each value's
    percent rank within the input is looked up in the reference's
    empirical quantile function with linear interpolation —
    train/serve distribution matching, batch-effect correction, or
    mapping a new corpus's quality scores onto last month's scale.

        r    = percent_rank(v)            (exact (rank-1)/(n-1))
        pos  = r * (m - 1)                (m = reference row count)
        out  = ref[floor(pos)] + (pos - floor(pos))
               * (ref[floor(pos) + 1] - ref[floor(pos)])

    Deterministic BY CONSTRUCTION: the rank is an exact rational, and
    every float op after it is the same IEEE sequence in any engine —
    results compare UNROUNDED. Ties share a percent rank (rank
    semantics, matching SQL PERCENT_RANK). NULLs pass through as
    NULL. Single-row input maps to the reference minimum (percent
    rank 0); a single-row reference maps everything to that value.

    Scale: the reference is reduced to an indexed order-statistics
    frame with its lead value (one sort of the REFERENCE only —
    quantile-compress a huge reference upstream if needed); the input
    needs one value-ordered window for the rank (single-partition
    over the input: for unbounded inputs rank against a sampled or
    pre-aggregated distinct-value frame) and one broadcast-ready join
    on the floor index.

    Output: the input plus ``output_col`` (default ``{col}_q``).
    """

    def __init__(self, reference, col: str, ref_col: str | None = None,
                 output_col: str | None = None, label=None):
        super().__init__(label)
        self.reference = (reference.df
                          if isinstance(reference, PCollection)
                          else reference)
        self.col = col
        self.ref_col = ref_col or col
        self.output_col = output_col or f"{col}_q"

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        c, rc, oc = self.col, self.ref_col, self.output_col
        ref = (self.reference
               .where(F.col(rc).isNotNull())
               .select(F.col(rc).cast("double").alias("__rv")))
        wr = Window.orderBy("__rv")
        ref_ix = (ref.withColumn("__i", F.row_number().over(wr) - 1)
                  .withColumn("__nxt", F.lead("__rv").over(wr)))
        m = ref_ix.agg(F.count(F.lit(1)).cast("long").alias("__m"))
        wv = Window.orderBy(F.col(c).cast("double"))
        # percent_rank only over non-NULL values; NULLs re-attach
        nn = pcoll.df.where(F.col(c).isNotNull())
        nulls = pcoll.df.where(F.col(c).isNull())
        ranked = (nn.withColumn("__r", F.percent_rank().over(wv))
                  .crossJoin(F.broadcast(m))
                  .withColumn("__pos",
                              F.col("__r") * (F.col("__m") - 1)
                              .cast("double"))
                  .withColumn("__lo", F.floor("__pos").cast("long")))
        joined = (ranked.join(F.broadcast(ref_ix),
                              ranked["__lo"] == ref_ix["__i"], "left")
                  .withColumn(
                      oc,
                      F.when(F.col("__nxt").isNull(), F.col("__rv"))
                      .otherwise(F.col("__rv")
                                 + (F.col("__pos") - F.col("__lo"))
                                 * (F.col("__nxt") - F.col("__rv"))))
                  .drop("__r", "__m", "__pos", "__lo", "__i", "__rv",
                        "__nxt"))
        out = joined.unionByName(
            nulls.withColumn(oc, F.lit(None).cast("double")))
        return pcoll.with_df(out)


class TargetEncode(PTransform):
    """Smoothed target (mean) encoding of a categorical column — the
    tabular-ML feature transform (Micci-Barreca, SIGKDD Expl. 2001)
    that replaces a high-cardinality category with a shrunk estimate
    of the per-category target mean:

        enc(c) = (sum_c(y) + m * global_mean) / (n_c + m)

    ``loo=True`` switches to the leave-one-out variant (each row's own
    target is excluded — the standard leakage guard when the encoding
    feeds a model trained on the same rows):

        enc_loo = (sum_c(y) - y + m * global_mean) / (n_c - 1 + m)
        (NULL when the category is a singleton and m = 0)

    Target sums accumulate as exact decimals (``cast_to``); the final
    expression is double in fixed order. Unseen-category handling at
    serve time is the caller's join problem — this transform encodes
    the frame it is given. NULL is a real category: NULL-category
    rows group together and receive that group's encoding (the join
    back is null-safe); rows with a NULL TARGET are excluded from
    the sums but still receive their category's encoding.

    Scale: one partial-agg groupBy on the category (the per-category
    frame is vocabulary-bounded and broadcast back), one 1-row global
    aggregate; no windows, no Python.

    Output: input columns + ``<out_col>`` (round 9).
    """

    def __init__(self, cat_col: str, target: str, m: float = 10.0,
                 loo: bool = False, out_col: str | None = None,
                 cast_to: str = "decimal(18,6)", label=None):
        super().__init__(label)
        self.cat_col, self.target = cat_col, target
        self.m = float(m)
        if self.m < 0:
            raise ValueError("m must be >= 0")
        self.loo = bool(loo)
        self.out_col = out_col or f"{cat_col}_enc"
        self.cast_to = cast_to

    def expand(self, pcoll: PCollection) -> PCollection:
        c, y, m = self.cat_col, self.target, self.m
        df = pcoll.df
        yd = F.col(y).cast(self.cast_to)
        per = (df.where(F.col(y).isNotNull())
               .groupBy(F.col(c).alias("__cat"))
               .agg(F.sum(yd).alias("__s"),
                    F.count(yd).cast("long").alias("__n")))
        glob = (df.where(F.col(y).isNotNull())
                .agg(F.sum(yd).alias("__gs"),
                     F.count(yd).cast("long").alias("__gn")))
        gm = F.col("__gs").cast("double") / F.col("__gn").cast("double")
        # null-safe equality: a NULL category is a real group (the
        # groupBy above computes its encoding) and must receive it —
        # plain equality would leave NULL-category rows unmatched
        joined = (df.join(F.broadcast(per),
                          df[c].eqNullSafe(F.col("__cat")), "left")
                  .crossJoin(F.broadcast(glob)))
        s = F.col("__s").cast("double")
        n = F.col("__n").cast("double")
        if self.loo:
            yv = F.col(y).cast("double")
            denom = n - 1.0 + F.lit(m)
            enc = F.when(F.col(y).isNotNull() & (denom > 0.0),
                         (s - yv + F.lit(m) * gm) / denom)
        else:
            enc = F.when(F.col("__n").isNotNull(),
                         (s + F.lit(m) * gm) / (n + F.lit(m)))
        out = (joined.withColumn(self.out_col, F.round(enc, 9))
               .drop("__cat", "__s", "__n", "__gs", "__gn"))
        return pcoll.with_df(out)


class WoeIv(PTransform):
    """Weight of evidence + information value of a categorical
    feature against a binary label — the credit-scoring / feature-
    screening standard (Siddiqi 2006), one aggregation pass:

        woe(c) = ln( ((pos_c + a) / (pos + 2a))
                   / ((neg_c + a) / (neg + 2a)) )
        iv     = sum_c (pos_share_c - neg_share_c) * woe(c)

    ``alpha`` (default 0.5, dyadic) is the Laplace smoothing that
    keeps single-sided categories finite. Counts are exact integers;
    each category's woe and iv term is a fixed-order double; the iv
    SUM runs over decimal(16,9)-cast terms so category order cannot
    change it (the NaiveBayes convention).

    Scale: one (category) groupBy + a 1-row broadcast of the global
    counts; category frame is vocabulary-bounded.

    Output (``mode='categories'``, default): one row per category —
    (category, n, pos, neg, woe round 9). ``mode='iv'``: one report
    row — (n_categories, iv round 9).
    """

    def __init__(self, cat_col: str, label_col: str,
                 alpha: float = 0.5, mode: str = "categories",
                 label=None):
        super().__init__(label)
        self.cat_col, self.label_col = cat_col, label_col
        self.alpha = float(alpha)
        if self.alpha < 0:
            raise ValueError("alpha must be >= 0")
        if mode not in ("categories", "iv"):
            raise ValueError("mode must be 'categories' or 'iv'")
        self.mode = mode

    def expand(self, pcoll: PCollection) -> PCollection:
        c, lc, a = self.cat_col, self.label_col, self.alpha
        df = pcoll.df.where(F.col(c).isNotNull()
                            & F.col(lc).isNotNull())
        y = F.col(lc).cast("boolean").cast("long")
        per = (df.groupBy(F.col(c).alias("category"))
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum(y).cast("long").alias("pos")))
        per = per.withColumn("neg", F.col("n") - F.col("pos"))
        tot = per.agg(F.sum("pos").cast("long").alias("__P"),
                      F.sum("neg").cast("long").alias("__N"))
        j = per.crossJoin(F.broadcast(tot))
        ps = ((F.col("pos").cast("double") + F.lit(a))
              / (F.col("__P").cast("double") + F.lit(2 * a)))
        ns = ((F.col("neg").cast("double") + F.lit(a))
              / (F.col("__N").cast("double") + F.lit(2 * a)))
        woe = F.log(ps / ns)
        if self.mode == "categories":
            out = j.select("category", "n", "pos", "neg",
                           F.round(woe, 9).alias("woe"))
            return pcoll.with_df(out)
        term = ((ps - ns) * woe).cast("decimal(16,9)")
        out = j.agg(
            F.count(F.lit(1)).cast("long").alias("n_categories"),
            F.round(F.sum(term).cast("double"), 9).alias("iv"))
        return pcoll.with_df(out)
