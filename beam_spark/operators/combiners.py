"""Built-in combiners (SURVEY.md §2.3).

Beam reference: transforms/combiners.py — Count (:134), Mean (:87),
Top (:188), Sample (:558), ToList/ToDict/ToSet (:734), Latest (:924),
TupleCombineFn (:639); SQL aggregations BeamBuiltinAggregations.java:60-91,
CountIf.java, ArrayAgg/StringAgg udafs.

All map to native Catalyst aggregates (map-side partial aggregation,
whole-stage codegen); none of Beam's Python accumulator machinery is
needed. TupleCombineFn == multiple aggs in one .agg() call.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform
from beam_spark.operators.group import CombineGlobally, CombinePerKey


class Count:
    """combiners.py:134-187."""

    @staticmethod
    def Globally(label=None) -> PTransform:
        return CombineGlobally(count=F.count("*"), label=label)

    @staticmethod
    def PerKey(*keys: str, label=None) -> PTransform:
        return CombinePerKey(*keys, count=F.count("*"), label=label)

    @staticmethod
    def PerElement(*cols: str, label=None) -> PTransform:
        """Count occurrences of each distinct element."""
        return CombinePerKey(*cols, count=F.count("*"), label=label)


class Mean:
    """combiners.py:87-133."""

    @staticmethod
    def Globally(col: str, label=None) -> PTransform:
        return CombineGlobally(mean=F.avg(col), label=label)

    @staticmethod
    def PerKey(keys, col: str, label=None) -> PTransform:
        keys = [keys] if isinstance(keys, str) else list(keys)
        return CombinePerKey(*keys, mean=F.avg(col), label=label)


class Top:
    """combiners.py:188-557 — delegate to sort.TopK/TopKPerKey
    (TakeOrderedAndProject / windowed row_number; same per-bundle-heap
    strategy Beam uses, executed natively)."""

    @staticmethod
    def Of(k: int, *order_by, label=None) -> PTransform:
        """Beam Top.Of/Largest contract: the k LARGEST by the given
        column(s) — bare column names sort descending here (explicit
        ``Column``/" asc"/" desc" specs are honored as written)."""
        from beam_spark.operators.sort import TopK

        specs = [F.col(s).desc() if isinstance(s, str)
                 and not s.lower().endswith((" asc", " desc")) else s
                 for s in order_by]
        return TopK(k, *specs, label=label)

    Largest = Of

    @staticmethod
    def Smallest(k: int, col: str, label=None) -> PTransform:
        """The k smallest (ascending natural order)."""
        from beam_spark.operators.sort import TopK
        return TopK(k, col, label=label)

    @staticmethod
    def PerKey(keys, k: int, *order_by, label=None) -> PTransform:
        from beam_spark.operators.sort import TopKPerKey
        return TopKPerKey(keys, k, *order_by, label=label)


class Sample:
    """combiners.py:558-638 — exact-size uniform sample.

    Implementation: rand(seed) sort-limit (two-pass exact size, the
    reservoir equivalent). ``df.sample`` is cheaper but approximate-size;
    we follow Beam's exact-n contract.
    """

    @staticmethod
    def FixedSizeGlobally(n: int, seed: int = 42, label=None) -> PTransform:
        from beam_spark.operators.sort import TopK
        class _S(PTransform):
            def expand(self, pcoll):
                df = pcoll.df.withColumn("__r", F.rand(seed))
                out = df.orderBy("__r").limit(n).drop("__r")
                return pcoll.with_df(out)
        return _S(label)

    @staticmethod
    def FixedSizePerKey(keys, n: int, seed: int = 42, label=None) -> PTransform:
        from beam_spark.operators.sort import TopKPerKey
        class _S(PTransform):
            def expand(self, pcoll):
                from pyspark.sql import Window
                ks = [keys] if isinstance(keys, str) else list(keys)
                w = Window.partitionBy(*ks).orderBy(F.rand(seed))
                df = (pcoll.df.withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") <= n).drop("__rn"))
                return pcoll.with_df(df)
        return _S(label)


class ToList(PTransform):
    """combiners.py:734 — materialize all rows of a column into one array.
    Driver-memory bound by design (same caveat as Beam)."""

    def __init__(self, col: str, sort: bool = True, label=None):
        super().__init__(label)
        self.col, self.sort = col, sort

    def expand(self, pcoll: PCollection) -> PCollection:
        agg = F.collect_list(self.col)
        if self.sort:
            agg = F.sort_array(agg)
        return pcoll.with_df(pcoll.df.agg(agg.alias("values")))


class ToSet(PTransform):
    def __init__(self, col: str, label=None):
        super().__init__(label)
        self.col = col

    def expand(self, pcoll: PCollection) -> PCollection:
        return pcoll.with_df(
            pcoll.df.agg(F.sort_array(F.collect_set(self.col)).alias("values")))


class ToDict(PTransform):
    """combiners.py ToDict — key/value pairs to one map (last wins)."""

    def __init__(self, key_col: str = "key", value_col: str = "value", label=None):
        super().__init__(label)
        self.key_col, self.value_col = key_col, value_col

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df.agg(
            F.map_from_entries(
                F.collect_list(F.struct(self.key_col, self.value_col))).alias("dict"))
        return pcoll.with_df(df)


class Latest:
    """combiners.py:924-990 — value with max event timestamp: F.max_by.
    ``tiebreak`` adds a deterministic secondary order (Beam leaves ties
    arbitrary)."""

    @staticmethod
    def Globally(value_col: str, ts_col: str, tiebreak: str | None = None,
                 label=None) -> PTransform:
        ordc = F.struct(ts_col, tiebreak) if tiebreak else F.col(ts_col)
        return CombineGlobally(latest=F.max_by(value_col, ordc), label=label)

    @staticmethod
    def PerKey(keys, value_col: str, ts_col: str, tiebreak: str | None = None,
               label=None) -> PTransform:
        ks = [keys] if isinstance(keys, str) else list(keys)
        ordc = F.struct(ts_col, tiebreak) if tiebreak else F.col(ts_col)
        return CombinePerKey(*ks, latest=F.max_by(value_col, ordc), label=label)


def count_if(cond: str | Column) -> Column:
    """CountIf.java — conditional count."""
    c = F.expr(cond) if isinstance(cond, str) else cond
    return F.count_if(c)


def string_agg(col: str, sep: str = ",", sort: bool = True) -> Column:
    """StringAgg.java — deterministic via sorted collect."""
    arr = F.collect_list(col)
    if sort:
        arr = F.sort_array(arr)
    return F.array_join(arr, sep)


def array_agg(col: str, sort: bool = True) -> Column:
    """ArrayAgg.java."""
    arr = F.collect_list(col)
    return F.sort_array(arr) if sort else arr


class HashSample(PTransform):
    """Deterministic stratified sampling — the language/domain-balanced
    subsample step of a training-data pipeline. Unlike rand()-based
    Sample, the keep decision is a pure function of the row id
    (md5-derived uniform in [0,1)), so runs are reproducible across
    engines, retries, and partitionings, and the SAME sample is drawn
    at any scale factor. Zero-shuffle map-side filter.

    ``fractions``: {stratum_value: keep_fraction}; ``default`` applies
    to unlisted strata.
    """

    def __init__(self, stratify_col: str, fractions: dict,
                 id_col: str, default: float = 0.0, label=None):
        super().__init__(label)
        self.stratify_col, self.id_col = stratify_col, id_col
        self.fractions, self.default = dict(fractions), default

    def expand(self, pcoll: PCollection) -> PCollection:
        # uniform hash bucket in [0, 10000): first 8 md5 hex chars
        bucket = F.expr(
            f"CAST(conv(substring(md5(CAST({self.id_col} AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT) % 10000")
        frac = F.lit(self.default)
        for stratum, f_keep in self.fractions.items():
            frac = F.when(F.col(self.stratify_col) == stratum,
                          F.lit(f_keep)).otherwise(frac)
        # round() before the cast: the keep threshold is computed in
        # binary floats, so e.g. 0.15 * 10000 = 1499.999... and a bare
        # cast truncates to 1499/10000 — off by one bucket vs exact
        # decimal arithmetic
        out = pcoll.df.filter(bucket < F.round(frac * 10000).cast("bigint"))
        return pcoll.with_df(out)


class LeakageSafeSplit(PTransform):
    """Deterministic train/val/test assignment by GROUP hash — the
    split discipline a dedup-aware pipeline needs: hashing row ids
    puts two near-duplicates on opposite sides of the split
    (train/test contamination, the thing decontamination removes
    against external benchmarks but naive splitting re-creates
    internally). Hashing a GROUP key instead — the exact-dedup
    content_md5, a connected-component id, a source domain — keeps
    every member of a group in the SAME split.

    Assignment: md5(group) uniform bucket in [0, 10000); split s_i
    owns [sum(f_0..f_{i-1}), sum(f_0..f_i)) * 10000 with the
    HashSample round-before-cast boundary convention. Fractions must
    sum to <= 1; any remainder is assigned NULL (held out). NULL
    group keys get NULL split (fail-safe: never silently pooled).
    Zero-shuffle map-side projection.

    Output: input columns + ``split_col`` string.
    """

    def __init__(self, group_col: str, fractions: dict,
                 split_col: str = "split", label=None):
        super().__init__(label)
        self.group_col, self.split_col = group_col, split_col
        self.fractions = dict(fractions)
        if not self.fractions:
            raise ValueError("need at least one split fraction")
        tot = 0.0
        for name, f in self.fractions.items():
            if not 0.0 < float(f) <= 1.0:
                raise ValueError(
                    f"fraction {name}={f} outside (0, 1]")
            tot += float(f)
        if tot > 1.0 + 1e-9:
            raise ValueError(f"fractions sum to {tot} > 1")

    def expand(self, pcoll: PCollection) -> PCollection:
        g = self.group_col
        bucket = F.expr(
            f"CAST(conv(substring(md5(CAST({g} AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT) % 10000")
        expr = F.lit(None).cast("string")
        hi = 0.0
        # assign from the LAST range backwards so the when-chain
        # stays flat: split_i wins when bucket < upper_i and no
        # earlier (smaller-upper) split claimed it
        cuts = []
        for name, f in self.fractions.items():
            hi += float(f)
            cuts.append((name, hi))
        for name, upper in reversed(cuts):
            expr = F.when(
                bucket < F.round(F.lit(upper) * 10000).cast("bigint"),
                F.lit(name)).otherwise(expr)
        expr = F.when(F.col(g).isNull(),
                      F.lit(None).cast("string")).otherwise(expr)
        return pcoll.with_df(
            pcoll.df.withColumn(self.split_col, expr))


class TemperatureSample(PTransform):
    """Temperature-based domain rebalancing — the multilingual /
    multi-source mixing step of a training-data pipeline: target domain
    shares follow p_i ∝ n_i^alpha (alpha=1 keeps natural proportions,
    alpha→0 flattens toward uniform), and each domain is downsampled
    deterministically to hit its share of ``target_frac * N`` rows in
    expectation.

    keep_rate_i = min(1, p_i * target_frac * N / n_i); the keep decision
    per row is the same md5-hash uniform as HashSample — reproducible
    across engines, retries, partitionings, and scale factors.

    Scale design: one tiny aggregate (domain counts — thousands of rows)
    computed ONCE, rates derived on the driver-free plan side and
    broadcast back onto the stream; the filter itself is map-side.

    Cross-engine determinism note: the rate passes through
    floor(rate * 1e6 + 0.5) so an oracle recomputing it in another
    engine compares integers, not raw doubles (pow() may differ in the
    last ulp across libms; a 1e-6 rate grid absorbs that).
    """

    def __init__(self, domain_col: str, id_col: str, alpha: float = 0.5,
                 target_frac: float = 0.5, label=None):
        super().__init__(label)
        self.domain_col, self.id_col = domain_col, id_col
        self.alpha, self.target_frac = float(alpha), float(target_frac)

    def expand(self, pcoll: PCollection) -> PCollection:
        dc, ic = self.domain_col, self.id_col
        df = pcoll.df
        # p_i = n_i^alpha / sum_j n_j^alpha; rate on a 1e-6 grid
        weights = df.groupBy(dc).agg(
            F.count("*").alias("__n"),
            F.pow(F.count("*"), F.lit(self.alpha)).alias("__w"))
        stats = weights.groupBy().agg(F.sum("__n").alias("__N"),
                                      F.sum("__w").alias("__wsum"))
        rate = F.least(
            F.lit(1.0),
            (weights["__w"] / stats["__wsum"])
            * F.lit(self.target_frac) * stats["__N"] / weights["__n"])
        rates = (weights.crossJoin(F.broadcast(stats))
                 .select(F.col(dc),
                         F.floor(rate * 1_000_000 + F.lit(0.5))
                         .cast("bigint").alias("__rate_ppm")))
        bucket = F.expr(
            f"CAST(conv(substring(md5(CAST({ic} AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT) % 1000000")
        out = (df.join(F.broadcast(rates), dc)
               .filter(bucket < F.col("__rate_ppm"))
               .drop("__rate_ppm"))
        return pcoll.with_df(out)


class StratifiedSample(PTransform):
    """Exact-size stratified sampling: keep exactly ``n`` rows (or an
    exact ``fraction``) PER STRATUM, chosen by md5-hash order of the
    id — fully deterministic (no RNG), reproducible across engines,
    retries and partitionings, and stable under corpus growth in the
    sense that the selection is a pure function of the stratum's id
    set. The exactness rand()-based ``sampleBy`` lacks: per-stratum
    counts are guaranteed, not expected values.

    ``n``: int (same size for every stratum) or {stratum_value: n}
    (strata absent from the dict are dropped); or ``fraction``: exact
    ceil(fraction * stratum_size) rows. Exactly one of the two.

    Scale: one hash-partitioned window per stratum (distributed across
    strata — the skew unit is the largest stratum, same as any groupBy
    on the stratum key); no global sort, no collect.
    """

    def __init__(self, stratum_col: str, id_col: str, n=None,
                 fraction: float | None = None, label=None):
        super().__init__(label)
        if (n is None) == (fraction is None):
            raise ValueError("pass exactly one of n= / fraction=")
        self.stratum_col, self.id_col = stratum_col, id_col
        self.n, self.fraction = n, fraction

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        df = pcoll.df
        h = F.md5(F.col(self.id_col).cast("string"))
        part = Window.partitionBy(self.stratum_col)
        rn = F.row_number().over(part.orderBy(h, F.col(self.id_col)))
        out = df.withColumn("__rn", rn)
        if self.fraction is not None:
            out = out.withColumn(
                "__cnt", F.count(F.lit(1)).over(part))
            keep = (F.col("__rn")
                    <= F.ceil(F.col("__cnt") * float(self.fraction)))
        elif isinstance(self.n, dict):
            limit = F.lit(None).cast("bigint")
            for s, k in self.n.items():
                limit = F.when(F.col(self.stratum_col) == s,
                               F.lit(int(k))).otherwise(limit)
            keep = F.col("__rn") <= limit     # NULL limit drops stratum
        else:
            keep = F.col("__rn") <= int(self.n)
        return pcoll.with_df(
            out.filter(keep).drop("__rn", "__cnt"))


class WeightedSample(PTransform):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006 via the exponential race): each row
    derives a pseudo-random uniform from the md5 of its id (no RNG
    state — reproducible across engines, retries, partitionings) and
    an exponential key ``-ln(u) / weight``; the ``n`` smallest keys
    win (per stratum when given) — inclusion odds proportional to
    weight, sample sizes exact. Rows with weight <= 0 or NULL never
    win (they are excluded, the standard convention).

    Ranking uses the ROUNDED key (6 dp) with id tie-break, the
    repo-wide pattern that keeps float ranking reproducible across
    engines.

    Scale: one zero-shuffle key expression + one window per stratum;
    unstratified, a genuine two-stage top-n — per-partition prune to n
    inside mapInPandas (narrow), then one tiny global window over the
    <= n * num_partitions survivors — never a single-task global sort.
    """

    def __init__(self, n: int, weight_col: str, id_col: str,
                 stratum_col: str | None = None, label=None):
        super().__init__(label)
        if n < 1:
            raise ValueError("n must be >= 1")
        self.n, self.weight_col, self.id_col = int(n), weight_col, id_col
        self.stratum_col = stratum_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        idc, wc = self.id_col, self.weight_col
        u = ((F.expr(
            f"CAST(conv(substring(md5(CAST({idc} AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT)") + 0.5) / 4294967296.0)
        key = F.round(-F.log(u) / F.col(wc).cast("double"), 6)
        df = (pcoll.df
              .where(F.col(wc).isNotNull() & (F.col(wc) > 0))
              .withColumn("__k", key))
        if self.stratum_col:
            part = Window.partitionBy(self.stratum_col)
            rn = F.row_number().over(part.orderBy("__k", F.col(idc)))
            return pcoll.with_df(df.withColumn("__rn", rn)
                                 .filter(F.col("__rn") <= self.n)
                                 .drop("__k", "__rn"))
        # Unstratified: a bare Window.partitionBy() funnels every row
        # through ONE task. Two-stage top-n instead: stage 1 prunes
        # each input partition to its local top-n inside mapInPandas
        # (narrow — no shuffle, O(n) state per partition); stage 2
        # ranks the <= n * num_partitions survivors in a single tiny
        # window. Global order (__k, id) is total, so the global
        # top-n is contained in the union of per-partition top-ns.
        import pandas as pd

        n = self.n
        schema = df.schema

        def prune(batches):
            best = None
            for pdf in batches:
                cand = pdf if best is None else pd.concat(
                    [best, pdf], ignore_index=True)
                best = cand.sort_values(["__k", idc],
                                        kind="mergesort").head(n)
            if best is not None:
                yield best

        pruned = df.mapInPandas(prune, schema)
        rn = F.row_number().over(
            Window.partitionBy().orderBy("__k", F.col(idc)))
        return pcoll.with_df(pruned.withColumn("__rn", rn)
                             .filter(F.col("__rn") <= self.n)
                             .drop("__k", "__rn"))


class SplitByHash(PTransform):
    """Deterministic train/val/test split: each row's split label is a
    pure function of its id (the same md5-bucket uniform HashSample
    uses), so the assignment is reproducible across engines, retries,
    partitionings, and scale factors, and a row NEVER migrates between
    splits when the corpus grows — the property rand()-based splits
    lack. Zero-shuffle map-side projection.

    ``splits``: ordered {label: fraction}; fractions must sum to <= 1
    (on the 1/10000 bucket grid); rows past the cumulative end get a
    NULL label (an explicit holdout).
    """

    def __init__(self, splits: dict, id_col: str, out_col: str = "split",
                 label=None):
        super().__init__(label)
        self.splits, self.id_col, self.out_col = dict(splits), id_col, out_col
        total = sum(round(f * 10000) for f in self.splits.values())
        if total > 10000:
            raise ValueError(f"split fractions sum past 1.0: {self.splits}")

    def expand(self, pcoll: PCollection) -> PCollection:
        bucket = F.expr(
            f"CAST(conv(substring(md5(CAST({self.id_col} AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT) % 10000")
        expr = F.lit(None).cast("string")
        cum = 0
        bounds = []
        for name, frac in self.splits.items():
            cum += int(round(frac * 10000))
            bounds.append((name, cum))
        for name, b in reversed(bounds):
            expr = F.when(bucket < b, F.lit(name)).otherwise(expr)
        return pcoll.with_df(pcoll.df.withColumn(self.out_col, expr))


class RepeatByWeight(PTransform):
    """Epoch-style corpus mixing by UP-sampling — the repetition
    counterpart of TemperatureSample's down-sampling: a row with
    weight w appears floor(w) times plus one more with probability
    frac(w), so expected multiplicity is exactly w ("0.4 epochs of
    source A, 2.5 epochs of source B" — the published-mixture recipe
    of LLM training runs). The fractional coin is the md5-uniform of
    the id (the HashSample bucket), so multiplicities are
    deterministic across engines, retries, and partitionings, and a
    row's repeat count never changes when the corpus grows.

    Rows with NULL or <= 0 effective count disappear (w < 1 rows keep
    a frac(w) chance of one copy). Output: input columns + ``out_col``
    (1..k, the epoch index). Zero-shuffle: one expression + explode.
    """

    def __init__(self, weight_col: str, id_col: str,
                 out_col: str = "epoch", label=None):
        super().__init__(label)
        self.weight_col, self.id_col = weight_col, id_col
        self.out_col = out_col

    def expand(self, pcoll: PCollection) -> PCollection:
        w = F.col(self.weight_col).cast("double")
        bucket = F.expr(
            f"CAST(conv(substring(md5(CAST({self.id_col} AS STRING)),"
            f" 1, 8), 16, 10) AS BIGINT) % 10000")
        frac = w - F.floor(w)
        # round() before the cast — same binary-float boundary fix as
        # HashSample (0.15 * 10000 = 1499.999...)
        k = (F.floor(w).cast("int")
             + (bucket < F.round(frac * 10000).cast("bigint"))
             .cast("int"))
        out = (pcoll.df.withColumn("__k", k)
               .filter(F.col("__k") >= 1)
               .withColumn(self.out_col,
                           F.explode(F.expr("sequence(1, __k)")))
               .drop("__k"))
        return pcoll.with_df(out)
