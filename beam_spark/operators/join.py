"""Joins (SURVEY.md §2.4).

Beam reference: join-library Join.innerJoin/leftOuterJoin/rightOuterJoin/
fullOuterJoin (sdks/java/extensions/join-library/.../Join.java:46-465, all
CoGBK-based, equi-joins only); SQL planning BeamJoinRel.java:47-58 with
CoGBK / SideInput (broadcast) / SeekableLookup strategies.

Spark design: ``df.join`` — Catalyst picks broadcast-hash / sort-merge /
shuffled-hash and reorders; AQE converts to broadcast at runtime when a
side turns out small and splits skewed partitions. We expose:

* ``Join(other, on, how)`` — the 4 Beam join types + semi/anti/cross extras
  Beam lacks (theta joins come free via ``condition=``).
* ``broadcast=True`` — Beam's side-input join (BeamSideInputJoinRel.java),
  an explicit hint for dimension tables.
* ``LookupJoin`` — Beam's seekable-table lookup join
  (BeamSideInputLookupJoinRel.java): per-batch Python lookups inside
  mapInPandas for external stores.
* ``salted_join`` — explicit skew mitigation for when AQE isn't enough:
  replicates the small side R ways and salts the big side's key.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform

_BEAM_HOW = {
    "inner": "inner", "left": "left", "left_outer": "left",
    "right": "right", "right_outer": "right",
    "full": "full_outer", "full_outer": "full_outer",
    "semi": "left_semi", "anti": "left_anti", "cross": "cross",
}


class Join(PTransform):
    """Equi/theta join. ``on`` is a column name list (equi) or ``condition``
    an arbitrary Column (theta — Beam only reaches these via Calcite's
    driver-local enumerable path; Spark executes them distributed)."""

    def __init__(self, right: PCollection | DataFrame, on: Sequence[str] | str | None = None,
                 how: str = "inner", condition: Column | None = None,
                 broadcast: bool = False, label=None):
        super().__init__(label)
        self.right = right.df if isinstance(right, PCollection) else right
        self.on = [on] if isinstance(on, str) else on
        self.how = _BEAM_HOW.get(how, how)
        self.condition = condition
        self.broadcast = broadcast

    def expand(self, pcoll: PCollection) -> PCollection:
        right = F.broadcast(self.right) if self.broadcast else self.right
        if self.condition is not None:
            out = pcoll.df.join(right, on=self.condition, how=self.how)
        elif self.on:
            out = pcoll.df.join(right, on=self.on, how=self.how)
        else:
            out = pcoll.df.crossJoin(right)
        return pcoll.with_df(out)


class LookupJoin(PTransform):
    """Per-element lookup into an external keyed store
    (BeamSideInputLookupJoinRel.java:149 / BeamSqlSeekableTable).

    ``lookup_fn(keys: list) -> dict[key, value-dict]`` is called once per
    Arrow batch (not per row); results are appended as columns. For stores
    that fit in memory, prefer Join(broadcast=True).
    """

    def __init__(self, key_col: str, lookup_fn: Callable[[list], dict],
                 output_schema, label=None):
        super().__init__(label)
        self.key_col, self.lookup_fn = key_col, lookup_fn
        self.output_schema = output_schema

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        key_col, lookup_fn = self.key_col, self.lookup_fn
        in_cols = pcoll.df.columns

        def gen(batches):
            for pdf in batches:
                found = lookup_fn(pdf[key_col].tolist())
                extra = pd.DataFrame([found.get(k) or {} for k in pdf[key_col]])
                yield pd.concat([pdf.reset_index(drop=True), extra], axis=1)

        return pcoll.with_df(pcoll.df.mapInPandas(gen, schema=self.output_schema))


def salted_join(big: DataFrame, small: DataFrame, on: str, how: str = "inner",
                salt: int = 16) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key into ``salt``
    buckets and replicate the small side per bucket. Beam's analog is
    hot-key fanout (core.py:3321); on Spark prefer AQE skew-join first and
    reach for this only when one key dominates a stage.

    Only inner/left are supported: the small side is replicated once per
    salt bucket, so right/full outer would emit unmatched small-side rows
    up to ``salt`` times."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(replicated small side would duplicate unmatched rows)")
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    salts = small.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
    salted_small = small.crossJoin(F.broadcast(salts))
    out = salted_big.join(salted_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def recommended_salt(df: DataFrame, on, target_skew: float = 4.0,
                     cap: int = 64) -> int:
    """Skew advisor for ``salted_join``: profile the key distribution
    (quality.SkewProfile) and return the salt factor that brings the
    heaviest key's max/mean ratio down to about ``target_skew``:

        salt = ceil(skew_ratio / target_skew), clamped to [1, cap]

    1 means the key is balanced enough — use a plain join (AQE's
    runtime skew split handles residual imbalance). This is ONE
    aggregation over the key column (an eager action — run it on a
    sample or a stats table when profiling the full input is itself
    expensive).
    """
    import math

    from beam_spark.operators.quality import SkewProfile
    from beam_spark.pcollection import PCollection

    if not float(target_skew) >= 1.0:
        raise ValueError(f"target_skew {target_skew}: need >= 1")
    row = (PCollection(df) | SkewProfile(on)).df.collect()[0]
    if row["skew_ratio"] is None:       # empty input: nothing to salt
        return 1
    return max(1, min(int(cap),
                      math.ceil(row["skew_ratio"] / float(target_skew))))


class Enrichment(PTransform):
    """Keyed enrichment against an external handler with caching and
    batched calls (transforms/enrichment.py:103 + RequestResponseIO
    io/requestresponse.py).

    ``handler(keys: list) -> dict[key, dict]`` is called once per Arrow
    batch with only the keys missed by the per-worker LRU cache;
    ``throttle_qps`` rate-limits handler calls per worker. For dimension
    tables that fit in memory use Join(broadcast=True) instead.
    """

    def __init__(self, key_col: str, handler: Callable[[list], dict],
                 output_schema, cache_size: int = 10000,
                 throttle_qps: float | None = None, label=None):
        super().__init__(label)
        self.key_col, self.handler = key_col, handler
        self.output_schema = output_schema
        self.cache_size, self.throttle_qps = cache_size, throttle_qps

    def expand(self, pcoll: PCollection) -> PCollection:
        import time as _time

        import pandas as pd

        key_col, handler = self.key_col, self.handler
        cache_size, qps = self.cache_size, self.throttle_qps

        def gen(batches):
            from collections import OrderedDict

            cache: "OrderedDict" = OrderedDict()
            last_call = [0.0]
            for pdf in batches:
                missing = [k for k in dict.fromkeys(pdf[key_col]) if k not in cache]
                if missing:
                    if qps:
                        wait = last_call[0] + 1.0 / qps - _time.monotonic()
                        if wait > 0:
                            _time.sleep(wait)
                    fetched = handler(missing)
                    last_call[0] = _time.monotonic()
                    for k in missing:
                        cache[k] = fetched.get(k) or {}
                        cache.move_to_end(k)
                    while len(cache) > cache_size:
                        cache.popitem(last=False)
                extra = pd.DataFrame([cache.get(k, {}) for k in pdf[key_col]])
                yield pd.concat([pdf.reset_index(drop=True), extra], axis=1)

        return pcoll.with_df(pcoll.df.mapInPandas(gen, schema=self.output_schema))


class AsOfJoin(PTransform):
    """Time-series as-of join: each left row picks the LATEST right row
    with ``right_ts <= left_ts`` for the same key (``direction=
    'backward'``, the pandas ``merge_asof`` default; ``'forward'``
    mirrors to the earliest right row with ``right_ts >= left_ts``).
    Unmatched left rows keep NULL right columns (left-join semantics).
    ``tolerance`` (seconds) voids matches further away than the bound.

    Spark-first design — the union + last-value window trick, NOT a
    pairwise join: right rows are tagged and UNIONED with left rows,
    one sort per key over the merged timeline stamps every left row
    with the running last right payload. One shuffle on the key, no
    per-key cross-product (a range theta-join explodes on hot keys),
    no Python. Beam has no as-of operator (SURVEY §2.4 bonus row);
    users hand-roll this same trick over GroupByKey.

    Ties (right_ts == left_ts) match, per the standard inclusive
    semantics. Duplicate right timestamps per key: the LAST one in
    ``(right_ts, order of union)`` wins — dedupe the right side first
    for full determinism (the gate query does max_by).
    """

    def __init__(self, right: DataFrame, on, left_ts: str,
                 right_ts: str | None = None, direction: str = "backward",
                 tolerance: float | None = None, suffix: str = "_r",
                 label=None):
        super().__init__(label)
        if direction not in ("backward", "forward"):
            raise ValueError("direction must be 'backward' or 'forward'")
        self.right = right
        self.on = [on] if isinstance(on, str) else list(on)
        self.left_ts = left_ts
        self.right_ts = right_ts or left_ts
        self.direction = direction
        self.tolerance = tolerance
        self.suffix = suffix

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql.window import Window

        keys = self.on
        left, right = pcoll.df, self.right
        rpay = [c for c in right.columns if c not in keys]
        lcols = list(left.columns)

        # merged timeline in event-time micros; forward = backward on
        # the negated axis
        sign = -1 if self.direction == "forward" else 1
        t_us = lambda c: F.unix_micros(F.col(c).cast("timestamp")) * sign  # noqa: E731

        l_tag = (left
                 .withColumn("__t", t_us(self.left_ts))
                 .withColumn("__tag", F.lit(1))
                 .withColumn("__rp", F.lit(None).cast(
                     "struct<" + ",".join(
                         f"`{c}`:{right.schema[c].dataType.simpleString()}"
                         for c in rpay) + ">"))
                 .select(*keys, "__t", "__tag", "__rp",
                         F.struct(*lcols).alias("__lp")))
        r_tag = (right
                 .withColumn("__t", t_us(self.right_ts))
                 .withColumn("__tag", F.lit(0))
                 .select(*keys, "__t", "__tag",
                         F.struct(*rpay).alias("__rp"),
                         F.lit(None).cast(
                             l_tag.schema["__lp"].dataType).alias("__lp")))

        merged = l_tag.unionByName(r_tag)
        # right rows (tag 0) sort before left rows at equal time, so an
        # exact-tie right row is visible to the left row (inclusive)
        w = (Window.partitionBy(*keys).orderBy("__t", "__tag")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        stamped = (merged
                   .withColumn("__last_rp",
                               F.last("__rp", ignorenulls=True).over(w))
                   .withColumn("__last_rt", F.last(
                       F.when(F.col("__tag") == 0, F.col("__t")),
                       ignorenulls=True).over(w)))
        out = stamped.filter(F.col("__tag") == 1)
        if self.tolerance is not None:
            tol_us = int(self.tolerance * 1_000_000)
            in_tol = (F.col("__t") - F.col("__last_rt")) <= tol_us
            out = out.withColumn(
                "__last_rp", F.when(in_tol, F.col("__last_rp")))
        cols = [F.col("__lp")[c].alias(c) for c in lcols]
        cols += [F.col("__last_rp")[c].alias(
            c + (self.suffix if c in lcols else "")) for c in rpay]
        return pcoll.with_df(out.select(*cols))


class IntervalJoin(PTransform):
    """Flink-style interval join: pair each left row with every right
    row of the same key whose time lies in
    ``[left_ts + lower, left_ts + upper]`` seconds (bounds inclusive,
    ``lower`` usually negative). Inner-join semantics.

    Spark-first design: a naive key equi-join + range filter computes a
    full per-key cross product before filtering — quadratic on hot
    keys. Instead both sides are bucketed by a window of width
    ``upper - lower``: a left row can only match rights in (at most)
    two adjacent buckets, so it is exploded to those bucket ids and the
    join runs on (key, bucket) with the exact range re-checked. Join
    fan-in is bounded by rows-per-bucket, not rows-per-key. All
    expressions, no Python.
    """

    def __init__(self, right: DataFrame, on, left_ts: str,
                 right_ts: str | None = None, lower: float = -60.0,
                 upper: float = 0.0, suffix: str = "_r", label=None):
        super().__init__(label)
        if upper < lower:
            raise ValueError("upper must be >= lower")
        self.right = right
        self.on = [on] if isinstance(on, str) else list(on)
        self.left_ts = left_ts
        self.right_ts = right_ts or left_ts
        self.lower, self.upper = float(lower), float(upper)
        self.suffix = suffix

    def expand(self, pcoll: PCollection) -> PCollection:
        keys = self.on
        left, right = pcoll.df, self.right
        lo_us = int(self.lower * 1_000_000)
        hi_us = int(self.upper * 1_000_000)
        w_us = max(1, hi_us - lo_us)
        lcols = list(left.columns)
        rpay = [c for c in right.columns if c not in keys]

        lt = F.unix_micros(F.col(self.left_ts).cast("timestamp"))
        l_b = (left
               .withColumn("__lt", lt)
               .withColumn("__bkt", F.explode(F.array_distinct(F.array(
                   F.floor((F.col("__lt") + lo_us) / w_us),
                   F.floor((F.col("__lt") + hi_us) / w_us)))))
               .select(*[F.col(c) for c in keys], "__lt", "__bkt",
                       F.struct(*lcols).alias("__lp")))
        rt = F.unix_micros(F.col(self.right_ts).cast("timestamp"))
        r_b = (right
               .withColumn("__rt", rt)
               .withColumn("__bkt", F.floor(F.col("__rt") / w_us))
               .select(*[F.col(c).alias(f"__rk_{c}") for c in keys],
                       "__rt", "__bkt",
                       F.struct(*rpay).alias("__rp")))

        cond = F.lit(True)
        for k in keys:
            cond = cond & (l_b[k] == r_b[f"__rk_{k}"])
        cond = cond & (l_b["__bkt"] == r_b["__bkt"])
        joined = (l_b.join(r_b, cond)
                  .filter(F.col("__rt").between(F.col("__lt") + lo_us,
                                                F.col("__lt") + hi_us)))
        cols = [F.col("__lp")[c].alias(c) for c in lcols]
        cols += [F.col("__rp")[c].alias(
            c + (self.suffix if c in lcols else "")) for c in rpay]
        return pcoll.with_df(joined.select(*cols))


class JoinCardinality(PTransform):
    """Pre-flight EXACT join-size report WITHOUT running the join: the
    equi-join output row count is sum over shared keys of
    c_left(k) * c_right(k) — computable from the two key-count frames
    (distinct-key cardinality, tiny next to the data). Pair with
    SkewProfile / recommended_salt before committing a 100 TB shuffle:
    an unexpected blow-up shows here for the cost of two counts.

    Output: one row — (left_rows, right_rows, left_keys, right_keys,
    shared_keys, join_rows, max_key_rows) where max_key_rows is the
    largest single-key contribution (the skew hot spot). All exact
    integers. Integer bound: per-key products and their sum must fit
    BIGINT.

    Scale: one groupBy(key) count per side + one key-keyed join of the
    COUNT frames + a 1-row aggregation.
    """

    def __init__(self, right, on, label=None):
        super().__init__(label)
        self.right = right.df if isinstance(right, PCollection) else right
        self.on = [on] if isinstance(on, str) else list(on)

    def expand(self, pcoll: PCollection) -> PCollection:
        ks = self.on

        def counts(df, alias):
            return (df.where(
                F.lit(True) if not ks else
                F.expr(" AND ".join(f"{k} IS NOT NULL" for k in ks)))
                .groupBy(*ks)
                .agg(F.count(F.lit(1)).cast("long").alias(alias)))

        lc = counts(pcoll.df, "__lc")
        rc = counts(self.right, "__rc")
        lt = lc.agg(F.coalesce(F.sum("__lc"), F.lit(0)).cast("long")
                    .alias("left_rows"),
                    F.count(F.lit(1)).cast("long").alias("left_keys"))
        rt = rc.agg(F.coalesce(F.sum("__rc"), F.lit(0)).cast("long")
                    .alias("right_rows"),
                    F.count(F.lit(1)).cast("long").alias("right_keys"))
        j = lc.join(rc, on=ks)
        shared = j.agg(
            F.count(F.lit(1)).cast("long").alias("shared_keys"),
            F.coalesce(F.sum(F.col("__lc") * F.col("__rc")),
                       F.lit(0)).cast("long").alias("join_rows"),
            F.coalesce(F.max(F.col("__lc") * F.col("__rc")),
                       F.lit(0)).cast("long").alias("max_key_rows"))
        out = (lt.crossJoin(F.broadcast(rt))
               .crossJoin(F.broadcast(shared))
               .select("left_rows", "right_rows", "left_keys",
                       "right_keys", "shared_keys", "join_rows",
                       "max_key_rows"))
        return pcoll.with_df(out)
