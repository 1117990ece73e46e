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
