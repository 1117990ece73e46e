"""Sorting / limits / top-k (SURVEY.md §2.5).

Beam reference: BeamSortRel.java:69-145 (ORDER BY+LIMIT via the Top
combiner; ORDER BY without LIMIT is a single-worker in-memory sort that
Beam itself warns is memory-bound, :81-88); SortValues secondary sort
(sdks/java/extensions/sorter/SortValues.java, external spill).

Spark:
* ``TopK`` -> ``orderBy().limit(k)`` — physical plan is
  TakeOrderedAndProject: per-partition heaps + driver merge of k rows,
  never a global sort. This is exactly Beam's Top combiner strategy but
  executed natively.
* ``OrderBy`` (no limit) -> a true distributed range-partitioned sort —
  strictly more scalable than the reference's single-key sort.
* ``SortValues`` -> ``sort_array(collect_list(struct(sort_key, value)))``
  per key: JVM-side, no Python. For huge groups use
  ``repartition(key).sortWithinPartitions`` (secondary-sort pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform


def _sort_cols(specs) -> list[Column]:
    out = []
    for s in specs:
        if isinstance(s, Column):
            out.append(s)
        elif isinstance(s, str) and s.lower().endswith(" desc"):
            out.append(F.col(s[:-5].strip()).desc())
        elif isinstance(s, str) and s.lower().endswith(" asc"):
            out.append(F.col(s[:-4].strip()).asc())
        else:
            out.append(F.col(s))
    return out


class TopK(PTransform):
    """Global top-k (BeamSortRel / combiners.py:188 Top.Of).
    -> TakeOrderedAndProject, with optional OFFSET."""

    def __init__(self, k: int, *order_by, offset: int = 0, label=None):
        super().__init__(label)
        self.k, self.order_by, self.offset = k, order_by, offset

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df.orderBy(*_sort_cols(self.order_by))
        if self.offset:
            df = df.offset(self.offset)
        return pcoll.with_df(df.limit(self.k))


class TopKPerKey(PTransform):
    """Per-key top-k (combiners.py Top.PerKey / LargestPerKey):
    window row_number() <= k — one shuffle on the key, per-partition sort,
    no per-key heap UDF needed."""

    def __init__(self, key_cols, k: int, *order_by, label=None):
        super().__init__(label)
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.k, self.order_by = k, order_by

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        w = Window.partitionBy(*self.key_cols).orderBy(*_sort_cols(self.order_by))
        df = (pcoll.df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= self.k).drop("__rn"))
        return pcoll.with_df(df)


class OrderBy(PTransform):
    """Total order (distributed range sort). Beam rejects this on unbounded
    inputs (BeamSortRel.java:81-88) — we do too."""

    def __init__(self, *order_by, label=None):
        super().__init__(label)
        self.order_by = order_by

    def expand(self, pcoll: PCollection) -> PCollection:
        if not pcoll.is_bounded:
            raise ValueError("ORDER BY without LIMIT is not supported on "
                             "unbounded PCollections (Beam BeamSortRel.java:81-88)")
        return pcoll.with_df(pcoll.df.orderBy(*_sort_cols(self.order_by)))


class SortValues(PTransform):
    """Secondary sort within key (extensions/sorter/SortValues.java):
    key -> array of value-structs sorted by sort_key, computed JVM-side."""

    def __init__(self, key_cols, sort_key: str, value_cols=None, label=None):
        super().__init__(label)
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.sort_key, self.value_cols = sort_key, value_cols

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        vals = self.value_cols or [c for c in df.columns
                                   if c not in self.key_cols and c != self.sort_key]
        item = F.struct(F.col(self.sort_key).alias("sort_key"),
                        *[F.col(c) for c in vals])
        out = (df.groupBy(*self.key_cols)
               .agg(F.sort_array(F.collect_list(item)).alias("sorted_values")))
        return pcoll.with_df(out)
