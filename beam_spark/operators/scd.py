"""Slowly-changing-dimension maintenance (warehouse Type 2).

The reference has no dimension-history operator; this is lake-side
bread and butter (dbt snapshots, Delta MERGE-based SCD recipes)
re-expressed as pure DataFrame windows: apply a batch of keyed,
timestamped attribute changes to a versioned dimension table where
each version carries [valid_from, valid_to) and the current version
has valid_to NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform


class ScdType2Apply(PTransform):
    """Apply a change batch to a Type-2 dimension, functionally: the
    input PCollection is the CHANGES frame (key, attribute columns,
    ``ts_col``); ``dim`` is the existing dimension (same key +
    attributes plus ``valid_from`` / ``valid_to``, NULL valid_to =
    current). Returns the fully updated dimension.

    Semantics (dbt-snapshot / Kimball Type 2):
      * a change whose attributes differ from the key's latest state
        closes the current version at the change timestamp and opens a
        new version [ts, next-change-or-NULL);
      * consecutive identical states collapse (a no-op change never
        creates a version — the current row stays open with its
        ORIGINAL valid_from);
      * multiple changes per key in one batch chain versions in
        timestamp order (equal timestamps tie-break on the attribute
        fingerprint, deterministically);
      * keys new to the dimension start their history at their first
        change; closed history rows pass through untouched.

    Implementation: current rows become baseline pseudo-changes at
    their valid_from; one per-key window pass drops consecutive
    duplicate states (lag on the attribute fingerprint) and a second
    assigns valid_to = lead(ts). Two key-partitioned windows, no
    self-joins, history untouched — at 100 TB the cost is one shuffle
    of (current ∪ changes) on the key, never of the closed history.
    """

    def __init__(self, dim: DataFrame | PCollection, key: str = "id",
                 ts_col: str = "ts", valid_from: str = "valid_from",
                 valid_to: str = "valid_to", label=None):
        super().__init__(label)
        self.dim = dim.df if isinstance(dim, PCollection) else dim
        self.key, self.ts_col = key, ts_col
        self.valid_from, self.valid_to = valid_from, valid_to

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        changes = pcoll.df
        k, ts = self.key, self.ts_col
        vf, vt = self.valid_from, self.valid_to
        attrs = [c for c in changes.columns if c not in (k, ts)]
        missing = [c for c in [k, *attrs, vf, vt]
                   if c not in self.dim.columns]
        if missing:
            raise ValueError(
                f"dimension frame lacks columns {missing} (need key + "
                "change attributes + valid_from/valid_to)")
        extra = [c for c in self.dim.columns
                 if c not in (k, vf, vt) and c not in attrs]
        if extra:
            raise ValueError(
                f"dimension attribute columns {extra} absent from the "
                "changes frame — they would be silently dropped from "
                "the returned dimension (closed history included); "
                "carry them in the changes frame or project them off "
                "the dimension first")
        hist = self.dim.filter(F.col(vt).isNotNull())
        cur = self.dim.filter(F.col(vt).isNull())
        # engine-portable state fingerprint: attribute values joined on
        # the unit separator with a record-separator NULL placeholder
        # — control characters keep adjacent fields from colliding
        # (("ab","c") vs ("a","bc")) and never appear in sane data
        state = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"),
                                  F.lit("\x1e")) for c in attrs])
        base = (cur.select(k, *attrs, F.col(vf).alias(ts))
                .withColumn("__src", F.lit(0)))
        chg = (changes.select(k, *attrs, ts)
               .withColumn("__src", F.lit(1)))
        u = base.unionByName(chg).withColumn("__state", state)
        w = Window.partitionBy(k).orderBy(ts, "__src", "__state")
        eff = (u.withColumn("__prev", F.lag("__state").over(w))
               .filter(F.col("__prev").isNull()
                       | (F.col("__state") != F.col("__prev"))))
        w2 = Window.partitionBy(k).orderBy(ts, "__src", "__state")
        out = (eff.withColumn(vt, F.lead(ts).over(w2))
               .select(k, *attrs, F.col(ts).alias(vf), vt))
        return pcoll.with_df(out.unionByName(hist.select(*out.columns)))


class CdcApply(PTransform):
    """Apply a CDC changelog to produce the CURRENT SNAPSHOT — the
    merge step of a change-data-capture ingest (Debezium-style op
    column): per key, the latest change in ``order_by`` order wins;
    a terminal delete removes the key entirely.

    ``op_col`` values: upper-cased first letter decides — I(nsert) /
    U(pdate) / R(ead, snapshot) keep the row, D(elete) drops the key.
    An unrecognized op is data, not configuration, so it fails at
    RUNTIME through a raise_error guard — a bad feed dies loudly
    instead of silently surviving into the snapshot.

    Scale: ONE key-partitioned window (row_number over the descending
    change order) + a filter — the changelog shuffles once on the
    key; the snapshot is never joined against history.

    Output: one row per surviving key, changelog columns minus
    ``op_col``.
    """

    def __init__(self, key: str = "id", order_by="ts",
                 op_col: str = "op", label=None):
        super().__init__(label)
        self.key = key
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.op_col = op_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        df = pcoll.df
        op = F.upper(F.substring(F.col(self.op_col), 1, 1))
        guard = F.when(op.isin("I", "U", "R", "D"), op).otherwise(
            F.raise_error(F.concat(
                F.lit("CdcApply: unrecognized op "),
                F.col(self.op_col).cast("string"))))
        w = (Window.partitionBy(self.key)
             .orderBy(*[F.col(c).desc() for c in self.order_by]))
        out = (df.withColumn("__op", guard)
               .withColumn("__rn", F.row_number().over(w))
               .filter((F.col("__rn") == 1) & (F.col("__op") != "D"))
               .drop("__rn", "__op", self.op_col))
        return pcoll.with_df(out)
