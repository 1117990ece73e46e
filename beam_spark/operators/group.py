"""Grouping & combining operators (SURVEY.md §2.1/§2.3/§2.4).

Beam reference: GroupByKey core.py:3446; CombinePerKey core.py:3083;
CombineGlobally core.py:2893; GroupBy/aggregate_field core.py:3575-3746;
CoGroupByKey transforms/util.py:124-287; CombineFn lifecycle
core.py:1061-1253.

Design: everything compiles to ``groupBy().agg()`` so Catalyst's
HashAggregate gives map-side partial aggregation (Beam's combiner lifting,
translations.py:1263) for free; windowed grouping just adds the window
struct column to the grouping key — exactly what Beam's own Spark runner
does (runners/spark/.../batch/GroupByKeyTranslatorBatch.java:84-101).

Scale notes:
* GroupByKey materializes per-key iterables via ``collect_list`` — correct
  but memory-bound for huge groups (the reference flags the same hazard,
  GroupByKeyTranslatorBatch.java:87-93 "preferGroupByKeyToHandleHugeValues").
  Prefer CombinePerKey/agg, which never materializes the group.
* CombineGlobally with fanout: two-phase salted aggregation for
  non-algebraic combines; plain ``df.agg`` (already partial-aggregated)
  for built-ins.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform


def _cols(exprs) -> list[Column]:
    out = []
    for e in exprs:
        out.append(F.expr(e) if isinstance(e, str) else e)
    return out


#: Built-in CombineFn name -> Spark aggregate function. The Beam built-in
#: combiners (combiners.py / cy_combiners.py) all map to native Catalyst
#: aggregates — no Python in the hot path.
BUILTIN_COMBINERS: Mapping[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "mean": F.avg,
    "avg": F.avg,
    "any_value": F.any_value,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
    "count_distinct": F.count_distinct,
    "stddev": F.stddev,
    "stddev_pop": F.stddev_pop,
    "var_samp": F.var_samp,
    "var_pop": F.var_pop,
    "first": F.first,
    "last": F.last,
}


def resolve_agg(fn, col: str) -> Column:
    """fn may be a name from BUILTIN_COMBINERS, a Column factory, or a
    ready Column."""
    if isinstance(fn, Column):
        return fn
    if isinstance(fn, str):
        if fn in BUILTIN_COMBINERS:
            return BUILTIN_COMBINERS[fn](col)
        return F.expr(fn)  # raw SQL aggregate expression
    if callable(fn):
        return fn(col)
    raise TypeError(f"bad aggregate spec {fn!r}")



def _windowed_grouping(pcoll, keys: list) -> tuple[DataFrame, list]:
    """(df, grouping columns) with the window key appended: a materialized
    ``__window`` column, or a pending merging WindowFn (Sessions) applied
    here — Beam's per-key-per-window grouping contract. Sessions
    materializes via ``sessionize`` (gaps-and-islands, Beam-exact gap
    boundary), which may rewrite the DataFrame."""
    from beam_spark.pcollection import WINDOW_COL
    from beam_spark.operators.window import Sessions, sessionize

    df = pcoll.df
    out = [F.col(k) if isinstance(k, str) else k for k in keys]
    str_keys = [k for k in keys if isinstance(k, str)]
    if pcoll.window_col and pcoll.window_col not in str_keys:
        out.append(F.col(pcoll.window_col))
    elif getattr(pcoll, "window_fn", None) is not None:
        fn = pcoll.window_fn
        if isinstance(fn, Sessions):
            if df.isStreaming:
                # lag/cumsum window functions don't exist on streams;
                # Spark's native session_window is the streaming path.
                # Documented divergence: at the EXACT gap boundary
                # (next_ts - prev_ts == gap) Spark merges where Beam
                # starts a new session (strict-overlap rule,
                # reference transforms/window.py:528).
                from beam_spark.operators.window import _dur_to_sql
                out.append(F.session_window(
                    F.col(pcoll.ts_col), _dur_to_sql(fn.gap)).alias(WINDOW_COL))
            else:
                df = sessionize(df, list(out), pcoll.ts_col, fn.gap)
                out.append(F.col(WINDOW_COL))
        else:
            expr = fn.grouping_expr(pcoll.ts_col)
            if expr is not None:
                out.append(expr.alias(WINDOW_COL))
    return df, out


def _grouping_keys(pcoll, keys: list) -> list:
    """Back-compat shim over :func:`_windowed_grouping` (columns only)."""
    return _windowed_grouping(pcoll, keys)[1]


class GroupByKey(PTransform):
    """Per-key(-per-window) value grouping (core.py:3446).

    Output: key columns + ``values`` array of structs of the remaining
    columns (or of ``value_col`` if named). The window column, when
    present, joins the grouping key (Beam per-key-per-window semantics).
    """

    def __init__(self, *key_cols: str, value_col: str | None = None, label=None):
        super().__init__(label)
        self.key_cols = list(key_cols) or ["key"]
        self.value_col = value_col

    def expand(self, pcoll: PCollection) -> PCollection:
        from beam_spark.pcollection import WINDOW_COL

        df, keys = _windowed_grouping(pcoll, list(self.key_cols))
        key_names = list(self.key_cols) + [WINDOW_COL, pcoll.window_col or WINDOW_COL]
        if self.value_col:
            val = F.col(self.value_col)
        else:
            rest = [c for c in pcoll.df.columns if c not in key_names]
            val = F.struct(*[F.col(c) for c in rest]) if len(rest) > 1 else F.col(rest[0])
        out = df.groupBy(*keys).agg(F.collect_list(val).alias("values"))
        return pcoll.with_df(out)


class CombinePerKey(PTransform):
    """Per-key(-per-window) aggregation (core.py:3083).

    ``CombinePerKey('key', total='sum(x)', n='count(*)')`` or with Column
    aggregates. Catalyst lifts to partial+final HashAggregate, which is
    Beam's combiner-lifting optimization (translations.py:1263) built in.
    Hot-key fanout (core.py:3321) is unnecessary here: partial aggregation
    already combines map-side per partition.
    """

    def __init__(self, *key_cols: str, label=None, **aggs):
        super().__init__(label)
        self.key_cols, self.aggs = list(key_cols), aggs

    def expand(self, pcoll: PCollection) -> PCollection:
        df, keys = _windowed_grouping(pcoll, list(self.key_cols))
        # str form: either 'sum' (combine the column with the output name)
        # or a full SQL aggregate expression 'sum(x * y)'.
        agg_cols = []
        for name, spec in self.aggs.items():
            if isinstance(spec, str) and spec in BUILTIN_COMBINERS:
                agg_cols.append(BUILTIN_COMBINERS[spec](name).alias(name))
            elif isinstance(spec, str):
                agg_cols.append(F.expr(spec).alias(name))
            else:
                agg_cols.append(resolve_agg(spec, name).alias(name))
        out = df.groupBy(*keys).agg(*agg_cols)
        return pcoll.with_df(out)


class CombineGlobally(PTransform):
    """Whole-PCollection aggregation (core.py:2893). Default value for the
    empty input mirrors Beam's ``CombineGlobally().with_defaults()``."""

    def __init__(self, label=None, **aggs):
        super().__init__(label)
        self.aggs = aggs

    def expand(self, pcoll: PCollection) -> PCollection:
        agg_cols = []
        for name, spec in self.aggs.items():
            if isinstance(spec, str) and spec in BUILTIN_COMBINERS:
                agg_cols.append(BUILTIN_COMBINERS[spec](name).alias(name))
            elif isinstance(spec, str):
                agg_cols.append(F.expr(spec).alias(name))
            else:
                agg_cols.append(resolve_agg(spec, name).alias(name))
        df, keys = _windowed_grouping(pcoll, [])
        df = df.groupBy(*keys).agg(*agg_cols) if keys else df.agg(*agg_cols)
        return pcoll.with_df(df)


class GroupBy(PTransform):
    """Named-key multi-aggregate sugar (core.py:3575-3746).

    ``GroupBy('a', 'b').aggregate_field('x', 'sum', 'total_x')
                        .aggregate_field('sum(y*z)', None, 'yz')``
    """

    def __init__(self, *key_exprs, label=None, **named_keys):
        super().__init__(label)
        self.key_exprs = list(key_exprs)
        self.named_keys = named_keys
        self._aggs: list[tuple] = []

    def aggregate_field(self, field, combine_fn, dest: str) -> "GroupBy":
        self._aggs.append((field, combine_fn, dest))
        return self

    def expand(self, pcoll: PCollection) -> PCollection:
        keys = [F.col(k) if isinstance(k, str) else k for k in self.key_exprs]
        keys += [(F.expr(e) if isinstance(e, str) else e).alias(n)
                 for n, e in self.named_keys.items()]
        df, keys = _windowed_grouping(pcoll, keys)
        aggs = []
        for field, fn, dest in self._aggs:
            if fn is None:
                aggs.append((F.expr(field) if isinstance(field, str) else field).alias(dest))
            else:
                aggs.append(resolve_agg(fn, field).alias(dest))
        return pcoll.with_df(df.groupBy(*keys).agg(*aggs))


class CoGroupByKey(PTransform):
    """N-way grouping: key -> {tag: [values]} (transforms/util.py:124-287).

    Apply to a dict of PCollections: ``{'a': pc1, 'b': pc2} | CoGroupByKey('k')``.
    Implementation: per-side pre-aggregation (collect_list) then a chained
    full-outer join on the key — each side shuffles once on the key, no
    row explosion, and Catalyst can still broadcast small pre-grouped
    sides.
    """

    def __init__(self, *key_cols: str, label=None):
        super().__init__(label)
        self.key_cols = list(key_cols) or ["key"]

    def expand(self, tagged) -> PCollection:
        items = list(tagged.items())
        first_pcoll = items[0][1]
        grouped: DataFrame | None = None
        for tag, pcoll in items:
            df = pcoll.df
            rest = [c for c in df.columns if c not in self.key_cols]
            val = F.struct(*[F.col(c) for c in rest]) if len(rest) > 1 else F.col(rest[0])
            g = df.groupBy(*self.key_cols).agg(F.collect_list(val).alias(tag))
            grouped = g if grouped is None else grouped.join(g, on=self.key_cols, how="full_outer")
        # Outer-joined missing sides are NULL; Beam yields empty iterables.
        out = grouped
        for tag, _ in items:
            out = out.withColumn(tag, F.coalesce(F.col(tag), F.array()))
        return first_pcoll.with_df(out)


class CombineValues(PTransform):
    """Post-GBK per-key value combining (core.py:3201 CombineValues):
    input is GroupByKey-shaped (a ``values`` array column); the combine
    runs per ROW over the already-grouped array.

    Built-in specs ('sum'/'min'/'max'/'count'/'mean') fold JVM-side via
    aggregate()/array functions — no Python, no extra shuffle (the group
    already materialized). A python callable (list -> value) runs on the
    Arrow slow path with an explicit ``output_type``.

    Prefer CombinePerKey when the aggregation is known up front: it never
    materializes the group (Beam gives the same guidance).
    """

    def __init__(self, fn, value_col: str = "values",
                 out_col: str = "combined", output_type: str = "double",
                 label=None):
        super().__init__(label)
        self.fn, self.value_col, self.out_col = fn, value_col, out_col
        self.output_type = output_type

    def expand(self, pcoll: PCollection) -> PCollection:
        vc, oc = self.value_col, self.out_col
        if isinstance(self.fn, str):
            exprs = {
                "sum": f"aggregate({vc}, CAST(0 AS DOUBLE), "
                       f"(a, x) -> a + CAST(x AS DOUBLE))",
                "min": f"array_min({vc})",
                "max": f"array_max({vc})",
                "count": f"CAST(size({vc}) AS BIGINT)",
                "mean": f"aggregate({vc}, CAST(0 AS DOUBLE), "
                        f"(a, x) -> a + CAST(x AS DOUBLE)) "
                        f"/ greatest(size({vc}), 1)",
            }
            if self.fn not in exprs:
                raise ValueError(f"unknown builtin combine {self.fn!r}")
            return pcoll.with_df(
                pcoll.df.withColumn(oc, F.expr(exprs[self.fn])).drop(vc))

        fn, out_type = self.fn, self.output_type
        import pandas as pd

        fields = [f for f in pcoll.df.schema.fields if f.name != vc]
        schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in fields) + f", {oc} {out_type}"

        def gen(batches):
            for pdf in batches:
                out = pdf.drop(columns=[vc])
                out[oc] = [fn(list(v)) for v in pdf[vc]]
                yield out

        return pcoll.with_df(pcoll.df.mapInPandas(gen, schema=schema))


class GroupByRollup(PTransform):
    """Multi-level aggregation in ONE pass: ``kind='rollup'`` computes
    the hierarchy prefixes of the keys (a, b), (a), (); ``kind='cube'``
    every key subset; ``kind='sets'`` explicit grouping sets (list of
    key-name tuples, SQL GROUPING SETS). Spark plans all of these as a
    single Expand + HashAggregate — one scan regardless of how many
    levels, which is the whole point vs a UNION of groupBys re-reading
    100 TB per level.

    Beam parity: no built-in (Beam users union N GroupByKeys — N scans);
    Calcite SQL on Beam supports ROLLUP, which this mirrors natively.

    Output: the key columns (NULL for rolled-up levels), one
    ``grouping_id`` BIGINT disambiguating a real NULL key from a
    rolled-up level (bit i set = key i aggregated away), plus the
    aggregates. ``aggs``: {out_name: SQL aggregate expression}.
    """

    def __init__(self, keys: Sequence[str], aggs: Mapping[str, str],
                 kind: str = "rollup",
                 sets: Sequence[Sequence[str]] | None = None, label=None):
        super().__init__(label)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.aggs = dict(aggs)
        if kind not in ("rollup", "cube", "sets"):
            raise ValueError(kind)
        if (kind == "sets") != (sets is not None):
            raise ValueError("sets= required iff kind='sets'")
        self.kind = kind
        self.sets = [tuple(s) for s in sets] if sets else None

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        agg_cols = [F.expr(e).alias(name) for name, e in self.aggs.items()]
        gid = F.grouping_id(*[F.col(k) for k in self.keys])
        if self.kind == "rollup":
            g = df.rollup(*self.keys)
        elif self.kind == "cube":
            g = df.cube(*self.keys)
        else:
            # GROUPING SETS has no DataFrame API: go through SQL on a
            # temp view — still one Expand+HashAggregate plan. Unique
            # per expansion: a content-hashed name would collide (and
            # race) across concurrent transforms with equal key sets
            import uuid

            view = f"__gsets_{uuid.uuid4().hex[:12]}"
            df.createOrReplaceTempView(view)
            sets_sql = ", ".join(
                "(" + ", ".join(s) + ")" for s in self.sets)
            cols = ", ".join(self.keys)
            aggs_sql = ", ".join(f"{e} AS {n}"
                                 for n, e in self.aggs.items())
            out = df.sparkSession.sql(
                f"SELECT {cols}, CAST(grouping_id({cols}) AS BIGINT) "
                f"AS grouping_id, {aggs_sql} FROM {view} "
                f"GROUP BY GROUPING SETS ({sets_sql})")
            # sql() has resolved the view into the analyzed plan — drop
            # it so repeated expansions in a long-lived session don't
            # accumulate catalog entries (and pin DataFrame plans)
            df.sparkSession.catalog.dropTempView(view)
            return pcoll.with_df(out)
        out = g.agg(gid.cast("bigint").alias("grouping_id"), *agg_cols)
        return pcoll.with_df(
            out.select(*self.keys, "grouping_id",
                       *[F.col(n) for n in self.aggs]))


class TimeRollup(PTransform):
    """Hypertable-style multi-granularity time rollup: aggregate the
    SAME scan into hour/day/week/month/... buckets at once via grouping
    sets over derived epoch buckets — the continuous-aggregate
    maintenance query of a timeseries store, one Expand+HashAggregate
    instead of one scan per granularity.

    Buckets are integer epoch-second floors (``floor(unix_time /
    width) * width``) — engine- and timezone-independent (calendar
    months use date_trunc semantics via 30.4375-day widths ONLY if
    requested as '30d'-style fixed widths; true calendar granularities
    are fixed widths here, documented).

    Output: one row per (granularity, bucket_start, extra keys...) with
    the aggregates; ``granularity`` is the label string.

    ``grains``: {label: width_seconds}, e.g. {"hour": 3600,
    "day": 86400}. ``aggs``: {out_name: SQL aggregate expr}.
    """

    def __init__(self, ts_col: str, grains: Mapping[str, int],
                 aggs: Mapping[str, str], keys: Sequence[str] = (),
                 label=None):
        super().__init__(label)
        self.ts_col = ts_col
        self.grains = dict(grains)
        self.aggs = dict(aggs)
        self.keys = [keys] if isinstance(keys, str) else list(keys)

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        epoch = F.unix_timestamp(F.col(self.ts_col))
        bucket_cols = []
        for label, width in self.grains.items():
            w = int(width)
            bucket_cols.append(
                (F.floor(epoch / w) * w).cast("bigint")
                .alias(f"__b_{label}"))
        base = df.select(*self.keys, *bucket_cols,
                         *[F.col(c) for c in df.columns
                           if c not in self.keys])
        labels = list(self.grains)
        # one grouping set per granularity: (keys..., bucket_label);
        # view name unique per expansion (see GroupByRollup note)
        import uuid

        view = f"__trollup_{uuid.uuid4().hex[:12]}"
        base.createOrReplaceTempView(view)
        keys_sql = "".join(f"{k}, " for k in self.keys)
        sets_sql = ", ".join(
            "(" + "".join(f"{k}, " for k in self.keys)
            + f"__b_{lab})" for lab in labels)
        # label decode: exactly one bucket column is non-grouped-away
        label_case = "CASE " + " ".join(
            f"WHEN grouping(__b_{lab}) = 0 THEN '{lab}'"
            for lab in labels) + " END"
        bucket_case = "CASE " + " ".join(
            f"WHEN grouping(__b_{lab}) = 0 THEN __b_{lab}"
            for lab in labels) + " END"
        aggs_sql = ", ".join(f"{e} AS {n}" for n, e in self.aggs.items())
        out = df.sparkSession.sql(
            f"SELECT {keys_sql}{label_case} AS granularity, "
            f"CAST({bucket_case} AS BIGINT) AS bucket_start, "
            f"{aggs_sql} FROM {view} GROUP BY GROUPING SETS ({sets_sql})")
        # view already resolved into the plan — don't leak the catalog
        # entry across repeated expansions (see GroupByRollup)
        df.sparkSession.catalog.dropTempView(view)
        return pcoll.with_df(out)


class GapFill(PTransform):
    """Time-bucket gap filling — the ``time_bucket_gapfill`` of a
    timeseries store: aggregate rows into fixed ``width``-second epoch
    buckets per key, then emit a row for EVERY bucket in the key's
    [min, max] range (or an explicit [start, end] override), marking
    generated rows with ``filled = true`` and populating their
    aggregate columns by ``fill``:

      * 'null' (default) — gaps stay NULL (chart-ready);
      * 'locf' — last observation carried forward per key (NULLs fill
        from the nearest earlier bucket; applies to genuine NULL
        aggregates too, the standard locf caveat);
      * 'interp' — linear interpolation between the nearest earlier
        and later non-NULL observations (time-weighted by bucket
        distance); buckets outside the observed span stay NULL;
      * ('const', v) — coalesce to a constant (e.g. 0 counts).

    ``aggs``: {name: SQL aggregate expr} evaluated per (keys, bucket).

    Scale: the spine is sequence() + explode per key — pure
    expressions sized by the key's own bucket range, nothing
    driver-side; locf is one key-partitioned last-value window. With
    NO keys the locf window is a single partition sized by the global
    bucket range (range/width rows — bounded by time span, not data).
    """

    def __init__(self, ts_col: str, width: int,
                 aggs: Mapping[str, str], keys: Sequence[str] = (),
                 fill="null", start: int | None = None,
                 end: int | None = None, label=None):
        super().__init__(label)
        self.ts_col, self.width = ts_col, int(width)
        self.aggs = dict(aggs)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        if isinstance(fill, list):      # YAML front-end ships lists
            fill = tuple(fill)
        if fill not in ("null", "locf", "interp") and not (
                isinstance(fill, tuple) and len(fill) == 2
                and fill[0] == "const"):
            raise ValueError("fill must be 'null', 'locf', 'interp', "
                             "or ('const', value)")
        self.fill = fill
        # buckets are floor(ts/width)*width — always multiples of
        # width — so a misaligned explicit bound would build a spine
        # that never meets the data buckets (every row "filled").
        # Floor-align bounds onto the same grid.
        self.start = None if start is None else (int(start) // self.width) * self.width
        self.end = None if end is None else (int(end) // self.width) * self.width

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        w, keys = self.width, self.keys
        bucket = (F.floor(F.unix_timestamp(F.col(self.ts_col)) / w)
                  * w).cast("bigint")
        agg_cols = [F.expr(e).alias(n) for n, e in self.aggs.items()]
        agged = (pcoll.df.groupBy(*keys, bucket.alias("bucket"))
                 .agg(*agg_cols, F.lit(True).alias("__present")))
        mn = (F.lit(int(self.start)).cast("bigint") if self.start
              is not None else F.min("bucket"))
        mx = (F.lit(int(self.end)).cast("bigint") if self.end
              is not None else F.max("bucket"))
        rng = agged.groupBy(*keys).agg(mn.alias("__mn"), mx.alias("__mx"))
        spine = rng.select(
            *keys,
            F.explode(F.sequence("__mn", "__mx", F.lit(w)))
            .alias("bucket"))
        j = (spine.join(agged, on=[*keys, "bucket"], how="left")
             .withColumn("filled", F.col("__present").isNull())
             .drop("__present"))
        names = list(self.aggs)
        if self.fill == "interp":
            back = (Window.partitionBy(*keys).orderBy("bucket")
                    .rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow))
            # Forward lookup as a RUNNING last() over a DESC order:
            # same values as first(ignorenulls) over
            # currentRow->unboundedFollowing, but Spark's running
            # unboundedPreceding->currentRow frame is O(n) per
            # partition while the unbounded-following frame re-scans
            # the partition tail per row (O(n^2)).
            fwd = (Window.partitionBy(*keys).orderBy(F.desc("bucket"))
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))

            def lerp(n):
                ob = F.when(F.col(n).isNotNull(), F.col("bucket"))
                pb = F.last(ob, ignorenulls=True).over(back)
                nb = F.last(ob, ignorenulls=True).over(fwd)
                pv = F.last(n, ignorenulls=True).over(back)
                nv = F.last(n, ignorenulls=True).over(fwd)
                return F.when(F.col(n).isNotNull(), F.col(n)).otherwise(
                    F.when(pv.isNotNull() & nv.isNotNull(),
                           pv + (nv - pv)
                           * ((F.col("bucket") - pb)
                              / (nb - pb).cast("double"))))

            j = j.select(*keys, "bucket",
                         *[lerp(n).alias(n) for n in names], "filled")
        elif self.fill == "locf":
            lw = (Window.partitionBy(*keys).orderBy("bucket")
                  .rowsBetween(Window.unboundedPreceding,
                               Window.currentRow))
            j = j.select(
                *keys, "bucket",
                *[F.last(n, ignorenulls=True).over(lw).alias(n)
                  for n in names],
                "filled")
        elif isinstance(self.fill, tuple):
            v = self.fill[1]
            j = j.select(
                *keys, "bucket",
                *[F.coalesce(F.col(n), F.lit(v)).alias(n)
                  for n in names],
                "filled")
        return pcoll.with_df(j)


class Pivot(PTransform):
    """Wide-format pivot: ``groupBy(keys).pivot(col, values).agg(expr)``.

    ``values`` is REQUIRED — the scale-safe form: without it Spark runs
    an extra distinct-values job over the whole input and the output
    schema becomes data-dependent (unbounded column explosion on a
    high-cardinality pivot column). Explicit values keep the plan one
    HashAggregate with len(values) conditional aggregates.

    Output columns: keys + one ``{prefix}{value}`` per pivot value.
    """

    def __init__(self, keys: Sequence[str], pivot_col: str,
                 values: Sequence, agg: str, out_prefix: str = "",
                 label=None):
        super().__init__(label)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.pivot_col, self.values = pivot_col, list(values)
        self.agg, self.out_prefix = agg, out_prefix

    def expand(self, pcoll: PCollection) -> PCollection:
        out = (pcoll.df.groupBy(*self.keys)
               .pivot(self.pivot_col, self.values)
               .agg(F.expr(self.agg)))
        if self.out_prefix:
            for v in self.values:
                out = out.withColumnRenamed(
                    str(v), f"{self.out_prefix}{v}")
        return pcoll.with_df(out)


class Unpivot(PTransform):
    """Long-format melt (Spark-native ``DataFrame.unpivot`` — one
    Expand projection, zero shuffle): id columns stay, ``value_cols``
    become (var_col, value_col) rows. NULL cells are kept by default
    (pass drop_nulls=True to filter them, e.g. after a sparse Pivot)."""

    def __init__(self, ids: Sequence[str], value_cols: Sequence[str],
                 var_col: str = "name", value_col: str = "value",
                 drop_nulls: bool = False, label=None):
        super().__init__(label)
        self.ids = [ids] if isinstance(ids, str) else list(ids)
        self.value_cols = list(value_cols)
        self.var_col, self.value_col = var_col, value_col
        self.drop_nulls = drop_nulls

    def expand(self, pcoll: PCollection) -> PCollection:
        out = pcoll.df.unpivot(self.ids, self.value_cols,
                               self.var_col, self.value_col)
        if self.drop_nulls:
            out = out.where(F.col(self.value_col).isNotNull())
        return pcoll.with_df(out)
