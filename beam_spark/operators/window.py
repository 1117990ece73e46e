"""Event-time windowing (SURVEY.md §2.7).

Beam reference: transforms/window.py — GlobalWindows (:343),
FixedWindows(size, offset) (:392), SlidingWindows(size, period, offset)
(:455), Sessions(gap) (:528), WindowFn interface (:121), TimestampCombiner
(:96-119); WindowInto core.py:3979; proto standard_window_fns.proto:41-113.

Spark design: a window is an ordinary ``__window struct<start,end>``
column.

* FixedWindows  -> ``F.window(ts, size, offset)`` materialized eagerly —
  the element carries its window like Beam's WindowedValue.
* SlidingWindows -> each element belongs to size/period windows. We
  materialize by exploding the enumerated window set (JVM-side sequence+
  transform, no Python); grouping operators could also defer to
  ``F.window(ts, size, slide)`` at groupBy time — same semantics.
* Sessions      -> merging windows cannot be assigned per element
  (Beam merges at GBK time; so does Spark). WindowInto records the
  pending WindowFn on the PCollection and grouping operators call
  ``sessionize`` — a gaps-and-islands materialization with Beam's exact
  merge rule (merge iff the next element starts STRICTLY inside the
  previous window's gap: IntervalWindow intersection, reference
  transforms/window.py:528). ``F.session_window`` is NOT used: Spark
  closes/extends sessions differently at the exact gap boundary
  (falsified by hypothesis at ts=[0, 60], gap=60).
* GlobalWindows -> drops the window column (one global window).

TimestampCombiner: the output timestamp of a windowed aggregate —
END_OF_WINDOW is ``__window.end``; EARLIEST/LATEST are ``min/max(ts)``
aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform, TS_COL, WINDOW_COL


def _dur_to_sql(seconds: float) -> str:
    if seconds == int(seconds):
        return f"{int(seconds)} seconds"
    return f"{int(seconds * 1_000_000)} microseconds"


class WindowFn:
    """Window assignment strategy (window.py:121)."""

    #: merging window fns (Sessions) are applied at groupBy time
    merging = False

    def assign(self, ts: Column) -> Column | None:
        """Column producing the window struct(s) for an element, or None
        for merging fns."""
        raise NotImplementedError

    def grouping_expr(self, ts_col: str) -> Column:
        """Expression used directly inside groupBy()."""
        raise NotImplementedError


class GlobalWindows(WindowFn):
    """window.py:343 — everything in one window."""

    def assign(self, ts):
        return None

    def grouping_expr(self, ts_col):
        return None


class FixedWindows(WindowFn):
    """Tumbling windows (window.py:392; proto :53-64)."""

    def __init__(self, size_sec: float, offset_sec: float = 0):
        self.size, self.offset = size_sec, offset_sec

    def assign(self, ts):
        return F.window(ts, _dur_to_sql(self.size),
                        startTime=_dur_to_sql(self.offset)) if self.offset else \
            F.window(ts, _dur_to_sql(self.size))

    def grouping_expr(self, ts_col):
        return self.assign(F.col(ts_col))


class SlidingWindows(WindowFn):
    """Overlapping windows (window.py:455; proto :80-94): an element with
    timestamp t is in windows [start, start+size) for every start =
    k*period + offset with t-size < start <= t."""

    def __init__(self, size_sec: float, period_sec: float, offset_sec: float = 0):
        self.size, self.period, self.offset = size_sec, period_sec, offset_sec

    def assign(self, ts):
        return None  # element-level assignment goes through assign_sql

    def assign_sql(self, ts_col: str) -> str:
        # Enumerate the element's windows JVM-side: sequence() over window
        # starts, then struct(start, end) per entry. Whole-stage codegen'd;
        # the explode that follows is Beam's element duplication made
        # explicit.
        size_us = int(self.size * 1_000_000)
        period_us = int(self.period * 1_000_000)
        offset_us = int(self.offset * 1_000_000)
        t = f"unix_micros({ts_col})"
        # first window start: the smallest k*period+offset > t - size
        first = (f"(floor(({t} - {offset_us} - {size_us}) / {period_us}) + 1) "
                 f"* {period_us} + {offset_us}")
        last = f"floor(({t} - {offset_us}) / {period_us}) * {period_us} + {offset_us}"
        return (f"transform(sequence(CAST({first} AS BIGINT), CAST({last} AS BIGINT), "
                f"{period_us}), s -> struct(timestamp_micros(s) AS start, "
                f"timestamp_micros(s + {size_us}) AS end))")

    def grouping_expr(self, ts_col):
        return F.window(F.col(ts_col), _dur_to_sql(self.size),
                        _dur_to_sql(self.period),
                        _dur_to_sql(self.offset) if self.offset else None) \
            if self.offset else F.window(F.col(ts_col), _dur_to_sql(self.size),
                                         _dur_to_sql(self.period))


class Sessions(WindowFn):
    """Gap-merged per-key sessions (window.py:528; proto :106-113).

    Applied by grouping operators through :func:`sessionize` (NOT
    ``F.session_window`` — see module docstring for the boundary
    divergence)."""

    merging = True

    def __init__(self, gap_sec: float):
        self.gap = gap_sec

    def assign(self, ts):
        return None

    def grouping_expr(self, ts_col):
        raise TypeError(
            "Sessions is materialized via sessionize() by grouping "
            "operators; it has no per-element grouping expression")


def sessionize(df, key_cols, ts_col: str, gap_sec: float):
    """Materialize Beam-exact merged session windows as a ``__window``
    struct column via gaps-and-islands.

    Per key, ordered by event time: a new session starts when
    ``ts - prev_ts >= gap`` (merge only on STRICT overlap of the
    per-element windows [t, t+gap) — Beam IntervalWindow intersection,
    reference transforms/window.py:528). The merged window is
    [min(ts), max(ts) + gap).

    Scale: one shuffle on the session key (reused by the groupBy that
    follows — HashPartitioning(keys) satisfies the keys+session_id
    clustering, so Catalyst inserts no second exchange). Keyless
    sessionization degenerates to a single partition — sessions are a
    per-key construct; use keys at scale.
    """
    from pyspark.sql.window import Window

    gap_us = int(gap_sec * 1_000_000)
    part = [F.col(k) if isinstance(k, str) else k for k in key_cols] or [F.lit(1)]
    tsm, new, sid = "__bs_tsm", "__bs_sess_new", "__bs_sid"
    w = Window.partitionBy(*part).orderBy(tsm)
    df = df.withColumn(tsm, F.unix_micros(F.col(ts_col).cast("timestamp")))
    prev = F.lag(tsm).over(w)
    df = df.withColumn(
        new, F.when(prev.isNull() | (F.col(tsm) - prev >= gap_us), 1).otherwise(0))
    df = df.withColumn(sid, F.sum(new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    bounds = Window.partitionBy(*part, F.col(sid))
    df = df.withColumn(
        WINDOW_COL,
        F.struct(
            F.timestamp_micros(F.min(tsm).over(bounds)).alias("start"),
            F.timestamp_micros(F.max(tsm).over(bounds) + gap_us).alias("end")))
    return df.drop(tsm, new, sid)


class WindowInto(PTransform):
    """Assign elements to windows (core.py:3979).

    Fixed/Sliding: materializes ``__window`` (sliding explodes — one row
    per (element, window), which is Beam's model). Sessions/Global: records
    the window_fn for grouping operators to apply.
    """

    def __init__(self, window_fn: WindowFn, ts_col: str | None = None, label=None):
        super().__init__(label)
        self.window_fn, self.ts_col = window_fn, ts_col

    def expand(self, pcoll: PCollection) -> PCollection:
        ts_col = self.ts_col or pcoll.ts_col or TS_COL
        fn = self.window_fn
        if isinstance(fn, GlobalWindows):
            df = pcoll.df.drop(WINDOW_COL) if WINDOW_COL in pcoll.df.columns else pcoll.df
            return pcoll.with_df(df, window_col=None, window_fn=None, ts_col=ts_col)
        if isinstance(fn, SlidingWindows):
            df = pcoll.df.withColumn(
                WINDOW_COL, F.explode(F.expr(fn.assign_sql(ts_col))))
            return pcoll.with_df(df, window_col=WINDOW_COL, window_fn=None,
                                 ts_col=ts_col)
        if fn.merging:
            return pcoll.with_df(pcoll.df, window_fn=fn, window_col=None,
                                 ts_col=ts_col)
        df = pcoll.df.withColumn(WINDOW_COL, fn.assign(F.col(ts_col)))
        return pcoll.with_df(df, window_col=WINDOW_COL, window_fn=None,
                             ts_col=ts_col)


class TimestampCombiner:
    """Output-timestamp policy for windowed aggregates (window.py:96-119)."""

    END_OF_WINDOW = "end_of_window"
    EARLIEST = "earliest"
    LATEST = "latest"

    @staticmethod
    def output_ts(policy: str, window_col: str, ts_col: str) -> Column:
        if policy == TimestampCombiner.END_OF_WINDOW:
            return F.col(f"{window_col}.end")
        if policy == TimestampCombiner.EARLIEST:
            return F.min(ts_col)
        if policy == TimestampCombiner.LATEST:
            return F.max(ts_col)
        raise ValueError(policy)


class CustomMergingWindowFn(WindowFn):
    """General custom merging WindowFn (window.py:121 assign/merge
    interface; exemplar WinningBids.java auction-expiry windows).

    The user supplies ``assign(row) -> (start_us, end_us)`` and
    ``merge(a, b) -> merged | None`` (None = don't merge). Grouping
    operators can't express arbitrary merging in Catalyst, so apply it
    explicitly with ``MergeCustomWindows`` BEFORE grouping: per key, rows
    are sorted by window start and adjacent windows folded with
    ``merge`` — the same sort+segment algorithm Beam's merging-window
    GBK performs, run in applyInPandas.
    """

    merging = True

    def __init__(self, assign_fn, merge_fn):
        self.assign_fn, self.merge_fn = assign_fn, merge_fn

    def assign(self, ts):
        return None

    def grouping_expr(self, ts_col):
        raise TypeError(
            "CustomMergingWindowFn must be applied with MergeCustomWindows "
            "before grouping (arbitrary merges are not a Catalyst expression)")


class OverlapMergingWindowFn(CustomMergingWindowFn):
    """The common merging case: windows merge iff they strictly overlap
    (IntervalWindow semantics — Sessions generalized to arbitrary
    per-element windows). ``assign(row) -> (start_us, end_us)``.

    MergeCustomWindows detects this subclass and compiles the merge to
    the same gaps-and-islands WINDOW-FUNCTION plan Sessions uses (sort
    by start per key, new island when start >= running max end) —
    overlap-merge is a monotone fold, so no per-key pandas group is
    needed and the per-key-must-fit-in-memory bound disappears (Spark's
    window sort spills). Assignment preference order:

    1. ``assign_expr=(start_sql, end_sql)`` — SQL expressions producing
       BIGINT microseconds; the whole operator stays in Catalyst
       (zero Python, one shuffle on the key).
    2. ``assign_batch(pdf) -> (starts_us, ends_us)`` — stamped by a
       NARROW Arrow-batched mapInPandas (no shuffle), merge still
       expression-side.
    3. per-row ``assign_fn`` — same mapInPandas with a row loop.
    """

    def __init__(self, assign_fn, assign_batch=None, assign_expr=None):
        def merge(a, b):
            if b[0] < a[1]:
                return (min(a[0], b[0]), max(a[1], b[1]))
            return None

        super().__init__(assign_fn, merge)
        #: optional vectorized assignment: pdf -> (starts_us, ends_us)
        #: numpy arrays — skips the per-row python assign loop entirely.
        self.assign_batch = assign_batch
        #: optional (start_sql, end_sql) BIGINT-microsecond expressions —
        #: lifts assignment itself into Catalyst.
        self.assign_expr = assign_expr


class MergeCustomWindows(PTransform):
    """Materialize merged custom windows as a ``__window`` column.

    Per key: assign each row's proto-window, sort by start, fold
    overlapping/mergeable neighbours via ``merge_fn``, then stamp every
    row with its final merged window — after this the ordinary grouping
    operators treat it like any other window column.

    Scale note: :class:`OverlapMergingWindowFn` (the WinningBids /
    interval-overlap case) is compiled to the expression-only
    gaps-and-islands plan — one shuffle on the key, spillable sort, no
    per-key memory bound, and zero Python when ``assign_expr`` is given.
    Only a genuinely arbitrary ``merge_fn`` takes the applyInPandas
    path, where the whole key's rows pass through one pandas group (the
    same bound Beam's merging-window GBK has — arbitrary merging is
    inherently per-key-global) and a single key larger than worker
    memory will OOM.
    """

    def __init__(self, window_fn: CustomMergingWindowFn, key_cols, label=None,
                 force_generic: bool = False):
        super().__init__(label)
        self.window_fn = window_fn
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        #: run the generic applyInPandas machinery even for overlap
        #: merges (test hook for the arbitrary-merge path).
        self.force_generic = force_generic

    def _expand_overlap(self, pcoll: PCollection) -> PCollection:
        """Gaps-and-islands compilation for strict-overlap merges.

        Sorted by proto-window start per key, a new merged window
        ("island") begins exactly where start >= the running max end of
        every earlier proto-window — the same invariant the sessionize()
        expression path uses, generalized to per-element intervals."""
        from pyspark.sql.window import Window

        fnw = self.window_fn
        keys = self.key_cols
        ps, pe, new, isl = "__bs_ps", "__bs_pe", "__bs_new", "__bs_isl"
        df = pcoll.df

        if fnw.assign_expr is not None:
            s_sql, e_sql = fnw.assign_expr
            df = df.withColumn(
                ps, F.expr(s_sql).cast("bigint") if isinstance(s_sql, str)
                else s_sql.cast("bigint"))
            df = df.withColumn(
                pe, F.expr(e_sql).cast("bigint") if isinstance(e_sql, str)
                else e_sql.cast("bigint"))
        else:
            import numpy as np
            from pyspark.sql import types as T

            stamp_schema = T.StructType(list(df.schema.fields) + [
                T.StructField(ps, T.LongType()),
                T.StructField(pe, T.LongType())])
            assign_batch, assign_fn = fnw.assign_batch, fnw.assign_fn

            def stamp(batches):
                for pdf in batches:
                    if assign_batch is not None:
                        starts, ends = assign_batch(pdf)
                    else:
                        proto = [assign_fn(r)
                                 for r in pdf.to_dict(orient="records")]
                        starts = [p[0] for p in proto]
                        ends = [p[1] for p in proto]
                    pdf = pdf.copy()
                    pdf[ps] = np.asarray(starts, dtype=np.int64)
                    pdf[pe] = np.asarray(ends, dtype=np.int64)
                    yield pdf

            df = df.mapInPandas(stamp, stamp_schema)

        w = Window.partitionBy(*keys).orderBy(ps, pe)
        run_prev = F.max(pe).over(
            w.rowsBetween(Window.unboundedPreceding, -1))
        df = df.withColumn(new, F.when(
            run_prev.isNull() | (F.col(ps) >= run_prev), 1).otherwise(0))
        df = df.withColumn(isl, F.sum(new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        bounds = Window.partitionBy(*keys, F.col(isl))
        df = df.withColumn(WINDOW_COL, F.struct(
            F.timestamp_micros(F.min(ps).over(bounds)).alias("start"),
            F.timestamp_micros(F.max(pe).over(bounds)).alias("end")))
        df = df.drop(ps, pe, new, isl)
        return pcoll.with_df(df, window_col=WINDOW_COL, window_fn=None)

    def expand(self, pcoll: PCollection) -> PCollection:
        if (isinstance(self.window_fn, OverlapMergingWindowFn)
                and not self.force_generic):
            return self._expand_overlap(pcoll)
        import pandas as pd
        from pyspark.sql import types as T

        assign_fn = self.window_fn.assign_fn
        merge_fn = self.window_fn.merge_fn
        keys = self.key_cols

        in_fields = list(pcoll.df.schema.fields)
        out_schema = T.StructType(in_fields + [T.StructField(
            WINDOW_COL, T.StructType([T.StructField("start", T.TimestampType()),
                                      T.StructField("end", T.TimestampType())]))])
        # the UDF emits FLAT window-bound columns (arrow-vectorizable);
        # the struct is assembled JVM-side afterwards
        flat_schema = T.StructType(in_fields + [
            T.StructField("__bs_ws", T.TimestampType()),
            T.StructField("__bs_we", T.TimestampType())])

        vectorized_overlap = isinstance(self.window_fn, OverlapMergingWindowFn)
        assign_batch = getattr(self.window_fn, "assign_batch", None)

        def apply(pdf: "pd.DataFrame") -> "pd.DataFrame":
            import datetime

            if vectorized_overlap:
                import numpy as np

                if assign_batch is not None:
                    starts, ends = assign_batch(pdf)
                    starts = np.asarray(starts, dtype=np.int64)
                    ends = np.asarray(ends, dtype=np.int64)
                else:
                    proto = [assign_fn(r) for r in pdf.to_dict(orient="records")]
                    starts = np.array([p[0] for p in proto], dtype=np.int64)
                    ends = np.array([p[1] for p in proto], dtype=np.int64)
                order = np.lexsort((ends, starts))
                s_sorted, e_sorted = starts[order], ends[order]
                run_max = np.maximum.accumulate(e_sorted)
                # strict overlap: a new island starts where start >= the
                # running max end of everything before it
                new_island = np.empty(len(order), dtype=bool)
                new_island[0] = True
                new_island[1:] = s_sorted[1:] >= run_max[:-1]
                island = np.cumsum(new_island) - 1
                win_start = np.minimum.reduceat(s_sorted, np.flatnonzero(new_island))
                win_end = np.maximum.reduceat(e_sorted, np.flatnonzero(new_island))
                pdf = pdf.iloc[order].copy()
                # window bounds as vectorized datetime64 columns; the
                # struct assembles JVM-side after the UDF (no per-row
                # python dict/datetime allocation)
                pdf["__bs_ws"] = pd.to_datetime(win_start[island], unit="us")
                pdf["__bs_we"] = pd.to_datetime(win_end[island], unit="us")
                return pdf[[f.name for f in flat_schema.fields]]
            rows = pdf.to_dict(orient="records")
            proto = [assign_fn(r) for r in rows]           # (start_us, end_us)
            order = sorted(range(len(rows)), key=lambda i: proto[i])
            merged: list[list] = []                        # [win, [row idxs]]
            for i in order:
                w = proto[i]
                if merged:
                    m = merge_fn(tuple(merged[-1][0]), w)
                    if m is not None:
                        merged[-1][0] = list(m)
                        merged[-1][1].append(i)
                        continue
                merged.append([list(w), [i]])
            out = []
            for win, idxs in merged:
                s = datetime.datetime.utcfromtimestamp(win[0] / 1e6)
                e = datetime.datetime.utcfromtimestamp(win[1] / 1e6)
                for i in idxs:
                    r = dict(rows[i])
                    r["__bs_ws"] = s
                    r["__bs_we"] = e
                    out.append(r)
            return pd.DataFrame(out, columns=[f.name for f in flat_schema.fields])

        out = (pcoll.df.groupBy(*keys).applyInPandas(apply, schema=flat_schema)
               .withColumn(WINDOW_COL, F.struct(
                   F.col("__bs_ws").alias("start"),
                   F.col("__bs_we").alias("end")))
               .drop("__bs_ws", "__bs_we"))
        return pcoll.with_df(out, window_col=WINDOW_COL, window_fn=None)
