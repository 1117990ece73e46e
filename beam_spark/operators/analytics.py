"""SQL OVER-clause window functions (SURVEY.md §2.10).

Beam reference: BeamWindowRel.java (451 LoC; evaluates by sorting each
partition in memory) + BeamBuiltinAnalyticFunctions.java:35-48
(FIRST_VALUE, LAST_VALUE, ROW_NUMBER, DENSE_RANK, RANK, PERCENT_RANK).

Spark's WindowExec is the strictly-more-scalable native implementation
(range-partitioned, spills); this module is a thin declarative wrapper
that keeps the operator inventory explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform
from beam_spark.operators.sort import _sort_cols


def window_spec(partition_by, order_by, rows_between=None,
                range_between=None) -> WindowSpec:
    """ROWS/RANGE frame bounds (BeamWindowRel frame handling)."""
    pb = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    ob = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    w = Window.partitionBy(*pb).orderBy(*_sort_cols(ob))
    if rows_between is not None:
        w = w.rowsBetween(*rows_between)
    elif range_between is not None:
        w = w.rangeBetween(*range_between)
    return w


UNBOUNDED_PRECEDING = Window.unboundedPreceding
UNBOUNDED_FOLLOWING = Window.unboundedFollowing
CURRENT_ROW = Window.currentRow


class WithAnalytics(PTransform):
    """Attach OVER-clause columns: ``WithAnalytics(spec, rank=F.rank(),
    running=F.sum('x'))``."""

    def __init__(self, spec: WindowSpec, label=None, **cols):
        super().__init__(label)
        self.spec, self.cols = spec, cols

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        for name, col in self.cols.items():
            df = df.withColumn(name, col.over(self.spec))
        return pcoll.with_df(df)


# The analytic function surface (all native):
ANALYTIC_FUNCTIONS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "percent_rank": F.percent_rank,
    "cume_dist": F.cume_dist,
    "ntile": F.ntile,
    "lag": F.lag,
    "lead": F.lead,
    "first_value": F.first,
    "last_value": F.last,
    "nth_value": F.nth_value,
}


class Funnel(PTransform):
    """Ordered-step funnel analysis over an event stream — the
    conversion report (view -> click -> purchase) of product/event
    analytics, built as chained earliest-completion joins.

    Per key, step 1 completes at the key's MINIMUM matching
    timestamp; step i completes at the minimum matching timestamp
    STRICTLY AFTER step i-1's completion; with ``within`` (seconds),
    every later step must also land inside the window anchored at
    the key's step-1 time (the standard "conversion window"
    definition). Ties at the same timestamp do NOT advance the
    funnel (strict >), so one event can never complete two steps.

    Output: one row per step — (step int, step_name, users,
    conv_from_first = users / step1_users, conv_from_prev), rounded
    to 6 dp. Keys with no step-1 event simply don't count.

    Scale: one filtered min-aggregation per step plus a key-equi-join
    against the previous step's completions — k-1 joins for k steps,
    each shuffled on the key, no Python, no windows over the full
    stream. The per-step frames are completion times only (one row
    per key), so every join's build side shrinks monotonically down
    the funnel.
    """

    def __init__(self, steps, event_col: str = "event_type",
                 ts_col: str = "ts", keys="user_id",
                 within: float | None = None, label=None):
        super().__init__(label)
        self.steps = list(steps)
        if len(self.steps) < 2:
            raise ValueError("a funnel needs >= 2 steps")
        if len(set(self.steps)) != len(self.steps):
            raise ValueError("funnel steps must be distinct")
        self.event_col, self.ts_col = event_col, ts_col
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.within = None if within is None else float(within)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        ec, tc, keys = self.event_col, self.ts_col, self.keys
        df = pcoll.df

        cur = (df.where(F.col(ec) == self.steps[0])
               .groupBy(*keys).agg(F.min(tc).alias("__t1")))
        if self.within is not None:
            cur = cur.withColumn(
                "__limit",
                F.col("__t1") + F.expr(
                    f"INTERVAL {self.within} SECONDS"))
        prev_col = "__t1"

        def count_frame(frame, i, name):
            return frame.agg(
                F.lit(i).cast("int").alias("step"),
                F.lit(name).alias("step_name"),
                F.count(F.lit(1)).alias("users"))

        stats = count_frame(cur, 1, self.steps[0])
        for i, step in enumerate(self.steps[1:], start=2):
            ev = (df.where(F.col(ec) == step)
                  .select(*keys, F.col(tc).alias("__ts")))
            j = ev.join(cur, on=keys).where(
                F.col("__ts") > F.col(prev_col))
            if self.within is not None:
                j = j.where(F.col("__ts") <= F.col("__limit"))
            agg_cols = [F.min("__ts").alias(f"__t{i}"),
                        F.first("__t1").alias("__t1")]
            if self.within is not None:
                agg_cols.append(F.first("__limit").alias("__limit"))
            cur = j.groupBy(*keys).agg(*agg_cols)
            stats = stats.unionByName(count_frame(cur, i, step))
            prev_col = f"__t{i}"

        # the stats frame is k rows — a single-partition window over
        # it is free, and keeps the whole report lazy (one job)
        w = Window.orderBy("step").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        out = (stats
               .withColumn("__base", F.first("users").over(w))
               .withColumn("__prev", F.coalesce(
                   F.lag("users").over(Window.orderBy("step")),
                   F.col("users")))
               .select("step", "step_name",
                       F.col("users").cast("long").alias("users"),
                       F.round(F.col("users") / F.col("__base"), 6)
                       .alias("conv_from_first"),
                       F.round(F.col("users") / F.col("__prev"), 6)
                       .alias("conv_from_prev")))
        return pcoll.with_df(out)


class CohortRetention(PTransform):
    """Cohort retention matrix — the standard activity-retention
    report: users are cohorted by the period of their FIRST event,
    and each (cohort, period-offset) cell counts the distinct users
    active in that later period. ``granularity``: 'month' (default),
    'week', or 'day'.

    Output: (cohort string, offset int, users bigint, retention
    double) — retention = users / the cohort's offset-0 count,
    rounded 6. Cohort renders as 'yyyy-MM' / 'yyyy-MM-dd' strings so
    the report is engine-portable (no timestamp rendering drift).

    Scale: one per-user min aggregation, one distinct over (user,
    period) — both shuffled on the user key — then a (cohort,
    offset) count-distinct and a broadcast-sized join against the
    offset-0 row per cohort. No Python, no windows over the stream.
    """

    _FMT = {"month": "yyyy-MM", "week": "yyyy-MM-dd",
            "day": "yyyy-MM-dd"}

    def __init__(self, ts_col: str = "ts", keys="user_id",
                 granularity: str = "month", label=None):
        super().__init__(label)
        if granularity not in self._FMT:
            raise ValueError(
                f"granularity {granularity!r}: month / week / day")
        self.ts_col = ts_col
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.granularity = granularity

    def expand(self, pcoll: PCollection) -> PCollection:
        tc, keys, g = self.ts_col, self.keys, self.granularity
        df = pcoll.df.where(F.col(tc).isNotNull())
        trunc = lambda c: F.date_trunc(g, c)  # noqa: E731
        first = (df.groupBy(*keys)
                 .agg(trunc(F.min(tc)).alias("__cohort")))
        act = (df.select(*keys, trunc(F.col(tc)).alias("__bucket"))
               .distinct())
        j = act.join(first, on=keys)
        if g == "month":
            off = F.months_between("__bucket", "__cohort").cast("int")
        elif g == "week":
            off = (F.datediff("__bucket", "__cohort") / 7).cast("int")
        else:
            off = F.datediff("__bucket", "__cohort").cast("int")
        cells = (j.withColumn("__off", off)
                 .groupBy("__cohort", "__off")
                 .agg(F.count_distinct(*[F.col(k) for k in keys])
                      .alias("users")))
        base = (cells.where(F.col("__off") == 0)
                .select(F.col("__cohort"),
                        F.col("users").alias("__base")))
        out = (cells.join(F.broadcast(base), on="__cohort")
               .select(
                   F.date_format("__cohort", self._FMT[g])
                   .alias("cohort"),
                   F.col("__off").alias("offset"),
                   F.col("users").cast("long").alias("users"),
                   F.round(F.col("users") / F.col("__base"), 6)
                   .alias("retention")))
        return pcoll.with_df(out)


class TransitionCounts(PTransform):
    """Per-key event-to-event transition counts and probabilities —
    the empirical Markov chain of a clickstream / event log (the
    input statistic for sequence anomaly scoring and next-event
    models).

    Per key, ordered by ``order_by``, each adjacent pair
    (event_t, event_{t+1}) is one transition; counts aggregate over
    all keys. Output: (src_event, dst_event, n, p) where p = n /
    total transitions out of src_event, rounded 6.

    Scale: one window lead per key + one (src, dst) aggregation; the
    per-src totals come from a window over the (src, dst) aggregate
    (cardinality = distinct event pairs, tiny), not a second scan.
    """

    def __init__(self, event_col: str = "event_type", keys="user_id",
                 order_by="ts", label=None):
        super().__init__(label)
        self.event_col = event_col
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        ec, keys, ob = self.event_col, self.keys, self.order_by
        w = Window.partitionBy(*keys).orderBy(*ob)
        pairs = (pcoll.df
                 .withColumn("__nxt", F.lead(ec).over(w))
                 .where(F.col("__nxt").isNotNull())
                 .groupBy(F.col(ec).alias("src_event"),
                          F.col("__nxt").alias("dst_event"))
                 .agg(F.count(F.lit(1)).alias("n")))
        tot = Window.partitionBy("src_event")
        out = pairs.select(
            "src_event", "dst_event", F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"))
        return pcoll.with_df(out)


class AssociationRules(PTransform):
    """Market-basket pair rules (a-priori, size-2 itemsets): for every
    directional pair of items that co-occur in >= ``min_support``
    baskets, emit support, confidence and lift — the batch analogue of
    the reference's per-key combiner pipelines for co-occurrence
    statistics (cf. the reference SDK's transforms/stats.py posture of
    distributed counting + a tiny report frame).

    Semantics: a basket is the set of DISTINCT items grouped by
    ``basket_keys`` (presence, not multiplicity — the classic
    formulation). For each unordered frequent pair {a, b} both rules
    a=>b and b=>a are emitted with
        support    = pair_n / n_baskets
        confidence = pair_n / ante_n
        lift       = (pair_n * n_baskets) / (ante_n * cons_n)
    where every count is an exact integer and every ratio is ONE
    double division of exactly-represented values — so results compare
    bit-exactly across engines (no accumulation-order drift).

    Scale: the a-priori prefilter drops infrequent items BEFORE the
    basket self-join, so the join's per-basket fan-out is k'^2 over
    frequent items only; the pair aggregation is partial (map-side
    combine), and the item-count and n_baskets frames joined at the
    end are item-cardinality / 1-row (broadcast). Shuffles: distinct
    on (basket, item), the basket-keyed self-join, the pair groupBy —
    all keyed, AQE-skew-safe. n_baskets is computed as a 1-row
    aggregate cross-joined in (no driver collect).

    Output: (antecedent, consequent, pair_n, ante_n, cons_n,
    n_baskets, support, confidence, lift).
    """

    def __init__(self, item_col: str, basket_keys, min_support: int = 2,
                 min_confidence: float = 0.0, label=None):
        super().__init__(label)
        if int(min_support) < 1:
            raise ValueError(f"min_support {min_support}: need >= 1")
        if not 0.0 <= float(min_confidence) <= 1.0:
            raise ValueError(
                f"min_confidence {min_confidence} outside [0, 1]")
        self.item_col = item_col
        self.basket_keys = ([basket_keys] if isinstance(basket_keys, str)
                            else list(basket_keys))
        self.min_support = int(min_support)
        self.min_confidence = float(min_confidence)

    def expand(self, pcoll: PCollection) -> PCollection:
        it, bk, ms = self.item_col, self.basket_keys, self.min_support
        b = pcoll.df.select(*bk, it).where(F.col(it).isNotNull()).distinct()
        nb = b.select(*bk).distinct().agg(
            F.count(F.lit(1)).cast("long").alias("n_baskets"))
        ic = (b.groupBy(it).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
              .where(F.col("cnt") >= ms))
        freq = b.join(ic.select(it), on=it, how="left_semi")
        lhs = freq.select(*bk, F.col(it).alias("__a"))
        rhs = freq.select(*bk, F.col(it).alias("__b"))
        pair = (lhs.join(rhs, on=bk)
                .where(F.col("__a") < F.col("__b"))
                .groupBy("__a", "__b")
                .agg(F.count(F.lit(1)).cast("long").alias("pair_n"))
                .where(F.col("pair_n") >= ms))
        dirs = pair.select(
            F.col("__a").alias("antecedent"),
            F.col("__b").alias("consequent"), "pair_n").unionAll(
            pair.select(
                F.col("__b").alias("antecedent"),
                F.col("__a").alias("consequent"), "pair_n"))
        ante = ic.select(F.col(it).alias("antecedent"),
                         F.col("cnt").alias("ante_n"))
        cons = ic.select(F.col(it).alias("consequent"),
                         F.col("cnt").alias("cons_n"))
        out = (dirs.join(F.broadcast(ante), "antecedent")
               .join(F.broadcast(cons), "consequent")
               .crossJoin(F.broadcast(nb))
               .select(
                   "antecedent", "consequent", "pair_n", "ante_n",
                   "cons_n", "n_baskets",
                   (F.col("pair_n").cast("double")
                    / F.col("n_baskets").cast("double")).alias("support"),
                   (F.col("pair_n").cast("double")
                    / F.col("ante_n").cast("double")).alias("confidence"),
                   ((F.col("pair_n").cast("double")
                     * F.col("n_baskets").cast("double"))
                    / (F.col("ante_n").cast("double")
                       * F.col("cons_n").cast("double"))).alias("lift")))
        if self.min_confidence > 0.0:
            out = out.where(F.col("confidence") >= self.min_confidence)
        return pcoll.with_df(out)


class FrequentItemsets(PTransform):
    """A-priori frequent itemsets up to size ``max_size`` (<= 3): the
    support-counting core of market-basket mining, one level deeper
    than AssociationRules' pairs. Presence semantics (distinct items
    per basket).

    Level pruning (the a-priori bound, applied as semi-joins BEFORE
    each self-join): L2 enumerates pairs only over L1-frequent items;
    L3 enumerates triples only over items that appear in at least one
    L2-frequent pair — per-basket fan-out is k'^2 / k''^3 over the
    PRUNED alphabets, never the raw one. All counts are exact
    integers; output compares exactly.

    Scale: one distinct + one count per level plus basket-keyed
    self-joins (partial-agg counts, AQE-skew-safe); the item
    alphabets joined for pruning are item-cardinality (semi-joins).
    The triple join is the honest cost center — bound the alphabet
    (bucket items upstream) for k''^3-heavy corpora.

    Output: (items array — ascending, size int, support_n long).
    """

    def __init__(self, item_col: str, basket_keys,
                 min_support: int = 2, max_size: int = 3, label=None):
        super().__init__(label)
        if int(min_support) < 1:
            raise ValueError(f"min_support {min_support}: need >= 1")
        if not 1 <= int(max_size) <= 3:
            raise ValueError(f"max_size {max_size} outside [1, 3]")
        self.item_col = item_col
        self.basket_keys = ([basket_keys] if isinstance(basket_keys, str)
                            else list(basket_keys))
        self.min_support = int(min_support)
        self.max_size = int(max_size)

    def expand(self, pcoll: PCollection) -> PCollection:
        it, bk, ms = self.item_col, self.basket_keys, self.min_support
        b = (pcoll.df.select(*bk, it)
             .where(F.col(it).isNotNull()).distinct())
        l1 = (b.groupBy(it)
              .agg(F.count(F.lit(1)).cast("long").alias("c"))
              .where(F.col("c") >= ms))
        levels = [l1.select(F.array(F.col(it)).alias("items"),
                            F.lit(1).cast("int").alias("size"),
                            F.col("c").alias("support_n"))]
        # the pruned basket list is reused by BOTH legs of every
        # level self-join (and by the next level's pruning), so an
        # unmaterialized fb replicates the distinct+L1+semi-join tree
        # once per reference — ~15 copies at max_size=3. One eager
        # localCheckpoint per level keeps the plan linear; the
        # checkpointed frame is the identical row set (a-priori
        # implementations cache the pruned transaction list per level
        # for the same reason at any scale).
        fb = b.join(l1.select(it), on=it, how="left_semi")
        if self.max_size >= 2:
            fb = fb.localCheckpoint(eager=True)
            x = fb.select(*bk, F.col(it).alias("__a"))
            y = fb.select(*bk, F.col(it).alias("__b"))
            l2 = (x.join(y, on=bk).where(F.col("__b") > F.col("__a"))
                  .groupBy("__a", "__b")
                  .agg(F.count(F.lit(1)).cast("long").alias("c"))
                  .where(F.col("c") >= ms))
            levels.append(l2.select(
                F.array("__a", "__b").alias("items"),
                F.lit(2).cast("int").alias("size"),
                F.col("c").alias("support_n")))
        if self.max_size >= 3:
            it2 = (l2.select(F.explode(F.array(
                F.col("__a"), F.col("__b"))).alias(it))
                   .distinct())
            fb2 = (fb.join(it2, on=it, how="left_semi")
                   .localCheckpoint(eager=True))
            x = fb2.select(*bk, F.col(it).alias("__a"))
            y = fb2.select(*bk, F.col(it).alias("__b"))
            z = fb2.select(*bk, F.col(it).alias("__c"))
            l3 = (x.join(y, on=bk).where(F.col("__b") > F.col("__a"))
                  .join(z, on=bk).where(F.col("__c") > F.col("__b"))
                  .groupBy("__a", "__b", "__c")
                  .agg(F.count(F.lit(1)).cast("long").alias("c"))
                  .where(F.col("c") >= ms))
            levels.append(l3.select(
                F.array("__a", "__b", "__c").alias("items"),
                F.lit(3).cast("int").alias("size"),
                F.col("c").alias("support_n")))
        out = levels[0]
        for lv in levels[1:]:
            out = out.unionByName(lv)
        return pcoll.with_df(out)


class Attribution(PTransform):
    """First/last-touch conversion attribution over an event stream:
    for every conversion event, find the first or last qualifying
    touch event by the same key that happened STRICTLY BEFORE it (and
    within ``lookback`` seconds when set) — the marketing-analytics
    join behind "which channel gets credit", and the same shape as
    span-linking a label event back to its provenance event in a
    training-data log.

    ``model='last_touch'`` (default) credits the most recent touch,
    'first_touch' the earliest in the window. Ties at the same
    timestamp break on the order column (event id). Conversions with
    no qualifying touch emit NULL touch columns (report them as
    'direct').

    Scale: ONE key-partitioned ordered window (running first/last of
    the touch struct over preceding rows) — no self-join, no
    per-conversion scan; with lookback, an (ts - touch_ts) filter on
    the single candidate. Everything stays native.

    Output: one row per conversion — (keys, conv_<order>, conv_ts,
    touch_<order>, touch_event, touch_ts).
    """

    def __init__(self, conversion_if: str, touch_if: str,
                 model: str = "last_touch", keys="user_id",
                 event_col: str = "event_type", ts_col: str = "ts",
                 order_col: str = "event_id",
                 lookback: float | None = None, label=None):
        super().__init__(label)
        if model not in ("first_touch", "last_touch"):
            raise ValueError(
                f"model {model!r}: 'first_touch' or 'last_touch'")
        self.conversion_if, self.touch_if = conversion_if, touch_if
        self.model = model
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.event_col, self.ts_col = event_col, ts_col
        self.order_col = order_col
        self.lookback = None if lookback is None else float(lookback)

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        ec, tc, oc = self.event_col, self.ts_col, self.order_col
        w = (Window.partitionBy(*self.keys).orderBy(tc, oc)
             .rowsBetween(Window.unboundedPreceding, -1))
        touch = F.when(F.expr(self.touch_if),
                       F.struct(F.col(tc).alias("t"),
                                F.col(oc).alias("o"),
                                F.col(ec).alias("e")))
        pick = (F.first(touch, ignorenulls=True)
                if self.model == "first_touch"
                else F.last(touch, ignorenulls=True))
        df = (pcoll.df
              .withColumn("__touch", pick.over(w))
              .where(F.expr(self.conversion_if)))
        if self.lookback is not None:
            df = df.withColumn(
                "__touch",
                F.when(F.col(tc).cast("double")
                       - F.col("__touch.t").cast("double")
                       <= self.lookback, F.col("__touch")))
        out = df.select(
            *self.keys,
            F.col(oc).alias(f"conv_{oc}"),
            F.col(tc).alias("conv_ts"),
            F.col("__touch.o").alias(f"touch_{oc}"),
            F.col("__touch.e").alias("touch_event"),
            F.col("__touch.t").alias("touch_ts"))
        return pcoll.with_df(out)


class RfmSegmentation(PTransform):
    """RFM (recency / frequency / monetary) customer segmentation —
    the standard behavioral-scoring pass of marketing/engagement
    analytics (Hughes 1994), built from a transaction log:

        recency_days = days from the entity's last event to ``as_of``
        frequency    = event count
        monetary     = exact decimal sum of ``amount``

    Each metric is scored 1..n_bins by ntile over the ENTITY frame
    (one row per entity — already aggregated, orders of magnitude
    smaller than the log). Orderings are made total with the entity
    id as tie-break, so scores are deterministic and replayable:
    recency DESC (most recent -> highest score), frequency ASC,
    monetary ASC. rfm_cell = 100*r + 10*f + m, plus the conventional
    named segments (champions / loyal / new / at_risk / hibernating /
    regular).

    Scale: one partial-agg groupBy over the log, then three ntile
    windows over the entity frame. ntile with no partition key is a
    single-partition sort of that frame: exact and fine up to ~10^7
    entities; past that pass ``exact=False`` to score against
    approx_percentile cutpoints instead (broadcast 1-row frame, no
    global window, boundary ties may differ from ntile — that is the
    documented tradeoff, not a bug).

    Output: entity + (recency_days, frequency, monetary, r_score,
    f_score, m_score, rfm_cell, segment).
    """

    def __init__(self, entity: str, ts: str, amount: str,
                 as_of: str | None = None, n_bins: int = 5,
                 exact: bool = True,
                 amount_dec: str = "decimal(18,2)", label=None):
        super().__init__(label)
        self.entity, self.ts, self.amount = entity, ts, amount
        self.as_of = as_of
        self.n_bins = int(n_bins)
        if self.n_bins < 2:
            raise ValueError("n_bins must be >= 2")
        self.exact = exact
        self.amount_dec = amount_dec

    def expand(self, pcoll: PCollection) -> PCollection:
        from pyspark.sql import Window

        e, ts, am = self.entity, self.ts, self.amount
        df = pcoll.df.where(F.col(e).isNotNull()
                            & F.col(ts).isNotNull())
        if self.as_of is not None:
            asof = F.lit(self.as_of).cast("date")
        else:
            # corpus max last-activity date (1-row window over the
            # already-aggregated entity frame)
            asof = F.max("__last").over(Window.partitionBy())
        ent = (df.groupBy(F.col(e).alias("entity"))
               .agg(F.max(F.col(ts).cast("date")).alias("__last"),
                    F.count(F.lit(1)).cast("long").alias("frequency"),
                    F.sum(F.col(am).cast(self.amount_dec))
                    .alias("monetary")))
        ent = ent.withColumn(
            "recency_days",
            F.datediff(asof, F.col("__last")).cast("long"))
        nb = self.n_bins
        if self.exact:
            ent = (ent
                   .withColumn("r_score", F.ntile(nb).over(
                       Window.orderBy(F.desc("recency_days"),
                                      F.col("entity"))))
                   .withColumn("f_score", F.ntile(nb).over(
                       Window.orderBy(F.asc("frequency"),
                                      F.col("entity"))))
                   .withColumn("m_score", F.ntile(nb).over(
                       Window.orderBy(F.asc("monetary"),
                                      F.col("entity")))))
        else:
            qs = [i / nb for i in range(1, nb)]
            cuts = ent.agg(*[
                F.expr(f"approx_percentile({c}, array"
                       f"({', '.join(str(x) for x in qs)}), 10000)")
                .alias(f"__cut_{c}")
                for c in ("recency_days", "frequency", "monetary")])
            ent = ent.crossJoin(F.broadcast(cuts))
            # score = 1 + number of cutpoints strictly below the value
            def _score(c, invert):
                arr = F.col(f"__cut_{c}")
                val = F.col(c)
                s = (F.lit(1) + F.aggregate(
                    arr, F.lit(0),
                    lambda acc, cut: acc + F.when(val > cut, 1)
                    .otherwise(0))).cast("int")
                return (F.lit(nb + 1) - s).cast("int") if invert else s
            ent = (ent
                   .withColumn("r_score",
                               _score("recency_days", invert=True))
                   .withColumn("f_score", _score("frequency", False))
                   .withColumn("m_score", _score("monetary", False))
                   .drop("__cut_recency_days", "__cut_frequency",
                         "__cut_monetary"))
        r, f = F.col("r_score"), F.col("f_score")
        hi, lo = self.n_bins - 1, 2        # >= hi is "high", <= 2 "low"
        expr = (F.when((r >= hi) & (f >= hi), "champions")
                .when((r >= hi - 1) & (f >= hi - 1), "loyal")
                .when((r >= hi) & (f <= lo), "new")
                .when((r <= lo) & (f >= hi - 1), "at_risk")
                .when((r <= lo) & (f <= lo), "hibernating")
                .otherwise("regular"))
        out = (ent.withColumn(
                   "rfm_cell",
                   (100 * F.col("r_score") + 10 * F.col("f_score")
                    + F.col("m_score")).cast("int"))
               .withColumn("segment", expr)
               .select("entity", "recency_days", "frequency",
                       "monetary", "r_score", "f_score", "m_score",
                       "rfm_cell", "segment"))
        return pcoll.with_df(out)
