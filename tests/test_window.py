"""Window semantics unit tests with hand-computed expectations
(reference model: transforms/window.py semantics + util.py assert_that)."""

from beam_spark.pcollection import Pipeline
from beam_spark.operators.core import Create, WithTimestamps
from beam_spark.operators.group import CombineGlobally, CombinePerKey
from beam_spark.operators.window import (FixedWindows, GlobalWindows,
                                         Sessions, SlidingWindows, WindowInto)


def _events(spark, rows):
    return (Pipeline(spark)
            | Create([{"t": t, "k": k, "v": v} for t, k, v in rows])
            | WithTimestamps("t"))


def test_fixed_windows_counts(spark):
    pc = _events(spark, [("2024-01-01 00:00:30", "a", 1),
                         ("2024-01-01 00:00:59", "a", 2),
                         ("2024-01-01 00:01:10", "a", 4)])
    out = pc | WindowInto(FixedWindows(60)) | CombinePerKey("k", n="count(*)", s="sum(v)")
    got = {(r["__window"]["start"].isoformat(), r["n"], r["s"]) for r in out.collect()}
    assert got == {("2024-01-01T00:00:00", 2, 3), ("2024-01-01T00:01:00", 1, 4)}


def test_sliding_windows_membership(spark):
    # size 60s, period 30s: each element in exactly 2 windows
    pc = _events(spark, [("2024-01-01 00:00:45", "a", 1)])
    out = pc | WindowInto(SlidingWindows(60, 30))
    starts = sorted(r["__window"]["start"].isoformat() for r in out.collect())
    assert starts == ["2024-01-01T00:00:00", "2024-01-01T00:00:30"]


def test_sliding_window_boundary_element(spark):
    # element exactly on a window start belongs to that window, not the
    # one ending at its timestamp (Beam [start, end) semantics)
    pc = _events(spark, [("2024-01-01 00:01:00", "a", 1)])
    out = pc | WindowInto(SlidingWindows(60, 30))
    starts = sorted(r["__window"]["start"].isoformat() for r in out.collect())
    assert starts == ["2024-01-01T00:00:30", "2024-01-01T00:01:00"]


def test_session_windows_merge_and_gap(spark):
    pc = _events(spark, [("2024-01-01 00:00:00", "u1", 1),
                         ("2024-01-01 00:00:40", "u1", 2),   # merges (gap 60)
                         ("2024-01-01 00:02:00", "u1", 3),   # new session
                         ("2024-01-01 00:00:10", "u2", 5)])
    out = pc | WindowInto(Sessions(60)) | CombinePerKey("k", n="count(*)", s="sum(v)")
    got = {(r["k"], r["__window"]["start"].isoformat(),
            r["__window"]["end"].isoformat(), r["n"], r["s"])
           for r in out.collect()}
    assert got == {
        ("u1", "2024-01-01T00:00:00", "2024-01-01T00:01:40", 2, 3),
        ("u1", "2024-01-01T00:02:00", "2024-01-01T00:03:00", 1, 3),
        ("u2", "2024-01-01T00:00:10", "2024-01-01T00:01:10", 1, 5),
    }


def test_global_windows_drops_window(spark):
    pc = _events(spark, [("2024-01-01 00:00:00", "a", 1),
                         ("2024-01-02 00:00:00", "a", 2)])
    out = (pc | WindowInto(FixedWindows(60)) | WindowInto(GlobalWindows())
           | CombineGlobally(n="count(*)"))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n"] == 2


def test_custom_merging_window_fn(spark):
    """WinningBids-style custom merging windows: each element opens a
    window [t, t+expiry); overlapping windows merge to their union."""
    from beam_spark.operators.window import (CustomMergingWindowFn,
                                             MergeCustomWindows)
    from beam_spark.operators.group import CombinePerKey

    def assign(row):
        t = int(row["t"].timestamp() * 1e6)
        return (t, t + 60_000_000)  # 60s expiry

    def merge(a, b):
        if b[0] < a[1]:  # overlap -> union
            return (min(a[0], b[0]), max(a[1], b[1]))
        return None

    from pyspark.sql import functions as F

    fn = CustomMergingWindowFn(assign, merge)
    pc = (Pipeline(spark)
          | Create([{"t": t, "k": k, "v": v} for t, k, v in
                    [("2024-01-01 00:00:00", "k1", 1),
                     ("2024-01-01 00:00:30", "k1", 2),   # overlaps -> merge
                     ("2024-01-01 00:05:00", "k1", 4)]]))  # separate
    pc = pc.with_df(pc.df.withColumn("t", F.col("t").cast("timestamp")), ts_col="t")
    out = (pc | MergeCustomWindows(fn, "k") | CombinePerKey("k", n="count(*)", s="sum(v)"))
    got = {(r["__window"]["start"].isoformat(), r["n"], r["s"]) for r in out.collect()}
    assert got == {("2024-01-01T00:00:00", 2, 3), ("2024-01-01T00:05:00", 1, 4)}


def test_assert_that_per_window(spark):
    from beam_spark.testing import assert_that, equal_to_per_window

    pc = (_events(spark, [("2024-01-01 00:00:10", "a", 1),
                          ("2024-01-01 00:01:10", "a", 2)])
          | WindowInto(FixedWindows(60))
          | CombinePerKey("k", n="count(*)"))
    assert_that(pc, equal_to_per_window({
        "2024-01-01T00:00:00": [("a", 1)],
        "2024-01-01T00:01:00": [("a", 1)],
    }))


def test_overlap_merge_three_paths_agree(spark):
    """OverlapMergingWindowFn's three assignment routes (assign_expr
    Catalyst-only, assign_batch mapInPandas stamp, force_generic
    applyInPandas fold) produce identical merged windows."""
    from pyspark.sql import functions as F

    from beam_spark.operators.window import (MergeCustomWindows,
                                             OverlapMergingWindowFn)

    rows = [("2024-01-01 00:00:00", "k1", 1), ("2024-01-01 00:00:40", "k1", 2),
            ("2024-01-01 00:02:00", "k1", 3), ("2024-01-01 00:02:30", "k2", 4),
            ("2024-01-01 00:09:59", "k2", 5), ("2024-01-01 00:11:00", "k2", 6)]
    pc0 = Pipeline(spark) | Create(
        [{"t": t, "k": k, "v": v} for t, k, v in rows])
    pc0 = pc0.with_df(pc0.df.withColumn("t", F.col("t").cast("timestamp")),
                      ts_col="t")

    def assign(row):
        t = int(row["t"].timestamp() * 1e6)
        return (t, t + 60_000_000)

    def assign_batch(pdf):
        starts = pdf["t"].astype("int64") // 1000
        return starts, starts + 60_000_000

    def run(fn, **kw):
        out = (pc0 | MergeCustomWindows(fn, "k", **kw)).df
        return sorted((r["k"], r["v"], r["__window"]["start"].isoformat(),
                       r["__window"]["end"].isoformat())
                      for r in out.collect())

    expr_fn = OverlapMergingWindowFn(
        assign, assign_expr=("unix_micros(t)", "unix_micros(t) + 60000000"))
    batch_fn = OverlapMergingWindowFn(assign, assign_batch)
    rowloop_fn = OverlapMergingWindowFn(assign)

    got_expr = run(expr_fn)
    assert got_expr == run(batch_fn) == run(rowloop_fn) \
        == run(rowloop_fn, force_generic=True)
    # k1: first two rows merge ([0,100s)), third separate; k2: 09:59
    # window [599s, 659s) overlaps 11:00's [660s)? no — 659 < 660.
    starts = {(k, s) for k, _, s, _ in got_expr}
    assert ("k1", "2024-01-01T00:00:00") in starts
    assert ("k1", "2024-01-01T00:02:00") in starts


def test_overlap_merge_expr_path_is_pure_catalyst(spark):
    """With assign_expr, the merged-window plan has NO python stages and
    a single exchange (the key shuffle the window sort needs)."""
    from pyspark.sql import functions as F

    from beam_spark.operators.window import (MergeCustomWindows,
                                             OverlapMergingWindowFn)

    pc = Pipeline(spark) | Create(
        [{"t": "2024-01-01 00:00:00", "k": "a", "v": 1}])
    pc = pc.with_df(pc.df.withColumn("t", F.col("t").cast("timestamp")),
                    ts_col="t")
    fn = OverlapMergingWindowFn(
        lambda r: (0, 1),
        assign_expr=("unix_micros(t)", "unix_micros(t) + 60000000"))
    out = (pc | MergeCustomWindows(fn, "k")).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" not in plan
