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
