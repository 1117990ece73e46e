"""Unit tests for element-wise + grouping operators, Beam assert_that style
(reference test model: transforms/util_test.py, combiners_test.py)."""

from pyspark.sql import functions as F

from beam_spark.pcollection import Pipeline
from beam_spark.operators.core import (Create, Distinct, Filter, Flatten,
                                       FlatMap, Impulse, KvSwap, Map,
                                       Partition, Regex, Select, ToString,
                                       WithKeys, WithTimestamps)
from beam_spark.operators.group import (CoGroupByKey, CombineGlobally,
                                        CombinePerKey, GroupBy, GroupByKey)
from beam_spark.testing import assert_that, equal_to


def p(spark):
    return Pipeline(spark)


def test_create_scalars(spark):
    out = p(spark) | Create([1, 2, 3], schema="value: long")
    assert_that(out, equal_to([(1,), (2,), (3,)]))


def test_create_dicts(spark):
    out = p(spark) | Create([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    assert_that(out, equal_to([(1, "x"), (2, "y")]))


def test_impulse(spark):
    out = p(spark) | Impulse()
    assert out.count() == 1


def test_map_expression(spark):
    out = (p(spark) | Create([{"x": 1}, {"x": 2}])
           | Map("x * 10 as y"))
    assert_that(out, equal_to([(10,), (20,)]))


def test_map_callable(spark):
    out = (p(spark) | Create([{"x": 1}, {"x": 2}])
           | Map(lambda r: {"y": r["x"] + 1}, output_schema="y: long"))
    assert_that(out, equal_to([(2,), (3,)]))


def test_flatmap_callable(spark):
    out = (p(spark) | Create([{"x": 2}, {"x": 3}])
           | FlatMap(lambda r: [{"y": i} for i in range(r["x"])],
                     output_schema="y: long"))
    assert_that(out, equal_to([(0,), (1,), (0,), (1,), (2,)]))


def test_filter_expression_and_callable(spark):
    src = [{"x": i} for i in range(10)]
    out1 = p(spark) | Create(src) | Filter("x % 2 = 0")
    assert out1.count() == 5
    out2 = p(spark) | Create(src) | Filter(lambda r: r["x"] % 2 == 0)
    assert out2.count() == 5


def test_select_named(spark):
    out = (p(spark) | Create([{"a": 1, "b": 2}])
           | Select("a", c="a + b"))
    assert_that(out, equal_to([(1, 3)]))


def test_partition(spark):
    parts = (p(spark) | Create([{"x": i} for i in range(10)])
             | Partition("x % 3", 3))
    assert [pc.count() for pc in parts] == [4, 3, 3]


def test_flatten(spark):
    a = p(spark) | Create([{"x": 1}])
    b = p(spark) | Create([{"x": 2}, {"x": 3}])
    out = (a, b) | Flatten()
    assert_that(out, equal_to([(1,), (2,), (3,)]))


def test_with_keys_kvswap(spark):
    out = (p(spark) | Create([{"value": "ab"}])
           | WithKeys(F.length("value")) | KvSwap())
    rows = out.collect()
    assert rows[0]["value"] == 2 and rows[0]["key"] == "ab"


def test_distinct(spark):
    out = p(spark) | Create([{"x": 1}, {"x": 1}, {"x": 2}]) | Distinct()
    assert out.count() == 2


def test_group_by_key(spark):
    out = (p(spark) | Create([{"key": "a", "v": 1}, {"key": "a", "v": 2},
                              {"key": "b", "v": 3}])
           | GroupByKey())
    got = {r["key"]: sorted(r["values"]) for r in out.collect()}
    assert got == {"a": [1, 2], "b": [3]}


def test_combine_per_key(spark):
    out = (p(spark) | Create([{"k": "a", "v": 1}, {"k": "a", "v": 2},
                              {"k": "b", "v": 5}])
           | CombinePerKey("k", total="sum(v)", n="count(*)"))
    got = {r["k"]: (r["total"], r["n"]) for r in out.collect()}
    assert got == {"a": (3, 2), "b": (5, 1)}


def test_combine_globally(spark):
    out = (p(spark) | Create([{"v": 1}, {"v": 2}, {"v": 3}])
           | CombineGlobally(total="sum(v)", avg="avg(v)"))
    row = out.collect()[0]
    assert row["total"] == 6 and row["avg"] == 2.0


def test_groupby_aggregate_field(spark):
    out = (p(spark) | Create([{"k": "a", "x": 1.0}, {"k": "a", "x": 3.0}])
           | GroupBy("k").aggregate_field("x", "sum", "sx")
                         .aggregate_field("x", "max", "mx"))
    row = out.collect()[0]
    assert row["sx"] == 4.0 and row["mx"] == 3.0


def test_cogroup_by_key(spark):
    emails = p(spark) | Create([{"k": "amy", "email": "amy@x.com"}])
    phones = p(spark) | Create([{"k": "amy", "phone": "123"},
                                {"k": "bob", "phone": "456"}])
    out = {"emails": emails, "phones": phones} | CoGroupByKey("k")
    got = {r["k"]: (sorted(r["emails"]), sorted(r["phones"])) for r in out.collect()}
    assert got == {"amy": (["amy@x.com"], ["123"]), "bob": ([], ["456"])}


def test_regex_and_tostring(spark):
    out = (p(spark) | Create([{"s": "a1b2"}])
           | Regex.find_all("s", "[0-9]", out="digits"))
    assert out.collect()[0]["digits"] == ["1", "2"]
    out2 = p(spark) | Create([{"a": 1, "b": "x"}]) | ToString(":")
    assert out2.collect()[0]["value"] == "1:x"


def test_with_timestamps(spark):
    out = (p(spark) | Create([{"t": "2024-01-01 00:00:00", "v": 1}])
           | WithTimestamps("t"))
    assert out.ts_col == "__ts"
    assert out.collect()[0]["__ts"] is not None


def test_bucketed_table_join_no_shuffle(spark, tmp_path):
    """Two same-bucketed tables join without a shuffle exchange — the
    co-located join strategy for repeated big joins."""
    import io
    from contextlib import redirect_stdout

    from beam_spark.pcollection import PCollection
    from beam_spark.sources.io import WriteBucketedTable

    import shutil
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    # a crashed prior run can orphan the managed-table location
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t_ in ("bt_orders", "bt_lineitem"):
        shutil.rmtree(f"{wh}/{t_}", ignore_errors=True)
    orders = spark.range(1000).select(F.col("id").alias("o_orderkey"),
                                      (F.col("id") % 7).alias("x"))
    li = spark.range(3000).select((F.col("id") % 1000).alias("o_orderkey"),
                                  F.col("id").alias("l_id"))
    PCollection(orders) | WriteBucketedTable("bt_orders", "o_orderkey", 8)
    PCollection(li) | WriteBucketedTable("bt_lineitem", "o_orderkey", 8)

    # disable broadcast so the join strategy is SMJ (the 100 TB case
    # where neither side broadcasts) and bucketing can prove its point
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_orders").join(spark.table("bt_lineitem"), "o_orderkey")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert joined.count() == 3000
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing removed the shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pandas_on_spark_conversion(spark, sf_dir):
    """SURVEY §2.11: the Beam DataFrame API capability is satisfied by
    pyspark.pandas — expose and exercise the conversion."""
    from beam_spark import queries as q

    pc = q.table(spark, sf_dir, "orders")
    psdf = pc.df.pandas_api()
    counts = psdf.groupby("o_orderpriority")["o_totalprice"].count()
    exact = {r["o_orderpriority"]: r["n"] for r in
             pc.df.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    assert counts.to_dict() == exact


def test_regex_matches_replace_split(spark):
    out = (p(spark) | Create([{"s": "ab12"}, {"s": "xxxx"}])
           | Regex.matches("s", "[0-9]+"))
    assert [r["match"] for r in out.collect()] == ["12"]
    out2 = (p(spark) | Create([{"s": "a-b-c"}])
            | Regex.replace_all("s", "-", "_"))
    assert out2.collect()[0]["s"] == "a_b_c"
    out3 = (p(spark) | Create([{"s": "a,b,c"}]) | Regex.split("s", ","))
    assert out3.collect()[0]["parts"] == ["a", "b", "c"]


def test_maptuple_flatmaptuple_flattenwith(spark):
    from beam_spark.operators.core import FlatMapTuple, FlattenWith, MapTuple

    src = p(spark) | Create([{"a": 2, "b": 3}])
    m = src | MapTuple(lambda a, b: {"s": a + b}, output_schema="s: long")
    assert m.collect()[0]["s"] == 5
    fm = src | FlatMapTuple(lambda a, b: [{"x": i} for i in range(a)],
                            output_schema="x: long")
    assert sorted(r["x"] for r in fm.collect()) == [0, 1]
    other = p(spark) | Create([{"a": 9, "b": 9}])
    fw = src | FlattenWith(other)
    assert fw.count() == 2


def test_register_parquet_table(spark, sf_dir):
    from beam_spark.sources.io import register_parquet_table

    spark.sql("DROP TABLE IF EXISTS ext_region")
    register_parquet_table(spark, "ext_region", f"{sf_dir}/region.parquet")
    assert spark.sql("SELECT count(*) FROM ext_region").first()[0] == 5


def test_orderby_rejects_unbounded(spark):
    from beam_spark.operators.sort import OrderBy
    from beam_spark.pcollection import PCollection

    pc = PCollection(spark.range(1), is_bounded=False)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unbounded"):
        pc | OrderBy("id")


def test_sample_fixed_size_per_key(spark):
    from beam_spark.operators.combiners import Sample

    pc = (p(spark) | Create([{"k": chr(97 + i % 2), "v": i} for i in range(20)])
          | Sample.FixedSizePerKey("k", 3))
    got = {}
    for r in pc.collect():
        got.setdefault(r["k"], []).append(r["v"])
    assert {k: len(v) for k, v in got.items()} == {"a": 3, "b": 3}


def test_todict_combiner(spark):
    from beam_spark.operators.combiners import ToDict

    pc = (p(spark) | Create([{"key": "x", "value": 1}, {"key": "y", "value": 2}])
          | ToDict())
    assert pc.collect()[0]["dict"] == {"x": 1, "y": 2}


def test_top_largest_differs_from_smallest(spark):
    """Beam Top.Of/Largest = k LARGEST; Smallest = k smallest
    (combiners.py:188; regression: both used to sort ascending)."""
    from beam_spark.operators.combiners import Top

    pc = p(spark) | Create([{"v": i} for i in [5, 1, 9, 3, 7]])
    largest = sorted(r["v"] for r in (pc | Top.Largest(2, "v")).df.collect())
    smallest = sorted(r["v"] for r in (pc | Top.Smallest(2, "v")).df.collect())
    assert largest == [7, 9]
    assert smallest == [1, 3]


def test_salted_join_rejects_outer(spark):
    from beam_spark.operators.join import salted_join
    import pytest

    df = spark.range(4).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner"):
        salted_join(df, df, on="k", how="full")


def test_log_elements_is_lazy(spark):
    """LogElements must not trigger a job at pipeline-construction time
    (regression: it used to limit().collect() inside expand())."""
    import pytest
    from beam_spark.operators.core import LogElements
    from beam_spark.operators.pardo import BatchedDoFn

    def boom(pdf):
        raise RuntimeError("evaluated")

    pc = p(spark) | Create([{"x": 1}]) | BatchedDoFn(boom, "x long")
    tapped = pc | LogElements(n=5)          # must NOT raise (no job yet)
    with pytest.raises(Exception, match="evaluated"):
        tapped.df.collect()                 # job runs only on action


def test_combine_values_builtin_and_callable(spark):
    """CombineValues (core.py:3201): post-GBK combining of grouped value
    arrays — JVM fold for builtins, Arrow path for callables."""
    from beam_spark.operators.group import CombineValues, GroupByKey

    pc = p(spark) | Create([{"k": "a", "v": 1}, {"k": "a", "v": 2},
                            {"k": "b", "v": 5}])
    grouped = pc | GroupByKey("k", value_col="v")
    sums = {r["k"]: r["combined"]
            for r in (grouped | CombineValues("sum")).df.collect()}
    assert sums == {"a": 3.0, "b": 5.0}

    joined = {r["k"]: r["combined"] for r in
              (grouped | CombineValues(
                  lambda vs: "+".join(map(str, sorted(vs))),
                  output_type="string")).df.collect()}
    assert joined == {"a": "1+2", "b": "5"}


def test_asof_join_modes(spark):
    """Backward (inclusive tie), forward, and tolerance semantics of the
    as-of join; unmatched rows keep NULL right columns."""
    from pyspark.sql import functions as F

    from beam_spark.operators.join import AsOfJoin
    from beam_spark.pcollection import PCollection

    trades = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", 100.0),
         (1, "2024-01-01 00:00:15", 101.0),
         (2, "2024-01-01 00:00:10", 50.0)],
        "k long, t string, px double").withColumn(
            "t", F.col("t").cast("timestamp"))
    quotes = spark.createDataFrame(
        [(1, "2024-01-01 00:00:04", 99.5),
         (1, "2024-01-01 00:00:15", 100.9),   # exact tie with a trade
         (2, "2024-01-01 00:00:20", 49.9)],
        "k long, t string, bid double").withColumn(
            "t", F.col("t").cast("timestamp"))

    def run(**kw):
        out = (PCollection(trades) | AsOfJoin(quotes, on="k",
                                              left_ts="t", **kw)).df
        return {(r["k"], r["px"]): r["bid"] for r in out.collect()}

    back = run()
    assert back == {(1, 100.0): 99.5, (1, 101.0): 100.9, (2, 50.0): None}
    fwd = run(direction="forward")
    assert fwd == {(1, 100.0): 100.9, (1, 101.0): 100.9, (2, 50.0): 49.9}
    tol = run(tolerance=5)
    assert tol == {(1, 100.0): 99.5, (1, 101.0): 100.9, (2, 50.0): None}


def test_asof_join_single_shuffle_no_python(spark):
    """The union + last-value-window plan shuffles ONCE on the key and
    contains no Python stages (no per-key range cross-product)."""
    from pyspark.sql import functions as F

    from beam_spark.operators.join import AsOfJoin
    from beam_spark.pcollection import PCollection

    left = spark.range(100).selectExpr(
        "id % 5 AS k", "timestamp_micros(id * 1000000) AS t", "id AS v")
    right = spark.range(20).selectExpr(
        "id % 5 AS k", "timestamp_micros(id * 5000000) AS t", "id AS w")
    out = (PCollection(left) | AsOfJoin(right, on="k", left_ts="t")).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan


def test_interval_join_bounds_inclusive(spark):
    """[lower, upper] bounds are inclusive; cross-key rows never match;
    the bucketed plan equals the naive range join."""
    from pyspark.sql import functions as F

    from beam_spark.operators.join import IntervalJoin
    from beam_spark.pcollection import PCollection

    l = spark.createDataFrame([(1, "2024-01-01 00:02:00", "p1")],
                              "k long, t string, pid string").withColumn(
        "t", F.col("t").cast("timestamp"))
    r = spark.createDataFrame(
        [(1, "2024-01-01 00:00:59", "early"),   # 61s before: out
         (1, "2024-01-01 00:01:00", "edge_lo"),  # exactly -60s: in
         (1, "2024-01-01 00:01:30", "mid"),
         (1, "2024-01-01 00:02:00", "edge_hi"),  # exactly 0s: in
         (1, "2024-01-01 00:02:01", "late"),     # after: out
         (2, "2024-01-01 00:01:30", "wrong_key")],
        "k long, t string, cid string").withColumn(
        "t", F.col("t").cast("timestamp"))
    out = (PCollection(l) | IntervalJoin(r, on="k", left_ts="t",
                                         lower=-60, upper=0)).df
    got = sorted(x["cid"] for x in out.collect())
    assert got == ["edge_hi", "edge_lo", "mid"]
    # cross-check vs the naive range join on the same frames
    naive = (l.alias("l").join(
        r.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & F.unix_micros("r.t").between(
            F.unix_micros("l.t") - 60_000_000, F.unix_micros("l.t"))))
    assert naive.count() == len(got)


def test_scd_type2_apply_semantics(spark):
    """ScdType2Apply: no-op changes collapse (current row keeps its
    original valid_from), reverts create NEW versions, unknown keys
    start their history, closed history passes through untouched,
    missing dimension columns raise."""
    import pytest as _pytest
    from beam_spark.operators.scd import ScdType2Apply
    from beam_spark.pcollection import PCollection

    dim = spark.createDataFrame(
        [
            (1, "gold", 0, 5),        # closed history row
            (1, "silver", 5, None),   # current
            (2, "bronze", 0, None),   # current, will get a no-op
        ],
        "id long, tier string, valid_from long, valid_to long")
    ch = spark.createDataFrame(
        [
            (1, "gold", 10),          # revert: silver -> gold
            (1, "gold", 12),          # no-op after the revert
            (2, "bronze", 7),         # pure no-op
            (3, "new", 4),            # unknown key
            (3, "newer", 9),
        ],
        "id long, tier string, ts long")
    out = (PCollection(ch) | ScdType2Apply(dim, key="id")).df
    got = sorted(map(tuple, out.collect()))
    assert got == sorted([
        (1, "gold", 0, 5),            # history untouched
        (1, "silver", 5, 10),         # closed by the revert
        (1, "gold", 10, None),        # revert IS a new version
        (2, "bronze", 0, None),       # no-op: original valid_from kept
        (3, "new", 4, 9),
        (3, "newer", 9, None),
    ])
    with _pytest.raises(ValueError, match="lacks columns"):
        (PCollection(ch) | ScdType2Apply(
            dim.drop("valid_to"), key="id")).df.count()
    # the reverse direction must raise too: a dimension attribute the
    # changes frame does not carry would be silently dropped from the
    # returned dimension (closed history included)
    with _pytest.raises(ValueError, match="absent from the"):
        (PCollection(ch.drop("tier")) | ScdType2Apply(
            dim, key="id")).df.count()


def test_gapfill_modes(spark):
    """GapFill: the spine covers [min, max] per key densely; generated
    rows mark filled=true; 'null' leaves gaps NULL, ('const', 0)
    coalesces, 'locf' carries the last observation forward; explicit
    start/end bounds override the observed range."""
    import pytest as _pytest
    from beam_spark.operators.group import GapFill
    from beam_spark.pcollection import PCollection

    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a", 1.0),
         ("2024-01-01 03:20:00", "a", 5.0),
         ("2024-01-01 01:00:00", "b", 2.0)],
        "t string, k string, v double").selectExpr(
        "CAST(t AS TIMESTAMP) AS t", "k", "v")
    base = dict(ts_col="t", width=3600,
                aggs={"s": "sum(v)"}, keys=["k"])
    h0 = 1704067200

    nul = {(r["k"], r["bucket"]): (r["s"], r["filled"]) for r in
           (PCollection(df) | GapFill(**base)).df.collect()}
    assert nul == {
        ("a", h0): (1.0, False), ("a", h0 + 3600): (None, True),
        ("a", h0 + 7200): (None, True), ("a", h0 + 10800): (5.0, False),
        ("b", h0 + 3600): (2.0, False)}

    locf = {(r["k"], r["bucket"]): r["s"] for r in
            (PCollection(df) | GapFill(**base, fill="locf"))
            .df.collect()}
    assert locf[("a", h0 + 3600)] == 1.0      # carried forward
    assert locf[("a", h0 + 7200)] == 1.0
    assert locf[("a", h0 + 10800)] == 5.0

    cst = {(r["k"], r["bucket"]): r["s"] for r in
           (PCollection(df) | GapFill(**base, fill=("const", 0.0)))
           .df.collect()}
    assert cst[("a", h0 + 3600)] == 0.0

    # explicit bounds extend the spine beyond the observed range
    wide = (PCollection(df) | GapFill(
        **base, start=h0 - 3600, end=h0 + 14400)).df
    assert wide.filter("k = 'a'").count() == 6    # h-1 .. h+4
    assert wide.filter(
        "k = 'a' AND bucket < 1704067200 AND NOT filled").count() == 0

    # linear interpolation: 1.0 at h0, 5.0 at h0+3h -> gaps lerp
    itp = {(r["k"], r["bucket"]): r["s"] for r in
           (PCollection(df) | GapFill(**base, fill="interp"))
           .df.collect()}
    assert abs(itp[("a", h0 + 3600)] - (1.0 + 4.0 / 3)) < 1e-12
    assert abs(itp[("a", h0 + 7200)] - (1.0 + 8.0 / 3)) < 1e-12
    assert itp[("a", h0)] == 1.0 and itp[("a", h0 + 10800)] == 5.0

    # interp leaves buckets outside the observed span NULL
    span = (PCollection(df) | GapFill(
        **base, fill="interp", start=h0 - 3600, end=h0 + 10800)).df
    lead_row = {r["bucket"]: r["s"]
                for r in span.filter("k = 'a'").collect()}
    assert lead_row[h0 - 3600] is None

    with _pytest.raises(ValueError, match="fill must be"):
        GapFill("t", 3600, {"s": "sum(v)"}, fill="bogus")

    # misaligned explicit bounds floor-align onto the bucket grid —
    # without this the spine would never meet the data buckets and
    # every row would come out filled=true with NULL aggregates
    mis = (PCollection(df) | GapFill(
        **base, start=h0 + 17, end=h0 + 10800 + 17)).df
    rows = {(r["k"], r["bucket"]): (r["s"], r["filled"])
            for r in mis.filter("k = 'a'").collect()}
    assert rows[("a", h0)] == (1.0, False)          # real data matched
    assert rows[("a", h0 + 10800)] == (5.0, False)
    assert len(rows) == 4                            # h0 .. h0+3h


def test_merge_intervals_semantics(spark):
    """MergeIntervals: overlap merges, touching merges by default but
    not with merge_touching=False, disjoint stays split, n_merged
    counts members, per-key isolation."""
    from beam_spark.operators.core import MergeIntervals
    from beam_spark.pcollection import PCollection

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 12), ("a", 12, 20), ("a", 30, 40),
         ("b", 0, 1)],
        "k string, start long, end long")
    got = {(r["k"], r["start"], r["end"]): r["n_merged"] for r in
           (PCollection(df) | MergeIntervals(keys="k")).df.collect()}
    assert got == {("a", 0, 20): 3, ("a", 30, 40): 1, ("b", 0, 1): 1}

    strict = {(r["k"], r["start"], r["end"]) for r in
              (PCollection(df) | MergeIntervals(
                  keys="k", merge_touching=False)).df.collect()}
    assert ("a", 0, 12) in strict and ("a", 12, 20) in strict


def test_cdc_apply_semantics(spark):
    """CdcApply: latest change per key wins (multi-column change
    order), terminal D removes the key, non-terminal D is overridden
    by a later upsert, lowercase/word ops accepted via first-letter
    match, unrecognized op fails the job at runtime."""
    import pytest as _pytest

    from beam_spark.operators.scd import CdcApply
    from beam_spark.pcollection import PCollection

    ch = spark.createDataFrame(
        [(1, 1, 1, "insert", 10.0), (1, 1, 2, "u", 11.0),
         (1, 2, 1, "U", 12.0),                  # latest for key 1
         (2, 1, 1, "I", 20.0), (2, 2, 1, "D", 0.0),   # deleted
         (3, 1, 1, "I", 30.0), (3, 1, 2, "d", 0.0),
         (3, 2, 1, "U", 31.0)],                 # delete then revive
        "id long, ts long, seq long, op string, v double")
    out = {r["id"]: (r["ts"], r["seq"], r["v"]) for r in
           (PCollection(ch) | CdcApply(
               key="id", order_by=["ts", "seq"])).df.collect()}
    assert out == {1: (2, 1, 12.0), 3: (2, 1, 31.0)}
    assert 2 not in out

    bad = spark.createDataFrame([(1, 1, 1, "X", 0.0)],
                                "id long, ts long, seq long, op string,"
                                " v double")
    with _pytest.raises(Exception, match="unrecognized op"):
        (PCollection(bad) | CdcApply(
            key="id", order_by=["ts", "seq"])).df.collect()
