"""SqlTransform + dialect shim + scalar function parity tests."""

import pytest
from pyspark.sql import functions as F

from beam_spark.pcollection import Pipeline
from beam_spark.operators.core import Create
from beam_spark.sql import SqlTransform, _rewrite_tvf
from beam_spark import queries as q


def test_sql_single_input_default_name(spark):
    out = (Pipeline(spark) | Create([{"x": 1}, {"x": 2}])
           | SqlTransform("SELECT sum(x) AS s FROM PCOLLECTION"))
    assert out.collect()[0]["s"] == 3


def test_sql_multi_input_join(spark, sf_dir):
    orders = q.table(spark, sf_dir, "orders")
    customer = q.table(spark, sf_dir, "customer")
    out = ({"orders": orders, "customer": customer}
           | SqlTransform("""
               SELECT c_mktsegment, COUNT(*) AS n
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_mktsegment"""))
    rows = {r["c_mktsegment"]: r["n"] for r in out.collect()}
    assert sum(rows.values()) == orders.df.count()


def test_tumble_tvf_rewrite_and_run(spark, sf_dir):
    events = q.table(spark, sf_dir, "events")
    out = ({"events": events}
           | SqlTransform("""
               SELECT window_start, COUNT(*) AS n
               FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
               GROUP BY window_start"""))
    rows = out.collect()
    assert sum(r["n"] for r in rows) == events.df.count()
    # window starts are hour-aligned
    assert all(r["window_start"].minute == 0 and r["window_start"].second == 0
               for r in rows)


def test_session_tvf_rewrite_and_run(spark, sf_dir):
    events = q.table(spark, sf_dir, "events")
    out = ({"events": events}
           | SqlTransform("""
               SELECT user_id, COUNT(*) AS n
               FROM TABLE(SESSION(TABLE events, DESCRIPTOR(ts), INTERVAL '30' MINUTE))
               GROUP BY user_id, window"""))
    assert sum(r["n"] for r in out.collect()) == events.df.count()


def test_rewrite_is_noop_without_tvf():
    sql = "SELECT a FROM t WHERE b > 1"
    assert _rewrite_tvf(sql) == sql


def test_std_operators_all_native(spark):
    """The BeamSqlDslSqlStdOperatorsTest surface (SURVEY §2.9) runs as
    plain Spark SQL."""
    row = spark.sql("""
        SELECT abs(-2) a, ceil(1.2) c, floor(1.8) f, mod(7, 3) m,
               power(2, 10) p, round(2.5) r, sign(-9) s, sqrt(16) q,
               char_length('abc') cl, initcap('ab cd') ic, lower('AB') lo,
               upper('ab') up, trim('  x  ') tr, coalesce(NULL, 5) co,
               nullif(1, 1) ni, substring('hello', 2, 3) su,
               endswith('hello', 'lo') ew, startswith('hello', 'he') sw,
               hex(255) hx, reverse('ab') rv, lpad('x', 3, '0') lp,
               md5('a') h1, sha2('a', 256) h2,
               year(timestamp '2024-03-05 01:02:03') y,
               quarter(timestamp '2024-03-05 01:02:03') qu,
               dayofweek(timestamp '2024-03-05 01:02:03') dw,
               extract(hour FROM timestamp '2024-03-05 01:02:03') eh,
               isnan(cast('NaN' as double)) nn
    """).collect()[0]
    assert row["a"] == 2 and row["m"] == 1 and row["p"] == 1024.0
    assert row["ic"] == "Ab Cd" and row["su"] == "ell"
    assert row["ew"] and row["sw"] and row["hx"] == "FF"
    assert row["y"] == 2024 and row["qu"] == 1 and row["eh"] == 1
    assert row["nn"] is True and row["ni"] is None


def test_is_inf_shim(spark):
    from beam_spark.functions import is_inf

    df = spark.createDataFrame([(float("inf"),), (1.0,)], "x double")
    got = [r[0] for r in df.select(is_inf("x")).collect()]
    assert got == [True, False]


def test_hop_tvf_rewrite_and_run(spark, sf_dir):
    events = q.table(spark, sf_dir, "events")
    out = ({"events": events}
           | SqlTransform("""
               SELECT window_start, COUNT(*) AS n
               FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                              INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
               GROUP BY window_start"""))
    rows = out.collect()
    # each event lands in 4 windows (60/15)
    assert sum(r["n"] for r in rows) == events.df.count() * 4
    assert all(r["window_start"].minute % 15 == 0 for r in rows)


def test_match_recognize_sql_clause(spark, sf_dir):
    """MATCH_RECOGNIZE SQL text -> cep.MatchRecognize, result equal to the
    python-API gate query."""
    events = q.table(spark, sf_dir, "events")
    out = ({"events": events} | SqlTransform("""
        SELECT user_id, n_views, purchase_value
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES COUNT(V.event_id) AS n_views,
                   LAST(P.value) AS purchase_value
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ P)
          DEFINE V AS V.event_type = 'view',
                 P AS P.event_type = 'purchase'
        )"""))
    got = sorted((r["user_id"], r["n_views"], round(r["purchase_value"], 6))
                 for r in out.collect())
    ref = q.queries()["q_cep_views_then_purchase"](spark, sf_dir)
    exp = sorted((r["user_id"], r["n_views"], round(r["purchase_value"], 6))
                 for r in ref.collect())
    assert got == exp and len(got) > 0


def test_create_external_table_ddl(spark, tmp_path):
    """CREATE EXTERNAL TABLE DDL registers a schema-declared file source
    as a queryable table (SqlCreateExternalTable.java shape)."""
    import pytest
    from beam_spark.sql import execute_ddl

    p = str(tmp_path / "ext")
    spark.range(5).selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v") \
        .write.mode("overwrite").parquet(p)
    execute_ddl(spark, f"""
        CREATE EXTERNAL TABLE ext_t (k BIGINT, v DOUBLE)
        TYPE parquet LOCATION '{p}'
    """)
    got = spark.sql("SELECT SUM(v) AS s, COUNT(*) AS n FROM ext_t").first()
    assert (got["s"], got["n"]) == (20.0, 5)

    with pytest.raises(ValueError, match="connector jar"):
        execute_ddl(spark, f"CREATE EXTERNAL TABLE t2 (k BIGINT) "
                           f"TYPE bigtable LOCATION '{p}'")
    with pytest.raises(ValueError, match="unsupported DDL"):
        execute_ddl(spark, "DROP TABLE ext_t")


def test_ddl_tblproperties_reach_reader(spark, tmp_path):
    """TBLPROPERTIES JSON flows into reader options (CSV delimiter)."""
    from beam_spark.sql import execute_ddl

    p = str(tmp_path / "csvsrc")
    (spark.range(3).selectExpr("id AS k", "id * 2 AS v")
     .write.mode("overwrite").option("header", True).option("sep", ";")
     .csv(p))
    execute_ddl(spark, f"""
        CREATE EXTERNAL TABLE csv_t (k BIGINT, v BIGINT)
        TYPE csv LOCATION '{p}' TBLPROPERTIES '{{"sep": ";"}}'
    """)
    assert spark.sql("SELECT SUM(v) AS s FROM csv_t").first()["s"] == 6


def test_qualify_rewrite(spark):
    """QUALIFY dialect rewrite: alias-referencing and direct-window
    predicates, ORDER BY/LIMIT tails preserved, window columns kept in
    the output; subquery QUALIFY and SELECT DISTINCT refuse loudly;
    QUALIFY inside a string literal is untouched."""
    import pytest

    from beam_spark.pcollection import PCollection
    from beam_spark.sql import SqlTransform, _rewrite_qualify

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 9.0), (3, "b", 7.0), (4, "b", 2.0)],
        "id long, g string, v double")
    top = (PCollection(df) | SqlTransform(
        "SELECT g, id, row_number() OVER (PARTITION BY g ORDER BY v "
        "DESC) AS rn FROM PCOLLECTION QUALIFY rn = 1 ORDER BY g")).df
    assert [(r["g"], r["id"], r["rn"]) for r in top.collect()] == [
        ("a", 2, 1), ("b", 3, 1)]

    direct = (PCollection(df) | SqlTransform(
        "SELECT g, id FROM PCOLLECTION QUALIFY row_number() OVER "
        "(PARTITION BY g ORDER BY v DESC) = 1")).df
    assert sorted((r["g"], r["id"]) for r in direct.collect()) == [
        ("a", 2), ("b", 3)]

    lim = (PCollection(df) | SqlTransform(
        "SELECT id, rank() OVER (ORDER BY v DESC) AS rk "
        "FROM PCOLLECTION QUALIFY rk <= 3 ORDER BY rk LIMIT 2")).df
    assert [r["id"] for r in lim.collect()] == [2, 3]

    with pytest.raises(ValueError, match="subquery"):
        _rewrite_qualify("SELECT * FROM (SELECT g FROM t QUALIFY x)")
    with pytest.raises(ValueError, match="DISTINCT"):
        _rewrite_qualify(
            "SELECT DISTINCT g FROM t QUALIFY row_number() "
            "OVER (ORDER BY g) = 1")
    # a string literal containing the word is not a clause
    assert _rewrite_qualify(
        "SELECT 'no QUALIFY here' AS s FROM t") \
        == "SELECT 'no QUALIFY here' AS s FROM t"


def test_qualify_rewrite_adversarial(spark):
    """Scanner robustness (round-12 review findings, all reproduced
    then fixed): comments, backtick identifiers, backslash-escaped
    quotes and a bare qualify COLUMN pass through untouched; hints
    don't defeat the DISTINCT guard; set operations and OFFSET tails
    handled."""
    import pytest

    from beam_spark.sql import _rewrite_qualify as rq

    untouched = [
        "SELECT x FROM t -- TODO: use QUALIFY later",
        "SELECT x FROM (SELECT x FROM t) /* QUALIFY would be nicer */",
        r"SELECT 'it\'s a QUALIFY' AS s FROM t",
        "SELECT a, qualify FROM t",          # non-reserved identifier
        "SELECT 'no QUALIFY here' AS s FROM t",
    ]
    for q in untouched:
        assert rq(q) == q, q

    # backtick identifier named `from` must not confuse clause anchors
    bt = ("SELECT `from`, row_number() OVER (ORDER BY v) AS rn "
          "FROM t QUALIFY rn = 1")
    out = rq(bt)
    assert out.startswith("SELECT * EXCEPT (__qualify)")
    assert "`from`, row_number()" in out

    # OFFSET-only tail preserved outside the subquery
    off = rq("SELECT g, rn FROM t QUALIFY rn <= 3 OFFSET 2")
    assert off.endswith("OFFSET 2") and "(rn <= 3) AS __qualify" in off

    with pytest.raises(ValueError, match="set operation"):
        rq("SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t "
           "UNION ALL SELECT b, 1 FROM u QUALIFY rn = 1")
    with pytest.raises(ValueError, match="DISTINCT"):
        rq("SELECT /*+ REPARTITION(4) */ DISTINCT g FROM t "
           "QUALIFY row_number() OVER (ORDER BY g) = 1")


def test_asof_join_sql_rewrite(spark):
    """ASOF [LEFT] JOIN dialect: inner drops unmatched left rows,
    LEFT keeps them with NULLs, ties match inclusively, key renames
    resolve, and malformed specs refuse loudly (strict inequality,
    one-sided terms, zero/two inequalities, unknown tables)."""
    import pytest

    from beam_spark.pcollection import PCollection
    from beam_spark.sql import SqlTransform

    trades = spark.createDataFrame(
        [(1, "2024-01-01 10:00:05", 100.0),
         (1, "2024-01-01 10:00:10", 101.0),     # exact tie with quote
         (2, "2024-01-01 09:00:00", 50.0)],
        "sym long, t string, px double").selectExpr(
        "sym", "CAST(t AS TIMESTAMP) AS t", "px")
    quotes = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 99.5),
         (1, "2024-01-01 10:00:10", 100.5)],
        "qsym long, qt string, bid double").selectExpr(
        "qsym", "CAST(qt AS TIMESTAMP) AS qt", "bid")
    tabs = {"trades": PCollection(trades), "quotes": PCollection(quotes)}

    inner = (tabs | SqlTransform(
        "SELECT a.sym, a.px, b.bid FROM trades a ASOF JOIN quotes b "
        "ON a.sym = b.qsym AND a.t >= b.qt ORDER BY a.px")).df.collect()
    assert [(r["sym"], r["px"], r["bid"]) for r in inner] == [
        (1, 100.0, 99.5), (1, 101.0, 100.5)]   # tie matched, sym 2 out

    left = (tabs | SqlTransform(
        "SELECT a.sym, a.px, b.bid FROM trades a ASOF LEFT JOIN "
        "quotes b ON a.sym = b.qsym AND a.t >= b.qt")).df.collect()
    assert sorted((r["sym"], r["bid"]) for r in left) == [
        (1, 99.5), (1, 100.5), (2, None)]

    for bad, msg in [
        ("SELECT a.sym FROM trades a ASOF JOIN quotes b "
         "ON a.sym = b.qsym AND a.t > b.qt", "strict"),
        ("SELECT a.sym FROM trades a ASOF JOIN quotes b "
         "ON a.sym = b.qsym", "inequality"),
        ("SELECT a.sym FROM trades a ASOF JOIN quotes b "
         "ON a.sym = a.sym AND a.t >= b.qt", "one side"),
        ("SELECT a.sym FROM trades a ASOF JOIN missing b "
         "ON a.sym = b.qsym AND a.t >= b.qt", "unknown table"),
    ]:
        with pytest.raises(ValueError, match=msg):
            (tabs | SqlTransform(bad)).df
