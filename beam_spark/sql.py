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

MATCH_RECOGNIZE (BeamMatchRel + NFA) lives in operators/cep.py; the SQL
clause form is parsed by sql_match.py (constrained grammar) and executed
through the same operator.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from beam_spark.pcollection import PCollection, PTransform

_INTERVAL = r"INTERVAL\s+'([^']+)'\s+(\w+)"


_UNIT_US = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000,
            "day": 86_400_000_000}


def _iv(value: str, unit: str) -> str:
    return f"{value} {unit.lower()}{'' if value == '1' else 's' if not unit.lower().endswith('s') else ''}"


def _iv_us(value: str, unit: str) -> int:
    return int(value) * _UNIT_US[unit.lower().rstrip("s")]


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
        # Calcite HOP TVF argument order: slide interval, then size.
        t, ts = m.group(1), m.group(2)
        slide_us = _iv_us(m.group(3), m.group(4))
        size_us = _iv_us(m.group(5), m.group(6))
        # enumerate each element's windows inline (same construction as
        # operators.window.SlidingWindows.assign_sql)
        tcol = f"unix_micros({ts})"
        first = (f"(floor(({tcol} - {size_us}) / {slide_us}) + 1) * {slide_us}")
        last = f"floor({tcol} / {slide_us}) * {slide_us}"
        enum = (f"transform(sequence(CAST({first} AS BIGINT), CAST({last} AS BIGINT), "
                f"{slide_us}), s -> struct(timestamp_micros(s) AS start, "
                f"timestamp_micros(s + {size_us}) AS end))")
        return (f"(SELECT *, window.start AS window_start, window.end AS window_end "
                f"FROM (SELECT *, explode({enum}) AS window FROM {t}))")

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


def _rewrite_qualify(sql: str) -> str:
    """Rewrite the SQL:2023 / Teradata-style ``QUALIFY <pred>`` clause
    (filter evaluated AFTER window functions — DuckDB/Snowflake/
    BigQuery all ship it; Spark does not) into the standard subquery
    form:

        SELECT <list> FROM ... QUALIFY <pred> [ORDER BY ...] [LIMIT n]
        ->
        SELECT * EXCEPT (__qualify) FROM (
            SELECT <list>, (<pred>) AS __qualify FROM ...
        ) WHERE __qualify [ORDER BY ...] [LIMIT n]

    Window aliases from the select list are visible inside the
    predicate (it is evaluated in the subquery's projection).

    The keyword scan is paren-depth-, string-, comment- (``--`` and
    ``/* */``) and backtick-identifier-aware with backslash escapes
    inside literals, so QUALIFY in any of those contexts is not a
    clause. A top-level QUALIFY BEFORE the first top-level FROM is a
    plain identifier (QUALIFY is not reserved in Spark) and the query
    passes through. Refused loudly (ValueError): QUALIFY in a
    subquery, with SELECT DISTINCT (the injected flag would join the
    dedup key set), or over a top-level set operation (the flag
    would land in one branch only).
    """
    upper = sql.upper()
    if "QUALIFY" not in upper:
        return sql

    def _spans(kw: str, max_depth: int = 0):
        """Start offsets of keyword ``kw`` at paren depth <=
        max_depth (None: any), outside '…'/"…" literals (backslash
        escapes honored), `…` identifiers and both comment styles."""
        spans, depth, i = [], 0, 0
        n = len(sql)
        while i < n:
            c = sql[i]
            if c in ("'", '"'):
                quote, i = c, i + 1
                while i < n:
                    if sql[i] == "\\":
                        i += 2
                        continue
                    if sql[i] == quote:
                        break
                    i += 1
            elif c == "`":
                i += 1
                while i < n and sql[i] != "`":
                    i += 1
            elif c == "-" and sql.startswith("--", i):
                while i < n and sql[i] != "\n":
                    i += 1
            elif c == "/" and sql.startswith("/*", i):
                j = sql.find("*/", i + 2)
                i = n if j < 0 else j + 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif ((max_depth is None or depth <= max_depth)
                  and upper.startswith(kw, i)
                  and (i == 0 or not (sql[i - 1].isalnum()
                                      or sql[i - 1] == "_"))
                  and (i + len(kw) == n
                       or not (sql[i + len(kw)].isalnum()
                               or sql[i + len(kw)] == "_"))):
                spans.append(i)
            i += 1
        return spans

    from_pos = _spans("FROM")
    tops = [p for p in _spans("QUALIFY")
            if from_pos and p > from_pos[0]]
    if not tops:
        nested = [p for p in _spans("QUALIFY", max_depth=None)
                  if not (from_pos and p <= from_pos[0])
                  and p not in _spans("QUALIFY")]
        if nested:
            raise ValueError(
                "QUALIFY inside a subquery is not supported by the "
                "rewrite — lift the inner query into its own "
                "SqlTransform")
        # only in strings/comments/backticks, or an identifier
        # before FROM — not a clause
        return sql
    if len(tops) > 1:
        raise ValueError("multiple top-level QUALIFY clauses")
    q = tops[0]
    f = from_pos[0]
    # set operations: the injected flag would land in ONE branch only
    setops = [p for kw in ("UNION", "INTERSECT", "EXCEPT")
              for p in _spans(kw) if f < p < q]
    if setops:
        raise ValueError(
            "QUALIFY over a top-level set operation is not supported "
            "by the rewrite — wrap the set operation in a subquery")
    # the predicate runs to the next top-level ORDER BY / LIMIT /
    # OFFSET / end
    tail_starts = [p for kw in ("ORDER", "LIMIT", "OFFSET")
                   for p in _spans(kw) if p > q]
    cut = min(tail_starts) if tail_starts else len(sql)
    pred = sql[q + len("QUALIFY"):cut].strip().rstrip(";")
    tail = sql[cut:].strip().rstrip(";")
    head = sql[:q].rstrip()
    if not pred:
        raise ValueError("empty QUALIFY predicate")
    sel = _spans("SELECT")
    if not sel or sel[0] > f:
        raise ValueError("QUALIFY requires a plain SELECT query")
    # DISTINCT guard via the scanner (comment/hint-proof): any
    # top-level DISTINCT between SELECT and FROM joins the dedup key
    # set once the flag is injected — refuse instead of corrupting.
    # (A top-level DISTINCT inside an aggregate is depth >= 1.)
    if any(sel[0] < p < f for p in _spans("DISTINCT")):
        raise ValueError(
            "QUALIFY with SELECT DISTINCT is not supported by the "
            "rewrite — deduplicate in an outer query")
    inner = (head[:f].rstrip().rstrip(",")
             + f", ({pred}) AS __qualify " + head[f:])
    return (f"SELECT * EXCEPT (__qualify) FROM ({inner}) "
            f"WHERE __qualify {tail}").strip()


_ASOF_RE = re.compile(
    r"FROM\s+(\w+)(?:\s+(?:AS\s+)?(?!ASOF\b)(\w+))?\s+"
    r"ASOF\s+(LEFT\s+)?JOIN\s+(\w+)(?:\s+(?:AS\s+)?(\w+))?\s+"
    r"ON\s+(.*?)(?=\s+WHERE\s|\s+GROUP\s|\s+ORDER\s|\s+LIMIT\s|\s*$)",
    re.IGNORECASE | re.DOTALL)


def _rewrite_asof_join(sql: str, spark, tables: dict) -> str:
    """Execute a DuckDB-style ``ASOF [LEFT] JOIN`` via the AsOfJoin
    operator (operators/join.py — the union + last-value window
    plan, no pairwise range join) and rewrite the query to read the
    result view. Constrained grammar, the MATCH_RECOGNIZE pattern:

        FROM l [la] ASOF [LEFT] JOIN r [ra]
        ON la.k = ra.k [AND ...] AND la.ts >= ra.ts

    The ON clause takes any number of equi-key conditions plus
    EXACTLY ONE inequality: ``left_ts >= right_ts`` (backward match,
    the common case) or ``left_ts <= right_ts`` (forward). Strict
    ``>``/``<`` are refused (the operator's tie semantics are
    inclusive, matching DuckB's default ``>=``). Plain ASOF JOIN is
    INNER (unmatched left rows dropped); ASOF LEFT JOIN keeps them.
    Alias-qualified references elsewhere in the query are flattened
    to the joined view's column names (right-side collisions carry
    the ``_r`` suffix, the operator's convention).
    """
    m = _ASOF_RE.search(sql)
    if not m:
        return sql
    lt, la, left_kw, rt, ra, on = m.groups()
    la, ra = la or lt, ra or rt
    if lt not in tables or rt not in tables:
        raise ValueError(
            f"ASOF JOIN: unknown table(s) {lt!r}/{rt!r} — register "
            "both as named inputs")
    left_df, right_df = tables[lt], tables[rt]

    def _side(tok: str):
        tok = tok.strip()
        mm = re.match(r"(\w+)\.(\w+)$", tok)
        if not mm or mm.group(1) not in (la, ra):
            raise ValueError(
                f"ASOF JOIN ON term {tok!r}: need alias.column with "
                f"alias in ({la!r}, {ra!r})")
        return ("L" if mm.group(1) == la else "R"), mm.group(2)

    eq_pairs, ineq = [], None
    for cond in re.split(r"\s+AND\s+", on.strip(),
                         flags=re.IGNORECASE):
        im = re.match(r"^\s*([\w.]+)\s*(>=|<=|>|<|=)\s*([\w.]+)\s*$",
                      cond)
        if not im:
            raise ValueError(f"ASOF JOIN: unsupported ON term {cond!r}")
        a, op, b = im.groups()
        (sa, ca), (sb, cb) = _side(a), _side(b)
        if sa == sb:
            raise ValueError(
                f"ASOF JOIN ON term {cond!r} references one side only")
        if op == "=":
            eq_pairs.append((ca, cb) if sa == "L" else (cb, ca))
            continue
        if ineq is not None:
            raise ValueError("ASOF JOIN: exactly one inequality "
                             "condition is required")
        if op in (">", "<"):
            raise ValueError(
                "ASOF JOIN: strict inequality is not supported (the "
                "operator matches ties inclusively) — use >= / <=")
        # normalize to left-side-first
        if sa == "R":
            a_c, b_c = cb, ca
            op = ">=" if op == "<=" else "<="
        else:
            a_c, b_c = ca, cb
        ineq = (a_c, b_c, "backward" if op == ">=" else "forward")
    if ineq is None:
        raise ValueError("ASOF JOIN: missing the inequality condition")
    lts, rts, direction = ineq

    from pyspark.sql import functions as F

    from beam_spark.operators.join import AsOfJoin

    # align right key names onto the left's (the operator joins on
    # shared key columns); track the right ts through the rename
    r_aligned, rts_aligned = right_df, rts
    for lk, rk in eq_pairs:
        if rk != lk:
            r_aligned = r_aligned.withColumnRenamed(rk, lk)
            if rts == rk:
                rts_aligned = lk
    joined = (PCollection(left_df) | AsOfJoin(
        r_aligned, on=[lk for lk, _ in eq_pairs], left_ts=lts,
        right_ts=rts_aligned, direction=direction)).df
    # resolve output names: right payload collides -> suffix "_r"
    keys = [lk for lk, _ in eq_pairs]
    lcols = set(left_df.columns)
    rmap = {c: (c if c in keys
                else c + "_r" if c in lcols else c)
            for c in r_aligned.columns}
    if not left_kw:
        # INNER: drop left rows with no match (right ts NULL)
        joined = joined.where(F.col(rmap[rts_aligned]).isNotNull())
    view = "__asof_result"
    joined.createOrReplaceTempView(view)
    # flatten alias-qualified references in the rest of the query
    rest = sql[:m.start()] + f"FROM {view}" + sql[m.end():]

    def flatten(mm):
        alias, col = mm.group(1), mm.group(2)
        if alias == la:
            return col
        orig_renamed = col
        for lk, rk in eq_pairs:
            if col == rk:
                orig_renamed = lk
        return rmap.get(orig_renamed, orig_renamed)

    rest = re.sub(rf"\b({la}|{ra})\.(\w+)", flatten, rest)
    return rest


class SqlTransform(PTransform):
    """Run SQL over named PCollections (SqlTransform.java:112).

    ``{'orders': pcoll, ...} | SqlTransform("SELECT ... FROM orders")``
    or ``pcoll | SqlTransform(sql, table_name='PCOLLECTION')`` (Beam's
    default input name).
    """

    def __init__(self, sql: str, table_name: str = "PCOLLECTION", label=None):
        super().__init__(label)
        self.sql, self.table_name = sql, table_name

    # Temp views are session-GLOBAL catalog state registered under
    # fixed names (the SQL references them; MATCH_RECOGNIZE adds
    # __mr_<table>), so two SqlTransform constructions on concurrent
    # driver threads can replace each other's views between
    # registration and analysis and silently read the wrong frame.
    # spark.sql() resolves views EAGERLY at analysis, so a plan-time
    # lock around register+analyze removes the race without touching
    # execution (zero contention outside plan construction).
    _CATALOG_LOCK = __import__("threading").Lock()

    def _run(self, spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
        with SqlTransform._CATALOG_LOCK:
            for name, df in tables.items():
                df.createOrReplaceTempView(name)
            sql = _rewrite_tvf(self.sql)
            sql = _rewrite_qualify(sql)
            if "ASOF" in sql.upper():
                sql = _rewrite_asof_join(sql, spark, tables)
            if "MATCH_RECOGNIZE" in sql.upper():
                from beam_spark.sql_match import try_rewrite_match_recognize

                sql = try_rewrite_match_recognize(sql, spark, tables)
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


# --------------------------------------------------------------------------
# DDL surface (SURVEY.md §2.10)
# --------------------------------------------------------------------------
_DDL_RE = re.compile(
    r"^\s*CREATE\s+EXTERNAL\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>\w+)\s*\((?P<cols>.*?)\)\s*"
    r"TYPE\s+'?(?P<type>\w+)'?\s*"
    r"(?:LOCATION\s+'(?P<location>[^']+)')?"
    r"(?:\s*TBLPROPERTIES\s+'(?P<props>[^']*)')?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

#: Beam SQL DDL type name -> Spark reader format
_DDL_FORMATS = {"parquet": "parquet", "text": "text", "csv": "csv",
                "json": "json", "orc": "orc", "avro": "avro"}


def execute_ddl(spark: SparkSession, ddl: str) -> None:
    """Beam SQL ``CREATE EXTERNAL TABLE`` (reference
    sdks/java/extensions/sql/impl/parser/SqlCreateExternalTable.java +
    Parser.jj grammar): parse the statement and register the external
    source as a temp view, schema-checked against the declared columns.

    Supported: TYPE parquet|csv|json|orc|text|avro with LOCATION; the
    vendor table providers (bigtable/pubsub/kafka...) need their
    connectors — same jar boundary as sources/io.py. TBLPROPERTIES is
    accepted and passed to the reader as JSON options.
    """
    import json as _json

    m = _DDL_RE.match(ddl)
    if not m:
        raise ValueError(f"unsupported DDL (CREATE EXTERNAL TABLE only): {ddl[:120]}")
    name, cols = m.group("name"), m.group("cols").strip()
    fmt = m.group("type").lower()
    if fmt not in _DDL_FORMATS:
        raise ValueError(
            f"TYPE '{fmt}' needs a connector jar (supported here: "
            f"{sorted(_DDL_FORMATS)})")
    location = m.group("location")
    if not location:
        raise ValueError("LOCATION is required for file-backed types")
    options = _json.loads(m.group("props")) if m.group("props") else {}
    # Beam DDL column syntax is SQL-standard enough for Spark's DDL parser
    schema = cols.replace("VARCHAR", "STRING")
    reader = spark.read.format(_DDL_FORMATS[fmt]).schema(schema)
    if options:
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    if fmt == "csv":
        reader = reader.option("header", True)
    reader.load(location).createOrReplaceTempView(name)
