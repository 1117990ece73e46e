"""MATCH_RECOGNIZE SQL clause support (constrained grammar).

Beam reference: BeamMatchRel.java (Calcite parses the clause; the rel
sorts per partition and runs an NFA). Here the clause is parsed with a
small recognizer and executed by operators.cep.MatchRecognize; the
surrounding query runs as normal Spark SQL against the match result
registered as a temp view.

Supported grammar (the common CEP core):

    FROM <table> MATCH_RECOGNIZE (
      PARTITION BY c1 [, c2 ...]
      ORDER BY o1 [, o2 ...]
      MEASURES FIRST(S.col) | LAST(S.col) | COUNT(S.col) | SUM(S.col)
               AS alias [, ...]
      [AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW]
      PATTERN (SYM[+|*|?] SYM[+|*|?] ...)
      DEFINE SYM AS <cond> [AND <cond>]* [, ...]
    ) [AS alias]

where <cond> is ``SYM.col <op> literal`` (op: = <> != >= <= > <).
Symbols without a DEFINE match any row (SQL standard). Nested
subqueries/complex defines are out of scope (use the python
MatchRecognize API directly).
"""

from __future__ import annotations

import re
from typing import Callable

_MR_RE = re.compile(
    r"FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*(?:AS\s+(\w+))?",
    re.IGNORECASE | re.DOTALL)

_COND_RE = re.compile(
    r"(\w+)\.(\w+)\s*(=|<>|!=|>=|<=|>|<)\s*('(?:[^'])*'|-?[0-9.]+)")

_MEASURE_RE = re.compile(
    r"(FIRST|LAST|COUNT|SUM)\s*\(\s*(\w+)\.(\w+)\s*\)\s+AS\s+(\w+)",
    re.IGNORECASE)


def _parse_literal(lit: str):
    if lit.startswith("'"):
        return lit[1:-1]
    return float(lit) if "." in lit else int(lit)


def _compile_condition(cond_sql: str, symbol: str) -> Callable[[dict], bool]:
    """AND-chain of SYM.col op literal comparisons -> row predicate."""
    parts = re.split(r"\s+AND\s+", cond_sql.strip(), flags=re.IGNORECASE)
    tests = []
    for part in parts:
        m = _COND_RE.fullmatch(part.strip())
        if not m:
            raise ValueError(f"unsupported DEFINE condition: {part!r}")
        sym, col, op, lit = m.groups()
        if sym.upper() != symbol.upper():
            raise ValueError(f"DEFINE for {symbol} references {sym}")
        val = _parse_literal(lit)
        ops = {"=": lambda a, b: a == b, "<>": lambda a, b: a != b,
               "!=": lambda a, b: a != b, ">=": lambda a, b: a >= b,
               "<=": lambda a, b: a <= b, ">": lambda a, b: a > b,
               "<": lambda a, b: a < b}[op]
        tests.append((col, ops, val))

    def predicate(row: dict) -> bool:
        for col, fn, val in tests:
            v = row.get(col)
            if v is None or not fn(v, val):
                return False
        return True

    return predicate


def _compile_measure(agg: str, sym: str, col: str):
    agg = agg.upper()
    symu = sym.upper()

    def fn(match_rows):
        vals = [r[col] for s, r in match_rows if s.upper() == symu]
        if agg == "FIRST":
            return vals[0] if vals else None
        if agg == "LAST":
            return vals[-1] if vals else None
        if agg == "COUNT":
            return len(vals)
        if agg == "SUM":
            return sum(vals) if vals else None
        raise ValueError(agg)

    return fn


def try_rewrite_match_recognize(sql: str, spark, tables: dict) -> str:
    """If the SQL contains a MATCH_RECOGNIZE clause, execute it via the
    MatchRecognize operator and rewrite the query to select from the
    result view. Returns the (possibly rewritten) SQL."""
    m = _MR_RE.search(sql)
    if not m:
        return sql
    table_name, body, alias = m.group(1), m.group(2), m.group(3)

    def clause(name, stop):
        mm = re.search(rf"{name}\s+(.*?)\s*(?={stop})", body,
                       re.IGNORECASE | re.DOTALL)
        return mm.group(1).strip() if mm else None

    partition_by = [c.strip() for c in
                    clause("PARTITION BY", "ORDER BY").split(",")]
    order_by = [c.strip() for c in
                clause("ORDER BY", "MEASURES").split(",")]
    measures_sql = clause("MEASURES", "AFTER MATCH|PATTERN")
    pattern_sql = re.search(r"PATTERN\s*\(([^)]*)\)", body, re.IGNORECASE).group(1)
    define_sql = re.search(r"DEFINE\s+(.*)$", body,
                           re.IGNORECASE | re.DOTALL).group(1).strip()
    skip_to_next = bool(re.search(r"SKIP\s+TO\s+NEXT\s+ROW", body, re.IGNORECASE))

    pattern = []
    for tok in pattern_sql.split():
        if tok[-1] in "+*?":
            pattern.append((tok[:-1], tok[-1]))
        else:
            pattern.append((tok, "1"))

    defines: dict = {}
    for part in re.split(r",\s*(?=\w+\s+AS\s)", define_sql, flags=re.IGNORECASE):
        dm = re.match(r"(\w+)\s+AS\s+(.*)", part.strip(),
                      re.IGNORECASE | re.DOTALL)
        defines[dm.group(1)] = _compile_condition(dm.group(2), dm.group(1))
    for sym, _ in pattern:  # undefined symbols match any row
        defines.setdefault(sym, lambda r: True)

    measures, measure_types = {}, []
    df = tables[table_name] if table_name in tables else spark.table(table_name)
    col_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for agg, sym, col, out_name in _MEASURE_RE.findall(measures_sql):
        measures[out_name] = _compile_measure(agg, sym, col)
        t = ("bigint" if agg.upper() == "COUNT"
             else col_types.get(col, "string"))
        measure_types.append(f"{out_name} {t}")

    from beam_spark.operators.cep import (SKIP_PAST_LAST_ROW,
                                          SKIP_TO_NEXT_ROW, MatchRecognize)
    from beam_spark.pcollection import PCollection

    key_types = ", ".join(f"{k} {col_types[k]}" for k in partition_by)
    out_schema = f"{key_types}, {', '.join(measure_types)}"
    result = (PCollection(df)
              | MatchRecognize(
                  partition_by=partition_by, order_by=order_by,
                  pattern=pattern, defines=defines, measures=measures,
                  output_schema=out_schema,
                  after_match=SKIP_TO_NEXT_ROW if skip_to_next
                  else SKIP_PAST_LAST_ROW)).df
    view = f"__mr_{table_name}"
    result.createOrReplaceTempView(view)
    return sql[: m.start()] + f"FROM {view}" + (f" AS {alias}" if alias else "") \
        + sql[m.end():]
