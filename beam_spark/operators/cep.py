"""MATCH_RECOGNIZE — complex event processing (SURVEY.md §2.9 BeamMatchRel).

Beam reference: sdks/java/extensions/sql/impl/rel/BeamMatchRel.java (486
LoC: sort rows per partition key :378, run an NFA over them :234) and the
NFA itself impl/nfa/NFA.java (795 LoC). Semantics re-implemented (not
ported): regex-over-rows with per-symbol predicates, greedy quantifiers,
AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW, measures over the matched
span.

Spark design: ``repartition(keys).applyInPandas`` — each key's rows are
sorted by the ORDER BY column in pandas and a small backtracking matcher
runs per group (state machine is pure Python over an Arrow batch; the
group is the natural CEP unit and Beam executes it the same way). At
scale the shuffle is one partition-by-key exchange; skewed keys are the
caveat (same as Beam's per-key sort).

Pattern language (subset):
  pattern = sequence of (symbol, quantifier) with quantifier in
  {'1', '?', '+', '*'}; symbols defined by predicates over the row dict.
Measures: callables over the list of (symbol, row) pairs of one match.
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping, Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T

from beam_spark.pcollection import PCollection, PTransform
from beam_spark.types import schema_from_dict

SKIP_PAST_LAST_ROW = "past_last_row"
SKIP_TO_NEXT_ROW = "to_next_row"


def _match_at(rows: list, start: int, pattern: list, defines: Mapping) -> list | None:
    """Greedy backtracking matcher; returns list of (symbol, row_index)
    or None. Pattern items: (symbol, quantifier)."""

    def rec(pos: int, pi: int, acc: list):
        if pi == len(pattern):
            return acc
        sym, quant = pattern[pi]
        pred = defines[sym]
        if quant == "1":
            if pos < len(rows) and pred(rows[pos]):
                return rec(pos + 1, pi + 1, acc + [(sym, pos)])
            return None
        if quant == "?":
            if pos < len(rows) and pred(rows[pos]):
                r = rec(pos + 1, pi + 1, acc + [(sym, pos)])
                if r is not None:
                    return r
            return rec(pos, pi + 1, acc)
        # + / * : greedy, then backtrack
        min_n = 1 if quant == "+" else 0
        n = 0
        while pos + n < len(rows) and pred(rows[pos + n]):
            n += 1
        while n >= min_n:
            r = rec(pos + n, pi + 1,
                    acc + [(sym, pos + i) for i in range(n)])
            if r is not None:
                return r
            n -= 1
        return None

    return rec(start, 0, [])


class MatchRecognize(PTransform):
    """Row-pattern matching per key (BeamMatchRel semantics).

    Args:
      partition_by: key column(s).
      order_by: event-order column (ties: add a secondary unique column).
      pattern: [('A', '1'), ('B', '+'), ...] regex-over-rows.
      defines: {'A': lambda row: bool, ...} symbol predicates.
      measures: {'out_col': lambda match_rows: value} where match_rows is
        the list of (symbol, row_dict) pairs in match order.
      output_schema: schema of partition_by cols + measure cols.
      after_match: SKIP_PAST_LAST_ROW (default) or SKIP_TO_NEXT_ROW.
    """

    def __init__(self, partition_by, order_by,
                 pattern: Sequence[tuple], defines: Mapping[str, Callable],
                 measures: Mapping[str, Callable], output_schema,
                 after_match: str = SKIP_PAST_LAST_ROW, label=None):
        super().__init__(label)
        self.partition_by = ([partition_by] if isinstance(partition_by, str)
                             else list(partition_by))
        self.order_by = [order_by] if isinstance(order_by, str) else list(order_by)
        self.pattern = list(pattern)
        self.defines = dict(defines)
        self.measures = dict(measures)
        self.output_schema = (schema_from_dict(output_schema)
                              if isinstance(output_schema, dict) else output_schema)
        self.after_match = after_match

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        keys = self.partition_by
        order_by = self.order_by
        pattern, defines = self.pattern, self.defines
        measures, after_match = self.measures, self.after_match
        schema = self.output_schema
        if isinstance(schema, str):
            schema = T._parse_datatype_string(schema)
        out_cols = [f.name for f in schema.fields]

        def apply(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(order_by, kind="mergesort")
            rows = pdf.to_dict(orient="records")
            out = []
            i = 0
            while i < len(rows):
                m = _match_at(rows, i, pattern, defines)
                if m:
                    match_rows = [(sym, rows[idx]) for sym, idx in m]
                    rec = {k: rows[0][k] for k in keys}
                    for name, fn in measures.items():
                        rec[name] = fn(match_rows)
                    out.append(rec)
                    if after_match == SKIP_PAST_LAST_ROW:
                        i = m[-1][1] + 1
                    else:
                        i += 1
                else:
                    i += 1
            if not out:
                return pd.DataFrame(columns=out_cols)
            return pd.DataFrame(out, columns=out_cols)

        out = (pcoll.df.groupBy(*keys).applyInPandas(apply, schema=schema))
        return pcoll.with_df(out)
