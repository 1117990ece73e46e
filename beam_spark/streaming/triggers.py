"""Windowed trigger emulator: AfterWatermark with early count firings
(SURVEY.md §2.7 "build ONE generic stateful TriggerEmulator").

Beam reference: trigger.py AfterWatermark(early=AfterCount(n)) (:547,
:679), pane metadata beam_runner_api.proto:977-1000, execution model
runners/portability/fn_api_runner/trigger_manager.py:123
(GeneralTriggerManagerDoFn: per-key windows+accumulators in state,
fire on count or watermark). Semantics rebuilt, not ported.

Spark design: ``applyInPandasWithState`` with EventTimeTimeout. Per key
the state holds one accumulator per open window. Early panes fire when a
window's element count since the last firing reaches ``early_count``
(DISCARDING accumulation — Beam's default); the ON_TIME pane fires when
the watermark passes the window end (event-time timeout armed at the
earliest open window end), with Beam-style pane metadata (pane_index,
timing). ``accumulation_mode``: DISCARDING (default) resets pane values
after each firing; ACCUMULATING re-emits the running total
(beam_runner_api.proto:1236-1249).

Divergences (documented): late panes are not emitted (rows behind the
watermark are dropped by Spark upstream of the stateful operator);
processing-time early firings would need a second query (Spark allows
one timeout kind per operator).
"""

from __future__ import annotations

import pickle
from typing import Iterator

from pyspark.sql import functions as F
from pyspark.sql import types as T

from beam_spark.pcollection import PCollection, PTransform


class AfterWatermarkEarlyCount(PTransform):
    """Windowed sum/count aggregation with early panes every
    ``early_count`` elements and an ON_TIME pane at watermark.

    Input must be a watermarked streaming PCollection. Output rows:
    key cols, window_start, window_end, pane_index, pane_timing
    (EARLY|ON_TIME), pane_count, pane_sum.
    """

    DISCARDING = "discarding"
    ACCUMULATING = "accumulating"

    def __init__(self, key_cols, window_size_sec: int, value_col: str,
                 early_count: int, ts_col: str | None = None,
                 accumulation_mode: str = "discarding", label=None):
        super().__init__(label)
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.size = int(window_size_sec)
        self.value_col, self.early_count = value_col, early_count
        self.ts_col = ts_col
        if accumulation_mode not in (self.DISCARDING, self.ACCUMULATING):
            raise ValueError(accumulation_mode)
        self.accumulation_mode = accumulation_mode

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd
        from pyspark.sql.streaming.state import GroupStateTimeout

        keys, vcol, n = self.key_cols, self.value_col, self.early_count
        accumulating = self.accumulation_mode == self.ACCUMULATING
        size_ms = self.size * 1000
        ts_col = self.ts_col or pcoll.ts_col
        if ts_col is None:
            raise ValueError("needs an event-time column (ts_col)")

        key_types = ", ".join(
            f"{k} {pcoll.df.schema[k].dataType.simpleString()}" for k in keys)
        out_schema = (f"{key_types}, window_start timestamp, "
                      f"window_end timestamp, pane_index long, "
                      f"pane_timing string, pane_count long, pane_sum double")

        def fn(key, pdfs: Iterator["pd.DataFrame"], state):
            # state: {win_start_ms: [pane_index, count, sum]}
            wins: dict = (pickle.loads(bytes(state.get[0]))
                          if state.exists else {})
            out = []

            def emit(ws, acc, timing):
                out.append({**dict(zip(keys, key)),
                            "window_start": pd.Timestamp(ws, unit="ms"),
                            "window_end": pd.Timestamp(ws + size_ms, unit="ms"),
                            "pane_index": acc[0], "pane_timing": timing,
                            "pane_count": acc[1], "pane_sum": acc[2]})
                acc[0] += 1
                acc[3] = 0      # since-last-firing counter
                if not accumulating:   # DISCARDING resets the pane values
                    acc[1] = 0
                    acc[2] = 0.0

            if not state.hasTimedOut:
                for pdf in pdfs:
                    ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).tolist()
                    vals = pdf[vcol].tolist()
                    for t, v in zip(ts_ms, vals):
                        ws = (t // size_ms) * size_ms
                        # acc: [pane_index, count, sum, since_last_firing]
                        acc = wins.setdefault(ws, [0, 0, 0.0, 0])
                        acc[1] += 1
                        acc[2] += float(v)
                        acc[3] += 1
                        if acc[3] >= n:
                            emit(ws, acc, "EARLY")

            # close windows the watermark has passed
            wm = state.getCurrentWatermarkMs()
            for ws in sorted(list(wins)):
                if wm >= ws + size_ms:
                    acc = wins.pop(ws)
                    emit(ws, acc, "ON_TIME")

            if wins:
                state.update((pickle.dumps(wins),))
                state.setTimeoutTimestamp(min(wins) + size_ms)
            else:
                state.remove()
            if out:
                yield pd.DataFrame(out)

        out = (pcoll.df.groupBy(*keys)
               .applyInPandasWithState(fn, outputStructType=out_schema,
                                       stateStructType="blob binary",
                                       outputMode="append",
                                       timeoutConf=GroupStateTimeout.EventTimeTimeout))
        return pcoll.with_df(out)
