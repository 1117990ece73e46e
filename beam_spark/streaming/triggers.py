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
after each firing; ACCUMULATING re-emits the running total;
ACCUMULATING_AND_RETRACTING additionally precedes every non-first pane
with a RETRACT row negating the previous emission, so a downstream SUM
over all emissions equals the current total
(beam_runner_api.proto:1236-1249 AccumulationMode — Beam itself only
stubs RETRACTING; implemented here for the full lifecycle incl. LATE
panes).

Late data: Spark filters stateful-operator input behind the query
watermark, so allowed lateness is held INSIDE the operator: with
``allowed_lateness_sec = L`` the upstream ``withWatermark`` delay should
be out_of_order_bound + L, and the operator closes windows (ON_TIME
pane) as soon as semantic-watermark = spark-watermark + L passes the
window end. Rows arriving after the close but still above Spark's
watermark fire LATE panes (one per micro-batch of late arrivals —
Beam's late-firing shape); closed-window markers purge once Spark's
watermark passes the window end (nothing older can arrive).
Remaining divergence: processing-time early firings would need a second
query (Spark allows one timeout kind per operator).
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
    RETRACTING = "accumulating_and_retracting"

    def __init__(self, key_cols, window_size_sec: int, value_col: str,
                 early_count: int | None = None, ts_col: str | None = None,
                 accumulation_mode: str = "discarding",
                 allowed_lateness_sec: int = 0, early_trigger=None, label=None):
        super().__init__(label)
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.size = int(window_size_sec)
        self.value_col, self.early_count = value_col, early_count
        self.ts_col = ts_col
        if accumulation_mode not in (self.DISCARDING, self.ACCUMULATING,
                                     self.RETRACTING):
            raise ValueError(accumulation_mode)
        self.accumulation_mode = accumulation_mode
        self.allowed_lateness_sec = allowed_lateness_sec
        #: early-pane trigger: any trigger_algebra.Trigger composite
        #: (AfterAny/AfterAll/AfterEach/OrFinally/AfterProcessingTime/...).
        #: ``early_count=n`` is sugar for Repeatedly(AfterCount(n)) —
        #: Beam's AfterWatermark(early=AfterCount(n)) shape.
        from beam_spark.streaming.trigger_algebra import AfterCount, Repeatedly

        if early_trigger is not None:
            self.early_trigger = early_trigger
        elif early_count is not None:
            self.early_trigger = Repeatedly(AfterCount(early_count))
        else:
            self.early_trigger = None

    def expand(self, pcoll: PCollection) -> PCollection:
        import time as _time

        import pandas as pd
        from pyspark.sql.streaming.state import GroupStateTimeout

        keys, vcol = self.key_cols, self.value_col
        trigger = self.early_trigger
        # RETRACTING (beam_runner_api.proto AccumulationMode
        # ACCUMULATING_AND_RETRACTING) = accumulating panes, but each
        # non-first pane is preceded by a retraction row (pane_timing
        # 'RETRACT', the previously-emitted values negated) so a
        # downstream SUM over all emissions equals the current total.
        retracting = self.accumulation_mode == self.RETRACTING
        accumulating = (self.accumulation_mode == self.ACCUMULATING
                        or retracting)
        size_ms = self.size * 1000
        lateness_ms = self.allowed_lateness_sec * 1000
        ts_col = self.ts_col or pcoll.ts_col
        if ts_col is None:
            raise ValueError("needs an event-time column (ts_col)")

        key_types = ", ".join(
            f"{k} {pcoll.df.schema[k].dataType.simpleString()}" for k in keys)
        out_schema = (f"{key_types}, window_start timestamp, "
                      f"window_end timestamp, pane_index long, "
                      f"pane_timing string, pane_count long, pane_sum double")

        def fn(key, pdfs: Iterator["pd.DataFrame"], state):
            # state: (open {ws: [pane_idx, count, sum, since_fire,
            #                    trigger_state, trigger_finished]},
            #         closed {ws: [next_pane_idx, count, sum, since_fire]})
            if state.exists:
                blob = pickle.loads(bytes(state.get[0]))
                wins, closed = (blob if isinstance(blob, tuple) else (blob, {}))
            else:
                wins, closed = {}, {}
            out = []

            def emit(ws, acc, timing):
                base = {**dict(zip(keys, key)),
                        "window_start": pd.Timestamp(ws, unit="ms"),
                        "window_end": pd.Timestamp(ws + size_ms, unit="ms")}
                if retracting and acc[0] > 0:
                    # retract the previous pane's emitted values first
                    out.append({**base, "pane_index": acc[0] - 1,
                                "pane_timing": "RETRACT",
                                "pane_count": -acc[6], "pane_sum": -acc[7]})
                out.append({**base, "pane_index": acc[0],
                            "pane_timing": timing,
                            "pane_count": acc[1], "pane_sum": acc[2]})
                if retracting:
                    acc[6], acc[7] = acc[1], acc[2]  # last emitted
                acc[0] += 1
                acc[3] = 0      # since-last-firing counter
                if not accumulating:   # DISCARDING resets the pane values
                    acc[1] = 0
                    acc[2] = 0.0

            wm = state.getCurrentWatermarkMs()

            def close_pass():
                # ON_TIME when semantic watermark (spark wm + held
                # lateness) passes the window end
                for ws in sorted(list(wins)):
                    if wm + lateness_ms >= ws + size_ms:
                        acc = wins.pop(ws)
                        emit(ws, acc, "ON_TIME")
                        if lateness_ms > 0:
                            # closed acc: [next_pane, count, sum,
                            # new_since_fire, last_emitted_c, last_emitted_s].
                            # ACCUMULATING re-emits the running total on every
                            # pane (beam_runner_api.proto AccumulationMode), so
                            # seed with the window's fired totals; DISCARDING
                            # panes carry only the late arrivals.
                            closed[ws] = ([acc[0], acc[1], acc[2], 0,
                                           acc[6], acc[7]]
                                          if accumulating
                                          else [acc[0], 0, 0.0, 0, 0, 0.0])

            # windows whose close crossed between batches fire BEFORE this
            # batch's inputs (Beam ordering: watermark crossing precedes
            # later elements), so those inputs land in LATE panes
            close_pass()

            now_ms = int(_time.time() * 1000)

            def ctx_for(ws):
                return {"now_ms": now_ms, "wm_ms": wm,
                        "window_end_ms": ws + size_ms}

            if not state.hasTimedOut:
                for pdf in pdfs:
                    ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).tolist()
                    vals = pdf[vcol].tolist()
                    for t, v in zip(ts_ms, vals):
                        ws = (t // size_ms) * size_ms
                        if ws in closed:
                            # late arrival for a fired window
                            closed[ws][1] += 1
                            closed[ws][2] += float(v)
                            closed[ws][3] += 1
                            continue
                        acc = wins.setdefault(ws, [
                            0, 0, 0.0, 0,
                            trigger.new_state() if trigger else None, False,
                            0, 0.0])  # [6,7]: last-emitted c/s (RETRACTING)
                        acc[1] += 1
                        acc[2] += float(v)
                        acc[3] += 1
                        if trigger is not None and not acc[5]:
                            c = ctx_for(ws)
                            trigger.on_element(acc[4], c)
                            if trigger.should_fire(acc[4], c):
                                acc[5] = trigger.on_fire(acc[4], c)
                                emit(ws, acc, "EARLY")
                # processing-time conditions that became true without a
                # same-window element in this batch (AfterProcessingTime
                # and composites over it) — batch-boundary evaluation,
                # see trigger_algebra module docstring.
                if trigger is not None:
                    for ws in sorted(wins):
                        acc = wins[ws]
                        c = ctx_for(ws)
                        if (not acc[5] and acc[3] > 0
                                and trigger.should_fire(acc[4], c)):
                            acc[5] = trigger.on_fire(acc[4], c)
                            emit(ws, acc, "EARLY")

            # second pass: bulk arrivals whose window was already past
            # the semantic watermark when they arrived in THIS batch
            close_pass()
            # fire LATE panes for this batch's late arrivals; purge expired
            for ws in sorted(list(closed)):
                nxt, lc, lsum, fresh, last_c, last_s = closed[ws]
                if fresh > 0:
                    base = {**dict(zip(keys, key)),
                            "window_start": pd.Timestamp(ws, unit="ms"),
                            "window_end": pd.Timestamp(ws + size_ms, unit="ms")}
                    if retracting and nxt > 0:
                        out.append({**base, "pane_index": nxt - 1,
                                    "pane_timing": "RETRACT",
                                    "pane_count": -last_c,
                                    "pane_sum": -last_s})
                    out.append({**base, "pane_index": nxt,
                                "pane_timing": "LATE",
                                "pane_count": lc, "pane_sum": lsum})
                    closed[ws] = ([nxt + 1, lc, lsum, 0, lc, lsum]
                                  if accumulating
                                  else [nxt + 1, 0, 0.0, 0, 0, 0.0])
                if wm >= ws + size_ms:
                    # spark's own filter now drops anything this old
                    del closed[ws]

            if wins or closed:
                state.update((pickle.dumps((wins, closed)),))
                if wins:
                    target = min(wins) + size_ms - lateness_ms
                    state.setTimeoutTimestamp(max(target, wm + 1))
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
