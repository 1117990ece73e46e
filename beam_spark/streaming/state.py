"""General stateful DoFn (SURVEY.md §2.7 / §2.13).

Beam reference: userstate.py:48-209 (ValueState/BagState/CombiningState/
MapState specs + timers), DoFn state params core.py:471-491.

Spark design: ``applyInPandasWithState`` with ONE opaque pickled state
blob per key. Beam's typed state cells become attributes of a UserState
bag (value/bag/map semantics are just Python values inside the blob);
this trades Spark-native state column pruning for full spec generality —
the right trade for the parity path (hot-path stateful aggregations
should use native windowed aggs / dropDuplicates instead).

Timer divergences (documented): Spark exposes one timeout per key (event
-time or processing-time, not both, unnamed), so Beam's named timer
families collapse to a single ``set_timer`` horizon; processing-time
timeouts do not fire under availableNow test triggers (Spark semantics).

Bounded inputs run the same DoFn per key in one ``applyInPandas`` call
(whole group = one bundle, final flush after it), which matches Beam's
batch-mode expansion of stateful DoFns.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterable, Iterator

from pyspark.sql import functions as F
from pyspark.sql import types as T

from beam_spark.pcollection import PCollection, PTransform


class UserState:
    """State bag for one key: attribute-style cells + timer request."""

    def __init__(self, data: dict | None = None):
        self._data = data or {}
        self._timer_ms: int | None = None
        self._cleared = False

    # value/bag/map cells are plain entries in the dict
    def get(self, name: str, default=None):
        return self._data.get(name, default)

    def set(self, name: str, value) -> None:
        self._data[name] = value

    def add(self, name: str, value) -> None:  # BagState.add
        self._data.setdefault(name, []).append(value)

    def put(self, name: str, key, value) -> None:  # MapState.put
        self._data.setdefault(name, {})[key] = value

    def clear(self) -> None:
        self._data = {}
        self._cleared = True

    def set_timer(self, delay_ms: int) -> None:
        """Request a (processing-time) timeout for this key."""
        self._timer_ms = delay_ms


class StatefulDoFn:
    """Per-key stateful processor (the Beam stateful DoFn shape)."""

    def process(self, key: tuple, rows: Iterable[dict],
                state: UserState) -> Iterable[dict]:
        raise NotImplementedError

    def on_timer(self, key: tuple, state: UserState) -> Iterable[dict]:
        return ()

    def on_completion(self, key: tuple, state: UserState) -> Iterable[dict]:
        """Batch mode only: final flush after the whole (bounded) group."""
        return ()


class StatefulParDo(PTransform):
    """Apply a StatefulDoFn per key.

    Streaming: applyInPandasWithState (pickled blob state, optional
    processing-time timer). Bounded: applyInPandas with process +
    on_completion over the whole group.
    """

    def __init__(self, key_cols, dofn: StatefulDoFn, output_schema,
                 use_timer: bool = False,
                 requires_time_sorted_input: bool = False,
                 ts_col: str | None = None, label=None):
        super().__init__(label)
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.dofn, self.output_schema = dofn, output_schema
        self.use_timer = use_timer
        #: beam_runner_api.proto:547-550 requires_time_sorted_input — the
        #: DoFn sees each key's elements in event-time order. Bounded
        #: inputs only (Beam's own constraint: DataflowRunner rejects it
        #: on unbounded PCollections too; streaming order comes from
        #: watermark-driven timers instead).
        self.requires_time_sorted_input = requires_time_sorted_input
        self.ts_col = ts_col

    def expand(self, pcoll: PCollection) -> PCollection:
        import pandas as pd

        keys, dofn = self.key_cols, self.dofn
        schema = self.output_schema
        if isinstance(schema, str):
            schema = T._parse_datatype_string(schema)
        out_cols = [f.name for f in schema.fields]

        ts_sort = None
        if self.requires_time_sorted_input:
            if not pcoll.is_bounded:
                raise ValueError(
                    "requires_time_sorted_input is bounded-only (the "
                    "reference imposes the same streaming restriction)")
            ts_sort = self.ts_col or pcoll.ts_col
            if ts_sort is None:
                raise ValueError("requires_time_sorted_input needs ts_col")

        if pcoll.is_bounded:
            def apply(pdf: "pd.DataFrame") -> "pd.DataFrame":
                key = tuple(pdf[k].iloc[0] for k in keys)
                if ts_sort is not None:
                    # per-key event-time order inside the group — the
                    # same buffer-and-sort Beam's runner performs for
                    # requires_time_sorted_input (stable sort keeps
                    # equal-timestamp arrival order).
                    pdf = pdf.sort_values(ts_sort, kind="mergesort")
                st = UserState()
                out = list(dofn.process(key, pdf.to_dict(orient="records"), st))
                out += list(dofn.on_completion(key, st))
                return pd.DataFrame(out, columns=out_cols)

            return pcoll.with_df(
                pcoll.df.groupBy(*keys).applyInPandas(apply, schema=schema))

        from pyspark.sql.streaming.state import GroupStateTimeout

        timeout = (GroupStateTimeout.ProcessingTimeTimeout if self.use_timer
                   else GroupStateTimeout.NoTimeout)

        def fn(key, pdfs: Iterator["pd.DataFrame"], gstate):
            st = UserState(pickle.loads(bytes(gstate.get[0]))
                           if gstate.exists else {})
            out = []
            if gstate.hasTimedOut:
                out += list(dofn.on_timer(key, st))
            else:
                for pdf in pdfs:
                    out += list(dofn.process(key, pdf.to_dict(orient="records"), st))
            if st._cleared and not st._data:
                gstate.remove()
            else:
                gstate.update((pickle.dumps(st._data),))
                if st._timer_ms is not None:
                    gstate.setTimeoutDuration(st._timer_ms)
            if out:
                yield pd.DataFrame(out, columns=out_cols)

        out = (pcoll.df.groupBy(*keys)
               .applyInPandasWithState(fn, outputStructType=schema,
                                       stateStructType="blob binary",
                                       outputMode="append",
                                       timeoutConf=timeout))
        return pcoll.with_df(out)
