"""Composite trigger algebra (SURVEY.md §2.7).

Beam reference: transforms/trigger.py — Trigger interface (:276),
AfterCount (:768), Repeatedly (:829), AfterAny (:882), AfterAll (:890),
AfterEach (:898), OrFinally (:991), AfterProcessingTime (:624); runtime
semantics runners/portability/fn_api_runner/trigger_manager.py:123
(GeneralTriggerManagerDoFn). Semantics rebuilt from the documented
contracts, not ported.

The algebra is PURE PYTHON and picklable: per-window trigger state is a
plain dict, driven by three hooks — ``on_element`` (an element arrived),
``should_fire`` (would a pane fire now?), ``on_fire`` (a pane fired;
returns whether the trigger is FINISHED for this window). The streaming
operator (``triggers.AfterWatermarkEarlyCount``) embeds it inside
``applyInPandasWithState`` for the EARLY-pane phase; the ON_TIME pane at
the watermark and LATE panes under allowed lateness are managed by the
window lifecycle itself, exactly like Beam's AfterWatermark wrapper.

``ctx`` passed to the hooks: ``{"now_ms": processing time,
"wm_ms": watermark, "window_end_ms": end of this window}``.

Documented divergence: processing-time conditions are evaluated at
micro-batch boundaries (Spark allows one timeout kind per stateful
operator and the emulator uses the event-time timeout for ON_TIME
panes), which satisfies AfterProcessingTime's "at least delay has
passed" contract but may fire later than a dedicated timer would.
"""

from __future__ import annotations


class Trigger:
    """Per-window trigger state machine (trigger.py:276)."""

    def new_state(self) -> dict:
        return {}

    def on_element(self, s: dict, ctx: dict) -> None:
        pass

    def should_fire(self, s: dict, ctx: dict) -> bool:
        raise NotImplementedError

    def on_fire(self, s: dict, ctx: dict) -> bool:
        """Advance after a firing; True = FINISHED (no more firings)."""
        raise NotImplementedError


class AfterCount(Trigger):
    """Fire once the window has buffered >= n elements (trigger.py:768).
    Finishes after one firing — wrap in Repeatedly for every-n panes."""

    def __init__(self, n: int):
        assert n >= 1
        self.n = n

    def new_state(self):
        return {"seen": 0}

    def on_element(self, s, ctx):
        s["seen"] += 1

    def should_fire(self, s, ctx):
        return s["seen"] >= self.n

    def on_fire(self, s, ctx):
        s["seen"] = 0
        return True


class AfterProcessingTime(Trigger):
    """Fire once >= delay has elapsed (processing time) since the first
    element of the pane (trigger.py:624)."""

    def __init__(self, delay_sec: float):
        self.delay_ms = int(delay_sec * 1000)

    def new_state(self):
        return {"first_ms": None}

    def on_element(self, s, ctx):
        if s["first_ms"] is None:
            s["first_ms"] = ctx["now_ms"]

    def should_fire(self, s, ctx):
        return (s["first_ms"] is not None
                and ctx["now_ms"] >= s["first_ms"] + self.delay_ms)

    def on_fire(self, s, ctx):
        s["first_ms"] = None
        return True


class Repeatedly(Trigger):
    """Run the subtrigger forever: each time it finishes, restart it
    (trigger.py:829)."""

    def __init__(self, sub: Trigger):
        self.sub = sub

    def new_state(self):
        return {"sub": self.sub.new_state()}

    def on_element(self, s, ctx):
        self.sub.on_element(s["sub"], ctx)

    def should_fire(self, s, ctx):
        return self.sub.should_fire(s["sub"], ctx)

    def on_fire(self, s, ctx):
        if self.sub.on_fire(s["sub"], ctx):
            s["sub"] = self.sub.new_state()
        return False


class AfterAny(Trigger):
    """Fire when ANY subtrigger would fire; finished when any finishes
    (trigger.py:882)."""

    def __init__(self, *subs: Trigger):
        self.subs = subs

    def new_state(self):
        return {"subs": [t.new_state() for t in self.subs],
                "done": [False] * len(self.subs)}

    def on_element(self, s, ctx):
        for t, st, d in zip(self.subs, s["subs"], s["done"]):
            if not d:
                t.on_element(st, ctx)

    def should_fire(self, s, ctx):
        return any(not d and t.should_fire(st, ctx)
                   for t, st, d in zip(self.subs, s["subs"], s["done"]))

    def on_fire(self, s, ctx):
        for i, (t, st) in enumerate(zip(self.subs, s["subs"])):
            if not s["done"][i] and t.should_fire(st, ctx):
                s["done"][i] = t.on_fire(st, ctx)
        return any(s["done"])


class AfterAll(Trigger):
    """Fire when ALL subtriggers would fire; finished when all finish
    (trigger.py:890)."""

    def __init__(self, *subs: Trigger):
        self.subs = subs

    def new_state(self):
        return {"subs": [t.new_state() for t in self.subs],
                "done": [False] * len(self.subs)}

    def on_element(self, s, ctx):
        for t, st, d in zip(self.subs, s["subs"], s["done"]):
            if not d:
                t.on_element(st, ctx)

    def should_fire(self, s, ctx):
        return all(d or t.should_fire(st, ctx)
                   for t, st, d in zip(self.subs, s["subs"], s["done"]))

    def on_fire(self, s, ctx):
        for i, (t, st) in enumerate(zip(self.subs, s["subs"])):
            if not s["done"][i]:
                s["done"][i] = t.on_fire(st, ctx)
        return all(s["done"])


class AfterEach(Trigger):
    """Run subtriggers in sequence: each firing of the current one
    advances to the next when it finishes (trigger.py:898)."""

    def __init__(self, *subs: Trigger):
        self.subs = subs

    def new_state(self):
        return {"i": 0, "sub": self.subs[0].new_state()}

    def _cur(self, s):
        return self.subs[s["i"]] if s["i"] < len(self.subs) else None

    def on_element(self, s, ctx):
        t = self._cur(s)
        if t is not None:
            t.on_element(s["sub"], ctx)

    def should_fire(self, s, ctx):
        t = self._cur(s)
        return t is not None and t.should_fire(s["sub"], ctx)

    def on_fire(self, s, ctx):
        t = self._cur(s)
        if t is not None and t.on_fire(s["sub"], ctx):
            s["i"] += 1
            if s["i"] < len(self.subs):
                s["sub"] = self.subs[s["i"]].new_state()
        return s["i"] >= len(self.subs)


class OrFinally(Trigger):
    """Fire like ``main`` until ``until`` fires, which fires one final
    pane and finishes the window's triggering (trigger.py:991)."""

    def __init__(self, main: Trigger, until: Trigger):
        self.main, self.until = main, until

    def new_state(self):
        return {"main": self.main.new_state(),
                "until": self.until.new_state()}

    def on_element(self, s, ctx):
        self.main.on_element(s["main"], ctx)
        self.until.on_element(s["until"], ctx)

    def should_fire(self, s, ctx):
        return (self.until.should_fire(s["until"], ctx)
                or self.main.should_fire(s["main"], ctx))

    def on_fire(self, s, ctx):
        if self.until.should_fire(s["until"], ctx):
            self.until.on_fire(s["until"], ctx)
            return True
        return self.main.on_fire(s["main"], ctx)
