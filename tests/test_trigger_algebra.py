"""Pane-lifecycle tests for the composite trigger algebra (reference
transforms/trigger.py semantics; driven as the fn_api_runner
trigger_manager drives them — element by element with explicit clocks)."""

from beam_spark.streaming.trigger_algebra import (AfterAll, AfterAny,
                                                  AfterCount, AfterEach,
                                                  AfterProcessingTime,
                                                  OrFinally, Repeatedly)


def drive(trigger, events):
    """events: ('el',) add element | ('tick', now_ms) advance clock.
    Returns the pane trace: list of event indexes at which a pane fired,
    stopping the trigger once finished."""
    s = trigger.new_state()
    now = 0
    fired, finished = [], False
    for i, ev in enumerate(events):
        if ev[0] == "tick":
            now = ev[1]
        ctx = {"now_ms": now, "wm_ms": 0, "window_end_ms": 10**12}
        if ev[0] == "el":
            if not finished:
                trigger.on_element(s, ctx)
        if not finished and trigger.should_fire(s, ctx):
            finished = trigger.on_fire(s, ctx)
            fired.append(i)
    return fired, finished


def test_after_count_fires_once_then_finishes():
    fired, finished = drive(AfterCount(2), [("el",)] * 6)
    assert fired == [1] and finished


def test_repeatedly_after_count_fires_every_n():
    fired, finished = drive(Repeatedly(AfterCount(2)), [("el",)] * 6)
    assert fired == [1, 3, 5] and not finished


def test_after_processing_time_fires_after_delay():
    t = AfterProcessingTime(1.0)  # 1000ms
    fired, finished = drive(t, [("el",), ("tick", 500), ("tick", 1500)])
    assert fired == [2] and finished


def test_after_any_fires_on_first_subtrigger():
    t = AfterAny(AfterCount(5), AfterProcessingTime(1.0))
    fired, finished = drive(t, [("el",), ("tick", 1500)])
    assert fired == [1] and finished  # processing-time side fired first
    t2 = AfterAny(AfterCount(2), AfterProcessingTime(60.0))
    fired2, fin2 = drive(t2, [("el",), ("el",)])
    assert fired2 == [1] and fin2  # count side fired first


def test_after_all_waits_for_both():
    t = AfterAll(AfterCount(2), AfterProcessingTime(1.0))
    fired, finished = drive(
        t, [("el",), ("el",), ("tick", 500), ("tick", 1500)])
    assert fired == [3] and finished  # count ready at idx1, time at idx3


def test_after_each_runs_sequence():
    t = AfterEach(AfterCount(1), AfterCount(2))
    fired, finished = drive(t, [("el",)] * 4)
    # first pane after 1 element, then the SECOND subtrigger needs 2 more
    assert fired == [0, 2] and finished


def test_or_finally_stops_at_until():
    t = OrFinally(Repeatedly(AfterCount(2)), AfterCount(5))
    fired, finished = drive(t, [("el",)] * 8)
    # every-2 panes until the 5th element fires the final pane
    assert fired == [1, 3, 4] and finished


def test_trigger_state_is_picklable():
    import pickle

    t = OrFinally(Repeatedly(AfterAny(AfterCount(2),
                                      AfterProcessingTime(3.0))),
                  AfterCount(100))
    s = t.new_state()
    ctx = {"now_ms": 0, "wm_ms": 0, "window_end_ms": 0}
    t.on_element(s, ctx)
    s2 = pickle.loads(pickle.dumps(s))
    t.on_element(s2, ctx)
    assert t.should_fire(s2, ctx)


def test_property_repeatedly_count_pane_arithmetic():
    """Repeatedly(AfterCount(n)) over m elements fires exactly m // n
    panes, for all small (n, m)."""
    for n in range(1, 6):
        for m in range(0, 25):
            fired, finished = drive(Repeatedly(AfterCount(n)), [("el",)] * m)
            assert len(fired) == m // n, (n, m, fired)
            assert not finished


def test_property_after_each_total_capacity():
    """AfterEach(AfterCount(a), AfterCount(b)) fires at cumulative counts
    a and a+b, then is finished regardless of further elements."""
    for a in range(1, 5):
        for b in range(1, 5):
            events = [("el",)] * (a + b + 3)
            fired, finished = drive(AfterEach(AfterCount(a), AfterCount(b)),
                                    events)
            assert fired == [a - 1, a + b - 1], (a, b, fired)
            assert finished


def test_property_or_finally_never_fires_past_until():
    """After OrFinally's until-side fires, no further panes ever fire."""
    for until_n in range(2, 8):
        fired, finished = drive(
            OrFinally(Repeatedly(AfterCount(2)), AfterCount(until_n)),
            [("el",)] * 20)
        assert finished
        assert max(fired) <= until_n - 1  # final pane at the until element
