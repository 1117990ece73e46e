"""Test utilities mirroring Beam's assert_that/equal_to discipline
(reference sdks/python/apache_beam/testing/util.py:166 assert_that,
util.py:317 equal_to): unordered multiset equality over collected results,
with float normalization, matching FIXTURES.md's oracle protocol.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import DataFrame

from beam_spark.pcollection import PCollection


def _canon_value(v, float_tol_digits: int = 9):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, float_tol_digits)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x, float_tol_digits) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x, float_tol_digits)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # Row
        return tuple(sorted((k, _canon_value(x, float_tol_digits)) for k, x in v.asDict().items()))
    return v


def _canon_rows(rows: Iterable, float_tol_digits: int = 9,
                keyed: bool | None = None) -> list:
    """``keyed=True`` canonicalizes Rows/dicts as sorted (name, value)
    pairs (schema-order independent); ``keyed=False`` positionally.
    ``None`` auto-detects per row (Row/dict -> keyed). equal_to picks ONE
    mode from the expectation shape so Rows and dict expectations always
    compare in the same order (column order must not matter)."""
    out = []
    for r in rows:
        if hasattr(r, "asDict"):
            if keyed is False:
                r = tuple(_canon_value(v, float_tol_digits) for v in r)
            else:
                r = tuple(sorted((k, _canon_value(v, float_tol_digits))
                                 for k, v in r.asDict().items()))
        elif isinstance(r, dict):
            r = tuple(sorted((k, _canon_value(r[k], float_tol_digits))
                             for k in r))
        elif isinstance(r, (list, tuple)):
            r = tuple(_canon_value(v, float_tol_digits) for v in r)
        else:
            r = (_canon_value(r, float_tol_digits),)
        out.append(r)
    return sorted(out, key=repr)


def equal_to(expected: Sequence):
    """Matcher: unordered multiset equality (testing/util.py:317)."""

    def _match(actual_rows):
        exp = list(expected)
        # dict expectations -> compare by column NAME; tuple expectations
        # -> positionally (Rows flattened in schema order).
        keyed = any(isinstance(r, dict) or hasattr(r, "asDict") for r in exp)
        a = _canon_rows(actual_rows, keyed=keyed)
        e = _canon_rows(exp, keyed=keyed)
        if a != e:
            raise AssertionError(
                f"PCollection contents differ.\n  expected: {e}\n  actual:   {a}")

    return _match


def is_empty():
    def _match(actual_rows):
        rows = list(actual_rows)
        if rows:
            raise AssertionError(f"expected empty, got {rows}")
    return _match


def assert_that(pcoll: PCollection | DataFrame, matcher) -> None:
    """Collect and check. Mirrors testing/util.py:166 assert_that."""
    df = pcoll.df if isinstance(pcoll, PCollection) else pcoll
    matcher(df.collect())


def assert_frames_equal(actual: DataFrame, expected_rows: Sequence, float_tol_digits: int = 9) -> None:
    equal_to(expected_rows)(actual.collect())


def equal_to_per_window(expected_per_window: dict):
    """Windowed matcher (testing/util.py:149 equal_to_per_window):
    {window_start_iso: [rows...]} compared per __window group."""

    def _match(actual_rows):
        got: dict = {}
        for r in actual_rows:
            d = r.asDict() if hasattr(r, "asDict") else dict(r)
            w = d.pop("__window", None)
            key = w["start"].isoformat() if w else None
            got.setdefault(key, []).append(tuple(d.values()))
        exp = {k: _canon_rows(v) for k, v in expected_per_window.items()}
        act = {k: _canon_rows(v) for k, v in got.items()}
        if exp != act:
            raise AssertionError(
                f"per-window contents differ.\n  expected: {exp}\n  actual:   {act}")

    return _match
