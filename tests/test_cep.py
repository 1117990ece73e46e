"""MATCH_RECOGNIZE matcher unit tests: quantifiers, backtracking,
after-match skip modes."""

from beam_spark.pcollection import Pipeline
from beam_spark.operators.core import Create
from beam_spark.operators.cep import (MatchRecognize, SKIP_TO_NEXT_ROW,
                                      _match_at, _normalize_pattern)


def rows(*types):
    return [{"k": 1, "i": i, "t": t} for i, t in enumerate(types)]


DEF = {"A": lambda r: r["t"] == "a", "B": lambda r: r["t"] == "b",
       "C": lambda r: r["t"] == "c"}


def match(rs, start, pattern, defines=DEF):
    """Adapter: evaluate row predicates into masks, run the matcher."""
    import numpy as np
    masks = {s: np.array([bool(f(r)) for r in rs], dtype=bool)
             for s, f in defines.items()}
    return _match_at(masks, len(rs), start, _normalize_pattern(pattern))


def test_matcher_plus_greedy_backtrack():
    # A+ A: greedy A+ must backtrack to leave one 'a' for the final A
    m = match(rows("a", "a", "a"), 0, [("A", "+"), ("A", "1")])
    assert [s for s, _ in m] == ["A", "A", "A"]


def test_matcher_optional_and_star():
    m = match(rows("b", "c"), 0, [("A", "?"), ("B", "*"), ("C", "1")])
    assert [(s, i) for s, i in m] == [("B", 0), ("C", 1)]
    assert match(rows("c"), 0, [("A", "?"), ("C", "1")]) is not None
    assert match(rows("b"), 0, [("A", "1")]) is None


def test_matcher_bounded_quantifiers():
    # A{2,3} B: greedy takes 3 a's, backtracks to 2 if B needs the third
    m = match(rows("a", "a", "a", "b"), 0, [("A", (2, 3)), ("B", "1")])
    assert [s for s, _ in m] == ["A", "A", "A", "B"]
    m = match(rows("a", "a", "b"), 0, [("A", (2, 3)), ("B", "1")])
    assert [s for s, _ in m] == ["A", "A", "B"]
    assert match(rows("a", "b"), 0, [("A", (2, 3)), ("B", "1")]) is None
    # exact count {2}
    m = match(rows("a", "a", "a"), 0, [("A", (2, 2)), ("A", "1")])
    assert [s for s, _ in m] == ["A", "A", "A"]
    # {n,} unbounded upper
    m = match(rows("a", "a", "a", "b"), 0, [("A", (1, None)), ("B", "1")])
    assert [s for s, _ in m] == ["A", "A", "A", "B"]


def test_matcher_alternation():
    # (A|B)+ C — leftmost alternative labels each row
    m = match(rows("a", "b", "a", "c"), 0, [(("A", "B"), "+"), ("C", "1")])
    assert [(s, i) for s, i in m] == [("A", 0), ("B", 1), ("A", 2), ("C", 3)]
    # single-position alternation
    m = match(rows("b"), 0, [(("A", "B"), "1")])
    assert [(s, i) for s, i in m] == [("B", 0)]
    assert match(rows("c"), 0, [(("A", "B"), "1")]) is None


def test_match_recognize_skip_modes(spark):
    data = rows("a", "a", "b")  # A+ B with overlap potential
    base = dict(
        partition_by="k", order_by="i",
        pattern=[("A", "+"), ("B", "1")], defines=DEF,
        measures={"n_a": lambda m: sum(1 for s, _ in m if s == "A"),
                  "end_i": lambda m: m[-1][1]["i"]},
        output_schema="k long, n_a long, end_i long")
    past = (Pipeline(spark) | Create(data)
            | MatchRecognize(**base)).collect()
    assert [(r["n_a"], r["end_i"]) for r in past] == [(2, 2)]
    nxt = (Pipeline(spark) | Create(data)
           | MatchRecognize(**base, after_match=SKIP_TO_NEXT_ROW)).collect()
    # overlapping matches allowed: starting at row0 (2 a's) and row1 (1 a)
    assert sorted((r["n_a"], r["end_i"]) for r in nxt) == [(1, 2), (2, 2)]


def test_match_recognize_per_key_isolation(spark):
    data = [{"k": 1, "i": 0, "t": "a"}, {"k": 2, "i": 1, "t": "b"}]
    out = (Pipeline(spark) | Create(data)
           | MatchRecognize(partition_by="k", order_by="i",
                            pattern=[("A", "1"), ("B", "1")], defines=DEF,
                            measures={"n": lambda m: len(m)},
                            output_schema="k long, n long")).collect()
    assert out == []  # a and b in different keys: no cross-key match
