"""Property-based tests (reference analog: coders_property_based_test.py —
Hypothesis-driven semantic checks against sequential Python models).

Each property drives the Spark operator with small random inputs and
compares against a straightforward Python reference implementation.
max_examples is kept low: each example is a Spark job.
"""

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from beam_spark.pcollection import Pipeline
from beam_spark.operators.core import Create, Distinct
from beam_spark.operators.group import CombinePerKey
from beam_spark.operators.sort import TopKPerKey
from beam_spark.operators.window import FixedWindows, Sessions, WindowInto

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

rows_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-100, 100)),
    min_size=1, max_size=30)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_combine_per_key_matches_python(spark, rows):
    pc = (Pipeline(spark)
          | Create([{"k": k, "v": v} for k, v in rows])
          | CombinePerKey("k", s="sum(v)", n="count(*)", mx="max(v)"))
    got = {r["k"]: (r["s"], r["n"], r["mx"]) for r in pc.collect()}
    ref = defaultdict(list)
    for k, v in rows:
        ref[k].append(v)
    exp = {k: (sum(vs), len(vs), max(vs)) for k, vs in ref.items()}
    assert got == exp


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_distinct_matches_python(spark, rows):
    pc = (Pipeline(spark)
          | Create([{"k": k, "v": v} for k, v in rows]) | Distinct())
    got = sorted((r["k"], r["v"]) for r in pc.collect())
    assert got == sorted(set(rows))


@given(rows=rows_strategy, k=st.integers(1, 4))
@settings(**SETTINGS)
def test_topk_per_key_matches_python(spark, rows, k):
    pc = (Pipeline(spark)
          | Create([{"k": kk, "v": v, "i": i} for i, (kk, v) in enumerate(rows)])
          | TopKPerKey("k", k, "v desc", "i"))
    got = defaultdict(list)
    for r in pc.collect():
        got[r["k"]].append((r["v"], r["i"]))
    ref = defaultdict(list)
    for i, (kk, v) in enumerate(rows):
        ref[kk].append((v, i))
    for kk, vs in ref.items():
        exp = sorted(vs, key=lambda t: (-t[0], t[1]))[:k]
        assert sorted(got[kk]) == sorted(exp), (kk, got[kk], exp)


@given(ts=st.lists(st.integers(0, 600), min_size=1, max_size=25),
       size=st.sampled_from([30, 60, 120]))
@settings(**SETTINGS)
def test_fixed_window_assignment_matches_python(spark, ts, size):
    from pyspark.sql import functions as F

    pc = Pipeline(spark) | Create(
        [{"t": f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}", "v": 1} for t in ts])
    pc = pc.with_df(pc.df.withColumn("t", F.col("t").cast("timestamp")), ts_col="t")
    out = pc | WindowInto(FixedWindows(size)) | CombinePerKey(n="count(*)")
    got = {(r["__window"]["start"].minute * 60 + r["__window"]["start"].second
            if False else r["__window"]["start"].isoformat(), r["n"])
           for r in out.collect()}
    ref = Counter((t // size) * size for t in ts)
    exp = set()
    for start_s, n in ref.items():
        exp.add((f"2024-01-01T00:{start_s // 60:02d}:{start_s % 60:02d}", n))
    assert got == exp


@given(ts=st.lists(st.integers(0, 3000), min_size=1, max_size=20, unique=True),
       gap=st.sampled_from([60, 300]))
@settings(**SETTINGS)
def test_session_windows_match_python_model(spark, ts, gap):
    """Session merge semantics vs a sequential gaps-and-islands model."""
    from pyspark.sql import functions as F

    pc = Pipeline(spark) | Create([{"k": "u", "t": t} for t in ts],
                                  schema="k string, t long")
    pc = pc.with_df(pc.df.withColumn("ts", F.timestamp_seconds("t")), ts_col="ts")
    out = pc | WindowInto(Sessions(gap)) | CombinePerKey("k", n="count(*)")
    got = sorted((r["__window"]["start"].isoformat(), r["n"]) for r in out.collect())

    sessions = []
    for t in sorted(ts):
        if sessions and t - sessions[-1][-1] < gap:
            sessions[-1].append(t)
        else:
            sessions.append([t])
    import datetime

    exp = sorted((datetime.datetime(2024, 1, 1).replace(
        year=1970, month=1, day=1) + datetime.timedelta(seconds=s[0]), len(s))
        for s in sessions)
    exp = sorted((d.isoformat(), n) for d, n in exp)
    assert got == exp


@given(data=st.lists(st.binary(min_size=0, max_size=200), min_size=0,
                     max_size=20))
@settings(**SETTINGS)
def test_tfrecord_roundtrip_arbitrary_bytes(tmp_path_factory, data):
    """TFRecord framing round-trips any byte payloads (incl. empty
    records) with valid crcs — pure python, no Spark job per example."""
    import os
    from beam_spark.sources.tfrecord import parse_records, write_records

    p = os.path.join(str(tmp_path_factory.mktemp("tfr")), "f.tfrecord")
    write_records(p, data)
    with open(p, "rb") as f:
        assert list(parse_records(f.read())) == data


@given(bounds=st.lists(st.floats(-100, 100, allow_nan=False),
                       min_size=2, max_size=6, unique=True),
       xs=st.lists(st.floats(-150, 150, allow_nan=False), min_size=1,
                   max_size=15))
@settings(**SETTINGS)
def test_apply_buckets_interpolation_monotone_bounded(spark, bounds, xs):
    """Interpolated bucket mapping is monotone non-decreasing in x and
    bounded in [0, 1] for any boundary set."""
    from beam_spark.ml.transforms import ApplyBucketsWithInterpolation

    pc = Pipeline(spark) | Create([{"x": float(v)} for v in xs],
                                  schema="x double")
    got = {r["x"]: r["x_interp"]
           for r in (pc | ApplyBucketsWithInterpolation("x", bounds)).df.collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    ordered = [got[x] for x in sorted(got)]
    assert all(a <= b + 1e-12 for a, b in zip(ordered, ordered[1:]))


@given(vals=st.lists(st.integers(0, 5), min_size=0, max_size=12))
@settings(**SETTINGS)
def test_deduplicate_tensor_keeps_first_occurrence_order(spark, vals):
    from beam_spark.ml.transforms import DeduplicateTensorPerRow

    pc = Pipeline(spark) | Create([{"id": 1, "v": vals}],
                                  schema="id long, v array<long>")
    got = (pc | DeduplicateTensorPerRow("v")).df.collect()[0]["v"]
    seen, ref = set(), []
    for v in vals:
        if v not in seen:
            seen.add(v)
            ref.append(v)
    assert got == ref


@given(rows=st.lists(st.tuples(st.sampled_from(["u1", "u2"]),
                               st.sampled_from(["d1", "d2"]),
                               st.integers(0, 400)),
                     min_size=1, max_size=24),
       gap=st.sampled_from([30, 60]))
@settings(**SETTINGS)
def test_session_windows_multi_key_match_python_model(spark, rows, gap):
    """sessionize with a COMPOSITE key: sessions merge independently per
    (user, device) against the sequential strict-< model."""
    from pyspark.sql import functions as F
    from beam_spark.operators.window import Sessions, WindowInto
    from beam_spark.operators.group import CombinePerKey

    pc = Pipeline(spark) | Create(
        [{"u": u, "d": d, "t": t} for u, d, t in rows],
        schema="u string, d string, t long")
    pc = pc.with_df(pc.df.withColumn("ts", F.timestamp_seconds("t")), ts_col="ts")
    out = pc | WindowInto(Sessions(gap)) | CombinePerKey("u", "d", n="count(*)")
    got = sorted((r["u"], r["d"], r["__window"]["start"].isoformat(), r["n"])
                 for r in out.collect())

    ref = defaultdict(list)
    for u, d, t in sorted(rows, key=lambda x: (x[0], x[1], x[2])):
        key = (u, d)
        if ref[key] and t - ref[key][-1][-1] < gap:
            ref[key][-1].append(t)
        else:
            ref[key].append([t])
    import datetime
    exp = sorted(
        (u, d, (datetime.datetime(1970, 1, 1)
                + datetime.timedelta(seconds=s[0])).isoformat(), len(s))
        for (u, d), sessions in ref.items() for s in sessions)
    assert got == exp


# --------------------------------------------------------------------------
# Avro codec properties: encode/decode round-trip over arbitrary records
# (no Spark involvement — the pure codec must be total on its domain)
# --------------------------------------------------------------------------

_avro_schema = {
    "type": "record", "name": "prop", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ]}

_avro_rows = st.lists(st.fixed_dictionaries({
    "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "s": st.one_of(st.none(), st.text(max_size=40)),
    "d": st.one_of(st.none(),
                   st.floats(allow_nan=False, allow_infinity=False)),
    "b": st.booleans(),
    "raw": st.binary(max_size=32),
    "arr": st.lists(st.integers(-(2**31), 2**31 - 1), max_size=8),
    "m": st.dictionaries(st.text(min_size=1, max_size=8),
                         st.text(max_size=10), max_size=4),
}), max_size=25)


@given(rows=_avro_rows, codec=st.sampled_from(["null", "deflate"]))
@settings(max_examples=40, deadline=None)
def test_avro_container_roundtrip_property(tmp_path_factory, rows, codec):
    import json

    from beam_spark.sources import avro as A

    p = str(tmp_path_factory.mktemp("avro") / "prop.avro")
    A.write_container(p, json.dumps(_avro_schema), rows, codec=codec,
                      block_records=7)  # force multi-block containers
    _, out = A.read_container(open(p, "rb").read())
    assert out == rows


@given(n=st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_avro_zigzag_long_roundtrip(n):
    import io

    from beam_spark.sources import avro as A

    b = io.BytesIO()
    A.write_long(b, n)
    got, pos = A.read_long(memoryview(b.getvalue()), 0)
    assert got == n and pos == len(b.getvalue())


@given(docs=st.lists(
    st.lists(st.sampled_from(["w1", "w2", "w3", "w4"]),
             min_size=0, max_size=14),
    min_size=1, max_size=8),
    k=st.integers(2, 4))
@settings(**SETTINGS)
def test_exact_substr_spans_matches_python(spark, docs, k):
    """ExactSubstrSpans vs a sequential model: same duplicated-window
    marking and interval-union coverage for arbitrary tiny corpora."""
    from beam_spark.operators.dedupe import ExactSubstrSpans

    rows = [{"doc_id": i, "text": " ".join(toks)}
            for i, toks in enumerate(docs)]
    got = {r["doc_id"]: (r["dup_windows"], r["dup_token_cov"])
           for r in (Pipeline(spark) | Create(rows)
                     | ExactSubstrSpans(k=k, hash_grams=False)).df.collect()}

    grams = Counter()
    per_doc = {}
    for i, toks in enumerate(docs):
        pos_grams = [(p, " ".join(toks[p:p + k]))
                     for p in range(len(toks) - k + 1)]
        per_doc[i] = pos_grams
        grams.update(g for _, g in pos_grams)
    exp = {}
    for i, toks in enumerate(docs):
        marked = sorted(p for p, g in per_doc[i] if grams[g] >= 2)
        cov, j = 0, 0
        while j < len(marked):
            start = marked[j]
            end = marked[j]
            while j + 1 < len(marked) and marked[j + 1] - marked[j] <= k:
                j += 1
                end = marked[j]
            cov += end + k - start
            j += 1
        exp[i] = (len(marked), cov)
    assert got == exp


@given(ranks=st.lists(
    st.tuples(st.integers(1, 3), st.integers(10, 15), st.integers(1, 5)),
    min_size=2, max_size=20))
@settings(**SETTINGS)
def test_rrf_matches_python(spark, ranks):
    """RrfFuse vs sequential RRF over two arbitrary rankings."""
    from beam_spark.operators.retrieval import RrfFuse
    from beam_spark.pcollection import PCollection

    half = len(ranks) // 2
    r1, r2 = ranks[:half] or ranks[:1], ranks[half:] or ranks[-1:]
    df1 = spark.createDataFrame(r1, "query_id long, doc_id long, rank int")
    df2 = spark.createDataFrame(r2, "query_id long, doc_id long, rank int")
    out = (PCollection(df1) | RrfFuse(df1, df2, k=100)).df.collect()

    scores = defaultdict(float)
    for q, d, r in r1 + r2:
        scores[(q, d)] += 1.0 / (60 + r)
    for row in out:
        assert math.isclose(row["rrf_score"],
                            round(scores[(row["query_id"], row["doc_id"])], 9),
                            rel_tol=1e-9)
    assert len(out) == len(scores)


@given(ids=st.lists(st.integers(0, 10_000_000), min_size=1, max_size=40,
                    unique=True),
       fracs=st.tuples(st.floats(0.1, 0.8), st.floats(0.1, 0.2)))
@settings(**SETTINGS)
def test_split_by_hash_matches_python_md5_model(spark, ids, fracs):
    """SplitByHash vs the md5-bucket model: every row's label is the
    pure function of its id the operator documents."""
    import hashlib

    from beam_spark.operators.combiners import SplitByHash
    from beam_spark.pcollection import PCollection

    f1, f2 = fracs
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = (PCollection(df)
           | SplitByHash({"a": f1, "b": f2}, "doc_id")).df
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    b1 = round(f1 * 10000)
    b2 = b1 + round(f2 * 10000)
    for i in ids:
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10000
        exp = "a" if bucket < b1 else "b" if bucket < b2 else None
        assert got[i] == exp, (i, bucket, got[i], exp)


@given(docs=st.lists(
    st.lists(st.sampled_from(["the", "fox", "ab", "x9", "##", "..."]),
             min_size=0, max_size=25),
    min_size=1, max_size=6))
@settings(**SETTINGS)
def test_gopher_filter_matches_python_model(spark, docs):
    """GopherQualityFilter's counting columns vs a sequential model on
    arbitrary token mixes (incl. empty docs)."""
    from beam_spark.operators.text import GOPHER_STOPWORDS, GopherQualityFilter
    from beam_spark.pcollection import Pipeline
    from beam_spark.operators.core import Create

    rows = [{"doc_id": i, "text": " ".join(toks)}
            for i, toks in enumerate(docs)]
    out = (Pipeline(spark) | Create(rows) | GopherQualityFilter()).df
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    for i, toks in enumerate(docs):
        words = [w for w in " ".join(toks).split() if w]
        assert got[i]["n_words"] == len(words)
        if words:
            assert got[i]["mean_word_len"] == round(
                sum(len(w) for w in words) / len(words), 6)
            n_alpha = sum(1 for w in words if any(c.isalpha() for c in w))
            assert got[i]["alpha_word_frac"] == round(
                n_alpha / len(words), 6)
        hits = len({w.lower() for w in words} & set(GOPHER_STOPWORDS))
        assert got[i]["stopword_hits"] == hits


@given(texts=st.lists(st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2060),
    max_size=40), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_normalize_text_matches_python_model(spark, texts):
    """NormalizeText vs a python re model over arbitrary unicode
    (controls, zero-widths, punctuation, whitespace runs)."""
    import re as _re

    from beam_spark.operators.text import NormalizeText
    from beam_spark.pcollection import Pipeline
    from beam_spark.operators.core import Create

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    out = (Pipeline(spark) | Create(rows)
           | NormalizeText(strip_punct=True)).df
    got = {r["doc_id"]: r["norm_text"] for r in out.collect()}
    for i, t in enumerate(texts):
        x = t.lower()
        x = _re.sub("[\x00-\x08\x0e-\x1f\x7f​‌‍﻿]",
                    "", x)
        x = _re.sub(r"[!-/:-@\[-`{-~]", " ", x)
        # Java regex / RE2 \s is ASCII-only (NBSP etc. are NOT
        # whitespace there, unlike python's unicode \s)
        x = _re.sub(r"[ \t\n\x0b\f\r]+", " ", x).strip(" ")
        assert got[i] == x, (repr(t), repr(got[i]), repr(x))


@given(n=st.integers(5, 60), k=st.integers(2, 7))
@settings(**SETTINGS)
def test_curriculum_bucket_sizes_balanced(spark, n, k):
    """ntile property: bucket sizes differ by at most one and tiers are
    ordered by score."""
    from beam_spark.operators.quality import CurriculumBuckets
    from beam_spark.pcollection import PCollection

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(n)], "id long, s double")
    out = (PCollection(df)
           | CurriculumBuckets("s", id_col="id", n_buckets=k)).df
    rows = out.collect()
    from collections import Counter
    sizes = Counter(r["bucket"] for r in rows)
    assert max(sizes.values()) - min(sizes.values()) <= 1
    worst_of = {b: min(r["s"] for r in rows if r["bucket"] == b)
                for b in sizes}
    best_of = {b: max(r["s"] for r in rows if r["bucket"] == b)
               for b in sizes}
    # tiers are score-ordered across the buckets that EXIST — with
    # fewer rows than buckets the boundaries-then-assign plan
    # legitimately leaves middle tiers empty (documented divergence),
    # so iterate adjacent present labels, not 1..max
    present = sorted(sizes)
    for a, b in zip(present, present[1:]):
        assert worst_of[a] >= best_of[b]
    if n >= k:
        assert set(sizes) == set(range(1, k + 1))  # all tiers filled


@given(docs=st.lists(
    st.lists(st.sampled_from(["red", "blue", "green", "dog", "cat"]),
             min_size=1, max_size=10),
    min_size=2, max_size=7))
@settings(**SETTINGS)
def test_bm25_matches_python_model(spark, docs):
    """Bm25TopK vs a sequential BM25 (Lucene idf) model: every scored
    (query, doc) pair agrees to the rounded score; k1=1.5 exercises the
    gate's binary-exact constants."""
    import math

    from beam_spark.operators.retrieval import Bm25TopK
    from beam_spark.pcollection import PCollection

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    qdf = spark.createDataFrame(rows[:2], "query_id long, text string")
    out = (PCollection(df) | Bm25TopK(qdf, k=100, k1=1.5)).df
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in out.collect()}

    N = len(docs)
    avgdl = sum(len(t) for t in docs) / N
    dfreq = {}
    for toks in docs:
        for term in set(toks):
            dfreq[term] = dfreq.get(term, 0) + 1
    exp = {}
    for qid, qtoks in list(enumerate(docs))[:2]:
        for did, dtoks in enumerate(docs):
            s = 0.0
            hit = False
            for term in set(qtoks):
                tf = dtoks.count(term)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(1 + (N - dfreq[term] + 0.5)
                               / (dfreq[term] + 0.5))
                s += idf * ((tf * 2.5)
                            / (tf + 1.5 * (0.25 + 0.75 * len(dtoks)
                                           / avgdl)))
            if hit:
                exp[(qid, did)] = round(s, 6)
    assert set(got) == set(exp)
    for kpair, v in exp.items():
        assert math.isclose(got[kpair], v, abs_tol=2e-6), (kpair, got[kpair], v)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_rollup_cube_vs_sequential_model(spark, rows):
    """GroupByRollup vs a sequential python model: rollup emits exactly
    the hierarchy-prefix levels, cube every subset, with per-level sums
    equal to the model's."""
    from beam_spark.operators.group import GroupByRollup
    from beam_spark.pcollection import PCollection

    df = spark.createDataFrame(
        [(k, v % 2, v) for k, v in rows], "k string, p int, v long")

    def model(levels):
        out = {}
        for k, p, v in [(k, v % 2, v) for k, v in rows]:
            for keep_k, keep_p in levels:
                key = (k if keep_k else None, p if keep_p else None,
                       (0 if keep_k else 2) + (0 if keep_p else 1))
                out[key] = out.get(key, 0) + v
        return out

    for kind, levels in [
            ("rollup", [(True, True), (True, False), (False, False)]),
            ("cube", [(True, True), (True, False), (False, True),
                      (False, False)])]:
        got = {(r["k"], r["p"], r["grouping_id"]): r["s"]
               for r in (PCollection(df) | GroupByRollup(
                   ["k", "p"], {"s": "sum(v)"}, kind=kind)).df.collect()}
        assert got == model(levels), kind


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_pivot_unpivot_roundtrip_property(spark, rows):
    """Pivot -> Unpivot(drop_nulls) recovers exactly the groupBy sums."""
    from beam_spark.operators.group import Pivot, Unpivot
    from beam_spark.pcollection import PCollection

    df = spark.createDataFrame(rows, "k string, v long")
    df2 = df.selectExpr("'g' AS g", "k", "v")
    piv = (PCollection(df2)
           | Pivot(["g"], "k", ["a", "b", "c"], "sum(v)", out_prefix="s_"))
    back = (piv | Unpivot(["g"], ["s_a", "s_b", "s_c"],
                          var_col="k", value_col="s",
                          drop_nulls=True)).df
    got = {r["k"][2:]: r["s"] for r in back.collect()}
    want = defaultdict(int)
    for k, v in rows:
        want[k] += v
    assert got == dict(want)


@given(rows=st.lists(st.tuples(st.integers(0, 500_000),
                               st.sampled_from(["x", "y"])),
                     min_size=1, max_size=25))
@settings(**SETTINGS)
def test_time_rollup_vs_sequential_model(spark, rows):
    """TimeRollup bucket assignment and counts vs a python model over
    random epoch offsets (two granularities)."""
    from beam_spark.operators.group import TimeRollup
    from beam_spark.pcollection import PCollection

    base = 1_700_000_000
    df = spark.createDataFrame(
        [(s, k) for s, k in rows], "off long, k string").selectExpr(
        f"CAST(from_unixtime(off + {base}) AS TIMESTAMP) AS t", "k")
    out = (PCollection(df) | TimeRollup(
        "t", {"h": 3600, "d": 86400}, {"n": "count(*)"}, keys=["k"])).df
    got = {(r["k"], r["granularity"], r["bucket_start"]): r["n"]
           for r in out.collect()}
    want = defaultdict(int)
    for off, k in rows:
        ts = off + base
        want[(k, "h", ts // 3600 * 3600)] += 1
        want[(k, "d", ts // 86400 * 86400)] += 1
    assert got == dict(want)


@given(docs=st.lists(st.lists(st.sampled_from("abcd"), min_size=1,
                              max_size=12), min_size=1, max_size=8),
       phrase=st.lists(st.sampled_from("abcd"), min_size=1, max_size=3))
@settings(**SETTINGS)
def test_phrase_matchers_vs_python_model(spark, docs, phrase):
    """PhraseMatch presence and PositionalPhraseMatch (both anchors)
    counts vs a sequential python model over random token sequences —
    overlapping occurrences, repeated tokens, single-token phrases."""
    from beam_spark.operators.retrieval import (PhraseMatch,
                                                PositionalPhraseMatch)
    from beam_spark.pcollection import PCollection

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    qs = spark.createDataFrame(
        [(0, " ".join(phrase))], "query_id long, phrase string")

    # python model: ALL start positions (overlapping included)
    want_counts = {}
    m = len(phrase)
    for i, toks in enumerate(docs):
        c = sum(1 for s in range(len(toks) - m + 1)
                if toks[s:s + m] == phrase)
        if c:
            want_counts[i] = c

    pos = {r["doc_id"]: r["n_occurrences"] for r in
           (PCollection(df) | PositionalPhraseMatch(qs)).df.collect()}
    rare = {r["doc_id"]: r["n_occurrences"] for r in
            (PCollection(df)
             | PositionalPhraseMatch(qs, anchor="rarest")).df.collect()}
    assert pos == want_counts
    assert rare == want_counts

    scan = {r["doc_id"] for r in
            (PCollection(df) | PhraseMatch(qs)).df.collect()}
    assert scan == set(want_counts)        # presence agrees exactly
