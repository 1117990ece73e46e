"""Tolerance checks for approximate operators (rows-only in the oracle
gate): approx distinct vs exact, approx quantiles vs exact, sample size.
Mirrors the reference's own testing discipline for ApproximateUnique
(stats.py sampling-error asserts)."""

from beam_spark import queries as q


def test_approx_distinct_within_tolerance(spark, sf_dir, duck):
    """Verdict form: the component itself carries the tolerance check
    (ok = estimate within 5% of the exact per-key distinct), and the
    exact side is hash-verified against DuckDB by the component
    oracle; here assert every verdict holds and the exact values agree."""
    df = q.queries()["q_approx_distinct_users"](spark, sf_dir)
    rows = {r["event_type"]: r for r in df.collect()}
    exact = dict(duck.execute(
        "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1").fetchall())
    for k, e in exact.items():
        assert rows[k]["expected"] == e
        assert rows[k]["ok"], (k, e)


def test_approx_quantiles_within_tolerance(spark, sf_dir, duck):
    df = q.queries()["q_approx_quantiles_value"](spark, sf_dir)
    rows = {r["p"]: r for r in df.collect()}
    exact = duck.execute(
        "SELECT quantile_cont(value, [0.25, 0.5, 0.75]) FROM events").fetchone()[0]
    for p, e in zip((0.25, 0.5, 0.75), exact):
        assert abs(rows[p]["expected"] - e) < 1e-9
        assert rows[p]["ok"], (p, e)


def test_hll_sketch_estimate_close(spark, sf_dir, duck):
    row = q.queries()["q_hll_sketch_mergeable"](spark, sf_dir).collect()[0]
    exact = duck.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert row["expected"] == exact
    assert row["ok"]


def test_sample_exact_size_and_subset(spark, sf_dir):
    row = q.queries()["q_sample_fixed_size"](spark, sf_dir).collect()[0]
    assert row["n"] == 100
    assert row["members_ok"]


def test_tdigest_quantiles_accuracy_and_merge(spark):
    """TDigest (sketching extension parity): merged per-partition digests
    estimate quantiles of a skewed distribution within tolerance, and
    the estimate is stable across partitioning (mergeability)."""
    import numpy as np
    from beam_spark.pcollection import PCollection
    from beam_spark.operators.stats import TDigestQuantiles

    rng = np.random.default_rng(3)
    vals = rng.lognormal(0.0, 1.0, 20_000)
    exact = {q: float(np.quantile(vals, q)) for q in (0.5, 0.9, 0.99)}

    def run(n_parts):
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "v double").repartition(n_parts)
        out = (PCollection(df)
               | TDigestQuantiles("v", [0.5, 0.9, 0.99], delta=200))
        return out.df.collect()[0]

    r8 = run(8)
    for q, name in [(0.5, "q_50"), (0.9, "q_90"), (0.99, "q_99")]:
        rel = abs(r8[name] - exact[q]) / exact[q]
        assert rel < 0.05, (q, r8[name], exact[q])

    r1 = run(1)
    for name in ("q_50", "q_90", "q_99"):
        assert abs(r1[name] - r8[name]) / abs(r8[name]) < 0.05


def test_tdigest_per_key(spark):
    from beam_spark.pcollection import PCollection
    from beam_spark.operators.stats import TDigestQuantiles

    rows = [("a", float(i)) for i in range(101)] + \
           [("b", float(i * 10)) for i in range(101)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(4)
    out = (PCollection(df)
           | TDigestQuantiles("v", [0.5], keys="k", delta=100)).df
    got = {r["k"]: r["q_50"] for r in out.collect()}
    assert abs(got["a"] - 50.0) < 3.0
    assert abs(got["b"] - 500.0) < 30.0


def test_ewma_matches_pandas_and_handles_nulls(spark):
    """Ewma equals pandas ewm(alpha, adjust=False).mean() per key;
    NULLs carry the previous smoothed value; alpha validated."""
    import pandas as pd
    import pytest as _pytest

    from beam_spark.operators.stats import Ewma
    from beam_spark.pcollection import PCollection

    rows = [("a", i, float(v)) for i, v in
            enumerate([1, 5, 3, 10, 2, 8])] + \
           [("b", i, float(v)) for i, v in enumerate([4, 4, 100])]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = (PCollection(df) | Ewma("v", alpha=0.3, keys="k",
                                  order_by="i")).df
    got = {(r["k"], r["i"]): r["ewma"] for r in out.collect()}
    for key in ("a", "b"):
        pdf = pd.DataFrame([r for r in rows if r[0] == key],
                           columns=["k", "i", "v"])
        want = pdf["v"].ewm(alpha=0.3, adjust=False).mean()
        for i, w in zip(pdf["i"], want):
            assert abs(got[(key, i)] - w) < 1e-12, (key, i)

    # NULL carries the previous smoothed value forward
    dfn = spark.createDataFrame(
        [("a", 0, 2.0), ("a", 1, None), ("a", 2, 4.0)],
        "k string, i long, v double")
    outn = {r["i"]: r["ewma"] for r in
            (PCollection(dfn) | Ewma("v", alpha=0.5, keys="k",
                                     order_by="i")).df.collect()}
    assert outn[0] == 2.0 and outn[1] == 2.0
    assert abs(outn[2] - 3.0) < 1e-12      # 0.5*4 + 0.5*2

    # LEADING NULLs: output stays NULL until the first non-NULL value
    # seeds the recurrence — and the q_ts_ewma DuckDB oracle's
    # recursive CTE agrees (its recursive step seeds on the first
    # non-NULL instead of propagating the NULL seed forever)
    dfl = spark.createDataFrame(
        [("a", 0, None), ("a", 1, None), ("a", 2, 6.0), ("a", 3, 2.0)],
        "k string, i long, v double")
    outl = {r["i"]: r["ewma"] for r in
            (PCollection(dfl) | Ewma("v", alpha=0.5, keys="k",
                                     order_by="i")).df.collect()}
    assert outl[0] is None and outl[1] is None
    assert outl[2] == 6.0 and abs(outl[3] - 4.0) < 1e-12

    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (k VARCHAR, i BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)",
                    [("a", 0, None), ("a", 1, None),
                     ("a", 2, 6.0), ("a", 3, 2.0)])
    oracle = con.execute("""
        WITH RECURSIVE r AS (
          SELECT k, i, v,
                 row_number() OVER (PARTITION BY k ORDER BY i) AS rn
          FROM ev),
        e AS (
          SELECT k, i, rn, CAST(v AS DOUBLE) AS ewma FROM r WHERE rn = 1
          UNION ALL
          SELECT r.k, r.i, r.rn,
                 CASE WHEN r.v IS NULL THEN e.ewma
                      WHEN e.ewma IS NULL THEN CAST(r.v AS DOUBLE)
                      ELSE 0.5 * r.v + 0.5 * e.ewma END
          FROM e JOIN r ON r.k = e.k AND r.rn = e.rn + 1)
        SELECT i, ewma FROM e ORDER BY i""").fetchall()
    con.close()
    assert {i: w for i, w in oracle} == outl

    with _pytest.raises(ValueError, match="alpha"):
        Ewma("v", alpha=0.0, keys="k", order_by="i")


def test_holt_linear_trend(spark):
    """HoltLinear: a perfect linear ramp converges level to the ramp
    and trend to the slope; leading NULLs stay NULL until the first
    non-NULL seeds (l=x, b=0); mid-stream NULLs carry both states;
    validation rejects out-of-range coefficients."""
    import pytest as _pytest

    from beam_spark.operators.stats import HoltLinear
    from beam_spark.pcollection import PCollection

    ramp = [("a", i, 10.0 + 2.0 * i) for i in range(40)]
    df = spark.createDataFrame(ramp, "k string, i long, v double")
    out = {r["i"]: (r["level"], r["trend"]) for r in
           (PCollection(df) | HoltLinear(
               "v", alpha=0.5, beta=0.25, keys="k",
               order_by="i")).df.collect()}
    assert out[0] == (10.0, 0.0)                 # seed
    lvl, tr = out[39]
    assert abs(tr - 2.0) < 0.05                  # trend -> slope
    assert abs(lvl - (10.0 + 2.0 * 39)) < 0.5    # level -> ramp

    dfn = spark.createDataFrame(
        [("a", 0, None), ("a", 1, 4.0), ("a", 2, None), ("a", 3, 8.0)],
        "k string, i long, v double")
    outn = {r["i"]: (r["level"], r["trend"]) for r in
            (PCollection(dfn) | HoltLinear(
                "v", alpha=0.5, beta=0.25, keys="k",
                order_by="i")).df.collect()}
    assert outn[0] == (None, None)               # unseeded
    assert outn[1] == (4.0, 0.0)                 # seeds at first value
    assert outn[2] == (4.0, 0.0)                 # NULL carries state
    l3 = 0.5 * 8.0 + 0.5 * (4.0 + 0.0)
    assert outn[3] == (l3, 0.25 * (l3 - 4.0) + 0.75 * 0.0)

    with _pytest.raises(ValueError, match="alpha"):
        HoltLinear("v", alpha=0.0, beta=0.5, keys="k", order_by="i")
    with _pytest.raises(ValueError, match="beta"):
        HoltLinear("v", alpha=0.5, beta=1.5, keys="k", order_by="i")


def test_cusum_detects_mean_shift(spark):
    """CusumDetect: in-control noise stays near zero; an upward mean
    shift raises s_hi past the threshold and alarms; a downward shift
    trips s_lo; NULLs carry state; validation."""
    import pytest as _pytest

    from beam_spark.operators.stats import CusumDetect
    from beam_spark.pcollection import PCollection

    vals = [10.0, 10.2, 9.9, 10.1] + [13.0] * 5      # shift up at i=4
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = sorted(
        (PCollection(df) | CusumDetect(
            "v", target=10.0, slack=0.5, threshold=10.0,
            keys="k", order_by="i")).df.collect(),
        key=lambda r: r["i"])
    assert all(r["s_hi"] < 1.0 for r in out[:4])       # in control
    assert not any(r["alarm"] for r in out[:4])
    assert out[-1]["s_hi"] > 10.0 and out[-1]["alarm"]
    # downward shift trips the LOW side
    down = [("a", i, 10.0 - (3.0 if i >= 2 else 0.0)) for i in range(8)]
    d2 = spark.createDataFrame(down, "k string, i long, v double")
    o2 = sorted((PCollection(d2) | CusumDetect(
        "v", target=10.0, slack=0.5, threshold=10.0,
        keys="k", order_by="i")).df.collect(), key=lambda r: r["i"])
    assert o2[-1]["s_lo"] > 10.0 and o2[-1]["alarm"]
    # NULL carries state
    dn = spark.createDataFrame(
        [("a", 0, 13.0), ("a", 1, None), ("a", 2, 13.0)],
        "k string, i long, v double")
    on = sorted((PCollection(dn) | CusumDetect(
        "v", target=10.0, slack=0.5, threshold=10.0,
        keys="k", order_by="i")).df.collect(), key=lambda r: r["i"])
    assert on[1]["s_hi"] == on[0]["s_hi"] == 2.5
    assert on[2]["s_hi"] == 5.0
    with _pytest.raises(ValueError, match="slack"):
        CusumDetect("v", 0.0, keys="k", order_by="i", slack=-1)


def test_misra_gries_heavy_hitters(spark):
    """MisraGries: exact when distinct <= k; on skewed multi-partition
    data every item above n/(k+1) is present with a lower-bound
    estimate inside [true - n/(k+1), true]; summary size stays
    <= k * num_partitions; NULLs ignored; k validated."""
    import pytest as _pytest

    from beam_spark.operators.stats import MisraGries
    from beam_spark.pcollection import PCollection

    # distinct <= k -> no decrements ever fire: exact counts
    small = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "item string")
    got = {r["item"]: r["est"] for r in
           (PCollection(small) | MisraGries("item", k=10))
           .df.collect()}
    assert got == {"a": 5, "b": 3, "c": 1}

    # skew: hot items 30%/15%, 5500 cold singletons, 8 partitions
    rows = ([("hot0",)] * 3000 + [("hot1",)] * 1500
            + [(f"c{i}",) for i in range(5500)] + [(None,)] * 40)
    df = spark.createDataFrame(rows, "item string").repartition(8)
    n = 10000
    k = 20
    out = {r["item"]: r["est"] for r in
           (PCollection(df) | MisraGries("item", k=k)).df.collect()}
    assert len(out) <= k * 8
    assert None not in out
    thr = n / (k + 1)
    for item, true in (("hot0", 3000), ("hot1", 1500)):
        assert item in out, item
        assert true - thr <= out[item] <= true, (item, out[item])

    with _pytest.raises(ValueError, match="k must be"):
        MisraGries("item", k=0)


def test_seasonal_decompose_recovers_components(spark):
    """SeasonalDecompose on a constructed trend+seasonal signal:
    recovers the linear trend (2xMA is exact on a linear ramp), the
    seasonal offsets (zero-centered), and a ~zero remainder; even
    period exercises the half-weight-endpoint 2xMA; edge rows get
    NULL trend/remainder; period validated."""
    import pytest as _pytest

    from beam_spark.operators.stats import SeasonalDecompose
    from beam_spark.pcollection import PCollection

    season = [3.0, -1.0, -2.0, 0.0]                 # sums to 0
    rows = [("a", i, 10.0 + 0.5 * i + season[i % 4])
            for i in range(32)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {r["i"]: (r["trend"], r["seasonal"], r["remainder"])
           for r in (PCollection(df) | SeasonalDecompose(
               "v", period=4, keys="k", order_by="i")).df.collect()}
    # edges: first/last period/2 rows have NULL trend
    assert out[0][0] is None and out[1][0] is None
    assert out[31][0] is None and out[30][0] is None
    for i in range(2, 30):
        tr, se, rem = out[i]
        assert abs(tr - (10.0 + 0.5 * i)) < 1e-6, i   # 2xMA exact
        assert abs(se - season[i % 4]) < 0.2, i
        assert abs(rem) < 0.2, i

    with _pytest.raises(ValueError, match="period"):
        SeasonalDecompose("v", period=1, keys="k", order_by="i")


def test_holt_winters_seasonal_recovery(spark):
    """HoltWinters on a trend+seasonal signal: level tracks the ramp,
    trend approaches the slope, the seasonal state converges to the
    planted per-phase offsets; first `period` rows are NULL; keys
    with < period rows emit all NULLs; NULL inputs rejected;
    coefficient/period validation."""
    import pytest as _pytest

    from beam_spark.operators.stats import HoltWinters
    from beam_spark.pcollection import PCollection

    season = [2.0, -1.0, 0.0, -1.0]
    rows = [("a", i, 10.0 + 0.5 * i + season[i % 4])
            for i in range(48)] + [("tiny", 0, 1.0), ("tiny", 1, 2.0)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {(r["k"], r["i"]): (r["level"], r["trend"], r["season"])
           for r in (PCollection(df) | HoltWinters(
               "v", alpha=0.5, beta=0.25, gamma=0.25, period=4,
               keys="k", order_by="i")).df.collect()}
    for i in range(4):
        assert out[("a", i)] == (None, None, None)
    lvl, tr, se = out[("a", 47)]
    assert abs(tr - 0.5) < 0.05                  # slope recovered
    assert abs(lvl - (10.0 + 0.5 * 47)) < 0.6    # level tracks ramp
    assert abs(se - season[47 % 4]) < 0.4        # seasonal offset
    assert out[("tiny", 0)] == (None, None, None)
    assert out[("tiny", 1)] == (None, None, None)

    dfn = spark.createDataFrame([("a", 0, None)] + rows[:6],
                                "k string, i long, v double")
    with _pytest.raises(Exception, match="NULL input"):
        (PCollection(dfn) | HoltWinters(
            "v", alpha=0.5, beta=0.25, gamma=0.25, period=4,
            keys="k", order_by="i")).df.collect()

    with _pytest.raises(ValueError, match="gamma"):
        HoltWinters("v", 0.5, 0.25, 1.5, 4, "k", "i")
    with _pytest.raises(ValueError, match="period"):
        HoltWinters("v", 0.5, 0.25, 0.25, 1, "k", "i")


def test_holt_winters_multiplicative(spark):
    """mode='multiplicative': on a signal whose seasonal swing is
    PROPORTIONAL to a growing level (x = base_t * factor[phase]),
    the seasonal ratios converge to the planted factors and level
    tracks the base — exactly what additive mode cannot model.
    Values <= 0 rejected; bad mode rejected."""
    import pytest as _pytest

    from beam_spark.operators.stats import HoltWinters
    from beam_spark.pcollection import PCollection

    factor = [1.2, 0.8, 1.0, 1.0]
    rows = [("a", i, (10.0 + 0.5 * i) * factor[i % 4])
            for i in range(48)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {(r["k"], r["i"]): (r["level"], r["trend"], r["season"])
           for r in (PCollection(df) | HoltWinters(
               "v", alpha=0.5, beta=0.25, gamma=0.25, period=4,
               keys="k", order_by="i", mode="multiplicative"))
           .df.collect()}
    for i in range(4):
        assert out[("a", i)] == (None, None, None)
    lvl, tr, se = out[("a", 47)]
    assert abs(lvl - (10.0 + 0.5 * 47)) < 1.2    # level tracks base
    assert abs(tr - 0.5) < 0.12                  # slope recovered
    assert abs(se - factor[47 % 4]) < 0.08       # ratio recovered

    neg = spark.createDataFrame(
        [("a", i, float(i) - 2.0) for i in range(8)],
        "k string, i long, v double")
    with _pytest.raises(Exception, match="must be > 0"):
        (PCollection(neg) | HoltWinters(
            "v", alpha=0.5, beta=0.25, gamma=0.25, period=4,
            keys="k", order_by="i",
            mode="multiplicative")).df.collect()
    with _pytest.raises(ValueError, match="mode"):
        HoltWinters("v", 0.5, 0.25, 0.25, 4, "k", "i", mode="loglog")


def test_seasonal_decompose_robust_ignores_spike(spark):
    """robust=True: a single 1000x spike leaves the median trend and
    the phase-median seasonal untouched at every row whose window /
    phase group doesn't have the spike as its middle statistic —
    whereas classical mode smears the spike across a full period of
    trend values. This is the STL robustness property delivered via
    running medians instead of LOESS weight iterations."""
    from beam_spark.operators.stats import SeasonalDecompose
    from beam_spark.pcollection import PCollection

    season = [3.0, -1.0, -2.0]
    base = [(i, 10.0 + season[i % 3]) for i in range(30)]
    spiked = [(i, v if i != 15 else 1000.0) for i, v in base]

    def run(rows, robust):
        df = spark.createDataFrame([("k", i, v) for i, v in rows],
                                   "k string, i long, v double")
        out = (PCollection(df) | SeasonalDecompose(
            "v", period=3, keys="k", order_by="i", robust=robust)).df
        return {r["i"]: (r["trend"], r["seasonal"]) for r in out.collect()}

    clean = run(base, robust=True)
    dirty = run(spiked, robust=True)
    # median trend: every window NOT containing the spike (only
    # i=14..16 contain row 15) is bit-identical to the clean run
    for i in range(1, 29):
        if i not in (14, 15, 16):
            assert dirty[i][0] == clean[i][0], i
    # even in the spike windows the median stays inside the signal's
    # order statistics (another clean value), never near 1000
    for i in (14, 15, 16):
        assert dirty[i][0] is not None and abs(dirty[i][0]) < 20
    # phase medians: one outlier among ~10 phase values moves the
    # median at most to a neighboring order statistic
    for i in range(30):
        assert abs(dirty[i][1] - clean[i][1]) < 2.0, i
    # classical mode, by contrast, drags the MA trend by ~spike/period
    dirty_cls = run(spiked, robust=False)
    assert abs(dirty_cls[15][0] - 10.0) > 100


def test_acf_detects_period(spark):
    """ACF on a pure period-4 signal peaks at lag 4 (r4 ~ +1) and dips
    at lag 2 (anti-phase, r2 ~ -1); a constant series yields NULL
    (zero denominator); lags validation."""
    import pytest as _pytest

    from beam_spark.operators.stats import Acf
    from beam_spark.pcollection import PCollection

    season = [2.0, 0.0, -2.0, 0.0]
    rows = ([("s", i, season[i % 4]) for i in range(64)]
            + [("const", i, 5.0) for i in range(16)])
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {(r["k"], r["lag"]): r["acf"] for r in
           (PCollection(df) | Acf("v", lags=4, keys="k",
                                  order_by="i")).df.collect()}
    assert out[("s", 4)] > 0.9
    assert out[("s", 2)] < -0.9
    assert abs(out[("s", 1)]) < 0.1       # quarter-phase ~ 0
    for lag in range(1, 5):
        assert out[("const", lag)] is None
    with _pytest.raises(ValueError, match="lags"):
        Acf("v", lags=0, keys="k", order_by="i")


def test_pacf_cuts_off_at_ar_order(spark):
    """PACF on a seeded AR(2) series: lags 1-2 carry structure, lags
    3-5 collapse toward 0 (the AR-order cutoff the statistic exists
    for); agrees with a direct numpy Durbin-Levinson replay."""
    import numpy as np
    import pytest as _pytest

    from beam_spark.operators.stats import Pacf
    from beam_spark.pcollection import PCollection

    rng = np.random.default_rng(11)
    eps = rng.normal(0, 1, 600)
    x = np.zeros(600)
    for t in range(2, 600):
        x[t] = 0.6 * x[t - 1] - 0.3 * x[t - 2] + eps[t]
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(x)],
        "k string, i long, v double")
    got = {r["lag"]: r["pacf"] for r in
           (PCollection(df) | Pacf("v", lags=5, keys="k",
                                   order_by="i")).df.collect()}
    # direct replay
    mu = x.mean()
    c = x - mu
    den = float((c * c).sum())
    r = [float((c[k:] * c[:-k]).sum()) / den for k in range(1, 6)]
    phi = [r[0]]
    v = 1 - r[0] ** 2
    want = [r[0]]
    for k in range(2, 6):
        num = r[k - 1]
        for j in range(1, k):
            num = num - phi[j - 1] * r[k - 1 - j]
        pk = num / v
        phi = [phi[j - 1] - pk * phi[k - 1 - j]
               for j in range(1, k)] + [pk]
        v = v * (1 - pk * pk)
        want.append(pk)
    for lag in range(1, 6):
        assert abs(got[lag] - want[lag - 1]) < 1e-9, lag
    assert abs(got[2] - (-0.3)) < 0.12          # AR(2) coefficient
    for lag in (3, 4, 5):
        assert abs(got[lag]) < 0.12             # cutoff
    with _pytest.raises(ValueError, match="lags"):
        Pacf("v", lags=0, keys="k", order_by="i")


def test_rolling_corr_known_signals(spark):
    """RollingCorr: perfectly co-moving signals give +1, anti-moving
    give -1; incomplete windows, NULL-bearing windows, and
    zero-variance windows give NULL."""
    import pytest as _pytest

    from beam_spark.operators.stats import RollingCorr
    from beam_spark.pcollection import PCollection

    rows = ([("pos", i, float(i), 2.0 * i + 5) for i in range(8)]
            + [("neg", i, float(i), -3.0 * i) for i in range(8)]
            + [("flat", i, float(i), 7.0) for i in range(8)]
            + [("gap", i, None if i == 2 else float(i), float(i * i))
               for i in range(8)])
    df = spark.createDataFrame(rows, "k string, i long, x double, y double")
    out = {(r["k"], r["i"]): r["rolling_corr"] for r in
           (PCollection(df) | RollingCorr(
               "x", "y", window=4, keys="k", order_by="i")).df.collect()}
    for i in range(3):                       # window not yet full
        assert out[("pos", i)] is None
    for i in range(3, 8):
        assert out[("pos", i)] == 1.0
        assert out[("neg", i)] == -1.0
        assert out[("flat", i)] is None      # zero variance in y
    assert out[("gap", 3)] is None and out[("gap", 4)] is None
    assert out[("gap", 5)] is None           # NULL still in window
    assert out[("gap", 6)] is not None       # window clear again
    with _pytest.raises(ValueError, match="window"):
        RollingCorr("x", "y", window=1, keys="k", order_by="i")


def test_holt_winters_forecast_next_tracks_actuals(spark):
    """emit_forecast: after burn-in on a clean trend+seasonal signal,
    forecast_next at row t predicts row t+1's actual closely — in
    BOTH modes; seed rows stay NULL."""
    from beam_spark.operators.stats import HoltWinters
    from beam_spark.pcollection import PCollection

    season = [2.0, -1.0, 0.0, -1.0]
    vals = [10.0 + 0.5 * i + season[i % 4] for i in range(48)]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)],
        "k string, i long, v double")
    out = {r["i"]: r["forecast_next"] for r in
           (PCollection(df) | HoltWinters(
               "v", alpha=0.5, beta=0.25, gamma=0.25, period=4,
               keys="k", order_by="i", emit_forecast=True)).df.collect()}
    for i in range(4):
        assert out[i] is None
    for t in range(40, 47):
        assert abs(out[t] - vals[t + 1]) < 0.35, (t, out[t], vals[t + 1])

    factor = [1.2, 0.8, 1.0, 1.0]
    mvals = [(10.0 + 0.5 * i) * factor[i % 4] for i in range(48)]
    mdf = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(mvals)],
        "k string, i long, v double")
    mout = {r["i"]: r["forecast_next"] for r in
            (PCollection(mdf) | HoltWinters(
                "v", alpha=0.5, beta=0.25, gamma=0.25, period=4,
                keys="k", order_by="i", mode="multiplicative",
                emit_forecast=True)).df.collect()}
    for t in range(40, 47):
        rel = abs(mout[t] - mvals[t + 1]) / mvals[t + 1]
        assert rel < 0.05, (t, mout[t], mvals[t + 1])


def test_changepoint_binary_segmentation_recovers_shifts(spark):
    """Two planted mean shifts recovered at their exact positions in
    level order (biggest SSE reduction first); a shift-free series
    yields no changepoints; validation errors."""
    import pytest as _pytest

    from beam_spark.operators.stats import ChangepointMeanShift
    from beam_spark.pcollection import PCollection

    wiggle = [0.0, 1.0, -1.0, 0.5, -0.5]
    vals = [wiggle[i % 5] + (80.0 if i >= 40 else 0.0)
            + (-50.0 if i >= 70 else 0.0) for i in range(100)]
    rows = ([("a", i, v) for i, v in enumerate(vals)]
            + [("flat", i, wiggle[i % 5]) for i in range(60)])
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = [(r["k"], r["cp_pos"], r["level"]) for r in
           (PCollection(df) | ChangepointMeanShift(
               "v", keys="k", order_by="i", penalty=50.0,
               levels=3, min_segment=5)).df.collect()]
    a_cps = sorted((p, lv) for k, p, lv in out if k == "a")
    assert (40, 1) in a_cps and (70, 2) in a_cps
    assert all(p in (40, 70) for p, _ in a_cps)   # no spurious splits
    assert not any(k == "flat" for k, _, _ in out)
    with _pytest.raises(ValueError, match="penalty"):
        ChangepointMeanShift("v", keys="k", order_by="i", penalty=-1)
    with _pytest.raises(ValueError, match="levels"):
        ChangepointMeanShift("v", keys="k", order_by="i",
                             penalty=1, levels=0)


def test_ar_forecast_recovers_coefficients_and_recurrence(spark):
    """Round-15 ArForecast: on a seeded AR(2) series the Yule-Walker
    phi land near the true (0.6, -0.3); forecasts iterate exactly the
    fitted recurrence from the last two observations (checked against
    a direct numpy replay at 1e-9); constant and too-short keys are
    dropped; p=1 collapses to phi1 = r1."""
    import numpy as np
    import pytest as _pytest

    from beam_spark.operators.stats import ArForecast
    from beam_spark.pcollection import PCollection

    rng = np.random.default_rng(11)
    eps = rng.normal(0, 1, 600)
    x = np.zeros(600)
    for t in range(2, 600):
        x[t] = 0.6 * x[t - 1] - 0.3 * x[t - 2] + eps[t]
    rows = [("k", i, float(v)) for i, v in enumerate(x)]
    rows += [("const", i, 5.0) for i in range(10)]   # den = 0 -> drop
    rows += [("tiny", 0, 1.0), ("tiny", 1, 2.0)]    # n < p+1 -> drop
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {(r["k"], r["h"]): r for r in
           (PCollection(df) | ArForecast(
               "v", keys="k", order_by="i", p=2,
               horizons=(1, 2, 3))).df.collect()}
    assert {k for k, _ in got} == {"k"}
    # direct replay: Yule-Walker phi + deviation recurrence
    mu = x.mean()
    c = x - mu
    den = float((c * c).sum())
    r1 = float((c[1:] * c[:-1]).sum()) / den
    r2 = float((c[2:] * c[:-2]).sum()) / den
    v0 = 1 - r1 * r1
    pk = (r2 - r1 * r1) / v0
    phi1, phi2 = r1 - pk * r1, pk
    assert abs(got[("k", 1)]["phi1"] - phi1) < 1e-9
    assert abs(got[("k", 1)]["phi2"] - phi2) < 1e-9
    assert abs(phi1 - 0.6) < 0.1 and abs(phi2 - (-0.3)) < 0.1
    h = [x[-1] - mu, x[-2] - mu]
    for step in (1, 2, 3):
        f = phi1 * h[0] + phi2 * h[1]
        assert abs(got[("k", step)]["forecast"] - (mu + f)) < 1e-9
        h = [f, h[0]]
    # p=1: phi1 is exactly r1
    got1 = {r["h"]: r for r in
            (PCollection(df.where("k = 'k'")) | ArForecast(
                "v", keys="k", order_by="i", p=1, horizons=(1,))
             ).df.collect()}
    assert abs(got1[1]["phi1"] - r1) < 1e-12
    with _pytest.raises(ValueError, match="horizons"):
        ArForecast("v", keys="k", order_by="i", horizons=())
    with _pytest.raises(ValueError, match="p "):
        ArForecast("v", keys="k", order_by="i", p=0)


def test_forecast_backtest_holdout_and_mase(spark):
    """Round-15 ForecastBacktest: the last `holdout` rows per key are
    the scored actuals (h maps oldest-held-out -> 1), the fit sees
    only the train prefix (checked against a direct ArForecast run on
    the truncated frame), and mase = abs_err / mean |lag-1 diff| of
    the train prefix."""
    import numpy as np

    from beam_spark.operators.stats import ArForecast, ForecastBacktest
    from beam_spark.pcollection import PCollection

    rng = np.random.default_rng(5)
    eps = rng.normal(0, 1, 200)
    x = np.zeros(200)
    for t in range(2, 200):
        x[t] = 0.5 * x[t - 1] - 0.2 * x[t - 2] + eps[t]
    rows = [("k", i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {r["h"]: r for r in
           (PCollection(df) | ForecastBacktest(
               "v", keys="k", order_by="i", p=2, holdout=3)
            ).df.collect()}
    assert set(got) == {1, 2, 3}
    # actuals are exactly the withheld tail, oldest -> h=1
    for h in (1, 2, 3):
        assert abs(got[h]["actual"] - round(x[197 + h - 1], 6)) < 1e-12
    # forecasts equal a direct AR fit on the truncated frame
    fc = {r["h"]: round(r["forecast"], 6) for r in
          (PCollection(df.where("i < 197")) | ArForecast(
              "v", keys="k", order_by="i", p=2,
              horizons=(1, 2, 3))).df.collect()}
    for h in (1, 2, 3):
        assert got[h]["forecast"] == fc[h]
    # mase denominator: mean |lag-1 diff| over the train prefix
    naive = float(np.abs(np.diff(x[:197])).mean())
    for h in (1, 2, 3):
        want = round(abs(got[h]["forecast"] - x[197 + h - 1]) / naive, 6)
        assert abs(got[h]["mase"] - want) < 1e-6
