"""Tolerance checks for approximate operators (rows-only in the oracle
gate): approx distinct vs exact, approx quantiles vs exact, sample size.
Mirrors the reference's own testing discipline for ApproximateUnique
(stats.py sampling-error asserts)."""

from beam_spark import queries as q


def test_approx_distinct_within_tolerance(spark, sf_dir, duck):
    df = q.queries()["q_approx_distinct_users"](spark, sf_dir)
    approx = {r["event_type"]: r["approx_unique"] for r in df.collect()}
    exact = dict(duck.execute(
        "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1").fetchall())
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(2, 0.05 * e), (k, approx[k], e)


def test_approx_quantiles_within_tolerance(spark, sf_dir, duck):
    df = q.queries()["q_approx_quantiles_value"](spark, sf_dir)
    got = df.collect()[0]["quantiles"]
    exact = duck.execute(
        "SELECT quantile_cont(value, [0.25, 0.5, 0.75]) FROM events").fetchone()[0]
    spread = max(exact) - min(exact) or 1.0
    for a, e in zip(got, exact):
        assert abs(a - e) <= 0.05 * spread + 1e-9, (got, exact)


def test_hll_sketch_estimate_close(spark, sf_dir, duck):
    df = q.queries()["q_hll_sketch_mergeable"](spark, sf_dir)
    approx = df.collect()[0]["approx_users"]
    exact = duck.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert abs(approx - exact) <= max(2, 0.05 * exact)


def test_sample_exact_size_and_subset(spark, sf_dir):
    df = q.queries()["q_sample_fixed_size"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 100
    # sampled ids are real event ids
    all_ids = {r["event_id"] for r in
               q.table(spark, sf_dir, "events").df.select("event_id").collect()}
    assert {r["event_id"] for r in rows} <= all_ids


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
