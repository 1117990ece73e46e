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
