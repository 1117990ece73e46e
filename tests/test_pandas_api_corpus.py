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
groupby aggregate variants, rolling/expanding windows, merge
variants (outer/right/multi-key/suffixes), and the round-11 widening:
groupby transform (callable spelling), per-group rank/cumcount/
agg-dict/filter, rolling/expanding min_periods variants, the string
split/rsplit/slice_replace/pad/repeat/wrap family, and calendar-edge
datetime accessors.

Documented divergences (asserted in tests/test_pandas_api.py, not
repeated here): Series.round() half-up vs half-even; pivot_table index
must be a list. Round-6 sweep additions live in DIVERGENT_RAISES /
DIVERGENT_VALUES below (rank pct=, datetime+Timedelta, SeriesGroupBy
.agg(list), merge how='cross', normalize() equality, rolling count
min_periods) — each asserted so a pyspark upgrade closing a gap
surfaces as a test failure here.
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
    # ---- round-6 widening: indexing / selection ----
    ("iloc_slice_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .iloc[:20][["o_orderkey", "o_totalprice"]]),
    ("iloc_step_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .iloc[5:50:5][["o_orderkey"]]),
    ("loc_boolean_mask", lambda t: t["o"].loc[
        t["o"].o_totalprice > 250000, ["o_orderkey", "o_totalprice"]]),
    ("loc_scalar_key", lambda t: t["o"].set_index("o_orderkey")
     .loc[int(t["o"].o_orderkey.min())]["o_orderstatus"]),
    ("ser_isin_sum", lambda t: int(
        t["o"].o_orderstatus.isin(["O", "F"]).sum())),
    ("ser_duplicated_sum", lambda t: int(
        t["o"].o_orderstatus.duplicated().sum())),
    ("frame_dropdup_len", lambda t: len(t["o"].drop_duplicates(
        subset=["o_orderstatus", "o_orderpriority"]))),
    ("ser_nlargest", lambda t: t["o"].o_orderkey.nlargest(10)),
    ("ser_nsmallest", lambda t: t["o"].o_orderkey.nsmallest(10)),
    ("sort_desc_multi", lambda t: t["o"].sort_values(
        ["o_orderstatus", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True]).head(20)[
            ["o_orderkey", "o_totalprice"]]),
    ("frame_tail_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .tail(15)[["o_orderkey"]]),
    ("frame_shape", lambda t: tuple(t["o"].shape)),
    ("frame_columns", lambda t: list(t["o"].columns)),
    # ---- missing data ----
    ("ser_fillna_scalar", lambda t: t["c"].c_acctbal.fillna(0.0)),
    ("frame_dropna_len", lambda t: len(t["o"].dropna())),
    ("ser_ffill_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.ffill()),
    ("ser_replace_scalar", lambda t: t["o"].o_orderstatus.replace(
        "O", "OPEN")),
    # ---- series / frame methods ----
    ("frame_abs", lambda t: t["c"][["c_acctbal"]].abs()),
    ("frame_clip", lambda t: t["o"][["o_totalprice"]].clip(10000, 90000)),
    ("frame_rename_cols", lambda t: t["o"].rename(
        columns={"o_totalprice": "price", "o_orderkey": "key"})[
            ["key", "price"]]),
    ("frame_assign", lambda t: t["o"].assign(
        big=t["o"].o_totalprice > 100000)[["o_orderkey", "big"]]),
    ("ser_astype_int", lambda t: t["o"].o_totalprice.astype("int64")),
    ("ser_rank_dense", lambda t: t["o"].o_totalprice.rank(method="dense")),
    ("ser_pct_change_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.pct_change()),
    ("ser_shift_neg_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.shift(-1)),
    ("ser_diff2_sorted", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.diff(2)),
    ("frame_corr_matrix", lambda t: t["o"][
        ["o_totalprice", "o_custkey", "o_orderkey"]].corr()),
    ("ser_max_min_span", lambda t: float(
        t["o"].o_totalprice.max() - t["o"].o_totalprice.min())),
    ("ser_date_max", lambda t: t["o"].o_orderdate.max()),
    ("ser_cumcount_via_rank", lambda t: t["o"].groupby("o_orderstatus")
     .o_totalprice.rank(method="min")),
    # ---- string accessor (widened) ----
    ("str_upper", lambda t: t["c"].c_mktsegment.str.upper()),
    ("str_contains_sum", lambda t: int(
        t["c"].c_name.str.contains("00", regex=False).sum())),
    ("str_contains_regex_sum", lambda t: int(
        t["c"].c_name.str.contains("[0-9]{3}$", regex=True).sum())),
    ("str_pad_left", lambda t: t["o"].o_orderstatus.str.pad(
        5, side="left", fillchar="_")),
    ("str_repeat", lambda t: t["o"].o_orderstatus.str.repeat(2)),
    ("str_swapcase", lambda t: t["c"].c_mktsegment.str.swapcase()),
    ("str_slice_neg", lambda t: t["c"].c_name.str.slice(-4)),
    ("str_split_len", lambda t: t["c"].c_name.str.split("#").str.len()),
    ("str_rfind", lambda t: t["c"].c_name.str.rfind("0")),
    ("str_match_sum", lambda t: int(
        t["c"].c_name.str.match("Customer#0*1").sum())),
    # ---- datetime accessor (widened) ----
    ("dt_days_in_month", lambda t: t["o"].o_orderdate.dt.days_in_month),
    ("dt_is_quarter_start_sum", lambda t: int(
        t["o"].o_orderdate.dt.is_quarter_start.sum())),
    ("dt_is_year_start_sum", lambda t: int(
        t["o"].o_orderdate.dt.is_year_start.sum())),
    ("dt_weekofyear_vals", lambda t: t["o"].o_orderdate.dt.isocalendar()
     .week.astype("int64")),
    ("dt_strftime_full", lambda t: t["o"].o_orderdate.dt.strftime(
        "%Y-%m-%d")),
    # ---- groupby (widened) ----
    ("gb_mean", lambda t: t["o"].groupby("o_orderstatus")
     ["o_totalprice"].mean().reset_index()),
    ("gb_count", lambda t: t["o"].groupby("o_orderpriority")
     ["o_orderkey"].count().reset_index()),
    ("gb_max_date", lambda t: t["o"].groupby("o_orderstatus")
     ["o_orderdate"].max().reset_index()),
    ("gb_multi_key_mean", lambda t: t["o"].groupby(
        ["o_orderstatus", "o_orderpriority"])["o_totalprice"]
     .mean().reset_index()),
    ("gb_sem", lambda t: t["o"].groupby("o_orderstatus")
     ["o_totalprice"].sem().reset_index()),
    ("gb_filter_len", lambda t: len(t["o"].groupby("o_orderstatus")
     .filter(lambda g: len(g) > 100))),
    ("gb_transform_sum", lambda t: t["o"].groupby("o_orderstatus")
     .o_totalprice.transform(lambda s: s.sum())),
    ("gb_as_index_false", lambda t: t["o"].groupby(
        "o_orderpriority", as_index=False)["o_totalprice"].sum()),
    ("gb_series_value_counts", lambda t: t["o"].groupby(
        "o_orderstatus")["o_orderpriority"].nunique().reset_index()),
    # ---- window (widened) ----
    ("rolling_min", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(4).min()),
    ("rolling_max", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(4).max()),
    ("rolling_std", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(6).std()),
    ("rolling_minp", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(
         5, min_periods=2).sum()),
    ("expanding_mean", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.expanding().mean()),
    ("expanding_max", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.expanding().max()),
    ("expanding_count", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.expanding().count()),
    # ---- reshape (widened) ----
    ("pivot_table_sum", lambda t: t["o"].pivot_table(
        values="o_totalprice", index=["o_orderstatus"],
        columns="o_orderpriority", aggfunc="sum")),
    ("melt_value_vars", lambda t: t["o"].melt(
        id_vars=["o_orderkey"],
        value_vars=["o_orderstatus", "o_orderpriority"])),
    ("transpose_small", lambda t: t["o"].groupby("o_orderstatus")[
        ["o_totalprice", "o_custkey"]].sum().T),
    ("explode_split", lambda t: t["c"][["c_custkey", "c_name"]].assign(
        parts=t["c"].c_name.str.split("#")).explode("parts")[
            ["c_custkey", "parts"]]),
    # ---- merge / join / concat (widened) ----
    ("join_on_index", lambda t: t["c"].set_index("c_custkey")[
        ["c_name"]].join(
        t["o"].set_index("o_custkey")[["o_orderkey"]], how="inner")),
    ("concat_rows", lambda t: _concat(
        t, [t["o"][["o_orderkey"]], t["o"][["o_orderkey"]]])),
    ("merge_left_on_index", lambda t: t["o"].merge(
        t["c"].set_index("c_custkey")[["c_name"]],
        left_on="o_custkey", right_index=True, how="left")[
            ["o_orderkey", "c_name"]]),
    # ---- round-6 session-2: multiindex / label indexing ----
    ("multiindex_set_reset", lambda t: t["o"].set_index(
        ["o_orderstatus", "o_orderpriority"]).reset_index()[
            ["o_orderstatus", "o_orderpriority", "o_orderkey"]]),
    ("sort_index_head", lambda t: t["o"].set_index("o_orderkey")
     .sort_index().head(10)[["o_totalprice"]]),
    ("sort_index_desc_tail", lambda t: t["o"].set_index("o_orderkey")
     .sort_index(ascending=False).tail(10)[["o_totalprice"]]),
    ("frame_nlargest_by_col", lambda t: t["o"].nlargest(
        7, "o_orderkey")[["o_orderkey", "o_totalprice"]]),
    ("unstack_gb_size", lambda t: t["o"].groupby(
        ["o_orderstatus", "o_orderpriority"]).size().unstack()
     .fillna(0).astype("int64").reset_index()),
    ("loc_label_slice_sorted", lambda t: t["o"].set_index("o_orderkey")
     .sort_index().loc[:200][["o_totalprice"]]),
    # ---- round-7: setitem / swaplevel / stack families ----
    ("swaplevel_reset", lambda t: t["o"].set_index(
        ["o_orderstatus", "o_orderpriority"]).swaplevel()[
            ["o_orderkey"]].reset_index()),
    ("stack_gb_sum", lambda t: t["o"].groupby(
        "o_orderstatus")[["o_totalprice", "o_custkey"]]
     .sum().stack().reset_index()),
    ("setitem_scalar_col", lambda t: _setitem_scalar(t)),
    ("iloc_setitem_col", lambda t: _iloc_setitem(t)),
    ("assign_bool_col", lambda t: t["o"].assign(
        big=t["o"].o_totalprice > 100000)[["o_orderkey", "big"]]),
    ("unstack_gb_sum", lambda t: t["o"].groupby(
        ["o_orderstatus", "o_orderpriority"]).o_totalprice.sum()
     .unstack().fillna(0.0).reset_index()),
    # ---- round-7 session-2 additions ----
    ("iloc_rowslice_setitem", lambda t: _iloc_rowslice(t)),
    ("frame_nsmallest", lambda t: t["o"].nsmallest(
        5, "o_totalprice")[["o_orderkey"]]),
    ("duplicated_sum", lambda t: int(
        t["o"][["o_orderstatus"]].duplicated().sum())),
    ("str_pad", lambda t: t["o"].o_orderpriority.str.pad(
        20, "left", "_")),
    # ---- round-8: unstack(level=), categorical dtype, misc ----
    ("unstack_level0", lambda t: t["o"].groupby(
        ["o_orderstatus", "o_orderpriority"]).o_totalprice.sum()
     .unstack(level=0).fillna(0.0).reset_index()),
    ("cat_codes", lambda t: t["o"].o_orderstatus
     .astype("category").cat.codes),
    ("cat_astype_str_back", lambda t: t["o"].o_orderstatus
     .astype("category").astype(str).value_counts().reset_index()),
    ("cat_groupby", lambda t: t["o"].assign(
        cs=t["o"].o_orderstatus.astype("category"))
     .groupby("cs").o_totalprice.sum().reset_index()),
    ("ser_mode", lambda t: t["o"].o_orderstatus.mode()),
    ("ser_between", lambda t: int(
        t["o"].o_totalprice.between(1000.0, 50000.0).sum())),
    ("value_counts_normalize", lambda t: t["o"].o_orderstatus
     .value_counts(normalize=True)),
    ("str_zfill", lambda t: t["o"].o_orderkey.astype(str)
     .str.zfill(10)),
    ("str_slice_replace", lambda t: t["o"].o_orderpriority
     .str.slice_replace(0, 1, "Z")),
    ("where_scalar_other", lambda t: t["o"].o_totalprice.where(
        t["o"].o_totalprice > 10000.0, 0.0)),
    ("mask_scalar_other", lambda t: t["o"].o_totalprice.mask(
        t["o"].o_totalprice > 10000.0, -1.0)),
    ("droplevel0", lambda t: t["o"].set_index(
        ["o_orderstatus", "o_orderpriority"]).droplevel(0)
     [["o_totalprice"]].reset_index()),
    ("gb_idxmax", lambda t: t["o"].groupby("o_orderstatus")
     .o_totalprice.idxmax()),
    ("gb_nunique", lambda t: t["o"].groupby("o_orderstatus")
     .o_custkey.nunique().reset_index()),
    ("dt_isocalendar_week", lambda t: t["o"].o_orderdate
     .dt.isocalendar().week.astype("int64")),
    ("rename_axis_reset", lambda t: t["o"].groupby("o_orderstatus")
     .size().rename_axis("st").reset_index(name="n")),
    ("round_neg_digits", lambda t: t["o"].o_totalprice.round(-2)),
    ("diff_abs_sum", lambda t: t["o"].sort_values("o_orderkey")
     .o_totalprice.reset_index(drop=True).diff().abs().sum()),
    ("ser_truncate", lambda t: t["o"].set_index("o_orderkey")
     .sort_index().o_totalprice.truncate(before=10, after=200)),
]


def _cut_bins(t):
    frame = t["o"].o_totalprice
    if hasattr(frame, "to_pandas"):       # pandas-on-Spark
        import pyspark.pandas as pp
        return pp.cut(frame, bins=[0, 1000, 100000, 1e9])
    return pd.cut(frame, bins=[0, 1000, 100000, 1e9])


def _iloc_rowslice(t):
    d = t["o"][["o_orderkey", "o_totalprice"]]         .sort_values("o_orderkey").copy()
    d.iloc[0:3, 1] = 0.0
    return d.head(5)


def _setitem_scalar(t):
    d = t["o"][["o_orderkey", "o_totalprice"]].copy()
    d["z"] = 0
    return d[["o_orderkey", "z"]]


def _iloc_setitem(t):
    d = t["o"][["o_orderkey", "o_totalprice"]].copy()
    d.iloc[:, 1] = 7.0
    return d


# pyspark.pandas divergences found by the sweep — documented, each
# asserted below so a future pyspark closing the gap flips the test:
#   ser_rank_pct:        Series.rank() has no pct= kwarg
#   dt_plus_timedelta:   datetime + Timedelta unsupported (TypeError)
#   gb_agg_list:         SeriesGroupBy.agg(["min",...]) not implemented
#   merge_cross:         merge(how="cross") rejected
#   gb_level_kwarg:      groupby(level=...) unsupported
#   pivot_table_no_cols: pivot_table without columns= rejected
#   dt_normalize_eq:     normalize()==orig compares False row-wise on
#                        Spark timestamps where pandas yields True
#   rolling_count:       rolling(n).count() defaults min_periods=0
#                        (pandas emits NaN below the window width)
CASES += [
    # ---- round-10 widening: element-wise combine, categorical
    # reorder/rename, ewm, dedup/top-n frames, misc series ----
    ("cat_codes", lambda t: t["c"].c_mktsegment
     .astype("category").cat.codes),
    ("cat_reorder_codes", lambda t: t["c"].c_mktsegment
     .astype("category").cat.reorder_categories(
         sorted(["BUILDING", "AUTOMOBILE", "MACHINERY",
                 "HOUSEHOLD", "FURNITURE"], reverse=True)).cat.codes),
    ("cat_add_remove_codes", lambda t: t["c"].c_mktsegment
     .astype("category").cat.add_categories(["ZZ"])
     .cat.remove_categories(["ZZ"]).cat.codes),
    ("cat_rename_codes", lambda t: t["c"].c_mktsegment
     .astype("category").cat.rename_categories(
         lambda c: c[:2]).astype("string")),
    ("ewm_mean_sorted", lambda t: t["c"].sort_values("c_custkey")
     .set_index("c_custkey").c_acctbal.ewm(alpha=0.5).mean()),
    ("clip_lower_only", lambda t: t["c"].c_acctbal.clip(lower=0)),
    ("ser_duplicated_sum", lambda t: int(
        t["c"].c_mktsegment.duplicated().sum())),
    ("frame_dedup_keep_last_sorted", lambda t: t["c"]
     .sort_values("c_custkey").drop_duplicates(
         subset=["c_mktsegment"], keep="last")
     [["c_mktsegment", "c_custkey"]]),
    ("frame_nlargest_unique_key", lambda t: t["o"]
     .nlargest(7, "o_orderkey")[["o_orderkey", "o_totalprice"]]),
    ("frame_nsmallest_unique_key", lambda t: t["o"]
     .nsmallest(7, "o_orderkey")[["o_orderkey", "o_totalprice"]]),
    ("ser_mode", lambda t: t["o"].o_orderstatus.mode()),
    ("value_counts_normalized", lambda t: t["c"].c_mktsegment
     .value_counts(normalize=True)),
    ("ser_truncate_sorted", lambda t: t["c"].sort_values("c_custkey")
     .set_index("c_custkey").c_acctbal.truncate(before=10, after=20)),
    ("pct_change_sorted", lambda t: t["c"].sort_values("c_custkey")
     .set_index("c_custkey").c_acctbal.pct_change()),
    ("ser_autocorr", lambda t: float(
        t["c"].sort_values("c_custkey").c_acctbal.autocorr())),
    # factorize returns ndarray (pd) vs Series (ps) — canonicalize to
    # a sorted code tuple via to_numpy(); sort=True pins the label
    # order on both
    ("ser_factorize_sorted", lambda t: tuple(sorted(
        int(x) for x in t["c"].sort_values("c_custkey")
        .c_mktsegment.factorize(sort=True)[0].to_numpy()))
     if hasattr(t["c"], "to_pandas") else tuple(sorted(
         int(x) for x in t["c"].sort_values("c_custkey")
         .c_mktsegment.factorize(sort=True)[0]))),
    # ---- round-11: groupby transform / window min_periods /
    # string split-family expansions (the VERDICT-10 backlog) ----
    ("gb_transform_mean_fn", lambda t: t["o"].groupby("o_orderstatus")
     .o_totalprice.transform(lambda s: s.mean())),
    ("gb_transform_demean", lambda t: t["o"].groupby("o_orderstatus")
     .o_totalprice.transform(lambda s: s - s.mean())),
    ("gb_rank_in_group", lambda t: t["o"].groupby("o_orderstatus")
     .o_totalprice.rank(method="min")),
    ("gb_cumcount", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").cumcount()),
    ("gb_agg_dict", lambda t: t["o"].groupby("o_orderstatus")
     .agg({"o_totalprice": "sum", "o_custkey": "max"})),
    ("gb_filter_size", lambda t: t["o"].groupby("o_orderpriority")
     .filter(lambda g: len(g) > 50)[["o_orderkey"]]),
    ("gb_nunique_frame", lambda t: t["o"].groupby("o_orderstatus")
     .nunique()),
    ("roll_sum_minp", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice
     .rolling(5, min_periods=2).sum()),
    ("roll_mean_minp1", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice
     .rolling(4, min_periods=1).mean()),
    ("roll_std_minp", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice
     .rolling(6, min_periods=3).std()),
    ("roll_min_minp", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice
     .rolling(3, min_periods=1).min()),
    ("expanding_minp", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice
     .expanding(min_periods=4).mean()),
    ("str_rsplit_get", lambda t: t["c"].c_name.str.rsplit("0", n=1)
     .str.get(0)),
    ("str_split_len", lambda t: t["c"].c_name.str.split("#").str.len()),
    ("str_slice_replace", lambda t: t["c"].c_name
     .str.slice_replace(0, 2, "XX")),
    ("str_pad_right", lambda t: t["c"].c_name
     .str.pad(25, side="right", fillchar="_")),
    ("str_repeat", lambda t: t["o"].o_orderstatus.str.repeat(3)),
    ("str_wrap", lambda t: t["c"].c_name.str.wrap(8)),
    ("dt_days_in_month", lambda t: t["o"].o_orderdate.dt.days_in_month),
    ("dt_is_month_end", lambda t: int(
        t["o"].o_orderdate.dt.is_month_end.sum())),
    ("dt_is_quarter_start", lambda t: int(
        t["o"].o_orderdate.dt.is_quarter_start.sum())),
    ("ser_nlargest", lambda t: t["o"].o_totalprice.nlargest(15)),
    ("frame_nsmallest", lambda t: t["o"]
     .nsmallest(10, ["o_totalprice", "o_orderkey"])
     [["o_orderkey", "o_totalprice"]]),
    # ---- covariance / correlation (round-11 sweep) ----
    ("ser_cov", lambda t: float(t["o"].o_totalprice.cov(
        t["o"].o_custkey.astype("float64")))),
    ("ser_corr", lambda t: float(t["o"].o_totalprice.corr(
        t["o"].o_custkey.astype("float64")))),
    ("df_cov", lambda t: t["o"][["o_totalprice", "o_custkey"]].cov()),
    ("df_corrwith", lambda t: t["o"][["o_totalprice", "o_custkey"]]
     .corrwith(t["o"].o_orderkey.astype("float64"))),
]


def _interval_mid_after_cut(t):
    frame = t["c"]
    if hasattr(frame, "to_pandas"):       # pandas-on-Spark
        import pyspark.pandas as pp
        ivs = pp.cut(frame.c_acctbal, [-10000, 0, 10000])
    else:
        ivs = pd.cut(frame.c_acctbal, [-10000, 0, 10000])
    # interval accessor use: the dtype itself is the divergence
    return ivs.apply(lambda iv: iv.mid)


DIVERGENT_RAISES = [
    ("ser_rank_pct", lambda t: t["o"].o_orderkey.rank(pct=True)),
    ("dt_plus_timedelta", lambda t: (
        t["o"].o_orderdate + pd.Timedelta(days=30)).dt.month),
    ("gb_agg_list", lambda t: t["o"].groupby("o_orderstatus")
     ["o_totalprice"].agg(["min", "max", "count"]).reset_index()),
    ("merge_cross", lambda t: t["o"][["o_orderstatus"]]
     .drop_duplicates().merge(
         t["o"][["o_orderpriority"]].drop_duplicates(), how="cross")),
    ("gb_level_kwarg", lambda t: t["o"].set_index(
        ["o_orderstatus", "o_orderpriority"])
     .groupby(level=[0, 1])["o_totalprice"].sum().reset_index()),
    ("pivot_table_no_columns", lambda t: t["o"].pivot_table(
        values="o_totalprice", index=["o_orderstatus", "o_orderpriority"],
        aggfunc="sum").reset_index()),
    # GroupBy.transform("mean"): ps requires a callable, rejects the
    # string spelling pandas accepts
    ("gb_transform_str", lambda t: t["o"].groupby("o_orderstatus")
     ["o_totalprice"].transform("mean")),
    # round-8 sweep: reorder_levels and pd.cut are unimplemented in ps
    ("reorder_levels", lambda t: t["o"].set_index(
        ["o_orderstatus", "o_orderpriority"]).reorder_levels([1, 0])
     [["o_orderkey"]].reset_index()),
    ("cut_bins", _cut_bins),
    # round-11 sweep: the split-family gaps — StringMethods is not
    # subscriptable (.str[0] works in pandas, .str.get(0) is the ps
    # spelling), str.extract / str.partition are unimplemented, and
    # split(expand=True) demands an explicit n
    ("str_subscript", lambda t: t["c"].c_name.str.split("#").str[0]),
    ("str_extract", lambda t: t["c"].c_name.str.extract(
        r"(\d+)", expand=False)),
    ("str_partition", lambda t: t["c"].c_name.str.partition("#")),
    ("str_split_expand_no_n", lambda t: t["c"].c_name.str.split(
        "#", expand=True)),
    # round-10: Series.combine (element-wise with a python reducer)
    # and INTERVAL dtypes (pd.cut output accessors) are unimplemented
    # in ps — interval columns stay a pandas-only dtype
    ("ser_combine_reducer", lambda t: t["c"].c_acctbal.combine(
        t["c"].c_custkey.astype("float64"), max)),
    ("interval_mid_after_cut", _interval_mid_after_cut),
    # round-11 sweep: windowed covariance/correlation — all four are
    # PandasNotImplementedError in ps (plain Series.cov/corr work,
    # see ser_cov/ser_corr in CASES)
    ("rolling_cov", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(5)
     .cov(t["o"].sort_values("o_orderkey").set_index("o_orderkey")
          .o_custkey.astype("float64"))),
    ("rolling_corr", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(5)
     .corr(t["o"].sort_values("o_orderkey").set_index("o_orderkey")
           .o_custkey.astype("float64"))),
    ("expanding_cov", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.expanding()
     .cov(t["o"].sort_values("o_orderkey").set_index("o_orderkey")
          .o_custkey.astype("float64"))),
    ("expanding_corr", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.expanding()
     .corr(t["o"].sort_values("o_orderkey").set_index("o_orderkey")
           .o_custkey.astype("float64"))),
    # round-12 sweep: groupby order-dependent transforms (shift /
    # diff / cum* / head / tail / first / last) — ps groupby
    # pct_change and to_period raise (see DIVERGENT_RAISES), median /
    # quantile and ffill-after-sort diverge in VALUES (below)
    ("gb_pct_change", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").o_totalprice.pct_change()),
    ("dt_to_period_m", lambda t: t["o"].o_orderdate.dt
     .to_period("M").astype(str)),
]

CASES += [
    # round-12: groupby order-dependent transforms — all follow the
    # sorted-anchor convention (o_orderkey is unique, so the order is
    # total and both backends replay it)
    ("gb_shift", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").o_totalprice.shift(1)),
    ("gb_diff", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").o_totalprice.diff()),
    ("gb_cumsum", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").o_totalprice.cumsum()),
    ("gb_cummax", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").o_totalprice.cummax()),
    # prod/cumprod: ps computes exp(sum(ln)) — ~1e-13 relative noise,
    # inside the corpus's 9-significant-digit canon
    ("gb_cumprod", lambda t: t["o"]
     .assign(r=t["o"].o_totalprice / 100000)
     .sort_values("o_orderkey").groupby("o_orderstatus").r.cumprod()),
    ("gb_prod", lambda t: t["o"]
     .assign(r=t["o"].o_totalprice / 100000)
     .groupby("o_orderstatus").r.prod()),
    ("gb_head", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").head(2)),
    ("gb_tail", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").tail(2)),
    ("gb_first", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").o_totalprice.first()),
    ("gb_last", lambda t: t["o"].sort_values("o_orderkey")
     .groupby("o_orderstatus").o_totalprice.last()),
    ("gb_any", lambda t: t["o"]
     .assign(b=t["o"].o_totalprice > 150000)
     .groupby("o_orderstatus").b.any()),
    ("gb_idxmin", lambda t: t["o"].set_index("o_orderkey")
     .groupby("o_orderstatus").o_totalprice.idxmin()),
    ("ser_searchsorted", lambda t: int(
        t["o"].o_totalprice.sort_values().searchsorted(100000.0))),
]

DIVERGENT_VALUES = [
    ("dt_normalize_eq", lambda t: int(
        (t["o"].o_orderdate.dt.normalize() == t["o"].o_orderdate).sum())),
    ("rolling_count", lambda t: t["o"].sort_values("o_orderkey")
     .set_index("o_orderkey").o_totalprice.rolling(3).count()),
    # category value_counts: ps indexes the counts by category CODES,
    # pandas by the category labels
    ("category_value_counts_index", lambda t: t["o"].o_orderstatus
     .astype("category").value_counts().reset_index()),
    # round-10: ps combine_first never fills the calling series' NaNs
    # when both operands derive from the same anchor frame — the
    # masked slots stay null where pandas takes the other's value
    ("ser_combine_first_same_anchor", lambda t: t["c"].c_acctbal
     .where(t["c"].c_acctbal > 0)
     .combine_first(t["c"].c_acctbal * 0.0)),
    # round-12: ps groupby.median/quantile use percentile_approx —
    # even-sized groups get an exact DATA POINT where pandas
    # interpolates the midpoint
    ("gb_median_even_interp", lambda t: t["o"]
     .groupby("o_orderstatus").o_totalprice.median()),
    ("gb_quantile_even_interp", lambda t: t["o"]
     .groupby("o_orderstatus").o_totalprice.quantile(0.5)),
    # round-12: ps GroupBy.ffill fills in the frame's NATURAL row
    # order, ignoring a preceding sort_values — leading-NaN rows that
    # pandas fills stay null in ps
    ("gb_ffill_sorted_order", lambda t: t["o"]
     .assign(x=t["o"].o_totalprice.where(t["o"].o_totalprice > 100000))
     .sort_values("o_orderkey").groupby("o_orderstatus").x.ffill()),
]


def _concat(t, frames):
    if hasattr(frames[0], "to_pandas"):   # pandas-on-Spark
        import pyspark.pandas as pp
        return pp.concat(frames, ignore_index=True)
    return pd.concat(frames, ignore_index=True)


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


@pytest.mark.parametrize("name,fn", DIVERGENT_RAISES,
                         ids=[c[0] for c in DIVERGENT_RAISES])
def test_divergent_ops_raise(ns, name, fn):
    """These op spellings work on real pandas but RAISE on
    pyspark.pandas — asserted so a pyspark upgrade closing the gap
    surfaces here (then the case moves into CASES)."""
    fn(ns["pd"])                                  # pandas accepts
    with pytest.raises(Exception):
        _canon(fn(ns["ps"]))                      # ps rejects


@pytest.mark.parametrize("name,fn", DIVERGENT_VALUES,
                         ids=[c[0] for c in DIVERGENT_VALUES])
def test_divergent_ops_differ(ns, name, fn):
    """These produce DIFFERENT values on pyspark.pandas (normalize
    equality on Spark timestamps; rolling-count min_periods default) —
    documented divergences, asserted as such."""
    assert not _close(_canon(fn(ns["ps"])), _canon(fn(ns["pd"])))


def test_corpus_size():
    """The round-12 widened conformance sweep covers >= 260 op
    families beyond tests/test_pandas_api.py."""
    assert len(CASES) + len(DIVERGENT_RAISES) + len(DIVERGENT_VALUES) >= 260
