"""Local mirror of the driver's duckdb-oracle comparison: row count +
column names + order-insensitive canonicalized values."""

from __future__ import annotations

import datetime
import decimal
import math


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return canon(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):
        return tuple(sorted((k, canon(x)) for k, x in v.asDict().items()))
    return v


def frame_signature(cols: list[str], rows: list) -> tuple:
    """(sorted column names, multiset of rows with columns sorted by name)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        (tuple(canon(r[i]) for i in order) for r in rows), key=repr)
    return tuple(sorted(cols)), canon_rows


def compare_spark_duckdb(spark_df, duck_con, sql: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    s_sig = frame_signature(s_cols, s_rows)
    d_sig = frame_signature(d_cols, d_rows)
    assert s_sig[0] == d_sig[0], f"column mismatch: spark={s_sig[0]} duckdb={d_sig[0]}"
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    if s_sig[1] != d_sig[1]:
        diffs = [(a, b) for a, b in zip(s_sig[1], d_sig[1]) if a != b][:5]
        raise AssertionError(f"value mismatch (first diffs): {diffs}")
