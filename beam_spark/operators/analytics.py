"""SQL OVER-clause window functions (SURVEY.md §2.10).

Beam reference: BeamWindowRel.java (451 LoC; evaluates by sorting each
partition in memory) + BeamBuiltinAnalyticFunctions.java:35-48
(FIRST_VALUE, LAST_VALUE, ROW_NUMBER, DENSE_RANK, RANK, PERCENT_RANK).

Spark's WindowExec is the strictly-more-scalable native implementation
(range-partitioned, spills); this module is a thin declarative wrapper
that keeps the operator inventory explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform
from beam_spark.operators.sort import _sort_cols


def window_spec(partition_by, order_by, rows_between=None,
                range_between=None) -> WindowSpec:
    """ROWS/RANGE frame bounds (BeamWindowRel frame handling)."""
    pb = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    ob = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    w = Window.partitionBy(*pb).orderBy(*_sort_cols(ob))
    if rows_between is not None:
        w = w.rowsBetween(*rows_between)
    elif range_between is not None:
        w = w.rangeBetween(*range_between)
    return w


UNBOUNDED_PRECEDING = Window.unboundedPreceding
UNBOUNDED_FOLLOWING = Window.unboundedFollowing
CURRENT_ROW = Window.currentRow


class WithAnalytics(PTransform):
    """Attach OVER-clause columns: ``WithAnalytics(spec, rank=F.rank(),
    running=F.sum('x'))``."""

    def __init__(self, spec: WindowSpec, label=None, **cols):
        super().__init__(label)
        self.spec, self.cols = spec, cols

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        for name, col in self.cols.items():
            df = df.withColumn(name, col.over(self.spec))
        return pcoll.with_df(df)


# The analytic function surface (all native):
ANALYTIC_FUNCTIONS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "percent_rank": F.percent_rank,
    "cume_dist": F.cume_dist,
    "ntile": F.ntile,
    "lag": F.lag,
    "lead": F.lead,
    "first_value": F.first,
    "last_value": F.last,
    "nth_value": F.nth_value,
}
