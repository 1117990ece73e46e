"""Set operations (SURVEY.md §2.6).

Beam reference: sdks/java/core/.../transforms/Sets.java:45-110
(intersectDistinct/exceptDistinct/unionDistinct + *All variants, built on
CoGBK with per-key counts); SQL BeamIntersectRel/BeamMinusRel/BeamUnionRel.

Spark: all six are native DataFrame operators — distributed hash-based,
no driver involvement, strictly better than Beam's CoGBK count emulation.
"""

from __future__ import annotations

from beam_spark.pcollection import PCollection, PTransform


class _SetOp(PTransform):
    def __init__(self, right: PCollection, label=None):
        super().__init__(label)
        self.right = right

    def _apply(self, left, right):
        raise NotImplementedError

    def expand(self, pcoll: PCollection) -> PCollection:
        return pcoll.with_df(self._apply(pcoll.df, self.right.df))


class UnionAll(_SetOp):
    """Sets.unionAll / Flatten — UNION ALL."""
    def _apply(self, l, r):
        return l.unionByName(r)


class UnionDistinct(_SetOp):
    """Sets.unionDistinct — UNION."""
    def _apply(self, l, r):
        return l.unionByName(r).distinct()


class IntersectDistinct(_SetOp):
    """Sets.intersectDistinct — INTERSECT."""
    def _apply(self, l, r):
        return l.intersect(r)


class IntersectAll(_SetOp):
    """Sets.intersectAll — INTERSECT ALL (multiset min counts)."""
    def _apply(self, l, r):
        return l.intersectAll(r)


class ExceptDistinct(_SetOp):
    """Sets.exceptDistinct — EXCEPT."""
    def _apply(self, l, r):
        return l.subtract(r)


class ExceptAll(_SetOp):
    """Sets.exceptAll — EXCEPT ALL (multiset count difference)."""
    def _apply(self, l, r):
        return l.exceptAll(r)
