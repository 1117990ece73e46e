"""Isolation forest anomaly scoring (Liu, Ting & Zhou, ICDM 2008) —
the trainable complement to the per-group z-score/IQR/MAD detectors:
anomalies are points that RANDOM axis-parallel splits isolate in few
cuts, so no distribution assumption and multivariate by construction.

Reference surface: ml/anomaly (detectors + offline scoring); the
PyOD-adapter path (`detectors/pyod_adapter.py`) is how the reference
runs IForest — this is the native distributed re-expression.

Spark-first design (the GradientBoostedStumps posture):

* FIT is aggregation-only over a DETERMINISTIC md5 row sample per
  tree (``md5(seed:t:id) % sample_mod == 0`` — no RNG state, any
  partitioning): one depth-round = one (tree, node) min/max/count
  aggregation over the sample, thresholds drawn driver-side from the
  node stats via md5-derived uniform grid points
  (``thr = lo + u * (hi - lo)``, u on the exact 1e-6 grid), split
  feature by md5 mod |features|. The per-round collect is bounded by
  trees * 2^depth node-stat rows — a driver artifact, never data.
* SCORING is one zero-shuffle expression pass: every row descends
  every tree through a literal when-tree (heap indexing, root = 1,
  child = 2*node + (x > thr) — ids stay unique ACROSS depths, which
  keying splits/leaves by (tree, node) requires)
  and h(x) = depth-reached + c(leaf_size); score = 2^(-avg_h/c(norm_n)).
  c(m) = 2*(ln(m-1) + gamma) - 2*(m-1)/m (the paper's average-BST
  depth), c(2) = 1, c(<=1) = 0.

Every fit decision (sample membership, feature choice, threshold) is
a pure function of md5 + exact node aggregates, so DuckDB replays
TRAINING end-to-end in chained CTEs and the scores hash-match at
round 6 (the <=1-ulp ln() divergence between engines sits far below
the 1e-6 grid).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform

EULER_GAMMA = 0.5772156649015329
MAX_FEATURES = 16


def avg_path_c(m: int) -> float:
    """c(m): expected search-path length in a BST of m nodes — the
    paper's normalizer and unresolved-leaf adjustment."""
    if m <= 1:
        return 0.0
    if m == 2:
        return 1.0
    return 2.0 * (math.log(m - 1) + EULER_GAMMA) - 2.0 * (m - 1) / m


def _grid_u(key: str) -> float:
    """Uniform [0,1) on the exact 1e-6 grid from md5(key) — the
    BootstrapCI integer-grid convention, replayable in any engine."""
    import hashlib

    h = hashlib.md5(key.encode()).hexdigest()
    return (int(h[:8], 16) % 1_000_000) / 1e6


class IsolationForest(PTransform):
    """Fit ``trees`` isolation trees on a deterministic row sample of
    the piped frame and append (``h_avg``, ``score``) columns scoring
    EVERY row. NULL rows (any feature) get NULL scores. ``model_``
    holds the fitted splits/leaves after expand.

    Output: input columns + iforest_h (round 6) + iforest_score
    (round 6, in (0, 1]; higher = more isolated = more anomalous).
    """

    def __init__(self, features, id_col: str, trees: int = 4,
                 depth: int = 4, sample_mod: int = 1, seed: int = 7,
                 norm_n: int = 256, label=None):
        super().__init__(label)
        self.features = ([features] if isinstance(features, str)
                         else list(features))
        if not 1 <= len(self.features) <= MAX_FEATURES:
            raise ValueError(
                f"need 1..{MAX_FEATURES} features, got "
                f"{len(self.features)}")
        self.id_col = id_col
        self.trees = int(trees)
        if not 1 <= self.trees <= 32:
            raise ValueError("trees must be in [1, 32]")
        self.depth = int(depth)
        if not 1 <= self.depth <= 8:
            raise ValueError("depth must be in [1, 8]")
        if self.trees * (1 << self.depth) > 2048:
            raise ValueError(
                "trees * 2^depth > 2048 — the per-round node-stat "
                "collect and the scoring when-tree are bounded by it")
        self.sample_mod = int(sample_mod)
        if self.sample_mod < 1:
            raise ValueError("sample_mod must be >= 1")
        self.seed = int(seed)
        self.norm_n = int(norm_n)
        if self.norm_n < 2:
            raise ValueError("norm_n must be >= 2")
        self.model_ = None   # {"splits": {(t,node): (fidx,thr,d)},
        #                      "leaves": {(t,node): (depth,size)}}

    # -- fit ------------------------------------------------------------
    def _fit(self, df):
        fs, T, D = self.features, self.trees, self.depth
        seed, mod = self.seed, self.sample_mod
        idc = self.id_col
        cond = F.lit(True)
        for f in fs:
            cond = cond & F.col(f).isNotNull()
        base = df.where(cond).select(
            F.col(idc).cast("string").alias("__id"),
            *[F.col(f).cast("double").alias(f) for f in fs])
        samp = (base.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(T - 1)))
            .alias("__t"))
            .where(F.expr(
                f"CAST(conv(substring(md5('{seed}:' || "
                f"CAST(__t AS STRING) || ':' || __id), 1, 8), 16, 10) "
                f"AS BIGINT) % {mod} = 0"))
            .withColumn("__node", F.lit(1)))
        samp = samp.localCheckpoint(eager=True)

        splits: dict = {}
        leaves: dict = {}
        live = samp
        for d in range(D):
            stats = (live.groupBy("__t", "__node")
                     .agg(F.count(F.lit(1)).alias("n"),
                          *[F.min(f).alias(f"lo_{i}")
                            for i, f in enumerate(fs)],
                          *[F.max(f).alias(f"hi_{i}")
                            for i, f in enumerate(fs)])
                     ).collect()
            level = {}
            for r in sorted(stats, key=lambda r: (r["__t"],
                                                  r["__node"])):
                t, node, n = r["__t"], r["__node"], r["n"]
                fidx = int(int.from_bytes(
                    __import__("hashlib").md5(
                        f"{seed}:{t}:{node}:f".encode()).digest()[:4],
                    "big") % len(fs))
                lo, hi = r[f"lo_{fidx}"], r[f"hi_{fidx}"]
                if n <= 1 or lo == hi:
                    leaves[(t, node)] = (d, n)
                    continue
                u = _grid_u(f"{seed}:{t}:{node}:u")
                thr = lo + u * (hi - lo)
                splits[(t, node)] = (fidx, thr, d)
                level[(t, node)] = (fidx, thr)
            if not level:
                break
            # advance via FLAT literal-map lookups on a composite key
            # (a per-node OR/when chain is left-deep and overflows
            # Catalyst recursion at a few thousand nodes — the r13
            # ContinuousAggregate lesson; create_map is one node)
            key = (F.col("__t").cast("long") * F.lit(1 << 24)
                   + F.col("__node"))
            thr_map = F.create_map(*[
                x for (t, node), (fi, th) in level.items()
                for x in (F.lit((t << 24) + node), F.lit(float(th)))])
            fid_map = F.create_map(*[
                x for (t, node), (fi, th) in level.items()
                for x in (F.lit((t << 24) + node), F.lit(int(fi)))])
            thr_col = thr_map[key]
            xsel = F.col(fs[0])
            if len(fs) > 1:
                fid_col = fid_map[key]
                xsel = F.when(fid_col == 0, F.col(fs[0]))
                for i in range(1, len(fs)):
                    xsel = xsel.when(fid_col == i, F.col(fs[i]))
            live = (live.where(thr_col.isNotNull())
                    .withColumn(
                        "__node",
                        F.col("__node") * 2
                        + (xsel > thr_col).cast("int"))
                    .localCheckpoint(eager=True))
        else:
            # max depth reached: remaining nodes become leaves
            for r in (live.groupBy("__t", "__node")
                      .agg(F.count(F.lit(1)).alias("n")).collect()):
                leaves[(r["__t"], r["__node"])] = (D, r["n"])
        return {"splits": splits, "leaves": leaves}

    # -- score ----------------------------------------------------------
    def _h_expr(self, tree: int):
        fs, D = self.features, self.depth
        splits, leaves = self.model_["splits"], self.model_["leaves"]

        def desc(node, d):
            s = splits.get((tree, node))
            if s is not None and d < D:
                fidx, thr, _ = s
                return F.when(
                    F.col(fs[fidx]) > F.lit(thr),
                    desc(2 * node + 1, d + 1)
                ).otherwise(desc(2 * node, d + 1))
            # a fit leaf at (tree, node) was terminalized at exactly
            # this descent depth (heap ids are depth-unique), so d is
            # the leaf depth; unseen nodes (no sample reached them)
            # contribute c(0) = 0 — immediate isolation
            _, size = leaves.get((tree, node), (d, 0))
            return F.lit(float(d) + avg_path_c(size))

        return desc(1, 0)

    def expand(self, pcoll: PCollection) -> PCollection:
        fs = self.features
        self.model_ = self._fit(pcoll.df)
        if not self.model_["splits"] and not self.model_["leaves"]:
            raise ValueError(
                "IsolationForest: empty input after NULL filtering "
                "and sampling — nothing to fit")
        cond = F.lit(True)
        for f in fs:
            cond = cond & F.col(f).isNotNull()
        h = self._h_expr(0)
        for t in range(1, self.trees):
            h = h + self._h_expr(t)
        h_avg = h / F.lit(float(self.trees))
        score = F.pow(F.lit(2.0),
                      -h_avg / F.lit(avg_path_c(self.norm_n)))
        out = (pcoll.df
               .withColumn("iforest_h",
                           F.when(cond, F.round(h_avg, 6)))
               .withColumn("iforest_score",
                           F.when(cond, F.round(score, 6))))
        return pcoll.with_df(out)
