"""Link-graph analytics over edge-list DataFrames.

PageRank is the classic link-quality score of web-corpus curation
(Common Crawl publishes host-level ranks precisely so dataset builders
can weight/filter pages); the reference has no built-in graph library,
so like ConnectedComponents (operators/dedupe.py) this re-expresses the
iterative algorithm in the scale-safe DataFrame shape: one keyed join +
one keyed aggregation per round, per-round localCheckpoint to cut the
growing lineage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beam_spark.pcollection import PCollection, PTransform


class PageRank(PTransform):
    """Damped PageRank over an edge list (src, dst) with a FIXED
    iteration count — deterministic by construction, which is what
    makes it value-oracle-able against an independent engine.

    pr_{t+1}(v) = (1 - d) / N
                  + d * (sum over in-edges (u, v) of pr_t(u) / deg(u)
                         + dangling_mass_t / N)

    Dangling nodes (no out-edges) redistribute their mass uniformly —
    the standard correction keeping total mass at 1. Parallel edges
    count: dedupe the edge list upstream if multiplicity should not
    weight the link.

    Scale: per round, ranks join edges on src (rank table is
    nodes-sized — small relative to edges; Spark picks broadcast
    below the threshold and a shuffle hash join above, both correct),
    then one dst-keyed aggregation; the dangling term is a 1-row
    broadcast. Each round localCheckpoints (eager) so the plan stays
    one-round deep instead of `iterations` joins tall — the identical
    posture as ConnectedComponents.

    Output: (node, pr) for every node, sum(pr) == 1 up to float.
    """

    def __init__(self, src: str = "src", dst: str = "dst",
                 damping: float = 0.85, iterations: int = 10,
                 label=None):
        super().__init__(label)
        self.src, self.dst = src, dst
        self.damping, self.iterations = float(damping), int(iterations)
        if not 0.0 <= self.damping <= 1.0:
            raise ValueError(f"damping {damping} outside [0, 1]")
        if self.iterations < 1:
            raise ValueError("iterations must be >= 1")

    def expand(self, pcoll: PCollection) -> PCollection:
        d = self.damping
        edges = (pcoll.df
                 .select(F.col(self.src).alias("src"),
                         F.col(self.dst).alias("dst"))
                 .localCheckpoint(eager=True))
        nodes = (edges.select(F.col("src").alias("node"))
                 .unionByName(edges.select(F.col("dst").alias("node")))
                 .distinct()
                 .localCheckpoint(eager=True))
        deg = edges.groupBy("src").agg(
            F.count(F.lit(1)).alias("__deg")).localCheckpoint(eager=True)
        n_nodes = nodes.count()
        ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
        for _ in range(self.iterations):
            # mass sitting on dangling nodes this round (1-row frame,
            # broadcast into the update — no collect in the loop)
            dangling = (ranks.join(deg, ranks["node"] == deg["src"],
                                   "left_anti")
                        .agg(F.coalesce(F.sum("pr"), F.lit(0.0))
                             .alias("__dm")))
            contrib = (edges
                       .join(ranks, edges["src"] == ranks["node"])
                       .join(deg, "src")
                       .groupBy("dst")
                       .agg(F.sum(F.col("pr") / F.col("__deg"))
                            .alias("__m")))
            ranks = (nodes
                     .join(contrib, nodes["node"] == contrib["dst"],
                           "left")
                     .crossJoin(F.broadcast(dangling))
                     .select(
                         "node",
                         (F.lit((1.0 - d) / n_nodes)
                          + d * (F.coalesce(F.col("__m"), F.lit(0.0))
                                 + F.col("__dm") / n_nodes))
                         .alias("pr"))
                     .localCheckpoint(eager=True))
        return pcoll.with_df(ranks)
