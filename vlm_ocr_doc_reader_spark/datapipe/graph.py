"""Graph centrality over corpus-derived link graphs: PageRank.

Web-scale curation weighs documents by the link structure they sit in
(Common-Crawl-style harmonic/PageRank source scoring feeds quality
filters and sampling weights), and event logs induce referral graphs
with the same need.  Input here is any (src, dst) edge DataFrame — the
package's own tables yield one from, e.g., document near-dup pairs or
per-user event-type transitions.

Algorithm: standard power iteration, rank' = (1-d)/N + d * (in-sum of
rank/out_degree + dangling_mass/N), a fixed number of rounds (the usual
production choice — convergence-delta stopping adds a per-round driver
count for little benefit at d=0.85, where ~20 rounds give 1e-4).

Scale shape (the GraphX/Pregel dataflow, declaratively): out-degrees
are one hash aggregate; each round is ONE equi-join of the rank frame
to the edge list on src (both sides pre-partitioned on the join key —
``edges`` is persisted once, reused every round) + one hash aggregate
on dst; the dangling-mass correction is a 1-row aggregate broadcast
back (never a collect).  The rank frame is localCheckpoint'ed per round
to cut iterative lineage (same pattern as ``dedup.connected_components``;
a real cluster swaps in a DFS checkpoint).  Nothing row-sized reaches
the driver.

Determinism: per-round float sums over a node's in-neighbors are
order-dependent in the last ulp, so ranks are NOT value-hash gated
(iterative float fixpoints are the documented rows-only class, like the
reference's model channel); tests pin values against a dense NumPy
power iteration to 1e-9 and assert exact rank-ordering stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 15, damping: float = 0.85) -> DataFrame:
    """PageRank over a directed edge list.

    Output: (id, rank) for every node appearing as src or dst; ranks
    sum to 1.  Duplicate edges are collapsed (simple-graph semantics);
    self-loops count like any edge.  Dangling nodes (no out-edges)
    spread their mass uniformly — the standard correction, keeping the
    distribution stochastic.
    """
    if iterations < 1:
        raise ValueError("pagerank: need iterations >= 1")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         .persist())
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct())
    deg = e.groupBy(F.col("src").alias("id")) \
           .agg(F.count("*").alias("out_deg"))
    # static per-node frame: out_deg = 0 marks dangling
    base = (nodes.join(deg, "id", "left")
            .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
            .persist())
    n_total = base.agg(F.count("*").alias("n"))  # 1-row, broadcast below
    ranks = (base.crossJoin(F.broadcast(n_total))
             .select("id", "out_deg", (F.lit(1.0) / F.col("n")).alias("rank"))
             .localCheckpoint())
    for _ in range(iterations):
        contrib = (e.join(ranks.filter(F.col("out_deg") > 0)
                          .select(F.col("id").alias("src"),
                                  (F.col("rank") / F.col("out_deg"))
                                  .alias("share")), "src")
                   .groupBy(F.col("dst").alias("id"))
                   .agg(F.sum("share").alias("in_sum")))
        dangling = (ranks.filter(F.col("out_deg") == 0)
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("d_mass")))
        ranks = (base
                 .join(contrib, "id", "left")
                 .crossJoin(F.broadcast(n_total))
                 .crossJoin(F.broadcast(dangling))
                 .select(
                     "id", "out_deg",
                     ((1.0 - damping) / F.col("n")
                      + damping * (F.coalesce("in_sum", F.lit(0.0))
                                   + F.col("d_mass") / F.col("n")))
                     .alias("rank"))
                 .localCheckpoint())
    out = ranks.select("id", F.round("rank", 9).alias("rank"))
    e.unpersist()
    base.unpersist()
    return out
