"""Iterative graph analytics as DataFrame loops (EXT).

PageRank (Brin & Page 1998) joins :func:`~wagtail_vector_index_spark.
operators.dedup.connected_components` as the second iterative graph
operator: each round is two declarative stages (contribution join +
per-destination sum), so the whole computation is shuffle-on-node-key
work a cluster scales horizontally — no driver-side graph state, no
collect. Fixed iteration count keeps it exactly replayable by a chained
CTE oracle (the same technique as the Lloyd-training replay in
ann_recall_ivf_learned); per-round rounding (``round_decimals``) is the
cross-engine determinism pin for the order-dependent float sums.

Simplified update (dangling mass dropped, documented):
    pr_{i+1}(v) = (1 - d) / N + d * sum_{u->v} pr_i(u) / outdeg(u)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    round_decimals: int | None = None,
    checkpoint_edges: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, pr).

    Nodes are the union of sources and destinations; sink nodes (no
    out-edges) keep receiving rank but redistribute none (their mass
    decays — the simple variant, exactly what the oracle replays).

    Round structure (r5, measured best-of-5 at sf0.1: 6.1s -> 4.1s):

    - the edge frame is hash-partitioned by source ONCE and
      localCheckpointed; LogicalRDD preserves the HashPartitioning, so
      every round's contribution join shuffles only the (small) rank
      table to the edges' layout — the edge list, the 100 TB side,
      never moves again. (On a real cluster with unreliable executors,
      set a checkpoint dir and swap in ``checkpoint()``;
      ``checkpoint_edges=False`` restores the fully-lazy single-DAG
      form.) Per-round rank checkpoints were measured ~2x SLOWER
      (materialization jobs dominate these small frames) — rounds stay
      one lazy DAG.
    - out-degrees are folded into the partitioned edge frame up front,
      removing one join per round.
    - the node count is a driver scalar (one count job), removing the
      per-round broadcast crossJoin of a 1-row total.
    """
    d = float(damping)
    # Normalize the input to reserved internal names first: the caller's
    # edge frame may carry columns named node/pr/__deg (or dst='node'),
    # which would make the per-round joins ambiguous.
    edges = edges.select(
        F.col(src).alias("__e_src"), F.col(dst).alias("__e_dst")
    )
    if checkpoint_edges:
        edges = edges.repartition("__e_src").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("__e_src").alias("node"))
        .unionByName(edges.select(F.col("__e_dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("__e_src").agg(
        F.count(F.lit(1)).cast("double").alias("__deg")
    )
    edges = edges.join(outdeg, "__e_src")
    n = float(nodes.count())
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pr"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(int(iterations)):
        contrib = edges.join(
            ranks, edges["__e_src"] == ranks["node"]
        ).select(
            F.col("__e_dst").alias("node"),
            (F.col("pr") / F.col("__deg")).alias("__c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        pr = F.lit((1.0 - d) / n) + F.lit(d) * F.coalesce(
            F.col("__s"), F.lit(0.0)
        )
        if round_decimals is not None:
            pr = F.round(pr, round_decimals)
        ranks = nodes.join(summed, "node", "left").select(
            "node", pr.alias("pr")
        )
    return ranks
