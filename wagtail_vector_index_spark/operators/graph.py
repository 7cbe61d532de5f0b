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
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, pr).

    Nodes are the union of sources and destinations; sink nodes (no
    out-edges) keep receiving rank but redistribute none (their mass
    decays — the simple variant, exactly what the oracle replays).
    """
    d = float(damping)
    # Normalize the input to reserved internal names first: the caller's
    # edge frame may carry columns named node/pr/__deg (or dst='node'),
    # which would make the per-round joins ambiguous.
    edges = edges.select(
        F.col(src).alias("__e_src"), F.col(dst).alias("__e_dst")
    )
    # No cache barrier: the edge-join subtree appears once per round in
    # the final DAG, but Catalyst's ReusedExchange dedups the identical
    # exchanges so it executes once — and an InMemoryRelation here was
    # measured SLOWER (it pins 32-partition layouts that AQE would
    # otherwise coalesce for the small per-round frames).
    nodes = (
        edges.select(F.col("__e_src").alias("node"))
        .unionByName(edges.select(F.col("__e_dst").alias("node")))
        .distinct()
    )
    total = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    outdeg = edges.groupBy("__e_src").agg(
        F.count(F.lit(1)).cast("double").alias("__deg")
    )
    ranks = nodes.crossJoin(F.broadcast(total)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("pr")
    )
    for _ in range(int(iterations)):
        contrib = (
            edges.join(ranks, edges["__e_src"] == ranks["node"])
            .join(outdeg, "__e_src")
            .select(
                F.col("__e_dst").alias("node"),
                (F.col("pr") / F.col("__deg")).alias("__c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        pr = F.lit(1.0 - d) / F.col("__n") + F.lit(d) * F.coalesce(
            F.col("__s"), F.lit(0.0)
        )
        if round_decimals is not None:
            pr = F.round(pr, round_decimals)
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(total))
            .select("node", pr.alias("pr"))
        )
    return ranks
