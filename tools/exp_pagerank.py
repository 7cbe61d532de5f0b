"""Throwaway experiment: attribute graph_pagerank's 6.1s at sf0.1 and
pick the cheapest round structure. Compares the current single-DAG
formulation against (a) outdeg pre-folded into the edge frame, (b) a
scalar N collected once, (c) per-round localCheckpoint, in all
combinations that type-check. Prints warm steady-state times.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wagtail_vector_index_spark.session import build_session

SF = "/root/testdata/sf0.1"


def _edges(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )


def pr_current(spark):
    from wagtail_vector_index_spark.operators.graph import pagerank

    return pagerank(_edges(spark), iterations=5, damping=0.85,
                    round_decimals=10)


def pr_variant(spark, *, fold_deg, scalar_n, ckpt_every=0,
               cache_edges=False, part_edges=False):
    d = 0.85
    edges = _edges(spark).select(
        F.col("src").alias("__e_src"), F.col("dst").alias("__e_dst")
    )
    if part_edges:
        # hash-partition by the per-round join key ONCE; localCheckpoint
        # preserves the HashPartitioning (LogicalRDD keeps output
        # partitioning), so each round shuffles only the small ranks side
        edges = edges.repartition("__e_src").localCheckpoint(eager=True)
    elif cache_edges:
        edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("__e_src").alias("node"))
        .unionByName(edges.select(F.col("__e_dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("__e_src").agg(
        F.count(F.lit(1)).cast("double").alias("__deg")
    )
    if fold_deg:
        edges = edges.join(outdeg, "__e_src")
    if scalar_n:
        n = float(nodes.count())
        ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    else:
        total = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
        ranks = nodes.crossJoin(F.broadcast(total)).select(
            "node", (F.lit(1.0) / F.col("__n")).alias("pr")
        )
    for i in range(5):
        j = edges.join(ranks, edges["__e_src"] == ranks["node"])
        if not fold_deg:
            j = j.join(outdeg, "__e_src")
        contrib = j.select(
            F.col("__e_dst").alias("node"),
            (F.col("pr") / F.col("__deg")).alias("__c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        if scalar_n:
            pr = F.lit((1.0 - d) / n) + F.lit(d) * F.coalesce(
                F.col("__s"), F.lit(0.0)
            )
        else:
            pr = F.lit(1.0 - d) / F.col("__n") + F.lit(d) * F.coalesce(
                F.col("__s"), F.lit(0.0)
            )
        pr = F.round(pr, 10)
        ranks = nodes.join(summed, "node", "left")
        if not scalar_n:
            ranks = ranks.crossJoin(F.broadcast(total))
        ranks = ranks.select("node", pr.alias("pr"))
        if ckpt_every and (i + 1) % ckpt_every == 0 and i < 4:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def _time(name, fn, spark, reps=3):
    best = None
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn(spark).orderBy(F.col("pr").desc(), "node").limit(20).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: best {best:.2f}s  top1={out[0]['node']}:{out[0]['pr']:.8f}")
    return {r["node"]: round(r["pr"], 8) for r in out}


def main():
    spark = build_session(
        "exp-pagerank", master="local[32]", shuffle_partitions=32,
        **{"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = _time("current", pr_current, spark, reps=5)
    variants = {
        "fold_deg": dict(fold_deg=True, scalar_n=False),
        "fold+scalar+edges_ckpt": dict(fold_deg=True, scalar_n=True,
                                       cache_edges=True),
        "fold+scalar+edges_part": dict(fold_deg=True, scalar_n=True,
                                       part_edges=True),
        "fold+edges_part": dict(fold_deg=True, scalar_n=False,
                                part_edges=True),
    }
    for name, kw in variants.items():
        got = _time(name, lambda s, kw=kw: pr_variant(s, **kw), spark,
                    reps=5)
        if got != base:
            diff = {k: (base.get(k), got.get(k))
                    for k in set(base) | set(got)
                    if base.get(k) != got.get(k)}
            print(f"  !! MISMATCH vs current: {list(diff.items())[:3]}")


if __name__ == "__main__":
    main()
