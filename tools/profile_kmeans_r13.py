"""Phase-level timing of train_codebook's Lloyd rounds (r13 item 1).

Reproduces the ann_recall_ivf_learned gate's training input (planted
index at sf0.1). Two modes:

- the original phase split that motivated the rewrite (2026-08-18, at
  8fde3f5): init 0.06 / mat_build 0.12 / plan_build 1.10 / collect 3.69
  (warm, 5 rounds) — per-round Python Column-tree construction plus the
  posexplode double-aggregation action dominated, while the data is only
  |index| x dim doubles.
- after the rewrite this script times the REAL train_codebook (the old
  phase reproduction no longer matches the internals) plus a one-round
  phase split of the new shape (mat frame build / plan analysis /
  execution) so the remaining floor is attributable.

Run: python tools/profile_kmeans_r13.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-kmeans-r13")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wagtail_vector_index_spark.catalog import _t
    from wagtail_vector_index_spark.operators import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    planted = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x, i: x
        + F.when(i == F.col("label"), F.lit(2.0)).otherwise(F.lit(0.0)),
    )
    vecs = emb.select("vec_id", planted.alias("vector"))
    index = (
        vecs.where(F.col("vec_id") >= 16)
        .repartition(spark.sparkContext.defaultParallelism, F.col("vec_id"))
        .localCheckpoint(eager=False)
    )
    n = index.count()
    dim = len(index.select("vector").first()[0])
    print(f"index rows={n} dim={dim}", flush=True)

    k, iterations = 40, 5
    for run in range(3):
        spark.sparkContext.setJobDescription(f"train_codebook run={run}")
        t0 = time.time()
        cents, _ = kmeans.train_codebook(
            index, k=k, iterations=iterations, round_decimals=6
        )
        print(
            json.dumps({"run": run, "train_s": round(time.time() - t0, 3)}),
            flush=True,
        )
    spark.sparkContext.setJobDescription(None)

    # one-round phase split of the current shape
    exprs = kmeans._assign_exprs(index.columns, "vector")
    mean_cols = [
        F.round(F.avg(F.element_at(F.col("vector"), i + 1)), 6).alias(
            f"m{i}"
        )
        for i in range(dim)
    ]
    t0 = time.time()
    mat = kmeans._mat_frame(spark, cents)
    t1 = time.time()
    plan = kmeans._assign_with_exprs(index, mat, exprs).groupBy("cid").agg(
        *mean_cols
    )
    t2 = time.time()
    plan._jdf.queryExecution().executedPlan()
    t3 = time.time()
    plan.collect()
    t4 = time.time()
    print(
        json.dumps(
            {
                "round_phase": {
                    "mat_frame": round(t1 - t0, 3),
                    "tree_build": round(t2 - t1, 3),
                    "analyze": round(t3 - t2, 3),
                    "execute": round(t4 - t3, 3),
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
