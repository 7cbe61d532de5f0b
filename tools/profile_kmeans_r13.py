"""Phase-level timing of train_codebook's Lloyd rounds (r13 item 1).

Reproduces the ann_recall_ivf_learned gate's training input (planted
index at sf0.1), then times each per-round phase separately so the
optimization attacks the measured cost, not the assumed one:
  - mat_build: spark.createDataFrame of the broadcast codebook matrix
  - plan_build: constructing the assignment + aggregation Column tree
  - collect: the per-round action (broadcast job + main job)
Prints one JSON line per run plus a phase summary.
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
    # force the checkpoint materialization outside the timed region
    n = index.count()
    dim = len(index.select("vector").first()[0])
    print(f"index rows={n} dim={dim}", flush=True)

    k, iterations = 40, 5

    def timed_train() -> dict:
        phases = {"init": 0.0, "mat_build": 0.0, "plan_build": 0.0,
                  "collect": 0.0}
        t0 = time.time()
        init = (
            index.orderBy(F.col("vec_id").asc())
            .limit(k).select("vector").collect()
        )
        centroids = [(i, [float(x) for x in r[0]]) for i, r in enumerate(init)]
        phases["init"] = time.time() - t0
        for _ in range(iterations):
            t0 = time.time()
            # reproduce _assign's mat build alone
            ordered = sorted(centroids, key=lambda c: c[0])
            mat = spark.createDataFrame(
                [(
                    [int(cid) for cid, _ in ordered],
                    [[float(x) for x in cv] for _, cv in ordered],
                )],
                "__cids array<int>, __cvm array<array<double>>",
            )
            phases["mat_build"] += time.time() - t0

            t0 = time.time()
            assigned = kmeans._assign(index, centroids, vec_col="vector")
            mean_val = F.round(F.avg("col"), 6)
            per_pos = (
                assigned.select("cid", F.posexplode(F.col("vector")))
                .groupBy("cid", "pos")
                .agg(mean_val.alias("mean_val"))
            )
            new_frame = (
                per_pos.groupBy("cid")
                .agg(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct(F.col("pos"), F.col("mean_val"))
                            )
                        ),
                        lambda s: s["mean_val"],
                    ).alias("cv")
                )
            )
            phases["plan_build"] += time.time() - t0

            t0 = time.time()
            new_rows = new_frame.collect()
            phases["collect"] += time.time() - t0

            updated = {r["cid"]: [float(x) for x in r["cv"]] for r in new_rows}
            centroids = [(cid, updated.get(cid, cv)) for cid, cv in centroids]
        return phases

    for run in range(3):
        t0 = time.time()
        phases = timed_train()
        total = time.time() - t0
        print(json.dumps({"run": run, "total_s": round(total, 3),
                          **{p: round(v, 3) for p, v in phases.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
