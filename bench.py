"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

The headline set covers every operator class the engine claims: TPC-H-ish
aggregation + joins, window top-k, the batch vector similarity join, the
GEMM top-k path, minhash-LSH dedup, and the end-to-end semantic-search
pipeline.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wvi-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wagtail_vector_index_spark.catalog import _t
    from wagtail_vector_index_spark.operators.knn import gemm_topk_join
    from wagtail_vector_index_spark.queries import QUERY_FNS

    # warm the JVM + python workers once (not counted)
    _t(spark, sf_dir, "lineitem").select(F.sum("l_quantity")).collect()

    headline = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "q_window_top_orders",
        "q_events_hourly",
        "q_distinct_agg",
        "knn_cosine",
        "similarity_join_topk",
        "embedding_neardup",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_components",
        "search_hash_knn",
        "text_quality",
        "multimodal_decode_meta",
        "ann_ivf_cosine",
        "q_sessionize",
    ]

    # steady-state timing: best of 3 runs per query — the first execution
    # (or two, for queries with large unrolled codegen like simhash) pays
    # one-time whole-stage-codegen compilation and JVM JIT warmup, which
    # amortizes away on a long-running cluster
    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(3):
            # fresh intermediate state each run: only codegen/JIT warmup may
            # carry over, not cached operator intermediates
            spark.catalog.clearCache()
            t0 = time.time()
            QUERY_FNS[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # GEMM similarity join: all embeddings as probes against themselves —
    # the 100 TB-shaped ANN path (per-partition BLAS + windowed merge).
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    )
    index = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("vector"))
    t0 = time.time()
    gemm_topk_join(probes, index, index_id="vec_id", index_vec="vector", limit=10).collect()
    timings["gemm_allpairs_topk"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
