"""Ad-hoc subset bench: time named catalog queries (and their DuckDB
oracles, same session) with the exact spark config bench.py uses — for
profiling individual plans between full bench runs.

Usage: python tools/bench_subset.py q1 q2 ...   [env: SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "5"))

    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wvi-spark-bench-subset")
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
    from wagtail_vector_index_spark.queries import ORACLE, QUERY_FNS

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    _t(spark, sf_dir, "lineitem").select(F.sum("l_quantity")).collect()

    out = {}
    for name in names:
        cold, rs = None, []
        for i in range(1 + runs):
            spark.catalog.clearCache()
            t0 = time.time()
            QUERY_FNS[name](spark, sf_dir).collect()
            el = time.time() - t0
            if i == 0:
                cold = el
            else:
                rs.append(el)
        rec = {
            "median_s": round(statistics.median(rs), 3),
            "cold_s": round(cold, 3),
            "all": [round(x, 3) for x in rs],
        }
        if name in ORACLE:
            d = []
            for _ in range(3):
                t0 = time.time()
                con.execute(ORACLE[name]).fetchall()
                d.append(time.time() - t0)
            rec["duckdb_s"] = round(statistics.median(d), 3)
            if rec["duckdb_s"] > 0:
                rec["ratio"] = round(rec["median_s"] / rec["duckdb_s"], 2)
        out[name] = rec
        print(json.dumps({name: rec}, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
