"""r13 core-scaling staging: prove the heavy operators scale with cores.

The driver's 8-vs-32-core bench comparison at sf0.1 reads ~1.0 for every
query (PERF_r12 `suspect_cpus_ignored`): at that scale the rows are
fixed-overhead / single-task dominated, so the ratio cannot show
parallel scaling even though bench.py honors $SPARK_GRAFT_CPUS. This
staging sizes the CORPUS so the map stages carry real CPU (>= 10s) and
re-runs the same declared queries at 8 and 32 cores in fresh JVMs.

Corpus: sf0.1 documents replicated 10x with doc ids shifted and every
token suffixed with a per-copy tag (tokenization is lowercase
whitespace split, so the tag rides inside each token) — within-copy
duplicate/shingle structure is preserved exactly while cross-copy
n-gram overlap is zero, so pair counts grow linearly, never K^2.
Embeddings are replicated 3x with vec_id shifts and a PER-COPY RANDOM
SIGN-FLIP pattern (xxhash64(copy, i) parity per coordinate): negation
is exact in IEEE floats and both vectors of a within-copy pair carry
the same pattern, so within-copy cosines are BIT-IDENTICAL to the
original corpus, while cross-copy patterns differ in ~half the
coordinates and cross cosines land near 0 (<< the 0.3 eps) — the
density structure replicates instead of collapsing into one
coordinate-dominated blob (which a +offset scheme would cause under
cosine). 3x not 10x because the blocked-GEMM neighbor stage is
inherently quadratic in corpus size: 9x GEMM work is exactly the
>=10s-of-CPU map stage the staging needs, 100x would be minutes.

Usage:
  python tools/scale_cores.py prep            # write the scaled corpus
  python tools/scale_cores.py run --cpus 8    # one timing pass
  python tools/scale_cores.py run --cpus 32
  python tools/scale_cores.py kcore           # broadcast-vs-SMJ cell
  python tools/scale_cores.py compare         # prep + both runs + ratio

Timed action is the noop sink (guide §1.4); jobs are labeled.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = "/tmp/r13_scale_cores"
SF_SRC = "/root/testdata/sf0.1"
COPIES = 10      # documents (linear pair growth by construction)
COPIES_EMB = 3   # embeddings (GEMM stage is quadratic: 3x -> 9x CPU)
QUERIES = [
    "dedup_components",
    "pipeline_dup_aware_weights",
    "dedup_lsh_precision",
    "text_lang_id_ngram",
    "vector_dbscan",
]


def _session(cpus: int, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def prep() -> None:
    from pyspark.sql import functions as F

    spark = _session(32, "r13-scale-prep")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DATA_DIR, exist_ok=True)

    docs = spark.read.parquet(f"{SF_SRC}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("__copy"))
    scaled = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("__copy") * F.lit(max_id)).alias(
                "doc_id"
            ),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(
                        t, F.lit("x"), F.col("__copy").cast("string")
                    ),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    scaled.repartition(32).write.mode("overwrite").parquet(
        f"{DATA_DIR}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SF_SRC}/embeddings.parquet")
    max_vid = emb.agg(F.max("vec_id")).first()[0] + 1
    ecopies = spark.range(COPIES_EMB).select(F.col("id").alias("__copy"))
    # per-copy random sign flips: exact under IEEE negation, cosine
    # within a copy bit-identical, cross-copy cosines ~0 (see module
    # docstring)
    sign = lambda x, i: x * (  # noqa: E731
        F.lit(1.0)
        - F.lit(2.0) * F.pmod(F.xxhash64(F.col("__copy"), i), F.lit(2))
    ).cast("float")
    scaled_e = (
        emb.crossJoin(ecopies)
        .select(
            (F.col("vec_id") + F.col("__copy") * F.lit(max_vid)).alias(
                "vec_id"
            ),
            F.transform(F.col("embedding"), sign).alias("embedding"),
            "label",
        )
    )
    scaled_e.repartition(32).write.mode("overwrite").parquet(
        f"{DATA_DIR}/embeddings.parquet"
    )
    nd = spark.read.parquet(f"{DATA_DIR}/documents.parquet").count()
    ne = spark.read.parquet(f"{DATA_DIR}/embeddings.parquet").count()
    print(json.dumps({"prep": True, "docs": nd, "embeddings": ne}))
    spark.stop()


def run(cpus: int, runs: int = 2) -> None:
    spark = _session(cpus, f"r13-scale-cores-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.queries import QUERY_FNS

    out: dict[str, float] = {}
    for name in QUERIES:
        walls = []
        for i in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(
                f"scale-cores {name} cpus={cpus} run={i}"
            )
            t0 = time.time()
            QUERY_FNS[name](spark, DATA_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(min(walls), 3)
        print(f"  {name} cpus={cpus}: {['%.2f' % w for w in walls]}",
              file=sys.stderr, flush=True)
    print(json.dumps({"cpus": cpus, "queries": out}))
    spark.stop()


def kcore_cell() -> None:
    """Broadcast-vs-SMJ kcore at a scale where the edge frame dominates:
    a deterministic 8M-edge multigraph over 200k nodes (edge u->v with
    v = (u * stride + j) % n), k-core peel for 6 rounds. The node set
    (200k longs) is trivially broadcast-sized; the edge frame is ~40x
    larger and is what the SMJ shape sorts/shuffles per round."""
    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.operators.graph import kcore

    spark = _session(32, "r13-kcore-cell")
    spark.sparkContext.setLogLevel("ERROR")
    n_nodes, deg = 200_000, 40
    base = spark.range(n_nodes * deg).select(
        (F.col("id") % n_nodes).alias("src"),
        (
            (F.col("id") % n_nodes)
            + (F.col("id") / F.lit(n_nodes)).cast("long") * 17
            + 1
        ).alias("dst"),
    ).select("src", (F.col("dst") % n_nodes).alias("dst"))
    edges = base.repartition(32).localCheckpoint(eager=True)
    out = {}
    for flag in (False, True):
        walls = []
        for i in range(2):
            spark.sparkContext.setJobDescription(
                f"kcore broadcast_filter={flag} run={i}"
            )
            t0 = time.time()
            kcore(
                edges, k=deg, rounds=6, broadcast_filter=flag
            ).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        out[f"broadcast_{flag}"] = round(min(walls), 3)
        print(f"  kcore broadcast={flag}: {['%.2f' % w for w in walls]}",
              file=sys.stderr, flush=True)
    out["speedup"] = round(out["broadcast_False"] / out["broadcast_True"], 2)
    print(json.dumps({"cell": "kcore_broadcast", **out}))
    spark.stop()


def compare() -> None:
    me = os.path.abspath(__file__)
    if not os.path.exists(f"{DATA_DIR}/documents.parquet"):
        subprocess.run([sys.executable, me, "prep"], check=True)
    results = {}
    for cpus in (32, 8):
        p = subprocess.run(
            [sys.executable, me, "run", "--cpus", str(cpus)],
            check=True, capture_output=True, text=True,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)["queries"]
        print(line)
    ratios = {
        q: round(results[8][q] / results[32][q], 2) for q in results[32]
    }
    print(json.dumps({"cell": "cores_8_vs_32", "ratio_8_over_32": ratios}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["prep", "run", "kcore", "compare"])
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    if args.mode == "prep":
        prep()
    elif args.mode == "run":
        run(args.cpus)
    elif args.mode == "kcore":
        kcore_cell()
    else:
        compare()
