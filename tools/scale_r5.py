"""10x scale stagings for the four r4-verdict queries that lacked one:
graph_pagerank, pipeline_dsir_select, sketch_countmin_tokens,
knn_matryoshka_recall.

Stages a temp sf-dir whose documents/embeddings/lineitem/orders are 10
key-shifted replicas of sf0.1 (node/doc/vec id spaces grow 10x, so
pagerank gets 10x nodes AND edges, dsir/countmin get a 10x token
stream, matryoshka a 10x candidate set), then times the EXACT catalog
query functions at both scales in one warm process. Time ratio well
under 10x = fixed per-stage overhead dominating at sf0.1 — the shape
that keeps amortizing; ~10x = linear in input, the expected slope for
scan-bound work.

Run: python tools/scale_r5.py   (appends/refreshes the r5 section in
/root/repo/SCALE.md)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"
QUERIES = (
    "graph_pagerank",
    "graph_pagerank_dangling",
    "pipeline_dsir_select",
    "sketch_countmin_tokens",
    "knn_matryoshka_recall",
    "knn_jl_recall",
    "sketch_quantiles_price",
    "pipeline_weighted_sample",
    "vector_pca_power",
)
# id columns to shift per replica so the replicas are disjoint; every
# other column is carried verbatim. replica 0 keeps original ids (the
# matryoshka probe vec_id=0 stays unique).
SHIFTS = {
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_suppkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
}


def stage_10x(spark, tmp: str) -> str:
    out = f"{tmp}/sf10x"
    for table, shifts in SHIFTS.items():
        base = spark.read.parquet(f"{SF}/{table}.parquet")
        parts = []
        for i in range(10):
            rep = base
            for col, step in shifts.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(rep)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    return out


def main() -> None:
    spark = build_session(
        "scale-r5",
        master="local[32]",
        shuffle_partitions=32,
        **{
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.queries import QUERY_FNS

    tmp = tempfile.mkdtemp(prefix="scale_r5_")
    big = stage_10x(spark, tmp)

    # warm codegen/JIT at the small scale before timing anything
    for name in QUERIES:
        QUERY_FNS[name](spark, SF).collect()

    rows = []
    for name in QUERIES:
        best = {}
        out = {}
        for tag, d in (("1x", SF), ("10x", big)):
            times = []
            for _ in range(3):
                t0 = time.time()
                out[tag] = len(QUERY_FNS[name](spark, d).collect())
                times.append(time.time() - t0)
            best[tag] = min(times)
        rows.append(
            f"| {name} | {best['1x']:.2f}s | {out['1x']} | "
            f"{best['10x']:.2f}s | {out['10x']} | "
            f"{best['10x'] / max(best['1x'], 1e-9):.1f}x |"
        )
        print(rows[-1])

    lines = [
        "",
        "### r5 10x stagings (key-shifted replicas, exact catalog queries)",
        "",
        "10 disjoint key-shifted replicas of sf0.1 documents/embeddings/",
        "lineitem/orders (tools/scale_r5.py): pagerank sees 10x nodes and",
        "edges, dsir/countmin a 10x token stream, matryoshka a 10x",
        "candidate set. Warm best-of-3, the EXACT gated query functions:",
        "",
        "| query | 1x | 1x rows | 10x | 10x rows | time ratio |",
        "|---|---|---|---|---|---|",
        *rows,
    ]
    src = open("/root/repo/SCALE.md").read()
    header = "### r5 10x stagings (key-shifted replicas, exact catalog queries)"
    if header in src:
        head, rest = src.split(header, 1)
        cuts = [i for i in (rest.find("\n## "), rest.find("\n### ")) if i != -1]
        src = head + (rest[min(cuts) + 1:] if cuts else "")
        src = src.rstrip() + "\n"
    with open("/root/repo/SCALE.md", "w") as f:
        f.write(src.rstrip() + "\n" + "\n".join(lines) + "\n")
    print("wrote r5 staging table to SCALE.md")


if __name__ == "__main__":
    main()
