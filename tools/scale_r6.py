"""r6 10x scale stagings: the round's reworked queries plus the
production (eval_exact=False) sketch forms.

Covers the r5-verdict staging gaps and stale rows:
- sketch_kmv_set_ops (rewritten as one kmv_overlap pass) — the kmv
  family had no staging;
- knn_jl_recall — its r5 row (5.54s) predates the broadcast-sign-matrix
  and single-pass-fold rewrites;
- vector_pca_top2 — landed after scale_r5 ran;
- production sketch forms (kmv_overlap / kmv_distinct / quantile_sketch
  with eval_exact=False) — the gated queries time the eval companions;
  this shows what the sketch alone costs.

Stages a temp sf-dir whose events/embeddings/orders/documents are 10
key-shifted replicas of sf0.1 (distinct users, vectors, orders and
docs all grow 10x), then times at both scales in one warm process.
Time ratio well under 10x = fixed per-stage overhead dominating at
sf0.1; ~10x = linear in input.

Run: python tools/scale_r6.py   (appends/refreshes the r6 section in
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
    "sketch_kmv_set_ops",
    "knn_jl_recall",
    "vector_pca_top2",
    "sketch_quantiles_price",
    "pipeline_perplexity_buckets",
    "dedup_substring_coverage",
    "sketch_heavy_hitters",
    "graph_triangles",
    "graph_pagerank_seeded",
    "q_event_paths",
    "q18_large_volume_customer",
    "sketch_quantiles_by_type",
)
SHIFTS = {
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    # l_partkey shifted too: the triangle gate's co-purchase graph
    # becomes 10 disjoint copies instead of one denser graph
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_suppkey": 1_000_000,
        "l_partkey": 1_000_000,
    },
}


def stage_10x(spark, tmp: str) -> str:
    from wagtail_vector_index_spark.catalog import _t

    out = f"{tmp}/sf10x"
    for table, shifts in SHIFTS.items():
        base = _t(spark, SF, table)
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


def prod_sketch_rows(spark, sf_dirs) -> list[str]:
    """Time the eval_exact=False production operator forms directly."""
    from wagtail_vector_index_spark.catalog import _t
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_distinct,
        kmv_overlap,
        quantile_sketch,
    )

    def forms(d):
        ev = _t(spark, d, "events").where(
            F.col("event_type").isin("view", "click")
        )
        orders = _t(spark, d, "orders")
        return {
            "kmv_overlap[prod]": lambda: kmv_overlap(
                ev,
                value_col="user_id",
                cond_a=F.col("event_type") == "view",
                cond_b=F.col("event_type") == "click",
                k=64,
                eval_exact=False,
            ),
            "kmv_distinct[prod]": lambda: kmv_distinct(
                _t(spark, d, "events"),
                group_cols=["event_type"],
                value_col="user_id",
                k=64,
                eval_exact=False,
            ),
            "quantile_sketch[prod]": lambda: quantile_sketch(
                orders,
                key_col="o_orderkey",
                value_col="o_totalprice",
                quantiles=(0.5, 0.9, 0.99),
                k=512,
                eval_exact=False,
            ),
        }

    names = list(forms(SF))
    # warm
    for n in names:
        forms(SF)[n]().collect()
    rows = []
    for n in names:
        best = {}
        cnt = {}
        for tag, d in sf_dirs:
            times = []
            for _ in range(3):
                t0 = time.time()
                cnt[tag] = len(forms(d)[n]().collect())
                times.append(time.time() - t0)
            best[tag] = min(times)
        rows.append(
            f"| {n} | {best['1x']:.2f}s | {cnt['1x']} | "
            f"{best['10x']:.2f}s | {cnt['10x']} | "
            f"{best['10x'] / max(best['1x'], 1e-9):.1f}x |"
        )
        print(rows[-1])
    return rows


def main() -> None:
    spark = build_session(
        "scale-r6",
        master="local[32]",
        shuffle_partitions=32,
        **{
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.queries import QUERY_FNS

    tmp = tempfile.mkdtemp(prefix="scale_r6_")
    big = stage_10x(spark, tmp)
    sf_dirs = (("1x", SF), ("10x", big))

    for name in QUERIES:
        QUERY_FNS[name](spark, SF).collect()  # warm codegen/JIT

    rows = []
    for name in QUERIES:
        best = {}
        out = {}
        for tag, d in sf_dirs:
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
    rows += prod_sketch_rows(spark, sf_dirs)

    lines = [
        "",
        "### r6 10x stagings (key-shifted replicas; reworked queries + production sketch forms)",
        "",
        "10 disjoint key-shifted replicas of sf0.1 events/embeddings/",
        "orders/documents/lineitem (tools/scale_r6.py): kmv/heavy-",
        "hitters/event-paths see 10x users+events, JL/PCA a 10x",
        "candidate set, quantiles/q18 a 10x order stream, perplexity/",
        "substring a 10x corpus, triangles/seeded-pagerank 10 disjoint",
        "graph copies. Warm best-of-3. [prod] rows time the",
        "eval_exact=False operator forms directly (the gated queries",
        "carry the exact-eval companions; these are what production",
        "pays).",
        "",
        "| query | 1x | 1x rows | 10x | 10x rows | time ratio |",
        "|---|---|---|---|---|---|",
        *rows,
    ]
    src = open("/root/repo/SCALE.md").read()
    header = "### r6 10x stagings (key-shifted replicas; reworked queries + production sketch forms)"
    if header in src:
        head, rest = src.split(header, 1)
        cuts = [i for i in (rest.find("\n## "), rest.find("\n### ")) if i != -1]
        src = head + (rest[min(cuts) + 1:] if cuts else "")
        src = src.rstrip() + "\n"
    with open("/root/repo/SCALE.md", "w") as f:
        f.write(src.rstrip() + "\n" + "\n".join(lines) + "\n")
    print("wrote r6 staging table to SCALE.md")


if __name__ == "__main__":
    main()
