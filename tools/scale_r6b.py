"""r6 late-session 10x stagings: the graph/sketch/text queries added
after scale_r6 ran, plus the new prefix-scan and overlap-matrix gates.

Same staging as tools/scale_r6.py (10 disjoint key-shifted replicas of
sf0.1), same warm best-of-3 protocol; appends its own section to
SCALE.md. Run: python tools/scale_r6b.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_r6 import SF, stage_10x  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402

REUSE_STAGED = "/tmp/scale_r6b_1jy98qr4"  # set to None to restage

QUERIES = (
    "graph_hits",
    "graph_kcore",
    "graph_communities",
    "text_keywords_tfidf",
    "text_collocations_pmi",
    "dedup_containment",
    "vector_meanpool_docs",
    "sketch_kmv_sliding",
    "sketch_overlap_matrix",
    "sketch_heavy_hitters_grouped",
    "sketch_f2_selfjoin",
    "q_bloom_semi_join",
    "q_drift_ks",
    "pipeline_dense_ids",
    "vector_silhouette",
)

HEADER = "### r6 late stagings (same 10x replicas; graph/text/sketch additions + prefix scan)"


def main() -> None:
    spark = build_session(
        "scale-r6b",
        master="local[32]",
        shuffle_partitions=32,
        **{
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.queries import QUERY_FNS

    import os

    if REUSE_STAGED and os.path.exists(
        f"{REUSE_STAGED}/sf10x/lineitem.parquet/_SUCCESS"
    ):
        big = f"{REUSE_STAGED}/sf10x"
    else:
        tmp = tempfile.mkdtemp(prefix="scale_r6b_")
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

    # knn_mutual_graph's GATE runs engine="sql" (the oracle-replayable
    # broadcast+window form) — at 10x (50k vectors = 2.5B candidate
    # pairs) that form DNFs (>10 min), which is exactly why the
    # operator defaults to engine="gemm"; stage the gemm path, the one
    # production runs.
    from wagtail_vector_index_spark.catalog import _t
    from wagtail_vector_index_spark.operators.knn import mutual_knn_graph

    def mutual_gemm(d):
        emb = _t(spark, d, "embeddings")
        return mutual_knn_graph(
            emb, id_col="vec_id", vec_col="embedding", k=5, engine="gemm"
        )

    mutual_gemm(SF).count()  # warm
    best = {}
    out = {}
    for tag, d in sf_dirs:
        times = []
        for _ in range(3):
            t0 = time.time()
            out[tag] = mutual_gemm(d).count()
            times.append(time.time() - t0)
        best[tag] = min(times)
    rows.append(
        f"| mutual_knn_graph[gemm] | {best['1x']:.2f}s | {out['1x']} | "
        f"{best['10x']:.2f}s | {out['10x']} | "
        f"{best['10x'] / max(best['1x'], 1e-9):.1f}x |"
    )
    print(rows[-1])

    lines = [
        "",
        HEADER,
        "",
        "Same 10x key-shifted staging as the r6 table above (the graph",
        "gates see 10 disjoint graph copies; tfidf/pmi/containment a 10x",
        "corpus; the scan/sketch gates 10x users+orders). Warm",
        "best-of-3. knn_mutual_graph is staged as its engine=\"gemm\"",
        "production form: the gate's engine=\"sql\" (oracle-replayable",
        "broadcast+window) form DNFs (>10 min) at 50k vectors / 2.5B",
        "candidate pairs — the measured reason gemm is the default.",
        "",
        "| query | 1x | 1x rows | 10x | 10x rows | time ratio |",
        "|---|---|---|---|---|---|",
        *rows,
    ]
    src = open("/root/repo/SCALE.md").read()
    if HEADER in src:
        head, rest = src.split(HEADER, 1)
        cuts = [i for i in (rest.find("\n## "), rest.find("\n### ")) if i != -1]
        src = head + (rest[min(cuts) + 1 :] if cuts else "")
        src = src.rstrip() + "\n"
    with open("/root/repo/SCALE.md", "w") as f:
        f.write(src.rstrip() + "\n" + "\n".join(lines) + "\n")
    print("wrote r6 late staging table to SCALE.md")


if __name__ == "__main__":
    main()
