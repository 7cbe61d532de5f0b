"""r7 10x scale stagings: the round's reworked plans and new operators.

Reworked: knn_mutual_graph (gate now runs the gemm path),
embedding_neardup_lsh (streamed_group_apply verify + block-fanout
shortcut), knn_jl_recall (single linear plan), graph_hits
(broadcast_scores + numeric keys), plus a DIRECT staging of
hard_negative_topk engine="block" (the no-driver-collect path the r6
verdict asked for).

New: pipeline_line_dedup, vector_dbscan, q_drift_psi,
q_trend_regression, q_key_skew_gini, pipeline_token_budget,
er_match_scores (ADVERSARIAL: un-shifted c_name blocks make every
block 10x oversized => ~100x pair work; read as corrupt-blocking-key
behavior, not organic growth), vector_standardize, ann_mrr,
q_profile_columns, text_tokenizer_fertility.

Same staging as tools/scale_r6.py (10 disjoint key-shifted replicas of
sf0.1), warm best-of-3; rewrites the r7 section of SCALE.md.
Run: python tools/scale_r7.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_r6 import SF, stage_10x  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402

REUSE_STAGED = "/tmp/scale_r7_dj6x0i82/sf10x"  # or None to restage

QUERIES = (
    "knn_mutual_graph",
    "embedding_neardup_lsh",
    "knn_jl_recall",
    "graph_hits",
    "knn_hard_negatives",
    "pipeline_line_dedup",
    "vector_dbscan",
    "q_drift_psi",
    "q_trend_regression",
    "q_key_skew_gini",
    "pipeline_token_budget",
    "er_match_scores",
    "vector_standardize",
    "ann_mrr",
    "q_profile_columns",
    "text_tokenizer_fertility",
)

HEADER = "### r7 10x stagings (key-shifted replicas; reworked plans + new operators)"


def blocked_hardneg_rows(spark, sf_dirs) -> list[str]:
    """Direct timing of hard_negative_topk engine='block' — the
    corpus-as-anchors path with NO driver collect."""
    from wagtail_vector_index_spark.catalog import _t
    from wagtail_vector_index_spark.operators.knn import hard_negative_topk

    rows = []
    best, cnt = {}, {}
    for tag, d in sf_dirs:
        emb = _t(spark, d, "embeddings").select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        times = []
        for _ in range(3):
            t0 = time.time()
            cnt[tag] = hard_negative_topk(
                emb, id_col="vec_id", vec_col="v", label_col="label",
                limit=1, engine="block", blocks=8,
            ).count()
            times.append(time.time() - t0)
        best[tag] = min(times)
    rows.append(
        f"| hard_negative_topk[block] | {best['1x']:.2f}s | {cnt['1x']} | "
        f"{best['10x']:.2f}s | {cnt['10x']} | "
        f"{best['10x'] / max(best['1x'], 1e-9):.1f}x |"
    )
    print(rows[-1])
    return rows


def main() -> None:
    spark = build_session(
        "scale-r7",
        master="local[32]",
        shuffle_partitions=32,
        **{
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.queries import QUERY_FNS

    big = REUSE_STAGED or stage_10x(
        spark, tempfile.mkdtemp(prefix="scale_r7_")
    )
    # dimension tables stage_10x doesn't shift: 1x copies (they are
    # genuinely dimension-sized — nation/region never grow 10x)
    import os
    import shutil

    for t in ("nation", "region", "supplier", "part"):
        dst = f"{big}/{t}.parquet"
        if not os.path.exists(dst):
            src_path = f"{SF}/{t}.parquet"
            if os.path.isdir(src_path):
                shutil.copytree(src_path, dst)
            else:
                shutil.copy(src_path, dst)
    sf_dirs = (("1x", SF), ("10x", big))
    print(f"staged 10x at {big}")

    for name in QUERIES:
        QUERY_FNS[name](spark, SF).collect()  # warm codegen/JIT

    rows = []
    for name in QUERIES:
        best, out = {}, {}
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
    rows += blocked_hardneg_rows(spark, sf_dirs)

    lines = [
        "",
        HEADER,
        "",
        "10 disjoint key-shifted replicas of sf0.1 (tools/scale_r7.py,",
        "staging from tools/scale_r6.py). Warm best-of-3. er_match_scores",
        "keeps un-shifted c_name blocks, so its 10x is ADVERSARIAL (every",
        "block 10x oversized => ~100x pair work) — corrupt-blocking-key",
        "behavior, not organic growth. hard_negative_topk[block] times",
        "the engine='block' operator directly (hash-block pair GEMM, no",
        "driver collect — the corpus-as-anchors 100 TB path).",
        "",
        "| query | 1x | 1x rows | 10x | 10x rows | time ratio |",
        "|---|---|---|---|---|---|",
        *rows,
    ]
    src = open("/root/repo/SCALE.md").read()
    if HEADER in src:
        head, rest = src.split(HEADER, 1)
        cuts = [i for i in (rest.find("\n## "), rest.find("\n### ")) if i != -1]
        src = head + (rest[min(cuts) + 1:] if cuts else "")
        src = src.rstrip() + "\n"
    with open("/root/repo/SCALE.md", "w") as f:
        f.write(src.rstrip() + "\n" + "\n".join(lines) + "\n")
    print("wrote r7 staging table to SCALE.md")


if __name__ == "__main__":
    main()
