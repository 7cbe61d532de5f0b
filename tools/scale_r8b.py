"""Late-r8 10x stagings: the two hygiene gates added after scale_r8 ran.

Same replicas and protocol as tools/scale_r8.py. Both gates multiply
PLANTED overlap at 10x: replicas keep text identical, so
pipeline_ngram_collision's train-side collisions grow ~10x (eval
distinct grams are unchanged), and pipeline_split_leakage's pair set is
replica-multiplied (~100x: every cross-replica copy of a doc is a
jaccard-1.0 pair) — read those ratios as planted-duplicate
multiplication, not organic growth.

Run: python tools/scale_r8b.py [staged_sf10x_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_r6 import SF, stage_10x  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402

QUERIES = ("pipeline_ngram_collision", "pipeline_split_leakage")

HEADER = "### r8 late stagings (same 10x replicas; post-scale_r8 additions)"


def main() -> None:
    spark = build_session(
        "scale-r8b",
        master="local[32]",
        shuffle_partitions=32,
        **{
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.queries import QUERY_FNS

    big = (
        sys.argv[1]
        if len(sys.argv) > 1
        else stage_10x(spark, tempfile.mkdtemp(prefix="scale_r8b_"))
    )
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

    for name in QUERIES:
        QUERY_FNS[name](spark, SF).collect()  # warm

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

    lines = [
        "",
        HEADER,
        "",
        "Same replicas and protocol as the r8 table above. Replicas keep",
        "text identical, so both gates' 10x multiplies PLANTED overlap:",
        "collision counts grow ~10x on the train side (eval distinct",
        "grams unchanged); leakage pairs are replica-multiplied (~100x",
        "jaccard-1.0 cross-copies) — pair-work-proportional, not organic.",
        "",
        "| query | 1x | 1x rows | 10x | 10x rows | time ratio |",
        "|---|---|---|---|---|---|",
        *rows,
    ]
    with open("/root/repo/SCALE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("SCALE.md updated (r8 late section appended)")


if __name__ == "__main__":
    main()
