"""r7 late stagings: the five queries added after tools/scale_r7.py ran.

Same 10x staging (reuses scale_r7's staged dir when present, else
restages via scale_r6.stage_10x + dimension-table copies), warm
best-of-3; appends its own subsection under the r7 SCALE.md section.
er-family caveat does not apply here. Run: python tools/scale_r7b.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_r6 import SF, stage_10x  # noqa: E402
from scale_r7 import REUSE_STAGED  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402

QUERIES = (
    "dedup_lsh_precision",
    "q_watermark_lateness",
    "vector_centroid_drift",
    "ann_posting_stats",
    "pipeline_contamination_report",
)

HEADER = "### r7 late stagings (same 10x replicas; post-scale_r7 additions)"


def main() -> None:
    spark = build_session(
        "scale-r7b",
        master="local[32]",
        shuffle_partitions=32,
        **{
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.queries import QUERY_FNS

    big = REUSE_STAGED
    if not big or not os.path.isdir(big):
        big = stage_10x(spark, tempfile.mkdtemp(prefix="scale_r7b_"))
    for t in ("nation", "region", "supplier", "part"):
        dst = f"{big}/{t}.parquet"
        if not os.path.exists(dst):
            src_path = f"{SF}/{t}.parquet"
            if os.path.isdir(src_path):
                shutil.copytree(src_path, dst)
            else:
                shutil.copy(src_path, dst)
    sf_dirs = (("1x", SF), ("10x", big))
    print(f"using 10x staging at {big}")

    for name in QUERIES:
        QUERY_FNS[name](spark, SF).collect()

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
        "Same replicas and protocol as the r7 table above.",
        "dedup_lsh_precision / pipeline_contamination_report grow with",
        "the planted-duplicate pair count (replicas multiply shared",
        "shingles); the others are fixed-size-output reports.",
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
    print("wrote r7b staging table to SCALE.md")


if __name__ == "__main__":
    main()
