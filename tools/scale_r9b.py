"""r9 10x stagings: the five new corpus-statistics gates.

Same replica protocol as tools/scale_r9.py (scale_r6.stage_10x: exact
text/vector replicas with shifted ids). Expected shapes:
- text_heaps_law: token explode + first-occurrence agg + prefix scan —
  all linear; ~1x work per row, so ~10x wall is the honest ceiling and
  sub-linear growth means the aggs amortize.
- pipeline_padding_waste: two dense-id passes + tiny batch aggs; linear.
- text_quality_auc: one codegen scan + score-grain agg; the rank window
  sees DISTINCT scores only (replicas collapse onto the same scores), so
  the window input does NOT grow 10x.
- dedup_band_sweep: replicas are jaccard-1.0 dups, so candidate pairs
  grow quadratically in cluster size — pair-work-proportional like
  dedup_lsh_precision (the answer grows, not the plan overhead).
- vector_isotropy: one scan + dim-sized agg; flat by construction.

Run: python tools/scale_r9b.py [staged_sf10x_dir]
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

from wagtail_vector_index_spark.session import build_session  # noqa: E402

QUERIES = (
    "text_heaps_law",
    "pipeline_padding_waste",
    "text_quality_auc",
    "vector_isotropy",
    "dedup_band_sweep",
)

HEADER = "### r9 stagings (same 10x replicas; new corpus-statistics gates)"


def main() -> None:
    spark = build_session(
        "scale-r9b",
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
        else stage_10x(spark, tempfile.mkdtemp(prefix="scale_r9b_"))
    )
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
        row = (
            f"| {name} | {best['1x']:.2f}s | {out['1x']} | "
            f"{best['10x']:.2f}s | {out['10x']} | "
            f"{best['10x'] / max(best['1x'], 1e-9):.1f}x |"
        )
        rows.append(row)
        print(row, flush=True)

    print()
    print(HEADER)
    print("| gate | 1x time | 1x out | 10x time | 10x out | ratio |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
