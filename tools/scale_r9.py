"""r9 10x stagings: the reworked exact-Jaccard hygiene gates.

Same replica protocol as tools/scale_r8b.py (scale_r6.stage_10x: exact
text replicas with shifted ids — every replica of a doc is a
jaccard-1.0 near-dup of every other, so the r8 versions' co-count join
detonated: 28.1x / 11.9x time at 10x). r9 collapses identical shingle
sets to one representative before the join (dedup.ngram_jaccard_pairs_
collapsed / ngram_dup_cluster_edges), so the join/agg work at 10x
replicas should match 1x, leaving only output expansion (split_leakage
enumerates the quadratic pair answer; dup_aware/components are linear).

Run: python tools/scale_r9.py [staged_sf10x_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_r6 import SF, stage_10x  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402

QUERIES = (
    "pipeline_split_leakage",
    "pipeline_dup_aware_weights",
    "dedup_components",
    "dedup_apply",
    "pipeline_ngram_collision",
    "pipeline_contamination_report",
    "pipeline_decontaminate",
)

HEADER = "### r9 stagings (same 10x replicas; set-collapsed hygiene gates)"


def main() -> None:
    spark = build_session(
        "scale-r9",
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
        else stage_10x(spark, tempfile.mkdtemp(prefix="scale_r9_"))
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
        row = (
            f"| {name} | {best['1x']:.2f}s | {out['1x']} | "
            f"{best['10x']:.2f}s | {out['10x']} | "
            f"{best['10x'] / max(best['1x'], 1e-9):.1f}x |"
        )
        rows.append(row)
        print(row, flush=True)

    print(HEADER)
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
