"""r9 10x staging: pipeline_span_scrub (after the toks-free recompute fix).

Same replica protocol as tools/scale_r9.py. This gate MISSED its 10x
staging when it landed (the round-close checklist's point), and the
bench refresh then caught a 200x recompute cliff at sf0.1 that sf0.01
never showed. Expected shape post-fix: linear fingerprint scan +
broadcast join + contaminated-minority token join.

Run: python tools/scale_r9e.py [staged_sf10x_dir]
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
    "pipeline_span_scrub",
)

HEADER = "### r9 stagings (same 10x replicas; span-scrub gate, post recompute-cliff fix)"


def main() -> None:
    spark = build_session(
        "scale-r9e",
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
        else stage_10x(spark, tempfile.mkdtemp(prefix="scale_r9e_"))
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
