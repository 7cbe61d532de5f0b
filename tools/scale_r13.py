"""r13 staging — out-of-band compaction soak (VERDICT item 4).

The r12 soak proved IN-BAND compaction (``compact_every``) keeps the
per-trigger wall flat, but every Nth trigger still pays the merge. r13
exposes ``compact_neardup_corpus`` as a callable maintenance entry so a
deployment runs the ingest stream with ``compact_every=0`` and compacts
from a SEPARATE maintenance loop — the manifest rewrite protocol makes
the merge safe concurrent with appends (the commit's update function
carries over generations that land during a rewrite; ``min_age_s``
keeps GC away from a concurrent trigger's still-staged directory).

This staging drives an 80-micro-batch file-source ``neardup_corpus_stream``
(300 Zipfian docs per batch, same corpus generator as the r12 soak)
through three shapes:

- **oob**: compact_every=0 + a concurrent thread calling
  ``compact_neardup_corpus(fanout=3, min_age_s=20, reader_grace_s=30)``
  every 5 s while the stream runs — the deployment shape under real
  interleaving. The FIRST run of this staging (without reader_grace_s)
  reproduced the in-flight-reader race the grace window now closes: a
  trigger's standing-signature scan hit FAILED_READ_FILE on a sidecar
  whose generation the concurrent merge+GC had just superseded —
  min_age_s guards by CREATION age, which is the wrong clock for
  readers (manifest.py::gc reader_grace_s docstring).
- **inband**: compact_every=10 (the r12 shape) for reference.
- **plain**: compaction off — the growth curve the others must avoid.

Done-criteria: oob per-batch wall flat (late/early ≈ inband's ratio,
both far below plain's), live generations bounded (< 2*fanout), and
the three surviving corpora IDENTICAL.

Each shape runs in its OWN JVM (subprocess): the first combined run
OOM'd the shared driver on the third consecutive 80-batch stream
(broadcast build), and per-shape JVMs are the fairer timing anyway.

Run: python tools/scale_r13.py            # all three shapes + table
     python tools/scale_r13.py oob|inband|plain   # one shape
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_100x_docs import _gen_docs_pdf  # noqa: E402
from wagtail_vector_index_spark.session import build_session  # noqa: E402

N_BATCHES = 80
DOCS_PER_BATCH = 300
FANOUT = 3
OOB_PERIOD_S = 5.0
TMP = "/tmp/r13_soak_shared"


def stage_src(spark) -> None:
    import numpy as np

    rng = np.random.default_rng(20260818)
    src = f"{TMP}/src"
    if os.path.isdir(src):
        return
    for i in range(N_BATCHES):
        pdf = _gen_docs_pdf(rng, DOCS_PER_BATCH)[["doc_id", "text"]]
        pdf["doc_id"] = pdf["doc_id"] + i * 10_000_000
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("append").parquet(src)
    print(f"staged {N_BATCHES} batch files under {src}",
          file=sys.stderr, flush=True)


def run_shape(tag: str) -> None:
    from wagtail_vector_index_spark.sources.manifest import (
        ManifestLog,
        read_live_table,
    )
    from wagtail_vector_index_spark.streaming.maintenance import (
        compact_neardup_corpus,
        neardup_corpus_stream,
    )

    spark = build_session(app_name=f"r13-soak-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    stage_src(spark)
    src = f"{TMP}/src"
    schema = spark.read.parquet(src).schema
    compact_every = {"oob": 0, "inband": 10, "plain": 0}[tag]
    oob = tag == "oob"

    if True:
        table = f"{TMP}/tbl_{tag}"
        ck = f"{TMP}/ck_{tag}"
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        stop = threading.Event()
        merges = [0]

        def maintenance():
            while not stop.is_set():
                stop.wait(OOB_PERIOD_S)
                if stop.is_set():
                    break
                spark.sparkContext.setJobDescription(
                    f"oob compact_neardup_corpus #{merges[0] + 1}"
                )
                if compact_neardup_corpus(
                    spark, table, fanout=FANOUT, min_age_s=20.0,
                    reader_grace_s=30.0,
                ):
                    merges[0] += 1

        t = threading.Thread(target=maintenance, daemon=True)
        t0 = time.time()
        q = neardup_corpus_stream(
            stream, path=table, checkpoint_dir=ck, threshold=0.5,
            compact_every=compact_every,
        )
        if oob:
            t.start()
        q.awaitTermination(7200)
        if oob:
            stop.set()
            t.join(timeout=60)
            # one final drain merge so the end state is comparable
            while compact_neardup_corpus(
                spark, table, fanout=FANOUT, min_age_s=0.0
            ):
                merges[0] += 1
        total = time.time() - t0
        prog = sorted(
            (p["batchId"], p["durationMs"].get("triggerExecution", 0) / 1e3)
            for p in (q.recentProgress or [])
            if p.get("numInputRows", 0) > 0
        )
        n_live = len(ManifestLog(table).live_paths())
        ids = sorted(
            r["doc_id"] for r in
            read_live_table(spark, table).select("doc_id").collect()
        )
        print(json.dumps({
            "shape": tag, "total_s": round(total, 1), "live_gens": n_live,
            "oob_merges": merges[0], "walls": prog, "n_docs": len(ids),
            "ids_hash": hash(tuple(ids)),
        }), flush=True)


def main() -> None:
    me = os.path.abspath(__file__)
    results = {}
    for tag in ("oob", "inband", "plain"):
        p = subprocess.run(
            [sys.executable, me, tag], check=True,
            capture_output=True, text=True,
        )
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[tag] = json.loads(line)
        r = results[tag]
        print(f"{tag}: total={r['total_s']}s live_gens={r['live_gens']} "
              f"oob_merges={r['oob_merges']} docs={r['n_docs']}",
              flush=True)

    assert (results["oob"]["ids_hash"] == results["inband"]["ids_hash"]
            == results["plain"]["ids_hash"])

    def window_mean(walls, lo, hi):
        xs = [w for b, w in walls if lo <= b < hi]
        return sum(xs) / max(len(xs), 1)

    print("\n| shape | batches 10-24 mean | 65-79 mean | late/early |"
          " live gens |")
    print("|---|---|---|---|---|")
    for tag in ("oob", "inband", "plain"):
        r = results[tag]
        e = window_mean(r["walls"], 10, 25)
        l = window_mean(r["walls"], 65, 80)
        print(f"| {tag} | {e:.2f}s | {l:.2f}s | x{l / max(e, 1e-9):.2f} "
              f"| {r['live_gens']} |")
    print("\nidentical surviving corpora across all three shapes "
          f"({results['oob']['n_docs']} docs).", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_shape(sys.argv[1])
    else:
        main()
