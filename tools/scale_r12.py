"""r12 stagings — the verdict's stream-compaction soak, the books-regime
shingle-SET blind spot, and the iterative-graph flatness rows.

A. **Compaction soak** (verdict #1/#7 done-criterion): a long-running
   `neardup_corpus_stream` appends one generation (+ `_sigs` sidecar)
   per micro-batch forever; before r12, `_standing_signatures` listed,
   existence-checked, and unioned one sidecar scan PER LIVE GENERATION
   per trigger — per-batch cost flat in corpus size but LINEAR IN BATCH
   COUNT. r12's `compact_every` rewrites the live generations into one
   (data + ONE consolidated sidecar derived from the standing sidecars)
   every N batches via the manifest rewrite protocol. This staging
   drives a 120-micro-batch file-source stream (300 Zipfian docs per
   batch) through BOTH shapes — compact_every=10 vs compaction off —
   and prints per-batch trigger walls plus live-generation counts.
   Done = compacted per-batch wall flat over 120 batches (late/early
   wall ratio ~1), live generations bounded by the cadence; the
   uncompacted run's wall grows with batch index and ends at 120 live
   generations. Surviving corpora asserted identical.

B. **Books-regime shingle-SET family** (verdict #3): the r11-B staging
   proved the span/trim kernels linear in document length, but the
   shingle-SET family (`_shingle_set_groups` collect-set + the pair
   routes' exact verify carrying full sorted shingle-hash arrays) was
   unmeasured at 10k-100k-token documents. Fixed ~6M-token budget,
   document length swept 1k -> 10k -> 100k (the r11-B corpus shape: 50%
   of each doc is a corpus-wide shared passage — every pair of docs
   shares half its shingles, the hot-shingle worst case for co-count),
   through minhash_signatures / ngram_jaccard_pairs_collapsed /
   ngram_containment_pairs (both `method="auto"` — the route decision
   is part of the cost; the chosen route is printed from the r11
   telemetry log). Done = near-flat wall per fixed token budget.

C. **Iterative-graph flatness rows** (verdict #5): the r11 graph-family
   floor declaration leaned on pagerank's stagings; triangles /
   communities / kcore had no 10x rows of their own (graph_triangles
   had one in r6, predating the current formulation). 10 key-shifted
   lineitem replicas (l_orderkey/l_partkey shifted -> 10 disjoint
   copies of the co-purchase graph), the EXACT gated query functions at
   1x and 10x, warm best-of-2. Done = time ratio well under 10x (the
   pagerank-style scheduling-floor amortization), no superlinear blow.

Run: python tools/scale_r12.py [A] [B] [C]   (default: all)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_100x_docs import _gen_docs_pdf  # noqa: E402
from scale_r11 import _gen_long_docs  # noqa: E402
from wagtail_vector_index_spark.session import build_session  # noqa: E402


# ---------------------------------------------------------------------------
# A. 120-batch compaction soak
# ---------------------------------------------------------------------------

N_BATCHES = 120
DOCS_PER_BATCH = 300
COMPACT_EVERY = 10


def part_a(spark, rng, tmp) -> None:
    from wagtail_vector_index_spark.sources.manifest import (
        ManifestLog,
        read_live_table,
    )
    from wagtail_vector_index_spark.streaming.maintenance import (
        neardup_corpus_stream,
    )

    print(f"== A: neardup_corpus_stream soak, {N_BATCHES} x "
          f"{DOCS_PER_BATCH}-doc batches, compact_every={COMPACT_EVERY} "
          "vs off ==", flush=True)
    src = f"{tmp}/a_src"
    schema = None
    for i in range(N_BATCHES):
        pdf = _gen_docs_pdf(rng, DOCS_PER_BATCH)[["doc_id", "text"]]
        pdf["doc_id"] = pdf["doc_id"] + i * 10_000_000
        sdf = spark.createDataFrame(pdf)
        schema = sdf.schema
        sdf.coalesce(1).write.mode("append").parquet(src)
    print(f"staged {N_BATCHES} batch files", flush=True)

    def run(tag, compact_every):
        table = f"{tmp}/a_tbl_{tag}"
        ck = f"{tmp}/a_ck_{tag}"
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        t0 = time.time()
        q = neardup_corpus_stream(
            stream, path=table, checkpoint_dir=ck, threshold=0.5,
            compact_every=compact_every,
        )
        q.awaitTermination(7200)
        total = time.time() - t0
        prog = sorted(
            (p["batchId"], p["durationMs"].get("triggerExecution", 0) / 1e3)
            for p in (q.recentProgress or [])
            if p.get("numInputRows", 0) > 0
        )
        n_live_docs = read_live_table(spark, table).count()
        n_live_gens = len(ManifestLog(table).live_paths())
        n_disk_gens = sum(
            1 for n in os.listdir(table) if n.startswith("gen-")
        )
        ids = {r["doc_id"] for r in
               read_live_table(spark, table).select("doc_id").collect()}
        return prog, total, n_live_docs, n_live_gens, n_disk_gens, ids

    cp, ct, cd, cg, cdisk, cids = run("cmp", COMPACT_EVERY)
    print(f"compacted:   total={ct:.1f}s live_docs={cd} live_gens={cg} "
          f"disk_gens={cdisk}", flush=True)
    pp, pt, pd_, pg, pdisk, pids = run("plain", 0)
    print(f"uncompacted: total={pt:.1f}s live_docs={pd_} live_gens={pg} "
          f"disk_gens={pdisk}", flush=True)
    assert cids == pids, (len(cids), len(pids))

    cw = {b: w for b, w in cp}
    pw = {b: w for b, w in pp}
    print()
    print("| micro-batch | compacted wall | uncompacted wall |")
    print("|---|---|---|")
    for b in (1, 20, 40, 60, 80, 100, 118):
        print(f"| {b} | {cw.get(b, float('nan')):.2f}s | "
              f"{pw.get(b, float('nan')):.2f}s |")

    def window_mean(d, lo, hi):
        xs = [w for b, w in d.items() if lo <= b < hi]
        return sum(xs) / max(len(xs), 1)

    c_early = window_mean(cw, 10, 25)
    c_late = window_mean(cw, 100, 119)
    p_early = window_mean(pw, 10, 25)
    p_late = window_mean(pw, 100, 119)
    print(
        f"\nmean per-batch wall, batches 10-24 -> 100-118: "
        f"compacted {c_early:.2f}s -> {c_late:.2f}s "
        f"(x{c_late / max(c_early, 1e-9):.2f}); uncompacted "
        f"{p_early:.2f}s -> {p_late:.2f}s "
        f"(x{p_late / max(p_early, 1e-9):.2f}). Live generations at end: "
        f"{cg} vs {pg}; identical surviving corpora ({cd} docs).",
        flush=True,
    )


# ---------------------------------------------------------------------------
# B. books-regime shingle-SET family
# ---------------------------------------------------------------------------


def part_b(spark, rng, tmp) -> None:
    from wagtail_vector_index_spark.operators.dedup import (
        last_pair_route_decisions,
        minhash_signatures,
        ngram_containment_pairs,
        ngram_jaccard_pairs_collapsed,
    )

    print("== B: shingle-SET family, ~6M tokens total, 50% shared "
          "passage, doc length 1k -> 10k -> 100k ==", flush=True)
    shapes = [(6_000, 1_000), (600, 10_000), (60, 100_000)]
    frames = {}
    for n_docs, doc_len in shapes:
        pdf = _gen_long_docs(rng, n_docs, doc_len)
        p = f"{tmp}/b_{doc_len}"
        spark.createDataFrame(pdf).repartition(32).write.mode(
            "overwrite"
        ).parquet(p)
        frames[doc_len] = (n_docs, spark.read.parquet(p))
    print("staged 3 corpora", flush=True)

    def timed(fn):
        """Warm best-of-2: the first execution of each plan shape pays
        one-time codegen/JIT that is NOT the scaling signal (measured
        ~10s extra on the first containment run only)."""
        best, out = None, None
        for _ in range(2):
            t0 = time.time()
            out = fn()
            w = time.time() - t0
            best = w if best is None else min(best, w)
        return best, out

    rows = []
    for doc_len, (n_docs, df) in frames.items():
        w_sig, n_sig = timed(
            lambda: minhash_signatures(df, cache=False)
            .select(F.sum(F.size("sig")))
            .collect()[0][0]
        )
        rows.append(("minhash_signatures", n_docs, doc_len, w_sig, "-", n_sig))
        print(f"minhash_signatures    {n_docs}x{doc_len}: {w_sig:.1f}s",
              flush=True)

        w_jac, n_jac = timed(
            lambda: ngram_jaccard_pairs_collapsed(
                df, threshold=0.5, method="auto"
            ).count()
        )
        route = (last_pair_route_decisions(1) or [{}])[-1].get("method", "?")
        rows.append(("jaccard_collapsed(auto)", n_docs, doc_len, w_jac,
                     route, n_jac))
        print(f"jaccard_collapsed     {n_docs}x{doc_len}: {w_jac:.1f}s "
              f"route={route} pairs={n_jac}", flush=True)

        w_con, n_con = timed(
            lambda: ngram_containment_pairs(
                df, threshold=0.8, method="auto"
            ).count()
        )
        route = (last_pair_route_decisions(1) or [{}])[-1].get("method", "?")
        rows.append(("containment(auto)", n_docs, doc_len, w_con,
                     route, n_con))
        print(f"containment           {n_docs}x{doc_len}: {w_con:.1f}s "
              f"route={route} pairs={n_con}", flush=True)

    print()
    print("| operator | docs | tokens/doc | wall | route | result |")
    print("|---|---|---|---|---|---|")
    for name, n_docs, doc_len, w, route, res in rows:
        print(f"| {name} | {n_docs} | {doc_len} | {w:.1f}s | {route} "
              f"| {res} |")
    print(flush=True)


# ---------------------------------------------------------------------------
# C. iterative-graph flatness: triangles / communities / kcore at 10x
# ---------------------------------------------------------------------------

SF = "/root/testdata/sf0.1"
GRAPH_QUERIES = ("graph_triangles", "graph_communities", "graph_kcore")


def _stage_10x_lineitem(spark, tmp: str) -> str:
    """10 disjoint key-shifted lineitem replicas; other tables symlinked
    conceptually by just copying the sf0.1 path convention (the graph
    gates read only lineitem)."""
    out = f"{tmp}/sf10x"
    base = spark.read.parquet(f"{SF}/lineitem.parquet")
    parts = []
    for i in range(10):
        parts.append(
            base.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000)
            ).withColumn(
                "l_partkey", F.col("l_partkey") + F.lit(i * 1_000_000)
            ).withColumn(
                "l_suppkey", F.col("l_suppkey") + F.lit(i * 1_000_000)
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    return out


def part_c(spark, rng, tmp) -> None:
    import __spark_entry__ as entry

    print("== C: graph flatness, 10 disjoint co-purchase graph copies ==",
          flush=True)
    big = _stage_10x_lineitem(spark, tmp)
    qs = entry.queries()
    rows = []
    for name in GRAPH_QUERIES:
        fn = qs[name]
        walls = {}
        for sf_dir, tag in ((SF, "1x"), (big, "10x")):
            best, nrows = None, None
            for _ in range(2):  # warm best-of-2
                t0 = time.time()
                nrows = fn(spark, sf_dir).count()
                w = time.time() - t0
                best = w if best is None else min(best, w)
            walls[tag] = (best, nrows)
        r1, n1 = walls["1x"]
        r10, n10 = walls["10x"]
        rows.append((name, r1, n1, r10, n10))
        print(f"{name}: 1x={r1:.2f}s ({n1} rows) 10x={r10:.2f}s "
              f"({n10} rows) ratio=x{r10 / max(r1, 1e-9):.1f}", flush=True)
    print()
    print("| query | 1x | 1x rows | 10x | 10x rows | time ratio |")
    print("|---|---|---|---|---|---|")
    for name, r1, n1, r10, n10 in rows:
        print(f"| {name} | {r1:.2f}s | {n1} | {r10:.2f}s | {n10} "
              f"| {r10 / max(r1, 1e-9):.1f}x |")
    print(flush=True)


def main() -> None:
    spark = build_session(
        "scale-r12",
        master="local[32]",
        shuffle_partitions=64,
        **{
            "spark.driver.memory": "48g",
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "32m",
            # keep the full soak's progress history (default cap is 100)
            "spark.sql.streaming.numRecentProgressUpdates": "256",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(112)
    tmp = tempfile.mkdtemp(prefix="scale_r12_")
    parts = {p.upper() for p in sys.argv[1:]} or {"A", "B", "C"}
    if "A" in parts:
        part_a(spark, rng, tmp)
    if "B" in parts:
        part_b(spark, rng, tmp)
    if "C" in parts:
        part_c(spark, rng, tmp)


if __name__ == "__main__":
    main()
