"""r10 stagings — the two verdict asks that need 100x organic evidence.

A. **Auto pair-route at 100x** (verdict #1 done-criterion): the r9
   staging proved method="cocount" DNFs at 500k Zipfian docs while
   "prefix" is near-linear. r10 made the route a decision
   (`choose_pair_method`: one bounded aggregation computing the EXACT
   co-count join size) and the DEFAULT (`method="auto"`). This staging
   runs the default at 5k/50k/500k docs and prints the route the
   decision picked + the wall — auto must complete at 500k (where
   cocount could not) and stay on cocount at 5k (where it wins).

B. **Standing-corpus ingestion at 100x volume** (verdict #5): a 50k-doc
   standing corpus ingests 9 more 50k-doc Zipfian batches (500k docs
   total through the gate, the 100x-staging corpus volume) with
   `verify="estimate"` against a signatures-only standing state. Two
   rollover disciplines over the same batches:
   - naive — persist(union), unpersist(old): every batch's plan
     re-embeds the whole prior union/dedup lineage tree, so per-batch
     wall grows super-linearly and one pinned RDD leaks per batch
     (measured 13s -> 195s by batch 5 in the first run of this staging,
     which was then cut short). Capped at NAIVE_BATCHES here.
   - extend — CorpusSignatures.extend(): eager localCheckpoint
     truncates lineage per rollover; wall and state stay flat. This is
     the API the staging forced into the library (the verdict-#5
     "any fix it forces").

C. **Containment prefix route** (found during r10): the raw co-count
   containment join detonates on the same Zipf-head shingles; part C
   times cocount/prefix/auto at 5k-200k docs and asserts identical
   pair counts (the SCALE.md r10-C table).

Run: python tools/scale_r10.py [A] [B] [C]   (default: A and B)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402

from scale_100x_docs import _gen_docs_pdf  # noqa: E402  (same corpus shape)
from wagtail_vector_index_spark.session import build_session  # noqa: E402


def part_a(spark, rng, tmp) -> None:
    from wagtail_vector_index_spark.operators.dedup import (
        _PAIR_METHOD_CACHE,
        _shingle_set_groups,
        choose_pair_method,
        connected_components,
        ngram_dup_cluster_edges,
    )

    print("== A: ngram_dup_cluster_edges(method='auto') -> components ==",
          flush=True)
    rows_a = []
    for tag, n in (("1x", 5_000), ("10x", 50_000), ("100x", 500_000)):
        pdf = _gen_docs_pdf(rng, n)
        spark.createDataFrame(pdf).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/{tag}_docs")
        df = spark.read.parquet(f"{tmp}/{tag}_docs")
        # decision preview (what auto will pick) — measured separately so
        # the table can report route + decision cost + end-to-end wall
        t0 = time.time()
        _, groups = _shingle_set_groups(
            df, id_col="doc_id", text_col="text", n=3
        )
        route, stats = choose_pair_method(groups.select("shingles"))
        dec_s = time.time() - t0
        _PAIR_METHOD_CACHE.clear()  # make the timed run pay the decision
        t0 = time.time()
        out = connected_components(
            ngram_dup_cluster_edges(df, n=3, threshold=0.5, method="auto")
        ).count()
        wall = time.time() - t0
        rows_a.append((tag, n, route, stats, dec_s, wall, out))
        print(
            f"{tag} ({n} docs): route={route} "
            f"cocount_rows={stats['cocount_rows']:.3g} "
            f"budget={stats['budget']:.3g} decision={dec_s:.1f}s "
            f"wall={wall:.1f}s components_rows={out}",
            flush=True,
        )
    print()
    print("| scale | docs | auto route | exact cocount join rows | budget |"
          " wall (incl. decision) | components rows |")
    print("|---|---|---|---|---|---|---|")
    for tag, n, route, stats, dec_s, wall, out in rows_a:
        print(
            f"| {tag} | {n} | {route} | {stats['cocount_rows']:.3g} "
            f"| {stats['budget']:.3g} | {wall:.1f}s | {out} |"
        )
    print(flush=True)


def part_b(spark, rng, tmp) -> None:
    from pyspark import StorageLevel

    from wagtail_vector_index_spark.operators.dedup import (
        CorpusSignatures,
        incremental_neardup_filter,
        minhash_signatures,
    )

    print("== B: 50k-doc standing corpus + 9 x 50k-doc batches, "
          "estimate-verify, signatures-only state ==", flush=True)
    batches = []
    for i in range(10):
        pdf = _gen_docs_pdf(rng, 50_000)
        pdf["doc_id"] = pdf["doc_id"] + i * 1_000_000
        spark.createDataFrame(pdf).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/batch_{i}")
        batches.append(spark.read.parquet(f"{tmp}/batch_{i}"))
    print("staged 10 batches", flush=True)

    def pinned():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    NAIVE_BATCHES = 4

    def sigs_of(df):
        return minhash_signatures(
            df, id_col="doc_id", text_col="text", n=3, num_hashes=16,
            cache=False,
        ).drop("shingles")

    print("-- naive persist-union rollover (counterpoint, capped) --",
          flush=True)
    state = sigs_of(batches[0]).persist(StorageLevel.MEMORY_AND_DISK)
    n_state = state.count()
    rows_naive = []
    for i, batch in enumerate(batches[1 : 1 + NAIVE_BATCHES], start=1):
        t0 = time.time()
        kept = incremental_neardup_filter(
            batch, None, corpus_signatures=state,
            threshold=0.5, verify="estimate",
        )
        new_state = state.unionByName(sigs_of(kept)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_new = new_state.count()
        wall = time.time() - t0
        state.unpersist()
        state = new_state
        rows_naive.append((i, wall, n_new - n_state, n_new, pinned()))
        n_state = n_new
        print(f"naive batch {i}: wall={wall:.1f}s state_rows={n_new} "
              f"pinned_rdds={pinned()}", flush=True)
    state.unpersist()
    del state, new_state, kept

    print("-- CorpusSignatures.extend rollover (the library API) --",
          flush=True)
    rows_ext = []
    with CorpusSignatures.build(
        batches[0], include_shingles=False
    ) as sigs:
        n_state = sigs.df.count()
        for i, batch in enumerate(batches[1:], start=1):
            t0 = time.time()
            kept = incremental_neardup_filter(
                batch, None, corpus_signatures=sigs,
                threshold=0.5, verify="estimate",
            )
            sigs.extend(kept)
            n_new = sigs.df.count()
            wall = time.time() - t0
            appended = n_new - n_state
            rows_ext.append((i, wall, appended, n_new, pinned()))
            n_state = n_new
            print(f"extend batch {i}: wall={wall:.1f}s appended={appended} "
                  f"state_rows={n_new} pinned_rdds={pinned()}", flush=True)

    print()
    print("| rollover | batch | wall | standing state rows | pinned RDDs |")
    print("|---|---|---|---|---|")
    for i, wall, _, n, p_ in rows_naive:
        print(f"| naive | {i} | {wall:.1f}s | {n} | {p_} |")
    for i, wall, _, n, p_ in rows_ext:
        print(f"| extend | {i} | {wall:.1f}s | {n} | {p_} |")
    walls = [w for _, w, _, _, _ in rows_ext]
    print(
        f"\nextend per-batch wall first->last: {walls[0]:.1f}s -> "
        f"{walls[-1]:.1f}s (x{walls[-1] / max(walls[0], 1e-9):.2f} while "
        f"the standing state grew {rows_ext[-1][3] / rows_ext[0][3]:.1f}x; "
        f"naive was x{rows_naive[-1][1] / max(rows_naive[0][1], 1e-9):.2f} "
        f"after only {NAIVE_BATCHES} batches)"
        if rows_naive else "",
        flush=True,
    )


def part_c(spark, rng, tmp) -> None:
    from wagtail_vector_index_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    print("== C: ngram_containment_pairs cocount/prefix/auto ==", flush=True)
    rows = []
    for n in (5_000, 20_000, 50_000, 200_000):
        pdf = _gen_docs_pdf(rng, n)
        spark.createDataFrame(pdf).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/c{n}")
        df = spark.read.parquet(f"{tmp}/c{n}")
        outs = {}
        for m in ("cocount", "prefix", "auto"):
            if m == "cocount" and n > 20_000:
                print(f"{n} cocount: SKIP (quadratic per hot shingle; "
                      "31s at 20k and ~n^2)", flush=True)
                continue
            t0 = time.time()
            outs[m] = ngram_containment_pairs(
                df, n=3, threshold=0.8, method=m
            ).count()
            rows.append((n, m, time.time() - t0, outs[m]))
            print(f"{n} {m}: {rows[-1][2]:.1f}s pairs={outs[m]}", flush=True)
        assert len(set(outs.values())) == 1, outs  # identical answers
    print()
    print("| docs | method | wall | pairs |")
    print("|---|---|---|---|")
    for n, m, w, o in rows:
        print(f"| {n} | {m} | {w:.1f}s | {o} |")
    print(flush=True)


def main() -> None:
    spark = build_session(
        "scale-r10",
        master="local[32]",
        shuffle_partitions=64,
        **{
            "spark.driver.memory": "48g",
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "32m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(99)  # same seed/corpus family as r9
    tmp = tempfile.mkdtemp(prefix="scale_r10_")
    parts = {p.upper() for p in sys.argv[1:]} or {"A", "B"}
    if "A" in parts:
        part_a(spark, rng, tmp)
    if "B" in parts:
        part_b(spark, rng, tmp)
    if "C" in parts:
        part_c(spark, rng, tmp)


if __name__ == "__main__":
    main()
