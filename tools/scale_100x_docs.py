"""100x organic DOCUMENTS staging: the text-side counterpart of the
"100x organic embeddings" SCALE.md section.

The sf0.1 testdata vocabulary has only 31 word types, so replicating it
100x makes every 3-gram ubiquitous (avg ~900 docs per shingle at 500k
docs) — co-count joins would measure an adversarial regime no real
crawl exhibits. This staging instead generates a Zipfian corpus the
shape of real text: ~30k word types (s = 1.1), lognormal doc lengths
(~100 tokens), a fixed 2% planted near-dup rate at every scale — so
shingle sharing is rare (like a crawl), duplicate density is constant,
and the time ratio is a clean operator-scaling read at 5k / 50k / 500k
documents (~0.5M / 5M / 50M tokens).

Timed operators (the text-side 100 TB load-bearers):
- minhash_lsh_pairs: banded candidate generation + exact verify
- ngram_dup_cluster_edges -> connected_components (the
  dedup_components / dup_aware_weights backbone)
- Corpus.decontaminate_collisions vs a 500-doc eval set (13-gram
  fingerprint broadcast join)
- Corpus.heaps_fit (token explode + first-occurrence agg + prefix scan)
- Corpus.vocab_coverage (type-grain count + distributed dense ranks)

Run: python tools/scale_100x_docs.py   (prints the SCALE.md table)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402

VOCAB = 30_000
DUP_RATE = 0.02
SCALES = (("1x", 5_000), ("10x", 50_000), ("100x", 500_000))


def _gen_docs_pdf(rng: np.random.Generator, n: int) -> pd.DataFrame:
    """n Zipfian docs + a fixed 2% planted ~10%-mutated near-dup rate."""
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    lengths = np.clip(
        rng.lognormal(mean=np.log(90.0), sigma=0.6, size=n), 20, 400
    ).astype(np.int64)
    total = int(lengths.sum())
    words = rng.choice(VOCAB, size=total, p=probs)
    wlist = np.array([f"w{i}" for i in range(VOCAB)])
    toks = wlist[words]
    bounds = np.concatenate([[0], np.cumsum(lengths)])
    texts = [
        " ".join(toks[bounds[i] : bounds[i + 1]]) for i in range(n)
    ]
    # plant near-dups: overwrite 2% of docs with a ~10%-mutated copy of
    # another doc — same mechanism at every scale (constant dup density)
    for _ in range(int(n * DUP_RATE)):
        src = texts[int(rng.integers(0, n))].split(" ")
        for _ in range(max(1, len(src) // 10)):
            src[int(rng.integers(0, len(src)))] = f"w{rng.integers(0, VOCAB)}"
        texts[int(rng.integers(0, n))] = " ".join(src)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": np.where(
                np.arange(n) % 3 == 0, "crawl_a", "crawl_b"
            ),
            "text": texts,
        }
    )


def main() -> None:
    spark = build_session(
        "scale-100x-docs",
        master="local[32]",
        shuffle_partitions=64,
        **{
            "spark.driver.memory": "48g",
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "32m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.operators.corpus import Corpus
    from wagtail_vector_index_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        ngram_dup_cluster_edges,
    )

    rng = np.random.default_rng(99)
    tmp = tempfile.mkdtemp(prefix="scale_100x_docs_")
    frames = {}
    for tag, n in SCALES:
        t0 = time.time()
        pdf = _gen_docs_pdf(rng, n)
        spark.createDataFrame(pdf).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/{tag}_docs")
        frames[tag] = spark.read.parquet(f"{tmp}/{tag}_docs")
        print(f"staged {tag}: {n} docs in {time.time() - t0:.0f}s", flush=True)

    # eval set: 300 verbatim corpus docs (contaminated by construction)
    # + 200 fresh docs — fixed size at every scale, like a real benchmark
    eval_pdf = pd.concat(
        [
            frames["1x"].limit(300).toPandas()[["doc_id", "text"]],
            _gen_docs_pdf(rng, 200)[["doc_id", "text"]],
        ]
    )
    eval_df = spark.createDataFrame(eval_pdf)

    def _ops(df, tag):
        ops = {
            "minhash LSH pairs (t=0.5)": lambda: minhash_lsh_pairs(
                df, threshold=0.5
            ).count(),
            "cluster edges [prefix] -> components": (
                lambda: connected_components(
                    ngram_dup_cluster_edges(
                        df, n=3, threshold=0.5, method="prefix"
                    )
                ).count()
            ),
        }
        if tag != "100x":
            # co-count counterpoint: Zipf head shingles are shared by
            # ~1000s of docs each, so the co-count join is quadratic
            # per hot shingle — 16s/416s at 1x/10x, unrunnable at 100x
            ops["cluster edges [cocount] -> components"] = (
                lambda: connected_components(
                    ngram_dup_cluster_edges(df, n=3, threshold=0.5)
                ).count()
            )
        ops.update({
            "13-gram decontaminate (500-doc eval)": lambda: (
                Corpus(df).decontaminate_collisions(eval_df=eval_df).df.count()
            ),
            "heaps_fit": lambda: len(Corpus(df).heaps_fit().collect()),
            "vocab_coverage (3 sizes)": lambda: len(
                Corpus(df)
                .vocab_coverage(vocab_sizes=(1000, 4000, 16000))
                .collect()
            ),
        })
        return ops

    for fn in _ops(frames["1x"], "1x").values():  # warm codegen/JIT
        fn()

    results: dict[str, dict[str, tuple[float, int]]] = {}
    for tag, _ in SCALES:
        for name, fn in _ops(frames[tag], tag).items():
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            results.setdefault(name, {})[tag] = (dt, out)
            print(f"{tag} {name}: {dt:.1f}s out={out}", flush=True)

    print()
    print("| operator | 1x (5k docs) | 10x (50k) | 100x (500k) |"
          " out 1x/10x/100x | 100x/10x time |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        t1, o1 = r["1x"]
        t10, o10 = r["10x"]
        t100, o100 = r.get("100x", (None, None))
        c100 = "DNF (see notes)" if t100 is None else f"{t100:.1f}s"
        r100 = (
            "—" if t100 is None else f"{t100 / max(t10, 1e-9):.1f}x"
        )
        print(
            f"| {name} | {t1:.1f}s | {t10:.1f}s | {c100} "
            f"| {o1}/{o10}/{o100 if o100 is not None else '—'} | {r100} |"
        )


if __name__ == "__main__":
    main()
