"""Organic 10x scale experiment for the dedup family -> SCALE.md rows.

tools/scale_exp.py's 10x staging uses exact replicas, which multiplies
duplicate-pair OUTPUT quadratically — useful as a stress test, but it
conflates time growth with output blowup. This staging grows the corpus
ORGANICALLY instead: new documents are drawn from the sf0.1 corpus's own
word-frequency distribution (lengths resampled from the corpus length
distribution) with a fixed 2% planted near-dup rate, and new embeddings
are fresh isotropic unit vectors with a 1% planted near-dup rate — so
the duplicate density is CONSTANT across scales and the time ratio is a
clean read on operator scaling.

Run: python tools/scale_organic.py   (appends the organic table to
/root/repo/SCALE.md)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402


def _gen_docs(rng, vocab, probs, lengths, n):
    """n synthetic docs from the corpus unigram distribution + 2% near-dups."""
    docs = []
    for i in range(n):
        L = int(lengths[rng.integers(0, len(lengths))])
        words = vocab[rng.choice(len(vocab), size=L, p=probs)]
        docs.append((i, "synthetic", " ".join(words)))
    # plant near-dups: overwrite 2% of docs with a ~10%-mutated copy of
    # another doc (same mechanism at every scale -> constant dup density)
    n_dup = n // 50
    for j in range(n_dup):
        src = docs[int(rng.integers(0, n))][2].split(" ")
        for _ in range(max(1, len(src) // 10)):
            src[int(rng.integers(0, len(src)))] = str(
                vocab[int(rng.integers(0, len(vocab)))]
            )
        victim = int(rng.integers(0, n))
        docs[victim] = (victim, "synthetic", " ".join(src))
    return docs


def _gen_embeddings(rng, dim, n):
    """n isotropic unit vectors + 1% planted near-dups."""
    X = rng.normal(size=(n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    n_dup = n // 100
    for j in range(n_dup):
        src = int(rng.integers(0, n))
        victim = int(rng.integers(0, n))
        if victim != src:
            v = X[src] + rng.normal(scale=0.02, size=dim)
            X[victim] = v / np.linalg.norm(v)
    return X


def main() -> None:
    spark = build_session(
        "scale-organic",
        master="local[32]",
        shuffle_partitions=64,
        **{
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT text FROM '/root/testdata/sf0.1/documents.parquet'"
    ).fetchall()
    words = [w for (t,) in rows for w in t.split(" ") if w]
    lengths = np.array([len(t.split(" ")) for (t,) in rows])
    uniq, counts = np.unique(np.array(words), return_counts=True)
    probs = counts / counts.sum()

    rng = np.random.default_rng(42)
    tmp = tempfile.mkdtemp(prefix="scale_organic_")
    scales = {}
    for tag, n_docs, n_vecs in (("1x", 5000, 2000), ("10x", 50000, 20000)):
        docs = _gen_docs(rng, uniq, probs, lengths, n_docs)
        spark.createDataFrame(
            docs, "doc_id long, source string, text string"
        ).repartition(32).write.mode("overwrite").parquet(f"{tmp}/{tag}_docs")
        X = _gen_embeddings(rng, 64, n_vecs)
        spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(n_vecs)],
            "vec_id long, embedding array<double>",
        ).repartition(32).write.mode("overwrite").parquet(f"{tmp}/{tag}_emb")
        scales[tag] = (
            spark.read.parquet(f"{tmp}/{tag}_docs"),
            spark.read.parquet(f"{tmp}/{tag}_emb"),
        )

    from wagtail_vector_index_spark.operators.dedup import (
        connected_components,
        lsh_neardup_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
        semantic_dedup,
    )

    def _ops(docs, emb):
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.orderBy("vec_id").limit(16).collect()
        ]
        # pairs generation and clustering timed separately: the r4 row
        # bundled them, so the exact-Jaccard shingle join's cost was
        # misread as the components loop's
        state: dict = {}

        def _pairs():
            state["pairs"] = ngram_jaccard_pairs(
                docs, n=3, threshold=0.1
            ).localCheckpoint(eager=True)
            return state["pairs"].count()

        return {
            "minhash LSH dedup": lambda: minhash_lsh_pairs(
                docs, threshold=0.5
            ).count(),
            "embedding LSH near-dup": lambda: lsh_neardup_pairs(
                emb, id_col="vec_id", vec_col="embedding", threshold=0.4,
                num_planes=24, bands=3, dim=64,
            ).count(),
            "n-gram Jaccard pairs (threshold 0.1)": _pairs,
            "exact Jaccard t=0.5 (co-count)": lambda: ngram_jaccard_pairs(
                docs, n=3, threshold=0.5
            ).count(),
            "exact Jaccard t=0.5 (prefix filter)": (
                lambda: ngram_jaccard_pairs_prefix(
                    docs, n=3, threshold=0.5
                ).count()
            ),
            "connected components (star)": lambda: connected_components(
                state["pairs"]
            ).count(),
            "connected components (label-prop)": lambda: connected_components(
                state["pairs"], algorithm="label"
            ).count(),
            "semantic dedup": lambda: semantic_dedup(
                emb, cents, id_col="vec_id", vec_col="embedding",
                threshold=0.4,
            ).count(),
        }

    # warm codegen/JIT on the small scale before timing
    for fn in _ops(*scales["1x"]).values():
        fn()

    results: dict[str, dict[str, tuple[float, int]]] = {}
    for tag in ("1x", "10x"):
        for name, fn in _ops(*scales[tag]).items():
            t0 = time.time()
            out = fn()
            results.setdefault(name, {})[tag] = (time.time() - t0, out)
            print(f"{tag} {name}: {time.time() - t0:.1f}s out={out}")

    lines = [
        "",
        "## Organic 10x scale (constant duplicate density)",
        "",
        "Generated corpus (tools/scale_organic.py): 5k->50k docs drawn",
        "from the sf0.1 unigram distribution with a fixed 2% planted",
        "near-dup rate; 2k->20k isotropic unit vectors with 1% planted",
        "near-dups. Duplicate density constant across scales, so the",
        "time ratio is a clean operator-scaling read (the replica table",
        "above deliberately stresses quadratic pair output instead).",
        "",
        "| operator | 1x time | 1x out | 10x time | 10x out | out ratio | time ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        t1, o1 = r["1x"]
        t10, o10 = r["10x"]
        lines.append(
            f"| {name} | {t1:.1f}s | {o1} | {t10:.1f}s | {o10} | "
            f"{o10 / max(o1, 1):.1f}x | {t10 / max(t1, 1e-9):.1f}x |"
        )
    # replace any previous organic section (idempotent re-runs); stop at
    # the next heading of ANY level — the ### subsections that follow
    # (relational family, incremental near-dup, BPE, 100x) are authored
    # by other tools and must survive a rerun
    src = open("/root/repo/SCALE.md").read()
    header = "## Organic 10x scale (constant duplicate density)"
    if header in src:
        head, rest = src.split(header, 1)
        cuts = [i for i in (rest.find("\n## "), rest.find("\n### ")) if i != -1]
        src = head + (rest[min(cuts) + 1:] if cuts else "")
        src = src.rstrip() + "\n"
    with open("/root/repo/SCALE.md", "w") as f:
        f.write(src + "\n".join(lines) + "\n")
    print("wrote organic table to SCALE.md")


if __name__ == "__main__":
    main()
