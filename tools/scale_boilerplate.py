"""Adversarial staging for the exact-Jaccard pair: boilerplate-heavy
corpus (the prefix filter's home turf) -> SCALE.md section.

Every document embeds the SAME 12-word boilerplate sentence (license
header / template / footer — the shape real web corpora have), plus
unique content. Each of the ~10 ubiquitous boilerplate shingles then
mates O(N²) rows in the co-count join — at 20k docs that is ~4e8 rows
PER SHINGLE — while the prefix join orders those shingles last (highest
document frequency) and never joins on them. The organic staging shows
the opposite regime (shared shingles rare), where co-count's simpler
two-shuffle plan wins; together the two tables say when to use which.

Run: python tools/scale_boilerplate.py   (refreshes its SCALE.md section)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from wagtail_vector_index_spark.session import build_session  # noqa: E402

BOILER = (
    "this document is provided under the standard license terms of the "
    "corpus"
)


def _gen(rng, n):
    rows = []
    for i in range(n):
        words = [f"w{rng.integers(0, 50000)}" for _ in range(20)]
        # boilerplate prepended to every doc; 1% near-dups of another doc
        rows.append((i, BOILER + " " + " ".join(words)))
    for _ in range(n // 100):
        src, victim = int(rng.integers(0, n)), int(rng.integers(0, n))
        if src != victim:
            w = rows[src][1].split(" ")
            w[len(w) // 2] = "mutated"
            rows[victim] = (victim, " ".join(w))
    return rows


def main() -> None:
    spark = build_session(
        "scale-boilerplate",
        master="local[32]",
        shuffle_partitions=64,
        **{"spark.driver.memory": "24g", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from wagtail_vector_index_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    rng = np.random.default_rng(11)
    rows = []
    for tag, n in (("5k docs", 5000), ("20k docs", 20000)):
        df = (
            spark.createDataFrame(_gen(rng, n), "doc_id long, text string")
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        res = {}
        for name, fn in (
            ("prefix filter", ngram_jaccard_pairs_prefix),
            ("co-count", ngram_jaccard_pairs),
        ):
            if tag == "5k docs":
                fn(df, n=3, threshold=0.5).count()  # warm codegen once
            # watchdog: the co-count's hot-shingle join concentrates
            # ~N^2 rows on ~10 join keys — a handful of straggler tasks
            # that can run for many minutes at 20k docs. Cancel at CAP
            # and record the DNF; the straggler IS the measurement.
            CAP = 240.0
            holder: dict = {}

            def run():
                try:
                    holder["out"] = fn(df, n=3, threshold=0.5).count()
                except Exception as e:  # cancelled
                    holder["err"] = e

            import threading

            t0 = time.time()
            th = threading.Thread(target=run)
            th.start()
            th.join(CAP)
            if th.is_alive():
                spark.sparkContext.cancelAllJobs()
                th.join(60)
                res[name] = (None, None)
                print(f"{tag} {name}: >{CAP:.0f}s CANCELLED", flush=True)
            else:
                res[name] = (time.time() - t0, holder.get("out"))
                print(
                    f"{tag} {name}: {res[name][0]:.1f}s "
                    f"out={holder.get('out')}",
                    flush=True,
                )
        if (
            res["co-count"][1] is not None
            and res["prefix filter"][1] is not None
        ):
            assert res["co-count"][1] == res["prefix filter"][1]

        def fmt(cell):
            t, _ = cell
            return f"{t:.1f}s" if t is not None else ">240s (cancelled)"

        pairs_out = next(
            (n for _, n in res.values() if n is not None), "DNF"
        )
        rows.append(
            f"| {tag} | {fmt(res['co-count'])} | "
            f"{fmt(res['prefix filter'])} | {pairs_out} |"
        )

    lines = [
        "",
        "## Boilerplate-heavy exact Jaccard (prefix filter vs co-count)",
        "",
        "Adversarial corpus (tools/scale_boilerplate.py): every document",
        "shares one 12-word boilerplate sentence (license header shape),",
        "unique content otherwise, threshold 0.5. Each ubiquitous",
        "boilerplate shingle mates O(N^2) co-count rows; the prefix filter",
        "(AllPairs/PPJoin) orders shingles by document frequency and joins",
        "only each doc's rarest prefix, so it never touches them. Identical",
        "output (asserted per run):",
        "",
        "| corpus | co-count | prefix filter | pairs |",
        "|---|---|---|---|",
        *rows,
        "",
        "The organic table above shows the OPPOSITE regime (shared shingles",
        "rare): there co-count's two-shuffle plan wins and the prefix",
        "machinery is overhead. Rule: prefix filter for boilerplate-heavy /",
        "skewed-token corpora at threshold >= ~0.5; co-count for benign",
        "distributions or loose thresholds.",
    ]
    src = open("/root/repo/SCALE.md").read()
    header = "## Boilerplate-heavy exact Jaccard (prefix filter vs co-count)"
    if header in src:
        head, rest = src.split(header, 1)
        cuts = [i for i in (rest.find("\n## "), rest.find("\n### ")) if i != -1]
        src = head + (rest[min(cuts) + 1:] if cuts else "")
        src = src.rstrip() + "\n"
    with open("/root/repo/SCALE.md", "w") as f:
        f.write(src.rstrip() + "\n" + "\n".join(lines) + "\n")
    print("wrote boilerplate table to SCALE.md")


if __name__ == "__main__":
    main()
