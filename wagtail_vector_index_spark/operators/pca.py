"""Embedding dimensionality reduction (EXT): principal components by
distributed Gram accumulation + power iteration.

The 100 TB shape: the only pass over the data computes the Gram matrix
``G = X^T X`` — an Arrow ``mapInPandas`` fold that keeps one dim x dim
numpy accumulator per task (bounded state, the same
partial-aggregate discipline as the KMV bottom-k fold) and emits
dim^2 (i, j, partial) triples at partition end; a map-side-combinable
``groupBy(i, j).sum`` merges them into the single dim^2-row Gram
table. Everything after is driver-side arithmetic on a dim x dim
matrix (the k-row-collect class this repo documents everywhere):
power iteration converges to the top eigenvector in a handful of
rounds.

Cross-engine determinism (the oracle replays the whole computation):
Gram entries and each round's normalized iterate are rounded to
``round_decimals`` — float sums are order-dependent across engines,
and the rounding grid leaves >= 5 orders of magnitude of margin over
the summation error (the same pin kmeans' Lloyd replay uses). The
eigenvector sign is fixed by the deterministic all-positive start.

Use :func:`project_component` to attach the 1-d projection (or chain
several components with deflation outside this module) — the
Matryoshka gate evaluates PREFIX truncation; this is the learned
counterpart for when the embedding space isn't rotation-aligned.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    df: DataFrame,
    *,
    vec_col: str,
    dim: int,
    round_decimals: int | None = 6,
) -> DataFrame:
    """The dim x dim Gram table ``(i, j, g)`` with 1-based indices:
    ``g[i][j] = sum over rows of v[i] * v[j]`` (rounded for the
    cross-engine pin). One Arrow fold pass; dim^2 rows per task reach
    the exchange regardless of input size."""
    d = int(dim)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d, d), dtype=np.float64)
        any_rows = False
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X):
                any_rows = True
                acc += X.T @ X
        if any_rows:
            ii, jj = np.meshgrid(range(d), range(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": ii.ravel() + 1,
                    "j": jj.ravel() + 1,
                    "g": acc.ravel(),
                }
            )

    partials = df.select(vec_col).mapInPandas(fold, schema="i int, j int, g double")
    out = partials.groupBy("i", "j").agg(F.sum("g").alias("g"))
    if round_decimals is not None:
        out = out.select("i", "j", F.round("g", round_decimals).alias("g"))
    return out


def pca_power_component(
    df: DataFrame,
    *,
    vec_col: str,
    dim: int,
    iterations: int = 8,
    round_decimals: int = 6,
) -> list[float]:
    """Top principal direction (unnormalized-mean PCA, i.e. the top
    eigenvector of X^T X) by fixed-round power iteration from the
    uniform positive start vector. Returns the dim-length rounded
    vector; deterministic given the rounding pin."""
    d = int(dim)
    rows = gram_matrix(
        df, vec_col=vec_col, dim=d, round_decimals=round_decimals
    ).collect()
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
    v = np.round(np.full(d, 1.0 / np.sqrt(d)), round_decimals)
    for _ in range(int(iterations)):
        w = G @ v
        # 1e-300 floor (the repo-wide zero-norm policy): an empty or
        # all-zero corpus yields G = 0 and a zero iterate — return the
        # zero vector instead of silently propagating NaNs
        v = np.round(
            w / max(np.sqrt(float(w @ w)), 1e-300), round_decimals
        )
    return [float(x) for x in v]


def project_component(
    df: DataFrame,
    component: Sequence[float],
    *,
    vec_col: str,
    alias: str = "pc1",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Attach the 1-d projection ``<v, component>`` as a column — a pure
    JVM ``aggregate`` fold over the zipped arrays (explicit sequential
    summation order, the oracle-determinism invariant every dot product
    in this repo keeps)."""
    comp = F.array(*[F.lit(float(x)) for x in component])
    proj = F.aggregate(
        F.zip_with(F.col(vec_col), comp, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if round_decimals is not None:
        proj = F.round(proj, round_decimals)
    return df.withColumn(alias, proj)


def pca_power_components(
    df: DataFrame,
    *,
    vec_col: str,
    dim: int,
    k: int = 2,
    iterations: int = 8,
    round_decimals: int = 6,
) -> list[tuple[list[float], float]]:
    """Top-k principal directions by power iteration WITH DEFLATION:
    after each component converges, its Rayleigh quotient
    ``lambda = v^T G v`` is subtracted as a rank-1 update
    (``G <- G - lambda v v^T``) and the next component is extracted
    from the deflated matrix. Returns ``[(vector, eigenvalue), ...]``
    in decreasing-eigenvalue order.

    Same determinism discipline as :func:`pca_power_component`: the
    data pass is the one bounded-state Gram fold; every iterate, the
    two-stage Rayleigh quotient (``w = G v`` then ``v . w`` — the order
    the oracle replays), and each deflated matrix entry are rounded to
    ``round_decimals``, so the whole k-component computation replays
    exactly in chained SQL CTEs."""
    d = int(dim)
    rows = gram_matrix(
        df, vec_col=vec_col, dim=d, round_decimals=round_decimals
    ).collect()
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
    out: list[tuple[list[float], float]] = []
    for _ in range(int(k)):
        v = np.round(np.full(d, 1.0 / np.sqrt(d)), round_decimals)
        for _ in range(int(iterations)):
            w = G @ v
            v = np.round(
                w / max(np.sqrt(float(w @ w)), 1e-300), round_decimals
            )
        w = G @ v
        lam = round(float(v @ w), round_decimals)
        out.append(([float(x) for x in v], lam))
        G = np.round(G - lam * np.outer(v, v), round_decimals)
    return out
