"""Probabilistic record linkage (Fellegi-Sunter, EXT).

Two composable pieces of the classic linkage pipeline (Fellegi &
Sunter 1969; Christen 2012):

- :func:`blocked_pairs`: the candidate-generation stage — a self-join
  on a deterministic blocking key carrying selected attributes as
  ``<col>_a`` / ``<col>_b`` pairs. Shuffles on the block key only, so
  each task compares one block; the O(n²) all-pairs compare never
  exists (the same candidates-then-verify discipline as the MinHash
  dedup family).
- :func:`fs_weight`: the scoring stage — the log₂ likelihood-ratio
  sum over per-field agreement indicators, with per-field (m, u)
  probabilities (m = P(agree | match), u = P(agree | non-match)).
  Agreement adds log₂(m/u), disagreement adds log₂((1−m)/(1−u));
  pairs above the upper threshold auto-link, below the lower threshold
  auto-reject, between goes to clerical review.

The weights are plain codegen'd column arithmetic with PRECOMPUTED
python-float constants (so an external oracle can embed the identical
literals instead of trusting two libm log2 implementations to agree to
the last ulp).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_pairs(
    df: DataFrame,
    *,
    id_col: str,
    block_col: str,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Unordered candidate pairs within each block: one row per
    ``id_a < id_b`` pair sharing ``block_col``, with every column in
    ``carry`` present twice as ``<col>_a`` / ``<col>_b`` plus the
    block key as ``blk``. The join shuffles on the block key only —
    block size is bounded by the key design, the ER skew lever."""
    left = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias(f"{id_col}_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
    )
    right = df.select(
        F.col(block_col).alias("__blk_b"),
        F.col(id_col).alias(f"{id_col}_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    return left.join(
        right,
        (F.col("blk") == F.col("__blk_b"))
        & (F.col(f"{id_col}_a") < F.col(f"{id_col}_b")),
    ).drop("__blk_b")


def fs_field_constants(m: float, u: float) -> tuple[float, float]:
    """The (agreement, disagreement) log₂ likelihood-ratio weights for
    one field — exposed so oracle SQL can embed the identical
    python-float literals."""
    return (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))


def fs_weight(fields: Sequence[tuple[Column, float, float]]) -> Column:
    """Composite Fellegi-Sunter match weight: for each
    ``(agree_expr, m, u)`` add the agreement weight when the boolean
    ``agree_expr`` holds, else the disagreement weight. Field order
    fixes the float summation order (the cross-engine determinism
    pin)."""
    total = F.lit(0.0)
    for agree, m, u in fields:
        wa, wd = fs_field_constants(m, u)
        total = total + F.when(agree, F.lit(wa)).otherwise(F.lit(wd))
    return total
