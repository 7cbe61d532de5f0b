"""Hybrid retrieval: reciprocal-rank fusion of ranked candidate lists —
EXT operator (lexical BM25 + vector cosine is the standard hybrid-search
pairing; the reference retrieves by embedding only, storage/base.py).

RRF (Cormack et al.): fused(d) = sum over rankers of 1/(k + rank_i(d)),
k=60 by default. Rank-based fusion needs no score calibration between
rankers — the reason it is the default hybrid combiner in production
search systems.

Scale shape: fusion operates on CANDIDATE LISTS (each ranker's top-N),
never the full corpus — callers cut each input with
TakeOrderedAndProject first, so the global row_number() ranking window
inside sees N rows per ranker, not the corpus. Determinism: callers
should pass scores pre-rounded (e.g. 6dp) so sub-ulp float jitter
(aggregation-order noise on structurally identical docs — this corpus
plants exact duplicates) cannot flip ranks between engines; ties break
by id ascending.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: Sequence[tuple[DataFrame, str]],
    *,
    id_col: str = "doc_id",
    k: int = 60,
    score_alias: str = "rrf",
) -> DataFrame:
    """Fuse ranked candidate lists. ``ranked`` is a sequence of
    (DataFrame, score_col) pairs; each DataFrame holds one row per
    candidate (id_col, score_col). Returns (id_col, score_alias) for the
    union of candidates — rank a candidate is missing from contributes
    nothing, per standard RRF."""
    if not ranked:
        raise ValueError("need at least one ranked input")
    fused: DataFrame | None = None
    rank_cols = []
    for i, (df, score_col) in enumerate(ranked):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        r = df.select(
            F.col(id_col), F.row_number().over(w).alias(f"__rank{i}")
        )
        rank_cols.append(f"__rank{i}")
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    contrib = None
    for rc in rank_cols:
        term = F.when(
            F.col(rc).isNotNull(), F.lit(1.0) / (F.lit(k) + F.col(rc))
        ).otherwise(F.lit(0.0))
        contrib = term if contrib is None else contrib + term
    return fused.select(F.col(id_col), contrib.alias(score_alias))
