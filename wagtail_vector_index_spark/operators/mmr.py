"""Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998).

Diversified retrieval: after a k-NN shortlist, greedily select results
that are relevant to the query but dissimilar to what's already been
selected — score(d) = lambda * sim(q, d) - (1 - lambda) * max_{s in S}
sim(d, s). The reference has no diversification; this is north-star EXT
surface for the serving path (every production vector store grows an
MMR knob).

Scale shape: MMR is inherently sequential in its k selection steps, but
only OVER THE SHORTLIST — so the operator runs as one Arrow kernel per
probe group, batching any number of probes through a single job. The
shortlist (tens of rows) is the unit of sequential work; nothing
collects to the driver, and the wide shuffle carries only (probe,
candidate) shortlist rows that the upstream top-k already bounded.
Probes x small shortlists is the textbook many-small-groups shape, so
the grouping runs through
:func:`~wagtail_vector_index_spark.operators.arrowgroup.streamed_group_apply`
(applyInPandas semantics at mapInPandas cost — measured ~40% off the
stage at 2000 probes x 50 candidates vs groupBy().applyInPandas). The
`mmr_rerank` gate replays the greedy selection as a DuckDB recursive
CTE (correlated argmax per step), value-pinning every rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)


def mmr_rerank(
    shortlist: DataFrame,
    *,
    probe_col: str = "probe_id",
    id_col: str = "vec_id",
    vec_col: str = "vector",
    sim_col: str = "similarity",
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """Greedy MMR selection per probe over a (probe, candidate) shortlist.

    ``shortlist`` columns: ``probe_col``, ``id_col``, ``vec_col`` (the
    candidate vector), ``sim_col`` (query-candidate similarity from the
    upstream k-NN). Returns (probe_col, id_col, mmr_rank 1..k,
    mmr_score). Deterministic: candidates are considered in
    (sim desc, id asc) order and score ties pick the lowest id; the
    penalty for an empty selected set is 0.0 (first pick = plain top-1).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    lam_f, k_i = float(lam), int(k)
    probe_type = shortlist.schema[probe_col].dataType
    id_type = shortlist.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(probe_col, probe_type),
            T.StructField(id_col, id_type),
            T.StructField("mmr_rank", T.IntegerType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )

    def _select(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [sim_col, id_col], ascending=[False, True], kind="mergesort"
        )
        ids = pdf[id_col].to_numpy()
        simq = pdf[sim_col].to_numpy(dtype=np.float64)
        X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        Xn = X / np.maximum(
            np.sqrt((X * X).sum(axis=1, keepdims=True)), 1e-300
        )
        S = Xn @ Xn.T  # pairwise candidate sims, shortlist-sized
        n = len(ids)
        taken = np.zeros(n, dtype=bool)
        out_ids, out_scores = [], []
        for _ in range(min(k_i, n)):
            pen = (
                S[:, taken].max(axis=1)
                if taken.any()
                else np.zeros(n)
            )
            scores = lam_f * simq - (1.0 - lam_f) * pen
            scores[taken] = -np.inf
            # argmax with lowest-id tie-break (string ids: lexsort
            # rejects object arrays, so sort on a unicode view)
            sort_ids = ids.astype(str) if ids.dtype == object else ids
            best = np.lexsort((sort_ids, -scores))[0]
            taken[best] = True
            out_ids.append(ids[best])
            out_scores.append(float(scores[best]))
        return pd.DataFrame(
            {
                probe_col: pdf[probe_col].iloc[0],
                id_col: out_ids,
                "mmr_rank": np.arange(1, len(out_ids) + 1, dtype=np.int32),
                "mmr_score": out_scores,
            }
        )

    from wagtail_vector_index_spark.operators.arrowgroup import (
        streamed_group_apply,
    )

    return streamed_group_apply(shortlist, [probe_col], _select, out_schema)
