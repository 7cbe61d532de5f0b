"""Fetch-back: retrieved documents -> source objects, order-preserving dedup.

Reference semantics:
- group retrieved docs by model label, one ``pk IN (...)`` lookup per
  label, key→object map (src/wagtail_vector_index/storage/django.py:201-240)
- order-preserving dedup: first (best-ranked) hit per object key wins
  (django.py:211-222)
- ModelKey format "<label>:<pk>" with MRO parents in object_keys[1:]
  (django.py:78-95, :279-285)

Spark shape: the k-NN result is tiny (k rows per probe), so it broadcasts;
fetch-back is a broadcast inner join per source table, unioned. Dedup is a
row_number window over the object key ordered by retrieval rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fetch_back(
    results_df: DataFrame,
    sources: dict[str, DataFrame],
    *,
    key_col: str = "object_key",
    rank_col: str = "similarity",
    pk_cast: str = "long",
) -> DataFrame:
    """Join retrieval results back to their source tables.

    ``sources`` maps model label -> source DataFrame carrying a ``pk``
    column (alias it before calling). The result keeps every column of the
    matching source plus the retrieval rank column, deduplicated
    order-preservingly per object key (best rank wins).
    """
    label = F.substring_index(F.col(key_col), ":", 1)
    pk = F.substring_index(F.col(key_col), ":", -1).cast(pk_cast)
    keyed = results_df.withColumn("__label", label).withColumn("__pk", pk)

    parts = []
    for model_label, src in sources.items():
        part = (
            F.broadcast(keyed.where(F.col("__label") == model_label))
            .join(src, F.col("__pk") == src["pk"], "inner")
            .drop("__pk")
        )
        parts.append(part)
    if not parts:
        raise ValueError("no source tables supplied")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return dedup_keep_best(out, key_col=key_col, rank_col=rank_col)


def dedup_keep_best(
    df: DataFrame,
    *,
    key_col: str = "object_key",
    rank_col: str = "similarity",
    ascending: bool = False,
) -> DataFrame:
    """Order-preserving dedup: one row per key, best retrieval rank kept
    (reference generator semantics, django.py:211-222)."""
    order = F.col(rank_col).asc() if ascending else F.col(rank_col).desc()
    w = Window.partitionBy(key_col).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__label")
    )
