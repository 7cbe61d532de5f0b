"""Greedy sequence packing for LLM training batches — EXT operator.

Assigns documents to fixed-token-budget packs (context windows): docs are
sharded, and within each shard greedily packed in id order — a new pack
opens whenever adding the next doc would exceed the budget; docs larger
than the budget get a pack of their own. The classic pre-training data
prep step (maximize context-window utilization without splitting docs).

Packing is inherently sequential — each decision depends on the running
fill — so it cannot be a window function. The scale shape: shard by a
deterministic key (``id % num_shards``), run the greedy fold
partition-locally inside ``applyInPandas`` (state is O(1) per shard, one
shuffle on the shard key), and emit (shard, pack_id, pack_offset) so a
writer can bucket output files by (shard, pack). Shard count trades
parallelism against packing efficiency at the tails; at 100 TB you run
one shard per output file anyway.

Deterministic end to end (modular shard + id order + integer fill), so
the ``pipeline_pack_sequences`` oracle re-derives the exact assignment
with a recursive CTE in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens: Column | str = "est_tokens",
    budget: int = 1024,
    num_shards: int = 8,
) -> DataFrame:
    """Pack rows into token-budget bins. Returns one row per input row:
    (id_col, est_tokens, shard, pack_id, pack_offset) — ``pack_id``
    counts packs within a shard from 0, ``pack_offset`` is the row's
    first token position inside its pack."""
    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(df)
    tok_col = F.col(tokens) if isinstance(tokens, str) else tokens
    src = df.select(
        F.col(id_col),
        tok_col.cast("long").alias("est_tokens"),
        F.pmod(F.col(id_col).cast("long"), F.lit(num_shards))
        .cast("int")
        .alias("shard"),
    )
    out_schema = T.StructType(
        [
            src.schema[id_col],
            T.StructField("est_tokens", T.LongType()),
            T.StructField("shard", T.IntegerType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_offset", T.LongType()),
        ]
    )
    bud = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        packs, offsets = [], []
        pack, fill = 0, 0
        for t in pdf["est_tokens"]:
            t = int(t)
            if fill and fill + t > bud:
                pack += 1
                fill = 0
            offsets.append(fill)
            packs.append(pack)
            fill += t
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        pdf["pack_offset"] = pd.Series(offsets, dtype="int64")
        return pdf[[id_col, "est_tokens", "shard", "pack_id", "pack_offset"]]

    return src.groupBy("shard").applyInPandas(_pack, schema=out_schema)
