"""Distributed prefix scan (running totals / dense rank) — EXT.

Spark has no scalable global running total: ``Window.orderBy`` without a
``partitionBy`` collapses the whole input into ONE task (the pattern
this repo's perf notes ban), and ``monotonically_increasing_id`` is
neither dense nor ordered. The classic cluster answer — the same shape
RDD ``zipWithIndex`` uses internally, re-expressed on DataFrames — is a
two-phase scan:

1. range-repartition + sort on the order key (Spark's own distributed
   sort machinery: sampled range bounds, ascending partition ids), then
   pin the partitioning with ``localCheckpoint`` so the two downstream
   passes see identical splits;
2. a TINY per-partition totals aggregate (one row per partition — O(P)
   driver state, a few KB even at 10k partitions) turned into exclusive
   offsets on the driver;
3. one Arrow ``mapInPandas`` pass that adds the partition offset to the
   partition-local cumulative sum.

Total cost: one shuffle (the range sort) + one O(P) collect + one
narrow Arrow pass — no single-task stage anywhere, so the scan holds at
100 TB where a global window dies on the first executor.

Ties that straddle a range boundary are ordered by the partitioner's
split, so pass a unique tiebreaker (e.g. the row id) as the last
``order_cols`` entry when exact tie order matters (dense ids always
should). Null order keys sort first (Spark default); null values in a
summed column would propagate NaN through the pandas cumsum — guard
upstream.

On a real cluster swap ``localCheckpoint`` (executor-memory lineage cut)
for ``checkpoint()`` against a reliable dir if executor loss matters
mid-query.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _ranged_with_pid(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    descending: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + in-partition sort on ``order_cols`` and pin the
    split with a localCheckpoint; adds ``__pid`` (ascending partition id
    == ascending key range, descending when ``descending``)."""
    exprs = [
        F.col(c).desc() if descending else F.col(c).asc() for c in order_cols
    ]
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    ranged = (
        df.repartitionByRange(int(n), *exprs)
        .sortWithinPartitions(*exprs)
        .withColumn("__pid", F.spark_partition_id())
    )
    return ranged.localCheckpoint()


def _exclusive_offsets(
    ck: DataFrame, value_cols: Sequence[str]
) -> tuple[dict[int, list], dict[str, float]]:
    """Per-partition exclusive prefix offsets from the O(P) totals agg
    (partition ids ascend with the range order, so a driver-side running
    sum over the sorted ≤P rows is the whole cross-partition carry).
    Also returns the grand total per value column — the carry's final
    value — so callers needing totals don't re-scan."""
    totals = (
        ck.groupBy("__pid")
        .agg(*[F.sum(c).alias(c) for c in value_cols])
        .collect()
    )
    offsets: dict[int, list] = {}
    run = [0] * len(value_cols)
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[int(row["__pid"])] = list(run)
        for i, c in enumerate(value_cols):
            run[i] += row[c] if row[c] is not None else 0
    return offsets, dict(zip(value_cols, run))


def prefix_sum(
    df: DataFrame,
    *,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    descending: bool = False,
    suffix: str = "_cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running totals of ``value_cols`` in ``order_cols`` order
    across the whole frame — the distributed scan. Appends one
    ``<col><suffix>`` column per value column; output rows arrive
    range-sorted. Equivalent to ``sum(col) OVER (ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING)`` but with no single-task stage."""
    out, _ = prefix_sum_with_totals(
        df,
        order_cols=order_cols,
        value_cols=value_cols,
        descending=descending,
        suffix=suffix,
        num_partitions=num_partitions,
    )
    return out


def prefix_sum_with_totals(
    df: DataFrame,
    *,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    descending: bool = False,
    suffix: str = "_cum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, float]]:
    """:func:`prefix_sum` plus the grand totals as driver scalars — they
    fall out of the offsets pass for free (the cross-partition carry's
    final value IS the total), so normalizing consumers (ECDFs, shares)
    don't pay a second pass or a scalar cross-join over the scanned
    frame."""
    ck = _ranged_with_pid(
        df, order_cols, descending=descending, num_partitions=num_partitions
    )
    offsets, totals = _exclusive_offsets(ck, value_cols)
    base = [f for f in ck.schema.fields if f.name != "__pid"]
    out_schema = StructType(
        base
        + [
            StructField(c + suffix, ck.schema[c].dataType, True)
            for c in value_cols
        ]
    )
    names = list(value_cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run: list | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = list(offsets.get(int(pdf["__pid"].iloc[0]), [0] * len(names)))
            out = pdf.drop(columns=["__pid"])
            for i, c in enumerate(names):
                cs = pdf[c].cumsum() + run[i]
                out[c + suffix] = cs
                run[i] = cs.iloc[-1]
            yield out

    return ck.mapInPandas(gen, schema=out_schema), totals


def prefix_max(
    df: DataFrame,
    *,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    descending: bool = False,
    suffix: str = "_cummax",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running MAX of ``value_cols`` in ``order_cols`` order across the
    whole frame — the scan that powers skyline/Pareto pruning, record
    tracking ("best seen so far"), and high-watermark audits. Same
    two-phase shape as :func:`prefix_sum` (max is associative: range
    sort → O(P) per-partition maxes → driver running max → one Arrow
    cummax pass), so no single-task window stage exists at any scale.

    ``exclusive=True`` emits the max over STRICTLY PRECEDING rows (NULL
    for the first row globally) — the form domination tests need: a row
    is on the Pareto frontier iff its y exceeds the exclusive running
    max of y in descending-x order. Rows tying on ``order_cols`` are
    ordered arbitrarily within the tie by the range partitioner, so
    pre-aggregate to order-key grain first (one row per key) when tie
    rows must not see each other's values — the frontier query does."""
    ck = _ranged_with_pid(
        df, order_cols, descending=descending, num_partitions=num_partitions
    )
    totals = (
        ck.groupBy("__pid")
        .agg(*[F.max(c).alias(c) for c in value_cols])
        .collect()
    )
    offsets: dict[int, list] = {}
    run: list = [None] * len(value_cols)
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[int(row["__pid"])] = list(run)
        for i, c in enumerate(value_cols):
            v = row[c]
            if v is not None and (run[i] is None or v > run[i]):
                run[i] = v
    base = [f for f in ck.schema.fields if f.name != "__pid"]
    out_schema = StructType(
        base
        + [
            StructField(c + suffix, ck.schema[c].dataType, True)
            for c in value_cols
        ]
    )
    names = list(value_cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: list | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is None:
                carry = list(
                    offsets.get(int(pdf["__pid"].iloc[0]), [None] * len(names))
                )
            out = pdf.drop(columns=["__pid"])
            for i, c in enumerate(names):
                vals = pdf[c]
                if exclusive:
                    shifted = vals.shift(1)
                    cm = shifted.cummax()
                else:
                    cm = vals.cummax()
                if carry[i] is not None:
                    cm = cm.fillna(carry[i]).clip(lower=carry[i])
                out[c + suffix] = cm
                local_max = vals.max()
                if carry[i] is None or (
                    local_max == local_max and local_max > carry[i]
                ):
                    carry[i] = local_max
            yield out

    return ck.mapInPandas(gen, schema=out_schema)


def assign_dense_ids(
    df: DataFrame,
    *,
    order_cols: Sequence[str],
    out_col: str = "dense_id",
    start: int = 1,
    descending: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Gapless ordered ids (``row_number() OVER (ORDER BY ...)``) with no
    single-task window — the id-assignment every graph build / shard
    layout / stable-shuffle pipeline needs at scale. Include a unique
    tiebreaker as the last order column for a deterministic numbering."""
    ck = _ranged_with_pid(
        df, order_cols, descending=descending, num_partitions=num_partitions
    )
    counts = (
        ck.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    offsets: dict[int, int] = {}
    run = int(start)
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[int(row["__pid"])] = run
        run += int(row["__n"])
    base = [f for f in ck.schema.fields if f.name != "__pid"]
    out_schema = StructType(base + [StructField(out_col, LongType(), False)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nxt: int | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if nxt is None:
                nxt = offsets.get(int(pdf["__pid"].iloc[0]), int(start))
            out = pdf.drop(columns=["__pid"])
            out[out_col] = np.arange(nxt, nxt + len(pdf), dtype=np.int64)
            nxt += len(pdf)
            yield out

    return ck.mapInPandas(gen, schema=out_schema)
