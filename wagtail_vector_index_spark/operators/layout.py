"""Z-order (Morton-curve) file layout — EXT 100 TB machinery.

Sorting a table by one column gives tight per-file min/max stats (and
therefore row-group skipping) for that column only; filters on a second
column still scan everything. Interleaving the bits of both columns'
bucketed ranks onto a space-filling curve and range-partitioning by the
curve value gives every written file a small bounding box in BOTH
dimensions — the layout trick behind Delta/Iceberg's OPTIMIZE ZORDER,
built here from plain Spark expressions:

1. one tiny aggregate computes each column's global min/max,
2. each value maps to a ``bits``-wide rank bucket (linear min-max — swap
   in quantile boundaries for heavily skewed columns),
3. the buckets' bits interleave into one Morton value (pure codegen'd
   bit arithmetic, no UDF),
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the Morton value
   write files whose footer stats are tight in every z-ordered column
   (evidence: tests/test_layout.py reads the parquet footers).

Queries need no knowledge of the layout — ordinary pushed filters on any
of the z-ordered columns skip row groups via the tighter stats.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave_col(bucket_cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each bucket column (already in
    [0, 2^bits)) into one Morton value: bit b of column i lands at
    position b * n_cols + i."""
    n = len(bucket_cols)
    terms = []
    for i, c in enumerate(bucket_cols):
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    *,
    cols: Sequence[str],
    bits: int = 12,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of
    ``cols`` (numeric/timestamp). One aggregate for min/max, one range
    shuffle — the write itself is the only pass over the data."""
    stats_row = df.agg(
        *[F.min(c).cast("double").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__max_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        lo = float(stats_row[f"__min_{c}"])
        hi = float(stats_row[f"__max_{c}"])
        span = (hi - lo) or 1.0
        buckets.append(
            F.least(
                F.lit(top),
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo))
                    / F.lit(span)
                    * F.lit(top)
                ).cast("long"),
            )
        )
    z = df.withColumn("__z", morton_interleave_col(buckets, bits))
    (
        z.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    key: str | Sequence[str],
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Hive-bucketed (and optionally sort-bucketed)
    catalog table — the co-located-join layout: two tables bucketed the
    same way on their join keys join WITHOUT any shuffle exchange (and,
    when sorted, without a sort), because every matching key pair is
    already in the same bucket file on both sides. At 100 TB this turns
    the recurring fact-to-fact join's dominant cost (two full-table
    exchanges) into zero — the write pays the partitioning once.

    tests/test_layout.py asserts the resulting join plan contains no
    Exchange. (The manifest-based stores in this repo get the same
    effect for vectors via explicit ``repartition(cid)`` + partition
    dirs; bucketing is the catalog-table form for relational keys,
    where partition-per-key would explode the directory count.)
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).bucketBy(int(buckets), *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)
