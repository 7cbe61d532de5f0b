"""As-of (temporal nearest-match) join — EXT operator.

Joins every left row to the single right row with the greatest
``on``-value at or before it (``direction="backward"``; ``"forward"``
mirrors), optionally per ``by`` key and within a ``tolerance``. The
classic training-data shape: join events to the latest feature snapshot,
logs to the most recent config push, trades to quotes.

Spark has no native as-of join; the declarative composition here is the
union-and-window formulation: tag both sides, union them, sort each key
group once by (on, side), and carry the last-seen right payload forward
with ``last(..., ignorenulls=True)`` over a running window. That is ONE
shuffle+sort on (by, on) — identical cost to any keyed window — with no
range-explode join and no broadcast requirement, so it scales exactly as
far as a windowed aggregation does. The right payload travels as a single
struct so the matched columns always come from the SAME right row (per-
column ``last(ignorenulls)`` could mix rows when payload fields are
null).

DuckDB's native ``ASOF JOIN`` re-derives the semantics in the oracle for
the ``q_asof_join`` catalog entry, so backward-inclusive matching and
left-join null behavior are value-pinned, not assumed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on the ``on`` column per ``by``
    keys. Returns every left row (left-join semantics) plus the matched
    right row's non-key columns renamed with ``suffix``; unmatched rows
    carry nulls.

    direction="backward": match the greatest right ``on`` <= left ``on``
    (inclusive). "forward": the least right ``on`` >= left ``on``.
    ``tolerance`` (seconds for timestamp ``on`` columns, plain difference
    otherwise) null-outs matches farther than the bound, mirroring
    pandas.merge_asof.

    With empty ``by`` the window is unpartitioned — a single global sort,
    fine for series that fit one executor's sort spill but not for a
    corpus-wide join; supply keys (or pre-bucket time into coarse ranges
    as a synthetic key) at scale.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    right_payload = [c for c in right.columns if c not in by]
    # the right row travels as one struct (atomic match), including its
    # own `on` value for the tolerance check and the *_asof output
    rpay_fields = F.struct(*[F.col(c).alias(c) for c in right_payload])
    rpay_type = right.select(rpay_fields.alias("__rpay")).schema["__rpay"].dataType

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(rpay_type).alias("__rpay"),
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != on
        ],
        F.col(on),
        rpay_fields.alias("__rpay"),
        F.lit(0).alias("__side"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left at equal `on` -> inclusive match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__rpay", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("__rpay", ignorenulls=True).over(w)

    out = unioned.withColumn("__match", matched).where(F.col("__side") == 1)

    if tolerance is not None:
        on_type = left.schema[on].dataType.simpleString()
        if on_type.startswith("timestamp"):
            dist = F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"__match.{on}"))
            bound = float(tolerance) * 1_000_000
        else:
            dist = F.col(on) - F.col(f"__match.{on}")
            bound = tolerance
        if direction == "forward":
            dist = -dist
        out = out.withColumn(
            "__match",
            F.when(dist <= F.lit(bound), F.col("__match")),
        )

    return out.select(
        *[F.col(c) for c in left.columns],
        *[
            F.col(f"__match.{c}").alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
