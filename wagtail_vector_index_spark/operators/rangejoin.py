"""Range (interval containment) join — EXT operator.

Matches left rows to right intervals with lo <= value <= hi. Spark plans
a raw inequality join as BroadcastNestedLoopJoin — every (row, interval)
pair evaluated, quadratic and broadcast-bound. The binning formulation
here makes it an equi-join: pick a bin width ~ the typical interval
length, stamp each left row with its bin (`floor(value / w)` — exactly
one), explode each interval into the bins it overlaps
(`sequence(floor(lo/w), floor(hi/w))`), hash-join on the bin, then apply
the exact containment filter. Because a left row lives in exactly ONE
bin, every qualifying (row, interval) pair meets exactly once — no
post-join dedup. Shuffle is keyed on dense integer bins; interval-side
blowup is `span / bin_width + 1` rows per interval, which the
``bin_width`` knob bounds.

The ``q_range_join_bands`` catalog oracle re-derives the semantics with
a plain BETWEEN join in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` intervals containing them
    (``lo_col`` <= ``value_col`` <= ``hi_col``, inclusive both ends).
    Column names must be disjoint across the two sides. ``how`` is
    "inner" or "left" (unmatched left rows keep nulls)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, both have {overlap}")
    w = float(bin_width)
    lb = left.withColumn(
        "__bin", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    contained = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) <= F.col(hi_col)
    )
    if how == "inner":
        return lb.join(rb, "__bin").where(contained).drop("__bin")
    # left join: inner-match first, then re-attach unmatched left rows.
    # The anti-join must be null-safe: plain column-equality would treat
    # NULL as non-matching, so a matched left row carrying a NULL column
    # would ALSO surface as unmatched (duplicated with null right cols).
    matched = lb.join(rb, "__bin").where(contained).drop("__bin")
    m = matched.select(*left.columns).alias("__m")
    l_alias = left.alias("__l")
    cond = None
    for c in left.columns:
        eq = F.col(f"__l.{c}").eqNullSafe(F.col(f"__m.{c}"))
        cond = eq if cond is None else cond & eq
    unmatched = l_alias.join(m, cond, "left_anti").select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns]
    )
    for c in right.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(right.schema[c].dataType)
        )
    return matched.unionByName(unmatched)
