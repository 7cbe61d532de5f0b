"""Declarative data-quality expectations (the Deequ/Great-Expectations
shape) — EXT.

A 100 TB ingest runs constraint checks BEFORE anything downstream
trusts the data. The engine shape matters more than the rule list: all
row-local rules (not-null, range, set membership) compile into ONE
aggregate over ONE scan — each rule is a ``sum(violation_flag)``
column, map-side combinable, so checking 10 rules costs the same scan
as checking one. Uniqueness is one groupBy on the key (count of
over-represented keys); referential integrity is one broadcast-able
anti-join per foreign key. Nothing ever materializes the violating
rows unless asked.

Report: one row per rule — (rule, violations, checked, passed).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named expectation. ``kind`` selects the execution family:
    row-local rules carry a violation ``Column``; ``unique`` carries a
    key column name; ``foreign_key`` carries (col, dim_df, dim_col)."""

    name: str
    kind: str
    violation: Column | None = None
    col: str | None = None
    dim: DataFrame | None = None
    dim_col: str | None = None


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "row", F.col(col).isNull())


def satisfies(name: str, predicate: Column) -> Rule:
    """Rows must satisfy ``predicate``; violations are rows where it is
    false OR null (an unknown does not satisfy a constraint)."""
    return Rule(name, "row", ~F.coalesce(predicate, F.lit(False)))


def in_set(col: str, values: list) -> Rule:
    return satisfies(
        f"in_set({col})", F.col(col).isin(*values)
    )


def unique(col: str) -> Rule:
    return Rule(f"unique({col})", "unique", col=col)


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(
        f"foreign_key({col})", "fk", col=col, dim=dim, dim_col=dim_col
    )


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, violations, checked, passed)
    one row per rule. Row-local rules share a single one-scan aggregate;
    ``unique`` adds one groupBy on its key; each ``foreign_key`` adds
    one anti-join (broadcast when the dimension is small — exactly the
    runtime-filter shape)."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__checked")]
    row_rules = [r for r in rules if r.kind == "row"]
    for i, r in enumerate(row_rules):
        aggs.append(
            F.sum(r.violation.cast("long")).alias(f"__v{i}")
        )
    base = df.agg(*aggs)
    reports = []
    if row_rules:
        stack = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.col(f"__v{i}").alias("violations"),
                    )
                    for i, r in enumerate(row_rules)
                ]
            )
        ).alias("__r")
        reports.append(
            base.select(stack, F.col("__checked")).select(
                F.col("__r.rule").alias("rule"),
                F.coalesce(F.col("__r.violations"), F.lit(0)).alias(
                    "violations"
                ),
                F.col("__checked").alias("checked"),
            )
        )
    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(r.col)
                .agg(F.count(F.lit(1)).alias("__n"))
                .agg(
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("__n") > 1, F.col("__n") - 1
                            ).otherwise(F.lit(0))
                        ),
                        F.lit(0),
                    ).alias("violations"),
                    F.coalesce(F.sum("__n"), F.lit(0)).alias("checked"),
                )
                .select(F.lit(r.name).alias("rule"), "violations", "checked")
            )
            reports.append(dup)
        elif r.kind == "fk":
            orphans = (
                df.select(F.col(r.col).alias("__k"))
                .where(F.col("__k").isNotNull())
                .join(
                    F.broadcast(
                        r.dim.select(F.col(r.dim_col).alias("__k")).distinct()
                    ),
                    "__k",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            checked = df.where(F.col(r.col).isNotNull()).agg(
                F.count(F.lit(1)).alias("checked")
            )
            reports.append(
                orphans.crossJoin(checked).select(
                    F.lit(r.name).alias("rule"), "violations", "checked"
                )
            )
    if not reports:
        # no rules: an empty report with the full schema, not a crash
        return df.sparkSession.createDataFrame(
            [], "rule string, violations long, checked long, passed boolean"
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("passed", F.col("violations") == 0)
