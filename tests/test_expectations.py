"""Expectations operator: each rule family counts its violations on a
deliberately dirty frame, and the row-local family shares one scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.expectations import (
    check_expectations,
    foreign_key,
    in_set,
    not_null,
    satisfies,
    unique,
)


def _report(spark, df, rules):
    return {
        r["rule"]: (r["violations"], r["checked"], r["passed"])
        for r in check_expectations(df, rules).collect()
    }


def test_all_rule_families_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "a", 100),
            (2, -5.0, "b", 100),   # range violation
            (3, None, "a", 200),   # null (fails range too: null != sat)
            (1, 3.0, "zz", None),  # dup id, bad category, null fk
            (4, 7.0, "a", 999),    # orphan fk
        ],
        "id long, v double, cat string, fk long",
    )
    dim = spark.createDataFrame([(100,), (200,)], "k long")
    rep = _report(
        spark,
        df,
        [
            not_null("v"),
            satisfies("v_positive", F.col("v") > 0),
            in_set("cat", ["a", "b"]),
            unique("id"),
            foreign_key("fk", dim, "k"),
        ],
    )
    assert rep["not_null(v)"] == (1, 5, False)
    # v > 0 fails for -5.0 and for the NULL (unknown does not satisfy)
    assert rep["v_positive"] == (2, 5, False)
    assert rep["in_set(cat)"] == (1, 5, False)
    # ids: 1 appears twice -> 1 excess row
    assert rep["unique(id)"] == (1, 5, False)
    # non-null fks checked: 4; orphan: 999
    assert rep["foreign_key(fk)"] == (1, 4, False)


def test_clean_data_passes_everything(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double"
    )
    rep = _report(
        spark, df, [not_null("v"), satisfies("pos", F.col("v") > 0), unique("id")]
    )
    assert all(v[0] == 0 and v[2] for v in rep.values())


def test_row_rules_share_one_scan(spark, documents_df):
    rules = [
        not_null("text"),
        satisfies("chars_pos", F.col("n_chars") > 0),
        in_set("lang", ["en", "de", "fr", "es"]),
    ]
    plan = (
        check_expectations(documents_df, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.lower().count("scan parquet") <= 1


def test_check_expectations_empty_rules(spark):
    """No rules -> an empty typed report, not an IndexError."""
    from wagtail_vector_index_spark.operators.expectations import (
        check_expectations,
    )

    df = spark.createDataFrame([(1,)], ["x"])
    out = check_expectations(df, [])
    assert out.columns == ["rule", "violations", "checked", "passed"]
    assert out.count() == 0
