"""Range join operator tests: parity with the naive theta join, bin-edge
containment, overlap multi-match, and left-join nulls."""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 0.0), (2, 499.0), (3, 500.0), (4, 750.0), (5, -10.0), (6, 5000.0)],
        "id long, v double",
    )
    right = spark.createDataFrame(
        [(10, 0.0, 749.0), (11, 500.0, 1249.0), (12, 4000.0, 4500.0)],
        "iv long, lo double, hi double",
    )
    return left, right


def test_matches_theta_join(sides):
    left, right = sides
    got = {
        (r["id"], r["iv"])
        for r in range_join(
            left, right, value_col="v", lo_col="lo", hi_col="hi", bin_width=300
        ).collect()
    }
    want = {
        (r["id"], r["iv"])
        for r in left.join(
            right, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    assert got == want
    # overlap: 500 and 750 land in two/one bands respectively
    assert (3, 10) in got and (3, 11) in got
    # inclusive ends
    assert (4, 10) not in got and (1, 10) in got


def test_no_duplicate_pairs_across_bins(sides):
    left, right = sides
    out = range_join(
        left, right, value_col="v", lo_col="lo", hi_col="hi", bin_width=100
    ).collect()
    pairs = [(r["id"], r["iv"]) for r in out]
    assert len(pairs) == len(set(pairs))


def test_left_join_keeps_unmatched(sides):
    left, right = sides
    out = range_join(
        left,
        right,
        value_col="v",
        lo_col="lo",
        hi_col="hi",
        bin_width=300,
        how="left",
    )
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["id"], []).append(r["iv"])
    assert by_id[5] == [None] and by_id[6] == [None]
    assert set(by_id) == {1, 2, 3, 4, 5, 6}


def test_rejects_overlapping_columns(spark, sides):
    left, _ = sides
    with pytest.raises(ValueError, match="disjoint"):
        range_join(
            left, left, value_col="v", lo_col="v", hi_col="v", bin_width=1
        )


def test_left_join_null_column_not_duplicated(spark):
    """A matched left row carrying a NULL column must not also surface
    as unmatched (the anti-join is null-safe)."""
    left = spark.createDataFrame(
        [(1, None, 100.0), (2, "x", 9999.0)], "id long, tag string, v double"
    )
    right = spark.createDataFrame(
        [(10, 50.0, 150.0)], "iv long, lo double, hi double"
    )
    out = range_join(
        left, right, value_col="v", lo_col="lo", hi_col="hi",
        bin_width=100, how="left",
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["iv"])
    assert by_id == {1: [10], 2: [None]}
