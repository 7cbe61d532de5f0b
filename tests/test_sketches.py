"""KMV distinct sketch (operators/sketches.py)."""

from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_saturation(spark):
    # 10 distinct values with k=64: sketch not saturated -> exact answer
    df = spark.range(100).select(
        F.lit("g").alias("grp"), (F.col("id") % 10).alias("v")
    )
    out = kmv_distinct(df, group_cols=["grp"], value_col="v", k=64).collect()
    assert out[0]["exact_distinct"] == 10
    assert out[0]["kmv_estimate"] == 10.0
    assert out[0]["rel_err"] == 0.0


def test_kmv_estimates_within_tolerance_when_saturated(spark):
    # 1000 distinct values, k=64 -> expect ~1/sqrt(62) ~ 13% typical error;
    # assert a loose 40% bound (deterministic hash, so this never flakes)
    df = spark.range(1000).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
    out = kmv_distinct(df, group_cols=["grp"], value_col="v", k=64).collect()
    est = out[0]["kmv_estimate"]
    assert out[0]["exact_distinct"] == 1000
    assert 600 <= est <= 1400
    assert out[0]["rel_err"] < 0.4


def test_kmv_merge_estimates_union_and_intersection(spark):
    """Sketch-merge property: union/intersection estimates computed ONLY
    from two bottom-k sketches land within the theoretical error band
    (~1/sqrt(k-2) ~ 13% for k=64) of the exact values."""
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_sketches,
        kmv_union_intersect,
    )

    rows = [("a", f"u{i}") for i in range(500)] + [
        ("b", f"u{i}") for i in range(300, 900)
    ]
    df = spark.createDataFrame(rows, "g string, user string")
    sk = kmv_sketches(df, group_cols=["g"], value_col="user", k=64)
    est = kmv_union_intersect(
        sk.where(F.col("g") == "a"), sk.where(F.col("g") == "b"), k=64
    ).first()
    # exact: union = 900, intersection = 200
    assert abs(est["union_est"] - 900) / 900 < 0.35
    assert abs(est["intersect_est"] - 200) / 200 < 0.6

    # unsaturated sketches are exact
    small = spark.createDataFrame(
        [("a", f"u{i}") for i in range(20)]
        + [("b", f"u{i}") for i in range(10, 40)],
        "g string, user string",
    )
    sk2 = kmv_sketches(small, group_cols=["g"], value_col="user", k=64)
    est2 = kmv_union_intersect(
        sk2.where(F.col("g") == "a"), sk2.where(F.col("g") == "b"), k=64
    ).first()
    assert est2["union_est"] == 40.0
    assert est2["intersect_est"] == 10.0


def test_countmin_never_undercounts_and_is_tight_when_sparse(spark):
    from wagtail_vector_index_spark.operators.sketches import (
        countmin_estimates,
    )

    rows = [(f"tok{i % 20}",) for i in range(400)] + [("rare",)]
    df = spark.createDataFrame(rows, "v string")
    cand = spark.createDataFrame(
        [("tok0",), ("tok7",), ("rare",), ("absent",)], "v string"
    )
    est = {
        r["v"]: r["cm_estimate"]
        for r in countmin_estimates(
            df, value_col="v", candidates=cand, depth=4, width=512
        ).collect()
    }
    # exact counts: tok0/tok7 = 20, rare = 1, absent = 0
    assert est["tok0"] >= 20 and est["tok7"] >= 20 and est["rare"] >= 1
    # 21 distinct values in 4x512 buckets: collisions vanishingly likely
    assert est["tok0"] == 20 and est["absent"] == 0
