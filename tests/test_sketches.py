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
