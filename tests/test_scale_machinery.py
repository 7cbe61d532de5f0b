"""Tests for the 100 TB machinery: salted joins/aggregations (skew) and
bucketed tables (shuffle-free co-located joins)."""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.skew import salted_count, salted_join


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows share one key
    big = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    plain = big.join(small, "k").select("k", "payload", "dim_val")
    salted = salted_join(big, small, "k", buckets=8).select(
        "k", "payload", "dim_val"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_count_matches_group_count(spark):
    df = spark.range(0, 5000).select((F.col("id") % 7).alias("k"))
    plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count(df, "k", buckets=16).collect()}
    assert plain == salted


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketed saveAsTable: a join between co-bucketed tables must not
    shuffle either side (no Exchange above the scans)."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("orders_bkt")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("lineitem_bkt")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("lineitem_bkt").join(
            spark.table("orders_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_partitioned_store_prunes_at_scan(spark, tmp_path):
    """A lang-partitioned write must show PartitionFilters (file-level
    pruning) when filtered on the partition column — the layout that
    makes index_name/dim filters free at 100 TB."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "by_lang")
    docs.write.partitionBy("lang").parquet(path)
    filtered = spark.read.parquet(path).where(F.col("lang") == "en")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    n_en = docs.where(F.col("lang") == "en").count()
    assert filtered.count() == n_en


def test_stratified_sample_controls_mixture(spark):
    from wagtail_vector_index_spark.operators.skew import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fractions = {"en": 1.0, "de": 0.5, "zh": 0.0}
    sampled = stratified_sample(docs, "lang", fractions)
    counts = {
        r["lang"]: r["n"]
        for r in sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts.get("en") == full["en"]          # keep all
    assert "zh" not in counts                      # drop stratum
    assert "fr" not in counts                      # absent from map -> dropped
    assert 0 < counts.get("de", 0) < full["de"]    # thinned
    # deterministic per seed
    again = stratified_sample(docs, "lang", fractions).count()
    assert again == sampled.count()


def test_weighted_sample_is_deterministic_and_weight_biased(spark):
    """A-ES weighted sampling: exact budget, no replacement, identical
    across repartitionings (content-addressed uniforms), and heavy
    weights genuinely oversampled — rows with 20x the weight must
    dominate the sample of a half-heavy population."""
    from wagtail_vector_index_spark.operators.skew import weighted_sample

    rows = [(i, "heavy" if i % 2 == 0 else "light",
             20.0 if i % 2 == 0 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, cls string, w double")

    got = weighted_sample(df, key_col="id", weight_col="w", k=50)
    ids = sorted(r["id"] for r in got.collect())
    assert len(ids) == 50 and len(set(ids)) == 50
    # resplit the data: membership must not change
    ids2 = sorted(
        r["id"]
        for r in weighted_sample(
            df.repartition(13), key_col="id", weight_col="w", k=50
        ).collect()
    )
    assert ids2 == ids
    heavy = sum(1 for i in ids if i % 2 == 0)
    # E[heavy] ~ 47/50 under 20:1 weights; uniform would give ~25
    assert heavy >= 40

    # per-group form: exact per-group budgets, groups independent
    per = weighted_sample(
        df, key_col="id", weight_col="w", k=10, group_col="cls"
    ).collect()
    by_cls = {}
    for r in per:
        by_cls.setdefault(r["cls"], set()).add(r["id"])
    assert len(by_cls["heavy"]) == 10 and len(by_cls["light"]) == 10

    # zero/negative weights are outside the scheme's domain
    z = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 5.0)], "id long, w double"
    )
    kept = weighted_sample(z, key_col="id", weight_col="w", k=10).collect()
    assert [r["id"] for r in kept] == [3]


def test_bloom_semi_join_exact_and_no_false_negatives(spark):
    """r6: the bloomed semi join returns EXACTLY the plain semi join
    (no false negatives by construction, false positives removed by
    the exactness pass); the prefilter-only form is a superset."""
    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.operators.skew import bloom_semi_join

    big = spark.range(5000).select(
        F.col("id"), (F.col("id") % 97).alias("grp")
    )
    small = spark.range(400, 700).select(F.col("id"))
    want = {
        r["id"]
        for r in big.join(small, "id", "left_semi").collect()
    }
    got = {
        r["id"]
        for r in bloom_semi_join(big, small, "id").collect()
    }
    assert got == want
    approx = {
        r["id"]
        for r in bloom_semi_join(big, small, "id", exact=False).collect()
    }
    assert want <= approx
    # an 8 KiB filter over 300 keys should be a TIGHT prefilter
    assert len(approx) <= len(want) + 50


def test_bloom_semi_join_prefilter_cuts_rows_with_tiny_filter(spark):
    """Undersized filter: correctness still holds (exact pass), the
    prefilter just passes more — the m_bits knob trades bytes for
    selectivity, never correctness."""
    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.operators.skew import bloom_semi_join

    big = spark.range(2000)
    small = spark.range(100).select(F.col("id"))
    out = {
        r["id"]
        for r in bloom_semi_join(
            big, small, "id", m_bits=256, k_hashes=2
        ).collect()
    }
    assert out == set(range(100))
