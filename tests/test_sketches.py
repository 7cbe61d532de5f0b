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


def test_bottom_k_fold_bounds_shuffle_rows_and_is_exact(spark):
    """The r5 bottom-k fold: (a) the partial stage emits at most
    partitions x k rows per group — only O(k) state leaves each task,
    never the distinct stream; (b) composing partials is EXACT — the
    final bottom-k equals the bottom-k of a plain distinct+sort."""
    from wagtail_vector_index_spark.operators.sketches import (
        _bottom_k,
        _bottom_k_partials,
    )
    from wagtail_vector_index_spark.functions.text_analysis import sha_hash64

    k = 16
    # 5000 values with heavy duplication across 8 partitions, 2 groups
    df = (
        spark.range(5000)
        .repartition(8)
        .select(
            (F.col("id") % 2).cast("string").alias("g"),
            (sha_hash64((F.col("id") % 700).cast("string"))
             / F.lit(4294967296.0)).alias("__u"),
        )
    )
    partials = _bottom_k_partials(df, ["g"], k)
    # 8 partitions x 2 groups x k = 256 max rows cross the exchange
    assert partials.count() <= 8 * 2 * k

    got = {
        (r["g"], r["__u"]) for r in _bottom_k(df, ["g"], k).collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.col("__u").asc())
    want = {
        (r["g"], r["__u"])
        for r in df.distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    }
    assert got == want and len(got) == 2 * k


def test_countmin_partial_agg_state_is_sketch_sized(spark):
    """The count-min build's shuffle is keyed by (row, bucket): the plan
    must show a partial aggregate BEFORE the exchange (map-side state
    <= depth x width counters per task) — i.e. the sketch is already a
    true partial aggregate; no per-token row survives to the shuffle."""
    from wagtail_vector_index_spark.operators.sketches import (
        countmin_estimates,
    )

    df = spark.createDataFrame([(f"t{i % 9}",) for i in range(200)], "v string")
    cand = spark.createDataFrame([("t0",)], "v string")
    plan = (
        countmin_estimates(df, value_col="v", candidates=cand)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan


def test_quantile_sketch_estimates_and_merge_property(spark):
    """Deterministic-sample quantiles: (a) estimates land within the
    O(1/sqrt(k)) rank-error band of the exact percentiles; (b) the
    sample is a pure function of keys (repartition-invariant); (c) the
    bottom-k-hash sample MERGES: the union's sample equals the bottom-k
    of the two halves' samples — the property that lets executors keep
    partial samples."""
    from wagtail_vector_index_spark.operators.sketches import quantile_sketch
    from wagtail_vector_index_spark.functions.text_analysis import sha_hash64

    df = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).cast("double").alias("v")
    )
    row = quantile_sketch(
        df, key_col="k", value_col="v", quantiles=(0.5, 0.9), k=256
    ).first()
    # uniform 0..999: p50 ~ 500, p90 ~ 900; rank error ~1.96/sqrt(256)=12%
    assert abs(row["p5_est"] - row["p5_exact"]) <= 150
    assert abs(row["p9_est"] - row["p9_exact"]) <= 150
    row2 = quantile_sketch(
        df.repartition(17), key_col="k", value_col="v",
        quantiles=(0.5, 0.9), k=256,
    ).first()
    assert row2["p5_est"] == row["p5_est"] and row2["p9_est"] == row["p9_est"]

    # merge: bottom-256 of (bottom-256(half1) ∪ bottom-256(half2))
    # equals bottom-256 of the union
    def sample_vals(frame):
        return [
            r["__v"]
            for r in frame.select(
                sha_hash64(F.col("k").cast("string")).alias("__u"),
                F.col("v").alias("__v"),
            )
            .orderBy("__u", "__v")
            .limit(256)
            .collect()
        ]

    h1, h2 = df.where(F.col("k") < 10000), df.where(F.col("k") >= 10000)
    whole = sorted(sample_vals(df))
    merged = sorted(
        v
        for _, v in sorted(
            [
                (u, v)
                for half in (h1, h2)
                for u, v in (
                    (r["__u"], r["__v"])
                    for r in half.select(
                        sha_hash64(F.col("k").cast("string")).alias("__u"),
                        F.col("v").alias("__v"),
                    )
                    .orderBy("__u", "__v")
                    .limit(256)
                    .collect()
                )
            ]
        )[:256]
    )
    assert merged == whole


def test_quantile_sketch_empty_input_yields_nulls(spark):
    from wagtail_vector_index_spark.operators.sketches import quantile_sketch

    df = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    ).where(F.col("k") < 0)
    row = quantile_sketch(
        df, key_col="k", value_col="v", quantiles=(0.5,), k=16
    ).first()
    assert row["p5_est"] is None


def test_kmv_overlap_single_pass_matches_composition(spark):
    """kmv_overlap (r6, one scan + one grouped fold) must produce the
    SAME estimates as the two-sketch composition it replaced, plus
    exact counts by inclusion-exclusion over the folded tag counts."""
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_overlap,
        kmv_sketches,
        kmv_union_intersect,
    )

    rows = [("a", f"u{i}") for i in range(500)] + [
        ("b", f"u{i}") for i in range(300, 900)
    ]
    df = spark.createDataFrame(rows, "g string, user string")
    row = kmv_overlap(
        df,
        value_col="user",
        cond_a=F.col("g") == "a",
        cond_b=F.col("g") == "b",
        k=64,
    ).first()
    assert row["union_exact"] == 900
    assert row["intersect_exact"] == 200
    sk = kmv_sketches(df, group_cols=["g"], value_col="user", k=64)
    ref = kmv_union_intersect(
        sk.where(F.col("g") == "a"), sk.where(F.col("g") == "b"), k=64
    ).first()
    assert row["union_est"] == ref["union_est"]
    assert row["intersect_est"] == ref["intersect_est"]

    prod = kmv_overlap(
        df,
        value_col="user",
        cond_a=F.col("g") == "a",
        cond_b=F.col("g") == "b",
        k=64,
        eval_exact=False,
    )
    assert prod.columns == ["union_est", "intersect_est"]
    p = prod.first()
    assert p["union_est"] == row["union_est"]
    assert p["intersect_est"] == row["intersect_est"]


def test_kmv_overlap_one_arrow_stage_and_one_scan(spark):
    """The regression fix's plan contract: exactly ONE Python/Arrow
    stage and ONE scan of the input in the whole query."""
    from wagtail_vector_index_spark.operators.sketches import kmv_overlap

    df = spark.range(1000).select(
        F.col("id").alias("user"), (F.col("id") % 3).alias("seg")
    )
    plan = kmv_overlap(
        df,
        value_col="user",
        cond_a=F.col("seg") == 0,
        cond_b=F.col("seg") == 1,
        k=32,
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert plan.count("Range") == 1


def test_kmv_overlap_empty_segments(spark):
    from wagtail_vector_index_spark.operators.sketches import kmv_overlap

    df = spark.range(10).select(
        F.col("id").alias("user"), F.lit("x").alias("seg")
    )
    row = kmv_overlap(
        df,
        value_col="user",
        cond_a=F.col("seg") == "a",
        cond_b=F.col("seg") == "b",
        k=8,
    ).first()
    assert row["union_exact"] == 0
    assert row["intersect_exact"] == 0
    assert row["union_est"] == 0.0
    assert row["intersect_est"] == 0.0


def test_eval_exact_false_drops_the_exact_pass(spark):
    """Production forms: kmv_distinct/quantile_sketch with
    eval_exact=False emit only sketch columns and their plans carry no
    exact-side aggregate over the input."""
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_distinct,
        quantile_sketch,
    )

    df = spark.range(1000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    prod = kmv_distinct(
        df, group_cols=["grp"], value_col="v", k=64, eval_exact=False
    )
    assert prod.columns == ["grp", "kmv_estimate"]
    ev = kmv_distinct(df, group_cols=["grp"], value_col="v", k=64).first()
    assert prod.first()["kmv_estimate"] == ev["kmv_estimate"]
    # exactly one scan of the input (the eval form pays two)
    plan = prod._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range") == 1

    qdf = spark.range(500).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    qprod = quantile_sketch(
        qdf, key_col="k", value_col="v", quantiles=(0.5, 0.9), k=64,
        eval_exact=False,
    )
    assert qprod.columns == ["p5_est", "p9_est"]
    qev = quantile_sketch(
        qdf, key_col="k", value_col="v", quantiles=(0.5, 0.9), k=64
    ).first()
    qp = qprod.first()
    assert qp["p5_est"] == qev["p5_est"]
    assert qp["p9_est"] == qev["p9_est"]
    qplan = qprod._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in qplan.lower()


def test_heavy_hitters_exact_on_zipf_and_certified(spark):
    """SpaceSaving candidates + exact recount return the true top-k on
    a skewed stream, with the union-bound certificate set; the fold's
    state stays at `capacity` counters."""
    from wagtail_vector_index_spark.operators.sketches import heavy_hitters

    rows = (
        [("hot",)] * 500
        + [("warm",)] * 200
        + [("mild",)] * 50
        + [(f"cold{i}",) for i in range(300)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    out = heavy_hitters(df, value_col="v", k=3, capacity=64).collect()
    assert [(r["v"], r["freq"]) for r in out] == [
        ("hot", 500), ("warm", 200), ("mild", 50)
    ]
    # n=1050, capacity 64 -> bound ~16.4; all three clear it
    assert all(r["guaranteed_exact"] for r in out)


def test_heavy_hitters_certificate_goes_false_when_underprovisioned(spark):
    """With capacity too small for the tail, the k-th hitter fails the
    n/capacity bound and the certificate must say so (the result may
    still be right — the flag is about PROOF, not luck)."""
    from wagtail_vector_index_spark.operators.sketches import heavy_hitters

    rows = [(f"v{i % 40}",) for i in range(400)]  # uniform: all freq 10
    df = spark.createDataFrame(rows, "v string").repartition(4)
    out = heavy_hitters(df, value_col="v", k=5, capacity=8).collect()
    assert len(out) == 5
    # bound = 400/8 = 50 > every freq (10): nothing is certified
    assert not any(r["guaranteed_exact"] for r in out)


def test_heavy_hitters_ties_rank_by_value(spark):
    from wagtail_vector_index_spark.operators.sketches import heavy_hitters

    rows = [("b",)] * 5 + [("a",)] * 5 + [("c",)] * 3
    df = spark.createDataFrame(rows, "v string")
    out = heavy_hitters(df, value_col="v", k=2, capacity=16).collect()
    assert [r["v"] for r in out] == ["a", "b"]


def test_grouped_heavy_hitters_exact_per_group_under_eviction(spark):
    """r6 grouped path: per-group SpaceSaving with capacity below each
    group's cardinality (eviction exercised) still returns each group's
    exact top-k on skewed data, certificates evaluated per group, and
    the global form is unchanged for group_cols=None."""
    from wagtail_vector_index_spark.operators.sketches import heavy_hitters

    rows = (
        [("g1", "hot")] * 400
        + [("g1", "warm")] * 100
        + [("g1", f"tail{i}") for i in range(200)]
        + [("g2", "other")] * 50
        + [("g2", f"t{i % 30}") for i in range(90)]  # uniform freq-3 tail
    )
    df = spark.createDataFrame(rows, "g string, v string").repartition(8)
    out = heavy_hitters(
        df, value_col="v", k=2, capacity=16, group_cols=["g"]
    ).collect()
    got = {(r["g"], r["v"]): (r["freq"], r["guaranteed_exact"]) for r in out}
    # g1: n=700, bound 700/16=43.75 -> both certified
    assert got[("g1", "hot")] == (400, True)
    assert got[("g1", "warm")] == (100, True)
    # g2: n=140, bound 8.75 -> 'other' (50) certified, freq-3 tail not
    assert got[("g2", "other")] == (50, True)
    assert len(out) == 4
    g2_second = [r for r in out if r["g"] == "g2" and r["v"] != "other"][0]
    assert g2_second["freq"] == 3 and not g2_second["guaranteed_exact"]


def test_grouped_quantile_sketch_matches_global_per_group(spark):
    """r6 grouped path: per-group estimates must equal running the
    GLOBAL sketch on each group's rows separately (same bottom-k
    semantics, duplicates kept), across a partitioned input."""
    from wagtail_vector_index_spark.operators.sketches import quantile_sketch

    rows = (
        [("a", i, float(i)) for i in range(300)]
        + [("b", 1000 + i, float(i * 2)) for i in range(80)]
        # duplicate keys: same key twice with different values
        + [("a", 7, 999.0), ("b", 1003, -5.0)]
    )
    df = spark.createDataFrame(
        rows, "g string, k long, v double"
    ).repartition(7)
    grouped = {
        r["g"]: r
        for r in quantile_sketch(
            df, key_col="k", value_col="v", quantiles=(0.5, 0.9), k=64,
            group_cols=["g"],
        ).collect()
    }
    for g in ("a", "b"):
        solo = quantile_sketch(
            df.where(F.col("g") == g), key_col="k", value_col="v",
            quantiles=(0.5, 0.9), k=64,
        ).first()
        assert grouped[g]["p5_est"] == solo["p5_est"], g
        assert grouped[g]["p9_est"] == solo["p9_est"], g
        assert grouped[g]["p5_exact"] == solo["p5_exact"], g


def test_grouped_quantile_sketch_prod_form_and_small_groups(spark):
    from wagtail_vector_index_spark.operators.sketches import quantile_sketch

    rows = [("a", i, float(i)) for i in range(10)] + [("b", 99, 5.0)]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    out = {
        r["g"]: r
        for r in quantile_sketch(
            df, key_col="k", value_col="v", quantiles=(0.5,), k=64,
            group_cols=["g"], eval_exact=False,
        ).collect()
    }
    # unsaturated groups are the exact sample; singleton group = its value
    assert out["b"]["p5_est"] == 5.0
    assert out["a"]["p5_est"] == 4.0  # floor(0.5*9)=4 -> value 4.0
    assert list(out["a"].asDict()) == ["g", "p5_est"]


def test_ams_f2_exact_and_estimate_on_skew(spark):
    """AMS sketch: exact F2 is right, and the depth-32 median estimate
    lands within the median-of-estimators concentration band on a
    skewed distribution (deterministic sha signs -> never flakes)."""
    from wagtail_vector_index_spark.operators.sketches import ams_f2

    # one heavy key (600 rows) + 400 singletons: F2 = 600^2 + 400
    df = spark.range(1000).select(
        F.when(F.col("id") < 600, F.lit(0))
        .otherwise(F.col("id"))
        .alias("v")
    )
    out = ams_f2(df, value_col="v", depth=32).collect()[0]
    assert out["f2_exact"] == 600 * 600 + 400
    assert out["rel_err"] < 0.5
    # estimate can never be negative and is >= the all-distinct floor
    # only in expectation — just pin positivity here
    assert out["f2_estimate"] > 0


def test_ams_f2_production_form_is_sketch_only(spark):
    from wagtail_vector_index_spark.operators.sketches import ams_f2

    df = spark.range(100).select((F.col("id") % 7).alias("v"))
    out = ams_f2(df, value_col="v", depth=8, eval_exact=False)
    assert out.columns == ["f2_estimate"]
    assert out.count() == 1


def test_ams_f2_guards_odd_depth(spark):
    import pytest

    from wagtail_vector_index_spark.operators.sketches import ams_f2

    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        ams_f2(df, value_col="v", depth=7)
    with pytest.raises(ValueError):
        ams_f2(df, value_col="v", depth=0)


def test_kmv_sliding_exact_when_unsaturated(spark):
    """Below k distinct per window the merged sketch IS the exact set:
    estimates equal the exact trailing-window distinct counts."""
    import datetime as dt

    from wagtail_vector_index_spark.operators.sketches import (
        kmv_sliding_distinct,
    )

    rows = []
    base = dt.datetime(2024, 1, 1)
    # day i contributes users {10*i .. 10*i+9}: 3-day windows overlap
    for i in range(5):
        for u in range(10):
            rows.append((base + dt.timedelta(days=i, hours=u), 10 * i + u))
    df = spark.createDataFrame(rows, ["ts", "user_id"])
    out = {
        r["day"].isoformat(): r
        for r in kmv_sliding_distinct(
            df, ts_col="ts", value_col="user_id", window=3, k=64
        ).collect()
    }
    assert len(out) == 5
    # day 0: 10, day 1: 20, days >= 2: 30 (three full disjoint days)
    assert out["2024-01-01"]["exact_distinct"] == 10
    assert out["2024-01-02"]["exact_distinct"] == 20
    assert out["2024-01-03"]["exact_distinct"] == 30
    assert all(r["kmv_estimate"] == r["exact_distinct"] for r in out.values())
    assert all(r["rel_err"] == 0.0 for r in out.values())


def test_kmv_sliding_production_form_is_sketch_only(spark):
    import datetime as dt

    from wagtail_vector_index_spark.operators.sketches import (
        kmv_sliding_distinct,
    )

    rows = [
        (dt.datetime(2024, 1, 1 + i % 3, i % 24), i % 40) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["ts", "user_id"])
    out = kmv_sliding_distinct(
        df, ts_col="ts", value_col="user_id", window=2, k=16,
        eval_exact=False,
    )
    assert out.columns == ["day", "kmv_estimate"]
    assert out.count() == 3


def test_overlap_matrix_exact_when_unsaturated(spark):
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_overlap_matrix,
    )

    # three segments with known overlaps: a={0..19}, b={10..29}, c={25..34}
    rows = (
        [("a", i) for i in range(20)]
        + [("b", i) for i in range(10, 30)]
        + [("c", i) for i in range(25, 35)]
    )
    df = spark.createDataFrame(rows, ["seg", "uid"])
    out = {
        (r["tag_a"], r["tag_b"]): r
        for r in kmv_overlap_matrix(
            df, value_col="uid", tag_col="seg", k=64
        ).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["union_exact"], ab["intersect_exact"]) == (30, 10)
    ac = out[("a", "c")]
    assert (ac["union_exact"], ac["intersect_exact"]) == (30, 0)
    bc = out[("b", "c")]
    assert (bc["union_exact"], bc["intersect_exact"]) == (25, 5)
    # k=64 > every union: the sketch estimates are exact too
    for r in out.values():
        assert r["union_est"] == r["union_exact"]
        assert r["intersect_est"] == r["intersect_exact"]


def test_overlap_matrix_production_form_drops_pair_tags(spark):
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_overlap_matrix,
    )

    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 30)]
    df = spark.createDataFrame(rows, ["seg", "uid"])
    out = kmv_overlap_matrix(
        df, value_col="uid", tag_col="seg", k=64, eval_exact=False
    )
    assert out.columns == ["tag_a", "tag_b", "union_est", "intersect_est"]
    row = out.collect()[0]
    assert (row["union_est"], row["intersect_est"]) == (30.0, 10.0)


def test_countmin_join_size_never_undercounts(spark):
    from wagtail_vector_index_spark.operators.sketches import (
        countmin_join_size,
    )

    # heavy key 7 on both sides: exact join size = 50*30 + singles
    rows = (
        [("a", 7)] * 50 + [("a", i) for i in range(100, 140)]
        + [("b", 7)] * 30 + [("b", i) for i in range(100, 120)]
    )
    df = spark.createDataFrame(rows, ["side", "k"])
    out = countmin_join_size(
        df,
        value_col="k",
        cond_a=F.col("side") == "a",
        cond_b=F.col("side") == "b",
        depth=4,
        width=64,
    ).collect()[0]
    exact = 50 * 30 + 20  # key 7 plus 20 shared singleton keys
    assert out["join_size_exact"] == exact
    assert out["join_size_est"] >= exact  # collisions only inflate
    assert out["rel_overcount"] >= 0.0


def test_countmin_join_size_production_form(spark):
    from wagtail_vector_index_spark.operators.sketches import (
        countmin_join_size,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3)], ["side", "k"]
    )
    out = countmin_join_size(
        df,
        value_col="k",
        cond_a=F.col("side") == "a",
        cond_b=F.col("side") == "b",
        eval_exact=False,
    )
    assert out.columns == ["join_size_est"]
    assert out.collect()[0][0] >= 1


def test_overlap_matrix_pipe_in_tag_values(spark):
    """Tag values containing '|' must not be misrouted into the
    pair-intersection branch (the separator is a non-printable
    sentinel, not a printable char a tag could contain)."""
    from wagtail_vector_index_spark.operators.sketches import (
        kmv_overlap_matrix,
    )

    rows = (
        [("x|y", i) for i in range(20)]
        + [("z", i) for i in range(10, 30)]
    )
    df = spark.createDataFrame(rows, ["seg", "uid"])
    out = {
        (r["tag_a"], r["tag_b"]): r
        for r in kmv_overlap_matrix(
            df, value_col="uid", tag_col="seg", k=64
        ).collect()
    }
    assert set(out) == {("x|y", "z")}
    r = out[("x|y", "z")]
    assert (r["union_exact"], r["intersect_exact"]) == (30, 10)
    assert r["union_est"] == 30.0 and r["intersect_est"] == 10.0


def test_countmin_join_size_overlapping_conditions(spark):
    """A row satisfying BOTH conditions counts on both sides —
    self-join estimation with cond_a == cond_b must square the key
    frequencies, not zero out side b."""
    from wagtail_vector_index_spark.operators.sketches import (
        countmin_join_size,
    )

    rows = [(7,)] * 5 + [(8,)] * 3 + [(9,)]
    df = spark.createDataFrame(rows, ["k"])
    both = F.lit(True)
    out = countmin_join_size(
        df, value_col="k", cond_a=both, cond_b=both, depth=4, width=64
    ).collect()[0]
    assert out["join_size_exact"] == 25 + 9 + 1
    assert out["join_size_est"] >= out["join_size_exact"]
