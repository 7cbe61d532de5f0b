import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.vector import (
    cosine_similarity,
    distance_col,
    dot_product,
    euclidean_distance,
    l2_norm,
    similarity_col,
    vector_dim,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        (3, [0.9, 0.1, 0.0], [1.0, 0.0, 0.0]),
        (4, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    ]
    return spark.createDataFrame(rows, "id int, a array<double>, b array<double>")


def _collect(df, col):
    return {r["id"]: r["val"] for r in df.select("id", col.alias("val")).collect()}


def test_dot_product(vec_df):
    vals = _collect(vec_df, dot_product(F.col("a"), F.col("b")))
    assert vals[1] == 1.0
    assert vals[2] == 0.0
    assert vals[4] == 32.0


def test_l2_norm(vec_df):
    vals = _collect(vec_df, l2_norm(F.col("a")))
    assert vals[1] == 1.0
    assert vals[4] == pytest.approx(math.sqrt(14))


def test_cosine_is_true_cosine(vec_df):
    """The reference numpy provider computes (dot/||q||)*||d|| by operator
    precedence (numpy/provider.py:46-51); we require true cosine."""
    vals = _collect(vec_df, cosine_similarity(F.col("a"), F.col("b")))
    assert vals[1] == pytest.approx(1.0)
    assert vals[2] == pytest.approx(0.0)
    expected = np.dot([0.9, 0.1, 0], [1, 0, 0]) / (
        np.linalg.norm([0.9, 0.1, 0]) * 1.0
    )
    assert vals[3] == pytest.approx(expected)
    assert vals[4] == pytest.approx(
        32.0 / (math.sqrt(14) * math.sqrt(77))
    )


def test_euclidean(vec_df):
    vals = _collect(vec_df, euclidean_distance(F.col("a"), F.col("b")))
    assert vals[2] == pytest.approx(math.sqrt(2))
    assert vals[4] == pytest.approx(math.sqrt(27))


def test_distance_and_similarity_methods(vec_df):
    for method in ("cosine", "euclidean", "max_inner_product"):
        d = _collect(vec_df, distance_col(F.col("a"), F.col("b"), method))
        s = _collect(vec_df, similarity_col(F.col("a"), F.col("b"), method))
        # similarity order is the reverse of distance order
        assert sorted(d, key=d.get) == sorted(s, key=s.get, reverse=True)
    with pytest.raises(ValueError):
        distance_col(F.col("a"), F.col("b"), "nope")


def test_vector_dim(vec_df):
    vals = _collect(vec_df, vector_dim(F.col("a")))
    assert set(vals.values()) == {3}


def test_works_on_float_arrays(spark):
    """embeddings.parquet is array<float>; expressions must cast."""
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id int, v array<float>")
    val = df.select(dot_product(F.col("v"), F.col("v")).alias("d")).first()["d"]
    assert val == pytest.approx(5.0)


def test_meanpool_vectors_exact_and_ordered(spark):
    from wagtail_vector_index_spark.functions.vector import meanpool_vectors

    df = spark.createDataFrame(
        [
            ("d1", [1.0, 2.0, 30.0]),
            ("d1", [3.0, 4.0, 10.0]),
            ("d2", [5.0, 6.0, 7.0]),
        ],
        ["doc", "v"],
    )
    out = {
        r["doc"]: r["pooled"]
        for r in meanpool_vectors(
            df, group_col="doc", vec_col="v", round_decimals=None
        ).collect()
    }
    assert out["d1"] == [2.0, 3.0, 20.0]
    assert out["d2"] == [5.0, 6.0, 7.0]


def test_meanpool_vectors_order_insensitive_across_partitionings(spark):
    from wagtail_vector_index_spark.functions.vector import meanpool_vectors

    rows = [("g", [float(i), float(i * i % 7)]) for i in range(50)]
    a = spark.createDataFrame(rows, ["doc", "v"]).repartition(1)
    b = spark.createDataFrame(rows, ["doc", "v"]).repartition(16)
    ra = meanpool_vectors(a, group_col="doc", vec_col="v").collect()
    rb = meanpool_vectors(b, group_col="doc", vec_col="v").collect()
    assert ra[0]["pooled"] == rb[0]["pooled"]
