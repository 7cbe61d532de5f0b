"""K-means codebook training: inertia decreases, assignment is total."""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.kmeans import (
    _assign,
    inertia,
    train_codebook,
)


@pytest.fixture(scope="module")
def vectors(spark, embeddings_df):
    return embeddings_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vector")
    ).cache()


def test_training_reduces_inertia(vectors):
    init = [
        (i, [float(x) for x in r["vector"]])
        for i, r in enumerate(vectors.orderBy("vec_id").limit(8).collect())
    ]
    before = inertia(_assign(vectors, init, vec_col="vector"))
    centroids, assigned = train_codebook(vectors, k=8, iterations=3)
    after = inertia(assigned)
    assert after <= before + 1e-12
    assert after < before  # real movement on this data


def test_assignment_is_total_and_valid(vectors):
    centroids, assigned = train_codebook(vectors, k=8, iterations=2)
    n = vectors.count()
    assert assigned.count() == n
    cids = {r["cid"] for r in assigned.select("cid").distinct().collect()}
    assert cids <= set(range(8))
    assert len(centroids) == 8
    dim = len(centroids[0][1])
    assert all(len(cv) == dim for _, cv in centroids)


def test_trained_codebook_improves_ivf_recall(spark, vectors):
    """A trained codebook should give IVF at-least-as-good recall@10 as
    the first-k placeholder for the same nprobe."""
    from wagtail_vector_index_spark.operators.knn import ivf_topk, topk_similar

    probe = vectors.where(F.col("vec_id") == 5).first()["vector"]
    exact = {
        r["vec_id"]
        for r in topk_similar(
            vectors.where(F.col("vec_id") != 5),
            list(probe),
            vector_col="vector",
            id_col="vec_id",
            limit=10,
        ).collect()
    }

    def recall(centroid_rows):
        cdf = spark.createDataFrame(centroid_rows, "cid int, cv array<double>")
        got = {
            r["vec_id"]
            for r in ivf_topk(
                vectors.where(F.col("vec_id") != 5),
                cdf,
                list(probe),
                nprobe=2,
                limit=10,
            ).collect()
        }
        return len(got & exact) / len(exact)

    naive = [
        (i, [float(x) for x in r["vector"]])
        for i, r in enumerate(vectors.orderBy("vec_id").limit(8).collect())
    ]
    trained, _ = train_codebook(vectors, k=8, iterations=3)
    assert recall(trained) >= recall(naive) - 0.2  # not worse (tolerance)
    assert recall(trained) > 0
