"""Vector math as JVM-side Spark column expressions.

These power the k-NN operators (reference semantics:
src/wagtail_vector_index/storage/numpy/provider.py:38-59 and
src/wagtail_vector_index/storage/pgvector/models.py:29-58). We implement
*correct* cosine similarity — the reference's numpy provider has an
operator-precedence bug (``dot/norm(q) * norm(d)``,
numpy/provider.py:46-51); every other provider uses true cosine, and so do
we. Distance-method semantics follow the pgvector enum
(src/wagtail_vector_index/storage/pgvector/types.py:4-7): cosine |
euclidean | max_inner_product.

All functions take/return ``Column`` so they stay inside whole-stage
codegen — no Python round-trip. Folds over the array are sequential
(``F.aggregate``), which keeps float summation order deterministic and
matched with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DISTANCE_METHODS = ("cosine", "euclidean", "max_inner_product")


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: sum_i a[i]*b[i] in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """True cosine: dot(a,b) / (||a|| * ||b||)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def max_inner_product_distance(a: Column, b: Column) -> Column:
    """pgvector's MaxInnerProduct ordering key: negative inner product
    (smaller distance == larger inner product)."""
    return -dot_product(a, b)


def distance_col(a: Column, b: Column, method: str) -> Column:
    """Distance column for a configured method (ascending == closer)."""
    if method == "cosine":
        return cosine_distance(a, b)
    if method == "euclidean":
        return euclidean_distance(a, b)
    if method == "max_inner_product":
        return max_inner_product_distance(a, b)
    raise ValueError(f"unknown distance method {method!r}; expected one of {DISTANCE_METHODS}")


def similarity_col(a: Column, b: Column, method: str = "cosine") -> Column:
    """Similarity (descending == closer). For cosine this is true cosine in
    [-1, 1]; thresholds compare directly against it
    (threshold semantics: reference docs/vector-indexes.md:195-229)."""
    if method == "cosine":
        return cosine_similarity(a, b)
    if method == "euclidean":
        return -euclidean_distance(a, b)
    if method == "max_inner_product":
        return dot_product(a, b)
    raise ValueError(f"unknown distance method {method!r}; expected one of {DISTANCE_METHODS}")


def vector_dim(a: Column) -> Column:
    """Dimensionality column — the reference tracks this per row and filters
    on it at query time (pgvector/models.py:70, pgvector/provider.py:112)."""
    return F.array_size(a)
