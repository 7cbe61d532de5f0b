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


def dot_product_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product unrolled to ``dim`` explicit terms. Higher-order
    functions (``F.aggregate``/``zip_with``) are interpreted per row —
    fine for a few thousand evaluations, a bottleneck for millions (the
    candidate-verify stage of LSH dedup). The unrolled left-associated
    sum stays inside whole-stage codegen AND reproduces the sequential
    fold's float addition order exactly (``((0+t1)+t2)+...``), so
    results are bit-identical to :func:`dot_product` and the DuckDB
    ``list_inner_product`` oracles.

    Pass COLUMN NAMES (strings) when you can: the expression then builds
    as one ``F.expr`` SQL string — a single py4j round trip instead of
    ~4·dim, which is seconds of driver time per query at dim 64+. The
    parsed tree is identical to the Column-built one. Callers must have
    cast the named column to array<double> already (both forms skip the
    per-term cast — see lsh_neardup_pairs for why that cast is poison)."""
    if isinstance(a, str) and isinstance(b, str):
        terms = " + ".join(
            f"element_at({a}, {i}) * element_at({b}, {i})"
            for i in range(1, dim + 1)
        )
        return F.expr(f"0.0D + {terms}")
    aa = a if isinstance(a, Column) else F.col(a)
    bb = b if isinstance(b, Column) else F.col(b)
    total: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        total = total + F.element_at(aa, i) * F.element_at(bb, i)
    return total


def l2_norm_unrolled(a: Column | str, dim: int) -> Column:
    """Unrolled twin of :func:`l2_norm` (same fold order, codegen'd;
    string input = single-py4j-call F.expr path, see
    :func:`dot_product_unrolled`)."""
    if isinstance(a, str):
        terms = " + ".join(
            f"element_at({a}, {i}) * element_at({a}, {i})"
            for i in range(1, dim + 1)
        )
        return F.expr(f"SQRT(0.0D + {terms})")
    total: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        x = F.element_at(a, i)
        total = total + x * x
    return F.sqrt(total)


def cosine_similarity_unrolled(
    a: Column | str, b: Column | str, dim: int
) -> Column:
    """Unrolled twin of :func:`cosine_similarity` — bit-identical values,
    whole-stage-codegen execution. Use when the dimension is known (ANN /
    dedup operators probe it from the first row anyway)."""
    return dot_product_unrolled(a, b, dim) / (
        l2_norm_unrolled(a, dim) * l2_norm_unrolled(b, dim)
    )


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


def jl_signs(out_dim: int, dim: int) -> list[list[int]]:
    """Deterministic Rademacher (+-1) Johnson-Lindenstrauss projection
    matrix derived from sha256 — the single source of truth shared by
    the Spark expression and the generated oracle SQL (same convention
    as minhash_params): sign[k][j] = +1 iff the first 8 hex chars of
    sha256('jl:k:j') are even. Achlioptas 2003: Rademacher entries give
    the JL distance-preservation guarantee with database-friendly
    arithmetic (no gaussians to agree on across engines)."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.sha256(f"jl:{k}:{j}".encode()).hexdigest()[:8], 16
            )
            % 2
            == 0
            else -1
            for j in range(dim)
        ]
        for k in range(out_dim)
    ]


def jl_project_col(
    vec: Column, *, out_dim: int, dim: int, round_decimals: int = 6
) -> Column:
    """Project a ``dim``-vector column to ``out_dim`` via the
    deterministic Rademacher matrix (:func:`jl_signs`), scaled by
    1/sqrt(out_dim). The whole projection is ONE ``transform`` over a
    nested sign-MATRIX literal, each row a sequential
    ``aggregate(zip_with(...))`` fold — fully JVM, zero Python, and a
    tiny expression tree: an explicit unrolled sum at out_dim x dim
    terms was measured to blow codegen heap, and even out_dim separate
    fold expressions cost ~1.4 s of Catalyst ANALYSIS per projection
    (per query run — the dominant cost at any data size). Components
    are rounded to ``round_decimals`` so the values are bit-identical
    to the oracle's (group-summed) replay regardless of either
    engine's float summation order."""
    import math

    scale = 1.0 / math.sqrt(float(out_dim))
    # ONE literal for the whole sign matrix (a single py4j call):
    # building out_dim x dim individual F.lit columns costs >1 s of
    # py4j round trips per projection PER QUERY RUN, and deriving the
    # matrix from in-plan sha2 expressions (though constant-foldable)
    # was measured slower still once the optimizer re-folds it across
    # union/AQE passes. A plain nested-list literal is free at both
    # analysis and execution.
    matrix = F.lit(
        [[float(s) for s in row] for row in jl_signs(out_dim, dim)]
    )
    return F.transform(
        matrix,
        lambda srow: F.round(
            F.aggregate(
                F.zip_with(vec, srow, lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            * F.lit(scale),
            round_decimals,
        ),
    )


def jl_raw_folds(vec: Column, matrix: Column) -> Column:
    """The UNSCALED, UNROUNDED sign folds against a sign-matrix column —
    the shared inner product every JL level is an affine function of.
    Because :func:`jl_signs` derives row k the same way at every
    out_dim, the K-dim projection is ``round(scale_K * folds[:K])``:
    compute the folds ONCE at the largest level, then each level is K
    multiplies instead of K x dim fold work (the fold is an interpreted
    higher-order function — the dominant per-row cost). Same sequential
    summation order as :func:`jl_project_with`, so
    ``round(raw * scale)`` is bit-identical to the direct projection."""
    return F.transform(
        matrix,
        lambda srow: F.aggregate(
            F.zip_with(vec, srow, lambda a, b: a * b),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )


def jl_project_with(
    vec: Column, matrix: Column, *, out_dim: int, round_decimals: int = 6
) -> Column:
    """JL projection against a sign-matrix COLUMN — same sequential
    fold and rounding as :func:`jl_project_col`, but the matrix arrives
    as data (typically a broadcast 1-row frame built from
    :func:`jl_signs`) instead of a plan literal. Use this form when a
    query builds several projections: Catalyst charges ~1 s of
    analysis PER out_dim x dim literal on every run, while a broadcast
    matrix column costs nothing at plan time and one tiny hash join at
    execution."""
    import math

    scale = 1.0 / math.sqrt(float(out_dim))
    return F.transform(
        matrix,
        lambda srow: F.round(
            F.aggregate(
                F.zip_with(vec, srow, lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            * F.lit(scale),
            round_decimals,
        ),
    )


def meanpool_vectors(
    df,
    *,
    group_col: str,
    vec_col: str,
    out_col: str = "pooled",
    round_decimals: int | None = 6,
):
    """Mean-pool many vectors into one per group — the chunk->document
    embedding aggregation every long-document retrieval stack runs
    (embed chunks, serve documents), and the generic "average the
    per-item vectors per entity" reducer.

    posexplode -> per-(group, position) avg -> ordered reassembly: both
    shuffles key on the group (the position rides along), partial
    averages combine map-side, and no row ever carries more than one
    scalar between the explode and the final array — at 100 TB the
    exchange moves (groups x dim) doubles, not the input vectors.
    Reassembly sorts a (position, value) struct array, so the output
    dimension order is exact regardless of shuffle order. Groups with
    vectors of unequal dimension would silently pool per-position
    (short vectors just stop contributing); callers wanting a guard
    should pre-filter on ``array_size``. Rounding pins the
    order-dependent float average for cross-engine replay."""
    exploded = df.select(
        F.col(group_col).alias("__g"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "__i", "__x"
        ),
    )
    m = F.avg("__x")
    if round_decimals is not None:
        m = F.round(m, round_decimals)
    pooled = exploded.groupBy("__g", "__i").agg(m.alias("__m"))
    return (
        pooled.groupBy("__g")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__i", "__m"))),
                lambda s: s["__m"],
            ).alias(out_col)
        )
        .withColumnRenamed("__g", group_col)
    )
