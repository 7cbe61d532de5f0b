"""PCA power iteration (operators/pca.py): differential vs numpy SVD,
bounded partial state, and the projection fold."""

import numpy as np
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.pca import (
    gram_matrix,
    pca_power_component,
    project_component,
)


def test_pca_component_matches_numpy_svd(spark):
    """The distributed power iteration recovers the top right singular
    vector of an anisotropic cloud (|cosine| ~ 1 vs numpy SVD)."""
    rng = np.random.default_rng(3)
    d = 16
    # strong variance along a planted direction
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    X = rng.normal(size=(2000, d)) + 6.0 * np.outer(rng.normal(size=2000), u)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "id long, v array<double>",
    )
    comp = np.array(pca_power_component(df, vec_col="v", dim=d, iterations=12))
    top = np.linalg.svd(X, full_matrices=False)[2][0]
    assert abs(float(comp @ top)) > 0.999

    # projection fold: matches numpy dot (sequential fold, rounded)
    proj = {
        r["id"]: r["pc1"]
        for r in project_component(df, comp, vec_col="v").limit(50).collect()
    }
    for i, p in proj.items():
        assert p == round(float(X[i] @ comp), 6) or abs(
            p - float(X[i] @ comp)
        ) < 1e-5


def test_gram_fold_state_is_dim_squared_per_task(spark):
    """The Gram pass emits exactly dim^2 rows per non-empty task — the
    exchange never carries data-sized traffic — and the merged table
    equals numpy's X^T X."""
    rng = np.random.default_rng(4)
    d = 8
    X = rng.normal(size=(500, d))
    df = spark.createDataFrame(
        [(X[i].tolist(),) for i in range(len(X))], "v array<double>"
    ).repartition(7)
    g = gram_matrix(df, vec_col="v", dim=d, round_decimals=None)
    rows = g.collect()
    assert len(rows) == d * d
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
    assert np.allclose(G, X.T @ X, atol=1e-8)


def test_jl_projection_preserves_cosine_and_is_deterministic(spark):
    """Rademacher JL projection: 64->32 keeps pairwise cosines within a
    loose JL band on unit vectors, output is a pure function of the
    input (no RNG), and the sign matrix matches its sha definition."""
    import hashlib

    from wagtail_vector_index_spark.functions.vector import (
        jl_project_col,
        jl_signs,
    )

    s = jl_signs(4, 6)
    for k in range(4):
        for j in range(6):
            want = (
                1
                if int(
                    hashlib.sha256(f"jl:{k}:{j}".encode()).hexdigest()[:8],
                    16,
                )
                % 2
                == 0
                else -1
            )
            assert s[k][j] == want

    rng = np.random.default_rng(9)
    X = rng.normal(size=(60, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "id long, v array<double>",
    )
    proj = {
        r["id"]: np.array(r["p"])
        for r in df.select(
            "id", jl_project_col(F.col("v"), out_dim=32, dim=64).alias("p")
        ).collect()
    }
    # distance preservation: mean |cos_projected - cos_full| small
    errs = []
    for i in range(0, 30):
        for j in range(30, 60):
            a, b = proj[i], proj[j]
            cp = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            errs.append(abs(cp - float(X[i] @ X[j])))
    assert np.mean(errs) < 0.15 and np.max(errs) < 0.55
    # deterministic across partitionings
    proj2 = {
        r["id"]: np.array(r["p"])
        for r in df.repartition(11)
        .select(
            "id", jl_project_col(F.col("v"), out_dim=32, dim=64).alias("p")
        )
        .collect()
    }
    for i in proj:
        assert (proj[i] == proj2[i]).all()


def test_pca_deflation_recovers_top_two_directions(spark):
    """Deflated power iteration: two planted orthogonal variance
    directions are recovered in order (|cos| ~ 1 vs numpy SVD), the
    eigenvalues decrease, and the components are near-orthogonal."""
    from wagtail_vector_index_spark.operators.pca import pca_power_components

    rng = np.random.default_rng(6)
    d = 12
    u1 = np.zeros(d); u1[0] = 1.0
    u2 = np.zeros(d); u2[1] = 1.0
    X = (
        rng.normal(size=(3000, d)) * 0.3
        + 8.0 * np.outer(rng.normal(size=3000), u1)
        + 4.0 * np.outer(rng.normal(size=3000), u2)
    )
    df = spark.createDataFrame(
        [(r.tolist(),) for r in X], "v array<double>"
    )
    comps = pca_power_components(df, vec_col="v", dim=d, k=2, iterations=12)
    (v1, l1), (v2, l2) = comps
    v1, v2 = np.array(v1), np.array(v2)
    svd_v = np.linalg.svd(X, full_matrices=False)[2]
    assert abs(float(v1 @ svd_v[0])) > 0.999
    assert abs(float(v2 @ svd_v[1])) > 0.99
    assert l1 > l2 > 0
    assert abs(float(v1 @ v2)) < 0.01
