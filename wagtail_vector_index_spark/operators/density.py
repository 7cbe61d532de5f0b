"""Density-based clustering over embedding columns (DBSCAN, EXT).

DBSCAN (Ester et al. 1996) on cosine similarity: a point is CORE when
at least ``min_pts`` points (itself included) sit within the eps-ball
(cosine >= ``eps_sim``); clusters are the connected components of the
core-core neighbor graph; non-core points with a core neighbor are
BORDER and attach to a cluster; everything else is NOISE. Unlike
k-means (operators/kmeans.py) there is no k to pick and no centroid —
density finds arbitrarily-shaped clusters and explicitly names the
outliers, which is why curation pipelines use it to split "dense
near-dup blob" from "long tail" before sampling.

Distributed shape — every stage is an already-scaled primitive:

1. eps-neighbor pairs via :func:`~wagtail_vector_index_spark.operators.
   dedup.block_neardup_pairs` (hash-block pair GEMM — nothing
   collects, nothing broadcasts, work O(N²/B²) per task);
2. degrees: one count per side of the pair list (node-keyed agg);
3. clusters: :func:`~wagtail_vector_index_spark.operators.dedup.
   connected_components` over the core-core edge subset
   (large-star/small-star pointer doubling, O(log n) rounds);
4. border attachment: each non-core point joins the cluster of its
   MINIMUM core neighbor id — the deterministic tie rule (textbook
   DBSCAN leaves border assignment order-dependent; a distributed
   engine must pin it).

Cluster labels are the component minimum (a member core id), so the
whole labeling is a pure function of the input — replayable by a
recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan_cosine(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps_sim: float = 0.5,
    min_pts: int = 4,
    blocks: int = 8,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Returns one row per input point: ``(id, role, cluster)`` with
    role in {'core', 'border', 'noise'} and cluster = the component's
    minimum core id (NULL for noise). Pass a precomputed ``pairs``
    frame (id_a, id_b, cos_sim — e.g. from an LSH candidate stage) to
    reuse neighbor work; by default exact pairs come from the blocked
    GEMM. Caller-supplied pairs are canonicalized defensively
    (least/greatest + distinct, self-pairs dropped): an LSH candidate
    stage upstream of its own dedup may emit symmetric or duplicate
    rows, which would otherwise double-count degrees and misclassify
    core/border points."""
    from wagtail_vector_index_spark.operators.dedup import (
        block_neardup_pairs,
        connected_components,
    )

    if pairs is None:
        pairs = block_neardup_pairs(
            df,
            id_col=id_col,
            vec_col=vec_col,
            threshold=float(eps_sim),
            blocks=int(blocks),
        )
    else:
        # canonicalize: the blocked-GEMM default already emits distinct
        # id_a < id_b pairs, but caller-supplied candidates may be
        # symmetric/duplicated/self-paired — normalize so degrees count
        # each unordered neighbor pair exactly once
        pairs = (
            pairs.where(F.col("cos_sim") >= float(eps_sim))
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
    # lazy localCheckpoint: the pair list feeds FIVE downstream branches
    # (sym x2 via union, degree agg, core-edge semi-joins, border
    # attach) — without a lineage cut Catalyst re-inlines the blocked
    # GEMM subtree into every branch (26 python stages in the executed
    # plan; the kernel re-ran per branch). Blocks materialize once in
    # the first action and are released by the ContextCleaner.
    pairs = pairs.localCheckpoint(eager=False)
    edges = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    )
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("__deg"))
    core = deg.where(F.col("__deg") >= int(min_pts) - 1).select(
        F.col("u").alias("__cid")
    )
    core_edges = (
        edges.join(
            core.select(F.col("__cid").alias("u")), "u", "left_semi"
        ).join(
            core.select(F.col("__cid").alias("v")), "v", "left_semi"
        )
    )
    comp = connected_components(
        core_edges.select(
            F.col("u").alias("id_a"), F.col("v").alias("id_b")
        ),
        out_id="__cid",
        out_comp="__comp",
    )
    # isolated cores (no core neighbor) form their own singleton cluster
    core_lbl = core.join(comp, "__cid", "left").select(
        "__cid", F.coalesce("__comp", F.col("__cid")).alias("__comp")
    )
    # border: non-core with >= 1 core neighbor; attach via MIN core
    # neighbor id (deterministic), then map that core to its cluster
    nbr_core = (
        sym.join(
            core_lbl.select(F.col("__cid").alias("v"), "__comp"), "v"
        )
        .groupBy("u")
        .agg(F.min(F.struct(F.col("v"), F.col("__comp"))).alias("__best"))
        .select("u", F.col("__best.__comp").alias("__bcomp"))
    )
    base = df.select(F.col(id_col).alias("id"))
    out = (
        base.join(
            core_lbl.select(F.col("__cid").alias("id"), "__comp"),
            "id",
            "left",
        )
        .join(nbr_core.select(F.col("u").alias("id"), "__bcomp"), "id", "left")
        .select(
            "id",
            F.when(F.col("__comp").isNotNull(), F.lit("core"))
            .when(F.col("__bcomp").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("__comp", "__bcomp").alias("cluster"),
        )
    )
    return out
