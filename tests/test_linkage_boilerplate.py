"""Operator tests for remove_boilerplate_lines (dedup.py) and the
Fellegi-Sunter linkage pieces (linkage.py)."""

import math

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.dedup import (
    remove_boilerplate_lines,
)
from wagtail_vector_index_spark.operators.linkage import (
    blocked_pairs,
    fs_field_constants,
    fs_weight,
)


def test_boilerplate_lines_dropped_and_order_kept(spark):
    rows = [
        (1, "s1", ["intro one", "FOOTER", "body a", "FOOTER"]),
        (2, "s1", ["FOOTER", "body b"]),
        (3, "s1", ["body c"]),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "src", "lines"])
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            df, id_col="doc_id", lines_col="lines", group_col="src",
            min_docs=2,
        ).collect()
    }
    # FOOTER appears in docs 1 and 2 -> dropped everywhere (both copies
    # in doc 1); unique lines keep their original order
    assert out[1]["clean_text"] == "intro one\nbody a"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (2, 2)
    assert out[2]["clean_text"] == "body b"
    assert out[3]["clean_text"] == "body c"
    assert out[3]["n_dropped"] == 0


def test_boilerplate_scoped_per_group(spark):
    # the same line in two DIFFERENT sources is not boilerplate in
    # either (frequency is per group)
    rows = [
        (1, "s1", ["shared line", "a"]),
        (2, "s2", ["shared line", "b"]),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "src", "lines"])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(
            df, id_col="doc_id", lines_col="lines", group_col="src",
            min_docs=2,
        ).collect()
    }
    assert out[1] == "shared line\na"
    assert out[2] == "shared line\nb"


def test_boilerplate_all_dropped_doc_survives_empty(spark):
    rows = [
        (1, "s1", ["x"]),
        (2, "s1", ["x"]),
        (3, "s1", []),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, lines array<string>")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            df, id_col="doc_id", lines_col="lines", group_col="src",
            min_docs=2,
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["clean_text"] == "" and out[1]["n_dropped"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0


def test_blocked_pairs_within_block_only(spark):
    rows = [
        (1, "b1", "alice"),
        (2, "b1", "alyce"),
        (3, "b2", "alice"),
    ]
    df = spark.createDataFrame(rows, ["id", "blk", "name"])
    out = blocked_pairs(
        df, id_col="id", block_col="blk", carry=("name",)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert (r["name_a"], r["name_b"]) == ("alice", "alyce")


def test_fs_weight_matches_closed_form(spark):
    df = spark.createDataFrame(
        [(True, True), (True, False), (False, False)], ["a1", "a2"]
    )
    fields = [(F.col("a1"), 0.9, 0.1), (F.col("a2"), 0.8, 0.2)]
    got = [
        r["w"]
        for r in df.select(fs_weight(fields).alias("w")).collect()
    ]
    w1a, w1d = fs_field_constants(0.9, 0.1)
    w2a, w2d = fs_field_constants(0.8, 0.2)
    assert got[0] == pytest.approx(w1a + w2a)
    assert got[1] == pytest.approx(w1a + w2d)
    assert got[2] == pytest.approx(w1d + w2d)
    assert w1a == pytest.approx(math.log2(9.0))
    assert w1d == pytest.approx(math.log2(0.1 / 0.9))


def test_dbscan_cosine_roles_and_clusters(spark):
    """Two dense angular blobs + a between-blobs point + a far
    outlier: blob members are cores in two clusters labeled by their
    minimum member id; the outlier is noise."""
    import math

    from wagtail_vector_index_spark.operators.density import dbscan_cosine

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = (
        [(i, unit(0.00 + 0.01 * i)) for i in range(4)]        # blob A
        + [(10 + i, unit(1.40 + 0.01 * i)) for i in range(4)]  # blob B
        + [(99, unit(-2.8))]                                   # outlier
    )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # eps: cos >= cos(0.1 rad) keeps blob-internal pairs only
    out = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_cosine(
            df, eps_sim=math.cos(0.1), min_pts=4, blocks=3
        ).collect()
    }
    for i in range(4):
        assert out[i] == ("core", 0)
        assert out[10 + i] == ("core", 10)
    assert out[99] == ("noise", None)


def test_dbscan_border_attaches_to_min_core_neighbor(spark):
    """A point within eps of cores from one blob but with too few
    neighbors itself is a border labeled by that blob's cluster."""
    import math

    from wagtail_vector_index_spark.operators.density import dbscan_cosine

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [(i, unit(0.01 * i)) for i in range(5)] + [(50, unit(0.12))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_cosine(
            df, eps_sim=math.cos(0.1), min_pts=5, blocks=2
        ).collect()
    }
    # 0..4 pairwise within 0.04 rad -> all cores, cluster 0; 50 is
    # within eps of cores 3 and 4 only (2 neighbors < minPts-1) ->
    # border of cluster 0
    for i in range(5):
        assert out[i] == ("core", 0)
    assert out[50] == ("border", 0)


def test_dbscan_precomputed_pairs_path(spark):
    """Passing a candidate pairs frame (e.g. from an LSH stage) must
    give the same labeling as the default blocked-GEMM pair stage,
    and the eps filter must apply to the supplied pairs."""
    import math

    from wagtail_vector_index_spark.operators.density import dbscan_cosine

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [(i, unit(0.01 * i)) for i in range(5)] + [(50, unit(2.5))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    eps = math.cos(0.1)
    want = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_cosine(
            df, eps_sim=eps, min_pts=4, blocks=2
        ).collect()
    }
    # exact all-pairs frame with cos_sim, superset of the eps ball
    import itertools

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    rows_d = dict(rows)
    pairs = spark.createDataFrame(
        [
            (a, b, cos(rows_d[a], rows_d[b]))
            for a, b in itertools.combinations(sorted(rows_d), 2)
        ],
        ["id_a", "id_b", "cos_sim"],
    )
    got = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_cosine(
            df, eps_sim=eps, min_pts=4, pairs=pairs
        ).collect()
    }
    assert got == want
    assert got[50] == ("noise", None)
    # symmetric + duplicated + self-paired candidates (an LSH stage
    # upstream of its own dedup) must canonicalize to the same labeling
    messy = pairs.unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "cos_sim",
        )
    ).unionByName(pairs).unionByName(
        pairs.select(F.col("id_a"), F.col("id_a").alias("id_b"),
                     F.lit(1.0).alias("cos_sim")).distinct()
    )
    got_messy = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_cosine(
            df, eps_sim=eps, min_pts=4, pairs=messy
        ).collect()
    }
    assert got_messy == want


def test_dbscan_all_noise_when_no_neighbors(spark):
    """Mutually distant vectors: no pairs, no cores — everything is
    noise and the empty core-edge component step must not blow up."""
    import math

    from wagtail_vector_index_spark.operators.density import dbscan_cosine

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    df = spark.createDataFrame(
        [(i, unit(1.0 * i)) for i in range(5)], ["vec_id", "embedding"]
    )
    out = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_cosine(
            df, eps_sim=math.cos(0.05), min_pts=2, blocks=2
        ).collect()
    }
    assert len(out) == 5
    assert all(v == ("noise", None) for v in out.values())
