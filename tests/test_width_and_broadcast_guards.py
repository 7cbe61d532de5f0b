"""r13 guards: the graph broadcast-declaration size gate and the shared
``ensure_parallelism`` width probe.

The broadcast knobs (``broadcast_ranks`` / ``broadcast_scores`` /
``broadcast_filter`` / ``broadcast_labels`` / the personalized-teleport
seed join) are caller declarations that the node-grain side is small.
r13 gates each declaration on one bounded row-count probe so a
mis-declared huge node set falls back to the shuffled plan with a
warning instead of OOMing the executors — results must be IDENTICAL on
both paths (the declaration only changes plan shape, never semantics).
"""
from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators._util import ensure_parallelism
from wagtail_vector_index_spark.operators.graph import (
    _BCAST_CAP_CONF,
    _honor_broadcast_declaration,
    hits,
    kcore,
    label_propagation,
    pagerank,
)


@pytest.fixture()
def tiny_cap(spark):
    """Force every broadcast declaration to be rejected (cap=2 rows)."""
    spark.conf.set(_BCAST_CAP_CONF, "2")
    yield
    spark.conf.unset(_BCAST_CAP_CONF)


def _clique_plus_tendrils(spark):
    # 4-clique {0..3} plus tendrils 3-4-5: the clique survives k=3.
    pairs = [
        (a, b) for a in range(4) for b in range(4) if a < b
    ] + [(3, 4), (4, 5)]
    return spark.createDataFrame(pairs, "src long, dst long")


def test_guard_honors_small_and_rejects_large(spark):
    assert _honor_broadcast_declaration(spark, 10, what="t") is True
    with pytest.warns(RuntimeWarning, match="broadcastMaxRows"):
        assert (
            _honor_broadcast_declaration(spark, 10**9, what="t") is False
        )


def test_guard_disabled_by_nonpositive_cap(spark):
    spark.conf.set(_BCAST_CAP_CONF, "0")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert (
                _honor_broadcast_declaration(spark, 10**12, what="t")
                is True
            )
    finally:
        spark.conf.unset(_BCAST_CAP_CONF)


def test_kcore_rejected_broadcast_matches_plain(spark, tiny_cap):
    edges = _clique_plus_tendrils(spark)
    plain = sorted(map(tuple, kcore(edges, k=3, rounds=4).collect()))
    with pytest.warns(RuntimeWarning, match="kcore"):
        gated = sorted(
            map(
                tuple,
                kcore(
                    edges, k=3, rounds=4, broadcast_filter=True
                ).collect(),
            )
        )
    assert gated == plain and len(plain) == 4


def test_kcore_honored_broadcast_matches_plain(spark):
    edges = _clique_plus_tendrils(spark)
    plain = sorted(map(tuple, kcore(edges, k=3, rounds=4).collect()))
    bcast = sorted(
        map(
            tuple,
            kcore(edges, k=3, rounds=4, broadcast_filter=True).collect(),
        )
    )
    assert bcast == plain


def test_label_propagation_rejected_broadcast_matches_plain(
    spark, tiny_cap
):
    edges = _clique_plus_tendrils(spark)
    plain = {
        r["node"]: r["community"]
        for r in label_propagation(edges, rounds=3).collect()
    }
    with pytest.warns(RuntimeWarning, match="label_propagation"):
        gated = {
            r["node"]: r["community"]
            for r in label_propagation(
                edges, rounds=3, broadcast_labels=True
            ).collect()
        }
    assert gated == plain


def test_hits_rejected_broadcast_matches_plain(spark, tiny_cap):
    edges = _clique_plus_tendrils(spark)
    plain = sorted(
        map(tuple, hits(edges, rounds=3, round_decimals=10).collect())
    )
    with pytest.warns(RuntimeWarning, match="hits"):
        gated = sorted(
            map(
                tuple,
                hits(
                    edges,
                    rounds=3,
                    round_decimals=10,
                    broadcast_scores=True,
                ).collect(),
            )
        )
    assert gated == plain


def test_pagerank_rejected_broadcast_matches_plain(spark, tiny_cap):
    edges = _clique_plus_tendrils(spark)
    plain = {
        r["node"]: round(r["pr"], 10)
        for r in pagerank(edges, iterations=3).collect()
    }
    with pytest.warns(RuntimeWarning, match="pagerank"):
        gated = {
            r["node"]: round(r["pr"], 10)
            for r in pagerank(
                edges, iterations=3, broadcast_ranks=True
            ).collect()
        }
    assert gated == plain


def test_pagerank_teleport_rejected_broadcast_matches_plain(
    spark, tiny_cap
):
    edges = _clique_plus_tendrils(spark)
    # 3 seeds > cap=2 so the seed-join declaration is rejected
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    with pytest.warns(RuntimeWarning, match="teleport"):
        gated = {
            r["node"]: round(r["pr"], 10)
            for r in pagerank(
                edges, iterations=3, teleport=seeds
            ).collect()
        }
    spark.conf.unset(_BCAST_CAP_CONF)
    plain = {
        r["node"]: round(r["pr"], 10)
        for r in pagerank(edges, iterations=3, teleport=seeds).collect()
    }
    assert gated == plain


# --- ensure_parallelism width probe -----------------------------------


def test_width_probe_spreads_single_file_source(spark, tmp_path):
    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "one_file.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) < target
    out = ensure_parallelism(df, "id")
    assert out.rdd.getNumPartitions() == target
    assert sorted(r["id"] for r in out.collect()) == list(range(100))


def test_width_probe_noop_on_wide_file_source(spark, tmp_path):
    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "wide.parquet")
    spark.range(1000).repartition(target * 2).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= target
    assert ensure_parallelism(df, "id") is df


def test_width_probe_noop_on_wide_nonfile_frame(spark):
    # ADVICE r12: a checkpointed / in-memory frame reports zero input
    # files; the pre-r13 probe hash-shuffled it even when already wide.
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target * 2).localCheckpoint()
    assert len(df.inputFiles()) == 0
    assert ensure_parallelism(df, "id") is df


def test_width_probe_spreads_narrow_nonfile_frame(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(50).coalesce(1)
    out = ensure_parallelism(df, "id")
    assert out.rdd.getNumPartitions() == target
    assert sorted(r["id"] for r in out.collect()) == list(range(50))
