"""Property-based tests (hypothesis): connected_components against a
union-find reference, range_join against the naive theta join — random
structures, not hand-picked cases."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=40,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per node
    return {x: find(x) for x in parent}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    from wagtail_vector_index_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == _union_find(edges)


intervals_strategy = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 30)),
    min_size=1,
    max_size=15,
)
values_strategy = st.lists(st.integers(-60, 90), min_size=1, max_size=25)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=values_strategy, ivs=intervals_strategy)
def test_range_join_matches_theta(spark, vals, ivs):
    from wagtail_vector_index_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "lid long, v double"
    )
    right = spark.createDataFrame(
        [(j, float(lo), float(lo + span)) for j, (lo, span) in enumerate(ivs)],
        "rid long, lo double, hi double",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(
            left, right, value_col="v", lo_col="lo", hi_col="hi", bin_width=7
        ).collect()
    }
    want = {
        (r["lid"], r["rid"])
        for r in left.join(
            right, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    assert got == want
