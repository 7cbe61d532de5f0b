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


def test_pagerank_matches_numpy_power_iteration(spark):
    """Differential: 5 DataFrame PageRank rounds equal the dense numpy
    power iteration on a random directed graph (same simplified update,
    same rounding)."""
    import numpy as np

    from wagtail_vector_index_spark.operators.graph import pagerank

    rng = np.random.default_rng(5)
    n = 25
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, n, size=(80, 2)) if a != b}
    edges = spark.createDataFrame(sorted(pairs), "src int, dst int")
    got = {
        r["node"]: r["pr"]
        for r in pagerank(edges, iterations=5, round_decimals=10).collect()
    }

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    deg = np.zeros(N)
    for a, _ in pairs:
        deg[idx[a]] += 1
    pr = np.full(N, 1.0 / N)
    for _ in range(5):
        s = np.zeros(N)
        for a, b in pairs:
            s[idx[b]] += pr[idx[a]] / deg[idx[a]]
        pr = np.round((1 - 0.85) / N + 0.85 * s, 10)
    for v in nodes:
        assert got[v] == pytest.approx(pr[idx[v]], abs=1e-9)
    assert abs(sum(got.values())) <= 1.0 + 1e-6  # mass bounded (sinks decay)


def test_pagerank_tolerates_colliding_column_names(spark):
    """The generic src/dst API must work when caller columns collide
    with internal names (dst='node', extra 'pr' column)."""
    from wagtail_vector_index_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 9.9), (2, 3, 9.9), (3, 1, 9.9)],
        "src int, node int, pr double",
    )
    out = pagerank(
        edges, src="src", dst="node", iterations=3, round_decimals=10
    ).collect()
    assert len(out) == 3
    # symmetric 3-cycle: all ranks equal 1/3
    for r in out:
        assert r["pr"] == pytest.approx(1 / 3, abs=1e-9)


def test_pagerank_dangling_redistribute_conserves_mass(spark):
    """dangling='redistribute' keeps ranks a probability distribution
    (sum ~1 every graph), matches a numpy power iteration with the
    same dangling term, and agrees with 'drop' on a sink-free graph."""
    import numpy as np

    from wagtail_vector_index_spark.operators.graph import pagerank

    # graph WITH sinks: 0->1, 0->2, 1->2 (2 is a sink)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    got = {
        r["node"]: r["pr"]
        for r in pagerank(
            edges, iterations=20, dangling="redistribute"
        ).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # numpy reference: same recurrence
    n, d = 3, 0.85
    pr = np.full(n, 1.0 / n)
    out = {0: [1, 2], 1: [2]}
    for _ in range(20):
        new = np.full(n, (1 - d) / n)
        m = pr[2]  # sink mass
        for u, vs in out.items():
            for v in vs:
                new[v] += d * pr[u] / len(vs)
        new += d * m / n
        pr = new
    for i in range(n):
        assert got[i] == pytest.approx(pr[i], abs=1e-9)

    # sink-free cycle: both policies identical
    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    drop = {
        r["node"]: r["pr"]
        for r in pagerank(cyc, iterations=8, round_decimals=10).collect()
    }
    redis = {
        r["node"]: r["pr"]
        for r in pagerank(
            cyc, iterations=8, round_decimals=10, dangling="redistribute"
        ).collect()
    }
    assert drop == redis

    # drop policy leaks mass on the sink graph
    dropped = {
        r["node"]: r["pr"]
        for r in pagerank(edges, iterations=20).collect()
    }
    assert sum(dropped.values()) < 0.999


def test_triangle_counts_closed_form(spark):
    """K4 (every node in C(3,2)=3 triangles), one disjoint triangle,
    and a triangle-free chain — counts match the hand answer and
    chain nodes are absent."""
    from wagtail_vector_index_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tri = [(10, 11), (11, 12), (10, 12)]
    chain = [(20, 21), (21, 22), (22, 23)]
    edges = spark.createDataFrame(
        k4 + tri + chain, "src long, dst long"
    )
    out = {r["node"]: r["n_tri"] for r in triangle_counts(edges).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1, 12: 1}


def test_triangle_counts_orientation_invariance(spark):
    """Degree-ordered enumeration must count exactly what the naive
    triple-join counts, on a random graph with duplicate/reversed/self
    edges thrown in."""
    import itertools
    import random

    from wagtail_vector_index_spark.operators.graph import triangle_counts

    rng = random.Random(11)
    nodes = list(range(30))
    base = [
        (a, b) for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.2
    ]
    noisy = base + [(b, a) for a, b in base[:20]] + [(5, 5), (7, 7)]
    edges = spark.createDataFrame(noisy, "src long, dst long")
    out = {r["node"]: r["n_tri"] for r in triangle_counts(edges).collect()}
    es = {tuple(sorted(e)) for e in base}
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= es:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert out == want


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    """Teleporting to a seed keeps rank in its component/neighborhood:
    on two disjoint star graphs, seeding one leaves the other at zero,
    total mass stays <= 1, and the seed outranks uniform PageRank's
    score for it."""
    from wagtail_vector_index_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"),
         ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    ppr = {
        r["node"]: r["pr"]
        for r in pagerank(edges, iterations=10, teleport=seeds).collect()
    }
    assert ppr["x"] == 0.0 and ppr["y"] == 0.0
    assert ppr["a"] > ppr["b"] > 0
    assert sum(ppr.values()) <= 1.0 + 1e-9
    uni = {
        r["node"]: r["pr"]
        for r in pagerank(edges, iterations=10).collect()
    }
    assert ppr["a"] > uni["a"]


def test_personalized_pagerank_guards(spark):
    import pytest

    from wagtail_vector_index_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    empty = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError, match="no nodes"):
        pagerank(edges, teleport=empty)
    seeds = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="teleport composes"):
        pagerank(edges, teleport=seeds, dangling="redistribute")


def test_label_propagation_separates_dense_blocks(spark):
    """Two cliques joined by one bridge edge: LPA assigns each clique
    one community (components would merge them), labels are the clique
    minima, and every node is labeled exactly once."""
    from wagtail_vector_index_spark.operators.graph import label_propagation

    import itertools

    c1 = list(itertools.combinations(range(0, 5), 2))
    c2 = list(itertools.combinations(range(10, 15), 2))
    bridge = [(4, 10)]
    edges = spark.createDataFrame(
        c1 + c2 + bridge, "src long, dst long"
    )
    out = {r["node"]: r["community"] for r in label_propagation(
        edges, rounds=4
    ).collect()}
    assert len(out) == 10
    assert {out[n] for n in range(0, 5)} == {0}
    assert {out[n] for n in range(10, 15)} == {10}


def test_label_propagation_is_deterministic_across_partitionings(spark):
    """Synchronous rounds + total tie order: identical labels no matter
    how the edges are partitioned."""
    import random

    from wagtail_vector_index_spark.operators.graph import label_propagation

    rng = random.Random(5)
    edges = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(150)
    ]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df2 = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    a = {r["node"]: r["community"] for r in label_propagation(df1).collect()}
    b = {r["node"]: r["community"] for r in label_propagation(df2).collect()}
    assert a == b


def test_kcore_peels_tendrils_and_keeps_the_clique(spark):
    """A 5-clique (every degree 4) with pendant chains hanging off it:
    the 3-core is exactly the clique — the chains peel away round by
    round, and the peel must CASCADE (removing a chain tip drops its
    neighbor below k next round)."""
    from wagtail_vector_index_spark.operators.graph import kcore

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    # chain 5-6-7 hangs off clique node 0; chain 8-9 off node 1
    chains = [(0, 5), (5, 6), (6, 7), (1, 8), (8, 9)]
    df = spark.createDataFrame(clique + chains, "src long, dst long")
    out = {r["node"]: r["deg"] for r in kcore(df, k=3, rounds=5).collect()}
    assert out == {i: 4 for i in range(5)}


def test_kcore_extra_rounds_past_convergence_are_noops(spark):
    from wagtail_vector_index_spark.operators.graph import kcore

    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    df = spark.createDataFrame(
        clique + [(0, 10), (10, 11)], "src long, dst long"
    ).repartition(7)
    a = sorted(map(tuple, kcore(df, k=2, rounds=3).collect()))
    b = sorted(map(tuple, kcore(df, k=2, rounds=8).collect()))
    assert a == b
    assert [n for n, _ in a] == [0, 1, 2, 3]


def test_kcore_empty_result_when_graph_too_sparse(spark):
    from wagtail_vector_index_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(path, "src long, dst long")
    assert kcore(df, k=2, rounds=6).count() == 0


def test_hits_ranks_the_popular_authority_first(spark):
    """Bipartite graph: item i1 is bought by all three hubs, i2 by two,
    i3 by one -> auth(i1) > auth(i2) > auth(i3), hubs with more good
    items rank higher, and max-normalization pins top scores at 1.0."""
    from wagtail_vector_index_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [
            ("h1", "i1"), ("h2", "i1"), ("h3", "i1"),
            ("h1", "i2"), ("h2", "i2"),
            ("h3", "i3"),
        ],
        ["src", "dst"],
    )
    out = {r["node"]: r for r in hits(edges, rounds=3).collect()}
    assert out["i1"]["auth"] == 1.0
    assert out["i1"]["auth"] > out["i2"]["auth"] > out["i3"]["auth"]
    assert out["h1"]["hub"] == out["h2"]["hub"] == 1.0
    assert out["h3"]["hub"] < out["h1"]["hub"]
    # bipartite: pure hubs have no authority and vice versa
    assert out["h1"]["auth"] == 0.0
    assert out["i1"]["hub"] == 0.0


def test_hits_deterministic_across_partitionings(spark):
    from wagtail_vector_index_spark.operators.graph import hits

    rows = [(f"u{i % 7}", f"v{i % 11}") for i in range(200)]
    e1 = spark.createDataFrame(rows, ["src", "dst"]).repartition(1)
    e2 = spark.createDataFrame(rows, ["src", "dst"]).repartition(16)
    r1 = sorted(map(tuple, hits(e1, rounds=4, round_decimals=10).collect()))
    r2 = sorted(map(tuple, hits(e2, rounds=4, round_decimals=10).collect()))
    assert r1 == r2


def test_bfs_distances_min_depth_on_a_path_with_shortcut(spark):
    """Diamond + tail: a node reachable two ways gets the SHORTER
    distance; nodes beyond max_depth are absent."""
    from wagtail_vector_index_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),  # long way a->d = 3
            ("a", "d"),                          # shortcut  a->d = 1
            ("d", "e"), ("e", "f"), ("f", "g"),  # tail past max_depth
        ],
        ["src", "dst"],
    )
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, "a", max_depth=3).collect()
    }
    assert out == {"a": 0, "b": 1, "d": 1, "c": 2, "e": 2, "f": 3}


def test_bfs_distances_directed_and_early_exit(spark):
    from wagtail_vector_index_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "a")], ["src", "dst"]
    )
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(
            edges, "a", max_depth=10, directed=True
        ).collect()
    }
    # directed: x->a edge is not walkable from a; early exit after c
    assert out == {"a": 0, "b": 1, "c": 2}


def test_bfs_distances_partition_invariant(spark):
    from wagtail_vector_index_spark.operators.graph import bfs_distances

    rows = [(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(120)]
    e1 = spark.createDataFrame(rows, ["src", "dst"]).repartition(1)
    e2 = spark.createDataFrame(rows, ["src", "dst"]).repartition(16)
    r1 = sorted(map(tuple, bfs_distances(e1, "n0", max_depth=4).collect()))
    r2 = sorted(map(tuple, bfs_distances(e2, "n0", max_depth=4).collect()))
    assert r1 == r2
