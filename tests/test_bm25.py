"""BM25 operator golden test against a hand-rolled reference scorer."""

import math

from wagtail_vector_index_spark.operators.bm25 import bm25_scores

DOCS = [
    (1, "spark join hash join merge"),
    (2, "scan filter scan scan project"),
    (3, "window sort agg"),
    (4, "join scan join"),
]


def _reference(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: float(sum(1 for t in toks.values() if q in t)) for q in terms
    }
    out = {}
    for i, t in toks.items():
        s = 0.0
        for q in terms:
            tf = float(t.count(q))
            if not tf:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s:
            out[i] = s
    return out


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(df, ["join", "scan"]).collect()
    }
    want = _reference(DOCS, ["join", "scan"])
    assert set(got) == set(want) == {1, 2, 4}  # doc 3 matches nothing
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    # repeated terms score higher than single occurrences, all else equal
    assert got[4] > got[1] or got[4] > got[2]


def test_rrf_fuse_golden(spark):
    from wagtail_vector_index_spark.operators.hybrid import rrf_fuse

    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(2, 5.0), (4, 4.0)], "doc_id long, t double"
    )
    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([(a, "s"), (b, "t")], k=60).collect()
    }
    assert got[1] == 1 / 61
    assert got[2] == 1 / 62 + 1 / 61  # rank 2 in a, rank 1 in b
    assert got[3] == 1 / 63
    assert got[4] == 1 / 62
    # candidate union: doc 4 appears though absent from ranker a
    assert set(got) == {1, 2, 3, 4}
