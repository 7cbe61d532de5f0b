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


def test_redact_pii_col(spark):
    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.functions.text_analysis import (
        redact_pii_col,
    )

    rows = [
        (1, "contact jane.doe+spam@example.co.uk for details"),
        (2, "call (555) 123-4567 or +1 555.987.6543 now"),
        (3, "server at 192.168.0.1 and 8.8.8.8 responded"),
        (4, "no pii here, just 1234 and version 2.5"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["clean"]
        for r in df.select(
            "id", redact_pii_col(F.col("text")).alias("clean")
        ).collect()
    }
    assert got[1] == "contact <EMAIL> for details"
    assert got[2] == "call <PHONE> or <PHONE> now"  # +1 prefix consumed
    assert got[3] == "server at <IP> and <IP> responded"
    assert got[4] == rows[3][1]  # untouched


def test_tfidf_keywords_prefers_rare_terms(spark):
    """A term unique to one doc outranks a corpus-wide term regardless
    of raw counts: idf zeroes tokens present in every document."""
    from wagtail_vector_index_spark.operators.bm25 import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common common common unique1"),
            (2, "common unique2 unique2"),
            (3, "common filler"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'common' appears in all docs -> idf = ln(1) = 0 -> never the top pick
    top1 = {d: rows[0]["keyword"] for d, rows in by_doc.items()}
    assert top1[1] == "unique1"
    assert top1[2] == "unique2"
    assert all(r["score"] == 0.0 for r in out if r["keyword"] == "common")
    # tf weighting: unique2 seen twice scores double unique1's idf
    s1 = next(r["score"] for r in out if r["keyword"] == "unique1")
    s2 = next(r["score"] for r in out if r["keyword"] == "unique2")
    # scores are rounded to 6 dp, so the doubling holds to that grain
    assert abs(s2 - 2 * s1) < 2.1e-6


def test_tfidf_keywords_topk_and_tiebreak(spark):
    from wagtail_vector_index_spark.operators.bm25 import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "zz")], ["doc_id", "text"]
    )
    out = tfidf_keywords(docs, k=3).collect()
    d1 = sorted(r["keyword"] for r in out if r["doc_id"] == 1)
    # four tied-score candidates, k=3, ties broken token-ascending
    assert d1 == ["aa", "bb", "cc"]
    assert [r["keyword"] for r in out if r["doc_id"] == 2] == ["zz"]
