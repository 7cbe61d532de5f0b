import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_duplicates,
    keep_representatives,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the green bank"),  # near dup of 1
    (4, "completely different content about spark shuffle partitions and joins"),
    (5, "THE QUICK BROWN FOX jumps over the lazy dog near the river bank"),  # case dup of 1
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(docs_df):
    out = exact_duplicates(docs_df).collect()
    groups = {r["keep_id"]: r["n_docs"] for r in out}
    # 1,2,5 collapse (case-insensitive fingerprint); 3 and 4 stand alone
    assert groups[1] == 3
    assert groups[3] == 1
    assert groups[4] == 1


def test_ngram_jaccard_pairs(docs_df):
    out = ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_candidates_subset_of_exact(docs_df):
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs_df, threshold=0.5).collect()
    }
    assert lsh <= exact
    assert (1, 2) in lsh  # identical docs always collide in every band


def test_simhash_pairs(docs_df):
    out = simhash_pairs(docs_df, max_hamming=3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs[(1, 2)] == 0
    assert not any(4 in p for p in pairs)


def test_simhash_pairs_rejects_leaky_banding(docs_df):
    # band_bits=8 -> 4 bands, exact only for hamming <= 3: asking for
    # hamming 4 would silently drop qualifying pairs (pigeonhole violated)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs_df, max_hamming=4, band_bits=8)


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.99, 0.01]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs(df, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_keep_representatives(docs_df):
    pairs = ngram_jaccard_pairs(docs_df, threshold=0.5)
    kept = keep_representatives(docs_df, pairs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 1 in ids and 4 in ids
    assert 2 not in ids


def test_simhash_column_matches_bulk_path(spark, docs_df):
    """simhash32_col (per-row fold) and simhash_fingerprints (explode +
    codegen aggregates) must produce identical fingerprints."""
    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.functions.text_analysis import simhash32_col
    from wagtail_vector_index_spark.operators.dedup import simhash_fingerprints

    col_path = {
        r["doc_id"]: r["sh"]
        for r in docs_df.select(
            "doc_id", simhash32_col(F.col("text")).alias("sh")
        ).collect()
    }
    bulk_path = {
        r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs_df).collect()
    }
    assert col_path == bulk_path
