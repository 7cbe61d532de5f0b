"""Edge-case robustness: nulls, empties, degenerate inputs."""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.config import IndexConfig
from wagtail_vector_index_spark.embedding.hash_backend import HashEmbeddingBackend
from wagtail_vector_index_spark.plans.indexing import build_documents
from wagtail_vector_index_spark.operators.knn import topk_similar
from wagtail_vector_index_spark.session import build_session


def test_build_session_applies_conf():
    spark = build_session("edge-tests", master="local[2]", shuffle_partitions=4)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_chunk_pipeline_handles_null_and_empty_text(spark):
    sources = spark.createDataFrame(
        [("k1", ["k1"], None), ("k2", ["k2"], ""), ("k3", ["k3"], "real content")],
        "object_key string, object_keys array<string>, text string",
    )
    docs = build_documents(
        sources, IndexConfig(index_name="edge"), HashEmbeddingBackend(8)
    ).collect()
    # null/empty texts produce no chunks; the real one produces one
    assert [r["doc_key"] for r in docs] == ["k3"]
    assert docs[0]["content"] == "real content"


def test_topk_on_empty_index(spark):
    empty = spark.createDataFrame([], "doc_id long, vector array<double>")
    out = topk_similar(empty, [1.0, 0.0], limit=5).collect()
    assert out == []


def test_embed_empty_dataframe(spark):
    from wagtail_vector_index_spark.embedding.stage import embed_dataframe

    empty = spark.createDataFrame([], "content string")
    out = embed_dataframe(empty, backend=HashEmbeddingBackend(8)).collect()
    assert out == []


def test_dedup_on_single_doc(spark):
    from wagtail_vector_index_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    one = spark.createDataFrame([(1, "only one document here")], "doc_id long, text string")
    assert ngram_jaccard_pairs(one, threshold=0.1).collect() == []
    assert minhash_lsh_pairs(one, threshold=0.1).collect() == []


def test_hash_embedder_dimension_blocks():
    """dims > 8 extend through extra sha256 blocks deterministically."""
    b8, b20 = HashEmbeddingBackend(8), HashEmbeddingBackend(20)
    v8, v20 = b8.embed_one("abc"), b20.embed_one("abc")
    assert list(v20[:8]) == list(v8)
    assert len(set(round(x, 12) for x in v20)) == 20  # no repeated blocks


def test_kmv_distinct_empty_input(spark):
    from wagtail_vector_index_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([], "grp string, v long")
    assert kmv_distinct(df, group_cols=["grp"], value_col="v").count() == 0


def test_funnel_empty_input(spark):
    from wagtail_vector_index_spark.operators.events import EventLog

    df = spark.createDataFrame(
        [], "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = EventLog(df).funnel(["view", "click"]).collect()
    assert [(r["step_name"], r["n_entities"]) for r in out] == [
        ("view", 0),
        ("click", 0),
    ]


def test_semantic_dedup_no_pairs_above_threshold(spark):
    from wagtail_vector_index_spark.operators.dedup import semantic_dedup

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = semantic_dedup(
        df, cents, id_col="vec_id", vec_col="embedding", threshold=0.99
    )
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 2]


def test_word_ngrams_matches_python_reference(spark):
    """The r11 arrays_zip n-gram kernel (linear in doc length) must
    reproduce the defining semantics exactly: all n-grams in order,
    repeats included, sub-n-token docs (and empty docs) yielding their
    full token-join as the single gram."""
    import random

    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.functions.text_analysis import (
        word_ngrams_col,
    )

    rng = random.Random(3)
    texts = ["", "x", "  ", "a b", "a b c", "A  b\tC d", "w w w w w w"]
    texts += [
        " ".join(f"t{rng.randrange(6)}" for _ in range(rng.randint(0, 25)))
        for _ in range(40)
    ]

    def ref(text, n):
        toks = [t for t in text.lower().split() if t]
        if len(toks) < n:
            return [" ".join(toks)]
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for n in (2, 3, 5):
        got = [
            r["g"]
            for r in df.select(
                word_ngrams_col(F.col("text"), n).alias("g")
            ).collect()
        ]
        assert got == [ref(t, n) for t in texts], n


def test_explode_nofilter_suppresses_inferred_filter(spark):
    """Exploding a BOUND array attribute lets the optimizer infer a
    size()>0 filter under the Generate and push the full array
    construction into an interpreted per-row predicate (the r11
    long-doc cliff); explode_nofilter's identity-transform wrapper must
    keep the optimized plan Filter-free while returning identical
    rows."""
    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.functions.text_analysis import (
        explode_nofilter,
        word_shingles_col,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "p q r s t u"), (3, "")],
        "doc_id long, text string",
    )
    shingled = df.select(
        "doc_id", word_shingles_col(F.col("text"), 3).alias("sh")
    )
    wrapped = shingled.select(
        "doc_id", explode_nofilter(F.col("sh")).alias("s")
    )
    plan = wrapped._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" not in plan, plan
    plain = shingled.select("doc_id", F.explode("sh").alias("s"))
    assert sorted(map(tuple, wrapped.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_keep_mask_col_empty_and_normal_inputs(spark):
    """keep_mask_col is a public kernel: an EMPTY (non-null) removed
    array must yield the all-True mask instead of a per-row Spark
    exception (slice with length -1) far from the misuse site — a
    future caller passing array() where the in-library callers pass
    NULL must not fail mid-job. Normal inputs (head/tail/run removals)
    pinned alongside."""
    from wagtail_vector_index_spark.functions.text_analysis import (
        apply_keep_mask_col,
        keep_mask_col,
    )

    rows = [
        (1, [0], 3),          # head removal
        (2, [2], 3),          # tail removal
        (3, [0, 1, 2], 3),    # everything removed
        (4, [1, 3], 5),       # interior gaps
        (5, [], 4),           # EMPTY array (the guarded case)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, removed array<int>, n int"
    )
    got = {
        r["doc_id"]: r["mask"]
        for r in df.select(
            "doc_id",
            keep_mask_col(F.col("removed"), F.col("n")).alias("mask"),
        ).collect()
    }
    assert got[1] == [False, True, True]
    assert got[2] == [True, True, False]
    assert got[3] == [False, False, False]
    assert got[4] == [True, False, True, False, True]
    assert got[5] == [True, True, True, True]

    kept = {
        r["doc_id"]: r["kept"]
        for r in df.select(
            "doc_id",
            apply_keep_mask_col(
                F.sequence(F.lit(10), F.lit(10) + F.col("n") - 1),
                keep_mask_col(F.col("removed"), F.col("n")),
            ).alias("kept"),
        ).collect()
    }
    assert kept[4] == [10, 12, 14]
    assert kept[5] == [10, 11, 12, 13]


def test_rolling_window_hash60_matches_python_reference(spark):
    """The r12 ExactSubstr window key — XOR of per-position rotations
    of per-token sha_hash60 values (one sha per TOKEN, replacing the
    per-window slice+join+sha) — must match an independent python
    reference bit-for-bit, including the 1-based position convention
    the destructive apply keys on (posexplode pos + 1)."""
    import hashlib

    from wagtail_vector_index_spark.functions.text_analysis import (
        posexplode_nofilter,
        rolling_window_hash60_col,
        sha_hash60,
    )

    def sha60(s):
        return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)

    def rot60(x, r):
        if r == 0:
            return x
        return ((x % (1 << (60 - r))) << r) | (x >> (60 - r))

    k = 8
    texts = {
        1: " ".join(f"tok{i}" for i in range(12)),
        2: " ".join(f"tok{i % 3}" for i in range(9)),  # repeated tokens
        3: "a b c d e f g h",  # exactly k tokens -> one window
    }
    want = {}
    for d, text in texts.items():
        th = [sha60(t) for t in text.split()]
        for pos in range(1, len(th) - k + 2):
            wh = 0
            for j in range(k):
                wh ^= rot60(th[pos - 1 + j], (7 * j) % 60)
            want[(d, pos)] = wh

    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["pos"]): r["wh"]
        for r in df.select(
            "doc_id",
            F.transform(
                F.split("text", " "), lambda t: sha_hash60(t)
            ).alias("__th"),
        )
        .select(
            "doc_id",
            posexplode_nofilter(
                rolling_window_hash60_col(F.col("__th"), k)
            ).alias("__p0", "wh"),
        )
        .select("doc_id", (F.col("__p0") + 1).alias("pos"), "wh")
        .collect()
    }
    assert got == want
