"""Differential tests for the Catalyst "column twin" fast paths.

A backend whose math is deterministic and expression-shaped may declare a
JVM twin (``as_column`` / ``as_chat_column``); the stage functions then
skip the Arrow round-trip entirely. These tests pin that the twin is
BIT-IDENTICAL to the Python path — the whole safety argument for taking
the fast path — and that overridden/instrumented backends still get the
Arrow path (the twin invalidates itself when ``embed_batch``/``chat`` is
overridden).
"""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.chat import EchoChatBackend, chat_dataframe
from wagtail_vector_index_spark.embedding.hash_backend import HashEmbeddingBackend
from wagtail_vector_index_spark.embedding.stage import embed_dataframe

TRICKY_TEXTS = [
    "hello world",
    "",
    "héllo ☃ snowman \U0001f600",  # multi-byte utf-8
    "line\nbreak\tand|pipe",
    "x" * 5000,
    None,
]


@pytest.mark.parametrize("dims", [8, 20])
def test_hash_embed_twin_bit_identical(spark, dims):
    backend = HashEmbeddingBackend(dimensions=dims)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY_TEXTS)], "id long, content string"
    )
    out = embed_dataframe(df, backend=backend, text_col="content")
    # the twin must actually be in the plan: no Python stage
    assert "MapInPandas" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r["id"]: r["vector"] for r in out.collect()}
    for i, t in enumerate(TRICKY_TEXTS):
        expected = backend.embed_batch([t if t is not None else ""])[0]
        assert list(rows[i]) == list(expected), f"mismatch for text {t!r}"


def test_overridden_backend_falls_back_to_arrow(spark):
    class CountingBackend(HashEmbeddingBackend):
        def embed_batch(self, texts):
            return super().embed_batch(texts)

    df = spark.createDataFrame([("a",), ("b",)], "content string")
    out = embed_dataframe(df, backend=CountingBackend(8), text_col="content")
    # the twin invalidates itself: the plan must contain the Python stage
    # (the closure's `calls` lives in the worker process, so assert on the
    # plan, not the list)
    assert "MapInPandas" in out._jdf.queryExecution().executedPlan().toString()
    got = {r["content"]: list(r["vector"]) for r in out.collect()}
    base = HashEmbeddingBackend(8)
    assert got["a"] == list(base.embed_batch(["a"])[0])


def test_echo_chat_twin_matches_python(spark):
    backend = EchoChatBackend()
    prompts = spark.createDataFrame(
        [("sys", "what is spark"), (None, "second prompt")],
        "system string, prompt string",
    )
    got = {
        r["prompt"]: r["response"]
        for r in chat_dataframe(prompts, backend=backend).collect()
    }
    for p in ["what is spark", "second prompt"]:
        expected = backend.chat(messages=[{"role": "user", "content": p}]).text()
        assert got[p] == expected


def test_overridden_chat_falls_back_to_arrow(spark):
    class CapturingEcho(EchoChatBackend):
        def chat(self, *, messages, **params):
            return super().chat(messages=messages, **params)

    prompts = spark.createDataFrame([("s", "p")], "system string, prompt string")
    out = chat_dataframe(prompts, backend=CapturingEcho())
    assert "MapInPandas" in out._jdf.queryExecution().executedPlan().toString()
    assert out.collect()[0]["response"] == "This is an echo backend: p"


def test_embed_plan_is_jvm_only(spark):
    """The twin path must keep the plan inside codegen: no ArrowEvalPython
    / MapInPandas node, and pruning still reaches the scan."""
    df = spark.createDataFrame([("a", 1)], "content string, extra long")
    out = embed_dataframe(df, backend=HashEmbeddingBackend(8), text_col="content")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


@pytest.mark.parametrize("dims", [16, 64])
def test_feature_hash_twin_bit_identical(spark, dims):
    from wagtail_vector_index_spark.embedding.feature_hash import (
        FeatureHashEmbeddingBackend,
    )

    backend = FeatureHashEmbeddingBackend(dimensions=dims)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY_TEXTS)], "id long, content string"
    )
    out = embed_dataframe(df, backend=backend, text_col="content")
    assert "MapInPandas" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r["id"]: r["vector"] for r in out.collect()}
    for i, t in enumerate(TRICKY_TEXTS):
        expected = backend.embed_batch([t if t is not None else ""])[0]
        assert list(rows[i]) == list(expected), f"mismatch for text {t!r}"


def test_feature_hash_retrieval_prefers_term_overlap(spark):
    """Semantic sanity: a doc sharing tokens with the query must outrank
    a disjoint doc under cosine over the feature-hash embedding."""
    from wagtail_vector_index_spark.embedding.feature_hash import (
        FeatureHashEmbeddingBackend,
    )

    b = FeatureHashEmbeddingBackend(dimensions=64)
    import numpy as np

    def cos(u, v):
        return float(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v)))

    q = b.embed_one("spark join strategies")
    hit = b.embed_one("broadcast join beats shuffle join in spark")
    miss = b.embed_one("quarterly revenue grew nine percent")
    assert cos(q, hit) > cos(q, miss)


def test_feature_hash_twin_unicode_whitespace_parity(spark):
    """Non-breaking space: Java regex \\s is ASCII-only, so the Python
    path must tokenize with re.ASCII to stay bit-identical (regression:
    str.split() splits on all Unicode whitespace and diverged)."""
    from wagtail_vector_index_spark.embedding.feature_hash import (
        FeatureHashEmbeddingBackend,
    )

    backend = FeatureHashEmbeddingBackend(dimensions=8)
    text = "spark join normal pair"
    df = spark.createDataFrame([(text,)], "content string")
    got = embed_dataframe(df, backend=backend, text_col="content").collect()[0][
        "vector"
    ]
    assert list(got) == list(backend.embed_batch([text])[0])


def test_embed_one_override_falls_back_to_arrow(spark):
    """Overriding embed_one (the natural extension point) must invalidate
    the twin, not silently return base-class vectors."""
    import numpy as np

    from wagtail_vector_index_spark.embedding.feature_hash import (
        FeatureHashEmbeddingBackend,
    )

    class Tweaked(FeatureHashEmbeddingBackend):
        def embed_one(self, text):
            return np.ones(self.dimensions)

    df = spark.createDataFrame([("a",)], "content string")
    out = embed_dataframe(df, backend=Tweaked(4), text_col="content")
    assert "MapInPandas" in out._jdf.queryExecution().executedPlan().toString()
    assert list(out.collect()[0]["vector"]) == [1.0, 1.0, 1.0, 1.0]


def test_chat_null_prompt_parity(spark):
    """NULL prompt -> empty user message on BOTH paths (twin and Arrow)."""

    class CapturingEcho(EchoChatBackend):
        def chat(self, *, messages, **params):
            return super().chat(messages=messages, **params)

    prompts = spark.createDataFrame(
        [(None, None)], "system string, prompt string"
    )
    twin = chat_dataframe(prompts, backend=EchoChatBackend()).collect()[0]
    arrow = chat_dataframe(prompts, backend=CapturingEcho()).collect()[0]
    assert twin["response"] == "This is an echo backend: "
    assert arrow["response"] == "This is an echo backend: "


def test_ngram_fingerprints_match_duckdb_replay(spark):
    """ngram_fingerprints_col must produce byte-identical fingerprints to
    the documented DuckDB replay (_ngram_fp_sql), including docs shorter
    than n tokens (single fingerprint over available tokens) and empty
    text (fingerprint 0)."""
    import duckdb

    import pyspark.sql.functions as F
    from wagtail_vector_index_spark.functions.text_analysis import (
        ngram_fingerprints_col,
        token_sha_hashes_col,
    )
    from wagtail_vector_index_spark.queries_text import (
        TOKEN_HASHES_SQL,
        _ngram_fp_sql,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog by the river bank today"),
        (2, "short doc"),                        # < n tokens
        (3, ""),                                  # empty
        (4, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"),
        (5, "repeat repeat repeat repeat repeat repeat repeat repeat repeat repeat repeat repeat repeat repeat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (3, 13):
        got = sorted(
            (r["doc_id"], r["fp"])
            for r in df.select(
                "doc_id", token_sha_hashes_col(F.col("text")).alias("__th")
            )
            .select(
                "doc_id",
                F.explode(ngram_fingerprints_col(F.col("__th"), n)).alias("fp"),
            )
            .collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        want = sorted(
            con.execute(
                f"WITH t AS (SELECT doc_id, {TOKEN_HASHES_SQL} AS th FROM docs) "
                f"SELECT doc_id, unnest({_ngram_fp_sql(n)}) AS fp FROM t "
            ).fetchall()
        )
        assert got == [(a, b) for a, b in want] and len(got) > 0, n
