"""End-to-end VectorIndex tests, mirroring the reference suite contracts:
- rebuild creates >= 1 document per source object
  (tests/test_model_index.py:45-49)
- search returns the default-limit sources (test_model_index.py:24-32)
- find_similar dedups and respects include_self (test_index.py:170-191)
- RAG passes the joined context verbatim to the chat backend
  (test_index.py:194-227)
- incremental update embeds only stale objects (django.py:320-383)
"""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.chat import EchoChatBackend
from wagtail_vector_index_spark.config import EmbeddingConfig, IndexConfig
from wagtail_vector_index_spark.embedding.hash_backend import HashEmbeddingBackend
from wagtail_vector_index_spark.index import VectorIndex
from wagtail_vector_index_spark.sources.tables import DocumentStore


@pytest.fixture()
def sources(spark, documents_df):
    return documents_df.limit(50).select(
        F.concat(F.col("source"), F.lit(":"), F.col("doc_id")).alias("object_key"),
        F.array(F.concat(F.col("source"), F.lit(":"), F.col("doc_id"))).alias(
            "object_keys"
        ),
        "text",
    )


@pytest.fixture()
def index(spark, tmp_path, sources):
    cfg = IndexConfig(index_name="test_index")
    store = DocumentStore(spark, str(tmp_path / "docstore"))
    idx = VectorIndex(
        spark, cfg, store, embedding_backend=HashEmbeddingBackend(dimensions=8)
    )
    idx.rebuild_index(sources)
    return idx


def test_rebuild_creates_documents(index, sources):
    n_sources = sources.count()
    n_docs = index.documents().count()
    assert n_docs >= n_sources


def test_search_returns_default_limit(index):
    out = index.search("spark query").collect()
    assert len(out) == 5
    sims = [r["similarity"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_search_sources_limit_honored(index):
    assert len(index.search("spark query", limit=3).collect()) == 3


def test_find_similar_excludes_self_by_default(index):
    probe = index.documents().select("doc_key").first()["doc_key"]
    out = index.find_similar(probe).collect()
    assert probe not in {r["doc_key"] for r in out}
    out_with_self = index.find_similar(probe, include_self=True).collect()
    keys = {r["doc_key"] for r in out_with_self}
    assert probe in keys


def test_query_rag_roundtrip(index):
    resp = index.query("what is a spark table?")
    assert resp.response.startswith("This is an echo backend:")
    assert "what is a spark table?" in resp.response
    assert len(resp.sources) == 5


def test_rag_context_is_joined_contents(index):
    captured = {}

    class CapturingChat(EchoChatBackend):
        def chat(self, *, messages, **params):
            captured["messages"] = messages
            return super().chat(messages=messages, **params)

    index.chat_backend = CapturingChat()
    index.query("q?")
    context_msg = captured["messages"][1]["content"]
    hit_contents = [
        r["content"] for r in index.search("q?").select("content").collect()
    ]
    assert context_msg == "\n".join(hit_contents)


def test_incremental_update_skips_unchanged(index, sources, spark):
    calls = []

    class CountingBackend(HashEmbeddingBackend):
        def embed_batch(self, texts):
            calls.append(len(texts))
            return super().embed_batch(texts)

    # change one object's text; leave the rest
    changed = sources.withColumn(
        "text",
        F.when(
            F.col("object_key") == sources.first()["object_key"],
            F.lit("totally new content"),
        ).otherwise(F.col("text")),
    )
    index.embedding_backend = CountingBackend(dimensions=8)
    index.update_index(changed)
    # Only the stale object's chunks were embedded (exact count depends on
    # partitioning; the total embedded rows must be far below the corpus).
    assert sum(calls) <= 5
    refreshed = index.documents().where(
        F.col("content") == "totally new content"
    )
    assert refreshed.count() == 1


def test_incremental_update_removes_deleted_sources(index, sources):
    """A source object dropped from ``sources`` must be tombstoned by
    update_index — same end state as rebuild_index on the same input."""
    before = index.documents().count()
    removed_key = sources.first()["object_key"]
    remaining = sources.where(F.col("object_key") != removed_key)
    index.update_index(remaining)
    docs = index.documents()
    assert docs.where(F.col("doc_key") == removed_key).count() == 0
    assert docs.count() == before - 1  # unchanged objects stay untouched


def test_batch_query(index, spark):
    queries = spark.createDataFrame(
        [("what is spark?",), ("how do joins work?",)], "query string"
    )
    out = index.batch_query(queries).collect()
    assert len(out) == 2
    for r in out:
        assert r["response"].startswith("This is an echo backend:")
        assert len(r["sources"]) == 5


def test_delete_and_clear(index):
    key = index.documents().select("doc_key").first()["doc_key"]
    index.delete([key])
    assert index.documents().where(F.col("doc_key") == key).count() == 0
    index.clear()
    # clear is a metadata-only commit (a reset watermark): the index reads
    # as empty with its schema intact, no data rewritten
    assert index.documents().count() == 0
    assert "doc_key" in index.documents().columns


def test_compact_preserves_resolved_state(index, spark):
    docs_before = {
        r["doc_key"]: r["content"] for r in index.documents().collect()
    }
    key = sorted(docs_before)[0]
    index.delete([key])
    expected = {k: v for k, v in docs_before.items() if k != key}
    index.store.compact(index.cfg.index_name)
    docs_after = {
        r["doc_key"]: r["content"] for r in index.documents().collect()
    }
    assert docs_after == expected


def test_aquery_streams_chunks(index):
    """Q11: async retrieval + streamed generation; concatenated stream
    equals the sync response (reference base.py:230-276 contract)."""
    import asyncio

    async def run():
        resp = await index.aquery("what is a spark table?")
        parts = [chunk async for chunk in resp.response]
        return resp, parts

    resp, parts = asyncio.run(run())
    assert len(parts) > 1
    full = "".join(parts)
    sync = index.query("what is a spark table?")
    assert full == sync.response
    assert resp.sources == sync.sources


def test_find_similar_multichunk_probe(spark, tmp_path, documents_df):
    """With a small chunk_size, a probe object has several chunk vectors;
    find_similar must k-NN each chunk (limit per chunk, accumulated) and
    dedup to one row per object (reference base.py:278-301)."""
    sources = documents_df.limit(30).select(
        F.concat_ws(":", "source", "doc_id").alias("object_key"),
        F.array(F.concat_ws(":", "source", "doc_id")).alias("object_keys"),
        "text",
    )
    cfg = IndexConfig(index_name="multichunk", chunk_size=30, chunk_overlap=5)
    store = DocumentStore(spark, str(tmp_path / "mc_store"))
    idx = VectorIndex(
        spark, cfg, store, embedding_backend=HashEmbeddingBackend(dimensions=8)
    )
    idx.rebuild_index(sources)
    docs = idx.documents()
    probe_key = (
        docs.groupBy("doc_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .first()["doc_key"]
    )
    n_chunks = docs.where(F.col("doc_key") == probe_key).count()
    assert n_chunks > 1
    out = idx.find_similar(probe_key, limit=3).collect()
    keys = [r["doc_key"] for r in out]
    assert probe_key not in keys
    assert len(keys) == len(set(keys))  # dedup across per-chunk probes
    assert len(keys) >= 3  # accumulation: more than one chunk's worth


def test_store_time_travel(spark, tmp_path):
    """read_at pins a historical generation; generations() lists the
    snapshot points (reference has no analog — EXT storage surface)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_key", T.StringType()),
            T.StructField("object_keys", T.ArrayType(T.StringType())),
            T.StructField("chunk_no", T.IntegerType()),
            T.StructField("content", T.StringType()),
            T.StructField("vector", T.ArrayType(T.DoubleType())),
            T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
            T.StructField("index_name", T.StringType()),
        ]
    )

    def docs(rows):
        return spark.createDataFrame(rows, schema)

    store = DocumentStore(spark, str(tmp_path / "tt"))
    store.upsert(
        docs([("k1", ["k1"], 0, "v1", [1.0, 0.0], {}, "idx"),
              ("k2", ["k2"], 0, "v1", [0.0, 1.0], {}, "idx")])
    )
    gens = store.generations("idx").collect()
    assert len(gens) == 1
    g1 = gens[0]["batch_id"]

    store.upsert(docs([("k1", ["k1"], 0, "v2", [0.5, 0.5], {}, "idx")]))
    store.delete("idx", ["k2"])

    latest = {r["doc_key"]: r["content"] for r in store.read("idx").collect()}
    assert latest == {"k1": "v2"}

    snap = {r["doc_key"]: r["content"] for r in store.read_at(g1, "idx").collect()}
    assert snap == {"k1": "v1", "k2": "v1"}

    gens = store.generations("idx").collect()
    assert len(gens) == 3
    assert gens[-1]["n_tombstones"] == 1


@pytest.mark.parametrize("kind", ["ivf", "ivfpq", "lsh"])
def test_ann_accelerated_search(index, tmp_path, kind):
    """search(ann=True) serves from the materialized tier of every kind:
    results carry exact cosine similarities (verified against the brute
    path for the same keys — the PQ tier reranks its ADC shortlist with
    exact cosine, so this holds for it too) and the full fetched-back
    document rows."""
    kwargs = {"k": 8, "iterations": 2}
    if kind == "ivfpq":
        kwargs |= {"m": 4, "ksub": 8}
    if kind == "lsh":
        kwargs = {"num_planes": 6, "prefix_bits": 3}
    index.build_ann_index(str(tmp_path / f"ann_{kind}"), kind=kind, **kwargs)
    brute = {
        r["doc_key"]: r["similarity"]
        for r in index.search("spark query", limit=20).collect()
    }
    ann = index.search("spark query", ann=True, nprobe=4).collect()
    assert 0 < len(ann) <= 5
    sims = [r["similarity"] for r in ann]
    assert sims == sorted(sims, reverse=True)
    for r in ann:
        assert r["content"]  # document row fetched back, not just the key
        if r["doc_key"] in brute:
            assert abs(r["similarity"] - brute[r["doc_key"]]) < 1e-9


def test_ann_unknown_kind_rejected(index, tmp_path):
    with pytest.raises(ValueError, match="ivf | ivfpq | lsh"):
        index.build_ann_index(str(tmp_path / "bad"), kind="hnsw")


def test_ann_search_requires_built_index(index):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="build_ann_index"):
        index.search("q", ann=True)


def test_ann_search_multi_chunk_granularity(spark, documents_df, tmp_path):
    """ANN serving must key hits at (doc_key, chunk_no) granularity:
    joining back on doc_key alone fans a hit out across sibling chunks
    and stamps them with the wrong similarity (the doc_key-collapse trap
    the single-chunk corpus masks)."""
    import numpy as np

    cfg = IndexConfig(index_name="mc", chunk_size=20)
    store = DocumentStore(spark, str(tmp_path / "mcstore"))
    idx = VectorIndex(
        spark, cfg, store, embedding_backend=HashEmbeddingBackend(dimensions=8)
    )
    sources = documents_df.limit(20).select(
        F.concat(F.col("source"), F.lit(":"), F.col("doc_id")).alias("object_key"),
        F.array(F.concat(F.col("source"), F.lit(":"), F.col("doc_id"))).alias(
            "object_keys"
        ),
        "text",
    )
    idx.rebuild_index(sources)
    max_chunks = (
        idx.documents().groupBy("doc_key").count().agg(F.max("count")).collect()
    )[0][0]
    assert max_chunks > 1, "fixture must produce multi-chunk documents"

    idx.build_ann_index(str(tmp_path / "mcann"), k=4, iterations=2)
    q = np.array(HashEmbeddingBackend(dimensions=8).embed_one("stream batch"))
    for r in idx.search("stream batch", ann=True, nprobe=4).collect():
        v = np.array(r["vector"])
        cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert abs(r["similarity"] - cos) < 1e-9, (
            "hit similarity must belong to the returned chunk's own vector"
        )


def test_ann_invalidated_by_rebuild(index, sources, tmp_path):
    index.build_ann_index(str(tmp_path / "inv"), k=4, iterations=1)
    index.rebuild_index(sources)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="build_ann_index"):
        index.search("q", ann=True)


def test_compact_and_vacuum_lifecycle(index):
    """The index-level lifecycle passthroughs: compact collapses the
    write layers (reads unchanged), vacuum reclaims dead generations
    (reads unchanged, generation count drops to one)."""
    docs_before = {
        r["doc_key"]: r["content"] for r in index.documents().collect()
    }
    key = sorted(docs_before)[0]
    index.delete([key])
    index.compact()
    expected = {k: v for k, v in docs_before.items() if k != key}
    after_compact = {
        r["doc_key"]: r["content"] for r in index.documents().collect()
    }
    assert after_compact == expected
    index.vacuum(min_age_s=0.0)
    assert len(index.store.log.current().live) == 1
    after_vacuum = {
        r["doc_key"]: r["content"] for r in index.documents().collect()
    }
    assert after_vacuum == expected


def test_default_query_prompt_matches_reference_verbatim():
    """SURVEY §7 pledges byte-parity on prompt assembly; pin the default
    system prompt to the reference literal (base.py:219)."""
    import re

    from wagtail_vector_index_spark.index import DEFAULT_QUERY_PROMPT

    src = open(
        "/root/reference/src/wagtail_vector_index/storage/base.py"
    ).read()
    ref = re.search(
        r'or "(You are a helpful assistant\.[^"]*)"', src
    ).group(1)
    assert DEFAULT_QUERY_PROMPT == ref


def test_index_config_check_columns(spark):
    """EmbeddingField._check_embedding_fields analog: configured columns
    that don't exist on the source frame fail fast with a column-level
    message, not a deep Catalyst analysis error."""
    import pytest

    from wagtail_vector_index_spark.config import IndexConfig
    from wagtail_vector_index_spark.embedding.hash_backend import (
        HashEmbeddingBackend,
    )
    from wagtail_vector_index_spark.plans.indexing import build_documents

    df = spark.createDataFrame(
        [("k1", ["k1"], "hello world")],
        "object_key string, object_keys array<string>, text string",
    )
    cfg = IndexConfig(index_name="ok")
    cfg.check_columns(df)  # no raise
    bad = IndexConfig(index_name="bad", key_column="missing_key")
    with pytest.raises(ValueError, match="missing_key"):
        build_documents(df, bad, HashEmbeddingBackend(dimensions=4))
    with pytest.raises(ValueError, match="no_such_text"):
        cfg.check_columns(df, text_col="no_such_text")


def test_search_diversify_lambda_mmr(index):
    """search(diversify_lambda=...): lambda=1.0 reproduces the plain
    ranking; lambda<1 still returns `limit` rows, each from the
    shortlist, ranked by mmr_rank."""
    plain = index.search("spark query", limit=4).collect()
    mmr_plain = index.search(
        "spark query", limit=4, diversify_lambda=1.0
    ).collect()
    assert [r["doc_key"] for r in plain] == [r["doc_key"] for r in mmr_plain]
    assert [r["mmr_rank"] for r in mmr_plain] == [1, 2, 3, 4]

    shortlist_keys = {
        r["doc_key"]
        for r in index.search("spark query", limit=16).collect()
    }
    diverse = index.search(
        "spark query", limit=4, diversify_lambda=0.5
    ).collect()
    assert len(diverse) == 4
    assert {r["doc_key"] for r in diverse} <= shortlist_keys
    # top-1 is always the plain best hit (empty-selection penalty is 0)
    assert diverse[0]["doc_key"] == plain[0]["doc_key"]


def test_search_mmr_requires_cosine(spark, tmp_path):
    """diversify_lambda composes relevance with cosine pairwise
    similarity; a euclidean/MIP index must fail fast (same cosine-only
    contract as build_ann_index) instead of silently skewing lambda."""
    import pytest

    cfg = IndexConfig(index_name="euclid_idx", distance="euclidean")
    store = DocumentStore(spark, str(tmp_path / "euclid_store"))
    idx = VectorIndex(
        spark, cfg, store, embedding_backend=HashEmbeddingBackend(dimensions=8)
    )
    with pytest.raises(ValueError, match="cosine"):
        idx.search("anything", diversify_lambda=0.5)
