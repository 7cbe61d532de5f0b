"""LiteLLM chat backend under a mocked SDK (litellm is not installed in
this container) — mirrors the reference's mocked-completion tests
(tests/test_ai_utils/test_backends/test_litellm.py:105-279): parameter
merge order, streaming chunking, and the aquery integration."""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import pytest


class _FakeLitellm(types.ModuleType):
    """Minimal litellm stand-in recording completion() calls."""

    def __init__(self):
        super().__init__("litellm")
        self.calls: list[dict] = []
        self.stream_chunks: list[str | None] = []
        self.response_text = "a mocked completion"

    def get_model_info(self, model):
        if model == "known-model":
            return {"max_input_tokens": 4242}
        raise ValueError(f"unknown model {model}")

    def completion(self, *, model, messages, stream, **params):
        self.calls.append(
            {"model": model, "messages": messages, "stream": stream, **params}
        )
        if stream:
            return iter(
                SimpleNamespace(
                    choices=[
                        SimpleNamespace(delta=SimpleNamespace(content=c))
                    ]
                )
                for c in self.stream_chunks
            )
        return SimpleNamespace(
            choices=[{"message": {"content": self.response_text}}]
        )

    async def acompletion(self, *, model, messages, stream, **params):
        self.calls.append(
            {"model": model, "messages": messages, "stream": stream,
             "async": True, **params}
        )
        return SimpleNamespace(
            choices=[SimpleNamespace(
                message=SimpleNamespace(content=self.response_text)
            )]
        )


@pytest.fixture
def fake_litellm(monkeypatch):
    fake = _FakeLitellm()
    monkeypatch.setitem(sys.modules, "litellm", fake)
    # force re-import inside backend methods to see the fake
    return fake


def _backend(**kw):
    from wagtail_vector_index_spark.chat.litellm_backend import (
        LiteLLMChatBackend,
    )

    kw.setdefault("token_limit", 1000)
    return LiteLLMChatBackend("gpt-3.5-turbo", **kw)


def test_import_gate_without_litellm():
    assert "litellm" not in sys.modules  # the container really lacks it
    from wagtail_vector_index_spark.chat.litellm_backend import (
        LiteLLMChatBackend,
    )

    with pytest.raises(ImportError, match="litellm is not installed"):
        LiteLLMChatBackend("gpt-3.5-turbo", token_limit=1000)


def test_default_parameters_merge_and_override(fake_litellm):
    backend = _backend(
        default_parameters={"api_key": "k", "temperature": 0.1}
    )
    messages = [{"role": "user", "content": "hi"}]
    out = backend.chat(messages=messages, temperature=0.9)
    assert out.text() == "a mocked completion"
    call = fake_litellm.calls[-1]
    assert call["model"] == "gpt-3.5-turbo"
    assert call["messages"] == messages
    assert call["stream"] is False
    assert call["api_key"] == "k"
    assert call["temperature"] == 0.9  # per-call kwarg wins


def test_token_limit_resolution(fake_litellm):
    from wagtail_vector_index_spark.chat.litellm_backend import (
        LiteLLMChatBackend,
    )

    assert LiteLLMChatBackend("known-model").token_limit == 4242
    with pytest.raises(ValueError, match="doesn't know about model"):
        LiteLLMChatBackend("mystery-model")


def test_chat_stream_stops_on_empty_delta(fake_litellm):
    backend = _backend()
    fake_litellm.stream_chunks = ["Hello", " world", None, " IGNORED"]
    chunks = list(
        backend.chat_stream(messages=[{"role": "user", "content": "x"}])
    )
    # reference _build_chunk raises StopIteration on falsy content —
    # nothing after the empty delta is surfaced
    assert chunks == ["Hello", " world"]
    assert fake_litellm.calls[-1]["stream"] is True


def test_achat(fake_litellm):
    import asyncio

    backend = _backend()
    out = asyncio.run(
        backend.achat(messages=[{"role": "user", "content": "x"}])
    )
    assert out.text() == "a mocked completion"
    assert fake_litellm.calls[-1]["async"] is True


def test_aquery_streams_through_litellm_backend(
    fake_litellm, spark, sf_dir, tmp_path
):
    """End-to-end: a VectorIndex with the litellm backend streams its
    aquery response through the mocked SDK (echo stays the oracle
    backend; this pins the integration surface)."""
    import asyncio

    from wagtail_vector_index_spark.config import IndexConfig
    from wagtail_vector_index_spark.embedding.hash_backend import (
        HashEmbeddingBackend,
    )
    from wagtail_vector_index_spark.index import VectorIndex
    from wagtail_vector_index_spark.sources.tables import DocumentStore

    fake_litellm.stream_chunks = ["RAG", " says", " hi", None]
    backend = _backend()

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(20)
        .selectExpr(
            "concat('doc:', doc_id) AS object_key",
            "array(concat('doc:', doc_id)) AS object_keys",
            "text",
        )
    )
    index = VectorIndex(
        spark,
        IndexConfig(index_name="litellm_it"),
        DocumentStore(spark, str(tmp_path / "docstore")),
        embedding_backend=HashEmbeddingBackend(dimensions=8),
        chat_backend=backend,
    )
    index.rebuild_index(docs)

    async def _run():
        resp = await index.aquery("what do the documents say")
        chunks = [c async for c in resp.response]
        return chunks, resp.sources

    chunks, sources = asyncio.run(_run())
    assert chunks == ["RAG", " says", " hi"]
    assert len(sources) > 0
    # the RAG prompt reached the SDK: 3 messages, last one the user query
    call = fake_litellm.calls[-1]
    assert call["stream"] is True
    assert [m["role"] for m in call["messages"]] == [
        "system",
        "system",
        "user",
    ]
    assert call["messages"][-1]["content"] == "what do the documents say"


def test_embedding_backend_sync_and_async(fake_litellm):
    """LiteLLMEmbeddingBackend twin parity (reference litellm.py:176-186):
    embed_batch -> litellm.embedding, aembed_batch -> litellm.aembedding,
    identical row/vector shape either way."""
    import asyncio

    fake_litellm.embedding_vectors = [[0.1, 0.2], [0.3, 0.4]]

    def _embedding(*, model, input, **params):
        fake_litellm.calls.append(
            {"api": "embedding", "model": model, "input": list(input), **params}
        )
        return {
            "data": [
                {"embedding": v}
                for v in fake_litellm.embedding_vectors[: len(input)]
            ]
        }

    async def _aembedding(*, model, input, **params):
        fake_litellm.calls.append(
            {"api": "aembedding", "model": model, "input": list(input), **params}
        )
        return {
            "data": [
                {"embedding": v}
                for v in fake_litellm.embedding_vectors[: len(input)]
            ]
        }

    fake_litellm.embedding = _embedding
    fake_litellm.aembedding = _aembedding

    from wagtail_vector_index_spark.embedding.litellm_backend import (
        LiteLLMEmbeddingBackend,
    )

    be = LiteLLMEmbeddingBackend("text-embedding-x", dimensions=2)
    sync = be.embed_batch(["a", "b"])
    assert sync.shape == (2, 2) and sync[0][0] == 0.1
    out = asyncio.run(be.aembed_batch(["a", "b"]))
    assert out.shape == (2, 2) and (out == sync).all()
    apis = [c["api"] for c in fake_litellm.calls if "api" in c]
    assert apis == ["embedding", "aembedding"]
