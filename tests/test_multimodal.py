"""Multimodal binary-column plumbing tests (stubbed decode, real Arrow
dataflow) + backend loading."""

import hashlib

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.multimodal import (
    decode_binary_column,
    decode_stub,
    frame_sample_stub,
)


def test_decode_stub_deterministic():
    meta = decode_stub(b"hello")
    assert meta["byte_len"] == 5
    assert meta["content_sha"] == hashlib.sha256(b"hello").hexdigest()
    assert 0 <= meta["width"] < 1920
    assert 0 <= meta["height"] < 1080
    assert decode_stub(b"hello") == meta  # pure


def test_decode_binary_column(spark):
    df = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two")], "id long, payload binary"
    )
    out = decode_binary_column(df, binary_col="payload").collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["byte_len"] == len(b"payload-one")
    assert by_id[1]["content_sha"] == hashlib.sha256(b"payload-one").hexdigest()
    assert by_id[1]["width"] != by_id[2]["width"]  # sha-derived, differs


def test_decode_keeps_input_columns(spark):
    df = spark.createDataFrame([(1, "x", b"b")], "id long, tag string, payload binary")
    out = decode_binary_column(df, binary_col="payload")
    assert {"id", "tag", "payload", "byte_len", "content_sha", "width", "height"} <= set(
        out.columns
    )


def test_frame_sample_is_declared_stub(spark):
    df = spark.createDataFrame([(1, b"b")], "id long, payload binary")
    with pytest.raises(NotImplementedError):
        frame_sample_stub(df)


def test_backend_loader_roundtrip():
    from wagtail_vector_index_spark.config import EmbeddingConfig
    from wagtail_vector_index_spark.embedding.base import load_backend_from_config
    from wagtail_vector_index_spark.embedding.hash_backend import (
        HashEmbeddingBackend,
    )

    backend = load_backend_from_config(EmbeddingConfig(dimensions=16))
    assert isinstance(backend, HashEmbeddingBackend)
    assert backend.dimensions == 16
    assert backend.embed_batch(["a"]).shape == (1, 16)


def test_litellm_backend_gated():
    from wagtail_vector_index_spark.embedding.litellm_backend import (
        LiteLLMEmbeddingBackend,
    )

    with pytest.raises(ImportError, match="litellm is not installed"):
        LiteLLMEmbeddingBackend()
