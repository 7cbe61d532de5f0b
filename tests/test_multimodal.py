"""Multimodal binary-column plumbing tests (stubbed decode, real Arrow
dataflow) + backend loading."""

import hashlib

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.multimodal import (
    byte_slice_demux,
    decode_binary_column,
    decode_stub,
    frame_sample,
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


def test_byte_slice_demux():
    frames = byte_slice_demux(b"0123456789", every_n_bytes=4, max_frames=2)
    assert frames == [b"0123", b"4567"]  # max_frames caps the tail
    frames = byte_slice_demux(b"0123456", every_n_bytes=4, max_frames=8)
    assert frames == [b"0123", b"456"]  # short tail frame survives


def test_frame_sample_fanout(spark):
    df = spark.createDataFrame(
        [(1, b"0123456789"), (2, b"ab")], "doc_id long, payload binary"
    )
    out = frame_sample(df, every_n_bytes=4, max_frames=2).collect()
    got = {(r["doc_id"], r["frame_no"]): bytes(r["frame_bytes"]) for r in out}
    assert got == {
        (1, 0): b"0123",
        (1, 1): b"4567",
        (2, 0): b"ab",
    }


def test_decode_image_pil_gated_or_real(spark):
    """When PIL is installed the real decoder parses an actual PNG
    header; otherwise the import gate raises cleanly. Both paths keep
    the decode_stub output contract."""
    from wagtail_vector_index_spark.operators.multimodal import (
        decode_image_pil,
    )

    pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (17, 23)).save(buf, format="PNG")
    payload = buf.getvalue()

    meta = decode_image_pil(payload)
    assert (meta["width"], meta["height"]) == (17, 23)
    assert meta["byte_len"] == len(payload)
    assert meta["content_sha"] == hashlib.sha256(payload).hexdigest()

    df = spark.createDataFrame([(1, payload)], "id long, payload binary")
    row = decode_binary_column(
        df, binary_col="payload", decoder=decode_image_pil
    ).collect()[0]
    assert (row["width"], row["height"]) == (17, 23)


def test_decode_image_pil_import_gate():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; gate test not applicable")
    except ImportError:
        pass
    from wagtail_vector_index_spark.operators.multimodal import (
        decode_image_pil,
    )

    with pytest.raises(ImportError):
        decode_image_pil(b"not-an-image")


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


def test_window_fingerprints_grid_and_dedup(spark):
    """Window fingerprints: hop-grid alignment means a shared segment
    embedded at a hop-aligned offset in two different payloads yields
    identical fingerprints — the audio shared-segment detector."""
    from wagtail_vector_index_spark.operators.multimodal import (
        window_fingerprints,
    )

    seg = bytes(range(256))  # the "jingle"
    a = seg + b"A" * 300
    b = b"B" * 128 + seg + b"C" * 100  # hop-aligned (128) embedding
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b))], "doc_id long, payload binary"
    )
    out = window_fingerprints(
        df, binary_col="payload", window_bytes=256, hop_bytes=128,
        max_windows=8,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["win_no"]] = r["win_sha"]
    # doc1 window 0 covers seg exactly; doc2 window 1 starts at byte 128
    assert by_doc[1][0] == by_doc[2][1]
    # window counts follow the grid: len(a)=556 -> offs 0..300 step 128
    assert len(by_doc[1]) == 3
    # short payloads yield no windows
    tiny = window_fingerprints(
        spark.createDataFrame([(3, bytearray(b"xy"))], "doc_id long, payload binary"),
        binary_col="payload",
    ).count()
    assert tiny == 0


def test_resize_binary_column_stub_and_shape(spark):
    """Resize plumbing: binary in/out, one row per input, deterministic
    stub output sized to the target thumbnail budget."""
    from wagtail_vector_index_spark.operators.multimodal import (
        resize_binary_column,
        resize_stub,
    )

    payload = bytes(range(256)) * 8  # 2048 bytes
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b""))],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: bytes(r["resized"] or b"")
        for r in resize_binary_column(df, width=64, height=64).collect()
    }
    assert len(out[1]) == 64 * 64 // 64  # strided down to the budget
    assert out[1] == resize_stub(payload, width=64, height=64)  # deterministic
    assert out[2] == b""


def test_resize_pil_import_gated():
    from wagtail_vector_index_spark.operators.multimodal import resize_image_pil

    try:
        import PIL  # noqa: F401
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(ImportError):
            resize_image_pil(b"xx", width=4, height=4)


def test_extract_feature_col_matches_hash_derivation(spark):
    import hashlib as _hashlib

    from wagtail_vector_index_spark.operators.multimodal import (
        extract_feature_col,
    )

    payload = b"some audio bytes"
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = extract_feature_col(df, dim=8).collect()[0]
    h = _hashlib.sha256(payload.hex().upper().encode()).hexdigest()
    expected = [int(h[8 * i : 8 * i + 8], 16) / 4294967296.0 for i in range(8)]
    assert row["features"] == expected
    assert all(0.0 <= v < 1.0 for v in row["features"])
