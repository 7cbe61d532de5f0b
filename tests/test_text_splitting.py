"""Golden tests for the token estimator and recursive splitter.

Golden values are lifted from the reference test suite
(/root/reference/tests/test_ai_utils/test_text_splitting.py:30-39) and
from the documented behavioral contract
(tests/test_django_converter.py:24-46: a ~1000-char text at chunk_size=100
yields >1 chunk; important text prefixes every chunk).
"""

import re

import pytest

from wagtail_vector_index_spark.functions.text_splitting import (
    chunk_with_important_prefix,
    estimate_tokens,
    split_text,
    text_length,
)

SAMPLE_0 = """Lorem ipsum dolor sit amet, consectetur adipiscing elit.
    Morbi ornare magna et urna volutpat, ut fermentum velit tincidunt.
    Aliquam erat volutpat. Nam erat mi, porta eu scelerisque sed, pharetra eget quam.
    Sed aliquet massa purus, vel sagittis libero fermentum nec.
    Donec placerat leo in tortor semper, sit amet venenatis ipsum tincidunt. Fusce at porttitor orci.
    Donec nibh diam, consectetur a sagittis eu, laoreet vitae erat.
    Aliquam bibendum dolor sed ornare aliquet. Aliquam sodales,
    felis nec aliquet condimentum, sem lacus placerat est..."""

SAMPLE_1 = SAMPLE_0 + "\n\n    Test."


@pytest.mark.parametrize(
    "text,expected",
    [(SAMPLE_0, 143), (SAMPLE_1, 146), ("", 0), ("word", 1), ("a b, c!", 4)],
)
def test_estimate_tokens_golden(text, expected):
    assert estimate_tokens(text) == expected


def test_text_length_identity():
    assert text_length(SAMPLE_0) == len(SAMPLE_0)


def test_split_short_text_is_identity_stripped():
    assert split_text("  hello world  ", chunk_size=100) == ["hello world"]


def test_split_yields_multiple_chunks():
    text = " ".join(f"word{i}" for i in range(400))  # ~400 tokens estimated
    chunks = split_text(text, chunk_size=100, chunk_overlap=10)
    assert len(chunks) > 1
    for c in chunks:
        assert estimate_tokens(c) <= 100 or " " not in c


def test_split_overlap_carries_content():
    text = " ".join(f"word{i}" for i in range(400))
    chunks = split_text(text, chunk_size=100, chunk_overlap=50)
    # with overlap, consecutive chunks share a suffix/prefix
    tail_words = chunks[0].split()[-3:]
    assert " ".join(tail_words) in chunks[1]


def test_split_prefers_paragraph_boundaries():
    paras = ["alpha " * 30, "beta " * 30, "gamma " * 30]
    text = "\n\n".join(p.strip() for p in paras)
    chunks = split_text(text, chunk_size=60, chunk_overlap=0)
    assert len(chunks) == 3
    assert chunks[0].startswith("alpha")
    assert chunks[1].startswith("beta")


def test_split_recurses_into_oversized_pieces():
    # one giant paragraph forces recursion to the " " separator
    text = ("x" * 30 + " ") * 100 + "\n\n" + "short tail"
    chunks = split_text(text, chunk_size=50, chunk_overlap=0)
    assert all(estimate_tokens(c) <= 50 for c in chunks)
    assert chunks[-1] == "short tail"


def test_split_empty_and_whitespace():
    assert split_text("", chunk_size=10) == []
    assert split_text("   ", chunk_size=10) == []


def test_important_prefix_on_every_chunk():
    body = " ".join(f"word{i}" for i in range(400))
    chunks = chunk_with_important_prefix("My Title", body, chunk_size=100)
    assert len(chunks) > 1
    for c in chunks:
        assert c.startswith("My Title\n")


def test_reference_thousand_char_contract():
    # ~1000-char text, chunk_size=100 -> more than one chunk
    text = " ".join(["lorem"] * 170)  # ≈ 1019 chars
    assert len(text) in range(1000, 1050)
    chunks = chunk_with_important_prefix("important title", text, chunk_size=100)
    assert len(chunks) > 1
    assert all(c.startswith("important title\n") for c in chunks)


def test_word_regex_matches_reference_semantics():
    # word = runs of word chars, or single non-word non-space chars
    assert len(re.findall(r"[^\w\s]|\w+", "don't stop!")) == 5
    assert estimate_tokens("don't stop!") == max(-(-11 // 4), -(-5 * 3 // 4))


def test_estimated_tokens_col_matches_python_on_ascii(spark):
    """The JVM column twin must equal the Python estimator on ASCII text
    (the unicode divergence — Java \\w is ASCII-only — is documented)."""
    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.functions.text_splitting import (
        estimated_tokens_col,
    )

    texts = [
        SAMPLE_0,
        SAMPLE_1,
        "",
        "word",
        "a b, c!",
        "don't stop! 42 times...",
        " ".join(f"w{i}" for i in range(100)),
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["est"]
        for r in df.select(
            estimated_tokens_col(F.col("text")).alias("est")
        ).collect()
    ]
    assert got == [estimate_tokens(t) for t in texts]
