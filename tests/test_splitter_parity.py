"""Differential tests: our splitter vs the reference implementation.

Chunk boundaries define document identity (SURVEY §7 risk register), so we
run the reference's own splitter (imported read-only from /root/reference)
side-by-side with ours over adversarial and real inputs and require
identical output. Uses hypothesis for property-based coverage.
"""

from __future__ import annotations

import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/reference/src")

from wagtail_vector_index.ai_utils.text_splitting.langchain import (  # noqa: E402
    LangchainRecursiveCharacterTextSplitter,
)
from wagtail_vector_index.ai_utils.text_splitting.naive import (  # noqa: E402
    NaiveTextSplitterCalculator,
)

from wagtail_vector_index_spark.functions.text_splitting import (  # noqa: E402
    estimate_tokens,
    split_text,
)

_calc = NaiveTextSplitterCalculator()


def _reference_split(text: str, chunk_size: int, chunk_overlap: int) -> list[str]:
    splitter = LangchainRecursiveCharacterTextSplitter(
        chunk_size=chunk_size,
        chunk_overlap=chunk_overlap,
        length_function=_calc.get_splitter_length,
    )
    return splitter.split_text(text)


CASES = [
    ("", 100, 10),
    ("   ", 100, 10),
    ("hello world", 100, 10),
    (" ".join(f"word{i}" for i in range(500)), 100, 10),
    (" ".join(f"word{i}" for i in range(500)), 50, 25),
    ("\n\n".join("para " * 40 for _ in range(10)), 60, 10),
    ("\n".join("line " * 10 for _ in range(50)), 30, 5),
    ("x" * 2000, 50, 10),  # no separators at all -> per-char splitting
    (("y" * 300 + " ") * 20, 40, 0),  # oversized words
    ("a\n\nb\n\nc", 1, 0),
    ("mixed  double  spaces\n\n\n\ntriple\nnewlines  here", 10, 2),
    ("tab\tseparated\ttokens " * 30, 20, 5),
]


@pytest.mark.parametrize("text,size,overlap", CASES)
def test_split_matches_reference(text, size, overlap):
    assert split_text(text, chunk_size=size, chunk_overlap=overlap) == _reference_split(
        text, size, overlap
    )


@pytest.mark.parametrize("text,size,overlap", CASES)
def test_length_matches_reference(text, size, overlap):
    assert estimate_tokens(text) == _calc.get_splitter_length(text)


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(
        alphabet=st.sampled_from(list("ab \n.!é字")), min_size=0, max_size=400
    ),
    size=st.integers(min_value=1, max_value=60),
    overlap=st.integers(min_value=0, max_value=20),
)
def test_split_matches_reference_property(text, size, overlap):
    assert split_text(text, chunk_size=size, chunk_overlap=overlap) == _reference_split(
        text, size, overlap
    )


@settings(max_examples=200, deadline=None)
@given(text=st.text(min_size=0, max_size=300))
def test_length_matches_reference_property(text):
    assert estimate_tokens(text) == _calc.get_splitter_length(text)


def test_split_matches_reference_on_testdata():
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    for (text,) in rows:
        for size in (50, 100, 8191):
            assert split_text(text, chunk_size=size, chunk_overlap=100) == (
                _reference_split(text, size, 100)
            )


def test_important_prefix_matches_reference_semantics():
    """The reference prefixes f'{important}\n' at FULL chunk_size
    (django.py:429-432) — including the empty-important lone-newline
    quirk."""
    from wagtail_vector_index_spark.functions.text_splitting import (
        chunk_with_important_prefix,
    )

    body = " ".join(f"w{i}" for i in range(300))
    for important in ("My Important Title", ""):
        ours = chunk_with_important_prefix(important, body, chunk_size=60)
        reference = [
            f"{important}\n{chunk}" for chunk in _reference_split(body, 60, 100)
        ]
        assert ours == reference


def test_chunk_explode_oracle_regime_holds_on_testdata():
    """The pipeline_chunk_explode oracle replays the splitter as ONE
    greedy merge fold, which is exact only while no piece at the active
    separator reaches chunk_size (the recursion branch never fires).
    Assert that precondition over the gate corpus at the gate's
    chunk_size=60, and that the staleness gate's chunk_size=1e6 keeps
    every document single-chunk."""
    import re

    import duckdb

    from wagtail_vector_index_spark.functions.text_splitting import (
        DEFAULT_SEPARATORS,
        estimate_tokens,
    )

    for sf in ("sf0.001", "sf0.01"):
        rows = duckdb.connect().execute(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall()
        for (text,) in rows:
            active = ""
            for sep in DEFAULT_SEPARATORS:
                if sep == "" or sep in text:
                    active = sep
                    break
            pieces = (
                [p for p in re.split(re.escape(active), text) if p]
                if active
                else [c for c in text]
            )
            assert all(estimate_tokens(p) < 60 for p in pieces)
            assert estimate_tokens(text) < 1_000_000
            # single-chunk regime for the staleness oracle
            assert len(split_text(text, chunk_size=1_000_000, chunk_overlap=100)) <= 1
