"""Text splitting: naive token-length estimator + recursive character
splitter, plus their Spark column/UDF surfaces.

Behavioral parity targets (re-implemented from scratch against the
published algorithm semantics; the splitter algorithm itself originates in
the MIT-licensed LangChain project):

- token estimator semantics: ``ceil(max(ceil(chars/4), ceil(words*0.75)))``
  with word = regex ``[^\\w\\s]|\\w+``
  (reference: src/wagtail_vector_index/ai_utils/text_splitting/naive.py:27-55)
- recursive splitter: try separators ["\\n\\n", "\\n", " ", ""] in order,
  split on the first one present, greedily re-merge pieces up to
  ``chunk_size`` with ``chunk_overlap`` carried between chunks, recurse into
  oversized pieces with the remaining separators, strip whitespace, drop
  empties (reference:
  src/wagtail_vector_index/ai_utils/text_splitting/langchain.py:87-177)

Chunk boundaries define document identity and staleness, so these must be
bit-identical to the reference behavior — see tests/test_text_splitting.py
for golden values lifted from the reference test suite
(tests/test_ai_utils/test_text_splitting.py:30-39).
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Token-length estimation (driver/UDF side)
# --------------------------------------------------------------------------

_TOKEN_WORD_RE = re.compile(r"[^\w\s]|\w+")
CHARACTERS_PER_TOKEN = 4
WORDS_PER_TOKEN = 0.75


def estimate_tokens(text: str) -> int:
    """Estimated token count of ``text`` (safe cross-model heuristic).

    max(ceil(chars/4), ceil(words*0.75)); a "word" is any run of word chars
    or a single non-word non-space char.
    """
    char_tokens = math.ceil(len(text) / CHARACTERS_PER_TOKEN)
    word_tokens = math.ceil(len(_TOKEN_WORD_RE.findall(text)) * WORDS_PER_TOKEN)
    return max(char_tokens, word_tokens)


def text_length(text: str) -> int:
    """Identity length (reference DummyLengthCalculator analog)."""
    return len(text)


def estimated_tokens_col(text: Column) -> Column:
    """JVM-side column twin of :func:`estimate_tokens` — no Python
    round-trip. Identical to the Python estimator on ASCII text.

    Caveat: Java regex ``\\w`` is ASCII-only while Python's is unicode, so
    on non-ASCII words this column counts each letter-run as punctuation
    chars where Python counts one word. Chunking always uses the Python
    estimator (it must match the reference bit-for-bit); use this column
    for analytics over ASCII-dominant corpora, where it is exact.
    """
    words = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]|\w+"), 0))
    char_tokens = F.ceil(F.length(text) / F.lit(CHARACTERS_PER_TOKEN))
    word_tokens = F.ceil(words * F.lit(WORDS_PER_TOKEN))
    return F.greatest(char_tokens, word_tokens).cast("long")


# --------------------------------------------------------------------------
# Recursive character splitting (pure Python; used inside a pandas UDF)
# --------------------------------------------------------------------------

DEFAULT_SEPARATORS: tuple[str, ...] = ("\n\n", "\n", " ", "")

LengthFn = Callable[[str], int]


def _regex_split(text: str, separator: str) -> list[str]:
    """Split on the (escaped) separator, dropping empty pieces. The empty
    separator means per-character splitting."""
    pieces = re.split(re.escape(separator), text) if separator else list(text)
    return [p for p in pieces if p != ""]


def _join_pieces(pieces: Sequence[str], separator: str) -> str | None:
    joined = separator.join(pieces).strip()
    return joined if joined else None


def _merge_pieces(
    pieces: Sequence[str],
    separator: str,
    chunk_size: int,
    chunk_overlap: int,
    length: LengthFn,
) -> list[str]:
    """Greedily pack small pieces into chunks of at most ``chunk_size``
    estimated tokens, carrying ~``chunk_overlap`` tokens of trailing pieces
    into the next chunk."""
    sep_len = length(separator)
    chunks: list[str] = []
    window: list[str] = []
    running = 0
    for piece in pieces:
        piece_len = length(piece)
        if running + piece_len + (sep_len if window else 0) > chunk_size:
            if window:
                joined = _join_pieces(window, separator)
                if joined is not None:
                    chunks.append(joined)
                # Shrink the window until it fits within the overlap budget
                # and leaves room for the incoming piece.
                while running > chunk_overlap or (
                    running + piece_len + (sep_len if window else 0) > chunk_size
                    and running > 0
                ):
                    running -= length(window[0]) + (sep_len if len(window) > 1 else 0)
                    window = window[1:]
        window.append(piece)
        running += piece_len + (sep_len if len(window) > 1 else 0)
    joined = _join_pieces(window, separator)
    if joined is not None:
        chunks.append(joined)
    return chunks


def split_text(
    text: str,
    *,
    chunk_size: int,
    chunk_overlap: int = 100,
    length: LengthFn = estimate_tokens,
    separators: Sequence[str] = DEFAULT_SEPARATORS,
) -> list[str]:
    """Recursively split ``text`` into chunks of at most ``chunk_size``
    estimated tokens (best effort), with ``chunk_overlap`` carried between
    adjacent chunks."""
    # Pick the first separator present in the text; "" always matches.
    active = separators[-1]
    remaining: Sequence[str] = ()
    for i, sep in enumerate(separators):
        if sep == "" or re.search(re.escape(sep), text):
            active = sep
            remaining = separators[i + 1 :]
            break

    chunks: list[str] = []
    buffer: list[str] = []
    for piece in _regex_split(text, active):
        if length(piece) < chunk_size:
            buffer.append(piece)
            continue
        if buffer:
            chunks.extend(
                _merge_pieces(buffer, active, chunk_size, chunk_overlap, length)
            )
            buffer = []
        if remaining:
            chunks.extend(
                split_text(
                    piece,
                    chunk_size=chunk_size,
                    chunk_overlap=chunk_overlap,
                    length=length,
                    separators=remaining,
                )
            )
        else:
            chunks.append(piece)
    if buffer:
        chunks.extend(_merge_pieces(buffer, active, chunk_size, chunk_overlap, length))
    return chunks


def chunk_with_important_prefix(
    important_text: str,
    body_text: str,
    *,
    chunk_size: int,
    chunk_overlap: int = 100,
) -> list[str]:
    """Reference chunk_object semantics, exactly
    (src/wagtail_vector_index/storage/django.py:405-432): split the body
    at the FULL chunk_size and prefix ``f"{important}\\n"`` onto every
    chunk. The reference neither shrinks chunk_size to make room for the
    prefix nor skips the ``\\n`` when the important text is empty — chunk
    content defines document identity, so we reproduce both quirks."""
    return [
        f"{important_text}\n{chunk}"
        for chunk in split_text(
            body_text, chunk_size=chunk_size, chunk_overlap=chunk_overlap
        )
    ]


def split_text_udf(chunk_size: int, chunk_overlap: int = 100):
    """Arrow-batched pandas UDF returning array<string> of chunks; pair with
    ``posexplode`` for (chunk ordinal, chunk) rows."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _split(texts: "pd.Series") -> "pd.Series":
        return texts.map(
            lambda t: split_text(
                t or "", chunk_size=chunk_size, chunk_overlap=chunk_overlap
            )
        )

    return _split
