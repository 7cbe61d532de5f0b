"""Property-based differential: the JVM gopher/repetition expressions vs
straightforward pure-Python reference implementations, over adversarial
generated text. Same strategy as the splitter parity suite — the Python
twin is the spec, hypothesis hunts the divergence."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import (
    STOPWORDS,
    gopher_rules_cols,
    ngram_repetition_cols,
)

ALPHABET = "abcdefgh ijkl\tmnop\nqrst#...uvw 0123 the a of é-xyz"


def py_tokens(text):
    return [t for t in text.lower().split() if t]


def py_gopher(text):
    toks = py_tokens(text)
    n = len(toks)
    denom = max(n, 1)
    char_sum = sum(len(t) for t in toks)
    mean = char_sum / denom
    n_alpha = sum(1 for t in toks if any("a" <= c <= "z" for c in t))
    n_hash = text.count("#")
    n_ell = text.count("...")  # non-overlapping, like replace()
    symbol_ratio = (n_hash + n_ell) / denom
    stops = len(set(toks) & set(STOPWORDS["en"]))
    return {
        "n_words": n,
        "r_word_count": 20 <= n <= 100_000,
        "r_mean_word_len": 3.0 <= mean <= 10.0,
        "r_symbol_ratio": symbol_ratio <= 0.1,
        "r_alpha_words": (n_alpha / denom) >= 0.8,
        "r_stopwords": stops >= 2,
    }


def py_repetition(text, n=3):
    toks = py_tokens(text)
    count = max(len(toks) - (n - 1), 1)
    grams = [" ".join(toks[i : i + n]) for i in range(count)]
    total, distinct = len(grams), len(set(grams))
    return {
        "total_ngrams": total,
        "distinct_ngrams": distinct,
        "dup_ngram_frac": (total - distinct) / max(total, 1),
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(st.text(alphabet=ALPHABET, max_size=400), min_size=1, max_size=24)
)
def test_gopher_and_repetition_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    g = gopher_rules_cols(F.col("text"))
    r = ngram_repetition_cols(F.col("text"), n=3)
    rows = df.select(
        "i",
        *[c.alias(k) for k, c in g.items()],
        *[c.alias(k) for k, c in r.items()],
    ).collect()
    for row in rows:
        text = texts[row["i"]]
        for k, v in {**py_gopher(text), **py_repetition(text)}.items():
            got = row[k]
            if isinstance(v, float):
                assert got is not None and math.isclose(got, v, abs_tol=0), (
                    k,
                    text,
                    got,
                    v,
                )
            else:
                assert got == v, (k, text, got, v)


def py_cdc_chunks(text, window=16, mask=64):
    import hashlib

    t = text or ""
    n = len(t)
    if n <= window:
        return [t]
    bounds = []
    for i in range(window, n):  # 1-based positions window..n-1
        win = t[i - window : i]  # chars (i-window+1)..i, 1-based
        h = int(hashlib.sha256(win.encode("utf-8")).hexdigest()[:8], 16)
        if h % mask == 0:
            bounds.append(i)
    starts = [1] + [b + 1 for b in bounds]
    ends = bounds + [n]
    return [t[s - 1 : e] for s, e in zip(starts, ends)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.text(alphabet="ab cd\nef", min_size=0, max_size=300),
        min_size=1,
        max_size=16,
    )
)
def test_cdc_chunks_match_python(spark, texts):
    from wagtail_vector_index_spark.functions.text_analysis import cdc_chunks_col

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = df.select("i", cdc_chunks_col(F.col("text")).alias("c")).collect()
    got = {r["i"]: list(r["c"]) for r in rows}
    for i, t in enumerate(texts):
        assert got[i] == py_cdc_chunks(t), repr(t)


def test_cdc_chunks_long_docs_match_python(spark):
    """The r12 length-gated chunk build: docs above _CDC_SEEK_MAX_CHARS
    take the linear char-array kernel (the hypothesis differential above
    only generates <=300-char docs, which all take the substr branch) —
    pin the array branch against the python reference on long docs,
    unicode / astral-plane chars included, plus one doc on each side of
    the gate."""
    import random

    from wagtail_vector_index_spark.functions.text_analysis import (
        _CDC_SEEK_MAX_CHARS,
        cdc_chunks_col,
    )

    rng = random.Random(12)
    alpha = "ab cd\nef ghijklmnop qrstuv "
    texts = [
        "".join(rng.choice(alpha) for _ in range(9000)),
        "".join(rng.choice(alpha + "é漢😀𝄞") for _ in range(6000)),
        "".join(rng.choice(alpha) for _ in range(_CDC_SEEK_MAX_CHARS)),
        "".join(rng.choice(alpha) for _ in range(_CDC_SEEK_MAX_CHARS + 1)),
    ]
    assert len(texts[0]) > _CDC_SEEK_MAX_CHARS
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = df.select("i", cdc_chunks_col(F.col("text")).alias("c")).collect()
    got = {r["i"]: list(r["c"]) for r in rows}
    for i, t in enumerate(texts):
        assert got[i] == py_cdc_chunks(t), f"doc {i} (len {len(t)})"
