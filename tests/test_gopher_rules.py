"""Unit tests for the Gopher rule battery and n-gram repetition metrics —
edge shapes the corpus-backed oracle gate never exercises (the synthetic
documents are uniformly clean prose)."""

from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import (
    gopher_rules_cols,
    ngram_repetition_cols,
)


def _eval(spark, text, cols):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        *[c.alias(k) for k, c in cols.items()]
    ).collect()[0].asDict()


def test_gopher_flags_short_doc(spark):
    out = _eval(spark, "too short", gopher_rules_cols(F.col("text")))
    assert out["n_words"] == 2
    assert out["r_word_count"] is False


def test_gopher_flags_symbol_soup(spark):
    words = " ".join(["ok#tag"] * 30)
    out = _eval(spark, words, gopher_rules_cols(F.col("text")))
    assert out["r_word_count"] is True
    assert out["r_symbol_ratio"] is False  # 30 '#' / 30 words = 1.0 > 0.1


def test_gopher_flags_numeric_words(spark):
    words = " ".join(str(i) for i in range(40))
    out = _eval(spark, words, gopher_rules_cols(F.col("text")))
    assert out["r_alpha_words"] is False


def test_gopher_passes_clean_prose(spark):
    text = (
        "the quick brown fox jumps over a lazy dog and runs to the wide "
        "open field for it is happy that the day is warm and bright today"
    )
    out = _eval(spark, text, gopher_rules_cols(F.col("text")))
    assert all(
        out[k]
        for k in (
            "r_word_count",
            "r_mean_word_len",
            "r_symbol_ratio",
            "r_alpha_words",
            "r_stopwords",
        )
    ), out


def test_repetition_detects_loops(spark):
    looped = " ".join(["spam ham eggs"] * 20)
    out = _eval(spark, looped, ngram_repetition_cols(F.col("text"), n=3))
    assert out["total_ngrams"] == 58
    assert out["distinct_ngrams"] == 3
    assert out["dup_ngram_frac"] > 0.9


def test_repetition_zero_on_unique(spark):
    out = _eval(
        spark, "each word appears exactly once here",
        ngram_repetition_cols(F.col("text"), n=3),
    )
    assert out["dup_ngram_frac"] == 0.0


def test_repetition_short_doc_single_gram(spark):
    out = _eval(spark, "two words", ngram_repetition_cols(F.col("text"), n=3))
    assert out["total_ngrams"] == 1
    assert out["distinct_ngrams"] == 1


def test_lang_id_ngram_classifies_marker_text(spark):
    from wagtail_vector_index_spark.functions.text_analysis import (
        char_trigrams_col,
        lang_id_from_trigrams_col,
    )

    rows = spark.createDataFrame(
        [
            ("de", "der hund ist nicht auf der wiese und das ist gut"),
            ("fr", "le chat est dans la maison pour que les enfants jouent"),
            ("und", "zzz qqq kkk www"),
        ],
        "expected string, text string",
    ).select(
        "expected", char_trigrams_col(F.col("text")).alias("__tris")
    ).select(
        "expected", lang_id_from_trigrams_col(F.col("__tris")).alias("got")
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"], (r["expected"], r["got"])


def test_cdc_chunks_are_shift_invariant(spark):
    """The defining CDC property: a shared passage produces identical
    chunks even when different prefixes shift its position — fixed-size
    splitting has no such guarantee."""
    from wagtail_vector_index_spark.functions.text_analysis import cdc_chunks_col

    passage = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light"
    )
    doc_a = "short intro: " + passage
    doc_b = "a much longer and entirely different preamble goes here: " + passage
    rows = spark.createDataFrame(
        [("a", doc_a), ("b", doc_b)], "id string, text string"
    ).select("id", cdc_chunks_col(F.col("text")).alias("chunks")).collect()
    chunks = {r["id"]: set(r["chunks"]) for r in rows}
    shared = chunks["a"] & chunks["b"]
    assert shared, "shifted shared passage must still produce common chunks"
    # and every shared chunk is actual passage content
    for c in shared:
        assert c in passage or c in doc_a


def test_cdc_short_doc_single_chunk(spark):
    from wagtail_vector_index_spark.functions.text_analysis import cdc_chunks_col

    rows = spark.createDataFrame(
        [("tiny text",)], "text string"
    ).select(cdc_chunks_col(F.col("text")).alias("c")).collect()
    assert rows[0]["c"] == ["tiny text"]


def test_cdc_chunks_reassemble_exactly(spark):
    """Chunks must partition the document: concatenation reassembles the
    original text with nothing lost or duplicated."""
    from wagtail_vector_index_spark.functions.text_analysis import cdc_chunks_col

    text = "x" * 7 + " the quick brown fox " * 20
    rows = spark.createDataFrame([(text,)], "text string").select(
        cdc_chunks_col(F.col("text")).alias("c")
    ).collect()
    assert "".join(rows[0]["c"]) == text


def test_char_trigrams_match_python_reference(spark):
    """The r12 zip-slice trigram kernel (linear in doc length) must
    reproduce the old per-position substr construction bit for bit,
    including the padded-under-3-chars single-trigram rule."""
    import re

    from wagtail_vector_index_spark.functions.text_analysis import (
        char_trigrams_col,
    )

    texts = [
        "Der Hund ist  nicht\tauf der Wiese",
        "a",
        "",
        "ab",
        "x y",
        "the quick brown fox",
        "mixed CASE and   runs\n\nof whitespace",
    ]

    def ref(text):
        padded = "_" + re.sub(r"\s+", "_", text.lower()) + "_"
        n = max(len(padded) - 2, 1)
        seen, out = set(), []
        for i in range(n):
            t = padded[i : i + 3]
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    rows = (
        spark.createDataFrame([(t,) for t in texts], "text string")
        .select("text", char_trigrams_col(F.col("text")).alias("tris"))
        .collect()
    )
    for r in rows:
        assert r["tris"] == ref(r["text"]), (r["text"], r["tris"])
