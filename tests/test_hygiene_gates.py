"""Unit tests for the r9 hygiene additions: rejection-funnel attribution,
PII scrub, and the cross-source overlap matrix — edge shapes plus a
from-first-principles differential for the fingerprint math (the oracle
gate only proves Spark==DuckDB; this proves both match a hand rebuild)."""

import hashlib
import re

from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import (
    GOPHER_RULE_ORDER,
    PII_PATTERNS,
    gopher_reject_reason_col,
    pii_scrub_cols,
)


def _reason(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        gopher_reject_reason_col(F.col("text")).alias("r")
    ).collect()[0]["r"]


def test_funnel_charges_first_failing_rule(spark):
    # fails word_count (2 words) AND stopwords (0 hits) -> charged to
    # word_count, the earlier rule in GOPHER_RULE_ORDER
    assert GOPHER_RULE_ORDER.index("word_count") < GOPHER_RULE_ORDER.index(
        "stopwords"
    )
    assert _reason(spark, "zz qq") == "word_count"


def test_funnel_passes_clean_prose(spark):
    text = (
        "the quick brown fox jumps over a lazy dog and runs to the wide "
        "open field for it is happy that the day is warm and bright today"
    )
    assert _reason(spark, text) == "pass"


def test_funnel_symbol_attribution(spark):
    # 30 words (passes count), each with '#' -> symbol_ratio fires and
    # earlier rules do not
    assert _reason(spark, " ".join(["oktag#"] * 30)) == "symbol_ratio"


def test_funnel_partition_sums_to_corpus(spark):
    rows = [
        ("zz qq",),  # word_count
        (" ".join(["oktag#"] * 30),),  # symbol_ratio
        (
            "the quick brown fox jumps over a lazy dog and runs to the "
            "wide open field for it is happy that the day is warm today",
        ),  # pass
        # 5-char numerics: mean word length passes (5.0), alpha fails
        (" ".join(str(i + 10000) for i in range(40)),),  # alpha_words
    ]
    df = spark.createDataFrame(rows, "text string")
    funnel = (
        df.select(gopher_reject_reason_col(F.col("text")).alias("r"))
        .groupBy("r")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in funnel) == len(rows)
    got = {r["r"]: r["count"] for r in funnel}
    assert got == {
        "word_count": 1,
        "symbol_ratio": 1,
        "pass": 1,
        "alpha_words": 1,
    }


def _py_scrub(text):
    counts = {}
    red = text
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}s"] = len(re.findall(pat, text))
        red = re.sub(pat, repl, red)
    return counts, red


def test_pii_scrub_matches_python_re(spark):
    text = (
        "reach me at john.doe+spam@mail-host.co or admin@ex.io backup "
        "tel 555-0199 and 555-12345 box at 10.0.3.1 not 555-12 ok"
    )
    df = spark.createDataFrame([(text,)], "text string")
    cols = pii_scrub_cols(F.col("text"))
    got = df.select(
        *[cols[k].alias(k) for k in ("n_emails", "n_phones", "n_ips", "redacted")]
    ).collect()[0]
    counts, red = _py_scrub(text)
    assert got["n_emails"] == counts["n_emails"] == 2
    # 555-12345 contains 555-1234 but \b rejects it (followed by digit);
    # 555-0199 matches
    assert got["n_phones"] == counts["n_phones"] == 1
    assert got["n_ips"] == counts["n_ips"] == 1
    assert got["redacted"] == red
    assert "@" not in got["redacted"] and "10.0.3.1" not in got["redacted"]


def test_pii_scrub_counts_before_redaction(spark):
    # the email's dots must not be half-eaten by the ip pattern: counts
    # are on the ORIGINAL text, redaction is ordered email->phone->ip
    text = "mail 1.2.3.4@dotted-host.com and bare 5.6.7.8"
    df = spark.createDataFrame([(text,)], "text string")
    cols = pii_scrub_cols(F.col("text"))
    got = df.select(
        *[cols[k].alias(k) for k in ("n_emails", "n_ips", "redacted")]
    ).collect()[0]
    _, red = _py_scrub(text)
    assert got["redacted"] == red
    assert "<EMAIL>" in got["redacted"] and "<IP>" in got["redacted"]


def _py_fp_sets(texts, n=3):
    """Hand rebuild of token_sha_hashes_col + ngram_fingerprints_col."""
    out = []
    for t in texts:
        toks = [w for w in t.lower().split(" ") if w]
        th = [
            int(hashlib.sha256(w.encode()).hexdigest()[:8], 16) for w in toks
        ]
        cnt = max(len(th) - (n - 1), 1)
        fps = set()
        for i in range(cnt):
            fp = 0
            for j in range(n):
                if i + j < len(th):
                    fp ^= th[i + j] << j
            fps.add(fp)
        out.append(fps)
    return out


def test_source_overlap_matches_hand_fingerprints(spark, tmp_path):
    texts = {
        "a": "one two three four five",
        "b": "zzz two three four qqq",  # shares the 'two three four' gram
        "c": "totally different words here now",
    }
    rows = [
        (i, txt, "en", src, len(txt))
        for i, (src, txt) in enumerate(sorted(texts.items()))
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))

    from wagtail_vector_index_spark.queries_text import pipeline_source_overlap

    got = {
        (r["src_a"], r["src_b"]): (r["n_common"], r["jaccard"])
        for r in pipeline_source_overlap(spark, str(tmp_path)).collect()
    }
    sets = dict(zip(sorted(texts), _py_fp_sets([texts[k] for k in sorted(texts)])))
    expect = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                inter = len(sets[a] & sets[b])
                expect[(a, b)] = (
                    inter,
                    inter / len(sets[a] | sets[b]),
                )
    assert set(got) == set(expect)  # zero-overlap pairs omitted
    for k, (n, j) in expect.items():
        assert got[k][0] == n
        assert abs(got[k][1] - j) < 1e-12


def test_corpus_quality_gate_and_scrub(spark):
    from wagtail_vector_index_spark.operators.corpus import Corpus

    rows = [
        (1, "zz qq", "s1"),  # fails word_count
        (
            2,
            "the quick brown fox jumps over a lazy dog and runs to the "
            "wide open field for it is happy that the day is warm today "
            "write to me at alice@example.org please",
            "s1",
        ),
    ]
    c = Corpus(spark.createDataFrame(rows, "doc_id long, text string, source string"))
    kept = c.quality_gate().df.collect()
    assert [r["doc_id"] for r in kept] == [2]

    scrubbed = c.scrub_pii(counts=True).df.orderBy("doc_id").collect()
    assert scrubbed[0]["n_emails"] == 0
    assert scrubbed[1]["n_emails"] == 1
    assert "<EMAIL>" in scrubbed[1]["text"]
    assert "alice@example.org" not in scrubbed[1]["text"]

    funnel = {
        (r["source"], r["reject_reason"]): r["n_docs"]
        for r in c.rejection_funnel().collect()
    }
    assert funnel == {("s1", "word_count"): 1, ("s1", "pass"): 1}


def test_eval_gram_broadcast_fallback_parity(spark):
    """Above max_broadcast_grams the eval-gram join must fall back to a
    shuffle join (no broadcast hint in the plan) with identical results
    — the mega-eval-suite guard on scrub_spans /
    decontaminate_collisions."""
    from wagtail_vector_index_spark.operators.corpus import Corpus

    rows = [
        (1, "s", "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "lam mu nu xi omicron pi"),
        (2, "s", "totally clean document with its very own unique words "
                 "here spread over thirteen tokens easily"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # 15 tokens -> 3 thirteen-grams, so bound=1 genuinely exceeds
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lam mu nu xi omicron")],
        "doc_id long, text string",
    )

    def run(kind, bound):
        c = Corpus(df)
        out = (
            c.scrub_spans(eval_df=ev, n=13, max_broadcast_grams=bound)
            if kind == "scrub"
            else c.decontaminate_collisions(
                eval_df=ev, n=13, max_broadcast_grams=bound
            )
        )
        # the guard removes the un-overridable broadcast HINT — on a
        # tiny test side AQE may still pick a broadcast join on its
        # own (size-bounded, overridable), so assert on the logical
        # plan's hint, not the physical operator
        plan = out.df._jdf.queryExecution().optimizedPlan().toString().lower()
        rows_ = sorted(
            (r["doc_id"], r["text"]) for r in out.df.collect()
        )
        return plan, rows_

    for kind in ("scrub", "collisions"):
        bplan, bres = run(kind, 5_000_000)
        splan, sres = run(kind, 1)  # forces the fallback
        fplan, fres = run(kind, 0)  # <=0 forces it without the probe
        assert "hint" in bplan, kind
        assert "hint" not in splan, kind
        assert "hint" not in fplan, kind
        assert bres == sres == fres, kind
        if kind == "scrub":  # doc 1 scrubbed, doc 2 untouched
            assert bres[0][0] == 1 and "alpha" not in bres[0][1]
            assert bres[1] == (2, rows[1][2])
        else:  # collisions drops doc 1 entirely
            assert [r[0] for r in bres] == [2]
