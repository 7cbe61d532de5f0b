"""Unit tests for the r9 corpus-statistics gates: Heaps'-law fit,
padding-waste audit, quality AUC, banding sweep, and the isotropy
identity — from-first-principles differentials (the oracle gates only
prove Spark==DuckDB; these prove both match a hand rebuild)."""

import math

import numpy as np
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# vector_isotropy: the sum-of-vectors identity vs brute-force pairs
# --------------------------------------------------------------------------


def test_isotropy_identity_matches_bruteforce(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8) + 0.4  # offset -> anisotropic, nonzero mean
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    n = len(unit)
    # brute force: average cosine over all ordered pairs i != j
    gram = unit @ unit.T
    brute = (gram.sum() - n) / (n * (n - 1))
    # identity: (||sum u||^2 - n) / (n (n-1))
    ident = (np.linalg.norm(unit.sum(axis=0)) ** 2 - n) / (n * (n - 1))
    assert abs(brute - ident) < 1e-9

    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, v array<double>",
    )
    nrm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    u = df.select(
        nrm.alias("nrm"),
        F.transform(F.col("v"), lambda x: x / nrm).alias("uv"),
    )
    # per-dim mean -> quadratic form, exactly as the catalog gate
    dims = 8
    sums = u.agg(
        *[
            F.sum(F.element_at("uv", d + 1)).alias(f"s{d}")
            for d in range(dims)
        ],
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    s2 = sum((sums[f"s{d}"] / sums["n"]) ** 2 for d in range(dims))
    got = (sums["n"] ** 2 * s2 - sums["n"]) / (sums["n"] * (sums["n"] - 1))
    assert abs(got - brute) < 1e-9


# --------------------------------------------------------------------------
# text_quality_auc: grouped tie-corrected rank AUC vs direct Mann-Whitney
# --------------------------------------------------------------------------


def _mann_whitney_auc(scores, labels):
    """Direct tie-corrected AUC: P(s_pos > s_neg) + 0.5 P(s_pos == s_neg)."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    return wins / (len(pos) * len(neg))


def test_grouped_rank_auc_matches_pairwise(spark):
    rng = np.random.RandomState(3)
    labels = [int(x) for x in rng.rand(60) < 0.4]
    # ties on purpose: quantize scores to one decimal
    scores = [round(float(y * 0.5 + rng.rand() * 0.8), 1) for y in labels]
    expected = _mann_whitney_auc(scores, labels)

    df = spark.createDataFrame(
        list(zip(scores, labels)), "s double, y int"
    )
    g = df.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("p")
    )
    from pyspark.sql import Window

    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "p",
        "c",
        (
            F.coalesce(F.sum("c").over(w), F.lit(0))
            + (F.col("c") + 1) / F.lit(2.0)
        ).alias("avg_rank"),
    )
    n_pos = F.sum("p")
    n_neg = F.sum("c") - F.sum("p")
    got = r.agg(
        (
            (F.sum(F.col("p") * F.col("avg_rank")) - n_pos * (n_pos + 1) / 2.0)
            / (n_pos * n_neg)
        ).alias("auc")
    ).collect()[0]["auc"]
    assert abs(got - expected) < 1e-9


# --------------------------------------------------------------------------
# text_heaps_law: cumulative vocab counting via first-occurrence docs
# --------------------------------------------------------------------------


def test_heaps_cumulative_counts(spark):
    docs = [
        (1, "a b c"),
        (2, "a b d d"),
        (3, "e"),
        (4, "a e f g"),
    ]
    # hand truth: N_i cumulative tokens, V_i cumulative distinct
    seen, truth = set(), []
    total = 0
    for _, text in docs:
        toks = text.split()
        total += len(toks)
        seen |= set(toks)
        truth.append((total, len(seen)))
    assert truth == [(3, 3), (7, 4), (8, 5), (12, 7)]

    from wagtail_vector_index_spark.operators.prefixsum import prefix_sum

    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = df.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    per_doc = t.select("doc_id", F.size("toks").cast("long").alias("n_toks"))
    nf = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    joined = per_doc.join(
        nf, per_doc.doc_id == nf.first_doc, "left"
    ).select(
        "doc_id",
        "n_toks",
        F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first"),
    )
    cum = prefix_sum(
        joined, order_cols=["doc_id"], value_cols=["n_toks", "n_first"]
    )
    got = [
        (r["n_toks_cum"], r["n_first_cum"])
        for r in cum.orderBy("doc_id").collect()
    ]
    assert got == truth


# --------------------------------------------------------------------------
# pipeline_padding_waste: hand-checked batching
# --------------------------------------------------------------------------


def test_padding_waste_hand_example(spark):
    # batch size 2; lengths in arrival order: 10, 2, 8, 8, 1
    # arrival batches: [10,2] pad 8, [8,8] pad 0, [1] pad 0 -> 8 total
    # sorted desc:     [10,8] pad 2, [8,2] pad 6, [1] pad 0 -> 8 total
    # sorted desc with tiebreak asc keeps equal-length docs adjacent
    lengths = [(1, 10), (2, 2), (3, 8), (4, 8), (5, 1)]
    from wagtail_vector_index_spark.operators.prefixsum import assign_dense_ids

    df = spark.createDataFrame(lengths, "doc_id long, n long")

    def waste(order_frame, order_cols):
        ids = assign_dense_ids(
            order_frame, order_cols=order_cols, out_col="rn"
        )
        per = (
            ids.withColumn("batch", ((F.col("rn") - 1) / F.lit(2)).cast("long"))
            .groupBy("batch")
            .agg((F.count(F.lit(1)) * F.max("n") - F.sum("n")).alias("pad"))
        )
        return {r["batch"]: r["pad"] for r in per.collect()}

    assert waste(df, ["doc_id"]) == {0: 8, 1: 0, 2: 0}
    assert waste(
        df.withColumn("neg_n", -F.col("n")), ["neg_n", "doc_id"]
    ) == {0: 2, 1: 6, 2: 0}


# --------------------------------------------------------------------------
# dedup_band_sweep: banding monotonicity + differential vs the single-
# config production operator
# --------------------------------------------------------------------------


def test_band_sweep_monotone_and_matches_single_config(spark, sf_dir):
    from wagtail_vector_index_spark.operators.dedup import minhash_lsh_pairs
    from wagtail_vector_index_spark.queries import QUERY_FNS

    rows = QUERY_FNS["dedup_band_sweep"](spark, sf_dir).collect()
    by_bands = {r["bands"]: r for r in rows}
    assert sorted(by_bands) == [2, 4, 8, 16]
    # finer banding (more bands, shorter rows) can only ADD candidates:
    # matching a 2-row band implies matching both constituent 1-row bands
    cands = [by_bands[b]["n_candidates"] for b in (2, 4, 8, 16)]
    assert cands == sorted(cands)
    for r in rows:
        assert 0 <= r["n_verified"] <= r["n_candidates"]
        assert abs(
            r["precision"] - round(r["n_verified"] / r["n_candidates"], 6)
        ) < 1e-9
    # the bands=8 row must agree with the production single-config path
    from wagtail_vector_index_spark.catalog import _t

    single = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        n=3,
        num_hashes=16,
        bands=8,
        threshold=0.1,
    ).count()
    assert by_bands[8]["n_verified"] == single


# --------------------------------------------------------------------------
# pipeline_span_scrub: surgical window removal, hand-planted contamination
# --------------------------------------------------------------------------


def test_span_scrub_removes_only_contaminated_windows(spark, tmp_path):
    # 13-gram protocol with a planted verbatim quote: train doc 1 embeds
    # the eval doc's exact 13 tokens in the middle of clean prose; train
    # doc 2 shares nothing. Only the quoted window (plus the overlapping
    # gram starts) must disappear.
    eval_tokens = [f"e{i}" for i in range(13)]
    prefix = [f"p{i}" for i in range(20)]
    suffix = [f"s{i}" for i in range(20)]
    rows = [
        (0, " ".join(eval_tokens), "src0"),
        (1, " ".join(prefix + eval_tokens + suffix), "web"),
        (2, " ".join(f"c{i}" for i in range(40)), "web"),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sf")
    import os

    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * 3,
                "source": [r[2] for r in rows],
                "n_chars": [len(r[1]) for r in rows],
            }
        ),
        f"{d}/documents.parquet",
    )
    from wagtail_vector_index_spark.queries import QUERY_FNS

    out = {r["doc_id"]: r for r in QUERY_FNS["pipeline_span_scrub"](spark, d).collect()}
    # doc 2 is clean -> absent
    assert set(out) == {1}
    r = out[1]
    assert r["n_tokens"] == 53
    # exactly one colliding gram position (the quote start)
    assert r["n_spans"] == 1
    # the 13 quoted tokens are removed, prefix/suffix survive
    assert r["n_removed"] == 13
    import hashlib

    expected = " ".join(prefix + suffix)
    assert r["cleaned_sha"] == hashlib.sha256(expected.encode()).hexdigest()


def test_corpus_scrub_spans_facade(spark, tmp_path):
    # same planted corpus as above, through the Corpus transformation
    # facade: contaminated doc loses exactly the quoted window, clean
    # doc's text is byte-identical
    eval_tokens = [f"e{i}" for i in range(13)]
    prefix = [f"p{i}" for i in range(20)]
    suffix = [f"s{i}" for i in range(20)]
    rows = [
        (0, " ".join(eval_tokens), "src0"),
        (1, " ".join(prefix + eval_tokens + suffix), "web"),
        (2, " ".join(f"c{i}" for i in range(40)), "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from wagtail_vector_index_spark.operators.corpus import Corpus

    out = {
        r["doc_id"]: r["text"]
        for r in Corpus(df).scrub_spans(eval_sources={"src0"}).df.collect()
    }
    assert set(out) == {1, 2}  # eval docs excluded, train docs kept
    assert out[1] == " ".join(prefix + suffix)
    assert out[2] == rows[2][1]


def test_minhash_estimate_extremes(spark):
    # identical docs agree on all 16 signature positions and have exact
    # jaccard 1.0; the near-identical pair agrees on most but its exact
    # jaccard < 1.0 — the calibration gate's two ends
    base = " ".join(f"w{i}" for i in range(30))
    rows = [
        (1, base),
        (2, base),
        (3, base + " tail0 tail1 tail2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from wagtail_vector_index_spark.operators.dedup import (
        _band_candidates,
        minhash_signatures,
    )

    sig = minhash_signatures(df, n=3, num_hashes=16, cache=False)
    cand = _band_candidates(sig, "doc_id", 8, 2)
    sa = sig.select(
        F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"),
        F.col("shingles").alias("sh_a"),
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"),
        F.col("shingles").alias("sh_b"),
    )
    m = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda b: b)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = {
        (r["id_a"], r["id_b"]): (r["m"], r["j"])
        for r in cand.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", m.alias("m"), (inter / union).alias("j"))
        .collect()
    }
    assert out[(1, 2)] == (16, 1.0)
    m3, j3 = out[(1, 3)]
    assert j3 < 1.0 and m3 <= 16


# --------------------------------------------------------------------------
# text_vocab_coverage: one-pass conditional agg vs a hand-built curve
# --------------------------------------------------------------------------


def test_vocab_coverage_matches_hand_curve(spark):
    from wagtail_vector_index_spark.operators.corpus import Corpus

    docs = [
        (1, "s", "a a a a b b c d"),
        (2, "s", "a b b c e"),
        (3, "s", "f a"),
    ]
    # counts: a=6 b=4 c=2 d=1 e=1 f=1 (total 15, 6 types); rank ties on
    # count break ascending by token: d(4) e(5) f(6)
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = {
        r["vocab_size"]: r
        for r in Corpus(df).vocab_coverage(vocab_sizes=(1, 2, 4, 10)).collect()
    }
    assert [out[k]["covered_tokens"] for k in (1, 2, 4, 10)] == [
        6,
        10,
        13,
        15,
    ]
    for k in (1, 2, 4, 10):
        assert out[k]["total_tokens"] == 15
        assert out[k]["n_types"] == 6
        assert out[k]["coverage"] == round(out[k]["covered_tokens"] / 15, 6)


def test_vocab_coverage_deterministic_under_repartition(spark):
    from wagtail_vector_index_spark.operators.corpus import Corpus

    docs = [(i, "s", f"tok{i % 7} tok{i % 3} shared") for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    a = Corpus(df.repartition(1)).vocab_coverage(vocab_sizes=(3, 5)).collect()
    b = Corpus(df.repartition(13)).vocab_coverage(vocab_sizes=(3, 5)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_vocab_coverage_dedupes_and_sorts_sizes(spark):
    """Duplicate / unsorted vocab_sizes must not break the stack()
    expression; the output equals the deduped sorted curve."""
    import pytest as _pytest

    from wagtail_vector_index_spark.operators.corpus import Corpus

    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b d e")], "doc_id long, text string"
    )
    got = Corpus(df).vocab_coverage(vocab_sizes=(4, 2, 2, 4)).collect()
    assert [r["vocab_size"] for r in got] == [2, 4]
    want = Corpus(df).vocab_coverage(vocab_sizes=(2, 4)).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    with _pytest.raises(ValueError, match="non-empty"):
        Corpus(df).vocab_coverage(vocab_sizes=())
