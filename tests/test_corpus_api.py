"""Corpus facade tests (operators/corpus.py) — the fluent training-data
pipeline API. The load-bearing test is the parity one: the facade chain
must reproduce the oracle-gated `pipeline_corpus_prep` catalog query
byte-for-byte, tying the API surface to the correctness gate."""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.corpus import Corpus


@pytest.fixture()
def docs(spark, sf_dir):
    from wagtail_vector_index_spark.catalog import _t

    return _t(spark, sf_dir, "documents")


def test_chain_reproduces_corpus_prep_gate(spark, sf_dir, docs):
    """Facade chain == pipeline_corpus_prep (dedup_exact -> quality
    gate -> mix -> pack), row for row."""
    from wagtail_vector_index_spark.queries import QUERY_FNS
    from wagtail_vector_index_spark.queries_text import _MIX_WEIGHTS

    via_facade = (
        Corpus(docs.select("doc_id", "source", "text"))
        .dedup_exact()
        .quality_filter(metric="distinct_token_ratio", percentile=0.25)
        .mix(_MIX_WEIGHTS)
        .pack(budget=1024, num_shards=8)
    )
    via_catalog = QUERY_FNS["pipeline_corpus_prep"](spark, sf_dir)
    a = {tuple(r) for r in via_facade.collect()}
    b = {tuple(r) for r in via_catalog.collect()}
    assert a == b and len(a) > 0


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "s", "same text"), (2, "s", "same  TEXT"), (3, "s", "other")],
        "doc_id long, source string, text string",
    )
    out = Corpus(df).dedup_exact().df.collect()
    assert {r["doc_id"] for r in out} == {1, 3}  # normalized dup collapsed


def test_dedup_fuzzy_minhash_drops_near_dups(docs):
    base = Corpus(docs.limit(300))
    n_before = base.df.count()
    out = base.dedup_fuzzy(method="minhash", threshold=0.5)
    n_after = out.df.count()
    assert 0 < n_after <= n_before
    with pytest.raises(ValueError, match="minhash | jaccard | simhash"):
        base.dedup_fuzzy(method="hnsw")


def test_quality_filter_drops_bottom_quartile(docs):
    c = Corpus(docs.limit(400))
    out = c.quality_filter(percentile=0.25)
    n, kept = c.df.count(), out.df.count()
    assert 0.6 * n <= kept <= 0.8 * n  # ~75% survive a 25th-pct gate
    with pytest.raises(ValueError, match="unknown metric"):
        c.quality_filter(metric="vibes")


def test_decontaminate_with_eval_sources(docs):
    c = Corpus(docs.limit(500))
    out = c.decontaminate(eval_sources={"src0", "src1"}, threshold=0.5)
    srcs = {r["source"] for r in out.df.select("source").distinct().collect()}
    assert srcs.isdisjoint({"src0", "src1"})  # eval rows removed too


def test_decontaminate_with_external_eval_df(spark):
    train = spark.createDataFrame(
        [(1, "tr", "the quick brown fox jumps over the lazy dog"),
         (2, "tr", "completely unrelated content about spark joins")],
        "doc_id long, source string, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "ev", "the quick brown fox jumps over the lazy dog")],
        "doc_id long, source string, text string",
    )
    out = Corpus(train).decontaminate(eval_df=eval_df, threshold=0.5)
    assert {r["doc_id"] for r in out.df.collect()} == {2}
    with pytest.raises(ValueError, match="exactly one"):
        Corpus(train).decontaminate()


def test_decontaminate_collisions_exact_ngram(spark):
    """The GPT-3 13-gram collision rule: a long train doc embedding a
    verbatim eval span is dropped even though its whole-doc Jaccard is
    tiny; an unrelated doc and a doc sharing only a short overlap
    survive."""
    span = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
    filler = " ".join(f"w{i}" for i in range(200))
    train = spark.createDataFrame(
        [
            (1, "tr", f"{filler} {span} {filler}"),   # verbatim 13-gram span
            (2, "tr", "completely unrelated content about spark joins"),
            (3, "tr", f"{filler} alpha bravo charlie {filler}"),  # only 3 shared words
        ],
        "doc_id long, source string, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "ev", f"question: {span} answer: yes")],
        "doc_id long, source string, text string",
    )
    out = Corpus(train).decontaminate_collisions(eval_df=eval_df, n=13)
    assert {r["doc_id"] for r in out.df.collect()} == {2, 3}
    with pytest.raises(ValueError, match="exactly one"):
        Corpus(train).decontaminate_collisions()
    # eval_sources form removes the eval rows too
    both = train.unionByName(eval_df)
    out2 = Corpus(both).decontaminate_collisions(eval_sources={"ev"}, n=13)
    assert {r["doc_id"] for r in out2.df.collect()} == {2, 3}


def test_with_dup_aware_weights_inverse_cluster_size(spark):
    """A near-dup triple clusters together and every member gets weight
    1/3; the standalone doc keeps weight 1.0; row count preserved."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, "tr", base),
        (2, "tr", base + " today"),         # ~1
        (3, "tr", base + " today again"),   # ~2 (chain to 1)
        (4, "tr", "a completely different standalone document about joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: round(r["weight"], 6)
        for r in Corpus(df).with_dup_aware_weights(threshold=0.5).df.collect()
    }
    assert len(out) == 4
    assert out[4] == 1.0
    assert out[1] == out[2] == out[3] == round(1 / 3, 6)


def test_audit_split_leakage_finds_cross_split_twins(spark):
    """Plant near-dup twins; whichever pairs straddle the split must be
    reported with both labels, and the report agrees with recomputing
    membership from with_split."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(i, "tr", f"{base} variant") for i in range(40)]
    rows += [(100 + i, "tr", f"unique document {i} " + " ".join(f"t{i}w{j}" for j in range(30))) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    fr = {"train": 0.5, "val": 0.5}
    c = Corpus(df)
    leaks = c.audit_split_leakage(fr, threshold=0.9).collect()
    splits = {
        r["doc_id"]: r["split"]
        for r in c.with_split(fr).df.select("doc_id", "split").collect()
    }
    twins = sorted(i for i in splits if i < 100)
    want = {
        (a, b)
        for i, a in enumerate(twins)
        for b in twins[i + 1:]
        if splits[a] != splits[b]
    }
    got = {(r["id_a"], r["id_b"]) for r in leaks}
    assert got == want and len(got) > 0
    for r in leaks:
        assert r["split_a"] == splits[r["id_a"]]
        assert r["split_b"] == splits[r["id_b"]]
        assert r["jaccard"] >= 0.9


def test_mix_upsamples_when_rate_above_one(docs):
    c = Corpus(docs.limit(200))
    sources = [r["source"] for r in c.df.select("source").distinct().collect()]
    out = c.mix({s: 2.0 for s in sources})
    assert out.df.count() == 2 * c.df.count()  # exact 2 epochs per row


def test_export_jsonl_returns_manifest(docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = Corpus(docs.limit(50)).export_jsonl(path, num_shards=4)
    rows = manifest.collect()
    assert sum(r["records"] for r in rows) == 50


def test_report_matches_catalog_gate(spark, sf_dir, docs):
    """Corpus.report() is the corpus_report gate's implementation — the
    catalog query routes through it; pin the API default too."""
    out = Corpus(docs).report(lang_col="lang")
    rows = {r["source"]: r for r in out.collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert r["n_docs"] > 0 and 0 <= r["exact_dup_frac"] <= 1
        assert 0 < r["pooled_distinct_ratio"] <= 1


def test_with_split_is_deterministic_and_exhaustive(docs):
    c = Corpus(docs.limit(400))
    out = c.with_split({"train": 0.9, "val": 0.05, "test": 0.05})
    rows = out.df.select("doc_id", "split").collect()
    assert len(rows) == 400  # fractions sum to 1 -> nothing dropped
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) <= {"train", "val", "test"}
    assert len(by_split["train"]) > len(by_split.get("val", set()))
    # repartitioning must not change membership
    again = {
        (r["doc_id"], r["split"])
        for r in Corpus(docs.limit(400).repartition(13))
        .with_split({"train": 0.9, "val": 0.05, "test": 0.05})
        .df.select("doc_id", "split")
        .collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in rows}
    with pytest.raises(ValueError, match="sum"):
        c.with_split({"a": 0.9, "b": 0.2})


def test_cap_per_source_keeps_top_n(spark):
    rows = [
        (i, f"src{i % 2}", "x " * (i + 1)) for i in range(10)
    ]  # 5 docs per source, lengths strictly increasing with id
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = Corpus(df).cap_per_source(2).df
    kept = sorted(r["doc_id"] for r in out.collect())
    # longest two per source survive: ids 8,9 (longest) then 6,7
    assert kept == [6, 7, 8, 9]
    assert out.groupBy("source").count().agg(F.max("count")).first()[0] == 2


def test_with_quality_score_bounds_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "s", "alpha beta gamma"), (2, "s", "alpha beta gamma")],
        "doc_id long, source string, text string",
    )
    out = Corpus(df).with_quality_score().df.collect()
    scores = {r["doc_id"]: r["quality_score"] for r in out}
    assert 0.0 < scores[1] < 1.0
    assert scores[1] == scores[2]  # same text -> identical score


def test_corpus_dedup_semantic_drops_near_duplicates(spark):
    rows = [
        (1, "s", "a", [1.0, 0.0]),
        (2, "s", "b", [0.999, 0.001]),  # near-dup of 1, dropped
        (3, "s", "c", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, emb array<double>"
    )
    out = Corpus(df).dedup_semantic(
        vec_col="emb", centroids=[(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        threshold=0.99,
    )
    assert sorted(r["doc_id"] for r in out.df.collect()) == [1, 3]
    assert out.df.columns == ["doc_id", "source", "text", "emb"]


def test_corpus_select_to_target_prefers_target_like_docs(spark):
    """DSIR selection keeps the raw docs whose token distribution looks
    like the target: 'alpha'-themed raw docs survive when the target is
    alpha-themed; 'zulu'-themed ones are dropped."""
    raw_rows = []
    for i in range(10):
        raw_rows.append((i, "s", f"alpha beta gamma delta token{i}"))
    for i in range(10, 20):
        raw_rows.append((i, "s", f"zulu yankee xray whiskey token{i}"))
    raw = spark.createDataFrame(
        raw_rows, "doc_id long, source string, text string"
    )
    target = spark.createDataFrame(
        [(100, "t", "alpha beta gamma delta epsilon"),
         (101, "t", "alpha gamma delta beta")],
        "doc_id long, source string, text string",
    )
    kept = Corpus(raw).select_to_target(target, keep_fraction=0.5)
    ids = sorted(r["doc_id"] for r in kept.df.collect())
    assert ids == list(range(10))  # exactly the alpha-themed half


def test_corpus_with_bpe_tokens_self_trained(spark):
    df = spark.createDataFrame(
        [(1, "s", "low low lower"), (2, "s", "lowest low")],
        "doc_id long, source string, text string",
    )
    out = Corpus(df).with_bpe_tokens(num_merges=2).df.collect()
    toks = {r["doc_id"]: r["bpe_tokens"] for r in out}
    # merges learned: (l,o) then (lo,w) -> 'low' is one token
    assert toks[1] == ["low", "low", "low", "e", "r"]
    assert toks[2] == ["low", "e", "s", "t", "low"]


def test_corpus_dedup_against_standing_corpus(spark):
    standing = spark.createDataFrame(
        [(1, "s", "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, source string, text string",
    )
    batch = spark.createDataFrame(
        [(10, "s", "the quick brown fox jumps over the lazy dog today"),
         (11, "s", "entirely fresh content with no shingle overlap at all")],
        "doc_id long, source string, text string",
    )
    kept = Corpus(batch).dedup_against(standing, threshold=0.5)
    assert [r["doc_id"] for r in kept.df.collect()] == [11]


def test_corpus_perplexity_and_coverage_columns(spark):
    """r6 facade additions: with_perplexity_score / with_substring_coverage
    attach left-joined score columns without dropping rows; unscorable
    docs carry NULL."""
    rows = [
        (1, "s", "one two three four five six seven eight nine ten"),
        (2, "s", "one two three four five six seven eight nine ten"),
        (3, "s", "totally different words entirely here now ok fine yes sure"),
        (4, "s", "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in Corpus(df)
        .with_perplexity_score()
        .with_substring_coverage(k=8)
        .df.collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # docs 1/2 are exact dups: fully covered, and scored by the LM
    assert out[1]["dup_coverage"] == 1.0
    assert out[2]["dup_coverage"] == 1.0
    assert out[3]["dup_coverage"] == 0.0
    assert out[1]["lm_logprob"] is not None
    # the repeated doc is more probable under the corpus LM than the unique one
    assert out[1]["lm_logprob"] > out[3]["lm_logprob"]
    # sub-bigram / sub-k doc: NULL scores, row retained
    assert out[4]["lm_logprob"] is None
    assert out[4]["dup_coverage"] is None


def test_split_without_leakage_drops_fuzzy_val_copies(spark):
    """r6: a val doc near-duplicating a train doc is dropped; clean val
    docs and all train docs survive; split labels stay attached."""
    base = "the quick brown fox jumps over the lazy dog by the river bank"
    rows = []
    for i in range(40):
        rows.append((i, "s", f"unique document number {i} about topic "
                     + " ".join(f"w{i}x{j}" for j in range(8))))
    # two exact copies of the same text under different ids: whichever
    # lands in train poisons the other's split
    rows.append((100, "s", base))
    rows.append((101, "s", base))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = (
        Corpus(df)
        .split_without_leakage({"train": 0.6, "val": 0.4}, threshold=0.5)
        .df.collect()
    )
    by_id = {r["doc_id"]: r["split"] for r in out}
    splits_100 = {by_id.get(100), by_id.get(101)} - {None}
    # the pair can't span train and an eval split in the result
    assert splits_100 == {"train"} or "val" not in splits_100 or len(
        [i for i in (100, 101) if i in by_id]
    ) <= 1 + (1 if splits_100 == {"train"} else 0)
    # more precisely: if one is train and the other was assigned val,
    # the val one must be gone
    from wagtail_vector_index_spark.operators.skew import split_col
    assigned = {
        r["doc_id"]: r["split"]
        for r in df.select(
            "doc_id", split_col(F.col("doc_id"), {"train": 0.6, "val": 0.4}).alias("split")
        ).collect()
    }
    for a, b in ((100, 101), (101, 100)):
        if assigned[a] == "train" and assigned[b] == "val":
            assert b not in by_id
    # clean docs all survive with their assigned label
    for i in range(40):
        if assigned[i] is not None:
            assert by_id[i] == assigned[i]


def test_with_dup_aware_weights_tolerates_component_column(spark):
    """A corpus frame that already carries a `component` column must not
    collide with the internal components join (reserved __-prefixed
    names keep user columns out of the operator's namespace)."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "x"),
            (2, "the quick brown fox jumps over the lazy dog", "x"),
            (3, "completely different text about spark shuffles", "y"),
        ],
        "doc_id long, text string, component string",
    )
    out = {
        r["doc_id"]: (round(r["weight"], 6), r["component"])
        for r in Corpus(df).with_dup_aware_weights(threshold=0.5).df.collect()
    }
    assert out[1] == (0.5, "x") and out[2] == (0.5, "x")
    assert out[3] == (1.0, "y")


def test_dedup_fuzzy_pair_method_rejected_for_non_jaccard(spark):
    """pair_method with a non-jaccard family must raise a clear
    ValueError instead of leaking into **kwargs as an opaque
    TypeError."""
    import pytest as _pytest

    from wagtail_vector_index_spark.operators.corpus import Corpus

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="pair_method"):
        Corpus(df).dedup_fuzzy(method="minhash", pair_method="prefix")
    # jaccard still accepts an explicit route
    out = (
        Corpus(df)
        .dedup_fuzzy(method="jaccard", pair_method="prefix", threshold=0.5)
        .df.collect()
    )
    assert {r["doc_id"] for r in out} == {1}
