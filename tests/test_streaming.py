"""Structured Streaming extension tests: windowed aggregation over a
file-source stream of the events table, and incremental index maintenance
via foreachBatch (SURVEY §2.4 streaming EXT)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.catalog import _t
from wagtail_vector_index_spark.config import IndexConfig
from wagtail_vector_index_spark.embedding.hash_backend import HashEmbeddingBackend
from wagtail_vector_index_spark.index import VectorIndex
from wagtail_vector_index_spark.sources.tables import DocumentStore
from wagtail_vector_index_spark.streaming.maintenance import (
    incremental_index_stream,
    windowed_event_counts,
)


@pytest.fixture()
def events_stream(spark, sf_dir, tmp_path):
    # stage the (nanos-fixed) events as a one-file parquet dir to stream from
    staged = str(tmp_path / "events_staged")
    _t(spark, sf_dir, "events").coalesce(1).write.parquet(staged)
    batch = spark.read.parquet(staged)
    return spark.readStream.schema(batch.schema).parquet(staged), batch


def test_windowed_event_counts_matches_batch(spark, events_stream, tmp_path):
    stream_df, batch_df = events_stream
    agg = windowed_event_counts(stream_df, window_duration="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_counts").collect()
    expected = (
        batch_df.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .count()
    )
    assert len(got) == expected
    assert all(r["n_events"] > 0 for r in got)


def test_incremental_index_stream(spark, documents_df, tmp_path):
    sources = documents_df.limit(30).select(
        F.concat_ws(":", "source", "doc_id").alias("object_key"),
        F.array(F.concat_ws(":", "source", "doc_id")).alias("object_keys"),
        "text",
    )
    src_dir = str(tmp_path / "stream_src")
    sources.coalesce(1).write.parquet(src_dir)

    cfg = IndexConfig(index_name="stream_index")
    store = DocumentStore(spark, str(tmp_path / "docstore"))
    idx = VectorIndex(
        spark, cfg, store, embedding_backend=HashEmbeddingBackend(dimensions=8)
    )

    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).parquet(src_dir)
    q = incremental_index_stream(
        stream, idx, checkpoint_dir=str(tmp_path / "ckpt2"), trigger_once=True
    )
    q.awaitTermination(180)
    assert idx.documents().count() == 30

    # second run over the same data: no stale objects -> store unchanged
    q2 = incremental_index_stream(
        spark.readStream.schema(spark.read.parquet(src_dir).schema).parquet(src_dir),
        idx,
        checkpoint_dir=str(tmp_path / "ckpt3"),
        trigger_once=True,
    )
    q2.awaitTermination(180)
    assert idx.documents().count() == 30


def test_stream_stream_interval_join_matches_batch(
    spark, events_stream, tmp_path
):
    """The watermarked stream-stream join must emit exactly the batch
    inequality-join match set once both streams drain."""
    from wagtail_vector_index_spark.streaming.maintenance import (
        stream_stream_interval_join,
    )

    stream, batch = events_stream

    def _sides(df, renamed):
        clicks = df.where(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        views = df.where(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("user_id" if not renamed else "u2"),
            F.col("ts").alias("view_ts"),
        )
        if renamed:
            views = views.withColumnRenamed("u2", "user_id")
        return clicks, views

    c_s, v_s = _sides(stream, renamed=True)
    joined = stream_stream_interval_join(
        c_s, v_s, by="user_id", left_ts="ts", right_ts="view_ts",
        interval_seconds=1800,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["event_id"], r["view_id"])
        for r in spark.table("ssj_test").collect()
    }

    c_b, v_b = _sides(batch, renamed=True)
    want = {
        (r["event_id"], r["view_id"])
        for r in c_b.join(
            v_b,
            (c_b["user_id"] == v_b["user_id"])
            & (F.col("view_ts") <= F.col("ts"))
            & (F.col("ts") <= F.col("view_ts") + F.expr("INTERVAL 1800 SECONDS")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_incremental_ann_stream(spark, embeddings_df, tmp_path):
    """Streaming ANN maintenance: vectors arriving on a file stream land
    in the materialized IVF index's posting lists; after the stream
    drains, a probe finds the streamed duplicate at rank 1."""
    from wagtail_vector_index_spark.operators.ann_index import IvfIndex
    from wagtail_vector_index_spark.streaming.maintenance import (
        incremental_ann_stream,
    )

    base = embeddings_df.where(F.col("vec_id").between(1, 400)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vector")
    )
    centroids = embeddings_df.where(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    idx = IvfIndex.build(
        base, path=str(tmp_path / "ivf_stream"), centroids_df=centroids
    )
    probe = list(
        embeddings_df.where(F.col("vec_id") == 0).first()["embedding"]
    )

    staged = str(tmp_path / "new_vectors")
    spark.createDataFrame(
        [(880001, [float(x) for x in probe])],
        "vec_id long, vector array<double>",
    ).coalesce(1).write.parquet(staged)
    stream = spark.readStream.schema(
        "vec_id long, vector array<double>"
    ).parquet(staged)

    q = incremental_ann_stream(
        stream,
        idx,
        checkpoint_dir=str(tmp_path / "ckpt_ann"),
        compact_every=1,
    )
    q.awaitTermination(300)

    top = idx.topk(probe, nprobe=2, limit=3).collect()
    assert top[0]["vec_id"] == 880001


def test_incremental_ann_stream_lsh(spark, embeddings_df, tmp_path):
    """The same streaming maintenance loop drives the LSH tier (the
    append/compact surface is uniform across tiers): a streamed
    duplicate of the probe lands in the probe's own bucket and ranks
    first after the stream drains and compacts."""
    from wagtail_vector_index_spark.operators.ann_index import LshIndex
    from wagtail_vector_index_spark.streaming.maintenance import (
        incremental_ann_stream,
    )

    base = embeddings_df.where(F.col("vec_id").between(1, 400)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vector")
    )
    idx = LshIndex.build(
        base, path=str(tmp_path / "lsh_stream"), num_planes=12, dim=64
    )
    probe = list(
        embeddings_df.where(F.col("vec_id") == 0).first()["embedding"]
    )

    staged = str(tmp_path / "new_vectors_lsh")
    spark.createDataFrame(
        [(880002, [float(x) for x in probe])],
        "vec_id long, vector array<double>",
    ).coalesce(1).write.parquet(staged)
    stream = spark.readStream.schema(
        "vec_id long, vector array<double>"
    ).parquet(staged)

    q = incremental_ann_stream(
        stream,
        idx,
        checkpoint_dir=str(tmp_path / "ckpt_ann_lsh"),
        compact_every=1,
    )
    q.awaitTermination(300)

    top = idx.topk(probe, max_probe_hamming=1, limit=3).collect()
    assert top[0]["vec_id"] == 880002
    assert len(idx.vectors_log.current().live) == 1  # compacted


def test_decontaminated_corpus_stream_drops_collisions(spark, tmp_path):
    """Streaming ingest decontamination: rows sharing a 13-gram with
    the static eval set never enter the corpus; clean rows across
    batches all land; a replay over the same checkpoint appends
    nothing (exactly-once)."""
    from wagtail_vector_index_spark.sources.manifest import read_live_table
    from wagtail_vector_index_spark.streaming.maintenance import (
        decontaminated_corpus_stream,
    )

    span = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
    filler = " ".join(f"w{i}" for i in range(60))
    schema = "doc_id long, text string"
    batches = [
        [(1, f"{filler} {span} {filler}"),          # verbatim eval span
         (2, "clean document about spark adaptive execution planning")],
        [(3, f"{filler} alpha bravo charlie {filler}"),  # only 3 shared words
         (4, f"question {span} answer")],            # collides too
    ]
    src = str(tmp_path / "decon_stream")
    table = str(tmp_path / "decon_corpus")
    ckpt = str(tmp_path / "ckpt_decon")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    eval_df = spark.createDataFrame(
        [(100, f"held out {span} item")], schema
    )

    def run(ckpt_dir):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = decontaminated_corpus_stream(
            stream, eval_df=eval_df, path=table, checkpoint_dir=ckpt_dir,
        )
        q.awaitTermination(300)

    run(ckpt)
    got = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert got == {2, 3}
    # same checkpoint again: no new generations, same table
    run(ckpt)
    assert {r["doc_id"] for r in read_live_table(spark, table).collect()} == {2, 3}


def test_neardup_corpus_stream_matches_sequential_batches(spark, tmp_path):
    """Streaming fuzzy-dedup corpus maintenance: after three file-stream
    batches (with exact dups, near dups within and across batches), the
    manifest-committed table equals the SEQUENTIAL batch-mode
    application of within-batch exact pruning + asymmetric corpus
    filtering — stream == batch, and a second run over the same source
    with the same checkpoint appends nothing (exactly-once)."""
    from wagtail_vector_index_spark.operators.dedup import (
        incremental_neardup_filter,
        keep_representatives_exact,
        minhash_lsh_pairs,
    )
    from wagtail_vector_index_spark.sources.manifest import read_live_table
    from wagtail_vector_index_spark.streaming.maintenance import (
        neardup_corpus_stream,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    batches = [
        [(1, base), (2, base), (3, "completely different content one here")],
        # 10 near-dups batch 1's survivor; 11 fresh
        [(10, base.replace("river", "canal")),
         (11, "another fresh document about spark adaptive execution")],
        # 20 dups within its own batch vs 21; 22 near-dups doc 3
        [(20, "unique text for the third batch arriving now"),
         (21, "unique text for the third batch arriving now"),
         (22, "completely different content one there")],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "doc_stream")
    table = str(tmp_path / "dedup_corpus")
    ckpt = str(tmp_path / "ckpt_neardup")

    def run_stream():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = neardup_corpus_stream(
            stream, path=table, checkpoint_dir=ckpt, threshold=0.4,
        )
        q.awaitTermination(300)

    # batch-mode reference applied sequentially
    want_rows: list = []
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        b = spark.createDataFrame(rows, schema)
        pairs = minhash_lsh_pairs(b, threshold=0.4)
        surv = keep_representatives_exact(b, pairs)
        if want_rows:
            corpus = spark.createDataFrame(want_rows, schema)
            surv = incremental_neardup_filter(
                surv, corpus, threshold=0.4
            )
        want_rows += [(r["doc_id"], r["text"]) for r in surv.collect()]

    run_stream()
    got = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert got == {d for d, _ in want_rows}
    assert 1 in got and 2 not in got and 10 not in got and 11 in got
    assert (20 in got) != (21 in got) and 22 not in got

    # replay with a FRESH checkpoint over the same files: every batch
    # carries an already-applied token... no — a fresh checkpoint means
    # new tokens; instead restart with the SAME checkpoint: all offsets
    # are committed, so the stream appends nothing
    before = read_live_table(spark, table).count()
    run_stream()
    assert read_live_table(spark, table).count() == before


def test_decontaminated_corpus_stream_overbound_eval_set(spark, tmp_path):
    """Eval-refresh at crawl scale (r11): with ``max_broadcast_grams``
    forced tiny, the construction-time gram table AND a mid-stream
    ``refresh_eval_set`` swap both exceed the bound and take the
    shuffle-join fallback instead of an un-overridable broadcast —
    decontamination results identical to the broadcast path."""
    from wagtail_vector_index_spark.sources.manifest import read_live_table
    from wagtail_vector_index_spark.streaming.maintenance import (
        decontaminated_corpus_stream,
    )

    old_span = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
    new_span = "nov osc papa queb rome sierra tango unif vic whisk xray yank zulu"
    filler = " ".join(f"w{i}" for i in range(40))
    schema = "doc_id long, text string"
    src = str(tmp_path / "ob_stream")
    table = str(tmp_path / "ob_corpus")
    ckpt = str(tmp_path / "ob_ckpt")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_batch([(1, f"{filler} {old_span}"), (2, f"{filler} {new_span}")])
    old_eval = spark.createDataFrame([(100, f"x {old_span} y")], schema)
    new_eval = spark.createDataFrame([(200, f"x {new_span} y")], schema)
    stream = spark.readStream.schema(schema).parquet(src)
    q = decontaminated_corpus_stream(
        stream, eval_df=old_eval, path=table, checkpoint_dir=ckpt,
        max_broadcast_grams=2,  # both suites exceed this: shuffle join
        trigger_once=False,
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if {r["doc_id"] for r in
                        read_live_table(spark, table).collect()} == {2}:
                    break
            except FileNotFoundError:
                pass
            time.sleep(0.5)
        assert {
            r["doc_id"] for r in read_live_table(spark, table).collect()
        } == {2}
        # crawl-scale refresh mid-stream: the NEW gram table is also
        # over-bound; 3 collides with it (dropped), 4 passes (old suite
        # replaced)
        q.refresh_eval_set(new_eval)
        write_batch([(3, f"{filler} {new_span}"), (4, f"{filler} {old_span}")])
        deadline = time.time() + 120
        while time.time() < deadline:
            got = {r["doc_id"] for r in read_live_table(spark, table).collect()}
            if 4 in got:
                break
            time.sleep(0.5)
        assert got == {2, 4}, got
    finally:
        q.stop()


def test_neardup_corpus_stream_signature_sidecars(spark, tmp_path):
    """Standing-signature state (r11): every committed generation
    carries a ``_sigs-n3-h16`` parquet sidecar with the survivors'
    MinHash signatures; the sidecar is invisible to data readers; and
    a generation whose sidecar is missing (pre-r11 data) is backfilled
    in place on the next batch instead of re-shingling forever —
    results identical either way."""
    import os
    import shutil

    from wagtail_vector_index_spark.sources.manifest import (
        ManifestLog,
        read_live_table,
    )
    from wagtail_vector_index_spark.streaming.maintenance import (
        _sigs_dirname,
        neardup_corpus_stream,
    )

    schema = "doc_id long, text string"
    src = str(tmp_path / "sig_stream")
    table = str(tmp_path / "sig_corpus")
    base = "the quick brown fox jumps over the lazy dog near the river"

    def run(ckpt):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = neardup_corpus_stream(
            stream, path=table, checkpoint_dir=ckpt, threshold=0.4,
        )
        q.awaitTermination(300)

    spark.createDataFrame(
        [(1, base), (2, "totally unrelated subject matter entirely")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run(str(tmp_path / "ck1"))

    log = ManifestLog(table)
    gens = log.live_paths()
    assert gens, "first batch committed a generation"
    sd = _sigs_dirname(3, 16)
    for gp in gens:
        sig_files = os.listdir(os.path.join(gp, sd))
        assert any(f.endswith(".parquet") for f in sig_files)
    sigs = spark.read.parquet(os.path.join(gens[0], sd))
    assert set(sigs.columns) == {"doc_id", "shingles", "sig"}
    assert sigs.count() == 2
    # invisible to data readers: the live table has only the data schema
    live = read_live_table(spark, table)
    assert set(live.columns) == {"doc_id", "text"}
    assert live.count() == 2

    # kill the sidecar (simulates a pre-r11 generation), stream a second
    # batch: the dedup still works (near-dup of doc 1 dropped, fresh doc
    # kept) and the backfill restores the sidecar in place
    shutil.rmtree(os.path.join(gens[0], sd))
    spark.createDataFrame(
        [(10, base.replace("river", "canal")),
         (11, "spark adaptive query execution reorders joins")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run(str(tmp_path / "ck1"))
    got = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert got == {1, 2, 11}
    for gp in ManifestLog(table).live_paths():
        assert any(
            f.endswith(".parquet")
            for f in os.listdir(os.path.join(gp, sd))
        ), f"sidecar missing under {gp}"


def test_neardup_corpus_stream_compaction(spark, tmp_path):
    """Generation compaction (r12): with ``compact_every=3`` a 9-batch
    stream ends with ONE live generation (the merges fire at batches
    3/6/9), the merged generation carries a consolidated signature
    sidecar, the surviving corpus is IDENTICAL to the uncompacted run,
    and exactly-once survives compaction — a restart with the same
    checkpoint over one extra file processes only that file even though
    every generation that carried the earlier batches was rewritten
    away (token memory lives in the manifest)."""
    from wagtail_vector_index_spark.sources.manifest import (
        ManifestLog,
        read_live_table,
    )
    from wagtail_vector_index_spark.streaming.maintenance import (
        _sigs_dirname,
        neardup_corpus_stream,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    schema = "doc_id long, text string"
    src = str(tmp_path / "cmp_stream")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_batch([(1, base), (2, "totally unrelated subject matter here")])
    for i in range(1, 9):
        write_batch([
            (10 * i, base.replace("river", f"canal{i}")),  # near-dups doc 1
            (10 * i + 1, f"unique standalone document number {i} "
                         f"about topic {i * 7} and subject {i * 13}"),
        ])

    def run(table, ckpt, compact_every):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = neardup_corpus_stream(
            stream, path=table, checkpoint_dir=ckpt, threshold=0.4,
            compact_every=compact_every,
        )
        q.awaitTermination(600)

    compacted = str(tmp_path / "cmp_corpus")
    plain = str(tmp_path / "plain_corpus")
    run(compacted, str(tmp_path / "cmp_ck"), 3)
    run(plain, str(tmp_path / "plain_ck"), 0)

    want = {r["doc_id"] for r in read_live_table(spark, plain).collect()}
    got = {r["doc_id"] for r in read_live_table(spark, compacted).collect()}
    assert got == want == {1, 2} | {10 * i + 1 for i in range(1, 9)}

    log = ManifestLog(compacted)
    live = log.live_paths()
    assert len(live) == 1, f"expected 1 live generation, got {len(live)}"
    assert len(ManifestLog(plain).live_paths()) == 9
    # consolidated sidecar rides the merged generation
    sd = os.path.join(live[0], _sigs_dirname(3, 16))
    assert any(f.endswith(".parquet") for f in os.listdir(sd))
    sigs = spark.read.parquet(sd)
    assert set(sigs.columns) == {"doc_id", "shingles", "sig"}
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == got
    # superseded generations + token gens were GC'd from disk
    on_disk = [n for n in os.listdir(compacted) if n.startswith("gen-")]
    assert on_disk == [os.path.basename(live[0])], on_disk

    # exactly-once across compaction: same checkpoint, one new file —
    # only the new batch lands (replays of compacted-away batches stay
    # no-ops because their tokens are in the manifest, not the gens)
    write_batch([(90, base.replace("river", "harbor")),
                 (91, "a ninth wholly distinct body of text entirely")])
    run(compacted, str(tmp_path / "cmp_ck"), 3)
    got2 = {r["doc_id"] for r in read_live_table(spark, compacted).collect()}
    assert got2 == got | {91}


def test_neardup_corpus_stream_tiered_compaction(spark, tmp_path):
    """Size-tiered compaction (compact_fanout>=2): checking after every
    batch (compact_every=1) with fanout 3, the live generation count
    stays strictly below 2*fanout across a 12-batch stream, merges only
    ever touch the smallest tier (big merged generations survive), the
    surviving corpus equals the uncompacted run's, and near-dups of
    docs whose generation has been MERGED AWAY are still dropped (the
    consolidated sidecar serves the standing dedup)."""
    from wagtail_vector_index_spark.sources.manifest import (
        ManifestLog,
        read_live_table,
    )
    from wagtail_vector_index_spark.streaming.maintenance import (
        _sigs_dirname,
        neardup_corpus_stream,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    schema = "doc_id long, text string"
    src = str(tmp_path / "tier_stream")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_batch([(1, base), (2, "totally unrelated subject matter here")])
    for i in range(1, 12):
        write_batch([
            (10 * i, base.replace("river", f"canal{i}")),  # near-dups doc 1
            (10 * i + 1, f"unique standalone document number {i} "
                         f"about theme {i * 7} and matter {i * 13}"),
        ])

    def run(table, ckpt, fanout):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = neardup_corpus_stream(
            stream, path=table, checkpoint_dir=ckpt, threshold=0.4,
            compact_every=1, compact_fanout=fanout,
        )
        q.awaitTermination(600)

    tiered = str(tmp_path / "tier_corpus")
    plain = str(tmp_path / "tier_plain")
    run(tiered, str(tmp_path / "tier_ck"), 3)
    run(plain, str(tmp_path / "tier_plain_ck"), 0)
    # fanout=0 with compact_every=1 full-merges every batch: 1 live gen
    assert len(ManifestLog(plain).live_paths()) == 1

    want = {r["doc_id"] for r in read_live_table(spark, plain).collect()}
    got = {r["doc_id"] for r in read_live_table(spark, tiered).collect()}
    assert got == want == {1, 2} | {10 * i + 1 for i in range(1, 12)}
    # doc 110 near-dupped doc 1, whose generation was merged away long
    # before batch 11 — the standing side must have served it from a
    # consolidated sidecar
    assert 110 not in got

    log = ManifestLog(tiered)
    live = log.live_paths()
    assert 1 < len(live) < 6, live  # bounded < 2*fanout, tiered (not 1)
    sd = _sigs_dirname(3, 16)
    for gp in live:
        assert any(
            f.endswith(".parquet")
            for f in os.listdir(os.path.join(gp, sd))
        ), f"sidecar missing under {gp}"
    # sidecar doc coverage over live gens == the live corpus exactly
    import functools

    sig_ids = set()
    for gp in live:
        sig_ids |= {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(gp, sd)).collect()
        }
    assert sig_ids == got
    # GC reclaimed everything merged away
    on_disk = {n for n in os.listdir(tiered) if n.startswith("gen-")}
    assert on_disk == {os.path.basename(p) for p in live}

    # exactly-once across tiered merges: same checkpoint, one new file
    write_batch([(120, base.replace("river", "harbor")),
                 (121, "a thoroughly novel composition of words")])
    run(tiered, str(tmp_path / "tier_ck"), 3)
    got2 = {r["doc_id"] for r in read_live_table(spark, tiered).collect()}
    assert got2 == got | {121}


def test_decontaminated_corpus_stream_compaction(spark, tmp_path):
    """The decontamination stream shares the one-generation-per-batch
    growth of the neardup twin (minus sidecars); with ``compact_every=3``
    a 6-batch stream ends with one live generation holding exactly the
    surviving rows, and a same-checkpoint restart over one extra file
    processes only that file (token memory survives the rewrite)."""
    from wagtail_vector_index_spark.sources.manifest import (
        ManifestLog,
        read_live_table,
    )
    from wagtail_vector_index_spark.streaming.maintenance import (
        decontaminated_corpus_stream,
    )

    bad_span = "alpha bravo charlie delta echo foxtrot golf hotel india " \
               "juliett kilo lima mike"
    filler = " ".join(f"w{i}" for i in range(30))
    schema = "doc_id long, text string"
    src = str(tmp_path / "dcc_stream")
    table = str(tmp_path / "dcc_corpus")
    ckpt = str(tmp_path / "dcc_ckpt")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    for i in range(6):
        write_batch([
            (10 * i, f"{filler} {bad_span}"),           # contaminated
            (10 * i + 1, f"{filler} clean doc {i} topic {i * 3}"),
        ])
    eval_df = spark.createDataFrame([(999, f"x {bad_span} y")], schema)

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = decontaminated_corpus_stream(
            stream, eval_df=eval_df, path=table, checkpoint_dir=ckpt,
            compact_every=3,
        )
        q.awaitTermination(600)

    run()
    got = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert got == {10 * i + 1 for i in range(6)}
    live = ManifestLog(table).live_paths()
    assert len(live) == 1, live
    on_disk = [n for n in os.listdir(table) if n.startswith("gen-")]
    assert on_disk == [os.path.basename(live[0])], on_disk

    write_batch([(90, f"{filler} {bad_span}"), (91, f"{filler} late clean")])
    run()
    got2 = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert got2 == got | {91}

    # tiered policy parity on the same source: fanout=2 with
    # per-batch checking keeps the live set bounded in (1, 4) and the
    # surviving rows identical
    table2 = str(tmp_path / "dcc_tiered")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = decontaminated_corpus_stream(
        stream, eval_df=eval_df, path=table2,
        checkpoint_dir=str(tmp_path / "dcc_tier_ck"),
        compact_every=1, compact_fanout=2,
    )
    q.awaitTermination(600)
    got3 = {r["doc_id"] for r in read_live_table(spark, table2).collect()}
    assert got3 == got2
    n_live = len(ManifestLog(table2).live_paths())
    assert 1 < n_live < 4, n_live


def test_decontaminated_corpus_stream_eval_set_refresh(spark, tmp_path):
    """Mid-stream eval-set replacement: refresh_eval_set() swaps the
    gram table, so a doc colliding only with the NEW eval suite passes
    batches before the refresh and is dropped after it."""
    from wagtail_vector_index_spark.sources.manifest import read_live_table
    from wagtail_vector_index_spark.streaming.maintenance import (
        decontaminated_corpus_stream,
    )

    old_span = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
    new_span = "nov osc papa queb rome sierra tango unif vic whisk xray yank zulu"
    filler = " ".join(f"w{i}" for i in range(40))
    schema = "doc_id long, text string"
    src = str(tmp_path / "refresh_stream")
    table = str(tmp_path / "refresh_corpus")
    ckpt = str(tmp_path / "ckpt_refresh")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # phase 1: doc 1 collides with the OLD eval set, doc 2 carries the
    # FUTURE eval span (clean under the old set)
    write_batch([(1, f"{filler} {old_span}"), (2, f"{filler} {new_span}")])
    old_eval = spark.createDataFrame([(100, f"x {old_span} y")], schema)
    stream = spark.readStream.schema(schema).parquet(src)
    q = decontaminated_corpus_stream(
        stream, eval_df=old_eval, path=table, checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)
    assert {r["doc_id"] for r in read_live_table(spark, table).collect()} == {2}

    # phase 2: a LONG-RUNNING stream (continuous trigger), refreshed to
    # the NEW eval suite BEFORE the next docs arrive — 3 collides with
    # the new span (dropped), 4 with the old one (passes: the old suite
    # was REPLACED, not extended)
    new_eval = spark.createDataFrame([(200, f"x {new_span} y")], schema)
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = decontaminated_corpus_stream(
        stream2, eval_df=old_eval, path=table, checkpoint_dir=ckpt,
        trigger_once=False,
    )
    try:
        q2.processAllAvailable()  # drain any checkpoint replay first
        q2.refresh_eval_set(new_eval)
        write_batch([(3, f"{filler} {new_span}"), (4, f"{filler} {old_span}")])
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert got == {2, 4}


def test_out_of_band_compaction_entry(spark, tmp_path):
    """r13: ``compact_neardup_corpus`` / ``compact_decontaminated_corpus``
    run the SAME merge cycle as the in-band ``compact_every`` hook but
    from outside the stream — a deployment runs its triggers with
    compaction off and compacts from a maintenance process. One call
    on a 6-generation neardup table merges to ONE live generation with
    a consolidated sidecar and an identical surviving corpus;
    exactly-once survives (a restart over one extra file processes only
    that file); a second call with nothing to merge returns False; and
    ``fanout`` applies the same tier rule as the in-band path."""
    from wagtail_vector_index_spark.sources.manifest import (
        ManifestLog,
        read_live_table,
    )
    from wagtail_vector_index_spark.streaming.maintenance import (
        _sigs_dirname,
        compact_neardup_corpus,
        neardup_corpus_stream,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    schema = "doc_id long, text string"
    src = str(tmp_path / "oob_stream")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_batch([(1, base), (2, "totally unrelated subject matter here")])
    for i in range(1, 6):
        write_batch([
            (10 * i, base.replace("river", f"canal{i}")),
            (10 * i + 1, f"unique standalone document number {i} "
                         f"about topic {i * 7} and subject {i * 13}"),
        ])

    table = str(tmp_path / "oob_corpus")
    ckpt = str(tmp_path / "oob_ck")

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = neardup_corpus_stream(
            stream, path=table, checkpoint_dir=ckpt, threshold=0.4,
            compact_every=0,
        )
        q.awaitTermination(600)

    run()
    before = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert len(ManifestLog(table).live_paths()) == 6

    # out-of-band full merge (min_age_s=0: no concurrent writer here)
    assert compact_neardup_corpus(spark, table, min_age_s=0.0) is True
    live = ManifestLog(table).live_paths()
    assert len(live) == 1
    after = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert after == before
    sd = os.path.join(live[0], _sigs_dirname(3, 16))
    assert {r["doc_id"] for r in spark.read.parquet(sd).collect()} == after

    # nothing left to merge -> False, state untouched
    assert compact_neardup_corpus(spark, table, min_age_s=0.0) is False
    assert len(ManifestLog(table).live_paths()) == 1

    # exactly-once across the out-of-band merge: same checkpoint, one
    # new file -> only that batch lands
    write_batch([(90, base.replace("river", "harbor")),
                 (91, "a seventh wholly distinct body of text entirely")])
    run()
    got2 = {r["doc_id"] for r in read_live_table(spark, table).collect()}
    assert got2 == after | {91}
    # tiered rule: 2 live generations < 2*fanout -> no merge
    assert (
        compact_neardup_corpus(spark, table, fanout=3, min_age_s=0.0)
        is False
    )
    assert len(ManifestLog(table).live_paths()) == 2
