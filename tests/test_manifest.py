"""Manifest-log commit protocol tests (sources/manifest.py).

The claims under test are the ones that matter on an object store:
- a commit is one create-if-absent manifest publish; losers of the race
  retry against the winner's state, so concurrent writers compose
- interleaved upsert / compact / clear sequences never corrupt reads —
  every read resolves to a consistent committed state
- a crashed writer (staged generation, no commit) is invisible
- GC reclaims only unreferenced, out-of-retention generations
"""

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wagtail_vector_index_spark.sources.manifest import ManifestLog
from wagtail_vector_index_spark.sources.tables import DocumentStore

SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType()),
        T.StructField("object_keys", T.ArrayType(T.StringType())),
        T.StructField("chunk_no", T.IntegerType()),
        T.StructField("content", T.StringType()),
        T.StructField("vector", T.ArrayType(T.DoubleType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("index_name", T.StringType()),
    ]
)


def docs(spark, rows, index="idx"):
    return spark.createDataFrame(
        [(k, [k], 0, v, [1.0, 0.0], {}, index) for k, v in rows], SCHEMA
    )


# -- ManifestLog primitive ---------------------------------------------------


def test_commit_is_create_if_absent(tmp_path):
    log = ManifestLog(str(tmp_path))
    m1 = log.commit(lambda cur: (["gen-a"], {}))
    assert m1.version == 1
    m2 = log.commit(lambda cur: (list(cur.live) + ["gen-b"], {}))
    assert m2.version == 2 and m2.live == ("gen-a", "gen-b")
    assert log.current() == m2


def test_losing_committer_retries_against_winner(tmp_path):
    """Simulate the race: a second writer lands a commit between our read
    and publish; the update function must re-run against the new state."""
    log = ManifestLog(str(tmp_path))
    log.commit(lambda cur: (["gen-0"], {}))
    seen_states = []

    def update(cur):
        seen_states.append(cur.version)
        if len(seen_states) == 1:
            # interloper commits version 2 while we "compute"
            ManifestLog(log.root).commit(
                lambda c: (list(c.live) + ["gen-x"], {})
            )
        return list(cur.live) + ["gen-y"], {}

    m = log.commit(update)
    assert seen_states == [1, 2]  # retried with the winner's state
    assert m.version == 3
    assert set(m.live) == {"gen-0", "gen-x", "gen-y"}


def test_concurrent_appenders_all_survive(tmp_path):
    """N threads race to append; every generation must end up live."""
    log = ManifestLog(str(tmp_path))
    names = [f"gen-{i}" for i in range(16)]
    errors = []

    def append(name):
        try:
            ManifestLog(log.root).commit(
                lambda cur: ((list(cur.live) if cur else []) + [name], {})
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=append, args=(n,)) for n in names]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    m = log.current()
    assert set(m.live) == set(names)
    assert m.version == 16


def test_partial_manifest_never_visible(tmp_path):
    """The publish is link-after-fsync: every visible manifest parses.
    (A writer crashing before the link leaves only a .tmp file, which
    readers ignore.)"""
    log = ManifestLog(str(tmp_path))
    log.commit(lambda cur: (["gen-a"], {}))
    # crashed writer leaves a temp file behind
    open(os.path.join(log.mdir, ".tmp-deadbeef"), "w").write("{not json")
    m = log.current()
    assert m is not None and m.live == ("gen-a",)
    for n in os.listdir(log.mdir):
        if n.startswith("manifest-"):
            json.load(open(os.path.join(log.mdir, n)))


def test_gc_respects_references_and_age(tmp_path):
    log = ManifestLog(str(tmp_path))
    g_old = log.new_generation()
    os.makedirs(log.gen_path(g_old))
    g_live = log.new_generation()
    os.makedirs(log.gen_path(g_live))
    g_staged = log.new_generation()  # uncommitted writer in progress
    os.makedirs(log.gen_path(g_staged))
    log.commit(lambda cur: ([g_old], {}))
    log.commit(lambda cur: ([g_live], {}))  # g_old now unreferenced by head
    # keep_manifests=2 still references g_old via version 1, so only the
    # never-committed g_staged is collectable (and only past the age guard)
    deleted = log.gc(keep_manifests=2, min_age_s=0.0)
    assert deleted == [log.gen_path(g_staged)]
    deleted = log.gc(keep_manifests=1, min_age_s=0.0)
    assert log.gen_path(g_old) in deleted
    assert os.path.isdir(log.gen_path(g_live))
    # a fresh staged generation survives via the age guard: an in-flight
    # writer's data is never collected from under it
    g_inflight = log.new_generation()
    os.makedirs(log.gen_path(g_inflight))
    assert log.gc(keep_manifests=1, min_age_s=3600.0) == []
    assert os.path.isdir(log.gen_path(g_inflight))


def test_gc_collects_unreferenced_token_generations(tmp_path):
    """Token generations (gen-tok-<24hex>, content-addressed names with
    no timestamp) must be collectable once unreferenced — superseded by
    compaction or abandoned by a crashed stream — under the same
    in-flight age guard, via mtime (r6 advice fix: the main sweep's
    regex never matched them, so they leaked forever)."""
    log = ManifestLog(str(tmp_path))
    tok_live = "gen-tok-" + "a" * 24
    tok_orphan = "gen-tok-" + "b" * 24
    os.makedirs(log.gen_path(tok_live))
    os.makedirs(log.gen_path(tok_orphan))
    log.commit(lambda cur: ([tok_live], {}, ["token-1"]))
    # fresh orphan survives via the age guard (possible in-flight writer)
    assert log.gc(keep_manifests=1, min_age_s=3600.0) == []
    assert os.path.isdir(log.gen_path(tok_orphan))
    # aged orphan is collected; the live token generation never is
    old = time.time() - 7200
    os.utime(log.gen_path(tok_orphan), (old, old))
    deleted = log.gc(keep_manifests=1, min_age_s=3600.0)
    assert log.gen_path(tok_orphan) in deleted
    assert os.path.isdir(log.gen_path(tok_live))
    # exactly-once memory lives in the manifest, not the directory:
    # the token window still records the applied batch after GC
    assert "token-1" in log.current().tokens


def test_gc_reader_grace_protects_superseded_generations(tmp_path):
    """r13: ``reader_grace_s`` protects in-flight READERS against a
    concurrent compactor. min_age_s guards by CREATION age, but a
    reader resolves current() once and then scans — the hazard window
    is time since the generation was SUPERSEDED. With the grace set,
    every manifest whose successor committed inside the window stays
    protected (with its generations); with it 0 (the single-maintainer
    in-band path), the old behavior is unchanged."""
    log = ManifestLog(str(tmp_path))
    g_a = log.new_generation()
    os.makedirs(log.gen_path(g_a))
    log.commit(lambda cur: ([g_a], {}))
    g_merged = log.new_generation()
    os.makedirs(log.gen_path(g_merged))
    # the "compaction" rewrite: g_a superseded by g_merged JUST NOW
    log.commit(lambda cur: ([g_merged], {}))
    # a reader that resolved version 1 before the rewrite may still be
    # scanning g_a -> the grace window protects it even at
    # keep_manifests=1 / min_age_s=0
    assert log.gc(keep_manifests=1, min_age_s=0.0, reader_grace_s=3600.0) == []
    assert os.path.isdir(log.gen_path(g_a))
    # manifest file for version 1 survives too (the rule needs it)
    assert os.path.exists(os.path.join(log.mdir, "manifest-000000000001.json"))
    # outside the window (successor ts aged out) the generation goes
    import json as _json
    m2 = os.path.join(log.mdir, "manifest-000000000002.json")
    rec = _json.load(open(m2))
    rec["ts"] = rec["ts"] - int(7200 * 1e9)
    _json.dump(rec, open(m2, "w"))
    deleted = log.gc(keep_manifests=1, min_age_s=0.0, reader_grace_s=3600.0)
    assert log.gen_path(g_a) in deleted
    # grace 0: superseded generations collect immediately (pre-r13 shape)
    g_b = log.new_generation()
    os.makedirs(log.gen_path(g_b))
    log.commit(lambda cur: ([g_b], {}))
    deleted = log.gc(keep_manifests=1, min_age_s=0.0)
    assert log.gen_path(g_merged) in deleted


# -- DocumentStore on the manifest log --------------------------------------


def test_store_clear_is_metadata_only(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path / "s"))
    store.upsert(docs(spark, [("k1", "v1")], index="a"))
    store.upsert(docs(spark, [("k2", "v2")], index="b"))
    files_before = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(store.path)
        for f in fs
        if f.endswith(".parquet")
    )
    store.clear("a")
    files_after = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(store.path)
        for f in fs
        if f.endswith(".parquet")
    )
    assert files_before == files_after  # zero data bytes touched
    assert store.read("a").count() == 0
    assert {r["doc_key"] for r in store.read("b").collect()} == {"k2"}


def test_store_rebuild_does_not_rewrite_neighbors(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path / "s"))
    store.upsert(docs(spark, [("k1", "v1")], index="a"))
    store.upsert(docs(spark, [("n1", "w1")], index="b"))
    gens_before = set(store.log.current().live)
    store.overwrite_index("a", docs(spark, [("k9", "v9")], index="a"))
    m = store.log.current()
    # exactly one new generation; the old ones are still live (they hold
    # index b's rows and index a's pre-rebuild history)
    assert gens_before < set(m.live) and len(m.live) == 3
    assert {r["doc_key"] for r in store.read("a").collect()} == {"k9"}
    assert {r["doc_key"] for r in store.read("b").collect()} == {"n1"}


def test_interleaved_writers_never_corrupt_reads(spark, tmp_path):
    """The verdict's concurrent-ish writer gate: two interleaved
    upsert+compact sequences against different indexes, with reads after
    every step — every read must see a consistent committed state, and
    the final states must contain exactly the expected documents."""
    path = str(tmp_path / "s")
    w1 = DocumentStore(spark, path)
    w2 = DocumentStore(spark, path)  # separate handle, same table
    w1.upsert(docs(spark, [("a1", "v1"), ("a2", "v1")], index="ia"))
    w2.upsert(docs(spark, [("b1", "v1")], index="ib"))
    w1.upsert(docs(spark, [("a1", "v2")], index="ia"))  # LWW update
    w2.compact("ib")
    w1.compact("ia")
    w2.upsert(docs(spark, [("b2", "v2")], index="ib"))
    w2.delete("ib", ["b1"])
    a = {r["doc_key"]: r["content"] for r in w1.read("ia").collect()}
    b = {r["doc_key"]: r["content"] for r in w2.read("ib").collect()}
    assert a == {"a1": "v2", "a2": "v1"}
    assert b == {"b2": "v2"}
    # both handles resolve the same committed version
    assert w1.log.current() == w2.log.current()


def test_vacuum_reclaims_dead_data(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path / "s"))
    store.upsert(docs(spark, [("k1", "v1"), ("k2", "v1")], index="a"))
    store.upsert(docs(spark, [("n1", "v1")], index="b"))
    store.clear("a")
    assert len(store.log.current().live) == 2
    store.vacuum(min_age_s=0.0)
    m = store.log.current()
    assert len(m.live) == 1 and m.resets == {}
    assert store.read("a").count() == 0
    assert {r["doc_key"] for r in store.read("b").collect()} == {"n1"}
    # cleared rows are physically gone
    raw = spark.read.parquet(*store.log.live_paths())
    assert raw.where(F.col("index_name") == "a").count() == 0


def test_time_travel_survives_clear_until_vacuum(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path / "s"))
    store.upsert(docs(spark, [("k1", "v1")], index="a"))
    g1 = store.generations("a").collect()[0]["batch_id"]
    store.clear("a")
    assert store.read("a").count() == 0
    snap = {r["doc_key"]: r["content"] for r in store.read_at(g1, "a").collect()}
    assert snap == {"k1": "v1"}  # pre-clear history still readable
    store.vacuum(min_age_s=0.0)
    # vacuum rewrites history away; with every index cleared the store
    # holds no generations at all and reads as never-written
    with pytest.raises(FileNotFoundError):
        store.read_at(g1, "a")


def test_store_read_raises_when_never_written(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path / "never"))
    with pytest.raises(FileNotFoundError):
        store.read()


def test_read_live_table_schema_evolution(spark, tmp_path):
    """r6: a generation written before a column existed reads that
    column as NULL (lakehouse append-only evolution); opting out makes
    drift a hard error."""
    from wagtail_vector_index_spark.sources.manifest import read_live_table

    root = str(tmp_path / "tbl")
    log = ManifestLog(root)
    g1 = log.new_generation()
    spark.createDataFrame([(1, "a")], "id long, txt string").write.parquet(
        log.gen_path(g1)
    )
    log.commit(lambda cur: ([g1], {}))
    g2 = log.new_generation()
    spark.createDataFrame(
        [(2, "b", 0.9)], "id long, txt string, score double"
    ).write.parquet(log.gen_path(g2))
    log.commit(lambda cur: ([g1, g2], {}))

    rows = {r["id"]: r for r in read_live_table(spark, root).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["score"] is None and rows[2]["score"] == 0.9

    with pytest.raises(Exception, match="column|COLUMN"):
        read_live_table(spark, root, allow_schema_evolution=False).collect()
