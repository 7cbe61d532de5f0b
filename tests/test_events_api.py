"""EventLog facade tests (operators/events.py) — the served-API surface
for the event-pipeline shapes the catalog proves query-by-query
(q_sessionize / q_events_anomaly / q_session_window / q_events_hourly are
oracle-gated; these tests pin the API contracts on a corpus small enough
to reason about by hand)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.events import EventLog

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


@pytest.fixture()
def events(spark):
    def ev(eid, user, minutes, value, etype="click"):
        return (eid, user, T0 + dt.timedelta(minutes=minutes), value, etype)

    rows = (
        # user a: two sessions (40-minute gap between minute 10 and 50)
        [ev(1, "a", 0, 1.0), ev(2, "a", 10, 2.0), ev(3, "a", 50, 3.0)]
        # user b: one session, enough spread for stats
        + [ev(10 + i, "b", i, float(i % 5)) for i in range(25)]
        # inject one wild outlier for user b
        + [ev(99, "b", 26, 1000.0)]
    )
    return spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double, event_type string"
    )


def test_sessionize_gap_splits_sessions(events):
    out = EventLog(events).sessionize(gap_ms=30 * 60 * 1000).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    a = sorted(by_user["a"], key=lambda r: r["session_no"])
    assert [r["n_events"] for r in a] == [2, 1]
    assert a[0]["duration_ms"] == 10 * 60 * 1000
    assert len(by_user["b"]) == 1  # minute-apart events never split


def test_session_windows_batch(events):
    out = EventLog(events).session_windows(gap="30 minutes").collect()
    a = [r for r in out if r["user_id"] == "a"]
    assert sorted(r["n_events"] for r in a) == [1, 2]
    for r in a:
        # window end extends gap past the last event (session_window
        # semantics, distinct from sessionize's observed extent)
        assert (r["session_end"] - r["session_start"]) >= dt.timedelta(
            minutes=30
        )


def test_anomalies_flags_only_the_outlier(events):
    out = EventLog(events).anomalies(zscore=3.0, min_events=20).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["zscore"] > 3.0
    # user a has too few events to ever be flagged
    assert all(r["user_id"] == "b" for r in out)


def test_anomalies_respects_min_events(events):
    # with the bar below user a's count, a's events become eligible (but
    # their tiny spread still produces no |z| > 3) — the filter is on
    # entity size, not a silent global
    out = EventLog(events).anomalies(zscore=0.5, min_events=3).collect()
    assert {r["user_id"] for r in out} >= {"b"}


def test_hourly_rollup_counts_and_sums(events):
    out = EventLog(events).hourly_rollup(group_col="event_type").collect()
    assert all(r["hour_str"].startswith("2026-01-01 12:00") for r in out)
    assert sum(r["n_events"] for r in out) == 29
    flat = EventLog(events).hourly_rollup(group_col=None).collect()
    assert len(flat) == 1 and flat[0]["n_events"] == 29


def test_custom_column_names(spark):
    df = spark.createDataFrame(
        [(1, "m1", T0, 5.0), (2, "m1", T0 + dt.timedelta(hours=2), 6.0)],
        "seq long, machine string, at timestamp, reading double",
    )
    log = EventLog(
        df, entity_col="machine", ts_col="at", value_col="reading",
        order_col="seq",
    )
    out = log.sessionize(gap_ms=60 * 60 * 1000).collect()
    assert len(out) == 2  # 2-hour gap splits with a 1-hour timeout
    assert {r["machine"] for r in out} == {"m1"}


def test_session_windows_streaming_matches_batch(spark, tmp_path):
    """EventLog.session_windows runs unchanged on a streaming input (the
    session_window + watermark shape): the stream's final state must
    equal the batch result over the same rows."""
    rows = [
        (i, "u1", T0 + dt.timedelta(minutes=m), 1.0, "click")
        for i, m in enumerate([0, 5, 10, 60, 65, 180])
    ] + [(100, "u2", T0, 1.0, "view")]
    schema = (
        "event_id long, user_id string, ts timestamp, value double, "
        "event_type string"
    )
    staged = str(tmp_path / "sessions_staged")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staged)
    batch = spark.read.parquet(staged)
    stream = spark.readStream.schema(batch.schema).parquet(staged)

    from wagtail_vector_index_spark.operators.events import EventLog

    out = EventLog(stream.withWatermark("ts", "1 hour")).session_windows(
        gap="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_win").collect()
    }
    expected = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in EventLog(batch).session_windows(gap="30 minutes").collect()
    }
    assert got == expected
    # u1: three sessions (0-10, 60-65, 180); u2: one
    assert sum(1 for u, *_ in got if u == "u1") == 3
    assert sum(1 for u, *_ in got if u == "u2") == 1


def test_funnel_orders_steps_and_counts(spark):
    from wagtail_vector_index_spark.operators.events import EventLog

    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:05:00"),
        (3, 1, "purchase", "2024-01-01 10:10:00"),
        # user 2 clicks BEFORE viewing: click must not count
        (4, 2, "click", "2024-01-01 09:00:00"),
        (5, 2, "view", "2024-01-01 10:00:00"),
        # user 3 views only
        (6, 3, "view", "2024-01-01 11:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = EventLog(df).funnel(["view", "click", "purchase"])
    got = {r["step_name"]: r["n_entities"] for r in out.collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_retention_counts_cohort_cells(spark):
    from wagtail_vector_index_spark.operators.events import EventLog

    rows = [
        (1, 1, "view", "2024-01-05 10:00:00"),  # cohort 2024-01
        (2, 1, "view", "2024-02-05 10:00:00"),  # active offset 1
        (3, 2, "view", "2024-01-20 10:00:00"),  # cohort 2024-01, offset 0 only
        (4, 3, "view", "2024-02-01 10:00:00"),  # cohort 2024-02
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = EventLog(df).retention(max_offset=3)
    cells = {
        (r["cohort_label"], r["period_offset"]): r["n_users"]
        for r in out.collect()
    }
    assert cells == {
        ("2024-01", 0): 2,
        ("2024-01", 1): 1,
        ("2024-02", 0): 1,
    }


def test_top_paths_counts_consecutive_triples(spark):
    """r6: top_paths counts per-entity consecutive type sequences in
    (ts, order) order and never crosses entities."""
    import datetime as dt

    from wagtail_vector_index_spark.operators.events import EventLog

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a"), (1, t0, 2, "b"), (1, t0, 3, "c"),
        (1, t0, 4, "a"),
        (2, t0, 5, "b"), (2, t0, 6, "c"), (2, t0, 7, "a"),
        # entity 3 has only two events: no triple
        (3, t0, 8, "a"), (3, t0, 9, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r["path"]: r["n"] for r in EventLog(df).top_paths(k=5).collect()}
    # entity 1: a>b>c, b>c>a; entity 2: b>c>a — no cross-entity a>b>b etc.
    assert out == {"a>b>c": 1, "b>c>a": 2}
