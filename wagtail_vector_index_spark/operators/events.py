"""EventLog — the served-API facade over an event stream/table.

The catalog proves the event-pipeline shapes one query at a time
(`q_sessionize`, `q_events_anomaly`, `q_events_hourly`,
`q_session_window`); a user of the engine shouldn't have to re-derive
those window programs per call site. EventLog packages them over any
DataFrame with (entity, timestamp, value) columns — batch or, where the
shape allows (`session_windows`, `hourly_rollup`), a streaming
DataFrame, where the same expressions run under watermarks
(streaming/maintenance.py holds the writeStream plumbing).

Reference N/A: the reference has no event surface — this is the
north-star EXT pipeline API (SURVEY §3), kept DataFrame-native so every
method composes with the rest of the engine (e.g. anomalies() feeding a
quality filter, sessionize() feeding a mixing pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class EventLog:
    """A typed view over an events DataFrame.

    Column contract (defaults match the testdata `events` table):
    ``entity_col`` (who), ``ts_col`` (when, timestamp), ``value_col``
    (measure), ``order_col`` (tie-break within equal timestamps).
    """

    def __init__(
        self,
        df: DataFrame,
        *,
        entity_col: str = "user_id",
        ts_col: str = "ts",
        value_col: str = "value",
        order_col: str = "event_id",
    ):
        self.df = df
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.order_col = order_col

    # -- sessionization ------------------------------------------------------

    def sessionize(self, *, gap_ms: int = 1_800_000) -> DataFrame:
        """Inactivity-gap sessionization (the q_sessionize shape): a gap
        longer than ``gap_ms`` starts a new session. Output: one row per
        (entity, session_no) with n_events and duration_ms. Batch only —
        the running session counter needs an unbounded window; for the
        streaming variant use :meth:`session_windows`."""
        w = Window.partitionBy(self.entity_col).orderBy(
            self.ts_col, self.order_col
        )
        wrun = (
            Window.partitionBy(self.entity_col)
            .orderBy(self.ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ms = F.unix_millis(self.ts_col)
        flagged = self.df.select(
            self.entity_col,
            self.ts_col,
            F.when(
                (ms - F.lag(ms).over(w) > gap_ms)
                | F.lag(self.ts_col).over(w).isNull(),
                1,
            )
            .otherwise(0)
            .alias("new_session"),
        )
        sessions = flagged.select(
            self.entity_col,
            self.ts_col,
            F.sum("new_session").over(wrun).cast("int").alias("session_no"),
        )
        return sessions.groupBy(self.entity_col, "session_no").agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.max(F.unix_millis(self.ts_col))
                - F.min(F.unix_millis(self.ts_col))
            ).alias("duration_ms"),
        )

    def session_windows(self, *, gap: str = "30 minutes") -> DataFrame:
        """Event-time session windows via ``F.session_window`` — the
        q_session_window shape. Works on batch AND streaming inputs (with
        a watermark, state evicts when a session's gap expires); window
        bounds differ from :meth:`sessionize` session extents only in
        that the window's end extends ``gap`` past the last event."""
        return (
            self.df.groupBy(
                self.entity_col, F.session_window(self.ts_col, gap)
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                self.entity_col,
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
            )
        )

    # -- anomaly detection ---------------------------------------------------

    def anomalies(
        self, *, zscore: float = 3.0, min_events: int = 20
    ) -> DataFrame:
        """Per-entity z-score anomalies (the q_events_anomaly shape):
        flag events ``|z| > zscore`` against the entity's own
        distribution; entities with fewer than ``min_events`` events are
        skipped (unstable sigma). One shuffle on the entity key — the
        stats window and the flagging reuse the same partitioning."""
        w = Window.partitionBy(self.entity_col)
        return (
            self.df.withColumn("mu", F.avg(self.value_col).over(w))
            .withColumn("sigma", F.stddev_samp(self.value_col).over(w))
            .withColumn("n", F.count(F.lit(1)).over(w))
            .where(
                (F.col("n") >= min_events)
                & (F.col("sigma") > 0)
                & (
                    F.abs(
                        (F.col(self.value_col) - F.col("mu")) / F.col("sigma")
                    )
                    > zscore
                )
            )
            .withColumn(
                "zscore",
                (F.col(self.value_col) - F.col("mu")) / F.col("sigma"),
            )
            .drop("mu", "sigma", "n")
        )

    # -- rollups -------------------------------------------------------------

    def hourly_rollup(self, *, group_col: str | None = "event_type") -> DataFrame:
        """Hourly counts + value sums (the q_events_hourly shape),
        optionally split by ``group_col``. Streaming inputs get the same
        plan under a watermark via F.window upstream."""
        keys = [F.date_format(self.ts_col, "yyyy-MM-dd HH:00").alias("hour_str")]
        if group_col is not None:
            keys.append(F.col(group_col))
        return self.df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(self.value_col), 2).alias("sum_value"),
        )

    # -- product analytics ---------------------------------------------------

    def funnel(
        self, steps: list[str], *, type_col: str = "event_type"
    ) -> DataFrame:
        """Ordered funnel: an entity advances to step i only with an event
        of ``steps[i]`` strictly after its first step-(i-1) occurrence.
        Returns one row per step: step index, step name, entities
        reaching it, and conversion from the previous step.

        Scale shape: ONE shuffle on the entity key total, regardless of
        step count. Each step's first-occurrence timestamp is a
        conditional-min window over the same entity partitioning, and
        because step i's condition references step i-1's window column
        (a per-entity constant), the chain stacks as successive Window
        nodes over the SAME exchange; the per-entity collapse then reuses
        that partitioning too (no second shuffle). Compare the naive
        per-step join cascade, which rescans the event table once per
        step and shuffles each frontier."""
        w = Window.partitionBy(self.entity_col)
        df = self.df
        tcols: list[str] = []
        for i, step in enumerate(steps):
            cond = F.col(type_col) == step
            if tcols:
                cond = cond & (F.col(self.ts_col) > F.col(tcols[-1]))
            name = f"__t{i}"
            df = df.withColumn(
                name, F.min(F.when(cond, F.col(self.ts_col))).over(w)
            )
            tcols.append(name)
        per_entity = df.groupBy(self.entity_col).agg(
            *[F.max(c).alias(c) for c in tcols]
        )
        counts = per_entity.agg(
            *[F.count(F.col(c)).alias(f"__n{i}") for i, c in enumerate(tcols)]
        )
        step_rows = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step"),
                        F.lit(step).alias("step_name"),
                        F.col(f"__n{i}").alias("n_entities"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        )
        out = counts.select(step_rows.alias("s")).select(
            "s.step", "s.step_name", "s.n_entities"
        )
        wstep = Window.orderBy("step")
        return out.withColumn(
            "conversion",
            F.round(
                F.try_divide(
                    F.col("n_entities"), F.lag("n_entities", 1).over(wstep)
                ),
                4,
            ),
        )

    def retention(
        self, *, period: str = "month", max_offset: int = 3
    ) -> DataFrame:
        """Cohort retention triangle: entities grouped by first-activity
        period (``month`` or ``day``), counted in each later period
        (0..max_offset) they remain active. Offsets use integer
        arithmetic (year*12+month, or day difference) so the cell keys
        are engine-portable."""
        if period not in ("month", "day"):
            raise ValueError(f"period must be 'month' or 'day', got {period!r}")
        fmt = "yyyy-MM" if period == "month" else "yyyy-MM-dd"
        f = self.df.groupBy(self.entity_col).agg(
            F.date_trunc(period, F.min(self.ts_col)).alias("cohort")
        )
        a = self.df.select(
            self.entity_col,
            F.date_trunc(period, F.col(self.ts_col)).alias("m"),
        ).distinct()
        if period == "month":
            off = (
                (F.year("m") * 12 + F.month("m"))
                - (F.year("cohort") * 12 + F.month("cohort"))
            ).cast("int")
        else:
            off = F.datediff(F.col("m"), F.col("cohort")).cast("int")
        return (
            f.join(a, self.entity_col)
            .withColumn("period_offset", off)
            .where(F.col("period_offset").between(0, int(max_offset)))
            .groupBy(
                F.date_format("cohort", fmt).alias("cohort_label"),
                "period_offset",
            )
            .agg(F.count(F.lit(1)).alias("n_users"))
        )

    def top_paths(
        self,
        *,
        type_col: str = "event_type",
        steps: int = 3,
        k: int = 10,
    ) -> DataFrame:
        """Top-k ``steps``-long consecutive event-type paths per entity
        (the 'what do users do next' product query; gated by
        q_event_paths). One entity-keyed window pass; the count key
        space is bounded by |event_types|^steps. Deterministic:
        (ts, order_col) ordering, ties ranked by path string."""
        w = Window.partitionBy(self.entity_col).orderBy(
            self.ts_col, self.order_col
        )
        cols = [F.col(type_col)] + [
            F.lead(type_col, i).over(w) for i in range(1, int(steps))
        ]
        named = [c.alias(f"__e{i}") for i, c in enumerate(cols)]
        s = self.df.select(self.entity_col, *named)
        return (
            s.where(F.col(f"__e{int(steps) - 1}").isNotNull())
            .select(
                F.concat_ws(
                    ">", *[f"__e{i}" for i in range(int(steps))]
                ).alias("path")
            )
            .groupBy("path")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("path").asc())
            .limit(int(k))
        )
