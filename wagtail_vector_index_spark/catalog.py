"""Shared query-catalog registry used by the queries_* modules and
exported through __spark_entry__.py to the driver's correctness gate."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERY_FNS: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query implementation (and optionally its DuckDB oracle —
    omit the oracle only for genuinely non-SQL-expressible operators)."""

    def deco(fn):
        QUERY_FNS[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The ts physical type varies across testdata generations:
        # TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
        # nanos as long and floor-convert to micros with integer division;
        # double math would lose precision at 1e18, and DuckDB
        # floor-truncates ns->us on read the same way) or a native
        # timestamp[us] (arrives as TIMESTAMP_NTZ — cast to session-TZ
        # timestamp, UTC, so both generations yield identical instants).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        if not isinstance(ts_type, T.TimestampType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
