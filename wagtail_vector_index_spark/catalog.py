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
        # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and floor-convert to micros
        # with integer division (double math would lose precision at 1e18).
        # DuckDB floor-truncates ns->us on read the same way.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
