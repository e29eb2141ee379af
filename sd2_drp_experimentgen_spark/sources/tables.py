"""Parquet table loaders for the fixture star schema.

All loaders return lazy DataFrames over the columnar parquet files so
Catalyst can push filters/projections into the scan (the 100 TB lever:
column pruning + row-group predicate pushdown happen for free as long as
we never materialize eagerly here).

``events`` needs special handling: the file stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark 4.x cannot read natively. With
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as int64
nanoseconds; we convert to a microsecond timestamp with *integer*
truncation (``div 1000``) — float division rounds and diverges from
DuckDB's truncating read by 1µs on ~half of all rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_session, require_conf

RAW_TS_COL = "ts"

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; ``events`` gets its ts normalized."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as TimestampType (µs, truncated from ns).

    Truncation (not rounding) matches DuckDB's nanos->micros read and is
    exact integer arithmetic, safe at any timestamp magnitude.
    """
    configure_session(spark)  # driver-provided sessions may lack the conf
    require_conf(
        spark,
        _NANOS_CONF,
        "true",
        "events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4.x "
        "refuses to read without this conf",
    )
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn(
        RAW_TS_COL,
        F.timestamp_micros(F.expr(f"{RAW_TS_COL} div 1000")),
    )


def load_events_raw_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` left as raw int64 nanoseconds (for operators
    that want exact ns arithmetic, e.g. interval-join blocking keys)."""
    configure_session(spark)
    require_conf(
        spark,
        _NANOS_CONF,
        "true",
        "events.parquet stores ts as TIMESTAMP(NANOS); raw int64 ns read "
        "requires this conf",
    )
    return spark.read.parquet(f"{sf_dir}/events.parquet")
