"""Time-window queries over the events stream table — SURVEY §2.10,
batch form. The Structured Streaming twins (same operators with
watermarks, readStream sources) live in ``streaming/``; the driver's
oracle can only hash batch output, so these run the identical window
expressions in batch mode.

The nanosecond-timestamp ingest hazard is handled centrally in
sources.tables.load_events (integer-truncation to µs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import epoch_seconds, r4, sql_r
from ..plans.registry import register
from ..sources.tables import load_events


@register(
    "q_stream_tumbling_1h",
    oracle=f"""
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
             AS window_start,
           event_type,
           count(*) AS n,
           {sql_r('sum(value)')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tier="P0",
    doc="1-hour tumbling window counts + value sums per event type, "
    "window start emitted as epoch seconds (raw timestamps are never "
    "emitted — SURVEY §5.3 rule 3). Streaming twin adds a 2h watermark.",
)
def q_stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
